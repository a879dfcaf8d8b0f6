"""Transient stress for the warm-start candidates: the round-2 failure
mode was altitude-step overshoot under raw warm chains — measure exactly
that, plus full-run (transient-inclusive) figure-8 error."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sim.closedloop import make_closed_loop
from mpc_blaster_tpu.sim.tasks import run_figure8


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    N = 20
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    # altitude step: start at z=0.5, target 3.5 (the sim preset yref)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(0.5)

    rows = [("cold6", 6, None, False), ("cold4", 4, None, False),
            ("full4", 4, "full", False),
            ("primal3", 3, "primal", False),
            ("primal4_shift", 4, "primal", True),
            ("centrality4_shift", 4, "centrality", True)]
    for label, iters, mode, shift in rows:
        sv = dataclasses.replace(
            ocp.solver, ipm_iters=iters, qp_backend="pallas",
            lin_backend="fused", warm_mode=mode or "full",
            warm_shift=shift)
        ocp_c = dataclasses.replace(ocp, solver=sv)
        warm = mode is not None
        runner = make_closed_loop(ocp_c, 200, dtype=dtype, warm_start=warm)
        res = runner(spec, x0)
        z = np.asarray(res.xs[:, 2])
        overshoot = float(max(z.max() - 3.5, 0.0))
        settle_err = float(abs(z[120:] - 3.5).max())
        # figure-8 with the transient INCLUDED (err over the whole run)
        preset_c = dataclasses.replace(preset, ocp=ocp_c)
        fig = run_figure8(preset_c, n_steps=220, dtype=dtype,
                          warm_start=warm)
        xs = np.asarray(fig.xs)
        refs = np.asarray(fig.refs)
        err = np.linalg.norm(xs[1:, 0:2] - refs[:, 0:2], axis=1)
        print(f"{label}: alt overshoot={overshoot:.4f} m  "
              f"settle|z-3.5|={settle_err:.4f}  fig8 full-run max="
              f"{float(err.max()):.4f}  settle={float(err[60:].max()):.4f}"
              f"  finite={bool(np.isfinite(xs).all())}", flush=True)


if __name__ == "__main__":
    main()
