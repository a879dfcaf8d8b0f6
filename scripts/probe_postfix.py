"""Post-alias-fix hardware revalidation: (1) soft closed loop now moves,
(2) warm-start transient table re-measured (the alias bug could have
contaminated the earlier blowups), (3) deployed rt rows re-timed."""
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
from mpc_blaster_tpu.sqp.rti import (init_rti_state, rti_step_soft,
                                     make_linearizer)
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.qp.soft import SoftBounds
from mpc_blaster_tpu.sim.closedloop import make_closed_loop
from mpc_blaster_tpu.sim.tasks import run_figure8
from mpc_blaster_tpu.utils.timing import device_time


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    N = 20
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)

    # ---- (1) soft closed loop: must fly back toward the box now ----
    x0s = jnp.zeros(cfg.NX, dtype).at[0].set(2.4).at[2].set(2.0)
    soft = SoftBounds.state_bounds(N, cfg.NX, cfg.NU, Zl=1e3, zl=1e2,
                                   dtype=dtype)
    sv = dataclasses.replace(ocp.solver, qp_backend="pallas", ipm_iters=6,
                             lin_backend="fused")
    lin = make_linearizer(dataclasses.replace(ocp, solver=sv), params)

    @jax.jit
    def soft_chain(spec, st0, x0, soft):
        def body(carry, _):
            st, x = carry
            u0, st, diag, res = rti_step_soft(spec, st, x, params, F, sv,
                                              soft, linearizer=lin)
            x = F(x, u0, spec.stage_params[0], params)
            return (st, x), x[0]
        (st, x), xs = jax.lax.scan(body, (st0, x0), None, length=32)
        return x, xs
    st0 = init_rti_state(ocp, x0s, dtype)
    x, xs = soft_chain(spec, st0, x0s, soft)
    print(f"soft loop: x 2.4 -> {float(xs[15]):.3f} (t16) -> "
          f"{float(xs[-1]):.3f} (t32)  finite={bool(jnp.isfinite(x).all())}",
          flush=True)
    lat = device_time(lambda: soft_chain(spec, st0, x0s, soft),
                      reps=8) / 32
    print(f"soft rt6 N=20 tick: {lat*1e3:.3f} ms ({1/lat:.0f} Hz)",
          flush=True)

    # ---- (2) warm transient table, post-fix ----
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(0.5)
    rows = [("cold6", 6, None, False), ("cold4", 4, None, False),
            ("full4", 4, "full", False),
            ("primal3", 3, "primal", False),
            ("primal3_shift", 3, "primal", True),
            ("full4_shift", 4, "full", True),
            ("centrality4_shift", 4, "centrality", True)]
    for label, iters, mode, shift in rows:
        svw = dataclasses.replace(
            ocp.solver, ipm_iters=iters, qp_backend="pallas",
            lin_backend="fused", warm_mode=mode or "full",
            warm_shift=shift)
        ocp_c = dataclasses.replace(ocp, solver=svw)
        warm = mode is not None
        try:
            runner = make_closed_loop(ocp_c, 200, dtype=dtype,
                                      warm_start=warm)
            res = runner(spec, x0)
            z = np.asarray(res.xs[:, 2])
            overshoot = float(max(z.max() - 3.5, 0.0))
            preset_c = dataclasses.replace(preset, ocp=ocp_c)
            fig = run_figure8(preset_c, n_steps=220, dtype=dtype,
                              warm_start=warm)
            fx = np.asarray(fig.xs)
            refs = np.asarray(fig.refs)
            err = np.linalg.norm(fx[1:, 0:2] - refs[:, 0:2], axis=1)
            K = 32
            lrun = make_closed_loop(ocp_c, K, dtype=dtype, warm_start=warm)
            latw = device_time(lambda: lrun(spec, x0), reps=8) / K
            print(f"warm {label}: overshoot={overshoot:.4f} "
                  f"fig8max={float(err.max()):.4f} tick={latw*1e3:.3f} ms "
                  f"({1/latw:.0f} Hz)", flush=True)
        except Exception as e:
            print(f"warm {label}: FAILED {str(e)[:150]}", flush=True)

    # ---- (3) rt rows re-timed post-fix ----
    for Nn in (20, 30, 60):
        ocp_n = dataclasses.replace(preset.ocp, N=Nn, Tf=Nn / 30.0)
        spec_n = build_spec(ocp_n, yref=preset.loop.yref, dtype=dtype)
        svn = dataclasses.replace(ocp_n.solver, ipm_iters=6,
                                  qp_backend="pallas", lin_backend="fused")
        runner = make_closed_loop(dataclasses.replace(ocp_n, solver=svn),
                                  32, dtype=dtype)
        latn = device_time(lambda: runner(spec_n, x0), reps=8) / 32
        print(f"rt6 N={Nn}: {latn*1e3:.3f} ms ({1/latn:.0f} Hz)",
              flush=True)


if __name__ == "__main__":
    main()
