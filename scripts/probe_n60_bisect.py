"""Bisect the fused-kernel N=60 compile failure (r4 item 1b).

Facts so far: rt6f_n60 inside the closed_loop scan fails deterministically
with 'tpu_compile_helper subprocess exit code 1' (~2.5 min into compile);
rt6f at N=20/N=30 and the two-kernel N=60 compile fine. This probe walks
the axes: standalone solve (no scan) at N = 40, 48, 60 to find whether the
failure is scan-nesting or kernel-size shaped. Full untruncated errors to
stderr.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu import config as cfg                      # noqa: E402
from mpc_blaster_tpu.ocp.spec import build_spec                # noqa: E402
from mpc_blaster_tpu.sqp.rti import init_rti_state, make_rti_step  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    results = {}
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)

    def standalone(name, N):
        ocp_n = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        sv = dataclasses.replace(ocp_n.solver, ipm_iters=6,
                                 qp_backend="pallas_fused",
                                 lin_backend="fused")
        ocp_rt = dataclasses.replace(ocp_n, solver=sv)
        spec_n = build_spec(ocp_rt, yref=preset.loop.yref, dtype=dtype)
        step = make_rti_step(ocp_rt, dtype=dtype)
        st = init_rti_state(ocp_rt, x0, dtype)
        t0 = time.time()
        try:
            u0, st2, diag = step(spec_n, st, x0)
            u0 = np.asarray(u0)
            ok = bool(np.isfinite(u0).all())
            results[name] = f"ok finite={ok} {time.time()-t0:.0f}s"
            log(f"{name}: OK ({time.time()-t0:.0f}s) u0={u0[:2]}")
        except Exception as e:
            results[name] = "FAIL"
            log(f"{name}: FAIL after {time.time()-t0:.0f}s\n{e}")

    # standalone (no scan): does the kernel itself compile at N=60?
    standalone("standalone_n60", 60)
    # if kernel-size shaped, find the threshold
    standalone("standalone_n40", 40)
    standalone("standalone_n48", 48)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
