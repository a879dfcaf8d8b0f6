"""r5 hardware A/B: batched fused-assembly tick vs the r4 batched path.

Measures, on the real chip with honest fetch-based timing
(utils/timing.py::device_time):
  A  batched_rt6 baseline   (backend="pallas", host assembly + update)
  B  batched_rt6 fused      (backend="pallas_fused", in-kernel assembly
                             + state update; host does linearizer only)
both at the bench shape: sim preset N=20, B=1024, K=10 chained ticks,
6 IPM iterations, fused component-form linearizer.

Run on TPU in background:  python scripts/probe_r5_batched_fused.py
"""
import dataclasses
import os
import sys
import json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.parallel.mesh import batched_rti_step
    from mpc_blaster_tpu.sqp.rti import init_rti_state
    from mpc_blaster_tpu.ops.pallas_ipm import pallas_available
    from mpc_blaster_tpu.utils.timing import device_time

    assert pallas_available(), "needs the real TPU"
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(
        preset.ocp, N=20, Tf=20 / 30.0,
        solver=dataclasses.replace(preset.ocp.solver, ipm_iters=6,
                                   lin_backend="fused"))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    rng = np.random.default_rng(0)
    B, K = 1024, 10
    x0s = np.zeros((B, cfg.NX), np.float32)
    x0s[:, 0:3] = rng.uniform(-0.4, 0.4, (B, 3))
    x0s[:, 2] += 2.0
    x0s = jnp.asarray(x0s)
    states0 = jax.vmap(lambda x: init_rti_state(ocp, x, dtype))(x0s)

    out = {}
    for backend in ("pallas", "pallas_fused"):
        step = batched_rti_step(ocp, dtype=dtype, jit=False,
                                backend=backend)

        @jax.jit
        def k_ticks(spec_b, states, x0s):
            def body(sts, _):
                u0s, sts, _ = step(spec_b, sts, x0s)
                return sts, u0s[0, 0]
            sts, _ = jax.lax.scan(body, states, None, length=K)
            return sts

        print(f"compiling {backend}...", flush=True)
        sts = k_ticks(spec, states0, x0s)
        xb = np.asarray(sts.xbar)
        print(f"{backend}: finite={np.isfinite(xb).all()} "
              f"xbar[0,0,:3]={xb[0, 0, :3]}", flush=True)
        dt = device_time(lambda: k_ticks(spec, states0, x0s), reps=3)
        rate = B * K / dt
        out[backend] = rate
        print(f"{backend}: {dt*1e3:.3f} ms / {K}-chain = "
              f"{rate:.1f} solves/s", flush=True)

    # numerical parity on the chained endpoint (objective-level check is
    # in the CPU tests; here just endpoint agreement)
    step_p = batched_rti_step(ocp, dtype=dtype, jit=False,
                              backend="pallas")
    step_f = batched_rti_step(ocp, dtype=dtype, jit=False,
                              backend="pallas_fused")
    stp = states0
    stf = states0
    for _ in range(3):
        _, stp, dgp = jax.jit(step_p)(spec, stp, x0s)
        _, stf, dgf = jax.jit(step_f)(spec, stf, x0s)
    du = float(jnp.max(jnp.abs(stp.ubar - stf.ubar)))
    dx = float(jnp.max(jnp.abs(stp.xbar - stf.xbar)))
    print(f"3-tick endpoint |dxbar|={dx:.2e} |dubar|={du:.2e}", flush=True)
    out["endpoint_dx"] = dx
    out["endpoint_du"] = du
    out["speedup"] = out["pallas_fused"] / out["pallas"]
    print(json.dumps({k: round(v, 4) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
