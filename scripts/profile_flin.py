"""Slim hardware probe: deployed rt6 tick with jacfwd vs fused linearizer.

Run:  nohup python scripts/profile_flin.py > /tmp/profile_flin.log 2>&1 &
"""
# TIMING CAVEAT (round 3): this script predates the discovery that
# jax.block_until_ready does NOT reliably wait on the axon tunnel platform.
# Its absolute wall-clock numbers are unreliable; use
# mpc_blaster_tpu.utils.timing.device_time (fetch-based) for new work.
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import init_rti_state
from mpc_blaster_tpu.dynamics.blaster import BlasterParams
from mpc_blaster_tpu.sim.closedloop import make_closed_loop

K = 32


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / K * 1e3


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0).at[0].set(0.3)

    # fastlin-only chain first: small graph, measures the linearizer alone.
    from mpc_blaster_tpu.dynamics.fastlin import fast_linearize
    st = init_rti_state(ocp, x0, dtype)

    @jax.jit
    def flin_chain(xbar, ubar, sp):
        def body(carry, _):
            xb = carry
            xn, A, B = fast_linearize(xb, ubar, sp, params, ocp.dt)
            xb = xb.at[1:].set(xn)
            return xb, A[0, 0, 0]
        _, ys = jax.lax.scan(body, xbar, None, length=K)
        return ys

    print("compiling fastlin chain...", flush=True)
    t = timeit(lambda: flin_chain(st.xbar, st.ubar, spec.stage_params))
    print(f"fastlin        = {t:.3f} ms", flush=True)

    for name, lb in (("tick_rt6", "jacfwd"), ("tick_rt6_flin", "fused")):
        solv = dataclasses.replace(ocp.solver, ipm_iters=6,
                                   qp_backend="pallas", lin_backend=lb)
        ocp_rt = dataclasses.replace(ocp, solver=solv)
        runner = make_closed_loop(ocp_rt, K, dtype=dtype)
        print(f"compiling {name}...", flush=True)
        t = timeit(lambda: runner(spec, x0))
        print(f"{name:14s} = {t:.3f} ms  ({1e3 / t:.0f} Hz)", flush=True)


if __name__ == "__main__":
    main()
