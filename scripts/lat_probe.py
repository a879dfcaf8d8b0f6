"""Latency breakdown probe for the single-trajectory RTI tick (N=20).

Times each component of the warm latency loop on the real chip to steer
the 1000 Hz work (VERDICT.md next-round item 1). Every variant is a
K-chained lax.scan inside one jit, so host dispatch is amortized and the
number reported is pure device-side per-tick latency.

Run:  python scripts/lat_probe.py 2>&1 | tee /tmp/lat_probe.log
"""
# TIMING CAVEAT (round 3): this script predates the discovery that
# jax.block_until_ready does NOT reliably wait on the axon tunnel platform.
# Its absolute wall-clock numbers are unreliable; use
# mpc_blaster_tpu.utils.timing.device_time (fetch-based) for new work.
import dataclasses
import os
import json
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sqp.rti import (
        init_rti_state, build_qp, rti_step_warm, JacCache,
        build_qp_jacreuse)
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.qp.ipm import box_qp_solve, IpmWarmStart, \
        warm_start_from
    from mpc_blaster_tpu.sim.closedloop import make_closed_loop
    from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve, \
        pallas_available

    dtype = jnp.float32
    preset = cfg.simulation_preset()
    N = 20
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)

    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    st = init_rti_state(ocp, x0, dtype)
    K = 32
    results = {}

    # ---- 1. linearize-only chain (build_qp per tick) ----
    log("probe: compile linearize-only")

    @jax.jit
    def lin_chain(spec, st, x0):
        def body(carry, _):
            st = carry
            qp = build_qp(spec, st, x0, F, params)
            st = st._replace(xbar=st.xbar + 1e-6 * qp.c.sum())
            return st, qp.c[0, 0]
        st, _ = jax.lax.scan(body, st, None, length=K)
        return st
    results["linearize_ms"] = timeit(lambda: lin_chain(spec, st, x0)) / K * 1e3
    log(f"probe: linearize-only = {results['linearize_ms']:.3f} ms")

    # ---- 2. QP-only chain (fixed data, no linearization), per iters ----
    qp0 = jax.jit(lambda spec, st, x0: build_qp(spec, st, x0, F, params))(
        spec, st, x0)
    for iters in (3, 6, 12):
        log(f"probe: compile qp-only iters={iters}")

        @jax.jit
        def qp_chain(qp, it=iters):
            def body(carry, _):
                data = qp._replace(dx0=qp.dx0 + 1e-9 * carry)
                sol = box_qp_solve(data, iters=it)
                return sol.du[0, 0], sol.du[0, 0]
            c, _ = jax.lax.scan(body, qp.dx0[0] * 0, None, length=K)
            return c
        ms = timeit(lambda: qp_chain(qp0)) / K * 1e3
        results[f"qp_xla_iters{iters}_ms"] = ms
        log(f"probe: qp-only xla iters={iters} = {ms:.3f} ms")

    # ---- 3. full warm ticks at various iters ----
    for iters in (3, 4, 6):
        log(f"probe: compile warm{iters} closed loop")
        ocp_i = dataclasses.replace(
            ocp, solver=dataclasses.replace(ocp.solver, ipm_iters=iters))
        runner = make_closed_loop(ocp_i, K, dtype=dtype, warm_start=True)
        ms = timeit(lambda: runner(spec, x0)) / K * 1e3
        results[f"warm{iters}_tick_ms"] = ms
        log(f"probe: warm{iters} tick = {ms:.3f} ms")

    # ---- 4. warm6 + jacobian reuse (refresh every 4th tick) ----
    log("probe: compile warm6+jacreuse")
    from mpc_blaster_tpu.sqp.rti import rti_step_jacreuse

    ocp6 = dataclasses.replace(
        ocp, solver=dataclasses.replace(ocp.solver, ipm_iters=6))

    @jax.jit
    def jr_chain(spec, st, x0):
        cache = JacCache.zeros(N, cfg.NX, cfg.NU, dtype)
        warm = IpmWarmStart.zeros(N, cfg.NX, cfg.NU, dtype)

        def body(carry, k):
            st, cache, warm = carry
            refresh = (k % 4) == 0
            qp, cache = build_qp_jacreuse(spec, st, x0, F, params, cache,
                                          refresh)
            sol = box_qp_solve(qp, iters=6, warm=warm)
            st = st._replace(xbar=st.xbar + sol.dx, ubar=st.ubar + sol.du)
            return (st, cache, warm_start_from(sol)), sol.du[0, 0]

        (st, _, _), _ = jax.lax.scan(body, (st, cache, warm),
                                     jnp.arange(K))
        return st
    results["warm6_jacreuse_tick_ms"] = timeit(
        lambda: jr_chain(spec, st, x0)) / K * 1e3
    log(f"probe: warm6+jacreuse = {results['warm6_jacreuse_tick_ms']:.3f} ms")

    # ---- 5. pallas kernel single-tile latency (B=1 padded to 128) ----
    if pallas_available():
        qp1 = jax.tree.map(lambda a: a[None], qp0)  # add batch axis B=1
        for iters in (6, 12):
            log(f"probe: compile pallas B=1 iters={iters}")

            @jax.jit
            def pl_chain(qp, it=iters):
                def body(carry, _):
                    data = qp._replace(dx0=qp.dx0 + 1e-9 * carry)
                    sol = pallas_box_qp_solve(data, iters=it)
                    return sol.du[0, 0, 0], None
                c, _ = jax.lax.scan(body, qp.dx0[0, 0] * 0, None, length=K)
                return c
            try:
                ms = timeit(lambda: pl_chain(qp1)) / K * 1e3
                results[f"qp_pallas_b1_iters{iters}_ms"] = ms
                log(f"probe: pallas B=1 iters={iters} = {ms:.3f} ms")
            except Exception as e:
                results[f"qp_pallas_b1_iters{iters}_error"] = str(e)[:200]
                log(f"probe: pallas B=1 iters={iters} FAILED: {e}")

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
