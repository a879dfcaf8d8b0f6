"""Latency breakdown of one deployed RTI tick on the real chip.

Times (chained x32 inside one jit, so dispatch is amortized):
  lin   - build_qp only (linearize + cost assembly)
  qp_p  - Pallas IPM solve only (6 iters) on a fixed QP
  qp_x  - XLA Riccati IPM solve only (6 iters)
  tick  - full rt6 tick (make_closed_loop path)

Run:  nohup python scripts/profile_tick.py > /tmp/profile_tick.log 2>&1 &
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

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import (init_rti_state, build_qp,
                                     solve_qp_backend)
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.sim.closedloop import make_closed_loop

K = 32


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / K * 1e3  # ms per unit


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)

    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0).at[0].set(0.3)
    st = init_rti_state(ocp, x0, dtype)
    sol_rt6 = dataclasses.replace(ocp.solver, ipm_iters=6,
                                  qp_backend="pallas")
    sol_rt6x = dataclasses.replace(ocp.solver, ipm_iters=6,
                                   qp_backend="riccati")

    # ---- lin: chained build_qp (carry the defect back into xbar) ----
    @jax.jit
    def lin_chain(spec, st, x0):
        def body(carry, _):
            stc = carry
            qp = build_qp(spec, stc, x0, F, params)
            stc = stc._replace(xbar=stc.xbar + 1e-9 * jnp.sum(qp.c))
            return stc, qp.c[0, 0]
        stc, ys = jax.lax.scan(body, st, None, length=K)
        return ys

    print("compiling lin...", flush=True)
    t = timeit(lambda: lin_chain(spec, st, x0))
    print(f"lin            = {t:.3f} ms", flush=True)

    # ---- qp-only on a fixed QP (serialized via carry into r) ----
    qp0 = jax.jit(lambda spec, st, x0: build_qp(spec, st, x0, F, params))(
        spec, st, x0)
    qp0 = jax.block_until_ready(qp0)

    for name, solv in (("qp_pallas", sol_rt6), ("qp_xla", sol_rt6x)):
        @jax.jit
        def qp_chain(qp, solv=solv):
            def body(carry, _):
                qpc = qp._replace(r=qp.r + 1e-12 * carry)
                sol = solve_qp_backend(qpc, solv)
                return jnp.sum(sol.du[0]), sol.mu
            ys, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return ys

        print(f"compiling {name}...", flush=True)
        t = timeit(lambda: qp_chain(qp0))
        print(f"{name:14s} = {t:.3f} ms", flush=True)

    # ---- fused component-form linearizer (dynamics/fastlin.py) ----
    from mpc_blaster_tpu.dynamics.fastlin import fast_linearize

    @jax.jit
    def flin_chain(xbar, ubar, sp):
        def body(carry, _):
            xb = carry
            xn, A, B = fast_linearize(xb, ubar, sp, params, ocp.dt)
            xb = xb + 1e-9 * jnp.sum(xn)
            return xb, xn[0, 0]
        _, ys = jax.lax.scan(body, xbar, None, length=K)
        return ys

    print("compiling fastlin...", flush=True)
    t = timeit(lambda: flin_chain(st.xbar, st.ubar, spec.stage_params))
    print(f"fastlin        = {t:.3f} ms", flush=True)

    # ---- full deployed tick ----
    sol_rt6f = dataclasses.replace(sol_rt6, lin_backend="fused")
    for name, solv in (("tick_pallas", sol_rt6),
                       ("tick_pallas_flin", sol_rt6f),
                       ("tick_xla", sol_rt6x)):
        ocp_rt = dataclasses.replace(ocp, solver=solv)
        runner = make_closed_loop(ocp_rt, K, dtype=dtype)
        print(f"compiling {name}...", flush=True)
        t = timeit(lambda: runner(spec, x0))
        print(f"{name:14s} = {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
