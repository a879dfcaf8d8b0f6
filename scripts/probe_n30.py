"""Hardware probe: where does the N=30 north-star config stand?

Measures on the real chip, B=1 deployed path:
  - Pallas IPM kernel-only latency (iters=6) at N=30 under
    (stream_p, stream_big) in {(T,T) current default, (T,F), (F,F)};
  - linearization-only latency (jacfwd vs fused backends);
  - full rt6 closed-loop tick at N=20 / N=30 / N=60 (current defaults).

Writes findings to stdout; run under `timeout` in the background (first
TPU compile goes through the tunnel: minutes).
"""
import dataclasses
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

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import (init_rti_state, build_qp,
                                     make_linearizer)
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
from mpc_blaster_tpu.sim.closedloop import make_closed_loop


def timeit(fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()

    for N in (20, 30, 60):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
        state = init_rti_state(ocp, x0, dtype)
        qp = build_qp(spec, state, x0, F, params)
        qpb = jax.tree.map(lambda a: a[None], qp)

        # --- kernel-only latency under streaming configs ---
        combos = [(None, None)]
        if N == 30:
            combos += [(True, False), (False, False)]
        if N == 20:
            combos += [(True, False)]
        for sp, sb in combos:
            label = f"N={N} stream_p={sp} stream_big={sb}"
            try:
                run = jax.jit(lambda q: pallas_box_qp_solve(
                    q, iters=6, stream_p=sp, stream_big=sb).du)
                dt = timeit(lambda: run(qpb))
                print(f"kernel {label}: {dt*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"kernel {label}: FAILED {str(e)[:300]}", flush=True)

        # --- linearization-only latency ---
        for lb in ("jacfwd", "fused"):
            ocp_l = dataclasses.replace(
                ocp, solver=dataclasses.replace(ocp.solver, lin_backend=lb))
            lin = make_linearizer(ocp_l, params)
            run = jax.jit(lambda st, x: build_qp(
                spec, st, x, F, params, linearizer=lin).c)
            dt = timeit(lambda: run(state, x0))
            print(f"lin+buildqp N={N} {lb}: {dt*1e3:.3f} ms", flush=True)

        # --- full deployed rt6 tick (current defaults) ---
        for lb in ("jacfwd", "fused"):
            ocp_rt = dataclasses.replace(
                ocp, solver=dataclasses.replace(
                    ocp.solver, ipm_iters=6, qp_backend="pallas",
                    lin_backend=lb))
            K = 16
            runner = make_closed_loop(ocp_rt, K, dtype=dtype)
            lat = timeit(lambda: runner(spec, x0), reps=5) / K
            print(f"rt6 N={N} lin={lb}: {lat*1e3:.3f} ms "
                  f"({1.0/lat:.0f} Hz)", flush=True)


if __name__ == "__main__":
    main()
