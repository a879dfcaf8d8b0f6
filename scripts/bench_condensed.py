"""TPU latency A/B: full-horizon Riccati IPM vs partial condensing.

Measures a single-trajectory jitted RTI tick (linearize + QP + update) on
the real chip for the sim preset (N=60) and the flight preset size (N=30),
across condensing block sizes. Prints one JSON object per config.

Run on the TPU (background; first compiles go through the tunnel):
    python scripts/bench_condensed.py
"""
# TIMING CAVEAT (round 3): this script predates the discovery that
# jax.block_until_ready does NOT reliably wait on the axon tunnel platform.
# Its absolute wall-clock numbers are unreliable; use
# mpc_blaster_tpu.utils.timing.device_time (fetch-based) for new work.
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import init_rti_state, make_rti_step


def bench_tick(ocp, label, iters=200):
    spec = build_spec(ocp, dtype=jnp.float32)
    x0 = np.zeros(cfg.NX, np.float32)
    x0[2] = 2.0
    x0 = jnp.asarray(x0)
    step = make_rti_step(ocp, dtype=jnp.float32)
    state = init_rti_state(ocp, x0, jnp.float32)
    t0 = time.time()
    u0, state, diag = step(spec, state, x0)
    jax.block_until_ready(u0)
    compile_s = time.time() - t0
    # warm
    for _ in range(5):
        u0, state, diag = step(spec, state, x0)
    jax.block_until_ready(u0)
    t0 = time.time()
    for _ in range(iters):
        u0, state, diag = step(spec, state, x0)
    jax.block_until_ready(u0)
    dt = (time.time() - t0) / iters
    out = {
        "config": label, "N": ocp.N, "backend": ocp.solver.qp_backend,
        "cond_M": ocp.solver.cond_M if ocp.solver.qp_backend == "condensed"
        else None,
        "tick_ms": round(dt * 1e3, 3), "hz": round(1.0 / dt, 1),
        "kkt_stat": float(diag.qp_kkt_stat), "kkt_eq": float(diag.qp_kkt_eq),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    sim = cfg.simulation_preset().ocp          # N=60
    fl = cfg.flight_preset().ocp               # N=30
    for name, ocp in (("sim60", sim), ("flight30", fl)):
        bench_tick(ocp, f"{name}-riccati")
        for M in (4, 5, 6, 10) if ocp.N == 60 else (5, 6):
            c = dataclasses.replace(
                ocp, solver=dataclasses.replace(
                    ocp.solver, qp_backend="condensed", cond_M=M))
            bench_tick(c, f"{name}-cond{M}")


if __name__ == "__main__":
    sys.exit(main())
