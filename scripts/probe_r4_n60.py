"""Round-4 item 1b: re-prove the flagship fused N=60 row on hardware
against the COMMITTED tree (the r3 end-of-round bench recorded
rt6f_n60_solve_hz = 0.0 with "HTTP 500: tpu_compile_helper subprocess
exit code 1" after 462c5fa moved cost/bound/dx0 assembly in-kernel;
N=20/N=30 fused passed in the same run, so the failure is N=60-shaped).

Runs exactly the bench.py rt6f_n60 configuration (closed_loop K=32 scan,
simulation preset N=60/Tf=2.0) with retry-on-transient so a one-off
tunnel flake doesn't masquerade as a compile bug. Incremental JSONL to
stderr; final dict to stdout.
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
from mpc_blaster_tpu.sim.closedloop import make_closed_loop    # noqa: E402
from mpc_blaster_tpu.utils.timing import device_time, measure_rtt  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dtype = jnp.float32
    log(f"device: {jax.devices()[0]}, RTT {measure_rtt()*1e3:.2f} ms")
    preset = cfg.simulation_preset()
    results = {}

    def emit(k, v):
        results[k] = v
        log(json.dumps({k: v}))

    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    K = 32

    def run_row(name, N, backend, attempts=3):
        ocp_n = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        sv = dataclasses.replace(ocp_n.solver, ipm_iters=6,
                                 qp_backend=backend, lin_backend="fused")
        ocp_rt = dataclasses.replace(ocp_n, solver=sv)
        spec_n = build_spec(ocp_rt, yref=preset.loop.yref, dtype=dtype)
        runner = make_closed_loop(ocp_rt, K, dtype=dtype)
        last = None
        for a in range(attempts):
            try:
                t0 = time.time()
                res = runner(spec_n, x0)
                # fetch (NOT block_until_ready — unreliable on axon)
                ok = bool(np.isfinite(np.asarray(res.xs)).all())
                log(f"{name}: attempt {a}: compile+first "
                    f"{time.time()-t0:.1f}s finite={ok}")
                lat = device_time(lambda: runner(spec_n, x0), reps=8) / K
                emit(name + "_ms", round(lat * 1e3, 4))
                emit(name + "_hz", round(1.0 / lat, 1))
                emit(name + "_finite", ok)
                emit(name + "_z_end", round(float(res.xs[-1, 2]), 4))
                emit(name + "_attempts", a + 1)
                return
            except Exception as e:
                last = " ".join(str(e).split())[:300]
                log(f"{name}: attempt {a} FAILED: {last}")
                time.sleep(10)
        emit(name + "_error", last)

    run_row("rt6f_n60", 60, "pallas_fused")
    # control row: the two-kernel path at the same config (known good)
    run_row("rt6_n60", 60, "pallas", attempts=1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
