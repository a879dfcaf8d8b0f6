"""Hardware A/B: single-kernel fused RTI tick (qp_backend="pallas_fused")
vs the r3 two-kernel deployed path (fused XLA linearizer + Pallas IPM).

The r3 reference numbers (honest fetch-based timing, utils/timing.py):
  rt6 N=20 = 0.557 ms (1797 Hz), rt6 N=30 = 0.89 ms (1119 Hz),
  rt6 N=60 = 1.47 ms (676 Hz), warm3shift N=20 = 0.377 ms (2652 Hz),
  fig8 rt6 settle = 0.0388 m.

Run on the real chip (NO platform override); incremental JSONL to stderr
so partial runs are usable. Compiles go through the tunnel (minutes).
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

    def run_row(name, N, iters, backend, warm=False, warm_mode="full",
                warm_shift=False, K=32, reps=8):
        ocp_n = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        sv = dataclasses.replace(ocp_n.solver, ipm_iters=iters,
                                 qp_backend=backend, lin_backend="fused",
                                 warm_mode=warm_mode, warm_shift=warm_shift)
        ocp_rt = dataclasses.replace(ocp_n, solver=sv)
        spec_n = build_spec(ocp_rt, yref=preset.loop.yref, dtype=dtype)
        runner = make_closed_loop(ocp_rt, K, dtype=dtype, warm_start=warm)
        t0 = time.time()
        res = runner(spec_n, x0)  # compile + run
        ok = bool(np.isfinite(np.asarray(res.xs)).all())
        log(f"{name}: compile+first {time.time()-t0:.1f}s finite={ok}")
        lat = device_time(lambda: runner(spec_n, x0), reps=reps) / K
        emit(name + "_ms", round(lat * 1e3, 4))
        emit(name + "_hz", round(1.0 / lat, 1))
        emit(name + "_finite", ok)
        # closed-loop endpoint sanity: both paths should settle to the
        # same hover point (parity stronger than latency alone)
        emit(name + "_z_end", round(float(res.xs[-1, 2]), 4))
        return res

    # 1) the headline: rt6 N=20 single-kernel tick
    run_row("fused_rt6_n20", 20, 6, "pallas_fused")
    # 2) old path, same session (fresh numbers for honest A/B)
    run_row("twokernel_rt6_n20", 20, 6, "pallas")
    # 3) fastest deployed profile on the fused tick
    run_row("fused_warm3shift_n20", 20, 3, "pallas_fused", warm=True,
            warm_mode="primal", warm_shift=True)
    # 4) north-star config N=30
    run_row("fused_rt6_n30", 30, 6, "pallas_fused")
    # 5) flagship N=60 fully-resident fused
    run_row("fused_rt6_n60", 60, 6, "pallas_fused")

    # 6) figure-8 quality parity of the fused tick (same metric as bench)
    try:
        from mpc_blaster_tpu.sim.tasks import run_figure8
        ocp20 = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
        sv = dataclasses.replace(ocp20.solver, ipm_iters=6,
                                 qp_backend="pallas_fused",
                                 lin_backend="fused")
        ocp_rt = dataclasses.replace(ocp20, solver=sv)
        preset_f = dataclasses.replace(preset, ocp=ocp_rt)
        fig = run_figure8(preset_f, n_steps=220, dtype=dtype)
        xs = np.asarray(fig.xs)
        refs = np.asarray(fig.refs)
        err = np.linalg.norm(xs[1:, 0:2] - refs[:, 0:2], axis=1)
        emit("fused_fig8_rt6_settle_err_m", round(float(err[60:].max()), 4))
    except Exception as e:  # pragma: no cover
        emit("fig8_error", str(e)[:300])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
