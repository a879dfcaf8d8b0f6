"""r4 item 4: hardware-validate the chunked HBM streaming path (it became
dead weight for N<=120 after the r3 VMEM discovery made everything
resident) and re-attempt N=240 (r3: 'fails to compile through the tunnel,
cause opaque' — candidate root cause is the same scoped-vmem stack
underprovisioning fixed this round).

A/B at N=60: forced stream_big vs resident on the SAME QP — objective
parity + latency vs the HBM floor. Then N=120/N=240 forced-stream solves.
Incremental JSONL to stderr."""
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
from mpc_blaster_tpu.dynamics.blaster import (BlasterParams,   # noqa: E402
                                              blaster_ode)
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics  # noqa: E402
from mpc_blaster_tpu.ocp.spec import build_spec                # noqa: E402
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve  # noqa: E402
from mpc_blaster_tpu.qp.data import qp_objective               # noqa: E402
from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state   # noqa: E402
from mpc_blaster_tpu.utils.timing import device_time, measure_rtt  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


results = {}


def emit(k, v):
    results[k] = v
    log(json.dumps({k: v}))


def qp_for(N, dtype=jnp.float32):
    preset = cfg.simulation_preset()
    ocp_n = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp_n, yref=preset.loop.yref, dtype=dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    params = BlasterParams.from_config(ocp_n.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp_n.dt, num_steps=1)
    st = init_rti_state(ocp_n, x0, dtype)
    qp = build_qp(spec, st, x0, F, params)
    return jax.tree.map(lambda a: a[None], qp)


def run_cfg(name, qpb, stream_p, stream_big, reps=5, K=16):
    @jax.jit
    def chain(q):
        def body(q, _):
            sol = pallas_box_qp_solve(q, iters=6, stream_p=stream_p,
                                      stream_big=stream_big)
            q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
            return q, sol.kkt_eq[0]
        q, eqs = jax.lax.scan(body, q, None, length=K)
        return eqs

    try:
        t0 = time.time()
        sol = pallas_box_qp_solve(qpb, iters=6, stream_p=stream_p,
                                  stream_big=stream_big)
        obj = float(qp_objective(jax.tree.map(lambda a: a[0], qpb),
                                 sol.dx[0], sol.du[0]))
        ok = bool(np.isfinite(np.asarray(sol.dx)).all())
        emit(name + "_obj", round(obj, 6))
        emit(name + "_finite", ok)
        emit(name + "_kkt_eq", round(float(sol.kkt_eq[0]), 6))
        log(f"{name}: compile+first {time.time()-t0:.0f}s")
        kt = device_time(lambda: chain(qpb), reps=reps) / K
        emit(name + "_ms", round(kt * 1e3, 4))
        return obj
    except Exception as e:
        emit(name + "_error", " ".join(str(e).split())[:300])
        return None


def main():
    log(f"device: {jax.devices()[0]}, RTT {measure_rtt()*1e3:.2f} ms")

    # ---- N=60 A/B: resident vs forced stream ----
    qp60 = qp_for(60)
    o_res = run_cfg("n60_resident", qp60, False, False)
    o_sp = run_cfg("n60_stream_p", qp60, True, False)
    o_sb = run_cfg("n60_stream_big", qp60, True, True)
    if o_res is not None:
        for nm, o in (("stream_p", o_sp), ("stream_big", o_sb)):
            if o is not None:
                emit(f"n60_{nm}_obj_relerr",
                     round(abs(o - o_res) / max(abs(o_res), 1e-9), 8))

    # ---- long horizons: N=120 resident (r3 envelope), N=240 ----
    qp120 = qp_for(120)
    run_cfg("n120_resident", qp120, False, False, reps=3, K=8)
    qp240 = qp_for(240)
    # auto config (the byte model decides; at N=240 resident ~ 140+ MB
    # so streaming should engage)
    run_cfg("n240_auto", qp240, None, None, reps=3, K=4)
    run_cfg("n240_stream_big", qp240, True, True, reps=3, K=4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
