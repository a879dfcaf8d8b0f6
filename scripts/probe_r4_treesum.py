"""r4 ALU-packing A/B: tree-summed accumulations (_contractT/_chol dot
products) vs the r3 serial-accumulate kernel. Measures the kernel-only
6-iteration chains (the roofline rows) and the deployed rt6 tick at
N=20/30/60, plus a scan-free N=240 latency (the K>=4 timing scan at
N=240 crashes the remote compile helper; repeated dispatch of the single
solve needs no scan). Compare against BENCH_r03 / this morning's rows:
kernel6_n20 0.416 ms, n30 0.66, n60 1.273-1.3175; rt6f_n60 1.352 ms."""
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
from mpc_blaster_tpu.ops.roofline import speed_of_light        # noqa: E402
from mpc_blaster_tpu.sim.closedloop import make_closed_loop    # noqa: E402
from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state   # noqa: E402
from mpc_blaster_tpu.utils.timing import device_time, measure_rtt  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


results = {}


def emit(k, v):
    results[k] = v
    log(json.dumps({k: v}))


def main():
    dtype = jnp.float32
    log(f"device: {jax.devices()[0]}, RTT {measure_rtt()*1e3:.2f} ms")
    preset = cfg.simulation_preset()
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    K2 = 32

    def qp_for(N):
        ocp_n = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp_n, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp_n.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp_n.dt, num_steps=1)
        st = init_rti_state(ocp_n, x0, dtype)
        qp = build_qp(spec, st, x0, F, params)
        return jax.tree.map(lambda a: a[None], qp), ocp_n, spec

    # ---- kernel-only chains (roofline rows) ----
    for N_k in (20, 30, 60):
        try:
            qpb, _, _ = qp_for(N_k)

            @jax.jit
            def kchain(q):
                def body(q, _):
                    sol = pallas_box_qp_solve(q, iters=6)
                    q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                    return q, sol.kkt_eq[0]
                q, eqs = jax.lax.scan(body, q, None, length=K2)
                return eqs
            t0 = time.time()
            eqs = np.asarray(kchain(qpb))
            log(f"kernel N={N_k}: compile+first {time.time()-t0:.0f}s "
                f"eq={eqs[-1]:.2e}")
            kt = device_time(lambda: kchain(qpb), reps=5) / K2
            r = speed_of_light(N_k, cfg.NX, cfg.NU, 6, kt)
            emit(f"kernel6_n{N_k}_ms", round(kt * 1e3, 4))
            emit(f"kernel6_n{N_k}_model_frac", round(r["model_frac"], 3))
        except Exception as e:
            emit(f"kernel6_n{N_k}_error", " ".join(str(e).split())[:200])

    # ---- deployed rt6 ticks ----
    for N_k, backend in ((20, "pallas_fused"), (60, "pallas_fused")):
        try:
            ocp_n = dataclasses.replace(preset.ocp, N=N_k, Tf=N_k / 30.0)
            sv = dataclasses.replace(ocp_n.solver, ipm_iters=6,
                                     qp_backend=backend,
                                     lin_backend="fused")
            ocp_rt = dataclasses.replace(ocp_n, solver=sv)
            spec_n = build_spec(ocp_rt, yref=preset.loop.yref, dtype=dtype)
            runner = make_closed_loop(ocp_rt, K2, dtype=dtype)
            t0 = time.time()
            res = runner(spec_n, x0)
            ok = bool(np.isfinite(np.asarray(res.xs)).all())
            log(f"rt6f N={N_k}: compile+first {time.time()-t0:.0f}s "
                f"finite={ok}")
            lat = device_time(lambda: runner(spec_n, x0), reps=8) / K2
            emit(f"rt6f_n{N_k}_ms", round(lat * 1e3, 4))
            emit(f"rt6f_n{N_k}_hz", round(1.0 / lat, 1))
            emit(f"rt6f_n{N_k}_z_end", round(float(res.xs[-1, 2]), 4))
        except Exception as e:
            emit(f"rt6f_n{N_k}_error", " ".join(str(e).split())[:200])

    # ---- N=240 latency WITHOUT a scan (timing via repeated dispatch) ----
    try:
        qp240, _, _ = qp_for(240)
        f240 = jax.jit(lambda q: pallas_box_qp_solve(q, iters=6).kkt_eq)
        t0 = time.time()
        eq = float(np.asarray(f240(qp240))[0])
        log(f"N=240 single: compile+first {time.time()-t0:.0f}s eq={eq:.2e}")
        emit("n240_kkt_eq", round(eq, 6))
        kt = device_time(lambda: f240(qp240), reps=8)
        emit("n240_solve_ms", round(kt * 1e3, 4))
    except Exception as e:
        emit("n240_error", " ".join(str(e).split())[:200])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
