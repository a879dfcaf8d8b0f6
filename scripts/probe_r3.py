"""Round-3 hardware A/B: chunked-DMA kernel + warm-start conditioning.

1. New-kernel latency: rt6 ticks at N=20/30/60 and kernel-only chains
   (the round-3 kernel fuses the req sweep into the KKT sweep and streams
   HBM in double-buffered chunks — this run quantifies both).
2. Correctness on hardware: streamed N=60 objective vs the XLA path.
3. Warm-start study: figure-8 settle error + latency for cold vs
   conditioned warm chains (full / primal / centrality x shift).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu.utils.timing import device_time, measure_rtt
from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec, total_cost
from mpc_blaster_tpu.sqp.rti import init_rti_state, build_qp
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
from mpc_blaster_tpu.qp.ipm import box_qp_solve
from mpc_blaster_tpu.sim.closedloop import make_closed_loop
from mpc_blaster_tpu.sim.tasks import run_figure8


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    K = 32
    print(f"RTT floor: {measure_rtt()*1e3:.2f} ms", flush=True)

    # ---------- 1+2: kernel & tick latency, hardware correctness ----------
    for N in (20, 30, 60):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
        state = init_rti_state(ocp, x0, dtype)
        qp = build_qp(spec, state, x0, F, params)
        qpb = jax.tree.map(lambda a: a[None], qp)

        @jax.jit
        def chain(qp0):
            def body(q, _):
                sol = pallas_box_qp_solve(q, iters=6)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                return q, sol.kkt_eq[0]
            q, eqs = jax.lax.scan(body, qp0, None, length=K)
            return eqs
        try:
            dt = device_time(lambda: chain(qpb), reps=10) / K
            print(f"kernel6 N={N}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"kernel6 N={N}: FAILED {str(e)[:200]}", flush=True)

        if N == 60:  # objective parity of the streamed kernel vs XLA
            solp = pallas_box_qp_solve(qpb, iters=10)
            solx = box_qp_solve(qp, iters=10)
            stp = jax.tree.map(lambda a: a[0], solp)
            op = total_cost(spec, state.xbar + stp.dx, state.ubar + stp.du)
            ox = total_cost(spec, state.xbar + solx.dx,
                            state.ubar + solx.du)
            print(f"N=60 obj pallas={float(op):.6f} xla={float(ox):.6f} "
                  f"rel={abs(float(op-ox))/abs(float(ox)):.2e}", flush=True)

        for iters in (6,):
            ocp_rt = dataclasses.replace(
                ocp, solver=dataclasses.replace(
                    ocp.solver, ipm_iters=iters, qp_backend="pallas",
                    lin_backend="fused"))
            try:
                runner = make_closed_loop(ocp_rt, K, dtype=dtype)
                lat = device_time(lambda: runner(spec, x0), reps=10) / K
                print(f"rt{iters} N={N}: {lat*1e3:.3f} ms "
                      f"({1.0/lat:.0f} Hz)", flush=True)
            except Exception as e:
                print(f"rt{iters} N={N}: FAILED {str(e)[:200]}", flush=True)

    # ---------------- 3: warm-start conditioning study -------------------
    N = 20
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)

    def fig8_err(ocp_c, warm):
        preset_c = dataclasses.replace(preset, ocp=ocp_c)
        fig = run_figure8(preset_c, n_steps=220, dtype=dtype,
                          warm_start=warm)
        xs = np.asarray(fig.xs)
        refs = np.asarray(fig.refs)
        err = np.linalg.norm(xs[1:, 0:2] - refs[:, 0:2], axis=1)
        return float(err[60:].max())

    rows = [("cold", 6, None, False), ("cold", 4, None, False),
            ("full", 4, "full", False),
            ("primal", 4, "primal", False),
            ("centrality", 4, "centrality", False),
            ("primal_shift", 4, "primal", True),
            ("centrality_shift", 4, "centrality", True),
            ("primal", 3, "primal", False),
            ("centrality", 3, "centrality", False)]
    for label, iters, mode, shift in rows:
        sv = dataclasses.replace(
            ocp.solver, ipm_iters=iters, qp_backend="pallas",
            lin_backend="fused",
            warm_mode=mode or "full", warm_shift=shift)
        ocp_c = dataclasses.replace(ocp, solver=sv)
        warm = mode is not None
        try:
            err = fig8_err(ocp_c, warm)
            runner = make_closed_loop(ocp_c, K, dtype=dtype,
                                      warm_start=warm)
            lat = device_time(lambda: runner(spec, x0), reps=10) / K
            print(f"warmstudy {label} iters={iters}: fig8={err:.4f} m  "
                  f"tick={lat*1e3:.3f} ms ({1.0/lat:.0f} Hz)", flush=True)
        except Exception as e:
            print(f"warmstudy {label} iters={iters}: FAILED "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
