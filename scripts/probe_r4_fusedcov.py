"""r4 fused-coverage hardware validation: the three paths that gained
single-kernel fusion this round, each in its deployed nesting (house
policy after the r3 CSE-aliasing lesson): soft+fused chain (rt6f_soft),
quad13 fused hover chain (quad13f), and the B=1 offset-free loop on the
"blaster_dist" family. Incremental JSONL to stderr."""
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
from mpc_blaster_tpu.sqp.rti import (init_rti_state,           # noqa: E402
                                     fused_dyn_statics, rti_step_soft)
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
    K2 = 32
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    ocp = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)

    # ---- 1) soft + fused single-kernel chain ----
    try:
        from mpc_blaster_tpu.dynamics.blaster import (BlasterParams,
                                                      blaster_ode)
        from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
        from mpc_blaster_tpu.qp.soft import SoftBounds
        params_s = BlasterParams.from_config(ocp.model, dtype)
        F_s = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        soft_b = SoftBounds.state_bounds(ocp.N, cfg.NX, cfg.NU, Zl=1e3,
                                         zl=1e2, dtype=dtype)
        sv_sf = dataclasses.replace(ocp.solver, qp_backend="pallas_fused",
                                    ipm_iters=6)
        dyn_sf = fused_dyn_statics(ocp, 1)

        @jax.jit
        def soft_chain_f(spec_a, st0, xa, soft_a):
            def body(carry, _):
                st, x = carry
                u0, st, diag, res = rti_step_soft(
                    spec_a, st, x, params_s, F_s, sv_sf, soft_a,
                    dyn_statics=dyn_sf)
                x = F_s(x, u0, spec_a.stage_params[0], params_s)
                return (st, x), u0[0]
            (st, x), _ = jax.lax.scan(body, (st0, xa), None, length=K2)
            return x
        st_sf = init_rti_state(ocp, x0, dtype)
        t0 = time.time()
        xe = np.asarray(soft_chain_f(spec, st_sf, x0, soft_b))
        emit("rt6f_soft_finite", bool(np.isfinite(xe).all()))
        log(f"soft fused compile+first {time.time()-t0:.0f}s")
        lat = device_time(lambda: soft_chain_f(spec, st_sf, x0, soft_b),
                          reps=8) / K2
        emit("rt6f_soft_ms", round(lat * 1e3, 4))
        emit("rt6f_soft_hz", round(1.0 / lat, 1))
    except Exception as e:
        emit("rt6f_soft_error", " ".join(str(e).split())[:300])

    # ---- 2) quad13 fused hover chain ----
    try:
        from mpc_blaster_tpu.models.quad13 import (
            Quad13Config, build_quad13_spec, hover_state,
            init_quad13_rti_state, make_quad13_rti_step)
        qc = Quad13Config(N=20)
        qspec = build_quad13_spec(qc, dtype=dtype)
        qx0 = hover_state(1.0, dtype)
        qst = init_quad13_rti_state(qc, qx0, dtype)
        qsv_f = dataclasses.replace(cfg.SolverConfig(), ipm_iters=6,
                                    qp_backend="pallas_fused")
        qstep_f = make_quad13_rti_step(qc, dtype=dtype, jit=False,
                                       solver=qsv_f)

        @jax.jit
        def qchain_f(spec_q, st, x):
            def body(st, _):
                u0, st, _ = qstep_f(spec_q, st, x)
                return st, u0[0]
            st, _ = jax.lax.scan(body, st, None, length=K2)
            return st
        t0 = time.time()
        ste = qchain_f(qspec, qst, qx0)
        ok = bool(np.isfinite(np.asarray(ste.xbar)).all())
        emit("quad13f_finite", ok)
        log(f"quad13 fused compile+first {time.time()-t0:.0f}s")
        qlat = device_time(lambda: qchain_f(qspec, qst, qx0), reps=5) / K2
        emit("quad13f_ms", round(qlat * 1e3, 4))
        emit("quad13f_hz", round(1.0 / qlat, 1))
    except Exception as e:
        emit("quad13f_error", " ".join(str(e).split())[:300])

    # ---- 3) offset-free fused loop (blaster_dist family) ----
    try:
        from mpc_blaster_tpu.sim.scenarios import offset_free_loop
        ocp_of = dataclasses.replace(
            ocp, solver=dataclasses.replace(ocp.solver,
                                            qp_backend="pallas_fused",
                                            ipm_iters=6))
        wind = jnp.asarray([0.7, -0.5, 0.2], dtype)
        runner = jax.jit(lambda s, x: offset_free_loop(
            s, ocp_of, x, wind, n_steps=100))
        t0 = time.time()
        res = runner(spec, x0)
        xs = np.asarray(res.xs)
        emit("offsetfree_fused_finite", bool(np.isfinite(xs).all()))
        log(f"offset-free fused compile+first {time.time()-t0:.0f}s")
        err = float(np.linalg.norm(xs[-1, 0:3] - [0.0, 0.0, 3.5]))
        emit("offsetfree_fused_settle_err_m", round(err, 4))
        d = np.asarray(res.d_hist[-1, 0:3])
        emit("offsetfree_fused_dvec", [round(float(v), 3) for v in d])
        lat = device_time(lambda: runner(spec, x0), reps=4) / 100
        emit("offsetfree_fused_tick_ms", round(lat * 1e3, 4))
        emit("offsetfree_fused_tick_hz", round(1.0 / lat, 1))
    except Exception as e:
        emit("offsetfree_fused_error", " ".join(str(e).split())[:300])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
