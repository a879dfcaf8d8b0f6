"""r5 attribution: component timing of the batched rt6 tick on hardware.

  lin    linearizer-only chain (tuple-rows fastlin, B=1024, K=10)
  kern   kernel-only chain (fixed QPData, 8 solves)
  fusedt full fused-assembly tick chain (from probe_r5_batched_fused)

Purpose: replace the r4 ROADMAP claim (~1.9 ms/pass host assembly) with
measured numbers at the 6-iteration deployed budget.
"""
import dataclasses
import os
import sys
import json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams
    from mpc_blaster_tpu.dynamics.fastlin import fast_linearize
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.ops.pallas_ipm import (pallas_available,
                                                pallas_box_qp_solve)
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state
    from mpc_blaster_tpu.utils.timing import device_time
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.dynamics.blaster import blaster_ode

    assert pallas_available()
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(
        preset.ocp, N=20, Tf=20 / 30.0,
        solver=dataclasses.replace(preset.ocp.solver, ipm_iters=6,
                                   lin_backend="fused"))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    rng = np.random.default_rng(0)
    B, K = 1024, 10
    x0s = np.zeros((B, cfg.NX), np.float32)
    x0s[:, 0:3] = rng.uniform(-0.4, 0.4, (B, 3))
    x0s[:, 2] += 2.0
    x0s = jnp.asarray(x0s)
    states0 = jax.vmap(lambda x: init_rti_state(ocp, x, dtype))(x0s)
    out = {}

    # (a) linearizer-only chain
    @jax.jit
    def lin_chain(xbar, ubar):
        def body(carry, _):
            xb, ub = carry
            xp, A, Bm = jax.vmap(
                lambda x, u: fast_linearize(x, u, spec.stage_params,
                                            params, ocp.dt, 1))(xb, ub)
            # feed something back so the scan can't collapse
            xb = xb + 1e-6 * xp.sum() * 0.0 + 0.0 * xb
            return (xb + 1e-9 * jnp.tanh(A.sum() + Bm.sum()), ub), 0
        (xb, ub), _ = jax.lax.scan(body, (xbar, ubar), None, length=K)
        return xb
    print("compiling lin...", flush=True)
    dt = device_time(lambda: lin_chain(states0.xbar, states0.ubar), reps=3)
    out["lin_ms_per_pass"] = dt / K * 1e3
    print(f"lin: {out['lin_ms_per_pass']:.3f} ms/pass", flush=True)

    # (b) kernel-only chain on a fixed QP
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    qp_b = jax.jit(jax.vmap(
        lambda st, x: build_qp(spec, st, x, F, params)))(states0, x0s)

    @jax.jit
    def kern_chain(qp):
        def body(q, _):
            sol = pallas_box_qp_solve(q, iters=6, mu0=0.1,
                                      alpha_frac=0.995, reg=1e-6)
            q = q._replace(dx0=q.dx0 + 1e-9 * jnp.tanh(sol.dx[:, 0]))
            return q, sol.kkt_eq[0]
        q, eqs = jax.lax.scan(body, qp, None, length=K)
        return eqs
    print("compiling kern...", flush=True)
    dt = device_time(lambda: kern_chain(qp_b), reps=3)
    out["kern_ms_per_pass"] = dt / K * 1e3
    print(f"kern: {out['kern_ms_per_pass']:.3f} ms/pass", flush=True)

    print(json.dumps({k: round(v, 4) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
