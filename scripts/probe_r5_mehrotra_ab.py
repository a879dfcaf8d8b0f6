"""r5 roofline-lever A/B (VERDICT item 6): the predictor/corrector
"lane-packing" idea has no algorithmically coherent form — the corrector
RHS is built FROM the predictor's directions (Mehrotra targets), so the
two sweeps cannot run concurrently on disjoint lanes without changing
the algorithm. The controlled version of that change IS measurable: a
single-solve iteration (skip the predictor; fixed centering sigma=0.1,
no Gondzio clipping) halves the per-iteration RHS sweeps. This probe
measures, on hardware, what the halved sweeps buy in time and cost in
convergence on the bench QP (sim preset, N=20, B=1).

Run on TPU: python scripts/probe_r5_mehrotra_ab.py
"""
import dataclasses
import os
import sys

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
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.ops.pallas_ipm import (pallas_available,
                                                pallas_box_qp_solve)
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state
    from mpc_blaster_tpu.utils.timing import device_time

    assert pallas_available()
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=jnp.float32)
    params = BlasterParams.from_config(ocp.model, jnp.float32)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(2.0).at[0].set(0.3)
    st = init_rti_state(ocp, x0, jnp.float32)
    qpb = jax.tree.map(lambda a: a[None],
                       jax.jit(lambda s, x: build_qp(spec, s, x, F,
                                                     params))(st, x0))

    def chain(iters, mehrotra, K=16):
        @jax.jit
        def f(q):
            def body(q, _):
                sol = pallas_box_qp_solve(q, iters=iters,
                                          mehrotra=mehrotra)
                q = q._replace(dx0=q.dx0 + 1e-9 * jnp.tanh(sol.dx[:, 0]))
                return q, sol.mu[0]
            _, mus = jax.lax.scan(body, q, None, length=K)
            return mus
        return f, K

    for mehrotra in (True, False):
        for iters in ((6, 12) if mehrotra else (6, 12, 24, 48)):
            f, K = chain(iters, mehrotra)
            mus = np.asarray(f(qpb))
            t = device_time(lambda: f(qpb), reps=3) / K
            tag = "mehrotra" if mehrotra else "single-solve"
            print(f"{tag:12s} iters={iters:2d}: {t*1e3:.3f} ms/solve "
                  f"merit={mus[-1]:.3e}", flush=True)


if __name__ == "__main__":
    main()
