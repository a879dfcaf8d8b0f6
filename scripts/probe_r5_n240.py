"""r5: bisect the N=240 K>=4 lax.scan compile crash (VERDICT r4 item 4).

r4 state: N=240 SINGLE solves compile and run (auto + forced streaming);
wrapping them in a K>=4 lax.scan kills the remote compile helper
('tpu_compile_helper exit 1' — usually scoped-vmem stack OOM or
compiler-resource exhaustion, CLAUDE.md). This probe bisects K and the
kernel-body size (IPM iteration count) to pin which resource scales into
the crash, with a per-attempt wall-clock alarm so one hung remote
compile cannot stall the whole bisect.

Run on TPU: python scripts/probe_r5_n240.py
"""
import dataclasses
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


class Alarm(Exception):
    pass


def _alarm(sig, frame):
    raise Alarm("per-attempt wall clock exceeded")


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
    signal.signal(signal.SIGALRM, _alarm)

    dtype = jnp.float32
    preset = cfg.simulation_preset()
    N = 240
    ocp = dataclasses.replace(
        preset.ocp, N=N, Tf=N / 30.0,
        solver=dataclasses.replace(preset.ocp.solver, ipm_iters=6))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.5)
    st = init_rti_state(ocp, x0, dtype)
    qp1 = jax.jit(lambda s, x: build_qp(spec, s, x, F, params))(st, x0)
    qpb = jax.tree.map(lambda a: a[None], qp1)

    def attempt(tag, K, iters, budget_s=1500):
        @jax.jit
        def chain(q):
            def body(q, _):
                sol = pallas_box_qp_solve(q, iters=iters)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                return q, sol.kkt_eq[0]
            q, eqs = jax.lax.scan(body, q, None, length=K)
            return eqs

        t0 = time.time()
        signal.alarm(budget_s)
        try:
            eqs = np.asarray(chain(qpb))
            signal.alarm(0)
            dt = time.time() - t0
            print(f"{tag}: OK compile+run {dt:.0f}s eq_last={eqs[-1]:.3e} "
                  f"finite={np.isfinite(eqs).all()}", flush=True)
            return True
        except Alarm:
            signal.alarm(0)
            print(f"{tag}: TIMEOUT after {budget_s}s (hung remote compile)",
                  flush=True)
            return False
        except Exception as e:
            signal.alarm(0)
            msg = " ".join(str(e).split())[:200]
            print(f"{tag}: FAIL {time.time()-t0:.0f}s: {msg}", flush=True)
            return False

    # single solve sanity (r4: works)
    attempt("K=1 iters=6", 1, 6)
    # the r4 failing shape
    ok4 = attempt("K=4 iters=6", 4, 6)
    if ok4:
        ok8 = attempt("K=8 iters=6", 8, 6)
        if ok8:
            @jax.jit
            def chain8(q):
                def body(q, _):
                    sol = pallas_box_qp_solve(q, iters=6)
                    q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                    return q, sol.kkt_eq[0]
                q, eqs = jax.lax.scan(body, q, None, length=8)
                return eqs
            kt = device_time(lambda: chain8(qpb), reps=3) / 8
            print(f"N=240 K=8 timed: {kt*1e3:.3f} ms/solve", flush=True)
            return
    else:
        attempt("K=2 iters=6", 2, 6)
        attempt("K=3 iters=6", 3, 6)
        # kernel-body scaling: does a smaller kernel compile at K=4?
        attempt("K=4 iters=1", 4, 1)
        attempt("K=4 iters=3", 4, 3)


if __name__ == "__main__":
    main()
