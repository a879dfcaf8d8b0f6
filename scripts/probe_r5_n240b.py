"""r5 bisect part 2: is the scan crash the STREAMED-DUMP outputs?

Evidence so far: at N=240 ANY K>=2 scan dies instantly, even with a
1-iteration kernel body; K=1 runs. N<=120 (resident) scans fine (r4).
The structural difference: streamed configs return two ANY-space HBM
dump outputs (P: 35.8 MB, Z: 12.5 MB at N=240).

Tests (each with alarm guard):
  a) N=120 auto (resident)   K=2  — expect OK (r4 baseline)
  b) N=120 FORCED stream_big K=2  — if FAIL: dumps-in-scan pinned
  c) N=60  FORCED stream_big K=2  — size scaling of the same failure
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
    raise Alarm()


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

    assert pallas_available()
    signal.signal(signal.SIGALRM, _alarm)
    preset = cfg.simulation_preset()

    def qp_for(N):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=jnp.float32)
        params = BlasterParams.from_config(ocp.model, jnp.float32)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(2.5)
        st = init_rti_state(ocp, x0, jnp.float32)
        qp1 = jax.jit(lambda s, x: build_qp(spec, s, x, F, params))(st, x0)
        return jax.tree.map(lambda a: a[None], qp1)

    def attempt(tag, qpb, K, sp, sb, budget_s=1200):
        @jax.jit
        def chain(q):
            def body(q, _):
                sol = pallas_box_qp_solve(q, iters=6, stream_p=sp,
                                          stream_big=sb)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                return q, sol.kkt_eq[0]
            q, eqs = jax.lax.scan(body, q, None, length=K)
            return eqs

        t0 = time.time()
        signal.alarm(budget_s)
        try:
            eqs = np.asarray(chain(qpb))
            signal.alarm(0)
            print(f"{tag}: OK {time.time()-t0:.0f}s eq={eqs[-1]:.2e}",
                  flush=True)
        except Alarm:
            print(f"{tag}: TIMEOUT {budget_s}s", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAIL {time.time()-t0:.0f}s: "
                  f"{' '.join(str(e).split())[:140]}", flush=True)

    qp120 = qp_for(120)
    attempt("a N=120 auto K=2", qp120, 2, None, None)
    attempt("b N=120 stream_big K=2", qp120, 2, True, True)
    qp60 = qp_for(60)
    attempt("c N=60 stream_big K=2", qp60, 2, True, True)
    attempt("d N=60 stream_p K=2", qp60, 2, True, False)


if __name__ == "__main__":
    main()


def part3():
    """While-loop vs unrolled: python-loop chain, unrolled scan, and the
    N threshold for the scan failure."""
    import dataclasses
    import signal
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state
    from mpc_blaster_tpu.utils.timing import device_time

    preset = cfg.simulation_preset()
    signal.signal(signal.SIGALRM, _alarm)

    def qp_for(N):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=jnp.float32)
        params = BlasterParams.from_config(ocp.model, jnp.float32)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(2.5)
        st = init_rti_state(ocp, x0, jnp.float32)
        qp1 = jax.jit(lambda s, x: build_qp(spec, s, x, F, params))(st, x0)
        return jax.tree.map(lambda a: a[None], qp1)

    def attempt2(tag, fn, qpb, budget_s=1200, full_err=False):
        t0 = time.time()
        signal.alarm(budget_s)
        try:
            out = np.asarray(fn(qpb))
            signal.alarm(0)
            print(f"{tag}: OK {time.time()-t0:.0f}s last={out.ravel()[-1]:.2e}",
                  flush=True)
            return True
        except Alarm:
            print(f"{tag}: TIMEOUT {budget_s}s", flush=True)
            return False
        except Exception as e:
            signal.alarm(0)
            n = 600 if full_err else 140
            print(f"{tag}: FAIL {time.time()-t0:.0f}s: "
                  f"{' '.join(str(e).split())[:n]}", flush=True)
            return False

    def chain_scan(K, unroll=1):
        @jax.jit
        def f(q):
            def body(q, _):
                sol = pallas_box_qp_solve(q, iters=6)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                return q, sol.kkt_eq[0]
            _, eqs = jax.lax.scan(body, q, None, length=K, unroll=unroll)
            return eqs
        return f

    def chain_py(K):
        @jax.jit
        def f(q):
            eqs = []
            for _ in range(K):
                sol = pallas_box_qp_solve(q, iters=6)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                eqs.append(sol.kkt_eq[0])
            return jnp.stack(eqs)
        return f

    qp240 = qp_for(240)
    # full error text once
    attempt2("e N=240 scan K=2 (full err)", chain_scan(2), qp240,
             full_err=True)
    ok_py = attempt2("f N=240 python-chain K=4", chain_py(4), qp240)
    ok_ur = attempt2("g N=240 scan K=4 unroll=4", chain_scan(4, 4), qp240)
    if ok_ur:
        f8 = chain_scan(8, 8)
        attempt2("h N=240 scan K=8 unroll=8 compile", f8, qp240)
        kt = device_time(lambda: f8(qp240), reps=3) / 8
        print(f"N=240 K=8 (unrolled) timed: {kt*1e3:.3f} ms/solve",
              flush=True)
    for N in (160, 200):
        attempt2(f"i N={N} scan K=2", chain_scan(2), qp_for(N))


if __name__ == "__main__":
    part3()
