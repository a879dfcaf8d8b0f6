"""r5 bisect part 4: is the 2-call N=240 failure the SUM of scoped-vmem
requests exceeding the 128 MiB physical VMEM?

Numbers: N=240 stream_big requests 73.4 MB/call (2 calls = 146.8 > 128);
N=200 requests 62.8 (2 calls = 125.6 < 128). Shrinking the stack margin
so the N=240 request drops below 64 MB should make K=2 compile if the
hypothesis holds.
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
    from mpc_blaster_tpu.ops import pallas_ipm
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state

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

    def attempt(tag, K, qpb, budget_s=1200):
        def f(q):
            def body(q, _):
                sol = pallas_ipm.pallas_box_qp_solve(q, iters=6)
                q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                return q, sol.kkt_eq[0]
            _, eqs = jax.lax.scan(body, q, None, length=K)
            return eqs

        t0 = time.time()
        signal.alarm(budget_s)
        try:
            eqs = np.asarray(jax.jit(f)(qpb))
            signal.alarm(0)
            print(f"{tag}: OK {time.time()-t0:.0f}s eq={eqs[-1]:.2e}",
                  flush=True)
            return True
        except Alarm:
            print(f"{tag}: TIMEOUT", flush=True)
            return False
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAIL {time.time()-t0:.0f}s: "
                  f"{' '.join(str(e).split())[:140]}", flush=True)
            return False

    qp240 = qp_for(240)
    margin0 = pallas_ipm._VMEM_STACK_MARGIN
    # small margin -> request ~62.9 MB/call (2 calls < 128)
    pallas_ipm._VMEM_STACK_MARGIN = 2 * 1024 * 1024
    pallas_ipm._pallas_box_qp_solve.clear_cache()
    attempt("K=1 margin=2MB", 1, qp240)
    attempt("K=2 margin=2MB", 2, qp240)
    # intermediate: margin 6MB -> ~66.9MB/call (2 calls slightly > 128)
    pallas_ipm._VMEM_STACK_MARGIN = 6 * 1024 * 1024
    pallas_ipm._pallas_box_qp_solve.clear_cache()
    attempt("K=2 margin=6MB (2x=133MB)", 2, qp240)
    pallas_ipm._VMEM_STACK_MARGIN = margin0


if __name__ == "__main__":
    main()
