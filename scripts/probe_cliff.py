"""Localize the N=20 -> N=30 latency cliff in the Pallas IPM kernel.

Measures SERIALIZED kernel latency (a lax.scan chain where each solve's
defect vector depends on the previous solution — no cross-call pipelining)
for a horizon sweep under both streaming configs, plus the rt6 deployed
tick at N=30 with the new SolverConfig streaming overrides.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import init_rti_state, build_qp
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
from mpc_blaster_tpu.sim.closedloop import make_closed_loop


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    K = 32

    for N in (16, 20, 24, 28, 30):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
        state = init_rti_state(ocp, x0, dtype)
        qp = build_qp(spec, state, x0, F, params)
        qpb = jax.tree.map(lambda a: a[None], qp)

        combos = [(False, False)]
        if N >= 24:
            combos.append((True, False))
            combos.append((True, True))
        for sp, sb in combos:
            label = f"N={N} sp={int(sp)} sb={int(sb)}"
            try:
                @jax.jit
                def chain(qp0):
                    def body(carry, _):
                        q = carry
                        sol = pallas_box_qp_solve(q, iters=6, stream_p=sp,
                                                  stream_big=sb)
                        # serialize: feed solution back into the defects
                        q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                        return q, sol.kkt_eq
                    q, eqs = jax.lax.scan(body, qp0, None, length=K)
                    return eqs
                dt = timeit(lambda: chain(qpb)) / K
                print(f"serialized kernel {label}: {dt*1e3:.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"serialized kernel {label}: FAILED {str(e)[:300]}",
                      flush=True)

    # rt6 N=30 deployed tick with resident kernel + fused linearizer
    N = 30
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=1.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    for sp, sb, lb in ((False, False, "fused"), (True, False, "fused")):
        ocp_rt = dataclasses.replace(
            ocp, solver=dataclasses.replace(
                ocp.solver, ipm_iters=6, qp_backend="pallas",
                lin_backend=lb, pallas_stream_p=sp, pallas_stream_big=sb))
        runner = make_closed_loop(ocp_rt, K, dtype=dtype)
        lat = timeit(lambda: runner(spec, x0), reps=5) / K
        print(f"rt6 N=30 sp={int(sp)} sb={int(sb)} lin={lb}: "
              f"{lat*1e3:.3f} ms ({1.0/lat:.0f} Hz)", flush=True)


if __name__ == "__main__":
    main()
