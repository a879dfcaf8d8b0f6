"""Re-measure the deployed-latency landscape with sound timing
(scripts/tpu_timing.py): rt6 ticks at N=20/30/60 across streaming configs
and linearizer backends, plus kernel-only serialized chains."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from scripts.tpu_timing import device_time, measure_rtt
from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sqp.rti import init_rti_state, build_qp
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
from mpc_blaster_tpu.sim.closedloop import make_closed_loop


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    K = 32
    print(f"RTT floor: {measure_rtt()*1e3:.2f} ms", flush=True)

    for N in (20, 30, 60):
        ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
        state = init_rti_state(ocp, x0, dtype)
        qp = build_qp(spec, state, x0, F, params)
        qpb = jax.tree.map(lambda a: a[None], qp)

        combos = [(False, False), (True, False), (True, True)] \
            if N <= 30 else [(True, True)]
        for sp, sb in combos:
            @jax.jit
            def chain(qp0, sp=sp, sb=sb):
                def body(q, _):
                    sol = pallas_box_qp_solve(q, iters=6, stream_p=sp,
                                              stream_big=sb)
                    q = q._replace(c=q.c + 1e-12 * sol.dx[:, 1:, :])
                    return q, sol.kkt_eq[0]
                q, eqs = jax.lax.scan(body, qp0, None, length=K)
                return eqs
            try:
                dt = device_time(lambda: chain(qpb), reps=10) / K
                print(f"kernel6 N={N} sp={int(sp)} sb={int(sb)}: "
                      f"{dt*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"kernel6 N={N} sp={int(sp)} sb={int(sb)}: FAILED "
                      f"{str(e)[:200]}", flush=True)

        # full deployed tick
        for sp, sb, lb in ((None, None, "jacfwd"), (None, None, "fused"),
                           (False, False, "fused"), (True, False, "fused")):
            if N == 60 and sp is False:
                continue
            ocp_rt = dataclasses.replace(
                ocp, solver=dataclasses.replace(
                    ocp.solver, ipm_iters=6, qp_backend="pallas",
                    lin_backend=lb, pallas_stream_p=sp,
                    pallas_stream_big=sb))
            try:
                runner = make_closed_loop(ocp_rt, K, dtype=dtype)
                lat = device_time(lambda: runner(spec, x0), reps=10) / K
                print(f"rt6 N={N} sp={sp} sb={sb} lin={lb}: "
                      f"{lat*1e3:.3f} ms ({1.0/lat:.0f} Hz)", flush=True)
            except Exception as e:
                print(f"rt6 N={N} sp={sp} sb={sb} lin={lb}: FAILED "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
