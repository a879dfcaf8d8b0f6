"""r5 prototype for dryrun_multichip pattern 4: BASELINE-shaped
host-sharded sweep on the virtual CPU mesh — >=4096 scenarios, solves/s
per device count (1/2/4/8), orbax mid-sweep checkpoint + bitwise resume.

Sizing run: find shapes that fit the driver's CPU budget.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.parallel.mesh import make_mesh, sharded_rti_step
from mpc_blaster_tpu.sqp.rti import init_rti_state


def main():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(
        preset.ocp, N=5, Tf=5 / 30.0,
        solver=dataclasses.replace(preset.ocp.solver, ipm_iters=3))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    B = 4096
    rng = np.random.default_rng(0)
    x0s = np.zeros((B, cfg.NX), np.float32)
    x0s[:, 0:3] = rng.uniform(-0.3, 0.3, (B, 3))
    x0s[:, 2] += 2.0
    x0s = jnp.asarray(x0s)
    states0 = jax.vmap(lambda x: init_rti_state(ocp, x, dtype))(x0s)

    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        step = sharded_rti_step(ocp, mesh, dtype=dtype)
        t0 = time.perf_counter()
        u0s, states, ms, wk = step(spec, states0, x0s)
        u0s.block_until_ready()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        u0s, states, ms, wk = step(spec, states0, x0s)
        u0s.block_until_ready()
        t_tick = time.perf_counter() - t0
        print(f"d={d}: compile+1st {t_compile:.1f}s, tick {t_tick:.2f}s "
              f"({B/t_tick:.0f} solves/s)", flush=True)


if __name__ == "__main__":
    main()
