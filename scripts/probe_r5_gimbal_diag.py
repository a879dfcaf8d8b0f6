"""r5 diagnosis: WHAT is the sim-preset offset-free loop converging to?

Experiments 1-2 showed neither a Hessian-only QP floor nor a full
R_swivel raise fixes the ~1.5 m settle error — so the r4 'gimbal weight'
story is incomplete. Dump the full terminal state, active bounds, POC
error and the blind baseline to find the real trade-off.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sim.scenarios import offset_free_loop


def main():
    sim = cfg.simulation_preset()
    n = 20
    ocp = dataclasses.replace(
        sim.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(sim.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8))
    spec = build_spec(ocp, yref=sim.loop.yref, dtype=jnp.float32)
    print("stage_params[0]:", np.asarray(spec.stage_params[0]), flush=True)
    print("yref_x[0]:", np.asarray(spec.yref_x[0]), flush=True)
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    target = np.asarray(spec.yref_x[0, 0:3])
    for name, gain in (("blind", 0.0), ("offset_free", 0.5)):
        res = jax.jit(lambda s, x, g=gain: offset_free_loop(
            s, ocp, x, wind, n_steps=250, observer_gain=g))(spec, x0)
        xs = np.asarray(res.xs)
        xf = xs[-1]
        err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
        print(f"--- {name}")
        print("  final p:", xf[0:3], " err", err_t[-1])
        print("  eul:", xf[3:6], " v:", xf[6:9])
        print("  omega:", xf[9:12], " alpha:", xf[12:14])
        print("  poc:", xf[14:17], " poc_ref:",
              np.asarray(spec.yref_x[0, 14:17]))
        print("  tail p range x:", xs[-50:, 0].min(), xs[-50:, 0].max())
        print("  tail p range y:", xs[-50:, 1].min(), xs[-50:, 1].max())
        print("  tail p range z:", xs[-50:, 2].min(), xs[-50:, 2].max())
        print("  tail alpha range:", xs[-50:, 12].min(), xs[-50:, 12].max(),
              "|", xs[-50:, 13].min(), xs[-50:, 13].max())
        print("  d_est final:", np.asarray(res.d_hist[-1]))
        print("  eq tail:", np.asarray(res.kkt_eq)[-50:].max(), flush=True)


if __name__ == "__main__":
    main()
