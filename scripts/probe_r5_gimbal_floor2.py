"""r5 experiment 2: FULL (Hessian+gradient) QP gimbal-rate floor on the sim
preset — emulated by replacing R_swivel in the cost — vs the Hessian-only
floor that experiment 1 showed insufficient (final err ~0.9-1.7 m at every
floor value: proximal damping slows the walk into the flat subspace but the
per-tick target direction persists, so the limit cycle survives).
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


def run(ocp, n_steps=250, gain=0.5):
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    spec = build_spec(ocp, yref=cfg.simulation_preset().loop.yref,
                      dtype=jnp.float32)
    target = np.asarray(spec.yref_x[0, 0:3])
    res = jax.jit(lambda s, x: offset_free_loop(
        s, ocp, x, wind, n_steps=n_steps, observer_gain=gain))(spec, x0)
    xs = np.asarray(res.xs)
    err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
    return (float(err_t[-1]), float(err_t[-50:].max()),
            float(np.asarray(res.kkt_eq)[-50:].max()))


def main():
    sim = cfg.simulation_preset()
    n = 20
    base = dataclasses.replace(
        sim.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(sim.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8))
    print("R diag:", base.cost.r_diag, flush=True)
    for sw in (None, 0.1, 1.0, 10.0):
        if sw is None:
            ocp = base
            tag = "orig(1e-5)"
        else:
            rd = list(base.cost.r_diag)
            rd[4] = rd[5] = sw
            ocp = dataclasses.replace(
                base, cost=dataclasses.replace(base.cost, r_diag=tuple(rd)))
            tag = f"{sw:g}"
        f, tm, eq = run(ocp)
        print(f"sim R_swivel={tag:>10s}  final={f:.4f}  tailmax={tm:.4f}  "
              f"eq_tail={eq:.2e}", flush=True)


if __name__ == "__main__":
    main()
