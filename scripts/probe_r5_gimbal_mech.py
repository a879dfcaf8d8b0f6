"""r5 diagnosis 3: which mechanism drives the sim-preset offset-free
limit cycle? (POC Jacobians are zero in this loop; the gimbal barely
moves; the cycle is a position/velocity oscillation with eq ~0.2.)

Hypotheses, one knob each vs the baseline hunt (final err ~1.5):
  A solver quality: ipm_iters 8 -> 30
  B observer gain: 0.5 -> 0.1
  C attitude box: +-10 deg -> +-30 deg
  D blast thruster: 21.58 N -> 2.2 N (flight value)
  E velocity box: +-1.0 -> +-3.0
  F warm-start iterate: cold init each tick? (not available in the loop;
    skip) -> instead dt/N: N=20 -> N=30 matching flight preset horizon
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


def run(ocp, yref, gain=0.5, n_steps=250):
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    spec = build_spec(ocp, yref=yref, dtype=jnp.float32)
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
    yref = sim.loop.yref

    def show(tag, ocp, gain=0.5):
        f, tm, eq = run(ocp, yref, gain=gain)
        print(f"{tag:24s} final={f:.4f} tailmax={tm:.4f} eq={eq:.2e}",
              flush=True)

    show("baseline(hunt)", base)
    show("A ipm_iters=30", dataclasses.replace(
        base, solver=dataclasses.replace(base.solver, ipm_iters=30)))
    show("B gain=0.1", base, gain=0.1)
    bc = base.bounds
    show("C att box 30deg", dataclasses.replace(base, bounds=dataclasses.replace(
        bc,
        lbx=bc.lbx[:3] + (-0.5236, -0.5236, -0.349066) + bc.lbx[6:],
        ubx=bc.ubx[:3] + (0.5236, 0.5236, 0.349066) + bc.ubx[6:])))
    show("D tb=2.2", dataclasses.replace(
        base, model=dataclasses.replace(base.model, blast_thruster=2.2),
        quirks=dataclasses.replace(base.quirks, hardcode_t_blast=False)))
    show("E vel box 3.0", dataclasses.replace(base, bounds=dataclasses.replace(
        bc,
        lbx=bc.lbx[:6] + (-3.0, -3.0, -3.0) + bc.lbx[9:],
        ubx=bc.ubx[:6] + (3.0, 3.0, 3.0) + bc.ubx[9:])))
    show("F N=30", dataclasses.replace(base, N=30, Tf=1.0))


if __name__ == "__main__":
    main()
