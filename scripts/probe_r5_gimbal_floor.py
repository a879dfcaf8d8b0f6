"""r5 experiment: QP-only gimbal-rate Hessian floor vs the offset-free
limit cycle on the SIM preset (R_swivel=1e-5).

Measured question (VERDICT r4 item 2): does flooring the two swivel-rate
entries of the QP Hessian (gradient untouched -> reported cost unchanged)
stop the wind-compensation hunt that r4 documented per-preset?

Run: python scripts/probe_r5_gimbal_floor.py   (CPU, a few minutes)
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


def run(preset, floor, n_steps=250, gain=0.5):
    n = 20
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    ocp = dataclasses.replace(
        preset.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(preset.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8,
                                   qp_r_floor=floor))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=jnp.float32)
    target = np.asarray(spec.yref_x[0, 0:3])
    res = jax.jit(lambda s, x: offset_free_loop(
        s, ocp, x, wind, n_steps=n_steps, observer_gain=gain))(spec, x0)
    xs = np.asarray(res.xs)
    err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
    d = np.asarray(res.d_hist[-1, 0:3])
    return {
        "final_err": float(err_t[-1]),
        "tail_max_err": float(err_t[-50:].max()),
        "d_err": float(np.linalg.norm(d - np.asarray([0.7, -0.5, 0.2]))),
        "eq_tail": float(np.asarray(res.kkt_eq)[-50:].max()),
        "finite": bool(np.isfinite(xs).all()),
    }


def main():
    sim = cfg.simulation_preset()
    flight = cfg.flight_preset()
    floors = [None,
              (0.0,) * 4 + (0.1,) * 2,
              (0.0,) * 4 + (1.0,) * 2,
              (0.0,) * 4 + (10.0,) * 2,
              (0.0,) * 4 + (100.0,) * 2]
    for name, preset in (("sim", sim), ("flight", flight)):
        for fl in floors:
            tag = "none" if fl is None else f"{fl[4]:g}"
            r = run(preset, fl)
            print(f"{name:7s} floor={tag:>5s}  final={r['final_err']:.4f}  "
                  f"tailmax={r['tail_max_err']:.4f}  d_err={r['d_err']:.4f} "
                  f"eq_tail={r['eq_tail']:.2e}  finite={r['finite']}",
                  flush=True)


if __name__ == "__main__":
    main()
