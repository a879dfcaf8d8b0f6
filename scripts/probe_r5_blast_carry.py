"""r5: reference-governor hypothesis for the aggressive blast scan.

Anchored re-linearization bought nothing (0.1403 vs 0.1400) — so the
0.14 m plateau is not model error. Hypothesis: it is the POSED OCP's
trade-off — the +-0.0872 rad/s gimbal-rate box cannot carry the sweep
alone at z=1.2, and the fixed hover reference (weight 1e3 == poc weight)
charges the optimizer for the vehicle translation that would help.

Experiment: a CO-MOVING hover reference — position ref follows a
carry_frac of the poc sweep (+ matching velocity feedforward) so the
vehicle carries the low-frequency raster and the gimbal the rest.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.poc.solver import true_poc_traj
from mpc_blaster_tpu.sim.tasks import (blast_scan_refs, make_tracking_loop,
                                       run_blast_scan)

KWA = dict(z_end=1.2, t_ramp_s=4.0, amp_x=1.1, amp_y=0.45, period_s=24.0)


def run_carry(carry, poc_mode="online_stagewise", n_steps=300):
    from mpc_blaster_tpu.dynamics.blaster import pack_stage_params
    from mpc_blaster_tpu.poc.solver import PocSolver, solve_poc

    t0 = time.time()
    preset = cfg.simulation_preset()
    ocp = preset.ocp
    hover = (0.0, 0.0, 3.5)
    refs = blast_scan_refs(n_steps + ocp.N + 1, ocp.dt, hover=hover, **KWA)
    if carry > 0.0:
        center = np.array([-0.6, 0.0])
        dev = refs[:, 14:16] - center[None]
        refs[:, 0:2] = refs[:, 0:2] + carry * dev
        # velocity feedforward of the co-moving part
        refs[:-1, 6:8] = refs[:-1, 6:8] + carry * np.diff(
            refs[:, 14:16], axis=0) / ocp.dt

    solver = PocSolver.from_config(preset.poc)
    solver.solve_jacobians(jnp.zeros(3), jnp.zeros(2),
                           jnp.asarray((0.0, 0.0, 4.0), jnp.float32))
    j_mot, j_eul, j_pos = solver.get_jacobians()
    p = pack_stage_params(j_mot, j_eul, j_pos, 2.2 * 9.81)
    spec = build_spec(ocp, stage_params=np.asarray(p), dtype=jnp.float32)
    run = make_tracking_loop(ocp, n_steps, dtype=jnp.float32,
                             poc_mode=poc_mode, plant_poc="exact",
                             poc_cfg=preset.poc)
    x0 = np.zeros(cfg.NX)
    x0[0:3] = hover
    poc0, _ = solve_poc(jnp.zeros(3), jnp.zeros(2),
                        jnp.asarray(hover, jnp.float32),
                        preset.poc.stream_velocity, preset.poc.drag,
                        preset.poc.newton_iters)
    x0[14:17] = np.asarray(poc0)
    res = run(spec, jnp.asarray(x0, jnp.float32), jnp.asarray(refs,
                                                              jnp.float32))
    tp = np.asarray(true_poc_traj(res.xs))
    refs_b = np.asarray(res.refs)
    terr = np.linalg.norm(tp[1:, 0:2] - refs_b[:, 14:16], axis=1)
    print(f"carry={carry:.2f} {poc_mode:18s} mean={terr[90:].mean():.4f} "
          f"max={terr[90:].max():.4f} ({time.time()-t0:.0f}s)", flush=True)
    return terr[90:].mean()


def main():
    for carry in (0.0, 0.3, 0.6, 1.0):
        run_carry(carry)


if __name__ == "__main__":
    main()
