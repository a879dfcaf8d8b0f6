"""r5 A/B: stagewise_anchored vs online_stagewise on the bench's
AGGRESSIVE blast scan (VERDICT item 5: get below 0.10 m true-POC error).

The anchored mode re-anchors the iterate's POC rows to the exact jet
impact point at each predicted pose (algebraic-POC projection) on top of
the per-stage Jacobians.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu.poc.solver import true_poc_traj
from mpc_blaster_tpu.sim.tasks import run_blast_scan

KWA = dict(n_steps=300, dtype=jnp.float32, z_end=1.2, t_ramp_s=4.0,
           amp_x=1.1, amp_y=0.45, period_s=24.0, frozen_at="canonical")
KWB = dict(n_steps=300, dtype=jnp.float32, z_end=1.5, t_ramp_s=6.0,
           frozen_at="canonical")


def err(poc_mode, kw):
    t0 = time.time()
    res = run_blast_scan(poc_mode=poc_mode, plant_poc="exact", **kw)
    tp = np.asarray(true_poc_traj(res.xs))
    refs_b = np.asarray(res.refs)
    terr = np.linalg.norm(tp[1:, 0:2] - refs_b[:, 14:16], axis=1)
    print(f"{poc_mode:20s} mean={terr[90:].mean():.4f} "
          f"max={terr[90:].max():.4f} ({time.time()-t0:.0f}s)", flush=True)
    return float(terr[90:].mean())


def main():
    print("--- aggressive scan", flush=True)
    err("online_stagewise", KWA)
    err("stagewise_anchored", KWA)
    print("--- gentle scan", flush=True)
    err("frozen", KWB)
    err("stagewise_anchored", KWB)


if __name__ == "__main__":
    main()
