"""Plot module smoke tests (headless Agg backend)."""
import os

import jax.numpy as jnp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.sim.closedloop import run_preset
from mpc_blaster_tpu.sim.plots import plot_closed_loop, plot_jet_trajectory


def test_closed_loop_plot(tmp_path):
    res = run_preset(cfg.simulation_preset(), n_steps=10, dtype=jnp.float64)
    path = plot_closed_loop(res, 1 / 30.0, path=str(tmp_path / "cl.png"))
    assert os.path.getsize(path) > 10_000


def test_jet_plot(tmp_path):
    path = plot_jet_trajectory([0.0, -0.05, 0.0], [0.2117, 0.0],
                               [0.6, 0.0, 3.5],
                               path=str(tmp_path / "jet.png"))
    assert os.path.getsize(path) > 10_000


def test_blast_scan_plot(tmp_path):
    import dataclasses
    from mpc_blaster_tpu.sim.plots import plot_blast_scan
    from mpc_blaster_tpu.sim.tasks import run_blast_scan

    preset = dataclasses.replace(
        cfg.simulation_preset(),
        ocp=dataclasses.replace(cfg.simulation_preset().ocp, N=20,
                                Tf=20 / 30.0))
    res = run_blast_scan(preset=preset, n_steps=12, dtype=jnp.float64)
    path = plot_blast_scan({"anchored": res},
                           path=str(tmp_path / "scan.png"), settle=2)
    assert os.path.getsize(path) > 10_000
