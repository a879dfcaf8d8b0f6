"""Task library: figure-8 tracking, blasting with live POC Jacobians."""
import numpy as np
import jax.numpy as jnp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.sim.tasks import figure8_refs, run_blasting, run_figure8
from mpc_blaster_tpu.sim.closedloop import run_preset

DTYPE = jnp.float64


def test_figure8_refs_shape_and_geometry():
    refs = figure8_refs(100, 1 / 30.0, amplitude_x=1.0, amplitude_y=0.75,
                        period_s=12.0, z=2.0)
    assert refs.shape == (100, cfg.NX)
    assert abs(refs[:, 0]).max() <= 1.0 + 1e-9
    np.testing.assert_allclose(refs[:, 2], 2.0)
    # velocity feedforward is the time derivative of position (spot check)
    dt = 1 / 30.0
    v_fd = np.gradient(refs[:, 0], dt)
    np.testing.assert_allclose(refs[5:-5, 6], v_fd[5:-5], atol=2e-3)


def test_figure8_tracking_error_bounded():
    res = run_figure8(n_steps=200, dtype=DTYPE)
    xs, refs = np.asarray(res.xs), np.asarray(res.refs)
    assert np.isfinite(xs).all()
    err = np.linalg.norm(xs[1:, 0:2] - refs[:, 0:2], axis=1)
    # after settling, stay within 15 cm of the moving reference
    assert err[60:].max() < 0.15, err[60:].max()
    assert abs(xs[1:, 2] - 2.0).max() < 0.1


def test_blasting_task_poc_converges():
    res, solver = run_blasting(n_steps=150, dtype=DTYPE)
    xs = np.asarray(res.xs)
    assert np.isfinite(xs).all()
    # position target (0, 0, 3.5); POC target (0.2, 0, 0)
    # (`simulation_blaster.py:48`) — with live Jacobians both are pulled
    # toward their references; poc x must move from 0 toward positive.
    assert abs(xs[-1, 2] - 3.5) < 0.2
    assert xs[-1, 14] > 0.02
    # POC Jacobian at the operating pose: x/y translations map ~1:1
    j_pos = np.asarray(solver.get_jacobians()[2])
    np.testing.assert_allclose(j_pos[0, 0], 1.0, atol=1e-6)


def test_run_preset_with_poc_pipeline():
    """Full simulation_blaster.py parity path: PocSolver -> params -> loop."""
    preset = cfg.simulation_preset()
    res = run_preset(preset, n_steps=60, dtype=DTYPE, with_poc=True)
    xs = np.asarray(res.xs)
    assert np.isfinite(xs).all()
    # with nonzero Jacobians the POC states actually move
    assert np.abs(xs[:, 14:17]).max() > 1e-4


def test_online_poc_relinearization():
    """poc_mode='online' (beyond-reference): re-linearize POC every tick;
    runs stably and keeps the POC states evolving."""
    preset = cfg.simulation_preset()
    res = run_preset(preset, n_steps=30, dtype=DTYPE, poc_mode="online")
    xs = np.asarray(res.xs)
    assert np.isfinite(xs).all()
    assert np.abs(xs[:, 14:17]).max() > 1e-4
    # online linearizes at the live pose (starting at z=0), frozen at the
    # reference's canonical pose (z=4): the POC propagation must differ
    frozen = run_preset(preset, n_steps=30, dtype=DTYPE, with_poc=True)
    d = np.abs(np.asarray(frozen.xs)[:, 14] - xs[:, 14])
    assert d.max() > 1e-3
