"""Flight node + telemetry probes (the reference's ROS shell, ROS-free)."""
import numpy as np
import jax.numpy as jnp

from mpc_blaster_tpu.io.flight import (
    AttitudeTarget,
    CollectAdapter,
    FlightNode,
    thruster_cumul,
)
from mpc_blaster_tpu.io.telemetry import PoseProbe


def test_thruster_cumul_reference_polynomial():
    """Independent evaluation of `mavros_blaster_sim.py:27-30`."""
    for thrusts in [(22.0, 22.0, 22.0, 22.0), (10.0, 12.0, 9.0, 11.0)]:
        avg = 2.3 * np.mean(thrusts) / 9.81
        expect = 0.0014 * avg**3 - 0.0263 * avg**2 + 0.2464 * avg - 0.0286
        np.testing.assert_allclose(thruster_cumul(*thrusts), expect,
                                   rtol=1e-12)


def test_flight_node_publishes_and_advances():
    node = FlightNode(dtype=jnp.float64)
    adapter = node.adapter
    for _ in range(5):
        msg = node.tick()
    assert isinstance(msg, AttitudeTarget)
    assert msg.type_mask == 7
    assert len(adapter.messages) == 5
    # quaternion normalized
    np.testing.assert_allclose(np.linalg.norm(msg.orientation), 1.0,
                               atol=1e-9)
    # thrust setpoint in a sane normalized range during takeoff
    assert 0.0 < msg.thrust < 1.2
    # internal belief advanced (z should rise toward 3.5 target)
    assert node.history_x[-1][2] > node.history_x[0][2]


def test_flight_node_shutdown_message():
    node = FlightNode(dtype=jnp.float64)
    node.run(n_steps=2)
    last = node.adapter.messages[-1]
    # level-hover exit (`mavros_blaster_sim.py:128-133`)
    np.testing.assert_allclose(last.orientation, [1, 0, 0, 0], atol=1e-12)
    assert last.thrust == 0.705


def test_pose_probe_callback_and_poll():
    probe = PoseProbe()
    seen = []
    probe.on_pose(lambda s: seen.append(s))
    assert probe.latest() is None
    probe.update([1.0, 2.0, 3.0], [1.0, 0, 0, 0], stamp=100.0)
    assert len(seen) == 1
    latest = probe.latest()
    np.testing.assert_allclose(latest.position, [1, 2, 3])
    assert latest.age(now=100.5) == 0.5


def test_flight_node_warm_watchdog_profile():
    """The flight shell runs the deployed warm-chain profile (r4): warm
    slack/dual threading + online watchdog, same guarded chain as the
    sim loops. CPU-speed variant of deployed_solver('fastest'): riccati
    backend, same warm/shift/watchdog flags."""
    import dataclasses

    from mpc_blaster_tpu import config as cfg

    sv = dataclasses.replace(
        cfg.deployed_solver("fastest"), qp_backend="riccati",
        lin_backend="fused")
    preset = cfg.flight_preset()
    preset = dataclasses.replace(
        preset, ocp=dataclasses.replace(preset.ocp, solver=sv))
    node = FlightNode(preset=preset, warm_start=True)
    node.run(n_steps=5)
    msgs = node.adapter.messages
    assert len(msgs) == 6  # 5 ticks + hover-out
    for m in msgs:
        assert m.type_mask == 7
        assert np.isfinite(m.thrust)
        assert abs(np.linalg.norm(m.orientation) - 1.0) < 1e-5
    assert int(node._wd.trips) == 0  # healthy hover chain never trips
    xs = np.asarray(node.history_x)
    assert np.isfinite(xs).all()
