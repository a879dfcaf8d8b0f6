"""MAVLink wire-format tests: CRC constants, frame goldens, parser
robustness, MAVROS frame conversions, and a UDP loopback in PX4 format.

The encoder must be byte-compatible with PX4/SITL
(`/root/reference/src/scripts/mavros_blaster_sim.py:91-102` publishes
AttitudeTarget through MAVROS, which emits SET_ATTITUDE_TARGET #82 on the
wire). The CRC_EXTRA seeds here are DERIVED from the message definitions
(io/mavlink.py::crc_extra) and pinned to the published common.xml values —
agreement on four independent messages validates the whole packing chain
(field sorting, type names, array handling)."""
import struct

import numpy as np
import pytest

from mpc_blaster_tpu.io import mavlink as m
from mpc_blaster_tpu.io.flight import AttitudeTarget
from mpc_blaster_tpu.io.transport import UdpAttitudeAdapter, UdpEndpoint


def test_x25_crc_check_vector():
    # CRC-16/MCRF4XX standard check value
    assert m.x25_crc(b"123456789") == 0x6F91


def test_crc_extra_matches_published_constants():
    # Values published with MAVLink common.xml; derived independently here.
    assert m.crc_extra(m.HEARTBEAT) == 50
    assert m.crc_extra(m.SET_ATTITUDE_TARGET) == 49
    assert m.crc_extra(m.LOCAL_POSITION_NED) == 185
    assert m.crc_extra(m.ATTITUDE_QUATERNION) == 246


def test_payload_wire_order_and_length():
    # SET_ATTITUDE_TARGET: floats first (time_boot_ms, q[4], rates, thrust)
    # then the u8 triple — 39 payload bytes.
    assert m.SET_ATTITUDE_TARGET.payload_len == 39
    names = [f.name for f in m.SET_ATTITUDE_TARGET.wire_fields]
    assert names == ["time_boot_ms", "q", "body_roll_rate",
                     "body_pitch_rate", "body_yaw_rate", "thrust",
                     "target_system", "target_component", "type_mask"]


def _sat_values(q=(1.0, 0.0, 0.0, 0.0), thrust=0.705, mask=7):
    return {
        "time_boot_ms": 1234, "target_system": 1, "target_component": 1,
        "type_mask": mask, "q": np.asarray(q, np.float64),
        "body_roll_rate": 0.0, "body_pitch_rate": 0.0,
        "body_yaw_rate": 0.0, "thrust": thrust,
    }


def test_mavlink1_frame_golden_layout():
    raw = m.encode_frame(m.SET_ATTITUDE_TARGET, _sat_values(), seq=5,
                         sysid=255, compid=190, mavlink2=False)
    assert raw[0] == 0xFE
    assert raw[1] == 39                      # payload length
    assert raw[2:6] == bytes([5, 255, 190, 82])
    assert len(raw) == 6 + 39 + 2
    # payload head: time_boot_ms then q[0]=1.0f
    assert struct.unpack_from("<I", raw, 6)[0] == 1234
    assert struct.unpack_from("<f", raw, 10)[0] == 1.0
    # tail u8s: target_system, target_component, type_mask
    assert raw[6 + 36:6 + 39] == bytes([1, 1, 7])
    # CRC recomputed over len..payload + crc_extra
    crc = m.x25_crc(raw[1:-2])
    crc = m.x25_crc(bytes([49]), crc)
    assert struct.unpack("<H", raw[-2:])[0] == crc


def test_mavlink2_frame_zero_truncation_roundtrip():
    vals = _sat_values(thrust=0.0, mask=0)  # zero tail -> truncation
    raw = m.encode_frame(m.SET_ATTITUDE_TARGET, vals, seq=0)
    assert raw[0] == 0xFD
    assert raw[1] < 39                      # trailing zeros dropped
    assert raw[7:10] == bytes([82, 0, 0])   # 24-bit little-endian msgid
    frames = m.MavlinkParser().feed(raw)
    assert len(frames) == 1
    out = frames[0].values()
    assert out["time_boot_ms"] == 1234
    assert out["thrust"] == 0.0 and out["type_mask"] == 0
    np.testing.assert_allclose(out["q"], vals["q"])


@pytest.mark.parametrize("mavlink2", [False, True])
def test_roundtrip_all_messages(mavlink2):
    rng = np.random.default_rng(0)
    catalog = {
        m.HEARTBEAT: {"type": 2, "autopilot": 12, "base_mode": 81,
                      "custom_mode": 0xDEADBEEF, "system_status": 4,
                      "mavlink_version": 3},
        m.LOCAL_POSITION_NED: {"time_boot_ms": 99, "x": 1.5, "y": -2.25,
                               "z": -3.0, "vx": 0.125, "vy": 0.0,
                               "vz": -1.0},
        m.ATTITUDE_QUATERNION: {"time_boot_ms": 7, "q1": 0.5, "q2": 0.5,
                                "q3": -0.5, "q4": 0.5, "rollspeed": 0.25,
                                "pitchspeed": 0.0, "yawspeed": -0.125},
        m.SET_ATTITUDE_TARGET: _sat_values(
            q=tuple(rng.normal(size=4)), thrust=0.31, mask=7),
    }
    stream = b"".join(
        m.encode_frame(msg, vals, seq=i, mavlink2=mavlink2)
        for i, (msg, vals) in enumerate(catalog.items()))
    parser = m.MavlinkParser()
    # feed byte-by-byte: exercises incremental reassembly
    frames = []
    for i in range(len(stream)):
        frames += parser.feed(stream[i:i + 1])
    assert [f.msg_id for f in frames] == [msg.msg_id for msg in catalog]
    assert parser.bad_frames == 0
    for fr, (msg, vals) in zip(frames, catalog.items()):
        out = fr.values()
        for f in msg.fields:
            np.testing.assert_allclose(
                out[f.name], np.asarray(vals[f.name], np.float32)
                if f.type == "float" else vals[f.name], rtol=1e-6)


def test_parser_resyncs_after_corruption():
    good = m.encode_frame(m.HEARTBEAT, {
        "type": 2, "autopilot": 12, "base_mode": 0, "custom_mode": 1,
        "system_status": 4, "mavlink_version": 3}, seq=1)
    corrupted = bytearray(good)
    corrupted[-1] ^= 0xFF  # break the CRC
    parser = m.MavlinkParser()
    frames = parser.feed(bytes(corrupted) + b"\x07\x00garbage" + good)
    assert len(frames) == 1 and frames[0].msg_id == 0
    assert parser.bad_frames >= 1


def test_frame_conversions_are_involutions():
    rng = np.random.default_rng(1)
    p = rng.normal(size=3)
    np.testing.assert_allclose(m.ned_to_enu(m.enu_to_ned(p)), p)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    q2 = m.quat_frd_ned_to_flu_enu(m.quat_flu_enu_to_frd_ned(q))
    # quaternions are equal up to sign
    np.testing.assert_allclose(np.abs(np.dot(q2, q)), 1.0, atol=1e-12)
    # identity ENU attitude (level, facing east) maps to a unit-norm quat
    qi = m.quat_flu_enu_to_frd_ned([1.0, 0, 0, 0])
    np.testing.assert_allclose(np.linalg.norm(qi), 1.0, atol=1e-12)


def test_enu_ned_positions():
    # ENU (1, 2, 3) -> NED (2, 1, -3): north=ENU y, east=ENU x, down=-up
    np.testing.assert_allclose(m.enu_to_ned([1.0, 2.0, 3.0]),
                               [2.0, 1.0, -3.0])


@pytest.mark.parametrize("wire", ["mavlink1", "mavlink2"])
def test_udp_loopback_px4_wire(wire):
    """Controller adapter <-> PX4-side endpoint speaking real MAVLink."""
    endpoint = UdpEndpoint(wire=wire).start()
    adapter = UdpAttitudeAdapter(("127.0.0.1", endpoint.port),
                                 recv_port=0, wire=wire)
    try:
        q = np.array([0.9689124, 0.0, 0.2474040, 0.0])  # 0.5 rad pitch
        msg = AttitudeTarget(type_mask=7, orientation=q, thrust=0.63)
        for _ in range(3):
            adapter.publish(msg)
        # telemetry back: position + attitude pair completes a pose
        endpoint.send_pose(("127.0.0.1", adapter.recv_port), stamp=2.5,
                           position=[1.0, -2.0, 3.5],
                           quat_wxyz=[1.0, 0.0, 0.0, 0.0])
        import time
        deadline = time.monotonic() + 5.0
        pose = None
        while time.monotonic() < deadline:
            pose = adapter.measured_pose()
            if pose is not None and len(endpoint.received) >= 3:
                break
            time.sleep(0.01)
        assert len(endpoint.received) >= 3
        _, _, got = endpoint.received[0]
        assert got.type_mask == 7
        assert abs(got.thrust - 0.63) < 1e-6
        # attitude survives the ENU->NED->ENU double conversion
        assert abs(abs(np.dot(got.orientation, q)) - 1.0) < 1e-6
        assert pose is not None
        np.testing.assert_allclose(pose[0:3], [1.0, -2.0, 3.5], atol=1e-5)
        np.testing.assert_allclose(pose[3:6], 0.0, atol=1e-5)
    finally:
        adapter.close()
        endpoint.stop()


def _fuzz_catalog(rng):
    return {
        m.HEARTBEAT: {"type": 2, "autopilot": 12, "base_mode": 81,
                      "custom_mode": 7, "system_status": 4,
                      "mavlink_version": 3},
        m.LOCAL_POSITION_NED: {"time_boot_ms": 99, "x": 1.5, "y": -2.25,
                               "z": -3.0, "vx": 0.125, "vy": 0.0,
                               "vz": -1.0},
        m.ATTITUDE_QUATERNION: {"time_boot_ms": 7, "q1": 0.5, "q2": 0.5,
                                "q3": -0.5, "q4": 0.5, "rollspeed": 0.25,
                                "pitchspeed": 0.0, "yawspeed": -0.125},
        m.SET_ATTITUDE_TARGET: _sat_values(
            q=tuple(rng.normal(size=4)), thrust=0.31, mask=7),
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parser_fuzz_random_mutations(seed):
    """Hostile-bytes fuzz (r4; the reference delegates link robustness to
    MAVROS, `mavros_blaster_sim.py:33`): streams of valid v1+v2 frames
    with random byte mutations, truncations, injected noise bursts and
    random chunking must NEVER raise, never emit a CRC-invalid frame as
    valid, and always resync — a pristine sentinel frame appended at the
    end must still parse."""
    rng = np.random.default_rng(seed)
    catalog = _fuzz_catalog(rng)
    msgs = list(catalog.items())
    chunks = []
    for i in range(60):
        msg, vals = msgs[int(rng.integers(len(msgs)))]
        frame = bytearray(m.encode_frame(msg, vals, seq=i,
                                         mavlink2=bool(rng.integers(2))))
        r = rng.random()
        if r < 0.3:     # corrupt 1-3 random bytes
            for _ in range(int(rng.integers(1, 4))):
                frame[int(rng.integers(len(frame)))] ^= int(
                    rng.integers(1, 256))
        elif r < 0.5:   # truncate mid-frame
            frame = frame[:int(rng.integers(1, len(frame)))]
        elif r < 0.6:   # noise burst (may contain magic bytes)
            frame = bytearray(rng.integers(0, 256, size=int(
                rng.integers(1, 40))).astype(np.uint8).tobytes())
        chunks.append(bytes(frame))
    sentinel = m.encode_frame(m.HEARTBEAT, catalog[m.HEARTBEAT], seq=255,
                              mavlink2=False)
    # 300 zero bytes flush any pending truncated frame (max frame is 280
    # bytes; a stream parser can only resync an incomplete frame once
    # enough bytes arrive — zeros contain no magic, so after the flush
    # only the sentinel's magic remains)
    stream = b"".join(chunks) + b"\x00" * 300 + sentinel

    parser = m.MavlinkParser()
    frames = []
    i = 0
    while i < len(stream):  # random chunk sizes: 1..17 bytes
        n = int(rng.integers(1, 18))
        frames += parser.feed(stream[i:i + n])  # must not raise
        i += n
    # decoding every surviving frame must not raise either
    for fr in frames:
        vals = fr.values()
        assert set(vals) == {f.name for f in m.MESSAGES[fr.msg_id].fields}
    # the sentinel survived the hostile stream
    assert frames and frames[-1].msg_id == m.HEARTBEAT.msg_id
    assert frames[-1].seq == 255


def test_parser_pure_noise_never_raises():
    rng = np.random.default_rng(42)
    noise = rng.integers(0, 256, size=20000).astype(np.uint8).tobytes()
    parser = m.MavlinkParser()
    frames = parser.feed(noise)
    # random 20 kB contains no valid CRC'd frame with overwhelming
    # probability; everything must be consumed without raising
    for fr in frames:
        fr.values()
    good = m.encode_frame(m.HEARTBEAT, {
        "type": 2, "autopilot": 12, "base_mode": 0, "custom_mode": 1,
        "system_status": 4, "mavlink_version": 3}, seq=9)
    # flush any pending partial frame the noise left behind, then the
    # clean frame must parse
    assert any(f.msg_id == 0 and f.seq == 9
               for f in parser.feed(b"\x00" * 300 + good))


def test_parser_unknown_msgid_skipped():
    """A CRC-valid-looking frame with an unknown message id is skipped
    (CRC_EXTRA unknown -> cannot validate), counted, and the stream
    continues."""
    good = m.encode_frame(m.HEARTBEAT, {
        "type": 2, "autopilot": 12, "base_mode": 0, "custom_mode": 1,
        "system_status": 4, "mavlink_version": 3}, seq=3, mavlink2=False)
    unknown = bytearray(good)
    unknown[5] = 77  # v1 msg_id byte -> not in MESSAGES
    parser = m.MavlinkParser()
    frames = parser.feed(bytes(unknown) + good)
    assert [f.msg_id for f in frames] == [0]
    assert parser.skipped_unknown == 1
