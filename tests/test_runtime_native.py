"""Native runtime tests: build the C++ library, exercise ring / loop /
UDP / safety through ctypes."""

import time

import numpy as np
import pytest

from quad_periodic_mpc_tpu.runtime import native_bridge as nb


@pytest.fixture(scope="module")
def built():
    return nb.build()


def test_build(built):
    assert built.exists()


def test_ring_roundtrip(built):
    ring = nb.StateRing("/qpm_test_ring", frame_bytes=64, slots=4, create=True)
    try:
        seq, _ = ring.read_latest()
        assert seq == 0
        for i in range(10):
            payload = bytes([i]) * 64
            s = ring.write(payload)
            assert s == i + 1
        seq, data = ring.read_latest()
        assert seq == 10
        assert data == bytes([9]) * 64
        # second reader attaches to the same shm
        reader = nb.StateRing("/qpm_test_ring", 64, 4, create=False)
        seq2, data2 = reader.read_latest()
        assert seq2 == 10 and data2 == data
        reader.close(unlink=False)
    finally:
        ring.close(unlink=True)


def test_periodic_loop_rate(built):
    loop = nb.PeriodicLoop(period_ns=2_000_000)   # 500 Hz, the control rate
    loop.start()
    time.sleep(0.25)
    loop.stop()
    iters = loop.iterations
    loop.destroy()
    # expect ~125 iterations in 0.25 s at 500 Hz; generous CI margins
    assert 80 <= iters <= 170, iters


def test_udp_loopback(built):
    a = nb.UdpBridge(local_port=47311, remote_ip="127.0.0.1", remote_port=47312)
    b = nb.UdpBridge(local_port=47312, remote_ip="127.0.0.1", remote_port=47311)
    try:
        assert a.send(b"hello-robot") == 11
        time.sleep(0.01)
        got = b.recv_latest(64)
        assert got == b"hello-robot"
        # newest-wins drain
        a.send(b"one")
        a.send(b"two")
        time.sleep(0.01)
        assert b.recv_latest(64) == b"two"
        assert b.recv_latest(64) is None
    finally:
        a.close()
        b.close()


def test_safety_clamp_and_power(built):
    tau = np.array([20.0, -20.0, 30.0] + [1.0] * 9)
    out, n = nb.clamp_torques(tau)
    assert n == 3
    np.testing.assert_allclose(out[:3], [17.0, -17.0, 26.0])

    tau = np.full(12, 10.0)
    qd = np.full(12, 2.0)          # power = 240 W
    out, applied = nb.power_protect(tau, qd, budget_watts=120.0)
    assert applied
    assert abs(sum(out * qd) - 120.0) < 1e-9


def test_position_limit_and_protect():
    """Safety::PositionLimit / PositionProtect analogs
    (unitree_legged_sdk safety.h:18-22)."""
    import numpy as np
    from quad_periodic_mpc_tpu.runtime import native_bridge as nb

    q = np.tile([0.0, 0.5, -1.5], 4)   # valid A1 pose
    q[1] = 5.0      # hip beyond 4.19
    q[2] = -3.0     # knee beyond -2.70
    q[3] = -1.0     # abad beyond -0.802
    out, n = nb.position_limit(q)
    assert n == 3
    assert abs(out[1] - 4.19) < 1e-12
    assert abs(out[2] + 2.70) < 1e-12
    assert abs(out[3] + 0.802) < 1e-12
    assert out[0] == 0.0 and out[5] == -1.5

    q_now = np.full(12, 0.5)
    q_cmd = np.full(12, 0.5)
    q_cmd[4] = 0.7          # 0.2 rad jump > 0.087
    q_cmd[5] = 0.45         # within limit
    out, n = nb.position_protect(q_cmd, q_now)
    assert n == 1
    assert abs(out[4] - (0.5 + 0.087)) < 1e-12
    assert out[5] == 0.45
