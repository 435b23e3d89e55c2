"""ctypes bindings for the native host runtime (libqpm_runtime.so).

Builds the library on first use (g++, no external deps).  The packet
layout mirrors the data the reference ships per 2 ms tick over the vendor
UDP link (LowCmd/LowState essentials: q, qd, tau per 12 joints + IMU).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libqpm_runtime.so"

LOW_STATE_DOUBLES = 12 * 2 + 10   # q, qd + quat(4) gyro(3) accel(3)
LOW_CMD_DOUBLES = 12 * 5          # q_des, qd_des, tau_ff, kp, kd
STATE_BYTES = LOW_STATE_DOUBLES * 8
CMD_BYTES = LOW_CMD_DOUBLES * 8


def build(force: bool = False) -> Path:
    """Compile the native library (idempotent)."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    subprocess.run(
        ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
    )
    return _LIB_PATH


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
        _lib.qpm_ring_open.restype = ctypes.c_void_p
        _lib.qpm_ring_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
        ]
        _lib.qpm_ring_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib.qpm_ring_write.restype = ctypes.c_uint64
        _lib.qpm_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ]
        _lib.qpm_ring_read_latest.restype = ctypes.c_int64
        _lib.qpm_ring_read_latest.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ]
        _lib.qpm_loop_create.restype = ctypes.c_void_p
        _lib.qpm_loop_create.argtypes = [
            ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib.qpm_loop_start.argtypes = [ctypes.c_void_p]
        _lib.qpm_loop_stop.argtypes = [ctypes.c_void_p]
        _lib.qpm_loop_destroy.argtypes = [ctypes.c_void_p]
        for f in ("qpm_loop_iterations", "qpm_loop_overruns",
                  "qpm_loop_max_jitter_ns"):
            getattr(_lib, f).restype = ctypes.c_uint64
            getattr(_lib, f).argtypes = [ctypes.c_void_p]
        _lib.qpm_udp_open.restype = ctypes.c_void_p
        _lib.qpm_udp_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint16, ctypes.c_char_p, ctypes.c_uint16,
        ]
        _lib.qpm_udp_close.argtypes = [ctypes.c_void_p]
        _lib.qpm_udp_send.restype = ctypes.c_int
        _lib.qpm_udp_send.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ]
        _lib.qpm_udp_recv_latest.restype = ctypes.c_int
        _lib.qpm_udp_recv_latest.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ]
        _lib.qpm_safety_clamp_torques.restype = ctypes.c_int
        _lib.qpm_safety_clamp_torques.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        _lib.qpm_safety_power_protect.restype = ctypes.c_int
        _lib.qpm_safety_power_protect.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
        ]
        _lib.qpm_safety_position_limit.restype = ctypes.c_int
        _lib.qpm_safety_position_limit.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib.qpm_safety_position_protect.restype = ctypes.c_int
        _lib.qpm_safety_position_protect.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
        ]
    return _lib


class StateRing:
    """Seqlock shared-memory ring (single writer, many readers)."""

    def __init__(self, name: str, frame_bytes: int, slots: int = 8,
                 create: bool = True):
        self._lib = lib()
        self._frame_bytes = frame_bytes
        self._h = self._lib.qpm_ring_open(
            name.encode(), frame_bytes, slots, int(create)
        )
        if not self._h:
            raise OSError(f"qpm_ring_open({name!r}) failed")
        self._created = create

    def write(self, data: bytes) -> int:
        return self._lib.qpm_ring_write(self._h, data, len(data))

    def read_latest(self) -> tuple[int, bytes]:
        buf = ctypes.create_string_buffer(self._frame_bytes)
        seq = self._lib.qpm_ring_read_latest(self._h, buf, self._frame_bytes)
        return seq, buf.raw

    def close(self, unlink: bool | None = None):
        if self._h:
            self._lib.qpm_ring_close(
                self._h, int(self._created if unlink is None else unlink)
            )
            self._h = None


class PeriodicLoop:
    """Absolute-deadline periodic loop with jitter accounting."""

    def __init__(self, period_ns: int):
        self._lib = lib()
        self._h = self._lib.qpm_loop_create(period_ns, None, None)

    def start(self):
        self._lib.qpm_loop_start(self._h)

    def stop(self):
        self._lib.qpm_loop_stop(self._h)

    @property
    def iterations(self) -> int:
        return self._lib.qpm_loop_iterations(self._h)

    @property
    def overruns(self) -> int:
        return self._lib.qpm_loop_overruns(self._h)

    @property
    def max_jitter_ns(self) -> int:
        return self._lib.qpm_loop_max_jitter_ns(self._h)

    def destroy(self):
        if self._h:
            self._lib.qpm_loop_destroy(self._h)
            self._h = None


class UdpBridge:
    """Nonblocking UDP link (robot LowCmd/LowState packets)."""

    def __init__(self, local_port: int, remote_ip: str, remote_port: int,
                 local_ip: str | None = None):
        self._lib = lib()
        self._h = self._lib.qpm_udp_open(
            local_ip.encode() if local_ip else None, local_port,
            remote_ip.encode(), remote_port,
        )
        if not self._h:
            raise OSError("qpm_udp_open failed")

    def send(self, data: bytes) -> int:
        return self._lib.qpm_udp_send(self._h, data, len(data))

    def recv_latest(self, nbytes: int) -> bytes | None:
        buf = ctypes.create_string_buffer(nbytes)
        n = self._lib.qpm_udp_recv_latest(self._h, buf, nbytes)
        return buf.raw[:n] if n > 0 else None

    def close(self):
        if self._h:
            self._lib.qpm_udp_close(self._h)
            self._h = None


def clamp_torques(tau, limits3=(17.0, 17.0, 26.0)) -> tuple:
    """Native torque clamp (be2r_cmpc_unitree.cpp:680-716 semantics)."""
    import numpy as np

    arr = np.ascontiguousarray(tau, dtype=np.float64).reshape(12)
    lim = np.ascontiguousarray(limits3, dtype=np.float64)
    n = lib().qpm_safety_clamp_torques(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lim.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return arr, n


def power_protect(tau, qd, budget_watts: float) -> tuple:
    import numpy as np

    arr = np.ascontiguousarray(tau, dtype=np.float64).reshape(12)
    qd_arr = np.ascontiguousarray(qd, dtype=np.float64).reshape(12)
    applied = lib().qpm_safety_power_protect(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        qd_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        budget_watts,
    )
    return arr, bool(applied)


# A1 joint ranges (abad, hip, knee), unitree_legged_sdk a1_const.h /
# config/joint_limits_a1.yaml
A1_Q_MIN = (-0.802, -1.05, -2.70)
A1_Q_MAX = (0.802, 4.19, -0.916)


def position_limit(q, qmin3=A1_Q_MIN, qmax3=A1_Q_MAX) -> tuple:
    """Native joint-range clamp (Safety::PositionLimit analog,
    unitree_legged_sdk safety.h:18; applied at be2r_cmpc_unitree.cpp:486)."""
    import numpy as np

    arr = np.ascontiguousarray(q, dtype=np.float64).reshape(12)
    lo = np.ascontiguousarray(qmin3, dtype=np.float64)
    hi = np.ascontiguousarray(qmax3, dtype=np.float64)
    n = lib().qpm_safety_position_limit(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return arr, n


def position_protect(q_cmd, q_now, limit_rad: float = 0.087) -> tuple:
    """Native command-vs-measured clamp (Safety::PositionProtect analog,
    safety.h:22; default 0.087 rad = 5 deg)."""
    import numpy as np

    arr = np.ascontiguousarray(q_cmd, dtype=np.float64).reshape(12)
    now = np.ascontiguousarray(q_now, dtype=np.float64).reshape(12)
    n = lib().qpm_safety_position_protect(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        now.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        limit_rad,
    )
    return arr, n
