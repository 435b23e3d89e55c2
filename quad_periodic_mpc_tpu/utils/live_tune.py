"""Live retune + telemetry streaming surface.

The reference exposes two operator surfaces while the robot runs: a
dynamic_reconfigure server for live parameter changes
(be2r_cmpc_unitree/config/ros_dynamic_params.cfg, delivered at
be2r_cmpc_unitree.cpp:733-739) and PlotJuggler layouts consuming its ROS
topics (be2r_cmpc_unitree/config/plotjuggler/).  The TPU-native
equivalents here are deliberately transport-minimal:

- `FileTuner`: watches a JSON file and maps changed values onto
  `config.TunableParams` — the TRACED pytree tier, so the running jitted
  rollout chunk picks the new values up on its next invocation with ZERO
  recompilation (tests/test_tunable.py pins that property).  A file (vs a
  socket server) keeps the operator surface scriptable: `echo '{"alpha":
  2e-5}' > tune.json` IS the reconfigure call.

- `UdpTelemetry`: streams per-chunk scalars as one JSON datagram per
  sample — the format PlotJuggler's "UDP Server" source parses directly,
  so the reference's live-plotting workflow (third tab: JSON over UDP)
  carries over unchanged.

Both are stdlib-only (no ROS, no extra deps) and are wired into
`cli.py live` (a chunked rollout that polls the tuner between device
dispatches).
"""

from __future__ import annotations

import json
import os
import socket
from typing import Any, Optional


class FileTuner:
    """Watch a JSON file of TunableParams overrides.

    poll() returns a fresh TunableParams when the file changed since the
    last call (unknown keys are reported, not fatal), else None.  Values
    not present in the file keep the defaults from the static configs.
    """

    def __init__(self, path: str, base, dtype=None):
        self.path = str(path)
        self.base = base                    # TunableParams defaults
        self.dtype = dtype
        self._mtime: Optional[float] = None
        self.unknown_keys: list[str] = []

    def poll(self):
        try:
            mtime = os.stat(self.path).st_mtime
        except OSError:
            return None
        if self._mtime is not None and mtime == self._mtime:
            return None
        self._mtime = mtime
        try:
            with open(self.path) as f:
                raw = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None                     # partial write — retry next poll
        if not isinstance(raw, dict):
            return None
        import jax.numpy as jnp

        dtype = self.dtype or jnp.asarray(self.base.alpha).dtype
        fields = self.base._fields
        updates: dict[str, Any] = {}
        self.unknown_keys = [k for k in raw if k not in fields]
        for k in fields:
            if k in raw:
                updates[k] = jnp.asarray(raw[k], dtype)
        if not updates:
            return self.base
        return self.base._replace(**updates)


class UdpTelemetry:
    """One JSON object per datagram — PlotJuggler "UDP Server" format."""

    def __init__(self, host: str, port: int):
        self.addr = (host, int(port))
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send(self, sample: dict) -> None:
        try:
            self.sock.sendto(
                json.dumps(sample, allow_nan=True).encode(), self.addr
            )
        except OSError:
            pass                            # telemetry must never kill control

    def close(self) -> None:
        self.sock.close()


def parse_hostport(spec: str, default_port: int = 9870) -> tuple[str, int]:
    host, _, port = spec.partition(":")
    return host or "127.0.0.1", int(port) if port else default_port
