"""Observability hub — the Debug-class analog (src/common/debug/debug.cpp).

The reference publishes per-tick ROS topics (/all_legs_info, /body_info,
LogData, RViz markers) and ad-hoc Timer prints
(ConvexMPCLocomotion.cpp:588-598).  The TPU rebuild's channels:

- ``Telemetry``: a pytree snapshot of per-tick controller observables
  (body/leg states, MPC forces, estimator internals) suitable for
  batched collection inside lax.scan traces and host-side dumping;
- ``Timers``: wall-clock stage accounting with hard device sync (the
  axon relay makes block_until_ready unreliable — timers transfer a
  scalar checksum to fence);
- ``jsonl_dump``: LogData-style structured record stream.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Telemetry(NamedTuple):
    """Per-tick observable bundle (LogData.msg + BodyInfo/AllLegsInfo
    analog, unitree_legged_msgs/msg/LogData.msg:1-50)."""

    t: jnp.ndarray              # (...,)
    pos: jnp.ndarray            # (..., 3)
    rpy: jnp.ndarray            # (..., 3)
    vel: jnp.ndarray            # (..., 3)
    omega: jnp.ndarray          # (..., 3)
    pos_des: jnp.ndarray        # (..., 3)
    vel_des: jnp.ndarray        # (..., 3)
    foot_forces: jnp.ndarray    # (..., 4, 3)
    foot_pos: jnp.ndarray       # (..., 4, 3)
    contact: jnp.ndarray        # (..., 4)
    f_est: jnp.ndarray          # (..., 6)
    est_freq: jnp.ndarray       # (...,)
    est_amp: jnp.ndarray        # (...,)


def sync(x) -> float:
    """Hard device fence: returns a host float, guaranteeing everything
    producing x has executed (see bench.py note on the axon relay)."""
    return float(jnp.sum(jax.tree.leaves(x)[0]))


@dataclass
class Timers:
    """Named stage timers with p50/p99 summaries (the rebuild's
    PeriodicTaskManager::printStatus / SHOW_MPC_SOLVE_TIME analog)."""

    records: dict = field(default_factory=dict)

    def time(self, name: str, fn, *args, reps: int = 1, **kw):
        out = fn(*args, **kw)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        self.records.setdefault(name, []).append(dt)
        return out

    def summary(self) -> dict:
        out = {}
        for name, xs in self.records.items():
            arr = np.asarray(xs) * 1e3
            out[name] = {
                "p50_ms": float(np.percentile(arr, 50)),
                "p99_ms": float(np.percentile(arr, 99)),
                "mean_ms": float(arr.mean()),
                "n": len(xs),
            }
        return out


def jsonl_dump(path: str | Path, records: Any) -> int:
    """Append telemetry pytrees (with leading time axis) as JSON lines."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(records)
    leaves = [np.asarray(x) for x in leaves]
    n = leaves[0].shape[0]
    with path.open("a") as f:
        for i in range(n):
            row = jax.tree.unflatten(treedef, [x[i] for x in leaves])
            f.write(json.dumps(jax.tree.map(
                lambda v: np.asarray(v).tolist(), row._asdict()
                if hasattr(row, "_asdict") else row
            )) + "\n")
    return n
