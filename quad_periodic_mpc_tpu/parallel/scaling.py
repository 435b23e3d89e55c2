"""Scaling-efficiency harness (BASELINE.md: >= 80% efficiency to 4 hosts).

Methodology: fix the per-device instance count (weak scaling), run the
same jitted batched MPC step on 1, 2, ..., N devices of the mesh, and
report throughput_k / (k * throughput_1).  On real hardware the mesh
spans ICI (one host) or DCN (jax.distributed, multi-host); in CI the
virtual CPU mesh validates the mechanism.

Multi-host bring-up: call init_distributed() once per process before any
jax call (the jax.distributed analog of the reference's roslaunch
process graph, SURVEY.md section 2.4).
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.parallel import mesh as mesh_lib


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed bring-up for multi-host meshes (DCN)."""
    kw = {}
    if coordinator is not None:
        kw = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def _sync(x) -> float:
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def measure_weak_scaling(
    make_inputs: Callable[[int], tuple],
    step: Callable,
    per_device: int,
    device_counts: list[int] | None = None,
    reps: int = 5,
) -> dict:
    """Weak-scaling sweep.

    make_inputs(batch) -> pytree of batched inputs; step(*inputs) -> out.
    Returns {devices: {"throughput": instances/s, "efficiency": r}}.
    """
    n_dev = len(jax.devices())
    device_counts = device_counts or [
        k for k in [1, 2, 4, 8, 16, 32] if k <= n_dev
    ]
    step_jit = jax.jit(step)
    results = {}
    base = None
    for k in device_counts:
        mesh = mesh_lib.make_mesh(k)
        batch = per_device * k
        inputs = mesh_lib.shard_batch(make_inputs(batch), mesh)
        out = step_jit(*inputs)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step_jit(*inputs)
        _sync(out)
        dt = (time.perf_counter() - t0) / reps
        thr = batch / dt
        if base is None:
            base = thr / k            # per-device throughput at the
            # first measured count (k=1 in the standard sweep)
        results[k] = {
            "throughput": thr,
            "efficiency": (thr / k) / base,
        }
    return results
