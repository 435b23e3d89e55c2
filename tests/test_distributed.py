"""Two-process jax.distributed exercise (the DCN code path, for real).

Spawns two ACTUAL processes, each with 4 virtual CPU devices, joined via
jax.distributed (Gloo collectives) into one 8-device mesh, and runs a
sharded sweep rollout with cross-process reductions
(quad_periodic_mpc_tpu/parallel/dist_check.py).  Asserts both processes
compute identical reduced metrics that match a single-process oracle —
proving init_distributed and the multi-process collective path execute,
not merely import.  (SURVEY.md section 4: multi-host sharding tests
runnable on CPU.)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(args, timeout=600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    p = subprocess.run(
        [sys.executable, "-m", "quad_periodic_mpc_tpu.parallel.dist_check",
         *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _spawn_two(extra=()):
    port = _free_port()
    coord = f"localhost:{port}"
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "quad_periodic_mpc_tpu.parallel.dist_check",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        ))
    return procs


def test_two_process_sharded_sweep_matches_single_process():
    procs = _spawn_two()
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    r0, r1 = results
    assert r0["global_devices"] == 8 and r0["local_devices"] == 4
    assert r1["process_id"] == 1
    # both processes see the same collective-reduced metrics
    assert r0["mean_vx_rms"] == r1["mean_vx_rms"]
    assert r0["best_instance"] == r1["best_instance"]
    assert r0["checksum"] == r1["checksum"]

    oracle = _run([])  # single-process, same problem
    assert oracle["num_processes"] == 1
    np.testing.assert_allclose(
        r0["mean_vx_rms"], oracle["mean_vx_rms"], rtol=1e-5
    )
    assert r0["best_instance"] == oracle["best_instance"]
    np.testing.assert_allclose(r0["checksum"], oracle["checksum"], rtol=1e-4)


def test_two_process_weak_scaling_record():
    """measure_weak_scaling executes over the 2-process Gloo mesh — the
    multi-process execution record for the scaling harness (mechanism;
    real efficiency needs real multi-host hardware)."""
    procs = _spawn_two(["--weak-scaling"])
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    for r in results:
        assert r["global_devices"] == 8
        ws = r["weak_scaling"]["8"]
        assert ws["throughput"] > 0
        assert ws["efficiency"] == 1.0  # single-point record, base = itself
