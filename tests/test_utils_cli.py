"""Checkpoint, telemetry, and CLI smoke tests."""

import pytest
import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops import estimator as est
from quad_periodic_mpc_tpu.utils import checkpoint, telemetry

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_checkpoint_roundtrip(tmp_path):
    state = est.init((3,), window=16, dtype=jnp.float64)
    state = state._replace(est_freq=jnp.asarray([0.1, 0.2, 0.3]))
    checkpoint.save(tmp_path / "ck", state)
    template = est.init((3,), window=16, dtype=jnp.float64)
    restored = checkpoint.restore(tmp_path / "ck", template)
    np.testing.assert_allclose(
        np.asarray(restored.est_freq), [0.1, 0.2, 0.3]
    )
    assert restored.times.shape == state.times.shape


def test_timers_and_sync():
    t = telemetry.Timers()
    out = t.time("add", lambda: jnp.arange(10.0) + 1.0, reps=3)
    s = t.summary()
    assert "add" in s and s["add"]["n"] == 1
    assert s["add"]["p50_ms"] >= 0


def test_jsonl_dump(tmp_path):
    recs = telemetry.Telemetry(
        t=jnp.arange(3.0),
        pos=jnp.zeros((3, 3)), rpy=jnp.zeros((3, 3)),
        vel=jnp.zeros((3, 3)), omega=jnp.zeros((3, 3)),
        pos_des=jnp.zeros((3, 3)), vel_des=jnp.zeros((3, 3)),
        foot_forces=jnp.zeros((3, 4, 3)), foot_pos=jnp.zeros((3, 4, 3)),
        contact=jnp.ones((3, 4)), f_est=jnp.zeros((3, 6)),
        est_freq=jnp.zeros(3), est_amp=jnp.zeros(3),
    )
    n = telemetry.jsonl_dump(tmp_path / "log.jsonl", recs)
    assert n == 3
    lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3
    row = json.loads(lines[1])
    assert row["t"] == 1.0


def test_cli_rollout_smoke():
    out = subprocess.run(
        [sys.executable, "-m", "quad_periodic_mpc_tpu", "rollout",
         "--steps", "10", "--f64"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out.stdout)
    assert abs(data["height_final"] - 0.29) < 0.03


def test_file_tuner_poll(tmp_path):
    """FileTuner maps changed JSON values onto TunableParams, ignores
    unchanged files, survives unknown keys + partial writes."""
    from quad_periodic_mpc_tpu.config import TunableParams
    from quad_periodic_mpc_tpu.utils import live_tune as LT

    base = TunableParams.from_config()
    path = tmp_path / "tune.json"
    tuner = LT.FileTuner(str(path), base)
    assert tuner.poll() is None                    # no file yet

    path.write_text(json.dumps({"alpha": 3e-5, "bogus": 1.0}))
    tp = tuner.poll()
    assert tp is not None
    assert abs(float(tp.alpha) - 3e-5) < 1e-12
    assert tuner.unknown_keys == ["bogus"]
    assert float(tp.swing_height) == float(base.swing_height)  # default kept
    assert tuner.poll() is None                    # unchanged -> None

    path.write_text("{not json")                   # partial write
    import os
    os.utime(path, (1e9, 1e9))                     # force mtime change
    assert tuner.poll() is None                    # retried, not fatal


def test_cli_live_retune_smoke(tmp_path):
    """`cli live` picks up a tune-file change between chunks (tune_seq
    increments, alpha reflects the file) — the dynamic_reconfigure
    analog end-to-end."""
    tune = tmp_path / "tune.json"
    tune.write_text(json.dumps({"alpha": 2e-5}))
    out = subprocess.run(
        [sys.executable, "-m", "quad_periodic_mpc_tpu", "live",
         "--steps", "4", "--chunk", "2", "--solver-iters", "10",
         "--tune-file", str(tune)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(rows) == 2
    assert rows[0]["tune_seq"] == 1
    assert abs(rows[0]["alpha"] - 2e-5) < 1e-10
    assert rows[-1]["mpc_steps"] == 4
