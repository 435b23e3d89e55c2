"""Gait timing and swing-trajectory tests vs literal re-derivations of the
reference math (Gait.cpp, FootSwingTrajectory.cpp, Interpolation.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.ops import swing

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def ref_gait_state(offsets, durations, nseg, iteration, iters_per_mpc):
    """Oracle: OffsetDurationGait::{setIterations,getContactState,
    getSwingState,getMpcTable} (Gait.cpp:47-226) transliterated to numpy."""
    phase = (iteration % (iters_per_mpc * nseg)) / float(iters_per_mpc * nseg)
    seg = (iteration // iters_per_mpc) % nseg

    off_f = np.asarray(offsets, float) / nseg
    dur_f = np.asarray(durations, float) / nseg

    contact = np.zeros(4)
    for i in range(4):
        o = off_f[i] + (1.0 if off_f[i] < 0 else 0.0)
        pr = phase - o
        if pr < 0:
            pr += 1.0
        contact[i] = 0.0 if (dur_f[i] <= 0 or pr > dur_f[i]) else pr / dur_f[i]

    sw = np.zeros(4)
    for i in range(4):
        so = off_f[i] + dur_f[i]
        if so > 1:
            so -= 1.0
        sd = 1.0 - dur_f[i]
        pr = phase - so
        if pr < 0:
            pr += 1.0
        sw[i] = 0.0 if (sd <= 0 or pr >= sd) else pr / sd

    return phase, seg, contact, sw


def ref_mpc_table(offsets, durations, nseg, seg, horizon):
    table = np.zeros((horizon, 4), int)
    for i in range(horizon):
        it = (i + seg + 1) % nseg
        for j in range(4):
            pr = it - offsets[j]
            if pr < 0:
                pr += nseg
            table[i, j] = 1 if pr < durations[j] else 0
    return table


@pytest.mark.parametrize("name", list(gait_ops.PRESET_GAITS))
@pytest.mark.parametrize("iteration", [0, 7, 13, 100, 207, 4095])
def test_gait_matches_reference_math(name, iteration):
    g = gait_ops.preset(name)
    nseg = int(g.n_segments)          # trot_long pins its own period (32)
    off, dur = gait_ops._preset_tables(nseg)[name]
    it = jnp.asarray(iteration, jnp.int32)
    ph = gait_ops.phase(g, it, 13)
    seg = gait_ops.segment_index(g, it, 13)
    ref_ph, ref_seg, ref_c, ref_s = ref_gait_state(off, dur, nseg, iteration, 13)
    assert abs(float(ph) - ref_ph) < 1e-6
    assert int(seg) == ref_seg
    np.testing.assert_allclose(
        np.asarray(gait_ops.contact_state(g, ph)), ref_c, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gait_ops.swing_state(g, ph)), ref_s, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(gait_ops.mpc_table(g, seg, 10)),
        ref_mpc_table(off, dur, nseg, ref_seg, 10),
    )


def test_trot_table_alternates():
    g = gait_ops.preset("trotting")
    table = np.asarray(gait_ops.mpc_table(g, jnp.asarray(0), 16))
    # diagonal pairs (FR+RL) vs (FL+RR) alternate; always 2 feet down
    assert (table.sum(axis=1) == 2).all()
    assert (table[:, 0] == table[:, 3]).all()
    assert (table[:, 1] == table[:, 2]).all()
    assert (table[:, 0] != table[:, 1]).all()


def ref_bezier(y0, yf, x):
    return y0 + (x**3 + 3 * x**2 * (1 - x)) * (yf - y0)


def test_swing_trajectory_matches_reference():
    """computeSwingTrajectoryBezier oracle (FootSwingTrajectory.cpp:17-41)."""
    rng = np.random.default_rng(3)
    p0 = rng.uniform(-1, 1, 3)
    pf = rng.uniform(-1, 1, 3)
    h, st = 0.09, 0.28
    for phase in [0.0, 0.2, 0.49, 0.5, 0.62, 0.99]:
        ev = swing.evaluate(
            jnp.asarray(p0), jnp.asarray(pf), h,
            jnp.asarray(phase), jnp.asarray(st),
        )
        p = np.asarray(ev.p)
        # xy single-segment bezier
        for ax in range(2):
            assert abs(p[ax] - ref_bezier(p0[ax], pf[ax], phase)) < 1e-9
        # z two-segment
        if phase < 0.5:
            zp = ref_bezier(p0[2], p0[2] + h, phase * 2)
        else:
            zp = ref_bezier(p0[2] + h, pf[2], phase * 2 - 1)
        assert abs(p[2] - zp) < 1e-9

    # endpoint + apex properties
    ev0 = swing.evaluate(jnp.asarray(p0), jnp.asarray(pf), h,
                         jnp.asarray(0.0), jnp.asarray(st))
    ev1 = swing.evaluate(jnp.asarray(p0), jnp.asarray(pf), h,
                         jnp.asarray(1.0), jnp.asarray(st))
    evm = swing.evaluate(jnp.asarray(p0), jnp.asarray(pf), h,
                         jnp.asarray(0.5), jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(ev0.p), p0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ev1.p), pf, atol=1e-9)
    assert abs(float(evm.p[2]) - (p0[2] + h)) < 1e-9


def test_swing_velocity_is_derivative():
    p0 = jnp.asarray([0.0, 0.0, 0.0])
    pf = jnp.asarray([0.2, 0.05, 0.0])
    h, st = 0.09, 0.28
    eps = 1e-6
    for phase in [0.2, 0.41, 0.67]:
        ev = swing.evaluate(p0, pf, h, jnp.asarray(phase), jnp.asarray(st))
        ep = swing.evaluate(p0, pf, h, jnp.asarray(phase + eps), jnp.asarray(st))
        # d p / d t = (dp/dphase) / swing_time
        num_v = (np.asarray(ep.p) - np.asarray(ev.p)) / (eps * st)
        np.testing.assert_allclose(np.asarray(ev.v), num_v, rtol=1e-4, atol=1e-5)


def test_gait_sweep_batching():
    g = gait_ops.stacked_presets(["trotting", "pacing", "bounding"])
    it = jnp.asarray([0, 100, 200], jnp.int32)
    ph = gait_ops.phase(g, it, 13)
    c = gait_ops.contact_state(g, ph)
    assert c.shape == (3, 4)
    seg = gait_ops.segment_index(g, it, 13)
    t = gait_ops.mpc_table(g, seg, 10)
    assert t.shape == (3, 10, 4)
