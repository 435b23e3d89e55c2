"""MixedFrequncyGait semantics: per-leg periods, shared duty cycle."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops import gait as G

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_phase_per_leg_periods():
    g = G.mixed(periods=(8, 10, 12, 16), duty_cycle=0.5)
    ipm = 13
    it = 3 * 13 * 8 + 5  # leg 0 exactly wrapped 3 times + 5
    ph = np.asarray(G.mixed_phase(g, jnp.asarray(it), ipm))
    for j, T in enumerate([8, 10, 12, 16]):
        span = 13 * T
        assert abs(ph[j] - (it % span) / span) < 1e-6
    assert np.all((ph >= 0) & (ph < 1))


def test_contact_swing_partition():
    g = G.mixed(periods=(8, 10, 12, 16), duty_cycle=0.4)
    ipm = 13
    for it in [0, 7, 55, 123, 1000]:
        ph = G.mixed_phase(g, jnp.asarray(it), ipm)
        c = np.asarray(G.mixed_contact_state(g, ph))
        s = np.asarray(G.mixed_swing_state(g, ph))
        # exactly one of (contact, swing) is active per leg
        active_c = c > 0
        active_s = s > 0
        phase0 = np.asarray(ph) == 0.0  # both zero exactly at touchdown
        assert np.all(active_c ^ active_s | phase0)
        assert np.all((c >= 0) & (c <= 1) & (s >= 0) & (s <= 1))


def test_mpc_table_duty_fraction():
    # over a full common period, each leg's stance fraction == duty cycle
    g = G.mixed(periods=(4, 5, 8, 10), duty_cycle=0.5)
    tab = np.asarray(G.mixed_mpc_table(g, jnp.asarray(0), 13, horizon=40))
    assert tab.shape == (40, 4)
    frac = tab.mean(0)
    # integer threshold: stance segments per cycle = #{p in [0,T) : p < T*duty}
    expect = [np.sum(np.arange(T) < T * 0.5) / T for T in [4, 5, 8, 10]]
    assert np.allclose(frac, expect)
    # period structure: column j repeats with period T_j
    for j, T in enumerate([4, 5, 8, 10]):
        assert np.array_equal(tab[:40 - T, j], tab[T:, j])


def test_times_scale_with_period():
    g = G.mixed(periods=(8, 10, 12, 16), duty_cycle=0.4)
    sw = np.asarray(G.mixed_swing_time(g, 0.026))
    st = np.asarray(G.mixed_stance_time(g, 0.026))
    assert np.allclose(sw, 0.026 * 0.6 * np.array([8, 10, 12, 16]))
    assert np.allclose(st, 0.026 * 0.4 * np.array([8, 10, 12, 16]))
    assert np.allclose(sw + st, 0.026 * np.array([8, 10, 12, 16]))


def test_batched():
    periods = jnp.asarray([[8, 8, 8, 8], [6, 8, 10, 12]], jnp.int32)
    g = G.MixedGaitParams(
        periods=periods,
        duty_cycle=jnp.asarray([0.5, 0.4], jnp.float32),
        n_segments=jnp.asarray([10, 10], jnp.int32),
    )
    it = jnp.asarray([100, 100])
    ph = G.mixed_phase(g, it, 13)
    assert ph.shape == (2, 4)
    tab = G.mixed_mpc_table(g, it, 13, horizon=10)
    assert tab.shape == (2, 10, 4)
