"""be2r height estimator: calibration, bias rejection, tracking."""

import jax
import jax.numpy as jnp
import numpy as np

from quad_periodic_mpc_tpu.estimation import be2r_height as B


def _run(n, a_fn, v_fn, batch=(), dt=0.002):
    s = B.init(batch)

    def body(s, i):
        t = i.astype(jnp.float32) * dt
        s = B.step(s, a_fn(t), v_fn(t), dt)
        return s, s.z

    s, zs = jax.lax.scan(body, s, jnp.arange(n))
    return s, zs


def test_calibration_holds_output():
    # during the first 500 ticks the estimate must stay at the 0.056 init
    a = lambda t: jnp.array([0.1, 0.0, 0.3])
    v = lambda t: jnp.asarray(0.05)
    s, zs = _run(400, a, v)
    assert np.allclose(np.asarray(zs), 0.056)
    assert int(s.count) == 400


def test_constant_bias_rejected():
    # constant accel/vel bias is exactly the calibrated offset -> z stays put
    a = lambda t: jnp.array([0.0, 0.0, 0.4])
    v = lambda t: jnp.asarray(0.02)
    _, zs = _run(3000, a, v)
    assert abs(float(zs[-1]) - 0.056) < 2e-3


def test_tracks_true_vertical_velocity():
    # after calibration, a true constant climb rate integrates into z
    dt = 0.002
    rise = 0.1  # m/s

    def v(t):
        return jnp.where(t > (B.CALIB_TICKS + 1) * dt, rise, 0.0)

    a = lambda t: jnp.zeros(3)
    _, zs = _run(4000, a, v, dt=dt)
    # ~ (4000 - 501) * dt * rise of climb, minus filter lag
    expect = (4000 - B.CALIB_TICKS - 1) * dt * rise
    assert abs(float(zs[-1]) - 0.056 - expect) < 0.05 * expect + 0.01


def test_batched_mixed_phase():
    s = B.init((3,))
    # advance instance 0 past calibration, leave 1,2 calibrating
    s = s._replace(count=jnp.array([600, 10, 0], jnp.int32))
    a = jnp.zeros((3, 3))
    v = jnp.full((3,), 0.1)
    s2 = B.step(s, a, v, 0.002)
    assert float(s2.z[0]) != 0.056     # ran the filter
    assert np.allclose(np.asarray(s2.z[1:]), 0.056)  # still calibrating
    assert int(s2.count[1]) == 11 and int(s2.count[0]) == 600


def test_shared_state_quirk_differs():
    # the faithful shared-static mode must produce a different trajectory
    s_a = B.init()
    s_b = B.init()
    rng = np.random.default_rng(0)
    z_a = z_b = None
    s_a = s_a._replace(count=jnp.asarray(600, jnp.int32))
    s_b = s_b._replace(count=jnp.asarray(600, jnp.int32))
    for i in range(200):
        a = jnp.array([0.0, 0.0, float(rng.normal(0, 0.5))])
        v = jnp.asarray(float(rng.normal(0.05, 0.1)))
        s_a = B.step(s_a, a, v, 0.002, shared_state=False)
        s_b = B.step(s_b, a, v, 0.002, shared_state=True)
    assert float(jnp.abs(s_a.z - s_b.z)) > 0.0
