"""Scalar/vector signal filters, functional and batched.

Rebuilds src/common/Utilities/filters.{h,cpp} (butterworth,
digital low-pass, moving average, low-passed derivative) as pure
(state, x) -> (state, y) transitions usable inside lax.scan — the
reference's mutable filter objects become explicit state pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LowPassState(NamedTuple):
    y: jnp.ndarray


def first_order_lp(state: LowPassState, x, alpha) -> tuple[LowPassState, jnp.ndarray]:
    """y' = (1 - alpha) y + alpha x (FirstOrderIIRFilter.h; also the
    velocity-command filter at ConvexMPCLocomotion.cpp:106-117)."""
    y = (1.0 - alpha) * state.y + alpha * x
    return LowPassState(y), y


class BiquadState(NamedTuple):
    x1: jnp.ndarray
    x2: jnp.ndarray
    y1: jnp.ndarray
    y2: jnp.ndarray


def make_digital_lp(w_c: float, t_s: float):
    """Second-order digital low-pass (digital_lp_filter, filters.cpp):
    Tustin discretization of wc^2 / (s^2 + sqrt(2) wc s + wc^2).

    Returns (init_state_fn, step_fn).
    """
    import numpy as np

    lam = 2.0 / t_s
    den = lam * lam + np.sqrt(2.0) * w_c * lam + w_c * w_c
    b = np.array([w_c * w_c, 2 * w_c * w_c, w_c * w_c]) / den
    a = np.array([
        1.0,
        (2 * w_c * w_c - 2 * lam * lam) / den,
        (lam * lam - np.sqrt(2.0) * w_c * lam + w_c * w_c) / den,
    ])

    def init(shape=(), dtype=jnp.float32) -> BiquadState:
        z = jnp.zeros(shape, dtype)
        return BiquadState(z, z, z, z)

    def step(state: BiquadState, x):
        y = (
            b[0] * x + b[1] * state.x1 + b[2] * state.x2
            - a[1] * state.y1 - a[2] * state.y2
        )
        return BiquadState(x, state.x1, y, state.y1), y

    return init, step


def make_deriv_lp(w_c: float, t_s: float):
    """Low-passed differentiator (deriv_lp_filter, filters.cpp):
    s * wc / (s + wc), Tustin."""
    lam = 2.0 / t_s
    den = lam + w_c
    # first-order Tustin of wc s / (s + wc)
    b1 = w_c * lam / den
    a1 = (w_c - lam) / den

    def init(shape=(), dtype=jnp.float32):
        return BiquadState(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        )

    def step(state: BiquadState, x):
        y = b1 * (x - state.x1) - a1 * state.y1
        return BiquadState(x, state.x1, y, state.y1), y

    return init, step


class MovingAverageState(NamedTuple):
    buf: jnp.ndarray    # (..., n)
    count: jnp.ndarray  # (...,)


def moving_average_init(n: int, shape=(), dtype=jnp.float32) -> MovingAverageState:
    return MovingAverageState(
        buf=jnp.zeros(shape + (n,), dtype), count=jnp.zeros(shape, jnp.int32)
    )


def moving_average(state: MovingAverageState, x) -> tuple[MovingAverageState, jnp.ndarray]:
    """Windowed mean (moving_average_filter, filters.cpp), warmup-aware."""
    n = state.buf.shape[-1]
    buf = jnp.concatenate([state.buf[..., 1:], x[..., None]], axis=-1)
    count = jnp.minimum(state.count + 1, n)
    mask = (
        jnp.arange(n) >= (n - count[..., None])
    )
    y = jnp.sum(buf * mask, axis=-1) / jnp.maximum(count, 1)
    return MovingAverageState(buf, count), y
