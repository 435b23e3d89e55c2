"""Fused WBC Pallas kernel vs the XLA composition (f32 tolerance).

The kernel (ops/pallas/wbc_kernel.py) re-implements KinWBC + WBIC +
the cone PDIP lane-major in one fused dispatch; these tests pin its
outputs against control/wbc.py's batched XLA path on CPU (interpret
mode), across stance patterns, body motion, and MPC force handoffs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import PDIPConfig
from quad_periodic_mpc_tpu.control import wbc
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

MC = fb.build_a1_constants("float32")
PDIP = PDIPConfig(iterations=15)


def make_states(B, seed=0):
    rng = np.random.default_rng(seed)
    q_stand = np.array([0.0, 0.8, -1.6] * 4, np.float32)
    q = q_stand + rng.uniform(-0.15, 0.15, (B, 12)).astype(np.float32)
    rpy = rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32)
    st = fb.FBState(
        quat=rpy_to_quat(jnp.asarray(rpy)),
        pos=jnp.asarray(
            np.c_[rng.uniform(-.1, .1, (B, 2)),
                  rng.uniform(0.25, 0.32, (B, 1))].astype(np.float32)
        ),
        v_body=jnp.asarray(
            rng.uniform(-0.4, 0.4, (B, 6)).astype(np.float32)
        ),
        q=jnp.asarray(q),
        qd=jnp.asarray(rng.uniform(-1, 1, (B, 12)).astype(np.float32)),
    )
    return st, rng


def make_inputs(st, contact, rng):
    B = st.q.shape[0]
    info = fb.contact_jacobians(st, MC)
    fz = 12.0 * 9.81 / np.maximum(np.asarray(contact).sum(-1, keepdims=True), 1)
    fr = np.zeros((B, 4, 3), np.float32)
    fr[..., 2] = fz * np.asarray(contact)
    fr[..., 0:2] = rng.uniform(-8, 8, (B, 4, 2)) * np.asarray(contact)[..., None]
    p_foot_des = info.p_foot + jnp.asarray(
        rng.uniform(-0.04, 0.04, (B, 4, 3)).astype(np.float32)
    )
    return wbc.WBCInput(
        p_body_des=st.pos + jnp.asarray(
            rng.uniform(-0.02, 0.02, (B, 3)).astype(np.float32)
        ),
        v_body_des=jnp.asarray(rng.uniform(-.3, .3, (B, 3)).astype(np.float32)),
        a_body_des=jnp.zeros((B, 3), jnp.float32),
        rpy_des=jnp.asarray(rng.uniform(-.05, .05, (B, 3)).astype(np.float32)),
        omega_des=jnp.asarray(rng.uniform(-.3, .3, (B, 3)).astype(np.float32)),
        p_foot_des=p_foot_des,
        v_foot_des=jnp.asarray(rng.uniform(-.5, .5, (B, 4, 3)).astype(np.float32)),
        a_foot_des=jnp.asarray(rng.uniform(-2, 2, (B, 4, 3)).astype(np.float32)),
        fr_des=jnp.asarray(fr),
        contact_state=jnp.asarray(np.asarray(contact, np.float32)),
    )


CONTACTS = np.array(
    [[1, 1, 1, 1], [0, 1, 1, 0], [1, 0, 0, 1], [0, 1, 1, 1], [1, 1, 0, 1]],
    np.float32,
)


def _run(st, inp, backend):
    return jax.jit(
        lambda s, i: wbc.run(s, i, MC, pdip=PDIP, backend=backend),
        static_argnames=(),
    )(st, inp)


def test_kernel_matches_xla():
    B = CONTACTS.shape[0] * 2
    st, rng = make_states(B, seed=3)
    contact = np.tile(CONTACTS, (2, 1))
    inp = make_inputs(st, contact, rng)
    out_x = _run(st, inp, "xla")
    out_p = _run(st, inp, "pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.q_des), np.asarray(out_x.q_des), atol=1.5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_p.qd_des), np.asarray(out_x.qd_des), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_p.fr), np.asarray(out_x.fr), atol=1e-1
    )
    np.testing.assert_allclose(
        np.asarray(out_p.tau_ff), np.asarray(out_x.tau_ff), atol=1e-1
    )


def test_kernel_swing_forces_zero():
    st, rng = make_states(4, seed=7)
    contact = np.array(
        [[0, 1, 1, 1], [1, 0, 1, 1], [1, 1, 0, 1], [1, 1, 1, 0]], np.float32
    )
    inp = make_inputs(st, contact, rng)
    out = _run(st, inp, "pallas")
    fr = np.asarray(out.fr)
    for b in range(4):
        np.testing.assert_allclose(fr[b, b], 0.0, atol=1e-4)
        assert (fr[b][contact[b] > 0][:, 2] > 0).all()


def test_kernel_cone_feasibility():
    """Kernel-solved forces respect the friction cone (mu = 0.4)."""
    st, rng = make_states(6, seed=11)
    contact = np.tile(np.array([[1, 1, 1, 1]], np.float32), (6, 1))
    inp = make_inputs(st, contact, rng)
    out = _run(st, inp, "pallas")
    fr = np.asarray(out.fr)
    mu = 0.4
    assert (fr[..., 2] > -1e-3).all()
    assert (np.abs(fr[..., 0]) <= mu * fr[..., 2] + 5e-2).all()
    assert (np.abs(fr[..., 1]) <= mu * fr[..., 2] + 5e-2).all()
