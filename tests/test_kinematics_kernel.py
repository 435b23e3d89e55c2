"""Fused contact-kinematics kernel vs fb.contact_jacobians (f32)."""

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops.pallas import kinematics_kernel as KK
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

MC = fb.build_a1_constants("float32")


def make_states(B, seed=0):
    rng = np.random.default_rng(seed)
    q_stand = np.array([0.0, 0.8, -1.6] * 4, np.float32)
    return fb.FBState(
        quat=rpy_to_quat(
            jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32))
        ),
        pos=jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)),
        v_body=jnp.asarray(rng.uniform(-1, 1, (B, 6)).astype(np.float32)),
        q=jnp.asarray(
            q_stand + rng.uniform(-0.4, 0.4, (B, 12)).astype(np.float32)
        ),
        qd=jnp.asarray(rng.uniform(-3, 3, (B, 12)).astype(np.float32)),
    )


def test_kinematics_kernel_matches_xla():
    st = make_states(7, seed=2)
    ref = jax.jit(lambda s: fb.contact_jacobians(s, MC))(st)
    got = jax.jit(
        lambda s: KK.fused_contact_kinematics(s, MC, interpret=True)
    )(st)
    np.testing.assert_allclose(
        np.asarray(got.Jc), np.asarray(ref.Jc), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.Jcdqd), np.asarray(ref.Jcdqd), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.p_foot), np.asarray(ref.p_foot), atol=2e-5
    )


def test_model_kernel_matches_xla():
    """fused_model_eval (CRBA + gravity + Coriolis + contact kin, one
    dispatch) vs the XLA floating_base functions."""
    from quad_periodic_mpc_tpu.ops import linalg

    st = make_states(5, seed=4)
    A_ref = jax.jit(lambda s: fb.mass_matrix(s, MC))(st)
    G_ref = jax.jit(lambda s: fb.generalized_gravity(s, MC))(st)
    C_ref = jax.jit(lambda s: fb.generalized_coriolis(s, MC))(st)
    info_ref = jax.jit(lambda s: fb.contact_jacobians(s, MC))(st)
    A, Ainv, G, Cq, info = jax.jit(
        lambda s: KK.fused_model_eval(s, MC, interpret=True)
    )(st)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(Cq), np.asarray(C_ref), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(info.Jc), np.asarray(info_ref.Jc), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(info.p_foot), np.asarray(info_ref.p_foot), atol=2e-5
    )
    # Ainv is the exact Schur inverse of the kernel's own A
    ident = np.einsum("bij,bjk->bik", np.asarray(Ainv), np.asarray(A))
    np.testing.assert_allclose(
        ident, np.broadcast_to(np.eye(18), ident.shape), atol=5e-3
    )
