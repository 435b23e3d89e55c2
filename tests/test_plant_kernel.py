"""Fused plant-substep kernel vs chained art.step_fast (f32)."""

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops.pallas import plant_kernel as PK
from quad_periodic_mpc_tpu.sim import articulated_sim as art

MC = fb.build_a1_constants("float32")


def test_fused_substeps_match_step_fast():
    B = 3
    plant = art.init_on_ground((B,), penetration=3e-3)
    rng = np.random.default_rng(0)
    # perturb so the instances differ and tangential contact engages
    plant = plant._replace(
        fb=plant.fb._replace(
            v_body=jnp.asarray(
                rng.uniform(-0.3, 0.3, (B, 6)).astype(np.float32)
            ),
            qd=jnp.asarray(rng.uniform(-1, 1, (B, 12)).astype(np.float32)),
        )
    )
    tau = jnp.asarray(rng.uniform(-8, 8, (B, 12)).astype(np.float32))
    params = art.ContactParams()
    dt = 2e-4
    n = 10

    cache = art.model_cache(plant, MC)
    info = fb.contact_jacobians(plant.fb, MC)

    pa, pf_a = plant, info.p_foot
    for _ in range(n):
        pa, pf_a, _ = art.step_fast(pa, tau, dt, params, cache, info.Jc, pf_a)

    pb, pf_b = jax.jit(
        lambda p, t, pf: PK.fused_substeps(
            p, t, dt, params, cache, info.Jc, pf, n, interpret=True
        )
    )(plant, tau, info.p_foot)

    np.testing.assert_allclose(
        np.asarray(pb.fb.pos), np.asarray(pa.fb.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pb.fb.quat), np.asarray(pa.fb.quat), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pb.fb.v_body), np.asarray(pa.fb.v_body), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(pb.fb.q), np.asarray(pa.fb.q), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pb.fb.qd), np.asarray(pa.fb.qd), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(pf_b), np.asarray(pf_a), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pb.anchor), np.asarray(pa.anchor), atol=1e-5
    )
