"""Golden parity vs the reference's actual compiled qpOASES solver.

Builds the vendored qpOASES from the read-only reference tree
(tools/golden/build.sh) and solves the exact QPs our pipeline assembles
with the reference's solver call semantics (QProblem + Options::setToMPC +
nWSR=100, SolverMPC.cpp:955-982).  This upgrades parity evidence from
"matches an independent NumPy re-derivation" to "matches the reference
solver's output", including the swing-leg variable-elimination equivalence
(SolverMPC.cpp:859-950) that our mask formulation replaces.
"""

import numpy as np
import pytest

from quad_periodic_mpc_tpu.config import ADMMConfig, PDIPConfig
from quad_periodic_mpc_tpu.ops import problem, qp_admm, qp_pdip, qp_stagewise
from quad_periodic_mpc_tpu.testing import golden

from quad_periodic_mpc_tpu.testing.fixtures import make_mpc_qp

pytestmark = pytest.mark.skipif(
    not golden.available(), reason="reference qpOASES tree not available"
)


def _solve_golden(qp, horizon, reduced=False):
    A = golden.dense_constraint_matrix(np.asarray(qp.F), horizon)
    x, status, aux = golden.solve(
        np.asarray(qp.P), np.asarray(qp.q), A,
        np.asarray(qp.l), np.asarray(qp.u), reduced=reduced,
    )
    assert status == 0, f"qpOASES status {status}"
    return x, aux


# trot segments chosen so the gait table mixes stance and swing steps
SCENES = [
    dict(horizon=10, seed=3, segment=0),
    dict(horizon=10, seed=11, segment=2),
    dict(horizon=16, seed=5, segment=5),
]


def _scene(horizon, seed, segment):
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import gait as gait_ops

    qp, cfg, _ = make_mpc_qp(horizon=horizon, seed=seed)
    g = gait_ops.preset("trotting")
    table = gait_ops.mpc_table(g, jnp.asarray(segment, jnp.int32), horizon)
    table = np.asarray(table, dtype=float)
    # rebuild bounds for the shifted gait phase
    from quad_periodic_mpc_tpu.ops import constraints as con

    l, u = con.bounds(jnp.asarray(table), cfg.f_max, cfg.big_number)
    qp = qp._replace(
        l=jnp.reshape(l, (horizon * 20,)), u=jnp.reshape(u, (horizon * 20,))
    )
    return qp, cfg, table


@pytest.mark.parametrize("scene", SCENES)
def test_swing_leg_elimination_equivalence(scene):
    """The reference's reduced (variable-eliminated) solve equals its own
    full-size solve with zero bounds — on the reference solver itself.
    This is the formal license for our shape-uniform mask formulation."""
    qp, cfg, table = _scene(**scene)
    n_swing = int(np.sum(table < 0.5))
    x_full, _ = _solve_golden(qp, scene["horizon"], reduced=False)
    x_red, n_red = _solve_golden(qp, scene["horizon"], reduced=True)
    assert n_red == 12 * scene["horizon"] - 3 * n_swing
    np.testing.assert_allclose(x_red, x_full, atol=1e-6)
    # eliminated variables are exactly zero in the re-expanded solution
    swing_mask = np.repeat((table.reshape(-1) < 0.5), 3)
    assert np.all(x_red[swing_mask] == 0.0)


@pytest.mark.parametrize("scene", SCENES)
def test_admm_matches_reference_qpoases(scene):
    qp, cfg, _ = _scene(**scene)
    x_gold, _ = _solve_golden(qp, scene["horizon"], reduced=True)
    x, _ = qp_admm.solve(qp, ADMMConfig(iterations=400))
    np.testing.assert_allclose(np.asarray(x), x_gold, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("scene", SCENES)
def test_pdip_matches_reference_qpoases(scene):
    qp, cfg, _ = _scene(**scene)
    x_gold, _ = _solve_golden(qp, scene["horizon"], reduced=True)
    x, _ = qp_pdip.solve(qp, PDIPConfig(iterations=40))
    np.testing.assert_allclose(np.asarray(x), x_gold, atol=2e-3, rtol=1e-3)


def test_production_warm_admm_converges_to_reference():
    """Warm-carried ADMM-30 (the production setting) re-solving the same
    drifting-free QP converges to the reference solver's solution: the
    cumulative-iteration claim behind the closed-loop agreement test."""
    scene = SCENES[1]
    qp, cfg, _ = _scene(**scene)
    x_gold, _ = _solve_golden(qp, scene["horizon"], reduced=True)
    acfg = ADMMConfig(iterations=30)
    warm = None
    for _ in range(6):
        x, warm = qp_admm.solve(qp, acfg, warm=warm)
    np.testing.assert_allclose(np.asarray(x), x_gold, atol=2e-3, rtol=1e-3)


def test_stagewise_matches_reference_qpoases():
    """Long-horizon stagewise (Riccati-ADMM) path vs reference solver at
    h=16 on the identical problem (condensed and stagewise are the same QP
    in different parametrizations)."""
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from test_qp import make_mpc_qp as _mk

    horizon, seed, segment = 16, 5, 5
    qp, cfg, table = _scene(horizon=horizon, seed=seed, segment=segment)
    x_gold, _ = _solve_golden(qp, horizon, reduced=True)

    # rebuild the same scene's stagewise problem
    rng = np.random.default_rng(seed)
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

    rpy = rng.uniform(-0.1, 0.1, (3,))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    hips = np.array(
        [[0.18, -0.13, -0.26], [0.18, 0.13, -0.26],
         [-0.18, -0.13, -0.26], [-0.18, 0.13, -0.26]]
    )
    r_feet = hips + rng.uniform(-0.03, 0.03, (4, 3))
    obs = problem.RobotObs(
        p=jnp.asarray(np.array([0, 0, 0.26])),
        v=jnp.asarray(rng.uniform(-0.3, 0.3, (3,))),
        quat=jnp.asarray(quat),
        omega=jnp.asarray(rng.uniform(-0.2, 0.2, (3,))),
        r_feet=jnp.asarray(r_feet),
    )
    xref = np.zeros((horizon, 13))
    xref[..., 5] = 0.26
    sw, _, _ = problem.build_stagewise(
        obs, jnp.asarray(xref), jnp.asarray(table), cfg
    )
    U, _ = qp_stagewise.solve(sw, ADMMConfig(iterations=400))
    np.testing.assert_allclose(
        np.asarray(U).reshape(-1), x_gold, atol=3e-3, rtol=1e-3
    )
