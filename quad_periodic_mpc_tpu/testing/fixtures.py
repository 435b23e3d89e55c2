"""Standard MPC-QP problem fixtures.

The canonical randomized A1 MPC QP used by the solver test pyramid and by
``cli.py parity`` (the reference assembles the analogous problem at
SolverMPC.cpp:806-814 from the robot state; here the fixture goes through
the production ``problem.build_qp`` path so solver tests exercise the real
condensation).  Lives in the package (not ``tests/``) so the parity CLI
works from any working directory.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import MPCConfig
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.ops import problem
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat


def make_mpc_qp(horizon=4, batch=(), seed=1, gait_name="trotting"):
    """Randomized perturbed-stand A1 MPC QP at the given horizon.

    Returns ``(qp, cfg, mpc_table)`` where ``qp`` is the condensed
    :class:`~quad_periodic_mpc_tpu.ops.problem.QPData`.
    """
    rng = np.random.default_rng(seed)
    cfg = MPCConfig(horizon=horizon)
    rpy = rng.uniform(-0.1, 0.1, batch + (3,))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    hips = np.array(
        [[0.18, -0.13, -0.26], [0.18, 0.13, -0.26],
         [-0.18, -0.13, -0.26], [-0.18, 0.13, -0.26]]
    )
    r_feet = hips + rng.uniform(-0.03, 0.03, batch + (4, 3))
    obs = problem.RobotObs(
        p=jnp.asarray(np.zeros(batch + (3,)) + np.array([0, 0, 0.26])),
        v=jnp.asarray(rng.uniform(-0.3, 0.3, batch + (3,))),
        quat=jnp.asarray(quat),
        omega=jnp.asarray(rng.uniform(-0.2, 0.2, batch + (3,))),
        r_feet=jnp.asarray(r_feet),
    )
    xref = np.zeros(batch + (horizon, 13))
    xref[..., 5] = 0.26
    g = gait_ops.preset(gait_name)
    seg = jnp.zeros(batch, jnp.int32)
    table = gait_ops.mpc_table(g, seg, horizon)
    table = jnp.broadcast_to(table, batch + (horizon, 4))
    qp, pred, x0 = problem.build_qp(obs, jnp.asarray(xref), table, cfg)
    return qp, cfg, np.asarray(table)
