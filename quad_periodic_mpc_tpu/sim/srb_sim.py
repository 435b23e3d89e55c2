"""Analytic SRB plant with periodic disturbance injection.

Replaces RaiSim (raisim_unitree_ros_driver) for closed-loop validation:
the plant is the same single-rigid-body model the MPC linearizes, stepped
with the exact nilpotent ZOH at the control dt and re-linearized about
the current orientation every step, plus the reference experiment's
disturbance

    F_x = d_s + d_n * sin(2 pi f t + phi)
    (applyExternalForce, raisim_unitree_ros_driver.cpp:601-621;
     defaults d_s = -10 N, d_n = 15 N, f = 0.33 Hz,
     raisim_unitree_ros_driver.hpp:126-130)

injected through the same Q_d channel the estimator models: the MPC's
disturbance states are accelerations (Q_ct rows 6..11 are identity, not
I^-1 / 1/m — SolverMPC.cpp:607-616), so a base force F enters as F/m.

Disturbance parameters are arrays -> thousands of disturbance hypotheses
batch along leading axes (the fault-injection axis of SURVEY.md section 5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import MPCConfig
from quad_periodic_mpc_tpu.models import srb
from quad_periodic_mpc_tpu.ops import discretize
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat, rpy_to_rotmat


class DisturbanceParams(NamedTuple):
    """F_x = static + amp * sin(2 pi freq t + phase), applied at the base."""

    static: jnp.ndarray   # (...,) N
    amp: jnp.ndarray      # (...,) N
    freq: jnp.ndarray     # (...,) Hz
    phase: jnp.ndarray    # (...,) rad

    @staticmethod
    def reference(batch: tuple = (), dtype=jnp.float32) -> "DisturbanceParams":
        """The paper's test signal (raisim_unitree_ros_driver.cpp:606)."""
        f = lambda v: jnp.full(batch, v, dtype)
        return DisturbanceParams(f(-10.0), f(15.0), f(0.33), f(0.0))

    @staticmethod
    def zero(batch: tuple = (), dtype=jnp.float32) -> "DisturbanceParams":
        f = lambda v: jnp.full(batch, v, dtype)
        return DisturbanceParams(f(0.0), f(0.0), f(0.33), f(0.0))


class WrenchDisturbance(NamedTuple):
    """Per-component sinusoidal 6-wrench disturbance (acceleration space):
    w_i(t) = static_i + amp_i sin(2 pi freq_i t + phase_i) — the general
    case of the reference's x-force-only signal; exercises the ls6
    full-wrench estimator."""

    static: jnp.ndarray   # (..., 6)
    amp: jnp.ndarray      # (..., 6)
    freq: jnp.ndarray     # (..., 6)
    phase: jnp.ndarray    # (..., 6)

    @staticmethod
    def zero(batch: tuple = (), dtype=jnp.float32) -> "WrenchDisturbance":
        z = lambda: jnp.zeros(batch + (6,), dtype)
        return WrenchDisturbance(z(), jnp.zeros(batch + (6,), dtype),
                                 jnp.full(batch + (6,), 0.33, dtype), z())


class PlantState(NamedTuple):
    x: jnp.ndarray        # (..., 13) SRB state [rpy, p, omega, v, -g]
    p_feet: jnp.ndarray   # (..., 4, 3) foot positions, world
    t: jnp.ndarray        # (...,) sim time


def init_plant(
    batch: tuple = (),
    body_height: float = 0.29,
    model_hips=None,
    dtype=jnp.float32,
) -> PlantState:
    """Robot standing at the origin with feet under the hips."""
    import numpy as np

    from quad_periodic_mpc_tpu.models.a1 import A1

    hips = np.asarray(model_hips if model_hips is not None else A1.hip_locations())
    feet = hips.copy()
    feet[:, 2] = 0.0
    feet[:, 1] += np.asarray(A1.side_signs()) * A1.leg.abad_link_length
    x = np.zeros(13)
    x[5] = body_height
    x[12] = -9.8
    return PlantState(
        x=jnp.broadcast_to(jnp.asarray(x, dtype), batch + (13,)),
        p_feet=jnp.broadcast_to(jnp.asarray(feet, dtype), batch + (4, 3)),
        t=jnp.zeros(batch, dtype),
    )


def disturbance_wrench(
    dist, t: jnp.ndarray, mass: float, dtype
) -> jnp.ndarray:
    """(..., 6) acceleration-space wrench [tau_acc(3); lin_acc(3)]."""
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)
    if isinstance(dist, WrenchDisturbance):
        return dist.static + dist.amp * jnp.sin(
            two_pi * dist.freq * t[..., None] + dist.phase
        )
    fx = dist.static + dist.amp * jnp.sin(two_pi * dist.freq * t + dist.phase)
    zeros = jnp.zeros_like(fx)
    return jnp.stack([zeros, zeros, zeros, fx / mass, zeros, zeros], axis=-1)


def step(
    plant: PlantState,
    forces: jnp.ndarray,
    p_foot_des: jnp.ndarray,
    stance_mask: jnp.ndarray,
    dist: DisturbanceParams,
    cfg: MPCConfig,
    dt: float,
    ground_fn=None,
) -> PlantState:
    """One plant step of length dt.

    Args:
      forces: (..., 4, 3) world-frame ground reaction forces (the MPC's
        Fr_des; only stance feet push).
      p_foot_des: (..., 4, 3) controller swing-foot position targets —
        swing feet teleport along their commanded trajectory (perfect
        tracking; torque-level leg dynamics arrive with the WBC tier).
      stance_mask: (..., 4) 1 = foot on ground.
      ground_fn: optional terrain surface ``xy (..., 2) -> z (...,)`` —
        swing feet cannot penetrate the ground, so a foot commanded below
        the surface is clamped onto it (early touchdown against a riser
        face, the situation the RaiSim stairs scene creates for a
        terrain-blind controller).
    """
    dtype = plant.x.dtype
    rpy = plant.x[..., 0:3]
    p = plant.x[..., 3:6]
    R = rpy_to_rotmat(rpy)
    r_feet = plant.p_feet - p[..., None, :]

    A, B, Qc = srb.ct_dynamics(
        R, r_feet, cfg.mass, jnp.asarray(cfg.inertia_body, dtype)
    )
    Adt, Bdt, Qdt = discretize.nilpotent_zoh(A, B, Qc, dt)

    u = (forces * stance_mask[..., None]).reshape(forces.shape[:-2] + (12,))
    w = disturbance_wrench(dist, plant.t, cfg.mass, dtype)

    x_new = (
        jnp.einsum("...ij,...j->...i", Adt, plant.x)
        + jnp.einsum("...ij,...j->...i", Bdt, u)
        + jnp.einsum("...ij,...j->...i", Qdt, w)
    )
    feet_new = jnp.where(
        stance_mask[..., None] > 0.5, plant.p_feet, p_foot_des
    )
    if ground_fn is not None:
        gz = ground_fn(feet_new[..., 0:2])
        feet_new = feet_new.at[..., 2].set(
            jnp.maximum(feet_new[..., 2], gz)
        )
    return PlantState(x=x_new, p_feet=feet_new, t=plant.t + dt)


def observe(plant: PlantState):
    """PlantState -> controller Observation fields (cheater estimator:
    the reference's cheater_mode ground-truth path,
    be2r_cmpc_unitree.cpp:507-512)."""
    from quad_periodic_mpc_tpu.control.mpc import Observation

    rpy = plant.x[..., 0:3]
    return Observation(
        p=plant.x[..., 3:6],
        v=plant.x[..., 9:12],
        quat=rpy_to_quat(rpy),
        omega=plant.x[..., 6:9],
        p_feet=plant.p_feet,
    )
