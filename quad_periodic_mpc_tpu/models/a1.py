"""Unitree A1 (and GO1) robot constants.

Two tiers of model parameters, mirroring the reference:

1. SRB (single rigid body) parameters used by the convex MPC:
   mass = 12 kg (RobotState.h:26), lumped body inertia
   diag(0.07, 0.26, 0.242) (RobotState.cpp:45-49).  Note the MPC's lumped
   mass intentionally includes legs (the articulated body mass below is
   6 kg body + legs).

2. Kinematic / per-link parameters used by leg kinematics and the
   floating-base model: MiniCheetah.h:27-110 (A1 branch) — body 6 kg,
   abad/hip/knee link lengths 0.0838 / 0.2 / 0.2, abad location
   (+-0.1805, +-0.047, 0).

Leg index convention (reference LegController / Quadruped::getHipLocation,
Quadruped.h:95-102): 0 = FR, 1 = FL, 2 = RR, 3 = RL; x forward, y left,
z up.  Sign patterns:
  hip_x = +L/2 for legs 0,1 (front), -L/2 for 2,3 (rear)
  hip_y = +W/2 for legs 1,3 (left),  -W/2 for 0,2 (right)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SRBParams:
    """Single-rigid-body parameters for the convex MPC."""

    mass: float
    inertia_body: Tuple[float, float, float]   # diagonal of I_body

    def inertia_matrix(self) -> np.ndarray:
        return np.diag(np.asarray(self.inertia_body, dtype=np.float64))


@dataclasses.dataclass(frozen=True)
class LegParams:
    """Per-leg kinematic constants (3-DoF abad/hip/knee legs)."""

    abad_link_length: float
    hip_link_length: float
    knee_link_length: float
    abad_location_x: float     # half body length
    abad_location_y: float     # half body width
    max_leg_length: float


@dataclasses.dataclass(frozen=True)
class RobotModel:
    name: str
    srb: SRBParams
    leg: LegParams
    # Torque limits per joint type (abad, hip, knee) and the safe-mode cap
    # (be2r_cmpc_unitree.cpp:680-716: 17/17/26 Nm, safe 3 Nm).
    tau_max: Tuple[float, float, float] = (17.0, 17.0, 26.0)
    tau_safe: float = 3.0

    def hip_locations(self) -> np.ndarray:
        """(4, 3) hip (abad) locations in the body frame.

        Matches Quadruped::getHipLocation (Quadruped.h:95-102)."""
        x = self.leg.abad_location_x
        y = self.leg.abad_location_y
        return np.array(
            [[x, -y, 0.0], [x, y, 0.0], [-x, -y, 0.0], [-x, y, 0.0]],
            dtype=np.float64,
        )

    def side_signs(self) -> np.ndarray:
        """(4,) y-axis sign per leg: -1 right (0, 2), +1 left (1, 3)
        (ConvexMPCLocomotion.cpp:282 side_sign)."""
        return np.array([-1.0, 1.0, -1.0, 1.0])


A1 = RobotModel(
    name="a1",
    srb=SRBParams(mass=12.0, inertia_body=(0.07, 0.26, 0.242)),
    leg=LegParams(
        abad_link_length=0.0838,
        hip_link_length=0.2,
        knee_link_length=0.2,
        abad_location_x=0.1805,
        abad_location_y=0.047,
        max_leg_length=0.4,
    ),
)

GO1 = RobotModel(
    name="go1",
    srb=SRBParams(mass=12.0, inertia_body=(0.07, 0.26, 0.242)),
    leg=LegParams(
        abad_link_length=0.08,
        hip_link_length=0.213,
        knee_link_length=0.213,
        abad_location_x=0.1881,
        abad_location_y=0.04675,
        max_leg_length=0.4,
    ),
)


def get_model(name: str) -> RobotModel:
    models = {"a1": A1, "go1": GO1}
    if name not in models:
        raise KeyError(f"unknown robot model {name!r}; have {sorted(models)}")
    return models[name]
