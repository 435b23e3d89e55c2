"""Closed-loop rollout: controller + SRB plant under jax.lax.scan.

The TPU equivalent of the reference's 500 Hz process loop
(Body_Manager::run, be2r_cmpc_unitree.cpp:263-327) against RaiSim: an
outer scan over MPC periods, an inner scan over the
iterations_between_mpc control ticks (FSM_State_Locomotion.cpp:13).
Fully batched — a leading batch axis on all states rolls out thousands of
scenarios in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig,
    EstimatorConfig,
    LoopConfig,
    MPCConfig,
    PDIPConfig,
    SwingConfig,
)
from quad_periodic_mpc_tpu.control import mpc as mpc_ctrl
from quad_periodic_mpc_tpu.models.a1 import RobotModel, A1
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.sim import srb_sim


class RolloutCarry(NamedTuple):
    plant: srb_sim.PlantState
    ctrl: mpc_ctrl.ControllerState


class RolloutTrace(NamedTuple):
    """Per-MPC-step telemetry (LogData analog)."""

    x: jnp.ndarray            # (..., steps, 13) plant state
    forces: jnp.ndarray       # (..., steps, 4, 3) first-step MPC forces
    f_est: jnp.ndarray        # (..., steps, 6) estimated wrench
    est_freq: jnp.ndarray     # (..., steps)
    est_amp: jnp.ndarray      # (..., steps)


def rollout(
    n_mpc_steps: int,
    plant: srb_sim.PlantState,
    ctrl: mpc_ctrl.ControllerState,
    cmd: mpc_ctrl.Command,
    gait: gait_ops.GaitParams,
    dist: srb_sim.DisturbanceParams,
    mpc_cfg: MPCConfig,
    loop_cfg: LoopConfig,
    est_cfg: EstimatorConfig,
    solver: ADMMConfig | PDIPConfig,
    model: RobotModel = A1,
    swing_cfg: SwingConfig = SwingConfig(),
) -> tuple[RolloutCarry, RolloutTrace]:
    """Run n_mpc_steps MPC periods (each = iterations_between_mpc ticks)."""

    def control_tick(carry: RolloutCarry, do_mpc: bool):
        plant, ctrl = carry
        obs = srb_sim.observe(plant)

        ctrl = mpc_ctrl.setup_command(ctrl, cmd, loop_cfg)
        if do_mpc:
            ctrl, _ = mpc_ctrl.mpc_step(
                ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
                solver,
            )
        ctrl, out = mpc_ctrl.swing_update(
            ctrl, obs, cmd, gait, model, swing_cfg, mpc_cfg, loop_cfg,
            loop_cfg.swing_height,
        )
        stance = (out.swing_state <= 0).astype(plant.x.dtype)
        plant = srb_sim.step(
            plant, out.fr_des, out.p_foot_des, stance, dist, mpc_cfg,
            loop_cfg.dt,
        )
        return RolloutCarry(plant, ctrl)

    def mpc_period(carry: RolloutCarry, _):
        carry = control_tick(carry, do_mpc=True)

        def inner(c, _):
            return control_tick(c, do_mpc=False), None

        carry, _ = jax.lax.scan(
            inner, carry, None, length=loop_cfg.iterations_between_mpc - 1
        )
        trace = RolloutTrace(
            x=carry.plant.x,
            forces=carry.ctrl.fr_des,
            f_est=carry.ctrl.est.f_est,
            est_freq=carry.ctrl.est.est_freq,
            est_amp=carry.ctrl.est.est_amp,
        )
        return carry, trace

    carry = RolloutCarry(plant, ctrl)
    carry, traces = jax.lax.scan(mpc_period, carry, None, length=n_mpc_steps)
    # scan stacks on axis 0; move steps after batch axes
    batch_ndim = plant.t.ndim
    traces = jax.tree.map(lambda a: jnp.moveaxis(a, 0, batch_ndim), traces)
    return carry, traces
