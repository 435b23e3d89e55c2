"""quad_periodic_mpc_tpu — TPU-native convex-MPC engine for quadruped locomotion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``aidagroup/quad-periodic-mpc`` (MIT-Cheetah-style convex MPC + periodic
adaptive disturbance compensation for the Unitree A1), designed TPU-first:

- every compute stage (SRB linearization, ZOH discretization, QP
  condensation, friction-cone assembly, batched QP solve, swing
  trajectories, periodic disturbance estimation) is a pure, jittable,
  vmappable function;
- the batch axis (gait x phase x disturbance hypothesis x terrain
  scenario) is the primary scaling axis, sharded over a device mesh via
  ``jax.sharding``/``shard_map``;
- hot kernels exploit problem structure (the SRB dynamics matrix is
  nilpotent, A^3 = 0, so discretization and condensation are exact closed
  forms — no expm, no sequential power iteration).

Reference behavior map: see SURVEY.md at the repo root; citations in
docstrings point into /root/reference (file:line).
"""

from quad_periodic_mpc_tpu.config import (
    MPCConfig,
    ADMMConfig,
    PDIPConfig,
    EstimatorConfig,
    GaitConfig,
    SwingConfig,
    LoopConfig,
)

__version__ = "0.1.0"
