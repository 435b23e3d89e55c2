#!/usr/bin/env python
"""eq_mode convergence experiment (CPU): uniform vs woodbury.

For each mode: warm closed-loop KKT residuals over 8 MPC steps (the
test_kkt_ceiling methodology) + first-step force gap vs the PDIP
reference on the same QPs.

Round-3 measurements that set the eq_mode default (h=10 trot, batch 128,
vx=0.3, 8 warm steps):

    woodbury it30   primal 2.03e-3  dual 3.10e-4  |f-f_pdip| 3.8
    uniform  it30   primal 1.17e-3  dual 2.32e-4  |f-f_pdip| 2.9
    uniform  it50   primal 1.64e-4  dual 9.39e-5  |f-f_pdip| 0.53

Rejected variants (removed from the code): eq-scaled rho in the z/y
updates with uniform-rho K diverges outright (1000x dual-gain mismatch,
NaN by step 8, even at 10x); eq-scaling the fz row of EVERY block
(gait-independent matched-rho K) pins stance fz too and leaves ~100 N
solution error at ADMM-30.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig, PDIPConfig,
)
from quad_periodic_mpc_tpu.control import mpc as M
from quad_periodic_mpc_tpu.ops import gait as G
from quad_periodic_mpc_tpu.ops import qp_admm, qp_pdip
from quad_periodic_mpc_tpu.sim import srb_sim as S


def run(mode: str, iters: int = 30, batch: int = 128, steps: int = 8):
    dtype = jnp.float32
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = ADMMConfig(iterations=iters, eq_mode=mode)
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc

    plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((batch,), obs, dtype=dtype, horizon=10)
    ctrl = ctrl._replace(
        iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208
    )
    cmd = M.Command(
        vx=jnp.full((batch,), 0.3, dtype), vy=jnp.zeros((batch,), dtype),
        yaw_rate=jnp.zeros((batch,), dtype),
        body_height=jnp.full((batch,), 0.29, dtype),
    )
    gait = G.preset("trotting")
    dist = S.DisturbanceParams.reference((batch,), dtype=dtype)

    @jax.jit
    def step(ctrl, plant):
        obs = S.observe(plant)
        ctrl, forces, qp = M.mpc_step(
            ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
            solver, return_qp=True,
        )
        seg = G.segment_index(gait, ctrl.iteration,
                              loop_cfg.iterations_between_mpc)
        stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
        plant = S.step(plant, forces[..., 0, :, :], plant.p_feet, stance,
                       dist, mpc_cfg, dt_mpc)
        ctrl = ctrl._replace(
            iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
        )
        res = qp_admm.kkt_residuals(qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y)
        return ctrl, plant, res, qp, forces

    t0 = time.perf_counter()
    for s in range(steps):
        ctrl, plant, res, qp, forces = step(ctrl, plant)
    wall = time.perf_counter() - t0

    # force gap vs PDIP on the final-step QPs
    x_ref_sol, _ = qp_pdip.solve(qp, PDIPConfig(iterations=40))
    gap = np.abs(np.asarray(ctrl.warm_x - x_ref_sol))
    # first-step forces only (what the plant sees)
    gap_f0 = gap.reshape(batch, 10, 12)[:, 0, :]
    r = {k: np.asarray(v) for k, v in res.items()}
    print(
        f"{mode:9s} iters={iters:3d}  primal max {r['primal'].max():.2e} "
        f"p50 {np.percentile(r['primal'], 50):.2e}  "
        f"dual max {r['dual'].max():.2e}  feas {r['feas'].max():.2e}  "
        f"|f-f_pdip| max {gap.max():.2e} f0 {gap_f0.max():.2e}  "
        f"[{wall:.1f}s]"
    )


if __name__ == "__main__":
    for it in (30, 50):
        for mode in ("uniform", "woodbury"):
            run(mode, iters=it)
