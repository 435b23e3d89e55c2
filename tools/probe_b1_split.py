#!/usr/bin/env python
"""b=1 controller-tick cost split (round 5): chain 26 ticks of
progressively larger controller pipelines inside one lax.scan dispatch
and difference the medians — identifies where the 2 ms budget goes at
batch 1 (op-dispatch-bound regime: every XLA op costs ~fixed us at b=1).

Stages:
  obs      observe_plant (FK + contact jacobians)
  model    + mass matrix, spd_inverse, gravity, coriolis
  mpc      + setup_command + mpc_step every 13th tick + swing_update
  wbc      + fused WBC kernel + joint PD torques   (= controller stream)
  plant    + 10 step_fast substeps                 (= composed tick)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import ADMMConfig, LoopConfig, MPCConfig
    from quad_periodic_mpc_tpu.control import full_stack as FS
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.models import floating_base as fb
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.ops import linalg
    from quad_periodic_mpc_tpu.sim import articulated_sim as art

    dtype = jnp.float32
    MC = fb.build_a1_constants("float32")
    P = fb.A1ModelParams()
    m_tot = P.body_mass + 4 * (
        P.abad_mass + P.hip_mass + P.knee_mass + 3 * P.rotor_mass
    )
    cfg = MPCConfig(horizon=10, mass=float(m_tot),
                    inertia_body=(0.12, 0.45, 0.42))
    loop_cfg = LoopConfig()
    solver = ADMMConfig(iterations=30, formulation="stagewise",
                        backend="pallas")
    plant = art.init_on_ground((1,), penetration=3.8e-3, dtype=dtype)
    obs0, _, _ = FS.observe_plant(plant, MC)
    ctrl0 = M.init_state((1,), obs0, dtype=dtype)
    cmd = M.Command(
        vx=jnp.full((1,), 0.15, dtype), vy=jnp.zeros((1,), dtype),
        yaw_rate=jnp.zeros((1,), dtype),
        body_height=plant.fb.pos[..., 2],
    )
    gait = G.preset("trotting")
    TICKS = 26

    def chain(body):
        def outer(plant, ctrl):
            def period(c, _):
                c = body(c, True)

                def inner(cc, _):
                    return body(cc, False), None

                c, _ = jax.lax.scan(inner, c, None, length=12)
                return c, None

            (p2, c2), _ = jax.lax.scan(period, (plant, ctrl), None, length=2)
            return p2, c2
        return jax.jit(outer)

    def t_obs(c, do_mpc):
        plant, ctrl = c
        obs, R, info = FS.observe_plant(plant, MC)
        # fold the observation into ctrl state so nothing is DCE'd
        ctrl = ctrl._replace(
            x_vel_des=ctrl.x_vel_des + 1e-12 * obs.p[..., 0]
            + 1e-12 * info.Jc[..., 0, 0, 0]
        )
        return (plant, ctrl)

    def t_model(c, do_mpc):
        plant, ctrl = c
        obs, R, info = FS.observe_plant(plant, MC)
        A = fb.mass_matrix(plant.fb, MC)
        Ainv = linalg.spd_inverse(A)
        Gv = fb.generalized_gravity(plant.fb, MC)
        Cv = fb.generalized_coriolis(plant.fb, MC)
        ctrl = ctrl._replace(
            x_vel_des=ctrl.x_vel_des + 1e-12 * (
                obs.p[..., 0] + Ainv[..., 0, 0] + Gv[..., 0] + Cv[..., 0]
                + info.Jc[..., 0, 0, 0]
            )
        )
        return (plant, ctrl)

    def t_mpc(c, do_mpc):
        plant, ctrl = c
        obs, R, info = FS.observe_plant(plant, MC)
        A = fb.mass_matrix(plant.fb, MC)
        Ainv = linalg.spd_inverse(A)
        Gv = fb.generalized_gravity(plant.fb, MC)
        Cv = fb.generalized_coriolis(plant.fb, MC)
        ctrl = M.setup_command(ctrl, cmd, loop_cfg)
        if do_mpc:
            ctrl, _ = M.mpc_step(
                ctrl, obs, cmd, gait, plant.t, cfg, loop_cfg,
                FS.EstimatorConfig(), solver,
            )
        ctrl, out = M.swing_update(
            ctrl, obs, cmd, gait, FS.A1, FS.SwingConfig(), cfg, loop_cfg,
            loop_cfg.swing_height,
        )
        ctrl = ctrl._replace(
            x_vel_des=ctrl.x_vel_des + 1e-12 * (
                Ainv[..., 0, 0] + Gv[..., 0] + Cv[..., 0]
                + out.p_foot_des[..., 0, 0]
            )
        )
        return (plant, ctrl)

    def t_wbc(c, do_mpc):
        plant, ctrl = c
        ctrl, tau, model = FS.controller_tick(
            plant, ctrl, cmd, gait, MC, do_mpc, mpc_cfg=cfg,
            loop_cfg=loop_cfg, solver=solver, wbc_backend="pallas",
        )
        ctrl = ctrl._replace(
            x_vel_des=ctrl.x_vel_des + 1e-12 * tau[..., 0, 0]
        )
        return (plant, ctrl)

    def t_wbc_kk(c, do_mpc):
        plant, ctrl = c
        ctrl, tau, model = FS.controller_tick(
            plant, ctrl, cmd, gait, MC, do_mpc, mpc_cfg=cfg,
            loop_cfg=loop_cfg, solver=solver, wbc_backend="pallas",
            kin_backend="pallas",
        )
        ctrl = ctrl._replace(
            x_vel_des=ctrl.x_vel_des + 1e-12 * tau[..., 0, 0]
        )
        return (plant, ctrl)

    def t_plant_kk(c, do_mpc):
        plant, ctrl = c
        ctrl, tau, (A, Ainv, Gv, Cv, info) = FS.controller_tick(
            plant, ctrl, cmd, gait, MC, do_mpc, mpc_cfg=cfg,
            loop_cfg=loop_cfg, solver=solver, wbc_backend="pallas",
            kin_backend="pallas",
        )
        cache = (Ainv, Gv, Cv)
        cp = art.ContactParams()

        def sub(cc, _):
            p, pf = cc
            p2, pf2, _ = art.step_fast(
                p, tau, loop_cfg.dt / 10.0, cp, cache, info.Jc, pf
            )
            return (p2, pf2), None

        (plant, _), _ = jax.lax.scan(
            sub, (plant, info.p_foot), None, length=10
        )
        return (plant, ctrl)

    def t_plant(c, do_mpc):
        plant, ctrl = c
        ctrl, tau, (A, Ainv, Gv, Cv, info) = FS.controller_tick(
            plant, ctrl, cmd, gait, MC, do_mpc, mpc_cfg=cfg,
            loop_cfg=loop_cfg, solver=solver, wbc_backend="pallas",
        )
        cache = (Ainv, Gv, Cv)
        cp = art.ContactParams()

        def sub(cc, _):
            p, pf = cc
            p2, pf2, _ = art.step_fast(
                p, tau, loop_cfg.dt / 10.0, cp, cache, info.Jc, pf
            )
            return (p2, pf2), None

        (plant, _), _ = jax.lax.scan(
            sub, (plant, info.p_foot), None, length=10
        )
        return (plant, ctrl)

    results = {}
    for name, body in (
        ("obs", t_obs), ("model", t_model), ("mpc", t_mpc),
        ("wbc=ctrl-stream", t_wbc), ("plant=composed", t_plant),
        ("ctrl-stream kinK", t_wbc_kk), ("composed kinK", t_plant_kk),
    ):
        fn = chain(body)
        p2, c2 = fn(plant, ctrl0)
        float(jnp.sum(p2.fb.pos) + jnp.sum(c2.x_vel_des))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            p2, c2 = fn(plant, c2)
            float(jnp.sum(p2.fb.pos) + jnp.sum(c2.x_vel_des))
            ts.append((time.perf_counter() - t0) / TICKS * 1e3)
        med = float(np.median(ts))
        results[name] = med
        print(f"{name:16s}: {med:7.3f} ms/tick  p99 "
              f"{float(np.percentile(ts, 99)):7.3f}", flush=True)
    keys = list(results)
    for a, b in zip(keys, keys[1:]):
        print(f"  delta {b:16s}: {results[b] - results[a]:+.3f} ms")


if __name__ == "__main__":
    main()
