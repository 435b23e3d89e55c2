#!/usr/bin/env python
"""WBC sub-stage timing on TPU (batch 256): model eval / kin_wbc /
WBIC cascade / WBIC PDIP — names the fullstack tick's next lever."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import PDIPConfig
    from quad_periodic_mpc_tpu.control import wbc as W
    from quad_periodic_mpc_tpu.models import floating_base as fb
    from quad_periodic_mpc_tpu.ops import linalg
    from quad_periodic_mpc_tpu.sim import articulated_sim as art

    dtype = jnp.float32
    B = args.batch
    mc = fb.build_a1_constants("float32")
    plant = art.init_on_ground((B,), penetration=3.8e-3, dtype=dtype)
    fbs = plant.fb
    info = fb.contact_jacobians(fbs, mc)
    winp = W.WBCInput(
        p_body_des=fbs.pos,
        v_body_des=jnp.zeros((B, 3), dtype),
        a_body_des=jnp.zeros((B, 3), dtype),
        rpy_des=jnp.zeros((B, 3), dtype),
        omega_des=jnp.zeros((B, 3), dtype),
        p_foot_des=info.p_foot,
        v_foot_des=jnp.zeros((B, 4, 3), dtype),
        a_foot_des=jnp.zeros((B, 4, 3), dtype),
        fr_des=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 30.0], dtype), (B, 4, 3)),
        contact_state=jnp.asarray(
            np.tile([1.0, 0.0, 0.0, 1.0], (B, 1)), dtype
        ),
    )
    gains = W.WBCGains()
    pdip = PDIPConfig(iterations=20, kkt="spd")

    def fence(fn, name, *inputs):
        jfn = jax.jit(fn)
        out = jfn(*inputs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jfn(*inputs)
        cs = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        assert np.isfinite(cs), name
        print(f"{name:40s} {dt:7.3f} ms", flush=True)
        return out

    def model(fbs):
        A = fb.mass_matrix(fbs, mc)
        return (A, linalg.spd_inverse(A), fb.generalized_gravity(fbs, mc),
                fb.generalized_coriolis(fbs, mc), fb.contact_jacobians(fbs, mc))

    mdl = fence(model, "model (A, A^-1, G, C, Jc)", fbs)
    A, Ainv, grav, cori, contact = mdl

    contact_mask = (winp.contact_state > 0.0).astype(dtype)
    Jc_masked = contact.Jc * contact_mask[..., None, None]
    Jcdqd_masked = contact.Jcdqd * contact_mask[..., None]
    fr_des_masked = winp.fr_des * contact_mask[..., None]

    def tasks(fbs, contact):
        return W._build_tasks(fbs, contact, winp, gains, dtype)

    jac, errs, vels, cmds, jdqd = fence(tasks, "_build_tasks", fbs, contact)

    def kin(fbs):
        return W.kin_wbc(fbs, Jc_masked, jac, errs, vels, gains)

    fence(kin, "kin_wbc (pinv cascade)", fbs)

    def wbic_full(fbs):
        return W.wbic(fbs, A, Ainv, cori, grav, Jc_masked, Jcdqd_masked,
                      jac, cmds, jdqd, fr_des_masked, contact_mask, gains,
                      pdip)

    fence(wbic_full, "wbic (cascade + PDIP-20)", fbs)

    def wbic_pdip5(fbs):
        return W.wbic(fbs, A, Ainv, cori, grav, Jc_masked, Jcdqd_masked,
                      jac, cmds, jdqd, fr_des_masked, contact_mask, gains,
                      PDIPConfig(iterations=5, kkt="spd"))

    fence(wbic_pdip5, "wbic (cascade + PDIP-5)", fbs)

    def full(fbs):
        return W.run(fbs, winp, mc, gains=gains, pdip=pdip,
                     model=(A, Ainv, grav, cori, contact))

    fence(full, "wbc.run (model precomputed)", fbs)

    def full_nomodel(fbs):
        return W.run(fbs, winp, mc, gains=gains, pdip=pdip)

    fence(full_nomodel, "wbc.run (model in-call)", fbs)


if __name__ == "__main__":
    main()
