"""Fused articulated-plant substep kernel.

The plant side of the composed 500 Hz tick runs `substeps` (10)
semi-implicit Euler steps per tick on the tick-frozen model
(articulated_sim.step_fast: cached A^{-1}/G/C + frozen contact
Jacobians + integrated foot positions).  At b=1 those 10 substeps are
~500 XLA ops of dispatch (~1.4-1.6 ms/tick as the separate plant
stream); this kernel runs the whole substep chain per 128-lane chunk in
one dispatch — the same math as step_fast (penalty contact with
stiction anchors, Coulomb cap with anchor slide, manifold quaternion
update), unrolled in VMEM.

Outputs match art.step_fast chains to f32 roundoff
(tests/test_plant_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quad_periodic_mpc_tpu.ops.pallas.wbc_kernel import _mv, _tmv
from quad_periodic_mpc_tpu.ops.pallas.kinematics_kernel import (
    _cross, _quat_to_rotmat,
)

ND = 18


def _kernel(
    quat_ref,     # (4, C)
    pos_ref,      # (3, C)
    vb_ref,       # (6, C)
    q_ref,        # (12, C)
    qd_ref,       # (12, C)
    anchor_ref,   # (8, C) foot-major xy stiction anchors
    tau_ref,      # (12, C)
    Ainv_ref,     # (ND, ND, C)
    G_ref,        # (ND, C)
    Cq_ref,       # (ND, C)
    Jc_ref,       # (12, ND, C) tick-frozen
    pf_ref,       # (12, C) foot-major world foot positions
    quat_out, pos_out, vb_out, q_out, qd_out, anchor_out, pf_out,
    contact_out,  # (4, C)
    *,
    dt: float,
    substeps: int,
    k_normal: float,
    d_normal: float,
    mu: float,
    k_tangent: float,
    d_tangent: float,
):
    C = quat_ref.shape[-1]
    f32 = jnp.float32
    quat = quat_ref[:]
    pos = pos_ref[:]
    vb = vb_ref[:]
    q = q_ref[:]
    qd = qd_ref[:]
    anchor = anchor_ref[:]
    pf = pf_ref[:]
    tau = tau_ref[:]
    Ainv = Ainv_ref[:]
    bvec = Cq_ref[:] + G_ref[:]
    Jc = Jc_ref[:]
    in_contact = jnp.zeros((4, C), f32)

    for _ in range(substeps):
        qdot = jnp.concatenate([vb, qd], axis=0)          # (18, C)
        v_feet = _mv(Jc, qdot, ND)                        # (12, C)

        # penalty contact per foot (articulated_sim.contact_forces)
        f_rows = []
        anew = []
        ic = []
        for k in range(4):
            z = pf[3 * k + 2]
            vz = v_feet[3 * k + 2]
            active = jnp.where(z < 0.0, 1.0, 0.0).astype(f32)
            pen = jnp.maximum(-z, 0.0)
            fz = jnp.maximum(
                k_normal * pen - d_normal * vz * active, 0.0
            ) * active
            ax = anchor[2 * k]
            ay = anchor[2 * k + 1]
            ftx = (-k_tangent * (pf[3 * k] - ax)
                   - d_tangent * v_feet[3 * k]) * active
            fty = (-k_tangent * (pf[3 * k + 1] - ay)
                   - d_tangent * v_feet[3 * k + 1]) * active
            ft_norm = jnp.sqrt(ftx * ftx + fty * fty)
            limit = mu * fz
            slide = ft_norm > limit
            scale = jnp.where(
                slide, limit / jnp.maximum(ft_norm, 1e-9), 1.0
            )
            ftx = ftx * scale
            fty = fty * scale
            ax_slid = pf[3 * k] + ftx / k_tangent
            ay_slid = pf[3 * k + 1] + fty / k_tangent
            ax_new = jnp.where(slide, ax_slid, ax)
            ay_new = jnp.where(slide, ay_slid, ay)
            ax_new = jnp.where(active > 0, ax_new, pf[3 * k])
            ay_new = jnp.where(active > 0, ay_new, pf[3 * k + 1])
            f_rows += [ftx, fty, fz]
            anew += [ax_new, ay_new]
            ic.append(jnp.where(fz > 0, 1.0, 0.0).astype(f32))
        f_c = jnp.stack(f_rows, axis=0)                   # (12, C)
        anchor = jnp.stack(anew, axis=0)
        in_contact = jnp.stack(ic, axis=0)

        # rhs = [0(6); tau] + Jc^T f_c - (C + G)
        JTf = _tmv(Jc, f_c, 12)                           # (18, C)
        rhs = JTf - bvec + jnp.concatenate(
            [jnp.zeros((6, C), f32), tau], axis=0
        )
        qdd = _mv(Ainv, rhs, ND)

        vb = vb + dt * qdd[0:6]
        qd = qd + dt * qdd[6:ND]
        q = q + dt * qd

        R = _quat_to_rotmat(quat)                         # body->world
        pos = pos + dt * _mv(R, vb[3:6], 3)
        w = vb[0:3] * dt
        angle = jnp.sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2])
        inv_a = 1.0 / jnp.maximum(angle, 1e-12)
        half = angle / 2.0
        ch = jnp.cos(half)
        sh = jnp.sin(half)
        dqv = w * (inv_a * sh)[None, :]
        # quat_product(quat, [ch; dqv]) (Hamilton, wxyz)
        qw, qx, qy, qz = quat[0], quat[1], quat[2], quat[3]
        dw, dx, dy, dz = ch, dqv[0], dqv[1], dqv[2]
        nw = qw * dw - qx * dx - qy * dy - qz * dz
        nx = qw * dx + qx * dw + qy * dz - qz * dy
        ny = qw * dy - qx * dz + qy * dw + qz * dx
        nz = qw * dz + qx * dy - qy * dx + qz * dw
        norm = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny + nz * nz)
        quat = jnp.stack([nw, nx, ny, nz], axis=0) * norm[None, :]

        pf = pf + dt * v_feet

    quat_out[:] = quat
    pos_out[:] = pos
    vb_out[:] = vb
    q_out[:] = q
    qd_out[:] = qd
    anchor_out[:] = anchor
    pf_out[:] = pf
    contact_out[:] = in_contact


@functools.partial(jax.jit, static_argnames=(
    "dt", "substeps", "k_normal", "d_normal", "mu", "k_tangent",
    "d_tangent", "interpret",
))
def _dispatch(
    quat, pos, vb, q, qd, anchor, tau, Ainv, G, Cq, Jc, pf,
    dt, substeps, k_normal, d_normal, mu, k_tangent, d_tangent,
    interpret,
):
    B = q.shape[0]
    C = 128
    f32 = jnp.float32
    pad = (-B) % C
    args = (quat, pos, vb, q, qd, anchor, tau, Ainv, G, Cq, Jc, pf)
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        args = tuple(map(padv, args))
    Bp = args[0].shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(t.astype(f32).reshape((nc, C) + extra), 1, -1)

    lanes = tuple(map(to_lanes, args))
    kernel = functools.partial(
        _kernel, dt=float(dt), substeps=int(substeps),
        k_normal=float(k_normal), d_normal=float(d_normal), mu=float(mu),
        k_tangent=float(k_tangent), d_tangent=float(d_tangent),
    )
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            chunk(4, C), chunk(3, C), chunk(6, C), chunk(12, C),
            chunk(12, C), chunk(8, C), chunk(12, C), chunk(ND, ND, C),
            chunk(ND, C), chunk(ND, C), chunk(12, ND, C), chunk(12, C),
        ],
        out_specs=[
            chunk(4, C), chunk(3, C), chunk(6, C), chunk(12, C),
            chunk(12, C), chunk(8, C), chunk(12, C), chunk(4, C),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, 4, C), f32),
            jax.ShapeDtypeStruct((nc, 3, C), f32),
            jax.ShapeDtypeStruct((nc, 6, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
            jax.ShapeDtypeStruct((nc, 8, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
            jax.ShapeDtypeStruct((nc, 4, C), f32),
        ],
        interpret=interpret,
    )(*lanes)

    unl = lambda t, inner: jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]
    shapes = [(4,), (3,), (6,), (12,), (12,), (8,), (12,), (4,)]
    return tuple(unl(o, s) for o, s in zip(outs, shapes))


def fused_substeps(state, tau_joints, dt, params, cache, Jc, p_foot,
                   substeps, interpret: bool = False):
    """Fused replacement for `substeps` chained art.step_fast calls.

    state: art.ArtState; cache = (A_inv, G, C) from model_cache /
    fused_model_eval; Jc, p_foot: tick-frozen contact kinematics.
    Returns (state', p_foot')."""
    from quad_periodic_mpc_tpu.models import floating_base as fb
    from quad_periodic_mpc_tpu.sim import articulated_sim as art

    s = state.fb
    lead = s.pos.shape[:-1]
    B = 1
    for d in lead:
        B *= d
    tau = tau_joints.reshape(tau_joints.shape[:-2] + (12,)) \
        if tau_joints.shape[-1] == 3 else tau_joints
    A_inv, G, Cq = cache
    quat, pos, vb, q, qd, anchor, pf, ic = _dispatch(
        s.quat.reshape(B, 4), s.pos.reshape(B, 3),
        s.v_body.reshape(B, 6), s.q.reshape(B, 12), s.qd.reshape(B, 12),
        state.anchor.reshape(B, 8), tau.reshape(B, 12),
        A_inv.reshape(B, ND, ND), G.reshape(B, ND), Cq.reshape(B, ND),
        Jc.reshape(B, 12, ND), p_foot.reshape(B, 12),
        float(dt), int(substeps),
        params.k_normal, params.d_normal, params.mu,
        params.k_tangent, params.d_tangent, bool(interpret),
    )
    new_state = art.ArtState(
        fb=fb.FBState(
            quat=quat.reshape(lead + (4,)), pos=pos.reshape(lead + (3,)),
            v_body=vb.reshape(lead + (6,)), q=q.reshape(lead + (12,)),
            qd=qd.reshape(lead + (12,)),
        ),
        t=state.t + dt * substeps,
        anchor=anchor.reshape(lead + (4, 2)),
        in_contact=ic.reshape(lead + (4,)),
    )
    return new_state, pf.reshape(lead + (4, 3))
