"""Fused contact-kinematics Pallas kernel (FK + foot Jacobians).

The b=1 composed 500 Hz tick is XLA-op-dispatch bound, and its single
largest stage is `fb.contact_jacobians` — the 13-body spatial-algebra
chain (forwardKinematics + bias accelerations + per-leg Jacobian walk,
FloatingBaseModel.cpp:509-625) compiles to ~10^2 tiny 6x6 ops costing
~1.3 ms/tick at batch 1 (tools/probe_b1_split.py).  This kernel runs
the whole chain fused per 128-lane chunk with a compact (R, r)
representation of every spatial motion transform:

    X(R, r) = [[R, 0], [-R [r]x, R]]
    X2 X1   = X(R2 R1, r1 + R1^T r2)
    X v     = [R w; R (v3 - r x w)]

so the 6x6 block algebra collapses to 3x3 lane matmuls + crosses.
Rotor terms are NOT needed here (contactJacobians uses link
kinematics only).  Outputs match fb.contact_jacobians to f32
roundoff (tests/test_kinematics_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quad_periodic_mpc_tpu.ops.pallas.wbc_kernel import _mm, _mv, _t

N_DOF = 18


def _cross(a, b):
    """Lane cross product: (3, C) x (3, C) -> (3, C)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def _quat_to_rotmat(q):
    """(4, C) wxyz -> (3, 3, C) body->world (ops/rotations formula)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=0),
            jnp.stack([r10, r11, r12], axis=0),
            jnp.stack([r20, r21, r22], axis=0),
        ],
        axis=0,
    )


def _joint_R(axis, q):
    """Coordinate rotation about x or y (orientation_tools.h:66-89)."""
    c = jnp.cos(q)
    s = jnp.sin(q)
    one = jnp.ones_like(q)
    zero = jnp.zeros_like(q)
    if axis == "x":
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    else:   # "y"
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    return jnp.stack(
        [jnp.stack(r, axis=0) for r in rows], axis=0
    )


def _xapply(R, r, v6):
    """X(R, r) @ [w; v] = [R w; R (v - r x w)] -> (6, C)."""
    w = v6[0:3]
    v = v6[3:6]
    top = _mv(R, w, 3)
    bot = _mv(R, v - _cross(r, w), 3)
    return jnp.concatenate([top, bot], axis=0)


def _kernel(
    quat_ref,     # (4, C)
    pos_ref,      # (3, C)
    vb_ref,       # (6, C) [omega_body; v_body]
    q_ref,        # (12, C)
    qd_ref,       # (12, C)
    Rtree_ref,    # (12, 3, 3) shared
    rtree_ref,    # (12, 3) shared
    gcloc_ref,    # (4, 3) shared
    Jc_out,       # (12, 18, C)  foot-major rows
    Jcdqd_out,    # (12, C)
    pfoot_out,    # (12, C)
    *,
    parents: tuple,
    axes: tuple,
    gc_body: tuple,
):
    C = quat_ref.shape[-1]
    f32 = jnp.float32
    q = q_ref[:]
    qd = qd_ref[:]

    # base: Xup[0] = sxform(R_world->body, pos) = (R_wb, pos)
    R_bw = _quat_to_rotmat(quat_ref[:])          # body->world
    R0 = _t(R_bw, 3, 3)                          # world->body
    r0 = pos_ref[:]
    v0 = vb_ref[:]

    Rup = [R0]
    rup = [r0]
    Ra = [R0]
    ra = [r0]
    v = [v0]
    cbias = [jnp.zeros((6, C), f32)]
    for j in range(12):
        body = j + 1
        parent = parents[j]
        Rj = _joint_R(axes[j], q[j])
        Rt = jnp.broadcast_to(Rtree_ref[j][:, :, None], (3, 3, C))
        rt = jnp.broadcast_to(rtree_ref[j][:, None], (3, C))
        R_up = _mm(Rj, Rt, 3)                    # XJ Xtree: (Rj Rt, rt)
        r_up = rt
        Rup.append(R_up)
        rup.append(r_up)
        # Xa[body] = Xup[body] Xa[parent] = (R_up Ra_p, ra_p + Ra_p^T r_up)
        Ra_p = Ra[parent]
        Ra.append(_mm(R_up, Ra_p, 3))
        ra.append(ra[parent] + _mv(_t(Ra_p, 3, 3), r_up, 3))
        # v[body] = Xup v[parent] + S qd (static-axis one-hot built by
        # stack — Mosaic has no scatter lowering)
        a_idx = 0 if axes[j] == "x" else 1
        zeroC = jnp.zeros((C,), f32)
        comps = [zeroC, zeroC, zeroC]
        comps[a_idx] = qd[j]
        aq = jnp.stack(comps, axis=0)
        vj = _xapply(R_up, r_up, v[parent]) + jnp.concatenate(
            [aq, jnp.zeros((3, C), f32)], axis=0
        )
        v.append(vj)
        # c = motion_cross(v_body, vJ) with vJ = [a qd; 0]:
        # top = w x (a qd), bot = v3 x (a qd)
        cbias.append(
            jnp.concatenate(
                [_cross(vj[0:3], aq), _cross(vj[3:6], aq)], axis=0
            )
        )

    # bias accelerations avp[body] = Xup avp[parent] + c[body]
    avp = [jnp.zeros((6, C), f32)]
    for j in range(12):
        body = j + 1
        avp.append(
            _xapply(Rup[body], rup[body], avp[parents[j]]) + cbias[body]
        )

    for leg in range(4):
        i0 = gc_body[leg]
        Rai = _t(Ra[i0], 3, 3)                   # link->world
        loc = jnp.broadcast_to(gcloc_ref[leg][:, None], (3, C))
        ac = _xapply(Rai, loc, avp[i0])
        vc = _xapply(Rai, loc, v[i0])
        Jcdqd = ac[3:6] + _cross(vc[0:3], vc[3:6])

        # Xout = linear rows of Xc = [-Rai [loc]x | Rai]
        locx = jnp.stack(
            [
                jnp.stack([jnp.zeros((C,), f32), -loc[2], loc[1]], axis=0),
                jnp.stack([loc[2], jnp.zeros((C,), f32), -loc[0]], axis=0),
                jnp.stack([-loc[1], loc[0], jnp.zeros((C,), f32)], axis=0),
            ],
            axis=0,
        )
        Wl = -_mm(Rai, locx, 3)                  # (3, 3, C) omega block
        Wr = Rai                                  # (3, 3, C) linear block

        cols = {}
        i = i0
        while i > 0:
            j = i - 1
            a_idx = 0 if axes[j] == "x" else 1
            cols[6 + j] = Wl[:, a_idx, :]        # Xout @ S (omega axis)
            # Xout <- Xout @ Xup[i]:
            # [Wl | Wr] [[R,0],[-R[r]x,R]] = [Wl R - Wr R [r]x | Wr R]
            R_i = Rup[i]
            r_i = rup[i]
            rx = jnp.stack(
                [
                    jnp.stack([jnp.zeros((C,), f32), -r_i[2], r_i[1]], axis=0),
                    jnp.stack([r_i[2], jnp.zeros((C,), f32), -r_i[0]], axis=0),
                    jnp.stack([-r_i[1], r_i[0], jnp.zeros((C,), f32)], axis=0),
                ],
                axis=0,
            )
            WrR = _mm(Wr, R_i, 3)
            Wl = _mm(Wl, R_i, 3) - _mm(WrR, rx, 3)
            Wr = WrR
            i = parents[j]

        # assemble the (3, 18, C) leg block: cols 0:3 = Wl, 3:6 = Wr,
        # joint cols from `cols`, rest zero
        zc = jnp.zeros((3, C), f32)
        all_cols = [Wl[:, k, :] for k in range(3)]
        all_cols += [Wr[:, k, :] for k in range(3)]
        for cidx in range(6, N_DOF):
            all_cols.append(cols.get(cidx, zc[0:3]))
        Jleg = jnp.stack(all_cols, axis=1)       # (3, 18, C)
        Jc_out[3 * leg:3 * leg + 3] = Jleg
        Jcdqd_out[3 * leg:3 * leg + 3] = Jcdqd
        pfoot_out[3 * leg:3 * leg + 3] = (
            ra[i0] + _mv(Rai, loc, 3)
        )


@functools.partial(jax.jit, static_argnames=("parents", "axes", "gc_body",
                                              "interpret"))
def _dispatch(
    quat, pos, v_body, q, qd, Rtree, rtree, gcloc,
    parents, axes, gc_body, interpret,
):
    B = q.shape[0]
    C = 128
    f32 = jnp.float32
    pad = (-B) % C
    args = (quat, pos, v_body, q, qd)
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
        _kernel, parents=parents, axes=axes, gc_body=gc_body,
    )
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    shared = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    Jc_o, jdq_o, pf_o = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            chunk(4, C), chunk(3, C), chunk(6, C), chunk(12, C),
            chunk(12, C),
            shared(12, 3, 3), shared(12, 3), shared(4, 3),
        ],
        out_specs=[chunk(12, N_DOF, C), chunk(12, C), chunk(12, C)],
        out_shape=[
            jax.ShapeDtypeStruct((nc, 12, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
        ],
        interpret=interpret,
    )(*lanes, Rtree.astype(f32), rtree.astype(f32), gcloc.astype(f32))

    unl = lambda t, inner: jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]
    Jc = unl(Jc_o, (12, N_DOF)).reshape(B, 4, 3, N_DOF)
    return (
        Jc,
        unl(jdq_o, (12,)).reshape(B, 4, 3),
        unl(pf_o, (12,)).reshape(B, 4, 3),
    )


def fused_contact_kinematics(state, mc, interpret: bool = False):
    """Fused replacement for fb.contact_jacobians: returns a
    fb.ContactInfo with (Jc, Jcdqd, p_foot) computed in one kernel.

    state: fb.FBState with arbitrary leading batch dims; mc:
    fb.ModelConstants."""
    from quad_periodic_mpc_tpu.models import floating_base as fb

    lead = state.pos.shape[:-1]
    B = 1
    for d in lead:
        B *= d
    # (R, r) decomposition of the constant tree transforms:
    # X = [[R,0],[-R[r]x,R]]  =>  [r]x = -R^T BL
    Rtree = mc.Xtree[:, 0:3, 0:3]
    BL = mc.Xtree[:, 3:6, 0:3]
    rx = -jnp.swapaxes(Rtree, -1, -2) @ BL
    rtree = jnp.stack(
        [rx[:, 2, 1], rx[:, 0, 2], rx[:, 1, 0]], axis=-1
    )
    Jc, Jcdqd, p_foot = _dispatch(
        state.quat.reshape(B, 4), state.pos.reshape(B, 3),
        state.v_body.reshape(B, 6), state.q.reshape(B, 12),
        state.qd.reshape(B, 12),
        Rtree, rtree, mc.gc_location,
        tuple(mc.parents), tuple(mc.axes), tuple(mc.gc_body),
        bool(interpret),
    )
    return fb.ContactInfo(
        Jc=Jc.reshape(lead + (4, 3, N_DOF)),
        Jcdqd=Jcdqd.reshape(lead + (4, 3)),
        p_foot=p_foot.reshape(lead + (4, 3)),
    )


# ---------------------------------------------------------------------------
# Full model evaluation kernel: CRBA mass matrix (+ rotors), generalized
# gravity + Coriolis, 18x18 inverse, AND the contact kinematics above,
# all in ONE dispatch.  This is the whole per-tick model update
# (WBC_Ctrl::_UpdateModel + the plant cache + the observation) — at b=1
# the XLA spatial-algebra chains cost ~1.5 ms/tick of pure op-dispatch
# (tools/probe_b1_split.py), the composed 500 Hz tick's largest share.
# Mirrors massMatrix / generalizedGravityForce / generalizedCoriolisForce
# (FloatingBaseModel.cpp:834-869, 655-675, 682-716) with the (R, r)
# spatial-transform representation; rotors included exactly.
# ---------------------------------------------------------------------------


def _x66(R, r, C):
    """Materialize X(R, r) = [[R, 0], [-R [r]x, R]] as (6, 6, C)."""
    f32 = jnp.float32
    z = jnp.zeros((C,), f32)
    rx = jnp.stack(
        [
            jnp.stack([z, -r[2], r[1]], axis=0),
            jnp.stack([r[2], z, -r[0]], axis=0),
            jnp.stack([-r[1], r[0], z], axis=0),
        ],
        axis=0,
    )
    mRrx = -_mm(R, rx, 3)
    z33 = jnp.zeros((3, 3, C), f32)
    top = jnp.concatenate([R, z33], axis=1)
    bot = jnp.concatenate([mRrx, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _xT_force(R, r, f6):
    """X(R, r)^T @ [n; f] = [R^T n + r x (R^T f); R^T f]."""
    Rt = _t(R, 3, 3)
    n = f6[0:3]
    ff = f6[3:6]
    Rtf = _mv(Rt, ff, 3)
    return jnp.concatenate(
        [_mv(Rt, n, 3) + _cross(r, Rtf), Rtf], axis=0
    )


def _force_cross(a, b):
    """crf(a) b for spatial vectors: [w x bn + v x bf; w x bf]."""
    w, v = a[0:3], a[3:6]
    bn, bf = b[0:3], b[3:6]
    return jnp.concatenate(
        [_cross(w, bn) + _cross(v, bf), _cross(w, bf)], axis=0
    )


def _model_kernel(
    quat_ref, pos_ref, vb_ref, q_ref, qd_ref,
    Rtree_ref,    # (12, 3, 3)
    rtree_ref,    # (12, 3)
    Rrot_ref,     # (12, 3, 3) rotor tree
    rrot_ref,     # (12, 3)
    Ilink_ref,    # (12, 6, 6)
    Irot_ref,     # (12, 6, 6)
    Ibase_ref,    # (6, 6)
    gcloc_ref,    # (4, 3)
    A_out,        # (18, 18, C)
    Ainv_out,     # (18, 18, C)
    G_out,        # (18, C)
    Cq_out,       # (18, C)
    Jc_out,       # (12, 18, C)
    Jcdqd_out,    # (12, C)
    pfoot_out,    # (12, C)
    *,
    parents: tuple,
    axes: tuple,
    gc_body: tuple,
    gear: tuple,
    gravity: tuple,
):
    from quad_periodic_mpc_tpu.ops.pallas.wbc_kernel import _spd_inv_rec

    C = quat_ref.shape[-1]
    f32 = jnp.float32
    q = q_ref[:]
    qd = qd_ref[:]

    R_bw = _quat_to_rotmat(quat_ref[:])
    R0 = _t(R_bw, 3, 3)
    r0 = pos_ref[:]
    v0 = vb_ref[:]

    # ---- forward kinematics with rotors ----
    Rup = [R0]
    rup = [r0]
    Rupr = [None]
    rupr = [None]
    Ra = [R0]
    ra = [r0]
    v = [v0]
    vrot = [None]
    cbias = [jnp.zeros((6, C), f32)]
    crot = [None]
    aidx = [None]
    for j in range(12):
        parent = parents[j]
        a_idx = 0 if axes[j] == "x" else 1
        aidx.append(a_idx)
        Rj = _joint_R(axes[j], q[j])
        Rt = jnp.broadcast_to(Rtree_ref[j][:, :, None], (3, 3, C))
        rt = jnp.broadcast_to(rtree_ref[j][:, None], (3, C))
        R_up = _mm(Rj, Rt, 3)
        Rup.append(R_up)
        rup.append(rt)
        gr = float(gear[j])
        Rjr = _joint_R(axes[j], q[j] * gr) if gr != 1.0 else Rj
        Rtr = jnp.broadcast_to(Rrot_ref[j][:, :, None], (3, 3, C))
        rtr = jnp.broadcast_to(rrot_ref[j][:, None], (3, C))
        Rupr.append(_mm(Rjr, Rtr, 3))
        rupr.append(rtr)
        Ra_p = Ra[parent]
        Ra.append(_mm(R_up, Ra_p, 3))
        ra.append(ra[parent] + _mv(_t(Ra_p, 3, 3), rt, 3))

        zeroC = jnp.zeros((C,), f32)
        comps = [zeroC, zeroC, zeroC]
        comps[a_idx] = qd[j]
        aq = jnp.stack(comps, axis=0)
        aq6 = jnp.concatenate([aq, jnp.zeros((3, C), f32)], axis=0)
        vj = _xapply(R_up, rt, v[parent]) + aq6
        v.append(vj)
        compsr = [zeroC, zeroC, zeroC]
        compsr[a_idx] = qd[j] * gr
        aqr = jnp.stack(compsr, axis=0)
        aqr6 = jnp.concatenate([aqr, jnp.zeros((3, C), f32)], axis=0)
        vr = _xapply(Rupr[j + 1], rtr, v[parent]) + aqr6
        vrot.append(vr)
        cbias.append(
            jnp.concatenate(
                [_cross(vj[0:3], aq), _cross(vj[3:6], aq)], axis=0
            )
        )
        crot.append(
            jnp.concatenate(
                [_cross(vr[0:3], aqr), _cross(vr[3:6], aqr)], axis=0
            )
        )

    # ---- contact kinematics (avp from link chain) ----
    avp = [jnp.zeros((6, C), f32)]
    avprot = [None]
    for j in range(12):
        body = j + 1
        avp.append(
            _xapply(Rup[body], rup[body], avp[parents[j]]) + cbias[body]
        )
        avprot.append(
            _xapply(Rupr[body], rupr[body], avp[parents[j]]) + crot[body]
        )

    for leg in range(4):
        i0 = gc_body[leg]
        Rai = _t(Ra[i0], 3, 3)
        loc = jnp.broadcast_to(gcloc_ref[leg][:, None], (3, C))
        ac = _xapply(Rai, loc, avp[i0])
        vc = _xapply(Rai, loc, v[i0])
        Jcdqd = ac[3:6] + _cross(vc[0:3], vc[3:6])
        z = jnp.zeros((C,), f32)
        locx = jnp.stack(
            [
                jnp.stack([z, -loc[2], loc[1]], axis=0),
                jnp.stack([loc[2], z, -loc[0]], axis=0),
                jnp.stack([-loc[1], loc[0], z], axis=0),
            ],
            axis=0,
        )
        Wl = -_mm(Rai, locx, 3)
        Wr = Rai
        cols = {}
        i = i0
        while i > 0:
            j = i - 1
            cols[6 + j] = Wl[:, aidx[i], :]
            R_i = Rup[i]
            r_i = rup[i]
            rx = jnp.stack(
                [
                    jnp.stack([z, -r_i[2], r_i[1]], axis=0),
                    jnp.stack([r_i[2], z, -r_i[0]], axis=0),
                    jnp.stack([-r_i[1], r_i[0], z], axis=0),
                ],
                axis=0,
            )
            WrR = _mm(Wr, R_i, 3)
            Wl = _mm(Wl, R_i, 3) - _mm(WrR, rx, 3)
            Wr = WrR
            i = parents[j]
        zc3 = jnp.zeros((3, C), f32)
        all_cols = [Wl[:, k, :] for k in range(3)]
        all_cols += [Wr[:, k, :] for k in range(3)]
        for cidx in range(6, N_DOF):
            all_cols.append(cols.get(cidx, zc3))
        Jc_out[3 * leg:3 * leg + 3] = jnp.stack(all_cols, axis=1)
        Jcdqd_out[3 * leg:3 * leg + 3] = Jcdqd
        pfoot_out[3 * leg:3 * leg + 3] = ra[i0] + _mv(Rai, loc, 3)

    # ---- composite inertias (CRBA downward sweep) ----
    IC = [jnp.broadcast_to(Ibase_ref[:][:, :, None], (6, 6, C))]
    for j in range(12):
        IC.append(jnp.broadcast_to(Ilink_ref[j][:, :, None], (6, 6, C)))
    Irot_b = [
        jnp.broadcast_to(Irot_ref[j][:, :, None], (6, 6, C))
        for j in range(12)
    ]
    X66 = [None] * 13
    X66r = [None] * 13
    for j in range(12):
        body = j + 1
        X66[body] = _x66(Rup[body], rup[body], C)
        X66r[body] = _x66(Rupr[body], rupr[body], C)
    for j in range(11, -1, -1):
        body = j + 1
        parent = parents[j]
        X = X66[body]
        Xr = X66r[body]
        IC[parent] = IC[parent] + _mm(
            _t(X, 6, 6), _mm(IC[body], X, 6), 6
        ) + _mm(_t(Xr, 6, 6), _mm(Irot_b[j], Xr, 6), 6)

    # ---- H assembly ----
    # entries: dict (row, col) -> (C,); base block + base-joint vectors
    Hent = {}
    for rr in range(6):
        for cc in range(6):
            Hent[(rr, cc)] = IC[0][rr, cc]
    for j in range(12):
        body = j + 1
        a_idx = 0 if axes[j] == "x" else 1
        gr = float(gear[j])
        f = IC[body][:, a_idx, :]                   # IC S
        frot = Irot_ref[j][:, a_idx] * gr           # (6,) const
        frot_b = jnp.broadcast_to(frot[:, None], (6, C))
        Hjj = f[a_idx] + frot[a_idx] * gr
        Hent[(6 + j, 6 + j)] = Hjj
        f = _xT_force(Rup[body], rup[body], f) + _xT_force(
            Rupr[body], rupr[body], frot_b
        )
        i = parents[j]
        while i > 0:
            ji = i - 1
            ai = 0 if axes[ji] == "x" else 1
            Hij = f[ai]
            Hent[(6 + ji, 6 + j)] = Hij
            Hent[(6 + j, 6 + ji)] = Hij
            f = _xT_force(Rup[i], rup[i], f)
            i = parents[ji]
        for rr in range(6):
            Hent[(rr, 6 + j)] = f[rr]
            Hent[(6 + j, rr)] = f[rr]
    zC = jnp.zeros((C,), f32)
    H = jnp.stack(
        [
            jnp.stack(
                [Hent.get((rr, cc), zC) for cc in range(N_DOF)], axis=0
            )
            for rr in range(N_DOF)
        ],
        axis=0,
    )
    A_out[:] = H
    Ainv_out[:] = _spd_inv_rec(H, N_DOF)

    # ---- generalized gravity (reuses IC) ----
    aG = jnp.concatenate(
        [jnp.zeros((3, C), f32)]
        + [jnp.full((1, C), float(gv), f32) for gv in gravity],
        axis=0,
    )
    ag = [_xapply(Rup[0], rup[0], aG)]
    Gent = {}
    g0 = -_mv(IC[0], ag[0], 6)
    for rr in range(6):
        Gent[rr] = g0[rr]
    for j in range(12):
        body = j + 1
        parent = parents[j]
        a_idx = 0 if axes[j] == "x" else 1
        gr = float(gear[j])
        ag_j = _xapply(Rup[body], rup[body], ag[parent])
        agr_j = _xapply(Rupr[body], rupr[body], ag[parent])
        ag.append(ag_j)
        ICag = _mv(IC[body], ag_j, 6)
        Irag = _mv(Irot_b[j], agr_j, 6)
        Gent[6 + j] = -(ICag[a_idx] + gr * Irag[a_idx])
    G_out[:] = jnp.stack([Gent[rr] for rr in range(N_DOF)], axis=0)

    # ---- generalized Coriolis ----
    Ib = jnp.broadcast_to(Ibase_ref[:][:, :, None], (6, 6, C))
    h0 = _mv(Ib, v[0], 6)
    fvp = [None] * 13
    fvp[0] = _mv(Ib, avp[0], 6) + _force_cross(v[0], h0)
    fvprot = [None] * 13
    for j in range(12):
        body = j + 1
        Il = jnp.broadcast_to(Ilink_ref[j][:, :, None], (6, 6, C))
        hi = _mv(Il, v[body], 6)
        fvp[body] = _mv(Il, avp[body], 6) + _force_cross(v[body], hi)
        hr = _mv(Irot_b[j], vrot[body], 6)
        fvprot[body] = _mv(Irot_b[j], avprot[body], 6) + _force_cross(
            vrot[body], hr
        )
    Cent = {}
    for j in range(11, -1, -1):
        body = j + 1
        parent = parents[j]
        a_idx = 0 if axes[j] == "x" else 1
        gr = float(gear[j])
        Cent[6 + j] = fvp[body][a_idx] + gr * fvprot[body][a_idx]
        fvp[parent] = fvp[parent] + _xT_force(
            Rup[body], rup[body], fvp[body]
        ) + _xT_force(Rupr[body], rupr[body], fvprot[body])
    for rr in range(6):
        Cent[rr] = fvp[0][rr]
    Cq_out[:] = jnp.stack([Cent[rr] for rr in range(N_DOF)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "parents", "axes", "gc_body", "gear", "gravity", "interpret",
))
def _model_dispatch(
    quat, pos, v_body, q, qd,
    Rtree, rtree, Rrot, rrot, Ilink, Irot, Ibase, gcloc,
    parents, axes, gc_body, gear, gravity, interpret,
):
    B = q.shape[0]
    C = 128
    f32 = jnp.float32
    pad = (-B) % C
    args = (quat, pos, v_body, q, qd)
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
        _model_kernel, parents=parents, axes=axes, gc_body=gc_body,
        gear=gear, gravity=gravity,
    )
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    shared = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            chunk(4, C), chunk(3, C), chunk(6, C), chunk(12, C),
            chunk(12, C),
            shared(12, 3, 3), shared(12, 3), shared(12, 3, 3),
            shared(12, 3), shared(12, 6, 6), shared(12, 6, 6),
            shared(6, 6), shared(4, 3),
        ],
        out_specs=[
            chunk(N_DOF, N_DOF, C), chunk(N_DOF, N_DOF, C),
            chunk(N_DOF, C), chunk(N_DOF, C),
            chunk(12, N_DOF, C), chunk(12, C), chunk(12, C),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, N_DOF, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, N_DOF, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, 12, N_DOF, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
            jax.ShapeDtypeStruct((nc, 12, C), f32),
        ],
        interpret=interpret,
    )(*lanes, Rtree.astype(f32), rtree.astype(f32), Rrot.astype(f32),
      rrot.astype(f32), Ilink.astype(f32), Irot.astype(f32),
      Ibase.astype(f32), gcloc.astype(f32))

    unl = lambda t, inner: jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]
    return tuple(
        unl(o, s) for o, s in zip(outs, [
            (N_DOF, N_DOF), (N_DOF, N_DOF), (N_DOF,), (N_DOF,),
            (12, N_DOF), (12,), (12,),
        ])
    )


def _xtree_decomp(X):
    """(12, 6, 6) motion transforms -> (R (12,3,3), r (12,3))."""
    R = X[:, 0:3, 0:3]
    BL = X[:, 3:6, 0:3]
    rx = -jnp.swapaxes(R, -1, -2) @ BL
    r = jnp.stack([rx[:, 2, 1], rx[:, 0, 2], rx[:, 1, 0]], axis=-1)
    return R, r


def fused_model_eval(state, mc, interpret: bool = False):
    """One-dispatch model evaluation: returns
    (A, Ainv, grav, cori, ContactInfo) — everything the composed tick
    needs (WBC dynamics + plant substep cache + observation
    kinematics), replacing ~1.5 ms/tick of b=1 XLA op dispatch."""
    from quad_periodic_mpc_tpu.models import floating_base as fb

    lead = state.pos.shape[:-1]
    B = 1
    for d in lead:
        B *= d
    Rtree, rtree = _xtree_decomp(mc.Xtree)
    Rrot, rrot = _xtree_decomp(mc.Xrot)
    A, Ainv, G, Cq, Jc, Jcdqd, p_foot = _model_dispatch(
        state.quat.reshape(B, 4), state.pos.reshape(B, 3),
        state.v_body.reshape(B, 6), state.q.reshape(B, 12),
        state.qd.reshape(B, 12),
        Rtree, rtree, Rrot, rrot, mc.I_link, mc.I_rotor, mc.I_base,
        mc.gc_location,
        tuple(mc.parents), tuple(mc.axes), tuple(mc.gc_body),
        tuple(mc.gear_static), tuple(mc.gravity_static),
        bool(interpret),
    )
    info = fb.ContactInfo(
        Jc=Jc.reshape(lead + (4, 3, N_DOF)),
        Jcdqd=Jcdqd.reshape(lead + (4, 3)),
        p_foot=p_foot.reshape(lead + (4, 3)),
    )
    return (
        A.reshape(lead + (N_DOF, N_DOF)),
        Ainv.reshape(lead + (N_DOF, N_DOF)),
        G.reshape(lead + (N_DOF,)),
        Cq.reshape(lead + (N_DOF,)),
        info,
    )
