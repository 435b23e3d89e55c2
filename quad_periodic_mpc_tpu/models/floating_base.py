"""Floating-base articulated dynamics of the A1 quadruped, batched.

Rebuilds FloatingBaseModel (src/common/Dynamics/FloatingBaseModel.cpp) +
the tree built by Quadruped::buildModel (Quadruped.cpp:21-121) with the
A1 parameters of MiniCheetah.h:27-110, as pure functions over a fixed
13-body topology (base + 4 x [abad, hip, knee]), fully unrolled at trace
time — every quantity carries arbitrary leading batch dims.

Conventions (matching the reference exactly):
- generalized velocity qdot = [omega_body(3); v_body(3); qd(12)], 18 DoF;
- spatial motion vectors [omega; v] in link coordinates;
- joint rotations are coordinate rotations (orientation_tools.h:66-89);
- hip/knee joint frames carry the Rz(pi) flip (Quadruped.cpp:66-68);
- right legs (0, 2) use Y-mirrored inertias (flipAlongAxis, Quadruped.cpp:50-55);
- rotors included with gear ratio (= 1 on A1) exactly as in
  forwardKinematics (FloatingBaseModel.cpp:509-538).

Implemented quantities: forward kinematics, CRBA mass matrix
(massMatrix, :834-869), generalized gravity (:655-675), generalized
Coriolis (:682-716), per-foot contact Jacobians + JcDot qd (:586-625),
and foot world positions.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.models import spatial as sp
from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat

N_BODIES = 13     # index 0 = base, then 4 legs x (abad, hip, knee)
N_DOF = 18


@dataclasses.dataclass(frozen=True)
class A1ModelParams:
    """Host-side constant model description (MiniCheetah.h A1 branch)."""

    body_mass: float = 6.0
    body_com: tuple = (0.0, 0.0041, -0.0005)
    body_inertia: tuple = (15853e-6, 37799e-6, 45654e-6)  # diagonal
    abad_mass: float = 0.696
    abad_com: tuple = (-0.003311, 0.000635, 0.000031)     # LEFT side
    abad_inertia: tuple = (
        (469e-6, -9.4e-6, -0.34e-6),
        (-9.4e-6, 807e-6, -0.47e-6),
        (-0.34e-6, -0.47e-6, 553e-6),
    )
    hip_mass: float = 1.013
    hip_com: tuple = (-0.003237, -0.022327, -0.027326)
    hip_inertia: tuple = (
        (5529e-6, 4.825e-6, 343e-6),
        (4.825e-6, 5139e-6, 22e-6),
        (343e-6, 22e-6, 1367e-6),
    )
    knee_mass: float = 0.166
    knee_com: tuple = (0.006435, 0.0, -0.107388)
    # kneeRotationalInertiaRotated, rotated by RY(pi/2) (MiniCheetah.h:75-78)
    knee_inertia_rotated: tuple = (
        (2997e-6, 0.0, -141e-6),
        (0.0, 3014e-6, 0.0),
        (-141e-6, 0.0, 32e-6),
    )
    rotor_mass: float = 0.605
    rotor_inertia_z: tuple = (33e-6, 33e-6, 63e-6)
    abad_location: tuple = (0.1805, 0.047, 0.0)
    hip_location: tuple = (0.0, 0.0838, 0.0)
    knee_location: tuple = (0.0, 0.0, -0.2)
    knee_link_length: float = 0.2
    knee_link_y_offset: float = 0.0
    gear_abad: float = 1.0
    gear_hip: float = 1.0
    gear_knee: float = 1.0
    gravity: tuple = (0.0, 0.0, -9.81)


class ModelConstants(NamedTuple):
    """Device-ready constants: per-joint (12) arrays, base inertia, feet."""

    parents: tuple                 # python ints, body index of parent
    axes: tuple                    # 'x' or 'y' per joint
    Xtree: jnp.ndarray             # (12, 6, 6)
    Xrot: jnp.ndarray              # (12, 6, 6)
    I_link: jnp.ndarray            # (12, 6, 6)
    I_rotor: jnp.ndarray           # (12, 6, 6)
    gear: jnp.ndarray              # (12,)
    I_base: jnp.ndarray            # (6, 6)
    gc_body: tuple                 # foot contact parent body per leg (4)
    gc_location: jnp.ndarray       # (4, 3)
    gravity: jnp.ndarray           # (3,)
    # python-float mirrors for STATIC kernel parameters (pallas fused
    # model kernel takes them as compile-time constants)
    gear_static: tuple = ()
    gravity_static: tuple = ()


def _leg_sign_vec(v, leg):
    """withLegSigns (Quadruped.cpp:222-236)."""
    x, y, z = v
    sx = 1.0 if leg in (0, 1) else -1.0
    sy = -1.0 if leg in (0, 2) else 1.0
    return np.array([sx * x, sy * y, z])


@functools.lru_cache(maxsize=4)
def build_a1_constants(dtype_str: str = "float32") -> ModelConstants:
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype_str)
    p = A1ModelParams()

    RY90 = sp.rot_y(np.pi / 2)
    RX90 = sp.rot_x(np.pi / 2)
    rotor_z = np.diag(p.rotor_inertia_z)
    rotor_x = RY90 @ rotor_z @ RY90.T
    rotor_y = RX90 @ rotor_z @ RX90.T
    knee_I = RY90 @ np.asarray(p.knee_inertia_rotated) @ RY90.T

    def sxform_np(R, r):
        X = np.zeros((6, 6))
        X[0:3, 0:3] = R
        X[3:6, 3:6] = R
        rx = np.array([
            [0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0],
        ])
        X[3:6, 0:3] = -R @ rx
        return X

    def spatial_inertia_np(m, com, I_rot):
        com = np.asarray(com)
        cx = np.array([
            [0, -com[2], com[1]], [com[2], 0, -com[0]], [-com[1], com[0], 0],
        ])
        out = np.zeros((6, 6))
        out[0:3, 0:3] = I_rot + m * cx @ cx.T
        out[0:3, 3:6] = m * cx
        out[3:6, 0:3] = m * cx.T
        out[3:6, 3:6] = m * np.eye(3)
        return out

    def flip_y(m, com, I_rot):
        P = np.diag([1.0, -1.0, 1.0])
        return m, P @ np.asarray(com), P @ np.asarray(I_rot) @ P

    I3 = np.eye(3)
    RZPI = sp.rot_z(np.pi)

    parents = []
    axes = []
    Xtree, Xrot, I_link, I_rotor, gear = [], [], [], [], []
    gc_body, gc_loc = [], []

    for leg in range(4):
        right = leg in (0, 2)     # sideSign -1 legs (Quadruped.cpp:34,113)
        base_idx = 0
        abad_idx = 1 + 3 * leg
        hip_idx = 2 + 3 * leg
        knee_idx = 3 + 3 * leg

        # abad
        parents.append(base_idx)
        axes.append("x")
        Xtree.append(sxform_np(I3, _leg_sign_vec(p.abad_location, leg)))
        Xrot.append(sxform_np(I3, _leg_sign_vec((0, 0, 0), leg)))
        a_m, a_c, a_I = p.abad_mass, p.abad_com, np.asarray(p.abad_inertia)
        r_m, r_c, r_I = p.rotor_mass, (0, 0, 0), rotor_x
        if right:
            a_m, a_c, a_I = flip_y(a_m, a_c, a_I)
            r_m, r_c, r_I = flip_y(r_m, r_c, r_I)
        I_link.append(spatial_inertia_np(a_m, a_c, a_I))
        I_rotor.append(spatial_inertia_np(r_m, r_c, r_I))
        gear.append(p.gear_abad)

        # hip (frame flipped by Rz(pi), Quadruped.cpp:66-68)
        parents.append(abad_idx)
        axes.append("y")
        Xtree.append(sxform_np(RZPI, _leg_sign_vec(p.hip_location, leg)))
        Xrot.append(sxform_np(RZPI, (0, 0, 0)))
        h_m, h_c, h_I = p.hip_mass, p.hip_com, np.asarray(p.hip_inertia)
        r_m, r_c, r_I = p.rotor_mass, (0, 0, 0), rotor_y
        if right:
            h_m, h_c, h_I = flip_y(h_m, h_c, h_I)
            r_m, r_c, r_I = flip_y(r_m, r_c, r_I)
        I_link.append(spatial_inertia_np(h_m, h_c, h_I))
        I_rotor.append(spatial_inertia_np(r_m, r_c, r_I))
        gear.append(p.gear_hip)

        # knee
        parents.append(hip_idx)
        axes.append("y")
        Xtree.append(sxform_np(I3, np.asarray(p.knee_location)))
        Xrot.append(sxform_np(I3, (0, 0, 0)))
        k_m, k_c, k_I = p.knee_mass, p.knee_com, knee_I
        r_m, r_c, r_I = p.rotor_mass, (0, 0, 0), rotor_y
        if right:
            k_m, k_c, k_I = flip_y(k_m, k_c, k_I)
            r_m, r_c, r_I = flip_y(r_m, r_c, r_I)
        I_link.append(spatial_inertia_np(k_m, k_c, k_I))
        I_rotor.append(spatial_inertia_np(r_m, r_c, r_I))
        gear.append(p.gear_knee)

        # foot contact point on the knee body (Quadruped.cpp:92-108)
        gc_body.append(knee_idx)
        y_off = p.knee_link_y_offset if right else -p.knee_link_y_offset
        gc_loc.append([0.0, y_off, -p.knee_link_length])

    I_base = spatial_inertia_np(
        p.body_mass, p.body_com, np.diag(p.body_inertia)
    )

    return ModelConstants(
        parents=tuple(parents),
        axes=tuple(axes),
        Xtree=jnp.asarray(np.stack(Xtree), dtype),
        Xrot=jnp.asarray(np.stack(Xrot), dtype),
        I_link=jnp.asarray(np.stack(I_link), dtype),
        I_rotor=jnp.asarray(np.stack(I_rotor), dtype),
        gear=jnp.asarray(gear, dtype),
        I_base=jnp.asarray(I_base, dtype),
        gc_body=tuple(gc_body),
        gc_location=jnp.asarray(gc_loc, dtype),
        gravity=jnp.asarray(p.gravity, dtype),
        gear_static=tuple(float(g) for g in gear),
        gravity_static=tuple(float(g) for g in p.gravity),
    )


class FBState(NamedTuple):
    """FloatingBaseModel state (FloatingBaseModel.h FBModelState)."""

    quat: jnp.ndarray    # (..., 4) body orientation, wxyz
    pos: jnp.ndarray     # (..., 3) body position, world
    v_body: jnp.ndarray  # (..., 6) spatial velocity [omega; v], body frame
    q: jnp.ndarray       # (..., 12) joint angles
    qd: jnp.ndarray      # (..., 12)


class Kinematics(NamedTuple):
    Xup: list            # 13 x (..., 6, 6) parent-to-child motion transforms
    Xuprot: list
    Xa: list             # 13 x (..., 6, 6) world-to-link
    v: list              # 13 x (..., 6) link spatial velocities
    vrot: list
    c: list              # velocity-product terms
    crot: list
    S: list              # 13 x (6,) joint subspaces (None for base)
    Srot: list


def forward_kinematics(state: FBState, mc: ModelConstants) -> Kinematics:
    """forwardKinematics (FloatingBaseModel.cpp:509-553).

    Note: the reference builds Xup[base] from quaternionToRotationMatrix,
    which in MIT convention is the world->body coordinate transform: our
    quat_to_rotmat gives body->world R, so the base rotation here is R^T.
    """
    dtype = state.pos.dtype
    R_wb = jnp.swapaxes(quat_to_rotmat(state.quat), -1, -2)  # world->body
    Xup = [sp.sxform(R_wb, state.pos)]
    Xuprot = [None]
    v = [state.v_body]
    vrot = [None]
    c = [jnp.zeros_like(state.v_body)]
    crot = [None]
    S_list = [None]
    Srot_list = [None]

    for j in range(12):
        body = j + 1
        parent = mc.parents[j]
        qj = state.q[..., j]
        qdj = state.qd[..., j]
        axis = mc.axes[j]
        Rj = sp.joint_rotation(axis, qj)
        XJ = sp.sxform(Rj, jnp.zeros(qj.shape + (3,), dtype))
        Xup_j = XJ @ mc.Xtree[j]
        S = sp.joint_motion_subspace(axis, dtype)
        vJ = S * qdj[..., None]
        v_j = jnp.einsum("...ij,...j->...i", Xup_j, v[parent]) + vJ

        gr = mc.gear[j]
        Rjr = sp.joint_rotation(axis, qj * gr)
        XJr = sp.sxform(Rjr, jnp.zeros(qj.shape + (3,), dtype))
        Xuprot_j = XJr @ mc.Xrot[j]
        Srot = S * gr
        vJr = Srot * qdj[..., None]
        vrot_j = jnp.einsum("...ij,...j->...i", Xuprot_j, v[parent]) + vJr

        Xup.append(Xup_j)
        Xuprot.append(Xuprot_j)
        v.append(v_j)
        vrot.append(vrot_j)
        c.append(sp.motion_cross(v_j, vJ))
        crot.append(sp.motion_cross(vrot_j, vJr))
        S_list.append(S)
        Srot_list.append(Srot)

    Xa = [Xup[0]]
    for j in range(12):
        body = j + 1
        parent = mc.parents[j]
        Xa.append(Xup[body] @ Xa[parent])

    return Kinematics(
        Xup=Xup, Xuprot=Xuprot, Xa=Xa, v=v, vrot=vrot, c=c, crot=crot,
        S=S_list, Srot=Srot_list,
    )


def mass_matrix(state: FBState, mc: ModelConstants) -> jnp.ndarray:
    """CRBA with rotors (massMatrix, FloatingBaseModel.cpp:834-869).

    Returns (..., 18, 18).
    """
    kin = forward_kinematics(state, mc)
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]

    # composite inertias, tips to base (compositeInertias, :810-828)
    IC = [None] * N_BODIES
    IC[0] = jnp.broadcast_to(mc.I_base, batch + (6, 6))
    for j in range(12):
        IC[j + 1] = jnp.broadcast_to(mc.I_link[j], batch + (6, 6))
    for j in range(11, -1, -1):
        body = j + 1
        parent = mc.parents[j]
        XT = jnp.swapaxes(kin.Xup[body], -1, -2)
        XrT = jnp.swapaxes(kin.Xuprot[body], -1, -2)
        IC[parent] = IC[parent] + XT @ IC[body] @ kin.Xup[body] + (
            XrT @ mc.I_rotor[j] @ kin.Xuprot[body]
        )

    H = jnp.zeros(batch + (N_DOF, N_DOF), dtype)
    H = H.at[..., 0:6, 0:6].set(IC[0])

    for j in range(12):
        body = j + 1
        S = kin.S[body]
        Srot = kin.Srot[body]
        f = jnp.einsum("...ij,j->...i", IC[body], S)
        frot = jnp.einsum("ij,j->i", mc.I_rotor[j], Srot)
        frot = jnp.broadcast_to(frot, batch + (6,))
        Hjj = jnp.einsum("j,...j->...", S, f) + jnp.einsum(
            "j,...j->...", Srot, frot
        )
        H = H.at[..., 6 + j, 6 + j].set(Hjj)

        f = jnp.einsum("...ji,...j->...i", kin.Xup[body], f) + jnp.einsum(
            "...ji,...j->...i", kin.Xuprot[body], frot
        )
        i = mc.parents[j]
        while i > 0:
            ji = i - 1
            Hij = jnp.einsum("j,...j->...", kin.S[i], f)
            H = H.at[..., 6 + ji, 6 + j].set(Hij)
            H = H.at[..., 6 + j, 6 + ji].set(Hij)
            f = jnp.einsum("...ji,...j->...i", kin.Xup[i], f)
            i = mc.parents[ji]
        H = H.at[..., 0:6, 6 + j].set(f)
        H = H.at[..., 6 + j, 0:6].set(f)
    return H


def generalized_gravity(state: FBState, mc: ModelConstants) -> jnp.ndarray:
    """generalizedGravityForce (FloatingBaseModel.cpp:655-675): (..., 18)."""
    kin = forward_kinematics(state, mc)
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]

    IC = [None] * N_BODIES
    IC[0] = jnp.broadcast_to(mc.I_base, batch + (6, 6))
    for j in range(12):
        IC[j + 1] = jnp.broadcast_to(mc.I_link[j], batch + (6, 6))
    for j in range(11, -1, -1):
        body = j + 1
        parent = mc.parents[j]
        XT = jnp.swapaxes(kin.Xup[body], -1, -2)
        XrT = jnp.swapaxes(kin.Xuprot[body], -1, -2)
        IC[parent] = IC[parent] + XT @ IC[body] @ kin.Xup[body] + (
            XrT @ mc.I_rotor[j] @ kin.Xuprot[body]
        )

    aG = jnp.concatenate(
        [jnp.zeros(3, dtype), mc.gravity]
    )
    ag = [jnp.einsum("...ij,j->...i", kin.Xup[0], aG)]
    G = jnp.zeros(batch + (N_DOF,), dtype)
    G = G.at[..., 0:6].set(
        -jnp.einsum("...ij,...j->...i", IC[0], ag[0])
    )
    for j in range(12):
        body = j + 1
        parent = mc.parents[j]
        ag_j = jnp.einsum("...ij,...j->...i", kin.Xup[body], ag[parent])
        agrot_j = jnp.einsum("...ij,...j->...i", kin.Xuprot[body], ag[parent])
        ag.append(ag_j)
        Gj = -jnp.einsum(
            "j,...j->...", kin.S[body],
            jnp.einsum("...ij,...j->...i", IC[body], ag_j),
        ) - jnp.einsum(
            "j,...j->...", kin.Srot[body],
            jnp.einsum("ij,...j->...i", mc.I_rotor[j], agrot_j),
        )
        G = G.at[..., 6 + j].set(Gj)
    return G


def generalized_coriolis(state: FBState, mc: ModelConstants) -> jnp.ndarray:
    """generalizedCoriolisForce (FloatingBaseModel.cpp:682-716): (..., 18)."""
    kin = forward_kinematics(state, mc)
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]

    # bias accelerations (biasAccelerations, :632-648)
    avp = [jnp.zeros(batch + (6,), dtype)]
    avprot = [None]
    for j in range(12):
        body = j + 1
        parent = mc.parents[j]
        avp.append(
            jnp.einsum("...ij,...j->...i", kin.Xup[body], avp[parent])
            + kin.c[body]
        )
        avprot.append(
            jnp.einsum("...ij,...j->...i", kin.Xuprot[body], avp[parent])
            + kin.crot[body]
        )

    fvp = [None] * N_BODIES
    fvprot = [None] * N_BODIES
    h0 = jnp.einsum("ij,...j->...i", mc.I_base, kin.v[0])
    fvp[0] = jnp.einsum("ij,...j->...i", mc.I_base, avp[0]) + sp.force_cross(
        kin.v[0], h0
    )
    for j in range(12):
        body = j + 1
        hi = jnp.einsum("ij,...j->...i", mc.I_link[j], kin.v[body])
        fvp[body] = jnp.einsum(
            "ij,...j->...i", mc.I_link[j], avp[body]
        ) + sp.force_cross(kin.v[body], hi)
        hr = jnp.einsum("ij,...j->...i", mc.I_rotor[j], kin.vrot[body])
        fvprot[body] = jnp.einsum(
            "ij,...j->...i", mc.I_rotor[j], avprot[body]
        ) + sp.force_cross(kin.vrot[body], hr)

    Cqd = jnp.zeros(batch + (N_DOF,), dtype)
    for j in range(11, -1, -1):
        body = j + 1
        parent = mc.parents[j]
        Cj = jnp.einsum("j,...j->...", kin.S[body], fvp[body]) + jnp.einsum(
            "j,...j->...", kin.Srot[body], fvprot[body]
        )
        Cqd = Cqd.at[..., 6 + j].set(Cj)
        fvp[parent] = fvp[parent] + jnp.einsum(
            "...ji,...j->...i", kin.Xup[body], fvp[body]
        ) + jnp.einsum("...ji,...j->...i", kin.Xuprot[body], fvprot[body])
    Cqd = Cqd.at[..., 0:6].set(fvp[0])
    return Cqd


class ContactInfo(NamedTuple):
    Jc: jnp.ndarray        # (..., 4, 3, 18) world-frame foot Jacobians
    Jcdqd: jnp.ndarray     # (..., 4, 3)
    p_foot: jnp.ndarray    # (..., 4, 3) world foot positions


def contact_jacobians(state: FBState, mc: ModelConstants) -> ContactInfo:
    """contactJacobians (FloatingBaseModel.cpp:586-625) for the 4 feet."""
    kin = forward_kinematics(state, mc)
    dtype = state.pos.dtype
    batch = state.pos.shape[:-1]

    # bias accelerations
    avp = [jnp.zeros(batch + (6,), dtype)]
    for j in range(12):
        body = j + 1
        parent = mc.parents[j]
        avp.append(
            jnp.einsum("...ij,...j->...i", kin.Xup[body], avp[parent])
            + kin.c[body]
        )

    Jc_all, Jcdqd_all, pf_all = [], [], []
    for leg in range(4):
        i = mc.gc_body[leg]
        Rai = jnp.swapaxes(kin.Xa[i][..., 0:3, 0:3], -1, -2)
        loc = jnp.broadcast_to(mc.gc_location[leg], batch + (3,))
        Xc = sp.sxform(Rai, loc)
        ac = jnp.einsum("...ij,...j->...i", Xc, avp[i])
        vc = jnp.einsum("...ij,...j->...i", Xc, kin.v[i])
        Jcdqd = ac[..., 3:6] + jnp.cross(vc[..., 0:3], vc[..., 3:6])

        Xout = Xc[..., 3:6, :]
        Jc = jnp.zeros(batch + (3, N_DOF), dtype)
        while i > 0:
            j = i - 1
            col = jnp.einsum("...ij,j->...i", Xout, kin.S[i])
            Jc = Jc.at[..., :, 6 + j].set(col)
            Xout = Xout @ kin.Xup[i]
            i = mc.parents[j]
        Jc = Jc.at[..., :, 0:6].set(Xout)

        # world foot position: Xa[i] maps world->link; invert for position
        Ra = kin.Xa[mc.gc_body[leg]][..., 0:3, 0:3]
        # translation r of Xa: bottom-left = -R [r]x  =>  [r]x = -R^T BL
        BL = kin.Xa[mc.gc_body[leg]][..., 3:6, 0:3]
        rx = -jnp.swapaxes(Ra, -1, -2) @ BL
        r = jnp.stack(
            [rx[..., 2, 1], rx[..., 0, 2], rx[..., 1, 0]], axis=-1
        )
        p_foot = r + jnp.einsum("...ji,...j->...i", Ra, loc)
        Jc_all.append(Jc)
        Jcdqd_all.append(Jcdqd)
        pf_all.append(p_foot)

    return ContactInfo(
        Jc=jnp.stack(Jc_all, axis=-3),
        Jcdqd=jnp.stack(Jcdqd_all, axis=-2),
        p_foot=jnp.stack(pf_all, axis=-2),
    )
