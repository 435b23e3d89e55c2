"""6-D spatial vector algebra (Featherstone), batched.

Rebuilds the conventions of src/common/Dynamics/spatial.h and
SpatialInertia.h: motion vectors [omega; v], Plucker motion transforms
X = [[R, 0], [-R [r]x, R]] (createSXform, spatial.h:149-159), motion and
force cross products (spatial.h:49-74), spatial inertia
[[I + m cx cx^T, m cx], [m cx^T, m 1]].

All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops.rotations import skew


def sxform(R: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Motion transform child-from-parent: X = [[R, 0], [-R [r]x, R]]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], r.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    X = jnp.zeros(batch + (6, 6), R.dtype)
    X = X.at[..., 0:3, 0:3].set(R)
    X = X.at[..., 3:6, 3:6].set(R)
    X = X.at[..., 3:6, 0:3].set(-R @ skew(r))
    return X


def sxform_inv_T(X: jnp.ndarray) -> jnp.ndarray:
    """Force transform = X^{-T} for a motion transform X."""
    R = X[..., 0:3, 0:3]
    mRrx = X[..., 3:6, 0:3]          # -R [r]x
    out = jnp.zeros_like(X)
    out = out.at[..., 0:3, 0:3].set(R)
    out = out.at[..., 3:6, 3:6].set(R)
    out = out.at[..., 0:3, 3:6].set(mRrx)
    return out


def motion_cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """crm(a) @ b (spatial.h:81-97)."""
    w, v = a[..., 0:3], a[..., 3:6]
    bw, bv = b[..., 0:3], b[..., 3:6]
    top = jnp.cross(w, bw)
    bot = jnp.cross(v, bw) + jnp.cross(w, bv)
    return jnp.concatenate([top, bot], axis=-1)


def force_cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """crf(a) @ b = -crm(a)^T b (spatial.h:100-116)."""
    w, v = a[..., 0:3], a[..., 3:6]
    bn, bf = b[..., 0:3], b[..., 3:6]
    top = jnp.cross(w, bn) + jnp.cross(v, bf)
    bot = jnp.cross(w, bf)
    return jnp.concatenate([top, bot], axis=-1)


def spatial_inertia(mass, com: jnp.ndarray, I_rot: jnp.ndarray) -> jnp.ndarray:
    """Mass + CoM + rotational-inertia-about-CoM -> 6x6 spatial inertia
    (SpatialInertia.h constructor)."""
    c = skew(com)
    m = jnp.asarray(mass, com.dtype)
    batch = jnp.broadcast_shapes(com.shape[:-1], I_rot.shape[:-2], m.shape)
    out = jnp.zeros(batch + (6, 6), com.dtype)
    mc = m[..., None, None] * c
    out = out.at[..., 0:3, 0:3].set(I_rot + mc @ jnp.swapaxes(c, -1, -2))
    out = out.at[..., 0:3, 3:6].set(mc)
    out = out.at[..., 3:6, 0:3].set(jnp.swapaxes(mc, -1, -2))
    out = out.at[..., 3:6, 3:6].set(
        m[..., None, None] * jnp.eye(3, dtype=com.dtype)
    )
    return out


def flip_inertia_y(mass: float, com, I_rot):
    """Mirror (mass, com, I) across the XZ plane (flipAlongAxis(Y),
    SpatialInertia.h) for right-side legs."""
    import numpy as np

    P = np.diag([1.0, -1.0, 1.0])
    com2 = P @ np.asarray(com)
    I2 = P @ np.asarray(I_rot) @ P
    return mass, com2, I2


def rot_x(theta: float):
    import numpy as np

    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])


def rot_y(theta: float):
    import numpy as np

    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])


def rot_z(theta: float):
    import numpy as np

    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def joint_rotation(axis: str, q: jnp.ndarray) -> jnp.ndarray:
    """Coordinate rotation about a named axis (orientation_tools.h:66-89:
    these are coordinate rotations, i.e. transposes of active rotations)."""
    c, s = jnp.cos(q), jnp.sin(q)
    zero = jnp.zeros_like(q)
    one = jnp.ones_like(q)
    if axis == "x":
        rows = [one, zero, zero, zero, c, s, zero, -s, c]
    elif axis == "y":
        rows = [c, zero, -s, zero, one, zero, s, zero, c]
    elif axis == "z":
        rows = [c, s, zero, -s, c, zero, zero, zero, one]
    else:
        raise ValueError(axis)
    return jnp.stack(rows, axis=-1).reshape(q.shape + (3, 3))


def joint_motion_subspace(axis: str, dtype) -> jnp.ndarray:
    """Revolute joint motion subspace S (6,)."""
    idx = {"x": 0, "y": 1, "z": 2}[axis]
    return jnp.zeros(6, dtype).at[idx].set(1.0)
