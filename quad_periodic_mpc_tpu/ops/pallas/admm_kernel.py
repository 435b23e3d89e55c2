"""Fused ADMM-iteration Pallas kernel.

The XLA ADMM loop is HBM-bound: every iteration re-reads each instance's
K^{-1} (57.6 KB at h=10) from HBM — 100 iterations x batch 2048 = 11.8 GB
per solve, ~15 ms at v5e bandwidth.  This kernel holds a chunk of
instances' K^{-1} RESIDENT IN VMEM across all iterations, reducing the
K^{-1} traffic to one pass (118 MB, ~0.15 ms).

Layout: instances ride the LANE axis (chunk C = 128 per grid step), so
- the per-instance matvec x~ = K^{-1} rhs becomes an unrolled sum of
  row-broadcast multiplies on the VPU ((n, C) tiles);
- the constraint products A x and A^T w use the SHARED dense pyramid
  matrix (same for every instance) -> true MXU matmuls
  (m, n) @ (n, C).

Iterations run in a fori_loop inside the kernel; grid iterates over
batch chunks with Mosaic pipelining the next chunk's K^{-1} DMA behind
the current chunk's compute.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quad_periodic_mpc_tpu.config import ADMMConfig

CHUNK = 64   # Kinv VMEM block 3.7MB -> fits with double buffering
# bf16 Kinv storage: full 128-lane chunks at the same VMEM budget (the
# f32 64-lane layout wastes half the VPU); x-update accumulates in f32.
# Operator error ~2^-8 relative — see fused parity test for the bound.


def _dense_constraint_matrix(F: np.ndarray, h: int) -> np.ndarray:
    """blockdiag of 4h copies of the (c, a) pyramid block -> (m, n)."""
    c, a = F.shape
    k = 4 * h
    A = np.zeros((k * c, k * a), F.dtype)
    for i in range(k):
        A[i * c : (i + 1) * c, i * a : (i + 1) * a] = F
    return A


def _kernel(
    kinv_ref,    # (n, n, C) VMEM
    q_ref,       # (n, C)
    l_ref,       # (m, C)
    u_ref,       # (m, C)
    rho_ref,     # (m, C)
    x0_ref,      # (n, C)
    z0_ref,      # (m, C)
    y0_ref,      # (m, C)
    A_ref,       # (m, n) shared dense constraint matrix
    At_ref,      # (n, m)
    x_out,       # (n, C)
    z_out,       # (m, C)
    y_out,       # (m, C)
    rhs_ref,     # (n, C) VMEM scratch
    *,
    n: int,
    m: int,
    iters: int,
    sigma: float,
    over_relax: float,
):
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    rho_inv = 1.0 / rho
    a = over_relax
    JB = 8

    # The shared cone products run at HIGHEST matmul precision: the
    # default bf16-input pass re-injects ~0.4% of |x| per iteration and
    # the ADMM fixed point inherits it as a STANDING constraint residual
    # (the xla-loop fix of ADMMConfig.iter_precision, applied in-kernel).
    hp = jax.lax.Precision.HIGHEST

    def body(_, carry):
        x, z, y = carry
        w = rho * z - y
        rhs_ref[:] = sigma * x - q + jnp.dot(
            At_ref[:], w, preferred_element_type=jnp.float32, precision=hp
        )

        # per-instance matvec on the VPU, exploiting SYMMETRY of K^{-1}
        # (SPD inverse; the NS iterate and the Woodbury correction both
        # preserve symmetry):
        #   x~[i, c] = sum_j Kinv[i, j, c] rhs[j, c]
        #            = sum_j Kinv[j, i, c] rhs[j, c]
        # so j rides the LEADING ref dim and each JB-block is a natural
        # subview load.  Slicing the middle dim instead made Mosaic
        # materialize the whole bf16 block as an f32 stack value
        # (2 x 9 MB scoped vmem at n=192 -> OOM over the 16 MB limit);
        # leading-dim fori subviews keep the stack at one (JB, n, C)
        # product per round.  rhs lives in a scratch ref because values
        # cannot be dynamically sliced in Mosaic.
        def jblock(i, acc):
            kb = kinv_ref[pl.dslice(i * JB, JB), :, :].astype(
                jnp.float32
            )                                        # (JB, n, C)
            rb = rhs_ref[pl.dslice(i * JB, JB), :][:, None, :]  # (JB, 1, C)
            return acc + jnp.sum(kb * rb, axis=0)

        x_t = jax.lax.fori_loop(0, n // JB, jblock, jnp.zeros_like(x))
        rem = n % JB
        if rem:
            kb = kinv_ref[n - rem :, :, :].astype(jnp.float32)
            rb = rhs_ref[n - rem :, :][:, None, :]
            x_t = x_t + jnp.sum(kb * rb, axis=0)
        x_new = a * x_t + (1.0 - a) * x
        z_t = jnp.dot(
            A_ref[:], x_t, preferred_element_type=jnp.float32, precision=hp
        )
        z_r = a * z_t + (1.0 - a) * z
        z_new = jnp.clip(z_r + rho_inv * y, l, u)
        y_new = y + rho * (z_r - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:])
    )
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("iters", "sigma", "over_relax", "interpret", "kinv_bf16"),
)
def fused_admm_iterations(
    K_inv: jnp.ndarray,     # (B, n, n)
    q: jnp.ndarray,         # (B, n)
    l: jnp.ndarray,         # (B, m)
    u: jnp.ndarray,         # (B, m)
    rho: jnp.ndarray,       # (B, m)
    F: jnp.ndarray,         # (c, a) pyramid block
    x0: jnp.ndarray,
    z0: jnp.ndarray,
    y0: jnp.ndarray,
    iters: int = 100,
    sigma: float = 1e-6,
    over_relax: float = 1.6,
    interpret: bool = False,
    kinv_bf16: bool = False,
):
    """Run the OSQP iteration with VMEM-resident K^{-1}.

    Returns (x, z, y) with shapes matching the inputs.  B is padded to a
    multiple of the chunk size internally.  kinv_bf16 stores K^{-1} in
    VMEM as bf16 with 128-lane chunks (full VPU width at half the VMEM),
    accumulating the x-update in f32.
    """
    B, n = q.shape
    C = 128
    m = l.shape[-1]
    h = n // 12
    # The LANE dim pads to 128 in VMEM, so chunks below 128 lanes save
    # nothing — always use C = 128 (the earlier f32 CHUNK=64 layout
    # wasted half the VPU and measured as slow as the XLA loop).  Mosaic
    # double-buffers grid-mapped inputs; when two K^{-1} blocks don't
    # fit the ~16 MB scoped budget (bf16 n >= ~168 i.e. h >= 14; f32
    # n >= ~120 i.e. h >= 10), fall back to a grid-less kernel mapped
    # over chunks with lax.map: one block resident at a time, chunk
    # handoff un-overlapped (a few percent slower, but it compiles at
    # any horizon).
    kinv_bytes = 2 if kinv_bf16 else 4
    single_buffer = 2 * n * n * C * kinv_bytes + 2_500_000 > 15_500_000
    pad = (-B) % C
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        K_inv, q, l, u, rho, x0, z0, y0 = map(
            padv, (K_inv, q, l, u, rho, x0, z0, y0)
        )
    Bp = q.shape[0]
    nc = Bp // C

    # instance-in-lane layout: (nc, n, n, C) etc.
    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(
            t.reshape((nc, C) + extra), 1, -1
        )

    K_t = to_lanes(K_inv)
    if kinv_bf16:
        K_t = K_t.astype(jnp.bfloat16)
    q_t, l_t, u_t, rho_t = map(to_lanes, (q, l, u, rho))
    x_t, z_t, y_t = map(to_lanes, (x0, z0, y0))

    A_dense = jnp.kron(jnp.eye(4 * h, dtype=jnp.float32), F.astype(jnp.float32))
    At_dense = A_dense.T

    kernel = functools.partial(
        _kernel, n=n, m=m, iters=iters, sigma=sigma, over_relax=over_relax
    )
    out_shape_1 = [
        jax.ShapeDtypeStruct((n, C), jnp.float32),
        jax.ShapeDtypeStruct((m, C), jnp.float32),
        jax.ShapeDtypeStruct((m, C), jnp.float32),
    ]

    if single_buffer:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[vmem] * 10,
            out_specs=[vmem] * 3,
            out_shape=out_shape_1,
            scratch_shapes=[pltpu.VMEM((n, C), jnp.float32)],
            interpret=interpret,
        )
        x_o, z_o, y_o = jax.lax.map(
            lambda a: call(*a, A_dense, At_dense),
            (K_t, q_t, l_t, u_t, rho_t, x_t, z_t, y_t),
        )
    else:
        # None squeezes the grid dim away: kernel refs are (n, n, C)/
        # (n, C)/(m, C) subviews, so dynamic leading-dim slices inside
        # the kernel stay subviews instead of forcing a whole-block
        # materialization.
        chunk_spec = lambda *shape: pl.BlockSpec(
            (None,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        shared_spec = lambda *shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
        )
        x_o, z_o, y_o = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[
                chunk_spec(n, n, C),
                chunk_spec(n, C),
                chunk_spec(m, C),
                chunk_spec(m, C),
                chunk_spec(m, C),
                chunk_spec(n, C),
                chunk_spec(m, C),
                chunk_spec(m, C),
                shared_spec(m, n),
                shared_spec(n, m),
            ],
            out_specs=[
                chunk_spec(n, C),
                chunk_spec(m, C),
                chunk_spec(m, C),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, n, C), jnp.float32),
                jax.ShapeDtypeStruct((nc, m, C), jnp.float32),
                jax.ShapeDtypeStruct((nc, m, C), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((n, C), jnp.float32)],
            interpret=interpret,
        )(K_t, q_t, l_t, u_t, rho_t, x_t, z_t, y_t, A_dense, At_dense)

    def from_lanes(t, inner):
        return jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]

    return (
        from_lanes(x_o, (n,)),
        from_lanes(z_o, (m,)),
        from_lanes(y_o, (m,)),
    )
