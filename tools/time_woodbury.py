#!/usr/bin/env python
"""Micro-profile of the warm KKT-inverse path internals (batch 2048, h=10).

Splits _kkt_inverse_woodbury into: K0 build, NS warm rounds, Woodbury
capacitance NS, HIGHEST correction GEMMs — each its own jit with a
host-pulled scalar fence.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import ADMMConfig
    from quad_periodic_mpc_tpu.ops import constraints as con
    from quad_periodic_mpc_tpu.ops import linalg, qp_admm

    B, h = 2048, 10
    n, m = 12 * h, 20 * h
    cfg = ADMMConfig()
    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (B, n, n), jnp.float32) * 0.05
    P = jnp.einsum("bij,bkj->bik", G, G) + 0.1 * jnp.eye(n)
    q = jax.random.normal(key, (B, n), jnp.float32)
    F = con.pyramid_block(0.4, jnp.float32)
    l = jnp.tile(jnp.asarray([-1e9, -1e9, -1e9, -1e9, 0.0], jnp.float32), (B, n // 3))
    u = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.0, 120.0], jnp.float32), (B, n // 3))
    swing = (jnp.arange(B * (n // 3)).reshape(B, n // 3) % 3) == 0
    u = u.at[..., 4::5].set(jnp.where(swing, 0.0, u[..., 4::5]))
    qp = qp_admm.QPData(P=P, q=q, F=F, l=l, u=u)
    rho = qp_admm.rho_vector(qp.l, qp.u, cfg)

    def bench(name, fn, *args, reps=20):
        f = jax.jit(fn)
        # scalar checksum fence (full-array np.asarray costs seconds of
        # tunnel transfer); reps dispatched back-to-back and fenced ONCE
        # to amortize the ~26 ms per-dispatch relay RTT
        ck = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        t0 = time.perf_counter()
        out = f(*args)
        float(ck(out))
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        float(ck(out))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:42s} compile {t_comp:6.1f}s  {dt*1e3:8.2f} ms")
        return out

    rho_u = jnp.full_like(rho, cfg.rho)
    K0 = bench("build_kkt (uniform rho)", lambda qp, r: qp_admm.build_kkt(qp, r, cfg), qp, rho_u)
    K0_inv = bench("ns_inverse cold 30", lambda K: linalg.ns_inverse(K, 30), K0)
    bench(
        "ns_inverse warm (fused round + 1)",
        lambda K, X0: linalg.ns_inverse(K, 30, X0=X0, warm_iters=2),
        K0, K0_inv,
    )

    def woodbury_only(K0_inv, rho):
        a, c = 3, 5
        k = n // a
        dtype = K0_inv.dtype
        fz2 = qp.F[..., :, a - 1] ** 2
        delta = jnp.einsum("...kc,c->...k", (rho - rho_u).reshape(rho.shape[:-1] + (k, c)), fz2)
        lead = K0_inv.shape[:-2]
        Bm = K0_inv.reshape(lead + (n, k, a))[..., a - 1]
        S = Bm.reshape(lead + (k, a, k))[..., a - 1, :]
        eye_k = jnp.eye(k, dtype=dtype)
        hi = jax.lax.Precision.HIGHEST
        hi3 = jax.lax.Precision.HIGH
        dh = jnp.sqrt(delta)
        W = eye_k + dh[..., :, None] * S * dh[..., None, :]
        dw = jnp.sqrt(1.0 / (1.0 + delta * jnp.diagonal(S, axis1=-2, axis2=-1)))
        Ws = dw[..., :, None] * W * dw[..., None, :]
        norm = jnp.max(jnp.sum(jnp.abs(Ws), axis=-1), axis=-1)
        X0 = jnp.broadcast_to(eye_k, W.shape) / norm[..., None, None]

        def ns_round(_, X):
            KX = jnp.einsum("...ij,...jk->...ik", Ws, X, precision=hi3)
            return jnp.einsum("...ij,...jk->...ik", X, 2.0 * eye_k - KX, precision=hi3)

        X = jax.lax.fori_loop(0, 8, ns_round, X0)
        X = dw[..., :, None] * X * dw[..., None, :]
        Bd = Bm * dh[..., None, :]
        XBt = jnp.einsum("...kl,...jl->...kj", X, Bd, precision=hi)
        return K0_inv - jnp.einsum("...ik,...kj->...ij", Bd, XBt, precision=hi)

    bench("woodbury correction (full)", woodbury_only, K0_inv, rho)

    def cap_only(K0_inv, rho):
        a, c = 3, 5
        k = n // a
        fz2 = qp.F[..., :, a - 1] ** 2
        delta = jnp.einsum("...kc,c->...k", (rho - rho_u).reshape(rho.shape[:-1] + (k, c)), fz2)
        lead = K0_inv.shape[:-2]
        Bm = K0_inv.reshape(lead + (n, k, a))[..., a - 1]
        S = Bm.reshape(lead + (k, a, k))[..., a - 1, :]
        eye_k = jnp.eye(k, dtype=K0_inv.dtype)
        hi3 = jax.lax.Precision.HIGH
        dh = jnp.sqrt(delta)
        W = eye_k + dh[..., :, None] * S * dh[..., None, :]
        dw = jnp.sqrt(1.0 / (1.0 + delta * jnp.diagonal(S, axis1=-2, axis2=-1)))
        Ws = dw[..., :, None] * W * dw[..., None, :]
        norm = jnp.max(jnp.sum(jnp.abs(Ws), axis=-1), axis=-1)
        X0 = jnp.broadcast_to(eye_k, W.shape) / norm[..., None, None]

        def ns_round(_, X):
            KX = jnp.einsum("...ij,...jk->...ik", Ws, X, precision=hi3)
            return jnp.einsum("...ij,...jk->...ik", X, 2.0 * eye_k - KX, precision=hi3)

        X = jax.lax.fori_loop(0, 8, ns_round, X0)
        return dw[..., :, None] * X * dw[..., None, :]

    X = bench("  capacitance NS-8 (40x40 HIGH)", cap_only, K0_inv, rho)

    def corr_only(K0_inv, X, rho):
        a, c = 3, 5
        k = n // a
        fz2 = qp.F[..., :, a - 1] ** 2
        delta = jnp.einsum("...kc,c->...k", (rho - rho_u).reshape(rho.shape[:-1] + (k, c)), fz2)
        lead = K0_inv.shape[:-2]
        Bm = K0_inv.reshape(lead + (n, k, a))[..., a - 1]
        hi = jax.lax.Precision.HIGHEST
        Bd = Bm * jnp.sqrt(delta)[..., None, :]
        XBt = jnp.einsum("...kl,...jl->...kj", X, Bd, precision=hi)
        return K0_inv - jnp.einsum("...ik,...kj->...ij", Bd, XBt, precision=hi)

    bench("  correction GEMMs (HIGHEST)", corr_only, K0_inv, X, rho)


if __name__ == "__main__":
    main()
