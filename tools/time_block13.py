#!/usr/bin/env python
"""Layout experiment: batched (13,13) matmul on TPU.

(a) standard batched matmul (B,13,13)@(B,13,13) — batch in tiles, 13
    pads to (8,128): ~10x lane waste.
(b) lane-major mul-reduce: arrays (13,13,B), out[i,k,b] = sum_j x*y —
    batch rides the 128-lane axis, VPU does the 13^3 MACs.
(c) einsum "ijb,jkb->ikb" (XLA dot_general with minor batch dim).
(d) lane-major via dot_general-free explicit loop over j (13 fused FMAs).
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

    E = 65536
    key = jax.random.PRNGKey(0)
    Xb = jax.random.normal(key, (E, 13, 13), jnp.float32)
    Yb = jax.random.normal(key, (E, 13, 13), jnp.float32)
    Xl = jnp.moveaxis(Xb, 0, -1)  # (13, 13, E)
    Yl = jnp.moveaxis(Yb, 0, -1)

    def bench(name, fn, *args, reps=30):
        f = jax.jit(fn)
        ck = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        t0 = time.perf_counter()
        out = f(*args)
        float(ck(out))
        t_comp = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            float(ck(out))
            ts.append(time.perf_counter() - t0)
        print(f"{name:46s} compile {t_comp:5.1f}s  {np.median(ts)*1e3:8.3f} ms")

    hi3 = jax.lax.Precision.HIGH

    def chain(fn, x, y, n=8):
        # chain n dependent matmuls to amortize dispatch
        def body(i, x):
            return fn(x, y)
        return jax.lax.fori_loop(0, n, body, x)

    bench("(a) batched matmul HIGH x8",
          lambda x, y: chain(lambda a, b: jnp.matmul(a, b, precision=hi3), x, y), Xb, Yb)
    bench("(a2) batched matmul DEFAULT x8",
          lambda x, y: chain(jnp.matmul, x, y), Xb, Yb)

    def mulred(a, b):
        return (a[:, :, None, :] * b[None, :, :, :]).sum(1)

    bench("(b) lane-major mul-reduce x8",
          lambda x, y: chain(mulred, x, y), Xl, Yl)

    bench("(c) einsum ijb,jkb->ikb x8",
          lambda x, y: chain(lambda a, b: jnp.einsum("ijb,jkb->ikb", a, b), x, y), Xl, Yl)

    def jloop(a, b):
        out = a[:, 0, None, :] * b[0]
        for j in range(1, 13):
            out = out + a[:, j, None, :] * b[j]
        return out

    bench("(d) lane-major explicit j-sum x8",
          lambda x, y: chain(jloop, x, y), Xl, Yl)


if __name__ == "__main__":
    main()
