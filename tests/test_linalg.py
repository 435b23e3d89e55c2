

def test_spd_inverse_sizes_match_numpy():
    """Schur-recursion inverse vs numpy across the sizes it serves
    (pinv Gram 2/3/6, WBIC 6/12, mass matrix 18, KF innovation 28)."""
    import numpy as np
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import linalg

    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 6, 12, 18, 28):
        G = rng.normal(size=(5, n, n))
        M = G @ np.swapaxes(G, -1, -2) + 0.5 * np.eye(n)
        Mi = np.asarray(linalg.spd_inverse(jnp.asarray(M, jnp.float32)))
        err = np.abs(Mi @ M - np.eye(n)).max()
        assert err < 5e-4, (n, err)


def test_spd_solve_vec_and_mat():
    import numpy as np
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import linalg

    rng = np.random.default_rng(1)
    G = rng.normal(size=(4, 9, 9))
    M = G @ np.swapaxes(G, -1, -2) + np.eye(9)
    b = rng.normal(size=(4, 9))
    x = np.asarray(linalg.spd_solve(jnp.asarray(M, jnp.float32),
                                    jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", M, x), b, atol=2e-4)
    B = rng.normal(size=(4, 9, 3))
    X = np.asarray(linalg.spd_solve(jnp.asarray(M, jnp.float32),
                                    jnp.asarray(B, jnp.float32)))
    np.testing.assert_allclose(M @ X, B, atol=2e-4)


def test_ns_inverse_bucket_handles_mixed_seeds():
    """Bucket escalation (warm majority + jumped minority) reaches the
    same residual floor as the global cold path, and the all-bad batch
    takes the lax.cond full-batch fallback correctly."""
    import numpy as np
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import linalg

    rng = np.random.default_rng(2)
    B, n = 32, 24
    G = rng.normal(size=(B, n, n))
    K = jnp.asarray(G @ np.swapaxes(G, -1, -2) + 5.0 * np.eye(n), jnp.float32)
    K_inv = np.linalg.inv(np.asarray(K, np.float64))

    # mixed: 28 warm (exact inverse seeds), 4 jumped (garbage seeds)
    X0 = jnp.asarray(K_inv, jnp.float32)
    bad = np.zeros((B, 1, 1), bool)
    bad[[3, 9, 17, 30]] = True
    X0 = jnp.where(jnp.asarray(bad), 7.0 * X0, X0)
    X = linalg.ns_inverse_bucket(K, X0, warm_iters=1, cold_iters=14)
    r = np.abs(np.asarray(X) @ np.asarray(K) - np.eye(n)).max(axis=(-2, -1))
    assert r.max() < 5e-3, r.max()

    # all-bad: zero seeds -> n_bad > k -> global fallback branch
    Xg = linalg.ns_inverse_bucket(
        K, jnp.zeros_like(X0), warm_iters=1, cold_iters=20
    )
    rg = np.abs(np.asarray(Xg) @ np.asarray(K) - np.eye(n)).max(axis=(-2, -1))
    assert rg.max() < 5e-3, rg.max()


def test_ns_inverse_bucket_rescues_indefinite_seed():
    """An f32-rounded INDEFINITE warm seed (negative eigenvalue, trace
    still positive) defeats the alpha-rescale spectral argument — the
    bucket rounds diverge on that instance.  The post-contraction
    re-check must catch it and restart cold (ADVICE r3)."""
    import numpy as np
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.ops import linalg

    rng = np.random.default_rng(5)
    B, n = 16, 24
    G = rng.normal(size=(B, n, n))
    K = jnp.asarray(G @ np.swapaxes(G, -1, -2) + 5.0 * np.eye(n), jnp.float32)
    K_inv = np.linalg.inv(np.asarray(K, np.float64))

    # instance 0: X0 = (I - 2 e1 e1') K^{-1} => M = X0 K = I - 2 e1 e1'
    # (spectrum {1, ..., 1, -1}; trace = n - 2 > 0.1 n so the degenerate-
    # seed gate does NOT fire; r = 2 so it lands in the rescale class,
    # where alpha M has eigenvalue -1.2 and NS diverges to NaN/inf)
    R = np.eye(n)
    R[0, 0] = -1.0
    X0 = np.array(K_inv, np.float32)
    X0[0] = (R @ K_inv[0]).astype(np.float32)
    X = linalg.ns_inverse_bucket(
        jnp.asarray(K), jnp.asarray(X0), warm_iters=1, cold_iters=14
    )
    r = np.abs(np.asarray(X) @ np.asarray(K) - np.eye(n)).max(axis=(-2, -1))
    assert np.isfinite(r).all(), r
    assert r.max() < 5e-3, r.max()
