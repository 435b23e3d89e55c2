"""Batched OSQP-style ADMM for the condensed MPC QP.

Replaces the reference's dense active-set qpOASES solve
(SolverMPC.cpp:955-982) and its JCQP ADMM alternative
(JCQP/QpProblem.h:16-38, selectable via use_jcqp at SolverMPC.cpp:818-838).
Active-set methods do not batch (divergent pivoting per instance); ADMM
with a FIXED iteration count is branch-free, shape-static, and runs as a
chain of batched GEMMs — the TPU-native formulation.

Problem:   min 1/2 x^T P x + q^T x   s.t.  l <= A x <= u
with A = I_{4h} (x) F (block friction pyramid, ops/constraints.py).

Iteration (OSQP, with over-relaxation alpha):

    x~ = K^{-1} (sigma x - q + A^T (rho z - y))     K = P + sigma I + A^T rho A
    x+ = alpha x~ + (1 - alpha) x
    z~ = A x~
    zr = alpha z~ + (1 - alpha) z
    z+ = clip(zr + y / rho, l, u)
    y+ = y + rho (zr - z+)

Structure exploited:
- A^T rho A is block-diagonal with 3x3 blocks F^T diag(rho_5) F, so K is
  P plus a cheap block-diagonal bump — assembled with one scatter-add.
- K^{-1} is computed ONCE per problem (batched Cholesky -> explicit
  inverse); every iteration is then two small GEMMs + elementwise VPU work.
  rho * A^T A regularizes K (lambda_min >= sigma + 2 alpha_reg +
  rho lambda_min(F^T F)), so the explicit f32 inverse is well-conditioned
  even though P alone is nearly singular (alpha = 4e-5).
- rho scaling per constraint type mirrors OSQP: rows with l == u
  (swing-foot fz in [0,0]) get rho * eq_scale, pinning swing forces — the
  shape-static equivalent of the reference's variable elimination
  (SolverMPC.cpp:859-950).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import constraints as con
from quad_periodic_mpc_tpu.ops import linalg


class QPData(NamedTuple):
    """One batched QP instance set (leading batch dims shared)."""

    P: jnp.ndarray        # (..., n, n)
    q: jnp.ndarray        # (..., n)
    F: jnp.ndarray        # (5, 3) pyramid block (shared)
    l: jnp.ndarray        # (..., m) lower bounds (flattened (h*4*5,))
    u: jnp.ndarray        # (..., m) upper bounds


class ADMMState(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray
    # Carried inverse for Newton-Schulz warm starts.  On the "ns" backend
    # this is K0^{-1}, the UNIFORM-rho base inverse (gait-independent
    # structure — see _kkt_inverse_woodbury); on "cholesky" it is the full
    # K^{-1} (unused for warm starts there).
    kinv: jnp.ndarray | None = None


def rho_vector(l: jnp.ndarray, u: jnp.ndarray, cfg: ADMMConfig) -> jnp.ndarray:
    """Per-constraint rho: rho * eq_scale where l == u (OSQP convention)."""
    eq = jnp.abs(u - l) < 1e-9
    return jnp.where(eq, cfg.rho * cfg.eq_scale, cfg.rho)


def build_kkt_uniform(qp: QPData, cfg: ADMMConfig) -> jnp.ndarray:
    """K = P + sigma I + rho blockdiag(F^T F) for UNIFORM rho.

    The bump is one CONSTANT (n, n) matrix shared by every instance —
    a single broadcast add that XLA fuses into P's producer, vs the
    per-instance scatter-add of the general build_kkt."""
    n = qp.P.shape[-1]
    a = qp.F.shape[-1]
    G = cfg.rho * jnp.einsum("ca,cb->ab", qp.F, qp.F)
    C = cfg.sigma * jnp.eye(n, dtype=qp.P.dtype)
    C = linalg.add_block_diag(
        C, jnp.broadcast_to(G, (n // a,) + G.shape)
    )
    return qp.P + C


def build_kkt(qp: QPData, rho: jnp.ndarray, cfg: ADMMConfig) -> jnp.ndarray:
    """K = P + sigma I + A^T diag(rho) A.

    A^T diag(rho) A = blockdiag_k( F^T diag(rho_k) F ), one 3x3 block per
    foot-step k.
    """
    n = qp.P.shape[-1]
    batch = qp.P.shape[:-2]
    k = n // qp.F.shape[-1]
    rho_blocks = rho.reshape(batch + (k, qp.F.shape[-2]))
    # G_k = F^T diag(rho_k) F: (..., k, 3, 3)
    G = jnp.einsum("ca,...kc,cb->...kab", qp.F, rho_blocks, qp.F)
    K = qp.P + cfg.sigma * jnp.eye(n, dtype=qp.P.dtype)
    return linalg.add_block_diag(K, G)


def build_kkt_inverse(
    qp: QPData, rho: jnp.ndarray, cfg: ADMMConfig
) -> jnp.ndarray:
    """K^{-1} via the configured backend (see ADMMConfig.kkt)."""
    K = build_kkt(qp, rho, cfg)
    if cfg.kkt == "ns":
        return linalg.ns_inverse(K, cfg.ns_iters, polish=cfg.ns_polish)
    return linalg.cho_inverse(linalg.cholesky_factor(K))


def solve(
    qp: QPData,
    cfg: ADMMConfig,
    warm: ADMMState | None = None,
) -> tuple[jnp.ndarray, ADMMState]:
    """Run cfg.iterations fixed ADMM steps; returns (x, final state).

    Cold-start note (ADVICE r3): the default eq_mode="uniform" is tuned
    for the production warm-started loop — the carried y rows already
    hold the swing-pin duals, so the stiff-rho pinning buys nothing and
    its Woodbury restore stage costs ~8 ms/step at batch 2048.  A COLD
    one-shot solve at moderate iteration counts pins swing rows slower
    under uniform rho (test_warm_start_roundtrip's cold bound is 1.5 N
    at ADMM-60 vs 0.2 N with the eq bump); one-shot callers who need
    tight cold accuracy should pass eq_mode="woodbury" or raise
    iterations (cold ADMM-400 uniform measures ~1e-3 N, the parity
    table's cold row).

    Fully batched over leading dims of qp; jit/vmap/shard_map safe.
    On the "ns" backend, warm.kinv carries the previous MPC step's
    uniform-rho base inverse K0^{-1}: K0 drifts only with P (never with
    the gait table), so the seed stays contractive across stance<->swing
    flips and the adaptive Newton-Schulz trip count stays at
    ns_warm_iters in steady state; the eq_scale rho bump is then restored
    exactly by a low-rank Woodbury correction (_kkt_inverse_woodbury).
    """
    # eq_mode (see ADMMConfig): "uniform" = plain rho everywhere, no
    # correction stage (measured better than the eq-bump under warm
    # starts, tools/exp_eqmode.py); "woodbury" = bounds-based eq-scaled
    # rho restored exactly via the low-rank correction (faster pinning
    # on cold one-shot solves).
    if cfg.eq_mode == "uniform":
        rho = jnp.broadcast_to(jnp.asarray(cfg.rho, qp.l.dtype), qp.l.shape)
    else:
        rho = rho_vector(qp.l, qp.u, cfg)
    need_K = cfg.kkt != "ns" or cfg.refine
    K = build_kkt(qp, rho, cfg) if need_K else None
    if cfg.kkt != "ns":
        K_inv = linalg.cho_inverse(linalg.cholesky_factor(K))
        kinv_carry = K_inv
    elif cfg.eq_mode == "woodbury":
        K_inv, kinv_carry = _kkt_inverse_woodbury(qp, rho, cfg, warm)
    else:
        K0 = K if need_K else build_kkt_uniform(qp, cfg)
        lead = K0.shape[:-2]
        # bucket escalation needs a flat batch for the top-k gather;
        # reshape multi-dim sweep batches through it
        if cfg.ns_escalate == "bucket" and warm is not None and len(lead) >= 1:
            n = K0.shape[-1]
            Kf = K0.reshape((-1, n, n))
            X0f = warm.kinv.reshape((-1, n, n))
            K_inv = linalg.ns_inverse_bucket(
                Kf, X0f, warm_iters=cfg.ns_warm_iters,
                cold_iters=cfg.ns_cold_iters, polish=cfg.ns_polish,
                precision=(None if cfg.ns_bucket_precision == "auto"
                           else cfg.ns_bucket_precision),
            ).reshape(K0.shape)
        else:
            K_inv = linalg.ns_inverse(
                K0, cfg.ns_iters,
                X0=warm.kinv if warm is not None else None,
                warm_iters=cfg.ns_warm_iters, polish=cfg.ns_polish,
            )
        kinv_carry = K_inv

    n = qp.P.shape[-1]
    m = qp.l.shape[-1]
    batch = qp.q.shape[:-1]
    dtype = qp.P.dtype
    if warm is None:
        warm = ADMMState(
            x=jnp.zeros(batch + (n,), dtype),
            z=jnp.zeros(batch + (m,), dtype),
            y=jnp.zeros(batch + (m,), dtype),
        )

    if cfg.backend == "pallas":
        from quad_periodic_mpc_tpu.ops.pallas import admm_kernel

        lead = qp.q.shape[:-1]
        flat = lambda t: t.reshape((-1,) + t.shape[len(lead):]).astype(
            jnp.float32
        )
        x_f, z_f, y_f = admm_kernel.fused_admm_iterations(
            K_inv.reshape((-1, n, n)).astype(jnp.float32),
            flat(qp.q), flat(qp.l), flat(qp.u), flat(rho),
            qp.F.astype(jnp.float32),
            flat(warm.x), flat(warm.z), flat(warm.y),
            iters=cfg.iterations, sigma=cfg.sigma,
            over_relax=cfg.over_relax, kinv_bf16=cfg.pallas_bf16_kinv,
            interpret=jax.default_backend() == "cpu",
        )
        x_f = x_f.reshape(lead + (n,)).astype(dtype)
        z_f = z_f.reshape(lead + (m,)).astype(dtype)
        y_f = y_f.reshape(lead + (m,)).astype(dtype)
        final = ADMMState(x=x_f, z=z_f, y=y_f, kinv=kinv_carry)
        return final.x, final

    sigma = jnp.asarray(cfg.sigma, dtype)
    a = jnp.asarray(cfg.over_relax, dtype)
    rho_inv = 1.0 / rho
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[cfg.iter_precision]

    def step(state, _):
        x, z, y = state
        rhs = sigma * x - qp.q + con.apply_T(qp.F, rho * z - y, precision=prec)
        x_t = jnp.einsum("...nm,...m->...n", K_inv, rhs, precision=prec)
        # iterative refinement: one K-residual correction per iteration
        # compensates the inexact (Newton-Schulz / f32) inverse so the ADMM
        # fixed point matches the exact-solve fixed point.
        for _ in range(cfg.refine):
            r = rhs - jnp.einsum("...nm,...m->...n", K, x_t, precision=prec)
            x_t = x_t + jnp.einsum(
                "...nm,...m->...n", K_inv, r, precision=prec
            )
        x_new = a * x_t + (1.0 - a) * x
        z_t = con.apply(qp.F, x_t, precision=prec)
        z_r = a * z_t + (1.0 - a) * z
        z_new = jnp.clip(z_r + rho_inv * y, qp.l, qp.u)
        y_new = y + rho * (z_r - z_new)
        return (x_new, z_new, y_new), None

    (x_f, z_f, y_f), _ = jax.lax.scan(
        step, (warm.x, warm.z, warm.y), None, length=cfg.iterations
    )
    final = ADMMState(x=x_f, z=z_f, y=y_f, kinv=kinv_carry)
    return final.x, final


def _kkt_inverse_woodbury(
    qp: QPData,
    rho: jnp.ndarray,
    cfg: ADMMConfig,
    warm: ADMMState | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """K^{-1} as a gait-independent base inverse + exact low-rank update.

    The eq_scale rho bump lands only on fz rows (l == u swing pins), and
    the fz pyramid row is (0, 0, 1) — so relative to the UNIFORM-rho
    KKT matrix K0,

        K = K0 + E diag(delta) E^T,   E = z-variable selector (n x k),
        delta_k = (eq_scale - 1) rho  on swing blocks, else 0.

    K0's structure never depends on the gait table (it drifts only with
    P), so the previous control tick's K0^{-1} is ALWAYS a contractive
    Newton-Schulz seed and the warm 3-round trip count fires every step —
    with the old direct-K approach a single stance<->swing flip anywhere
    in the batch forced the full cold 30 rounds (the global all() gate).
    The bump is then restored exactly via Woodbury:

        K^{-1} = K0^{-1} - B M B^T,  B = K0^{-1} E,
        M = (I + diag(delta) S)^{-1} diag(delta),  S = E^T K0^{-1} E,

    one batched k x k solve (k = 4h) + two slim GEMMs.  Returns
    (K^{-1}, K0^{-1}-to-carry).
    """
    n = qp.P.shape[-1]
    a = qp.F.shape[-1]
    c = qp.F.shape[-2]
    k = n // a
    dtype = qp.P.dtype

    rho_u = jnp.full_like(rho, cfg.rho)
    K0 = build_kkt(qp, rho_u, cfg)
    kinv_seed = warm.kinv if warm is not None else None
    K0_inv = linalg.ns_inverse(
        K0, cfg.ns_iters, X0=kinv_seed, warm_iters=cfg.ns_warm_iters,
        polish=cfg.ns_polish,
    )
    if cfg.eq_scale == 1.0:
        return K0_inv, K0_inv

    # per-block bump: delta_k = sum of (rho - rho_u) weighted by F z-row
    # squares; for the pyramid only the fz row (0,0,1) hits z, so this is
    # exactly (eq_scale - 1) * rho on swing blocks.
    fz2 = qp.F[..., :, a - 1] ** 2                        # (c,)
    delta = jnp.einsum(
        "...kc,c->...k", (rho - rho_u).reshape(rho.shape[:-1] + (k, c)), fz2
    )                                                     # (..., k)

    # z-variable columns are the strided set (a-1, 2a-1, ...): select by
    # reshape + slice (pure view ops) instead of gather.
    lead = K0_inv.shape[:-2]
    B = K0_inv.reshape(lead + (n, k, a))[..., a - 1]      # (..., n, k)

    # Capacitance solve + correction in LANE-MAJOR layout (batch in the
    # 128-lane minor axis, ops/linalg.py lane_*): the k x k and n x k
    # blocks sit far below the (8, 128) tile, and the VPU mul-reduce is
    # EXACT f32 — which matters here, because the correction cancels
    # K0^{-1}'s large z-block down to the ~1/(rho eq_scale) bumped value
    # and bf16 matmul passes turn that cancellation into garbage (ADMM
    # then diverges on the pinned rows; the earlier MXU formulation
    # needed 6-pass HIGHEST GEMMs for the same reason — measured 3.1 ms
    # vs ~1.5 ms here at batch 2048, h = 10).
    # W = I + D^{1/2} S D^{1/2} is SPD with spectrum in [1, 1 + ||.||];
    # Jacobi preconditioning (Ws = d^{-1/2} W d^{-1/2}, d = diag W) drops
    # cond from ~1e2-1e3 to O(10), so 8 Newton-Schulz rounds reach the
    # f32 floor.
    Bm = jnp.moveaxis(B.reshape((-1, n, k)), 0, -1)       # (n, k, Bt)
    S = Bm.reshape(k, a, k, -1)[:, a - 1]                 # (k, k, Bt)
    dl = jnp.moveaxis(delta.reshape((-1, k)), 0, -1)      # (k, Bt)
    eye_k = jnp.eye(k, dtype=dtype)[..., None]

    dh = jnp.sqrt(dl)
    W = eye_k + dh[:, None, :] * S * dh[None, :, :]
    diagS = S.reshape(k * k, -1)[:: k + 1]                # (k, Bt) diag(S)
    dw = jnp.sqrt(1.0 / (1.0 + dl * diagS))
    Ws = dw[:, None, :] * W * dw[None, :, :]
    X = linalg.lane_ns_inverse(Ws, 8)
    X = dw[:, None, :] * X * dw[None, :, :]               # undo scaling
    Bd = Bm * dh[None, :, :]                              # B D^{1/2}
    XBt = linalg.lane_mm(X, linalg.lane_t(Bd))            # (k, n, Bt)
    corr = linalg.lane_mm(Bd, XBt)                        # (n, n, Bt)
    K_inv = K0_inv - jnp.moveaxis(corr, -1, 0).reshape(lead + (n, n))
    return K_inv, K0_inv


def kkt_residuals(
    qp: QPData, x: jnp.ndarray, z: jnp.ndarray, y: jnp.ndarray
) -> dict[str, jnp.ndarray]:
    """Primal/dual residual norms (per instance) for accuracy reporting.

    Measurement arithmetic runs at HIGHEST matmul precision: the TPU's
    default bf16-input matmul adds O(0.4%) rounding to F u and P x,
    which at force scale O(100 N) reads as a fictitious ~2 N "residual"
    (measured: the same solves report primal max 2e-3 on CPU f32 but
    ~2.0 on TPU at default precision).  The audit must not be noisier
    than the quantity it audits.
    """
    hp = jax.lax.Precision.HIGHEST
    c_dim, a_dim = qp.F.shape[-2], qp.F.shape[-1]
    k = x.shape[-1] // a_dim
    batch = x.shape[:-1]
    xf = x.reshape(batch + (k, a_dim))
    ax = jnp.einsum("ca,...ka->...kc", qp.F, xf, precision=hp)
    ax = ax.reshape(batch + (k * c_dim,))
    r_prim = jnp.max(jnp.abs(ax - z), axis=-1)
    px = jnp.einsum("...nm,...m->...n", qp.P, x, precision=hp)
    yf = y.reshape(batch + (k, c_dim))
    fty = jnp.einsum("ca,...kc->...ka", qp.F, yf, precision=hp)
    fty = fty.reshape(batch + (k * a_dim,))
    r_dual = jnp.max(jnp.abs(px + qp.q + fty), axis=-1)
    viol = jnp.maximum(ax - qp.u, qp.l - ax)
    r_feas = jnp.max(jnp.maximum(viol, 0.0), axis=-1)
    return {"primal": r_prim, "dual": r_dual, "feas": r_feas}
