"""Stage-wise Riccati-ADMM solver vs the condensed QP (must agree)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import ADMMConfig, MPCConfig, PDIPConfig
from quad_periodic_mpc_tpu.ops import condense, constraints, gait as gait_ops
from quad_periodic_mpc_tpu.ops import problem, qp_pdip, qp_stagewise
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

RNG = np.random.default_rng(4)


def make_problems(horizon, seed=0, gait_name="trotting"):
    rng = np.random.default_rng(seed)
    cfg = MPCConfig(horizon=horizon)
    rpy = rng.uniform(-0.1, 0.1, 3)
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    hips = np.array(
        [[0.18, -0.13, -0.27], [0.18, 0.13, -0.27],
         [-0.18, -0.13, -0.27], [-0.18, 0.13, -0.27]]
    )
    obs = problem.RobotObs(
        p=jnp.asarray([0.0, 0.0, 0.27]),
        v=jnp.asarray(rng.uniform(-0.3, 0.3, 3)),
        quat=jnp.asarray(quat),
        omega=jnp.asarray(rng.uniform(-0.2, 0.2, 3)),
        r_feet=jnp.asarray(hips + rng.uniform(-0.02, 0.02, (4, 3))),
    )
    xref = np.zeros((horizon, 13))
    xref[:, 5] = 0.29
    g = gait_ops.preset(gait_name)
    table = gait_ops.mpc_table(g, jnp.asarray(0), horizon)
    f_est = jnp.asarray(rng.uniform(-1, 1, 6))

    qp, pred, x0 = problem.build_qp(obs, jnp.asarray(xref), table, cfg, f_est=f_est)

    l, u = constraints.bounds(table, cfg.f_max, cfg.big_number)
    sw = qp_stagewise.StagewiseProblem(
        Ad=pred.Adt, Bd=pred.Bdt,
        c=(pred.Qdt @ f_est[..., None])[..., 0],
        x0=x0,
        x_ref=jnp.asarray(xref),
        Q=2.0 * condense.full_weight(jnp.asarray(cfg.weights, jnp.float64)),
        R=2.0 * cfg.alpha * jnp.ones(12, jnp.float64),
        F=qp.F,
        l=l.reshape(horizon, 20),
        u=jnp.minimum(u, 1e4).reshape(horizon, 20),
    )
    return qp, sw, cfg, np.asarray(table)


def test_lqr_matches_unconstrained_condensed():
    """With constraints off (huge bounds), one Riccati solve must equal the
    unconstrained minimizer of the condensed QP: -qH^{-1} qg."""
    qp, sw, cfg, _ = make_problems(horizon=8, seed=2)
    h = cfg.horizon
    # remove constraints entirely
    U = qp_stagewise.lqr_solve(
        sw, jnp.zeros((3, 3), jnp.float64), jnp.zeros((h, 12), jnp.float64)
    )
    u_cond = np.linalg.solve(np.asarray(qp.P), -np.asarray(qp.q))
    np.testing.assert_allclose(
        np.asarray(U).reshape(-1), u_cond, atol=1e-7
    )


@pytest.mark.parametrize("horizon", [8, 16])
def test_stagewise_admm_matches_condensed_pdip(horizon):
    qp, sw, cfg, table = make_problems(horizon=horizon, seed=3)
    x_cond, _ = qp_pdip.solve(qp, PDIPConfig(iterations=40))
    U, _ = qp_stagewise.solve(sw, ADMMConfig(iterations=300))
    np.testing.assert_allclose(
        np.asarray(U).reshape(-1), np.asarray(x_cond), atol=5e-2
    )
    # swing feet pinned
    forces = np.asarray(U).reshape(horizon, 4, 3)
    swing = table.reshape(horizon, 4) == 0
    assert np.abs(forces[swing]).max() < 1e-3


def test_long_horizon_runs():
    """Horizons beyond the reference's hard cap of 19 (SolverMPC.cpp:113)
    are first-class here."""
    qp, sw, cfg, _ = make_problems(horizon=16, seed=5)
    # stretch the same problem to h=48 by tiling the reference trajectory
    h = 48
    reps = h // 16
    sw_long = sw._replace(
        x_ref=jnp.tile(sw.x_ref, (reps, 1)),
        l=jnp.tile(sw.l, (reps, 1)),
        u=jnp.tile(sw.u, (reps, 1)),
    )
    U, _ = qp_stagewise.solve(sw_long, ADMMConfig(iterations=100))
    assert U.shape == (h, 12)
    assert np.isfinite(np.asarray(U)).all()


def test_parallel_lqr_matches_sequential():
    """lqr_factorize + lqr_apply (associative-scan Riccati with cached
    gains) must reproduce the sequential backward/forward lqr_solve
    exactly (both are exact solvers of the same equality-constrained
    LQT)."""
    for h in (4, 10, 32):
        qp, sw, cfg, table = make_problems(h, seed=7 + h)
        rng = np.random.default_rng(h)
        r_lin = jnp.asarray(rng.normal(0, 5.0, (h, 12)))
        G = 1e-3 * (jnp.swapaxes(sw.F, -1, -2) @ sw.F)
        U_seq = qp_stagewise.lqr_solve(sw, G, r_lin)
        gains = qp_stagewise.lqr_factorize(sw, G)
        U_par = qp_stagewise.lqr_apply(gains, sw, r_lin)
        np.testing.assert_allclose(
            np.asarray(U_par), np.asarray(U_seq), rtol=1e-6, atol=1e-7,
        )


def test_parallel_lqr_batched():
    qp, sw, cfg, table = make_problems(8, seed=3)
    # batch of 3 by stacking perturbed copies
    def stack(t):
        return jnp.stack([t, t * 1.01 if t.dtype.kind == "f" else t, t])
    import numpy as _np
    sw3 = qp_stagewise.StagewiseProblem(
        Ad=jnp.stack([sw.Ad] * 3), Bd=jnp.stack([sw.Bd] * 3),
        c=jnp.stack([sw.c, sw.c * 0.5, sw.c * 2.0]),
        x0=jnp.stack([sw.x0, sw.x0 * 1.1, sw.x0 * 0.9]),
        x_ref=jnp.stack([sw.x_ref] * 3),
        Q=sw.Q, R=sw.R, F=sw.F,
        l=jnp.stack([sw.l] * 3), u=jnp.stack([sw.u] * 3),
    )
    rng = np.random.default_rng(0)
    r3 = jnp.asarray(rng.normal(0, 5.0, (3, 8, 12)))
    G = 1e-3 * (jnp.swapaxes(sw.F, -1, -2) @ sw.F)
    gains = qp_stagewise.lqr_factorize(sw3, G)
    U3 = qp_stagewise.lqr_apply(gains, sw3, r3)
    for i in range(3):
        swi = qp_stagewise.StagewiseProblem(
            Ad=sw3.Ad[i], Bd=sw3.Bd[i], c=sw3.c[i], x0=sw3.x0[i],
            x_ref=sw3.x_ref[i], Q=sw.Q, R=sw.R, F=sw.F,
            l=sw3.l[i], u=sw3.u[i],
        )
        Ui = qp_stagewise.lqr_solve(swi, G, r3[i])
        np.testing.assert_allclose(
            np.asarray(U3[i]), np.asarray(Ui), rtol=1e-6, atol=1e-7,
        )


def test_packed_solve_matches_blocked():
    """The lane-major packed production path (solve) must reproduce the
    batched-matmul reference implementation (solve_blocked) — same math,
    different TPU layout."""
    _, sw, _, _ = make_problems(12, seed=7)
    cfg = ADMMConfig(iterations=60)
    U_p, info_p = qp_stagewise.solve(sw, cfg)
    U_b, info_b = qp_stagewise.solve_blocked(sw, cfg)
    np.testing.assert_allclose(np.asarray(U_p), np.asarray(U_b), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(info_p["y"]), np.asarray(info_b["y"]), atol=2e-3
    )


def test_packed_solve_batched():
    """Packed layout with a leading batch dim: per-instance results must
    match independently solved instances."""
    sws = [make_problems(8, seed=s)[1] for s in (1, 2, 3)]
    import jax

    sw3 = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs) if xs[0].ndim or True else xs[0], *sws
    )
    # shared (unbatched) fields: F, Q, R stay unstacked
    sw3 = sw3._replace(F=sws[0].F, Q=sws[0].Q, R=sws[0].R)
    cfg = ADMMConfig(iterations=60)
    U3, _ = qp_stagewise.solve(sw3, cfg)
    for i, swi in enumerate(sws):
        Ui, _ = qp_stagewise.solve(swi, cfg)
        np.testing.assert_allclose(
            np.asarray(U3[i]), np.asarray(Ui), atol=1e-4
        )


def test_stagewise_kkt_residuals_match_condensed():
    """qp_stagewise.kkt_residuals computes the SAME primal/dual quantities
    as qp_admm.kkt_residuals (the objectives are equal, so the stagewise
    costate gradient must equal the condensed P x + q vector)."""
    from quad_periodic_mpc_tpu.ops import qp_admm

    qp, sw, cfg, _ = make_problems(horizon=10, seed=7)
    h = cfg.horizon
    U, info = qp_stagewise.solve(sw, ADMMConfig(iterations=150))
    res_sw = qp_stagewise.kkt_residuals(sw, U, info["z"], info["y"])
    res_cond = qp_admm.kkt_residuals(
        qp,
        U.reshape(-1).astype(qp.P.dtype),
        info["z"].reshape(-1).astype(qp.P.dtype),
        info["y"].reshape(-1).astype(qp.P.dtype),
    )
    # primal is the identical formula; dual goes through the costate
    # recursion vs the condensed GEMM — agreement to f32 roundoff at
    # force-gradient scale
    np.testing.assert_allclose(
        float(res_sw["primal"]), float(res_cond["primal"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(res_sw["feas"]), float(res_cond["feas"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(res_sw["dual"]), float(res_cond["dual"]),
        rtol=5e-2, atol=2e-4,
    )
    # residuals of a 150-iteration solve must be small in absolute terms
    assert float(res_sw["primal"]) < 6e-3
    assert float(res_sw["dual"]) < 1e-3


def test_fused_stagewise_kernel_matches_xla():
    """The fused pallas stagewise kernel (sequential in-VMEM Riccati +
    resident-gain ADMM, backend='pallas') must land at the same KKT
    quality as the XLA associative-scan path on identical problems."""
    from quad_periodic_mpc_tpu.ops import qp_admm

    qp, sw, cfg, table = make_problems(horizon=10, seed=9)
    # batch of 3 via broadcast perturbation
    import jax.numpy as jnp

    pert = jnp.asarray([0.0, 0.01, -0.02])
    swb = sw._replace(
        x0=sw.x0[None, :].astype(jnp.float32) + pert[:, None],
        Ad=jnp.broadcast_to(sw.Ad, (3, 13, 13)).astype(jnp.float32),
        Bd=jnp.broadcast_to(sw.Bd, (3, 13, 12)).astype(jnp.float32),
        c=jnp.broadcast_to(sw.c, (3, 13)).astype(jnp.float32),
        x_ref=jnp.broadcast_to(sw.x_ref, (3, 10, 13)).astype(jnp.float32),
        Q=sw.Q.astype(jnp.float32), R=sw.R.astype(jnp.float32),
        F=sw.F.astype(jnp.float32),
        l=jnp.broadcast_to(sw.l, (3, 10, 20)).astype(jnp.float32),
        u=jnp.broadcast_to(sw.u, (3, 10, 20)).astype(jnp.float32),
    )
    U_x, info_x = qp_stagewise.solve(swb, ADMMConfig(iterations=120))
    U_p, info_p = qp_stagewise.solve(
        swb, ADMMConfig(iterations=120, backend="pallas")
    )
    res_x = qp_stagewise.kkt_residuals(swb, U_x, info_x["z"], info_x["y"])
    res_p = qp_stagewise.kkt_residuals(swb, U_p, info_p["z"], info_p["y"])
    # same KKT quality (the two factorizations differ algorithmically,
    # so compare quality, then solutions within the combined floor)
    assert float(jnp.max(res_p["primal"])) < 6e-3
    assert float(jnp.max(res_p["dual"])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(U_p), np.asarray(U_x), atol=2e-2
    )

    # warm round-trip shapes (the solve() carry contract)
    warm = (U_p, info_p["z"], info_p["y"])
    U_w, info_w = qp_stagewise.solve(
        swb, ADMMConfig(iterations=20, backend="pallas"), warm=warm
    )
    res_w = qp_stagewise.kkt_residuals(swb, U_w, info_w["z"], info_w["y"])
    assert float(jnp.max(res_w["primal"])) < 6e-3


def test_fused_srb_build_matches_xla_build():
    """The in-kernel SRB build (_kernel_srb: Adt/Bdt/c assembled from
    the nilpotent closed forms inside the kernel) must reproduce the
    XLA build path (ct_dynamics + build_prediction) exactly: identical
    problems, identical solutions to f32 roundoff."""
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.config import MPCConfig
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem
    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, rpy_to_quat

    rng = np.random.default_rng(11)
    B, h = 3, 10
    cfg = MPCConfig(horizon=h)
    dtype = jnp.float32
    rpy = rng.uniform(-0.15, 0.15, (B, 3))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    hips = np.array(
        [[0.18, -0.13, -0.27], [0.18, 0.13, -0.27],
         [-0.18, -0.13, -0.27], [-0.18, 0.13, -0.27]]
    )
    obs = problem.RobotObs(
        p=jnp.asarray(np.tile([0.0, 0.0, 0.27], (B, 1)), dtype),
        v=jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), dtype),
        quat=jnp.asarray(quat, dtype),
        omega=jnp.asarray(rng.uniform(-0.2, 0.2, (B, 3)), dtype),
        r_feet=jnp.asarray(hips + rng.uniform(-0.03, 0.03, (B, 4, 3)), dtype),
    )
    xref = np.zeros((B, h, 13), np.float32)
    xref[..., 5] = 0.27
    g = gait_ops.preset("trotting")
    table = jnp.broadcast_to(
        gait_ops.mpc_table(g, jnp.asarray(1, jnp.int32), h), (B, h, 4)
    )
    f_est = jnp.asarray(rng.uniform(-3, 3, (B, 6)), dtype)
    x_drag = jnp.asarray(rng.uniform(-0.5, 0.5, (B,)), dtype)

    sw, _, _ = problem.build_stagewise(
        obs, jnp.asarray(xref), table, cfg, f_est=f_est, x_drag=x_drag
    )
    acfg = ADMMConfig(iterations=80, backend="pallas",
                      formulation="stagewise")
    U_ref, info_ref = qp_stagewise.solve(sw, acfg)

    R = quat_to_rotmat(obs.quat)
    R_eff = jnp.diag(sw.R.astype(dtype)) + acfg.rho * jnp.kron(
        jnp.eye(4, dtype=dtype), jnp.swapaxes(sw.F, -1, -2) @ sw.F
    )
    zeros = lambda r: jnp.zeros((B, h, r), dtype)
    U_f, z_f, y_f = SK.fused_stagewise_solve_srb(
        R, obs.r_feet, x_drag, f_est, sw.x0, sw.x_ref.astype(dtype),
        sw.Q.astype(dtype), R_eff, sw.F.astype(dtype),
        sw.l.astype(dtype), sw.u.astype(dtype),
        zeros(12), zeros(20), zeros(20),
        iters=80, rho=float(acfg.rho),
        ns_it=qp_stagewise.ns_combine_iters(h),
        dt=cfg.dt_mpc, mass=cfg.mass,
        i_inv_diag=tuple(1.0 / np.asarray(cfg.inertia_body)),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(U_f), np.asarray(U_ref), atol=2e-3
    )
    res = qp_stagewise.kkt_residuals(sw, U_f, z_f, y_f)
    assert float(jnp.max(res["primal"])) < 6e-3
    assert float(jnp.max(res["dual"])) < 1e-3


def test_fused_kernel_lean_mode_long_horizon():
    """h > 40 switches the kernel to the lean VMEM layout (packed
    symmetric Quu^{-1}, recomputed sweep scratches) — must match the
    XLA path at h = 48."""
    import jax.numpy as jnp

    qp, sw, cfg, _ = make_problems(horizon=16, seed=6)
    h = 48
    reps = h // 16
    swl = sw._replace(
        x_ref=jnp.tile(sw.x_ref, (reps, 1)).astype(jnp.float32),
        l=jnp.tile(sw.l, (reps, 1)).astype(jnp.float32),
        u=jnp.tile(sw.u, (reps, 1)).astype(jnp.float32),
        Ad=sw.Ad.astype(jnp.float32), Bd=sw.Bd.astype(jnp.float32),
        c=sw.c.astype(jnp.float32), x0=sw.x0.astype(jnp.float32),
        Q=sw.Q.astype(jnp.float32), R=sw.R.astype(jnp.float32),
        F=sw.F.astype(jnp.float32),
    )
    U_x, info_x = qp_stagewise.solve(swl, ADMMConfig(iterations=100))
    U_p, info_p = qp_stagewise.solve(
        swl, ADMMConfig(iterations=100, backend="pallas")
    )
    res_p = qp_stagewise.kkt_residuals(swl, U_p, info_p["z"], info_p["y"])
    assert float(jnp.max(res_p["primal"])) < 6e-3
    assert float(jnp.max(res_p["dual"])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(U_p), np.asarray(U_x), atol=3e-2
    )


def test_stream_kernel_matches_resident():
    """The gains-streaming kernel (fused_stagewise_solve_stream) runs
    the SAME math as the VMEM-resident kernel with K/Quu^{-1} spilled
    to HBM and streamed back per stage block — outputs must agree to
    f32 roundoff at a horizon both can run."""
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK

    qp, sw, cfg, _ = make_problems(horizon=16, seed=9)
    h = 16
    B = sw.x0.shape[0]
    f32 = jnp.float32
    R_eff = jnp.diag(sw.R.astype(f32)) + 0.12 * jnp.kron(
        jnp.eye(4, dtype=f32), jnp.swapaxes(sw.F, -1, -2) @ sw.F
    )
    flat = lambda t, *extra: jnp.broadcast_to(
        t, (B,) + extra
    ).astype(f32)
    zeros = lambda r: jnp.zeros((B, h, r), f32)
    args = (
        flat(sw.Ad, 13, 13), flat(sw.Bd, 13, 12), flat(sw.c, 13),
        flat(sw.x0, 13), flat(sw.x_ref, h, 13),
        sw.Q.astype(f32), R_eff, sw.F.astype(f32),
        flat(sw.l, h, 20), flat(sw.u, h, 20),
        zeros(12), zeros(20), zeros(20),
    )
    kw = dict(iters=30, rho=0.12, ns_it=16, interpret=True)
    U_r, z_r, y_r = SK.fused_stagewise_solve(*args, **kw)
    U_s, z_s, y_s = SK.fused_stagewise_solve_stream(*args, **kw)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_r), atol=1e-2)


def _h72_stream_check():
    """Body of test_stream_kernel_h72_end_to_end (run in a subprocess)."""
    import jax.numpy as jnp

    qp, sw, cfg, _ = make_problems(horizon=24, seed=6)
    reps = 3
    h = 72
    swl = sw._replace(
        x_ref=jnp.tile(sw.x_ref, (reps, 1)).astype(jnp.float32),
        l=jnp.tile(sw.l, (reps, 1)).astype(jnp.float32),
        u=jnp.tile(sw.u, (reps, 1)).astype(jnp.float32),
        Ad=sw.Ad.astype(jnp.float32), Bd=sw.Bd.astype(jnp.float32),
        c=sw.c.astype(jnp.float32), x0=sw.x0.astype(jnp.float32),
        Q=sw.Q.astype(jnp.float32), R=sw.R.astype(jnp.float32),
        F=sw.F.astype(jnp.float32),
    )
    U_x, info_x = qp_stagewise.solve(swl, ADMMConfig(iterations=60))
    U_p, info_p = qp_stagewise.solve(
        swl, ADMMConfig(iterations=60, backend="pallas")
    )
    res_p = qp_stagewise.kkt_residuals(swl, U_p, info_p["z"], info_p["y"])
    assert float(jnp.max(res_p["primal"])) < 2e-2
    assert float(jnp.max(res_p["dual"])) < 3e-3
    np.testing.assert_allclose(
        np.asarray(U_p), np.asarray(U_x), atol=5e-2
    )
    print("H72_STREAM_OK")


def test_stream_kernel_h72_end_to_end():
    """64 < h <= 128 dispatches the streaming kernel through
    qp_stagewise.solve; KKT-gated vs the XLA path at h = 72.

    Runs in a SUBPROCESS: the h=72 interpret-mode streaming program is
    the largest single XLA-CPU compile in the suite and LLVM reliably
    segfaults compiling it inside a long-lived suite process
    (memory/stack pressure after hundreds of earlier compiles) while a
    fresh interpreter compiles it fine — isolate the compile, keep the
    coverage."""
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = (
        "import sys; sys.path[:0] = [%r, %r]\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "from test_stagewise import _h72_stream_check\n"
        "_h72_stream_check()\n"
    ) % (repo, _os.path.join(repo, "tests"))
    # NOTE: no persistent compile cache in the subprocess — the giant
    # interpret-mode program's cache entry has crashed readers before
    # (see test_terrain_sweep_small_sharded); compile in-memory.
    out = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-3000:])
    assert "H72_STREAM_OK" in out.stdout


def test_srb_ad_structure_assumption():
    """The fused kernels' srb_ad=True contraction skips rest on Ad
    rows {6..10, 12} being EXACTLY identity rows and Bd row 12 being
    exactly zero for every problem the framework builds (nilpotent ZOH,
    ops/discretize.py) — pin that, including with x_drag active."""
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.ops.pallas.stagewise_kernel import (
        _N_COLS, _N_ROWS,
    )

    qp, sw, cfg, _ = make_problems(horizon=10, seed=3)
    Ad = np.asarray(sw.Ad)
    Bd = np.asarray(sw.Bd)
    N = Ad - np.eye(13)
    dead_rows = [r for r in range(13) if r not in _N_ROWS]
    dead_cols = [c for c in range(13) if c not in _N_COLS]
    assert np.all(N[dead_rows, :] == 0.0)
    assert np.all(N[:, dead_cols] == 0.0)
    assert np.all(Bd[12, :] == 0.0)

    # x_drag populates N[11, 9] and N[5, 9] — still inside the support
    from quad_periodic_mpc_tpu.models import srb
    from quad_periodic_mpc_tpu.ops import discretize

    A_ct, B_ct, Qc = srb.ct_dynamics(
        jnp.eye(3), jnp.asarray(np.zeros((4, 3))), cfg.mass,
        jnp.asarray(cfg.inertia_body), x_drag=0.7,
    )
    Adt, _, _ = discretize.nilpotent_zoh(A_ct, B_ct, Qc, cfg.dt_mpc)
    Nd = np.asarray(Adt) - np.eye(13)
    assert np.all(Nd[dead_rows, :] == 0.0)
    assert np.all(Nd[:, dead_cols] == 0.0)
    assert Nd[11, 9] != 0.0            # x_drag coupling is in-support


def test_srb_ad_structured_matches_dense():
    """srb_ad=True (structured 7-row contractions) and srb_ad=False
    (dense 13-wide contractions) run the same math — solutions agree to
    f32 roundoff through the full factorize + ADMM chain."""
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK

    qp, sw, cfg, _ = make_problems(horizon=10, seed=12)
    h = 10
    B = 4
    f32 = jnp.float32
    rho = 0.12
    R_eff = jnp.diag(sw.R.astype(f32)) + rho * jnp.kron(
        jnp.eye(4, dtype=f32), jnp.swapaxes(sw.F, -1, -2) @ sw.F
    )
    flat = lambda t, *extra: jnp.broadcast_to(t, (B,) + extra).astype(f32)
    zeros = lambda r: jnp.zeros((B, h, r), f32)
    args = (
        flat(sw.Ad, 13, 13), flat(sw.Bd, 13, 12), flat(sw.c, 13),
        flat(sw.x0, 13), flat(sw.x_ref, h, 13),
        sw.Q.astype(f32), R_eff, sw.F.astype(f32),
        flat(sw.l, h, 20), flat(sw.u, h, 20),
        zeros(12), zeros(20), zeros(20),
    )
    kw = dict(iters=30, rho=rho, ns_it=16, interpret=True)
    U_s, z_s, y_s = SK.fused_stagewise_solve(*args, srb_ad=True, **kw)
    U_d, z_d, y_d = SK.fused_stagewise_solve(*args, srb_ad=False, **kw)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d), atol=2e-3)


def test_stage_quu_inverse_rescue_recovers_bad_seed():
    """_stage_quu_inverse's residual gate (ADVICE r4): a garbage warm
    seed — zeros, huge, or NaN-poisoned — must be detected by the 2e-3
    residual gate and rescued to the correct inverse from the cold
    scalar seed.  The helper is pure lane-math, so it runs directly on
    CPU arrays (no pallas harness needed)."""
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK

    rng = np.random.default_rng(5)
    C = 8
    NU = 12
    # SPD Quu batch with condition ~1e3 (lane-major (NU, NU, C))
    Ms = []
    for _ in range(C):
        A = rng.normal(size=(NU, NU))
        Q, _ = np.linalg.qr(A)
        d = np.logspace(0, 3, NU)
        Ms.append(Q @ np.diag(d) @ Q.T)
    Quu = jnp.asarray(np.stack(Ms, axis=-1), jnp.float32)
    eyeu = jnp.eye(NU, dtype=jnp.float32)[:, :, None]
    true_inv = np.stack(
        [np.linalg.inv(Ms[i]) for i in range(C)], axis=-1
    )

    for seed_name, seed in (
        ("zeros", jnp.zeros((NU, NU, C), jnp.float32)),
        ("huge", 1e8 * jnp.ones((NU, NU, C), jnp.float32)),
        ("nan", jnp.full((NU, NU, C), jnp.nan, jnp.float32)),
    ):
        X = SK._stage_quu_inverse(
            Quu, seed, first=jnp.asarray(False), eyeu=eyeu, C=C,
            ns_it=30, ns_warm=6,
        )
        resid = np.max(np.abs(
            np.einsum("ikc,kjc->ijc", np.asarray(Quu), np.asarray(X))
            - np.asarray(eyeu)
        ))
        assert np.isfinite(resid), seed_name
        assert resid < 5e-3, (seed_name, resid)
        rel = np.max(np.abs(np.asarray(X) - true_inv)) / np.max(
            np.abs(true_inv)
        )
        assert rel < 1e-2, (seed_name, rel)

    # and a GOOD warm seed must not be disturbed (gate passes, no rescue)
    good = jnp.asarray(true_inv * (1 + 1e-3), jnp.float32)
    Xg = SK._stage_quu_inverse(
        Quu, good, first=jnp.asarray(False), eyeu=eyeu, C=C,
        ns_it=30, ns_warm=6,
    )
    residg = np.max(np.abs(
        np.einsum("ikc,kjc->ijc", np.asarray(Quu), np.asarray(Xg))
        - np.asarray(eyeu)
    ))
    assert residg < 2e-3
