"""Multi-process distributed-backend exercise (the DCN code path).

Runs one sharded Monte-Carlo sweep step across a REAL multi-process
jax.distributed runtime — each process owns a slice of the scenario
batch, the mesh spans every process's devices, and the metric reductions
(mean tracking error, best-hypothesis argmin) execute as cross-process
collectives (Gloo on CPU; ICI/DCN on TPU pods).  This is the executable
proof of the rebuild's multi-host story (SURVEY.md section 2.4: ROS
pub/sub graph -> jax.distributed + sharded mesh).

Run as a worker (one per process):

    python -m quad_periodic_mpc_tpu.parallel.dist_check \
        --coordinator localhost:12356 --num-processes 2 --process-id 0

With no --coordinator it runs single-process (the oracle for the test:
the multi-process result must match it exactly).

Prints ONE JSON line with the reduced metrics.  tests/test_distributed.py
spawns 2 worker processes plus the single-process oracle and asserts
agreement.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--weak-scaling", action="store_true",
                    help="also run measure_weak_scaling on the global "
                         "(possibly multi-process Gloo) mesh")
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        from quad_periodic_mpc_tpu.parallel.scaling import init_distributed

        init_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quad_periodic_mpc_tpu.config import (
        ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig,
    )
    from quad_periodic_mpc_tpu.control import loop as loop_mod
    from quad_periodic_mpc_tpu.control import mpc as mpc_mod
    from quad_periodic_mpc_tpu.parallel import mesh as mesh_lib
    from quad_periodic_mpc_tpu.parallel import sweep as sweep_lib
    from quad_periodic_mpc_tpu.sim import srb_sim

    mesh = mesh_lib.make_mesh(jax.device_count())
    sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    B = args.batch
    assert B % jax.device_count() == 0
    spec = sweep_lib.SweepSpec(
        gait_names=("trotting", "bounding"), phase_offsets=B // 2
    )
    assert spec.size == B
    dtype = jnp.float32
    mpc_cfg = MPCConfig(horizon=5)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = ADMMConfig(iterations=30)

    gait, iters, dist, _terrain = sweep_lib.build_scenarios(spec, dtype)
    plant = srb_sim.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = srb_sim.observe(plant)
    ctrl = mpc_mod.init_state((B,), obs, dtype=dtype, horizon=mpc_cfg.horizon)
    ctrl = ctrl._replace(iteration=iters)
    cmd = mpc_mod.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )

    # Each process contributes its own slice of the global batch — the
    # global array is assembled from process-local shards.
    n_local = B // args.num_processes
    lo = args.process_id * n_local

    def globalize(x):
        if getattr(x, "ndim", 0) == 0 or x.shape[0] != B:
            return x
        local = x[lo:lo + n_local]
        spec_nd = P(mesh_lib.DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec_nd), local, x.shape
        )

    plant, ctrl, cmd, gait, dist = jax.tree.map(
        globalize, (plant, ctrl, cmd, gait, dist)
    )

    rep = NamedSharding(mesh, P())

    @jax.jit
    def go(plant, ctrl, cmd, gait, dist):
        carry, trace = loop_mod.rollout(
            args.steps, plant, ctrl, cmd, gait, dist, mpc_cfg, loop_cfg,
            est_cfg, solver,
        )
        vx = trace.x[..., 9]
        vx_rms = jnp.sqrt(jnp.mean((vx - cmd.vx[..., None]) ** 2, -1))
        # cross-process collective reductions
        mean_rms = jax.lax.with_sharding_constraint(jnp.mean(vx_rms), rep)
        best = jax.lax.with_sharding_constraint(jnp.argmin(vx_rms), rep)
        checksum = jax.lax.with_sharding_constraint(
            jnp.sum(trace.x[..., -1, :12]), rep
        )
        return mean_rms, best, checksum

    mean_rms, best, checksum = go(plant, ctrl, cmd, gait, dist)
    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mean_vx_rms": float(mean_rms),
        "best_instance": int(best),
        "checksum": float(checksum),
    }

    if args.weak_scaling:
        # measure_weak_scaling executed over the GLOBAL mesh — when this
        # worker runs under a 2-process jax.distributed runtime the step
        # dispatches through cross-process Gloo collectives: the
        # multi-process execution record for the scaling harness
        # (BASELINE.md row 3 mechanism; real efficiency numbers need
        # real multi-host hardware).
        from quad_periodic_mpc_tpu.parallel.scaling import (
            measure_weak_scaling,
        )

        def make_inputs(batch):
            p = srb_sim.init_plant((batch,), body_height=0.29, dtype=dtype)
            o = srb_sim.observe(p)
            c = mpc_mod.init_state(
                (batch,), o, dtype=dtype, horizon=mpc_cfg.horizon
            )
            cm = mpc_mod.Command(
                vx=jnp.full((batch,), 0.3, dtype),
                vy=jnp.zeros((batch,), dtype),
                yaw_rate=jnp.zeros((batch,), dtype),
                body_height=jnp.full((batch,), 0.29, dtype),
            )
            g = sweep_lib.build_scenarios(
                sweep_lib.SweepSpec(
                    gait_names=("trotting",), phase_offsets=batch
                ),
                dtype,
            )[0]
            return c, o, cm, g, p.t

        def ws_step(ctrl, obs, cmd, gait, t):
            ctrl, forces = mpc_mod.mpc_step(
                ctrl, obs, cmd, gait, t, mpc_cfg, loop_cfg, est_cfg, solver
            )
            return jnp.sum(forces)

        ws = measure_weak_scaling(
            make_inputs, ws_step, per_device=4,
            device_counts=[jax.device_count()], reps=3,
        )
        result["weak_scaling"] = {
            str(k): {"throughput": v["throughput"],
                     "efficiency": v["efficiency"]}
            for k, v in ws.items()
        }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
