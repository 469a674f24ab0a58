"""Worker for the true multi-process (multihost-analogue) test.

Launched by tests/test_multiprocess.py as N OS processes, each with 4
virtual CPU devices, connected through jax.distributed (Gloo CPU
collectives) — the rebuild's analogue of the reference's multi-process
NCCL DDP world (utils/misc.py:296-369). Exercises, across real process
boundaries: init_distributed, global-device mesh construction,
DistributedSampler-style index sharding (data/nmc.epoch_indices),
global-batch assembly from process-local shards
(parallel/mesh.global_batch), a replicated forecast train step whose
gradient all-reduce crosses processes, and the cross-process parameter
checksum (the reference's check_ddp_consistency, utils/misc.py:408-420).

Prints one JSON line {rank, losses, checksum} for the parent to compare
against a single-process run of the same global batches.
"""

import json
import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vaevar_tpu.parallel import mesh as pmesh

    rank = pmesh.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

    if mode == "da":
        mesh = pmesh.make_mesh({"sh": 2, "sw": 2 * nproc})
        out = run_da_solve(mesh)
        out["rank"] = rank
        print(json.dumps(out), flush=True)
        return

    mesh = pmesh.make_mesh({"dp": 4 * nproc})
    losses, checksum = run_steps(
        mesh, rank=rank, world=nproc, local_bs=16 // nproc
    )
    print(json.dumps({"rank": rank, "losses": losses,
                      "checksum": checksum}), flush=True)


def run_steps(mesh, rank: int, world: int, local_bs: int, steps: int = 2):
    """The shared train-loop body: also called by the parent test in
    single-process mode (rank=0, world=1) to produce the golden values."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from vaevar_tpu import config as cfgs
    from vaevar_tpu.data.nmc import epoch_indices
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.parallel import mesh as pmesh
    from vaevar_tpu.train.forecast_trainer import make_forecast_train_step
    from vaevar_tpu.train.vae_trainer import replicated_checksum

    HW, NC = (16, 32), 17
    fcfg = cfgs.micro_config(img_size=HW, inchans_list=(4, 13),
                             outchans_list=(8, 26))
    model = LGUnet(fcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, NC, *HW)))
    init_fn, train_step = make_forecast_train_step(
        model.apply, loss_type="LpLoss", lr=1e-3, total_steps=steps,
        out_shape=(2 * NC, *HW),
    )
    trainable, opt_state = init_fn(params)
    trainable = pmesh.replicate(trainable, mesh)
    opt_state = pmesh.replicate(opt_state, mesh)
    step_j = jax.jit(train_step, donate_argnums=(0, 1))

    n = 64
    data = np.random.default_rng(7).normal(
        size=(n, NC, *HW)
    ).astype(np.float32)
    losses = []
    for s in range(steps):
        # one global permutation per step; each process takes a disjoint
        # stride slice — the same global SET of samples at any world size
        idx = epoch_indices(n, seed=5, epoch=s, rank=rank, world_size=world)
        inp = data[idx[:local_bs]]
        tar = 0.9 * inp
        put = lambda b: pmesh.global_batch(
            np.ascontiguousarray(b), mesh, P("dp", None, None, None)
        )
        trainable, opt_state, loss = step_j(
            trainable, opt_state, put(inp), [put(tar)]
        )
        losses.append(float(loss))
    return losses, replicated_checksum(trainable)


def run_da_solve(mesh, lbfgs_iters: int = 4, nit: int = 2):
    """The multihost-analogue of the spatially-sharded DA solve (the
    v5p-16 north-star path, SURVEY.md section 2c): the vae4dvar REDUCED
    solve (da_win=1 --mesh config of record) on a (sh, sw) mesh that may
    span OS processes, with per-iteration diagnostics so every host-read
    surface (jb/jo scalars, per-channel WRMSE) is exercised on global
    arrays. Inputs are rebuilt identically in every process from fixed
    seeds as host numpy — the single-controller-per-host contract of the
    cycler. Returns JSON-serializable results for cross-rank and
    vs-single-process comparison."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaevar_tpu import config as cfgs
    from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
    from vaevar_tpu.da.cost import ObsBundle
    from vaevar_tpu.da.solver import VariationalSolver
    from vaevar_tpu.models.lgunet import LGUnet

    HW = (16, 32)
    decoder = LGUnet(cfgs.micro_config(
        img_size=HW, inchans_list=(2, 6), outchans_list=(13, 56)))
    z0 = np.zeros((1, 8, *HW), np.float32)
    dparams = jax.tree.map(
        np.asarray, decoder.init(jax.random.PRNGKey(3), jnp.asarray(z0)))

    rr = np.random.default_rng(1)
    xb = rr.normal(size=(69, *HW)).astype(np.float32)
    gt = xb + 0.3 * rr.normal(size=(69, *HW)).astype(np.float32)
    bundle = ObsBundle(
        xb=xb,
        yo=gt[None],
        H=np.asarray(obs_mod.make_obs_mask("free_0005", 1, HW, rr)),
        R=np.asarray(
            obs_mod.build_R(obs_mod.obs_error_variance(0.1), None, 1, HW)),
    )
    cost, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
    # host numpy throughout: device_put from identical host buffers is the
    # layout every process can commit to a process-spanning sharding
    red = type(r := cost_mod.reduce_obs(bundle, HW))(
        *(np.asarray(f) for f in r))

    solver = VariationalSolver(cost, to_state, parts,
                               lbfgs_iters=lbfgs_iters, mesh=mesh)
    z, xa, diag = solver.solve(z0, red, {"decoder": dparams, "flow": None},
                               nit=nit, gt=gt[None], verbose=False)
    assert not z.sharding.is_fully_replicated
    # replicated-scalar host reads work on process-spanning arrays; the
    # full field stays sharded (the caller allgathers if it needs it)
    xa_sum = float(jax.jit(jnp.sum)(xa))
    xa_sq = float(jax.jit(lambda a: jnp.sum(a * a))(xa))
    # the allgather path of mesh.host_value: every host reconstructs the
    # full analysis field from a process-spanning sharded array (what the
    # cycler's checkpoint/field dumps do on a multihost mesh)
    from vaevar_tpu.parallel.mesh import host_value

    xa_host = host_value(xa)
    assert xa_host.shape == (69, *HW)
    return {
        "jb": [float(v) for v in diag.loss_reg],
        "jo": [float(v) for v in diag.loss_obs],
        "wrmse_last": [float(v) for v in np.asarray(diag.wrmse[-1])[:6]],
        "xa_sum": xa_sum,
        "xa_sq": xa_sq,
        "xa_host_sum": float(xa_host.astype(np.float64).sum()),
    }


if __name__ == "__main__":
    main()
