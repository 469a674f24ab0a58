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
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from vaevar_tpu.parallel import mesh as pmesh

    rank = pmesh.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
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


if __name__ == "__main__":
    main()
