"""Forecast-model training / Q-matrix / rollout-eval runner (CLI).

Equivalent of the reference `basemodel` workflows (model/model.py:26-514,
launched via its ConfigBuilder yaml configs): supervised one-/two-step
training with Possloss or LpLoss, `calculate_q` per-pixel error-variance
export (writes the `new_q.npy` asset consumed by the DA engine's Q-matrix,
da_4dvar.py:528-550), and multi-step rollout WRMSE evaluation.

Parallelism is the device mesh visible to JAX (data-parallel batch
sharding; gradient all-reduce inserted by XLA).
"""

from __future__ import annotations

import argparse


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="train",
                   choices=["train", "calculate_q", "eval_rollout"])
    p.add_argument("--start_time", type=str, default="2022-01-01 00:00:00")
    p.add_argument("--end_time", type=str, default="2022-02-01 00:00:00")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--grid", type=str, default="128x256")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps", type=int, default=200,
                   help="train steps per epoch / q samples / rollout length")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--val_start", type=str, default=None,
                   help="held-out validation range start; default: last "
                   "20%% of [start_time, end_time)")
    p.add_argument("--val_end", type=str, default=None)
    p.add_argument("--no_resume", action="store_true",
                   help="ignore an existing checkpoint_latest in --out_dir")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh 'DP' or 'DPxSHxSW' (e.g. 8 or 2x2x2) "
                   "for data-parallel (+spatially sharded) training; "
                   "default: no mesh (single device)")
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--loss_type", type=str, default="Possloss",
                   choices=["Possloss", "LpLoss"])
    p.add_argument("--two_step", action="store_true")
    p.add_argument("--model_ckpt", type=str, default=None)
    p.add_argument("--micro", action="store_true",
                   help="micro model config (smoke runs)")
    p.add_argument("--out_dir", type=str, default="output/forecast")
    p.add_argument("--q_lead_hours", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 compute (default on; --no-bf16 for f32)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="jax.checkpoint each block (default on — keeps the "
                   "train step inside one v5e chip's HBM; --no-remat trades "
                   "memory for speed on big-HBM parts)")
    p.add_argument("--log_every", type=int, default=10)
    return p.parse_args()


def main():
    args = arg_parser()
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()

    from vaevar_tpu.parallel.mesh import init_distributed

    init_distributed()  # multihost no-op unless SLURM/coordinator env set

    from vaevar_tpu import channels
    from vaevar_tpu import config as cfgs
    from vaevar_tpu.config import FLOW_140
    from vaevar_tpu.data.era5 import LocalNpyStore, SyntheticEra5
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.train import checkpoint as ckpt
    from vaevar_tpu.train.forecast_trainer import (
        calculate_q,
        multi_step_predict,
    )
    from vaevar_tpu.utils import metrics as M
    from vaevar_tpu.utils.logger import get_logger
    from vaevar_tpu.utils.meters import ScalarWriter

    hw = tuple(int(v) for v in args.grid.split("x"))
    dtype = jnp.bfloat16 if args.bf16 else None
    logger = get_logger("train_forecast", args.out_dir)

    source = (
        LocalNpyStore(args.data_dir, hw) if args.data_dir
        else SyntheticEra5(hw=hw, seed=args.seed)
    )
    mean = channels.MEAN.reshape(-1, 1, 1)
    std = channels.STD.reshape(-1, 1, 1)

    def norm_state(ts):
        return ((source.get_state(ts) - mean) / std).astype(np.float32)

    def pair_iter(batch, lead_hours, n_targets=1, t0=None, t1=None):
        """Yields normalized (inp, [tar1, ...]) batches of consecutive
        lead-time frames (basemodel's one/two-step supervision,
        model/model.py:212-260)."""
        t = pd.Timestamp(t0 or args.start_time)
        end = pd.Timestamp(t1 or args.end_time)
        lead = pd.Timedelta(hours=lead_hours)
        while True:
            inps = []
            tars = [[] for _ in range(n_targets)]
            for _ in range(batch):
                if t + n_targets * lead > end:
                    return
                inps.append(norm_state(t))
                for s in range(n_targets):
                    tars[s].append(norm_state(t + (s + 1) * lead))
                t += pd.Timedelta(hours=6)
            yield np.stack(inps), [np.stack(ts) for ts in tars]

    base = cfgs.micro_config(img_size=hw) if args.micro else FLOW_140.replace(
        img_size=hw, remat=args.remat
    )
    model_cfg = base.replace(dtype=dtype)
    model = LGUnet(model_cfg)
    if args.model_ckpt:
        params = ckpt.restore(args.model_ckpt)
    else:
        from vaevar_tpu.utils.fast_init import fast_init

        params = jax.device_put(
            fast_init(model, jnp.zeros((1, 69, *hw)), seed=args.seed)
        )

    if args.task == "calculate_q":
        pairs = (
            (inp, tars[0])
            for inp, tars in pair_iter(args.batch_size, args.q_lead_hours)
        )
        q = calculate_q(model.apply, params, pairs)
        # physical-units variance like the reference q assets
        q_phys = q * (channels.STD.reshape(-1, 1, 1) ** 2)
        os.makedirs(args.out_dir, exist_ok=True)
        path = os.path.join(args.out_dir, "new_q.npy")
        # (T-1, 69) per-lead channel means, the load_q_matrix q_type=1 format
        np.save(path, q_phys.mean(axis=(1, 2))[None])
        np.save(os.path.join(args.out_dir, "q_full.npy"), q_phys)
        logger.info(f"Q-matrix saved to {path}; channel-mean q[z500]="
                    f"{float(q_phys.mean(axis=(1, 2))[11]):.4g}")
        return

    if args.task == "eval_rollout":
        x0 = jnp.asarray(norm_state(pd.Timestamp(args.start_time))[None])
        preds = multi_step_predict(model.apply, params, x0, args.steps)
        t = pd.Timestamp(args.start_time)
        for s in range(args.steps):
            t += pd.Timedelta(hours=6)
            gt = jnp.asarray(norm_state(t)[None])
            wrmse = M.weighted_rmse(preds[s], gt) * jnp.asarray(channels.STD)
            logger.info(
                f"lead {(s + 1) * 6:4d}h: z500 {float(wrmse[11]):.4g} "
                f"t850 {float(wrmse[66]):.4g} t2m {float(wrmse[2]):.4g}"
            )
        return

    # --- task == train ----------------------------------------------------
    from vaevar_tpu.train.forecast_trainer import train_forecast
    from vaevar_tpu.utils.metrics import MetricsRecorder

    # held-out validation range: explicit args or the last 20% of the span
    # (reference trains/tests on disjoint yearly ranges, training_options
    # train_data/valid_data)
    t0 = pd.Timestamp(args.start_time)
    t1 = pd.Timestamp(args.end_time)
    if args.val_start:
        v0 = pd.Timestamp(args.val_start)
        v1 = pd.Timestamp(args.val_end) if args.val_end else t1
        train_end = min(t1, v0)
    else:
        v0 = t0 + 0.8 * (t1 - t0)
        v1 = t1
        train_end = v0

    mesh = None
    if args.mesh:
        from vaevar_tpu.parallel.mesh import mesh_from_arg

        mesh = mesh_from_arg(args.mesh)
        logger.info(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
                    f"over {jax.device_count()} devices "
                    f"({jax.process_count()} processes)")

    n_targets = 2 if args.two_step else 1
    writer = ScalarWriter(args.out_dir) if jax.process_index() == 0 else None

    def rank_strided(it):
        """Each process takes a disjoint stride of the time-ordered batch
        stream (DistributedSampler analogue for the sequential forecast
        loader): its local batch becomes that rank's dp slice of the
        global batch, so a multi-process run sees world_size x the data.
        The ragged tail (fewer than world_size batches) is dropped on
        EVERY rank — unequal step counts would hang the collective."""
        rank, world = jax.process_index(), jax.process_count()
        if world == 1:
            yield from it
            return
        group = []
        for b in it:
            group.append(b)
            if len(group) == world:
                yield group[rank]
                group = []

    from vaevar_tpu.data.prefetch import prefetched

    def train_factory(epoch):
        del epoch  # time-ordered stream; the reference's forecast loader
        # is sequential over the archive too
        return prefetched(rank_strided(pair_iter(args.batch_size, 6,
                                                 n_targets=n_targets,
                                                 t0=t0, t1=train_end)))

    def val_factory():
        return prefetched(rank_strided(pair_iter(args.batch_size, 6,
                                                 n_targets=n_targets,
                                                 t0=v0, t1=v1)))

    recorder = MetricsRecorder(["MSE", "WRMSE"])

    trainable, history = train_forecast(
        model.apply,
        params,
        train_factory,
        val_factory=val_factory,
        epochs=args.epochs,
        steps_per_epoch=args.steps,
        loss_type=args.loss_type,
        lr=args.lr,
        two_step=args.two_step,
        out_shape=(2 * channels.N_CHANNELS, *hw),
        ckpt_dir=args.out_dir,
        resume=not args.no_resume,
        recorder=recorder,
        data_std=channels.STD,
        logger=logger.info,
        log_every=args.log_every,
        mesh=mesh,
        writer=writer,
    )
    del history  # scalars already streamed at the true global step
    if jax.process_index() == 0:
        # bare-params alias for downstream consumers (DA engine loads
        # params only, like the reference's state_dict-only VAE ckpts)
        ckpt.save(os.path.join(args.out_dir, "params_latest"),
                  trainable["model"])
        logger.info(f"saved train state to {args.out_dir}/checkpoint_latest "
                    f"(+best) and bare params to params_latest")


if __name__ == "__main__":
    main()
