"""VAE training runner (CLI) — equivalent of `python train_vae.py ...`
(reference train_vae.py:101-121) without SLURM/DDP: parallelism is the
device mesh visible to JAX (data-parallel batch sharding; gradient
all-reduce inserted by XLA).
"""

from __future__ import annotations

import argparse


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--start_time", type=str, default="2022-01-01 00:00:00")
    p.add_argument("--end_time", type=str, default="2022-02-01 00:00:00")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--grid", type=str, default="128x256")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--sigma", type=float, default=2.0)
    p.add_argument("--nmc_steps", type=int, default=4)
    p.add_argument("--fengwu_ckpt", type=str, default=None)
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="warm-start VAE params from a bare-params checkpoint")
    p.add_argument("--no_resume", action="store_true",
                   help="ignore an existing checkpoint_latest in --out_dir")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh 'DP' or 'DPxSHxSW' (e.g. 8 or 2x2x2) "
                   "for data-parallel (+spatially sharded) training; "
                   "default: no mesh (single device)")
    p.add_argument("--out_dir", type=str, default="output/vae")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 compute (default on; --no-bf16 for f32)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="jax.checkpoint each block (default on: the batch-8 "
                   "step without it holds ~56 GiB of HLO temp — over one "
                   "v5e chip's HBM; --no-remat trades memory for speed on "
                   "big-HBM parts)")
    p.add_argument("--micro", action="store_true",
                   help="small model configs for fast CPU smoke runs")
    p.add_argument("--fast_init", action="store_true",
                   help="host-RNG random weights (skip the ~6 min init)")
    return p.parse_args()


def main():
    args = arg_parser()
    import os

    import jax
    import jax.numpy as jnp

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()

    from vaevar_tpu.parallel.mesh import init_distributed

    init_distributed()  # multihost no-op unless SLURM/coordinator env set

    from vaevar_tpu.config import (
        FLOW_140, VAE_DECODER, VAE_ENCODER, micro_config,
    )
    from vaevar_tpu.data.era5 import LocalNpyStore, SyntheticEra5
    from vaevar_tpu.data.nmc import NMCSequenceDataset, batched_loader
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.models.vae import VAE
    from vaevar_tpu.train import checkpoint as ckpt
    from vaevar_tpu.train.vae_trainer import train_vae
    from vaevar_tpu.utils.logger import get_logger

    hw = tuple(int(v) for v in args.grid.split("x"))
    dtype = jnp.bfloat16 if args.bf16 else None
    logger = get_logger("train_vae", args.out_dir)

    source = (
        LocalNpyStore(args.data_dir, hw) if args.data_dir
        else SyntheticEra5(hw=hw, seed=args.seed)
    )
    ds = NMCSequenceDataset(source, args.start_time, args.end_time, length=5)
    logger.info(f"dataset: {len(ds)} sequences")

    if args.micro:
        flow_cfg = micro_config(img_size=hw, attn_type="relbias", dtype=dtype)
        enc_cfg = flow_cfg.replace(outchans_list=(4, 12, 12, 12, 12, 12))
        dec_cfg = flow_cfg.replace(inchans_list=(2, 6, 6, 6, 6, 6),
                                   outchans_list=(4, 13, 13, 13, 13, 13))
    else:
        flow_cfg = FLOW_140.replace(img_size=hw, dtype=dtype,
                                    remat=args.remat)
        enc_cfg = VAE_ENCODER.replace(img_size=hw, dtype=dtype,
                                      remat=args.remat)
        dec_cfg = VAE_DECODER.replace(img_size=hw, dtype=dtype,
                                      remat=args.remat)
    flow = LGUnet(flow_cfg)
    if args.fengwu_ckpt:
        fengwu_params = ckpt.restore(args.fengwu_ckpt)
    elif args.fast_init:
        from vaevar_tpu.utils.fast_init import fast_init

        fengwu_params = fast_init(flow, jnp.zeros((1, 69, *hw)),
                                  seed=args.seed)
    else:
        fengwu_params = flow.init(jax.random.PRNGKey(args.seed),
                                  jnp.zeros((1, 69, *hw)))

    vae = VAE(enc_cfg, dec_cfg)

    mesh = None
    if args.mesh:
        from vaevar_tpu.parallel.mesh import mesh_from_arg

        mesh = mesh_from_arg(args.mesh)
        logger.info(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
                    f"over {jax.device_count()} devices "
                    f"({jax.process_count()} processes)")

    # streaming per-epoch loader: reshuffles each epoch, shards the sample
    # stream across hosts (DistributedSampler analogue)
    rank, world = jax.process_index(), jax.process_count()

    from vaevar_tpu.data.prefetch import prefetched

    def loader_factory(epoch: int):
        return prefetched(
            batched_loader(ds, args.batch_size, seed=args.seed,
                           epoch=epoch, rank=rank, world_size=world)
        )

    init_params = ckpt.restore(args.vae_ckpt) if args.vae_ckpt else None

    params, history = train_vae(
        vae,
        flow.apply,
        fengwu_params,
        loader_factory,
        epochs=args.epochs,
        sigma=args.sigma,
        lr=args.lr,
        latent_hw=hw,
        nmc_steps=args.nmc_steps,
        seed=args.seed,
        logger=logger.info,
        mesh=mesh,
        ckpt_dir=args.out_dir,
        resume=not args.no_resume,
        init_params=init_params,
    )
    if jax.process_index() == 0:
        os.makedirs(args.out_dir, exist_ok=True)
        # bare-params save too (the reference's raw VAE state_dict files)
        ckpt.save(os.path.join(args.out_dir, "vae_latest"), params)
        logger.info("saved VAE checkpoint")


if __name__ == "__main__":
    main()
