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
                   help="resume VAE params")
    p.add_argument("--out_dir", type=str, default="output/vae")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
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

    from vaevar_tpu.config import FLOW_140, VAE_DECODER, VAE_ENCODER
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

    flow = LGUnet(FLOW_140.replace(img_size=hw, dtype=dtype))
    fengwu_params = (
        ckpt.restore(args.fengwu_ckpt) if args.fengwu_ckpt
        else flow.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 69, *hw)))
    )

    vae = VAE(
        VAE_ENCODER.replace(img_size=hw, dtype=dtype),
        VAE_DECODER.replace(img_size=hw, dtype=dtype),
    )

    loader = list(
        batched_loader(ds, args.batch_size, seed=args.seed)
    )
    params, history = train_vae(
        vae,
        flow.apply,
        fengwu_params,
        loader,
        epochs=args.epochs,
        sigma=args.sigma,
        lr=args.lr,
        latent_hw=hw,
        nmc_steps=args.nmc_steps,
        seed=args.seed,
        logger=logger.info,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt.save(os.path.join(args.out_dir, "vae_latest"), params)
    logger.info("saved VAE checkpoint")


if __name__ == "__main__":
    main()
