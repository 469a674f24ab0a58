#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (.pth) to this framework's orbax trees.

A reference user holds torch state_dict files for the three model roles the
DA engine loads (da_4dvar.py:552-603): the 0.25deg forecast model (new-gen
``LGUnet_all_1``, wrapped as ``{"model": {"lgunet_all": sd}}``), the 1.4deg
flow model (old-gen ``LGUnet_all``, wrapped as ``{"model": sd}``), and the
VAE (bare ``VAE_lr`` state_dict). This CLI maps each onto the matching flax
parameter tree (:mod:`vaevar_tpu.utils.port_torch`) and saves it where the
``run_da.py`` knobs (``--forecast_ckpt`` / ``--flow_ckpt`` / ``--vae_ckpt``)
and the training CLIs' warm starts can restore it.

Examples:
  python scripts/convert_ckpt.py vae vae_ckpt_sigma2.pth out/vae_ported
  python scripts/convert_ckpt.py flow checkpoint_best.pth out/flow_ported \
      --config ../fengwu-lite/output/model/.../training_options.yaml
  python scripts/convert_ckpt.py forecast checkpoint_latest.pth out/fc_ported

Without ``--config`` the canonical architecture presets are assumed
(``FORECAST_025`` / ``FLOW_140`` / ``VAE_ENCODER``+``VAE_DECODER``); pass the
reference's ``training_options.yaml`` (forecast/flow) when the checkpoint was
trained with a non-default architecture.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lgunet_block_from_yaml(cfg: dict) -> dict:
    """Dig the lgunet params block out of a reference training_options.yaml.

    Both shipped layouts: the 0.25deg forecast yaml nests it at
    model.params.sub_model.lgunet_all (da_4dvar.py:555) and the flow yaml
    at model.network_params (:577)."""
    m = cfg.get("model", cfg)
    for path in (("params", "sub_model", "lgunet_all"), ("network_params",)):
        node = m
        for key in path:
            node = node.get(key) if isinstance(node, dict) else None
            if node is None:
                break
        if isinstance(node, dict) and "inchans_list" in node:
            return node
    raise SystemExit(
        "could not locate an lgunet params block in the yaml "
        "(expected model.params.sub_model.lgunet_all or "
        "model.network_params)"
    )


def convert(kind: str, state_dict: dict, cfg_yaml: dict | None = None,
            micro: bool = False):
    """state_dict (already unwrapped) -> flax params tree for ``kind``."""
    from vaevar_tpu import config as cfgs
    from vaevar_tpu.utils import port_torch

    if kind == "vae":
        # the VAE architecture is fixed by nf_model/parameters0_old.yaml
        if micro:
            enc_cfg, dec_cfg = cfgs.micro_vae_configs()
        else:
            enc_cfg, dec_cfg = cfgs.VAE_ENCODER, cfgs.VAE_DECODER
        return port_torch.vae_params_from_torch(state_dict, enc_cfg, dec_cfg)

    attn = "rope" if kind == "forecast" else "relbias"
    if cfg_yaml is not None:
        cfg = cfgs.LGUnetConfig.from_reference_dict(
            lgunet_block_from_yaml(cfg_yaml), attn_type=attn
        )
    elif micro:
        cfg = cfgs.micro_config(attn_type=attn)
    else:
        cfg = cfgs.FORECAST_025 if kind == "forecast" else cfgs.FLOW_140
    return port_torch.lgunet_params_from_torch(state_dict, cfg)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("kind", choices=["forecast", "flow", "vae"])
    p.add_argument("src", help="reference torch checkpoint (.pth)")
    p.add_argument("out", help="output orbax checkpoint directory")
    p.add_argument("--config", default=None,
                   help="reference training_options.yaml (forecast/flow "
                        "architectures; default: the canonical presets)")
    p.add_argument("--micro", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    import jax

    # conversion is pure host work — never touch (or wait for) an
    # accelerator backend (some environments pin JAX_PLATFORMS to a TPU
    # plugin, and an unreachable backend would hang the save)
    jax.config.update("jax_platforms", "cpu")

    import torch

    from vaevar_tpu.train import checkpoint as ckpt
    from vaevar_tpu.utils.port_torch import reference_state_dict

    cfg_yaml = None
    if args.config:
        import yaml

        with open(args.config) as f:
            cfg_yaml = yaml.safe_load(f)

    obj = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in reference_state_dict(obj).items()}
    tree = convert(args.kind, sd, cfg_yaml, micro=args.micro)
    ckpt.save(args.out, tree)
    n = sum(v.size for v in __import__("jax").tree_util.tree_leaves(tree))
    print(f"converted {args.kind}: {len(sd)} torch tensors -> "
          f"{args.out} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
