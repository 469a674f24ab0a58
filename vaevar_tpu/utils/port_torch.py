"""Port reference PyTorch LGUnet_all_1 checkpoints to flax LGUnet params.

The reference distributes weights as torch ``state_dict`` files keyed by the
module tree of ``networks/LGUnet_all.py:742-777`` (``enc.enc_list.{g}...``,
``net.layers...``, ``dec.dec_list.{g}...``). This converter maps them onto
this framework's :class:`~vaevar_tpu.models.lgunet.LGUnet` parameter tree,
which differs structurally in three TPU-motivated ways:

- linear/conv kernels are stored input-major (flax) instead of output-major
  (torch) — transposed here;
- the 5 identical upper-air variable groups are a single ``nn.vmap`` module
  (``enc_gs``/``dec_gs``) — per-group torch tensors are stacked on a new
  leading axis;
- block stacks are ``nn.scan`` bodies — per-depth torch tensors are stacked
  on the scan axis (pairwise for shifted stacks: blocks 0,2,4.. feed
  ``b0``, blocks 1,3,5.. feed ``b1``); stacks of one body are stored flat.

Both backbone generations are covered, selected by ``cfg.attn_type``:
"rope" reads new-gen ``LGUnet_all_1`` checkpoints (the 0.25deg forecast
model), "relbias" reads old-gen ``LGUnet_all`` checkpoints incl. LoRA
adapters (the 1.4deg flow model and both VAE halves;
``vae_params_from_torch`` handles the ``VAE_lr`` wrapper). Input tensors
may be numpy arrays or anything ``np.asarray`` accepts (load torch .pth
with ``torch.load(..., map_location="cpu")`` and pass ``{k: v.numpy()}``).
"""

from __future__ import annotations

import numpy as np

from vaevar_tpu.config import LGUnetConfig


def _t(w):  # torch Linear weight (out, in) -> flax kernel (in, out)
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _convT(w):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).

    flax's ConvTranspose (transpose_kernel=False) runs a fractionally-
    strided correlation, so the torch kernel must be flipped spatially."""
    return np.ascontiguousarray(
        np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1]
    )


def _ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def _linear(sd, p, bias=True):
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _block(sd, p, gen="new"):
    """torch block -> flax Block tree.

    gen="new": Windowattn_block (Blocks.py:103-159, norm/norm2, RoPE attn).
    gen="old": SwinTransformerBlock (networks_old/utils/swinblock.py:189-309,
    norm1/norm2, rel-pos-bias table, optional LoRA qA/qB)."""
    n1 = f"{p}.norm" if gen == "new" else f"{p}.norm1"
    attn = {
        "qkv": _linear(sd, f"{p}.attn.qkv"),
        "proj": _linear(sd, f"{p}.attn.proj"),
    }
    if gen == "old":
        attn["rel_bias_table"] = np.asarray(
            sd[f"{p}.attn.relative_position_bias_table"]
        )
        if f"{p}.attn.qA.weight" in sd:
            attn["qA"] = _linear(sd, f"{p}.attn.qA", bias=False)
            attn["qB"] = _linear(sd, f"{p}.attn.qB", bias=False)
    return {
        "norm1": _ln(sd, n1),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn": attn,
        "mlp": {
            "fc1": _linear(sd, f"{p}.mlp.fc1"),
            "fc2": _linear(sd, f"{p}.mlp.fc2"),
        },
    }


def _stack_trees(trees):
    """Stack identical trees along a new leading axis."""
    return _tree_multimap(lambda *xs: np.stack(xs, axis=0), trees)


def _tree_multimap(fn, trees):
    t0 = trees[0]
    if isinstance(t0, dict):
        return {k: _tree_multimap(fn, [t[k] for t in trees]) for k in t0}
    return fn(*trees)


def _block_stack(sd, prefix, depth, shifted, gen="new"):
    """torch blocks.{j} -> flax BlockStack {"scan": ...} (lgunet.BlockStack)."""
    blocks = [_block(sd, f"{prefix}.{j}", gen) for j in range(depth)]
    if not shifted:
        body = blocks[0] if depth == 1 else _stack_trees(blocks)
        return {"scan": {"b": body}}
    if depth % 2:  # odd shifted depth: flat blk{i} modules
        return {f"blk{j}": blocks[j] for j in range(depth)}
    if depth == 2:
        return {"scan": {"b0": blocks[0], "b1": blocks[1]}}
    return {"scan": {
        "b0": _stack_trees(blocks[0::2]),
        "b1": _stack_trees(blocks[1::2]),
    }}


def _group_encoder(sd, g, cfg: LGUnetConfig, gen="new", prefix=""):
    p = f"{prefix}enc.enc_list.{g}"
    pr = cfg.patches_resolution
    out = {
        "patch_embed": {
            "kernel": _conv(sd[f"{p}.patch_embed.proj.weight"]),
            "bias": np.asarray(sd[f"{p}.patch_embed.proj.bias"]),
        },
        "pos_embed": np.asarray(sd[f"{p}.absolute_pos_embed"]).reshape(
            1, pr[0], pr[1], -1
        ),
        "norm": _ln(sd, f"{p}.norm"),
    }
    for i in range(len(cfg.enc_depths)):
        out[f"enc{i}"] = _block_stack(
            sd, f"{p}.layers.{i}.blocks", cfg.enc_depths[i], shifted=True,
            gen=gen,
        )
        if i > 0:
            out[f"merge{i}"] = {
                "norm": _ln(sd, f"{p}.layers.{i}.downsample.norm"),
                "reduction": {
                    "kernel": _t(sd[f"{p}.layers.{i}.downsample.reduction.weight"])
                },
            }
    return out


def _group_decoder(sd, g, cfg: LGUnetConfig, gen="new", prefix=""):
    p = f"{prefix}dec.dec_list.{g}"
    L = len(cfg.enc_depths)
    out = {"norm_up": _ln(sd, f"{p}.norm_up")}
    for i in range(L):
        out[f"concat_back{i}"] = _linear(sd, f"{p}.concat_back_dim.{i}")
        out[f"dec{i}"] = _block_stack(
            sd, f"{p}.layers_up.{i}.blocks", cfg.enc_depths[L - 1 - i],
            shifted=True, gen=gen,
        )
        if i < L - 1:
            out[f"expand{i}"] = {
                "expand": {
                    "kernel": _t(sd[f"{p}.layers_up.{i}.upsample.expand.weight"])
                },
                "norm": _ln(sd, f"{p}.layers_up.{i}.upsample.norm"),
            }
    out["head"] = {
        "kernel": _convT(sd[f"{prefix}dec.final_proj_list.{g}.weight"]),
        "bias": np.asarray(sd[f"{prefix}dec.final_proj_list.{g}.bias"]),
    }
    return out


def lgunet_params_from_torch(state_dict, cfg: LGUnetConfig, prefix: str = ""):
    """Full conversion: reference state_dict -> flax params.

    Covers both generations, selected by ``cfg.attn_type``: "rope" reads a
    new-gen ``LGUnet_all_1`` tree (networks/LGUnet_all.py:742), "relbias"
    an old-gen ``LGUnet_all`` tree (networks_old/transformer.py:716, incl.
    LoRA adapters when present). ``prefix`` addresses nested submodules
    (e.g. "enc." / "dec." inside a VAE_lr checkpoint)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not prefix or k.startswith(prefix)}
    gen = "old" if cfg.attn_type == "relbias" else "new"
    G = cfg.n_groups
    Hg, Wg = cfg.lg_resolution

    params = {
        "enc_proj": _linear(sd, f"{prefix}enc.proj"),
        "dec_proj": _linear(sd, f"{prefix}dec.proj"),
        "lg": {"pos_embed": np.asarray(sd[f"{prefix}net.pos_embed"]).reshape(
            1, Hg, Wg, -1
        )},
    }
    full0 = cfg.lg_full_attn_first
    for i, depth in enumerate(cfg.lg_depths):
        params["lg"][f"lg{i}"] = _block_stack(
            sd, f"{prefix}net.layers.{i}.blocks", depth,
            shifted=not (full0 and i == 0), gen=gen,
        )

    params["enc_g0"] = _group_encoder(sd, 0, cfg, gen, prefix)
    params["dec_g0"] = _group_decoder(sd, 0, cfg, gen, prefix)

    uniform = G > 2 and len(set(cfg.inchans_list[1:])) == 1 and len(
        set(cfg.outchans_list[1:])
    ) == 1
    if uniform:
        params["enc_gs"] = _stack_trees(
            [_group_encoder(sd, g, cfg, gen, prefix) for g in range(1, G)]
        )
        params["dec_gs"] = _stack_trees(
            [_group_decoder(sd, g, cfg, gen, prefix) for g in range(1, G)]
        )
    else:
        for g in range(1, G):
            params[f"enc_g{g}"] = _group_encoder(sd, g, cfg, gen, prefix)
            params[f"dec_g{g}"] = _group_decoder(sd, g, cfg, gen, prefix)

    return {"params": params}


def vae_params_from_torch(state_dict, enc_cfg: LGUnetConfig,
                          dec_cfg: LGUnetConfig):
    """Reference ``VAE_lr`` state_dict (nf_model/vae.py:53-70: two old-gen
    LGUnets under ``enc.``/``dec.``) -> flax VAE params."""
    enc = lgunet_params_from_torch(state_dict, enc_cfg, prefix="enc.")
    dec = lgunet_params_from_torch(state_dict, dec_cfg, prefix="dec.")
    return {"params": {"enc": enc["params"], "dec": dec["params"]}}


def reference_state_dict(obj) -> dict:
    """Normalize a loaded reference ``.pth`` object to a flat state_dict.

    Mirrors the reference's own loading quirks (da_4dvar.py:552-603):
    training checkpoints wrap the weights as ``{"model": sd}`` (flow,
    :576) or ``{"model": {"lgunet_all": sd}}`` (forecast, :557) while VAE
    files are bare state_dicts (:592); DDP-saved trees carry a
    ``module.`` key prefix (stripped, :560-562,579-581,595-597); the
    trainer's ``max_logvar``/``min_logvar`` buffers are dropped
    (:564,583,599)."""
    sd = obj
    for key in ("model", "lgunet_all"):
        if isinstance(sd, dict) and isinstance(sd.get(key), dict):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k in ("max_logvar", "min_logvar"):
            continue
        out[k] = v
    return out
