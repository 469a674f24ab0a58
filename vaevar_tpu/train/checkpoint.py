"""Checkpoint save/restore (orbax) for training and DA state.

Replaces the reference's torch .pth checkpoints (model/model.py:313-382):
stores params/opt_state/step as an orbax PyTree with `latest`/`best`
aliases; bare-params saves cover the reference's raw VAE state_dict files.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path: str, tree) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore(path: str, target=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=target)


def exists(path: str) -> bool:
    return os.path.isdir(path)


# --- full training state (params + optimizer + progress) --------------------
#
# Mirrors the reference's checkpoint dicts (model/model.py:313-382):
# {model, optimizer, epoch, metric_best} written as checkpoint_latest and,
# when the validation metric improves, checkpoint_best. The array pytrees go
# through orbax; the scalars ride a JSON sidecar so restore needs no pytree
# target for them.


def save_train_state(
    out_dir: str,
    params,
    opt_state,
    epoch: int,
    step: int = 0,
    metric_best: float | None = None,
    alias: str = "checkpoint_latest",
) -> str:
    import json

    path = os.path.join(os.path.abspath(out_dir), alias)
    # pull to host first: replicated arrays are fully addressable on every
    # process, so a rank-0-only save works even multihost
    tree = jax.device_get({"params": params, "opt_state": opt_state})
    save(path, tree)
    meta = {"epoch": int(epoch), "step": int(step)}
    if metric_best is not None:
        meta["metric_best"] = float(metric_best)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def restore_train_state(
    out_dir: str,
    params_target=None,
    opt_state_target=None,
    alias: str = "checkpoint_latest",
):
    """Returns (params, opt_state, meta_dict) or None if absent.

    Pass freshly-initialized (params, opt_state) as targets so optax's
    NamedTuple state restores with the right tree structure."""
    import json

    path = os.path.join(os.path.abspath(out_dir), alias)
    if not exists(path):
        return None
    target = None
    if params_target is not None:
        target = {"params": params_target, "opt_state": opt_state_target}
    tree = restore(path, target=target)
    meta = {"epoch": 0, "step": 0}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta.update(json.load(f))
    return tree["params"], tree["opt_state"], meta


def vae_decoder_params(tree):
    """Decoder-only LGUnet params from a VAE checkpoint tree.

    Accepts either a full :class:`~vaevar_tpu.models.vae.VAE` tree
    (``{"params": {"enc": ..., "dec": ...}}`` — what ``run_train_vae.py``
    saves as ``vae_latest`` and what ``port_torch.vae_params_from_torch``
    emits, mirroring the reference's whole-``VAE_lr`` state_dict files,
    da_4dvar.py:590-603) or an already-extracted decoder tree; the DA
    engine only ever runs the decoder (da_4dvar.py:1186)."""
    p = tree.get("params", tree) if isinstance(tree, dict) else tree
    if isinstance(p, dict) and "enc" in p and "dec" in p:
        return {"params": p["dec"]}
    return tree
