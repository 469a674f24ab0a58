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
