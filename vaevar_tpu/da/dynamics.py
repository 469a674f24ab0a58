"""Forecast integration operators (pure functions over model params).

Equivalent of the reference `cyclic_4dvar.integrate` (da_4dvar.py:666-681):
normalize -> N model steps keeping the mean half of the output -> denormalize,
with optional nearest-resize to/from the flow-model grid. The in-cost rollout
uses `lax.scan` with `jax.checkpoint` per step so reverse-mode AD through the
4D-Var window rematerializes instead of storing every activation.

Params are always explicit arguments (never closed over inside jit): closing
over weight constants makes XLA constant-fold every transposed weight matrix
in the backward pass, inflating compile time ~10x.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from vaevar_tpu import channels
from vaevar_tpu.ops.interp import resize_nearest


def make_integrate(model_apply: Callable, model_hw=None):
    """Returns integrate(params, x, steps, interpolation) on physical fields.

    model_apply(params, z) maps normalized (1, C, H, W) -> (1, >=C, H, W);
    only the first 69 output channels (the mean head) advance the state.
    x: (69, H, W) physical units. `interpolation` resizes to `model_hw`
    for the model and back (nearest, reference semantics da_4dvar.py:671-679).
    """
    mean = jnp.asarray(channels.MEAN, jnp.float32).reshape(-1, 1, 1)
    std = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def integrate(params, x, steps: int, interpolation: bool = False):
        hw = x.shape[-2:]
        z = ((x - mean) / std)[None]
        resize = (
            interpolation and model_hw is not None and tuple(hw) != tuple(model_hw)
        )
        if resize:
            z = resize_nearest(z, model_hw)

        def step(z, _):
            z = model_apply(params, z)[:, : channels.N_CHANNELS]
            return z, None

        if steps == 1:
            z, _ = step(z, None)
        elif steps > 1:
            z, _ = jax.lax.scan(jax.checkpoint(step), z, None, length=steps)

        if resize:
            z = resize_nearest(z, hw)
        return z[0] * std + mean

    return integrate


def rollout_window(x0, flow_step: Callable, da_win: int):
    """States at each of the `da_win` hourly slots: (da_win, 69, H, W).

    flow_step(x) advances one hour in physical units (params already bound
    to a traced value by the caller). Reverse-mode AD rematerializes steps.
    """
    if da_win == 1:
        return x0[None]

    def scan_step(x, _):
        x_next = flow_step(x)
        return x_next, x_next

    _, tail = jax.lax.scan(jax.checkpoint(scan_step), x0, None, length=da_win - 1)
    return jnp.concatenate([x0[None], tail], axis=0)
