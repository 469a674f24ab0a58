"""Forecast integration operators (pure functions over model params).

Equivalent of the reference `cyclic_4dvar.integrate` (da_4dvar.py:666-681):
normalize -> N model steps keeping the mean half of the output -> denormalize,
with optional nearest-resize to/from the flow-model grid. The in-cost rollout
uses `lax.scan` with `jax.checkpoint` per step so reverse-mode AD through the
4D-Var window rematerializes instead of storing every activation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu import channels
from vaevar_tpu.ops.interp import resize_nearest


def make_integrate(model_apply: Callable, params, model_hw=None):
    """Returns integrate(x, steps, interpolation) over physical fields.

    model_apply(params, z) maps normalized (1, 69, H, W) -> (1, >=69, H, W);
    only the first 69 output channels (the mean head) advance the state.
    x: (69, H, W) physical units. `interpolation` resizes to `model_hw`
    for the model and back (nearest, reference semantics).
    """
    mean = jnp.asarray(channels.MEAN, jnp.float32).reshape(-1, 1, 1)
    std = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def integrate(x, steps: int, interpolation: bool = False):
        hw = x.shape[-2:]
        z = ((x - mean) / std)[None]
        if interpolation and model_hw is not None and tuple(hw) != tuple(model_hw):
            z = resize_nearest(z, model_hw)

        def step(z, _):
            z = model_apply(params, z)[:, : channels.N_CHANNELS]
            return z, None

        if steps == 1:
            z, _ = step(z, None)
        elif steps > 1:
            z, _ = jax.lax.scan(jax.checkpoint(step), z, None, length=steps)

        if interpolation and model_hw is not None and tuple(hw) != tuple(model_hw):
            z = resize_nearest(z, hw)
        return z[0] * std + mean

    return integrate


def rollout_window(x0, flow_step: Callable, da_win: int):
    """States at each of the `da_win` hourly slots: (da_win, 69, H, W).

    flow_step advances one hour in physical units (integrate with steps=1,
    interpolation=True). Reverse-mode AD rematerializes each step.
    """
    if da_win == 1:
        return x0[None]

    def scan_step(x, _):
        x_next = flow_step(x)
        return x_next, x_next

    _, tail = jax.lax.scan(jax.checkpoint(scan_step), x0, None, length=da_win - 1)
    return jnp.concatenate([x0[None], tail], axis=0)
