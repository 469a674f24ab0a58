"""Variational cost functions J(z) / J(w) as pure jitted functions.

vae4dvar (da_4dvar.py:1183-1208):
    x0 = xb + decoder_hr(z) * err_std * model_std
    J(z) = 1/2 ||z||^2 + obs_coeff * 1/2 sum_t H (M_t(x0) - yo)^2 / R

sc4dvar (da_4dvar.py:1064-1101):
    J(w) = 1/2 ||w||^2 + obs_coeff * Jo(B^1/2 w + xb)

The builders close over *static* objects only (model params, config);
per-cycle data (xb, yo, H, R) travels in an `ObsBundle` argument, so one
jit compilation serves the entire cycled run. The window rollout M_t is
the hourly flow model applied inside the cost with rematerialized
reverse-mode AD (da/dynamics.rollout_window). For "real" obs the predicted
state is augmented to the 204-channel observation-level space before the
innovation (da_4dvar.py:1196-1206).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from vaevar_tpu import channels
from vaevar_tpu.da.dynamics import rollout_window
from vaevar_tpu.ops.interp import augment_levels, resize_nearest


class ObsBundle(NamedTuple):
    """Per-cycle data: background + observations (all device arrays)."""

    xb: jnp.ndarray  # (69, H, W)
    yo: jnp.ndarray  # (T, C_obs, H, W)
    H: jnp.ndarray  # (T, C_obs, H, W)
    R: jnp.ndarray  # (T, C_obs, H, W)


def obs_term(x_pred, bundle: ObsBundle, interp_matrix=None):
    """1/2 sum H (x_pred - yo)^2 / R with optional level augmentation."""
    if interp_matrix is not None:
        x_pred = augment_levels(x_pred, interp_matrix)
    return 0.5 * jnp.sum(bundle.H * (x_pred - bundle.yo) ** 2 / bundle.R)


def make_vae4dvar_cost(
    decoder_apply: Callable,
    vae_params,
    flow_step: Callable | None = None,
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
    err_std=None,
):
    """Returns (cost, decode_to_state, cost_parts), each (x, bundle) -> ...

    decoder_apply(params, z) -> (1, 69, h', w') raw decoder output at the
    latent grid; it is nearest-upsampled to xb's grid, scaled by
    err_std*model_std and added to xb (da_4dvar.py:1185-1188).
    """
    err = jnp.asarray(
        channels.ERR_STD if err_std is None else err_std, jnp.float32
    ).reshape(-1, 1, 1)
    mstd = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def decode_to_state(z, bundle: ObsBundle):
        d = decoder_apply(vae_params, z)[0]  # (69, h', w')
        d = resize_nearest(d, bundle.xb.shape[-2:])
        return bundle.xb + d * err * mstd

    def _predict(z, bundle):
        x0 = decode_to_state(z, bundle)
        if da_win > 1:
            return rollout_window(x0, flow_step, da_win)
        return x0[None]

    def cost(z, bundle: ObsBundle):
        return 0.5 * jnp.sum(z**2) + obs_coeff * obs_term(
            _predict(z, bundle), bundle, interp_matrix
        )

    def cost_parts(z, bundle: ObsBundle):
        return 0.5 * jnp.sum(z**2), obs_term(_predict(z, bundle), bundle,
                                             interp_matrix)

    return cost, decode_to_state, cost_parts


def make_sc4dvar_cost(
    transform: Callable,
    flow_step: Callable | None = None,
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
):
    """Returns (cost, to_state, cost_parts), each (w, bundle) -> ..."""

    def to_state(w, bundle: ObsBundle):
        return transform(w, bundle.xb)

    def _predict(w, bundle):
        x0 = to_state(w, bundle)
        if da_win > 1:
            return rollout_window(x0, flow_step, da_win)
        return x0[None]

    def cost(w, bundle: ObsBundle):
        return 0.5 * jnp.sum(w**2) + obs_coeff * obs_term(
            _predict(w, bundle), bundle, interp_matrix
        )

    def cost_parts(w, bundle: ObsBundle):
        return 0.5 * jnp.sum(w**2), obs_term(_predict(w, bundle), bundle,
                                             interp_matrix)

    return cost, to_state, cost_parts
