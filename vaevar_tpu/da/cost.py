"""Variational cost functions J(z) / J(w) as pure jitted functions.

vae4dvar (da_4dvar.py:1183-1208):
    x0 = xb + decoder_hr(z) * err_std * model_std
    J(z) = 1/2 ||z||^2 + obs_coeff * 1/2 sum_t H (M_t(x0) - yo)^2 / R

sc4dvar (da_4dvar.py:1064-1101):
    J(w) = 1/2 ||w||^2 + obs_coeff * Jo(B^1/2 w + xb)

Builders close over *static structure* only (apply fns, config). Everything
numeric travels as traced arguments: per-cycle data in an `ObsBundle`, model
weights in a `params` dict ({"decoder": ..., "flow": ...}). One jit
compilation therefore serves the entire cycled run AND weights never become
XLA constants (closure weights trigger pathological constant-folding of
transposes in the backward; measured ~10x compile-time inflation).

The window rollout M_t is the hourly flow model applied inside the cost with
rematerialized reverse-mode AD (da/dynamics.rollout_window). For "real" obs
the predicted state is augmented to the 204-channel observation-level space
before the innovation (da_4dvar.py:1196-1206).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from vaevar_tpu import channels
from vaevar_tpu.da.dynamics import make_integrate, rollout_window
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


def _window_predict(x0, flow_apply, flow_hw, da_win, params):
    if da_win == 1 or flow_apply is None:
        return x0[None]
    integrate = make_integrate(flow_apply, flow_hw)
    flow_params = params["flow"]

    def flow_step(x):
        return integrate(flow_params, x, 1, interpolation=True)

    return rollout_window(x0, flow_step, da_win)


def make_vae4dvar_cost(
    decoder_apply: Callable,
    flow_apply: Callable | None = None,
    flow_hw=(128, 256),
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
    err_std=None,
):
    """Returns (cost, decode_to_state, cost_parts): fns of (x, bundle, params).

    decoder_apply(params["decoder"], z) -> (1, 69, h', w') raw decoder output
    at the latent grid; nearest-upsampled to xb's grid, scaled by
    err_std*model_std and added to xb (da_4dvar.py:1185-1188).
    """
    err = jnp.asarray(
        channels.ERR_STD if err_std is None else err_std, jnp.float32
    ).reshape(-1, 1, 1)
    mstd = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def decode_to_state(z, bundle: ObsBundle, params):
        d = decoder_apply(params["decoder"], z)[0]  # (69, h', w')
        d = resize_nearest(d, bundle.xb.shape[-2:])
        return bundle.xb + d * err * mstd

    def _predict(z, bundle, params):
        x0 = decode_to_state(z, bundle, params)
        return _window_predict(x0, flow_apply, flow_hw, da_win, params)

    def cost(z, bundle: ObsBundle, params):
        return 0.5 * jnp.sum(z**2) + obs_coeff * obs_term(
            _predict(z, bundle, params), bundle, interp_matrix
        )

    def cost_parts(z, bundle: ObsBundle, params):
        return 0.5 * jnp.sum(z**2), obs_term(
            _predict(z, bundle, params), bundle, interp_matrix
        )

    return cost, decode_to_state, cost_parts


def make_sc4dvar_cost(
    transform: Callable,
    flow_apply: Callable | None = None,
    flow_hw=(128, 256),
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
):
    """Returns (cost, to_state, cost_parts): fns of (w, bundle, params).

    `transform` is the CVT B^1/2 (static linear tables, no trainable params,
    so closing over them is fine — they are never transposed in matmuls)."""

    def to_state(w, bundle: ObsBundle, params):
        del params
        return transform(w, bundle.xb)

    def _predict(w, bundle, params):
        x0 = to_state(w, bundle, params)
        return _window_predict(x0, flow_apply, flow_hw, da_win, params)

    def cost(w, bundle: ObsBundle, params):
        return 0.5 * jnp.sum(w**2) + obs_coeff * obs_term(
            _predict(w, bundle, params), bundle, interp_matrix
        )

    def cost_parts(w, bundle: ObsBundle, params):
        return 0.5 * jnp.sum(w**2), obs_term(
            _predict(w, bundle, params), bundle, interp_matrix
        )

    return cost, to_state, cost_parts
