"""Latitude-weighted evaluation metrics (JAX).

Numerically matches the reference metric library (utils/metrics.py in the
reference repo): the same degree->radian constant 3.1416 (not pi), the same
region index rounding (northern = int(110/180*nlat+0.5) etc.), and the same
"normalized in, physical out" convention — WRMSE/Bias take normalized fields
and multiply the result by the per-channel data std
(reference utils/metrics.py:223-255,473-484,526-544).

All functions take (B, C, H, W) arrays and return per-channel values (C,)
averaged over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_DEG = 3.1416 / 180.0  # reference uses 3.1416, keep bit-compatible semantics


def _lat_deg(num_lat: int) -> np.ndarray:
    j = np.arange(num_lat, dtype=np.float64)
    return 90.0 - j * 180.0 / (num_lat - 1)


def lat_weights(num_lat: int, region: str = "all") -> tuple[np.ndarray, slice]:
    """cos(lat) weights normalized to mean 1 over the region, plus row slice.

    Matches reference latitude_weighting_factor_torch /
    weighted_latitude_weighting_factor_torch (utils/metrics.py:8-13) exactly,
    including the quirk that regional weights are scaled by `souther_index`
    (or the region length) rather than the region's own row count.
    """
    coslat = np.cos(_DEG * _lat_deg(num_lat))
    n_idx = int(110.0 / 180.0 * num_lat + 0.5)
    s_idx = int(70.0 / 180.0 * num_lat + 0.5)
    if region == "all":
        sl = slice(None)
        scale = num_lat
    elif region == "northern":
        sl = slice(n_idx, None)
        scale = s_idx
    elif region == "southern":
        sl = slice(None, s_idx)
        scale = s_idx
    elif region == "tropics":
        sl = slice(s_idx, n_idx)
        scale = n_idx - s_idx
    else:
        raise ValueError(region)
    w = coslat[sl]
    w = scale * w / w.sum()
    return w.astype(np.float32), sl


def weighted_rmse(pred, target, region: str = "all"):
    """Latitude-weighted RMSE per channel, batch-averaged. (B,C,H,W) -> (C,)."""
    w, sl = lat_weights(pred.shape[2], region)
    w = jnp.asarray(w).reshape(1, 1, -1, 1)
    se = w * (pred[:, :, sl] - target[:, :, sl]) ** 2
    return jnp.mean(jnp.sqrt(jnp.mean(se, axis=(-1, -2))), axis=0)


def weighted_bias(diff, region: str = "all"):
    """Latitude-weighted mean of `diff` per channel. (B,C,H,W) -> (C,)."""
    w, sl = lat_weights(diff.shape[2], region)
    w = jnp.asarray(w).reshape(1, 1, -1, 1)
    return jnp.mean(jnp.mean(w * diff[:, :, sl], axis=(-1, -2)), axis=0)


def weighted_acc(pred, target, region: str = "all"):
    """Latitude-weighted anomaly correlation per channel. (B,C,H,W) -> (C,)."""
    w, sl = lat_weights(pred.shape[2], region)
    w = jnp.asarray(w).reshape(1, 1, -1, 1)
    p, t = pred[:, :, sl], target[:, :, sl]
    num = jnp.sum(w * p * t, axis=(-1, -2))
    den = jnp.sqrt(jnp.sum(w * p * p, axis=(-1, -2)) * jnp.sum(w * t * t, axis=(-1, -2)))
    return jnp.mean(num / den, axis=0)


def weighted_activity(pred, region: str = "all"):
    """Lat-weighted std of `pred` about its weighted mean. (B,C,H,W) -> (C,)."""
    w, sl = lat_weights(pred.shape[2], region)
    w = jnp.asarray(w).reshape(1, 1, -1, 1)
    p = pred[:, :, sl]
    mean = jnp.mean(w * p, axis=(-1, -2), keepdims=True)
    return jnp.mean(jnp.sqrt(jnp.mean(w * (p - mean) ** 2, axis=(-1, -2))), axis=0)


class Metrics:
    """Reference-compatible facade: normalized fields in, physical units out."""

    def WRMSE(self, pred, gt, data_std, region: str = "all"):
        return weighted_rmse(pred, gt, region) * jnp.asarray(data_std)

    def Bias(self, pred, gt, data_std, region: str = "all"):
        return weighted_bias(pred - gt, region) * jnp.asarray(data_std)

    def ACC(self, pred, gt, clim_mean, region: str = "all"):
        return weighted_acc(pred - clim_mean, gt - clim_mean, region)

    def Activity(self, pred, clim_mean, data_std, region: str = "all"):
        return weighted_activity(pred - clim_mean, region) * jnp.asarray(data_std)

    def MSE(self, pred, gt):
        return jnp.mean((pred - gt) ** 2)
