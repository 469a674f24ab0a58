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


def weighted_anomaly(pred, target, region: str = "all"):
    """Lat-weighted anomaly pattern correlation. (B,C,H,W) -> (C,).

    Replicates the reference exactly, INCLUDING its quirk that the
    numerator is a scalar mean over all dims while the denominator is
    per-channel (type_weighted_anomaly_torch_channels,
    utils/metrics.py:118-133)."""
    w, sl = lat_weights(pred.shape[2], region)
    w = jnp.asarray(w).reshape(1, 1, -1, 1)
    p, t = pred[:, :, sl], target[:, :, sl]
    pa = p - jnp.mean(w * p, axis=(-1, -2), keepdims=True)
    ta = t - jnp.mean(w * t, axis=(-1, -2), keepdims=True)
    nume = jnp.mean(w * pa * ta)  # scalar — reference quirk
    deno = jnp.sqrt(jnp.mean(w * pa**2, axis=(-1, -2))) * jnp.sqrt(
        jnp.mean(w * ta**2, axis=(-1, -2))
    )
    return jnp.mean(nume / deno, axis=0)


class Metrics:
    """Reference-compatible facade (utils/metrics.py:363-600): method per
    metric name, signature (pred, gt, data_mask, clim_time_mean_daily,
    data_std); normalized fields in, physical units out for WRMSE/Bias/
    Activity. N/S/T prefixes = northern/southern/tropics bands."""

    def __init__(self, epsilon: float = 1e-8, **kwargs):
        self.epsilon = epsilon

    # --- unweighted ---
    def MSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return float(jnp.mean((pred - gt) ** 2))

    def Channel_MSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return jnp.mean((pred - gt) ** 2, axis=(0, 2, 3))

    def Position_MSE(self, pred, gt, data_mask=None, clim=None,
                     data_std=None):
        return jnp.mean((pred - gt) ** 2, axis=(0, 1)).reshape(-1)

    def RMSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        # reference quirk: mean over dims (1, 2) then sqrt (metrics.py:416)
        return float(jnp.mean(jnp.sqrt(jnp.mean((pred - gt) ** 2,
                                                axis=(1, 2)))))

    def MAE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return float(jnp.mean(jnp.abs(pred - gt)))

    # --- lat-weighted, physical units ---
    def WRMSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_rmse(pred, gt) * s

    def NWRMSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_rmse(pred, gt, "northern") * s

    def SWRMSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_rmse(pred, gt, "southern") * s

    def TWRMSE(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_rmse(pred, gt, "tropics") * s

    def Bias(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_bias(pred - gt) * s

    def NBias(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_bias(pred - gt, "northern") * s

    def SBias(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_bias(pred - gt, "southern") * s

    def TBias(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_bias(pred - gt, "tropics") * s

    def Activity(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_activity(pred - clim) * s

    def NActivity(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_activity(pred - clim, "northern") * s

    def SActivity(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_activity(pred - clim, "southern") * s

    def TActivity(self, pred, gt, data_mask=None, clim=None, data_std=None):
        s = 1.0 if data_std is None else jnp.asarray(data_std)
        return weighted_activity(pred - clim, "tropics") * s

    # --- correlations (dimensionless) ---
    def WACC(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_acc(pred - clim, gt - clim)

    def NWACC(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_acc(pred - clim, gt - clim, "northern")

    def SWACC(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_acc(pred - clim, gt - clim, "southern")

    def TWACC(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_acc(pred - clim, gt - clim, "tropics")

    def Anomaly(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_anomaly(pred - clim, gt - clim)

    def NAnomaly(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_anomaly(pred - clim, gt - clim, "northern")

    def SAnomaly(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_anomaly(pred - clim, gt - clim, "southern")

    def TAnomaly(self, pred, gt, data_mask=None, clim=None, data_std=None):
        return weighted_anomaly(pred - clim, gt - clim, "tropics")


class MetricsRecorder:
    """Reference MetricsRecorder (utils/metrics.py:602-663): configured
    with metric-name strings, `evaluate_batch` expands per-channel arrays
    into `{name + str(channel): scalar}` entries."""

    def __init__(self, metrics_list, epsilon: float = 1e-7, **kwargs):
        self.epsilon = epsilon
        self.metrics = Metrics(epsilon=epsilon)
        self.metric_str_list = list(metrics_list)
        self.metrics_list = []
        for name in metrics_list:
            try:
                fn = getattr(self.metrics, name)
            except AttributeError:
                raise NotImplementedError("Invalid metric type.")
            self.metrics_list.append((name, fn))

    def evaluate_batch(self, data_dict):
        pred = data_dict["pred"]
        gt = data_dict["gt"]
        clim = data_dict.get("clim_mean")
        data_std = data_dict.get("std")
        losses = {}
        for name, fn in self.metrics_list:
            val = fn(pred, gt, None, clim, data_std)
            if isinstance(val, (float, int)):
                losses[name] = float(val)
            else:
                arr = np.asarray(val).reshape(-1)
                for i, v in enumerate(arr):
                    losses[name + str(i)] = float(v)
        return losses
