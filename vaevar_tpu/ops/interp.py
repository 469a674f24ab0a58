"""Resize and observation-level interpolation operators.

`resize_nearest` reproduces torch ``F.interpolate(mode='nearest')`` index
semantics (src = floor(dst * in/out)) because the reference uses default
(nearest) interpolation for *every* grid change in the DA engine:
integrate() 721x1440<->128x256 (da_4dvar.py:671,679), decoder_hr upsample
(nf_model/vae.py:90), CVT output upsample (da_4dvar.py:928), Q broadcast
(da_4dvar.py:545) and NMC error downsample (model/model.py:596). jax.image
uses half-pixel centers, which does NOT match, hence the explicit gather.

`obs_level_interp_matrix` builds the log-pressure linear interpolation
matrices between 13 model levels and `dim_out` observation levels
(reference obs_interpolater, da_4dvar.py:62-94).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vaevar_tpu.channels import N_LEVELS, N_SINGLE, PRESSURE_LEVELS


def _nearest_idx(n_out: int, n_in: int) -> np.ndarray:
    return np.minimum((np.arange(n_out) * n_in) // n_out, n_in - 1).astype(np.int32)


def resize_nearest(x, out_hw):
    """torch-nearest resize on the last two axes of x (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    hi = _nearest_idx(oh, H)
    wi = _nearest_idx(ow, W)
    return x[..., hi, :][..., wi]


def resize_bilinear(x, out_hw):
    """Bilinear resize, half-pixel centers (torch align_corners=False)."""
    import jax.image

    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x, out_shape, method="bilinear")


def obs_height_levels(dim_out: int = 40) -> np.ndarray:
    """Log-spaced observation pressure levels (reference da_4dvar.py:68)."""
    return np.round(np.exp(np.linspace(3.91202301, 6.90775528, dim_out)))


def obs_level_interp_matrix(dim_out: int = 40) -> np.ndarray:
    """(dim_out, 13) log-pressure linear interp from model to obs levels."""
    src = np.asarray(PRESSURE_LEVELS, dtype=np.float64)
    dst = obs_height_levels(dim_out)
    return _log_linear_matrix(dst, src)


def obs_level_interp_matrix_inv(dim_out: int = 40) -> np.ndarray:
    """(13, dim_out) log-pressure linear interp from obs back to model levels."""
    src = obs_height_levels(dim_out)
    dst = np.asarray(PRESSURE_LEVELS, dtype=np.float64)
    return _log_linear_matrix(dst, src)


def _log_linear_matrix(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    m = np.zeros((len(dst), len(src)))
    for i, d in enumerate(dst):
        for j in range(len(src)):
            if d == src[j]:
                m[i, j] = 1.0
            elif j + 1 < len(src) and src[j] < d < src[j + 1]:
                m[i, j] = (np.log(src[j + 1]) - np.log(d)) / (
                    np.log(src[j + 1]) - np.log(src[j])
                )
                m[i, j + 1] = (np.log(d) - np.log(src[j])) / (
                    np.log(src[j + 1]) - np.log(src[j])
                )
    return m.astype(np.float32)


def augment_levels(x, interp_matrix):
    """Map (..., 69, H, W) to (..., 4+5*dim_out, H, W) obs space.

    Applies the level-interp matrix to each of the 5 upper-air variable
    blocks; surface channels pass through (reference da_4dvar.py:770-776).
    """
    m = jnp.asarray(interp_matrix)  # (L_out, 13)
    parts = [x[..., :N_SINGLE, :, :]]
    for i in range(5):
        blk = x[..., N_SINGLE + i * N_LEVELS : N_SINGLE + (i + 1) * N_LEVELS, :, :]
        parts.append(jnp.einsum("lk,...khw->...lhw", m, blk))
    return jnp.concatenate(parts, axis=-3)
