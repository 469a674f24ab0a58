"""Axial 2D rotary position embedding for windowed attention.

Matches the reference `rope2` (networks/utils/positional_encodings.py:230-268):
the head dim is split as [d1, d2, d1, d2] with d1 = (dim//2)//2 rotated by the
row coordinate and d2 = dim//2 - d1 rotated by the column coordinate; the
second half carries the 90-degree-phase partner channels. Tables are static
numpy constants closed over at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope2_tables(window_size, head_dim: int):
    """Precompute (sin1, cos1, sin2, cos2) each of shape (N, d_i)."""
    h, w = window_size
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, N)
    half = head_dim // 2
    d1 = half // 2
    d2 = half - d1
    inv1 = 10000.0 ** -(np.arange(d1) / d1)
    inv2 = 10000.0 ** -(np.arange(d2) / d2)
    s1 = coords[0][:, None] * inv1[None, :]  # (N, d1)
    s2 = coords[1][:, None] * inv2[None, :]  # (N, d2)
    return (
        np.sin(s1).astype(np.float32),
        np.cos(s1).astype(np.float32),
        np.sin(s2).astype(np.float32),
        np.cos(s2).astype(np.float32),
    )


def apply_rope2(x, tables):
    """Rotate last dim of x (..., N, head_dim) by position within the window."""
    sin1, cos1, sin2, cos2 = (jnp.asarray(t) for t in tables)
    d1 = sin1.shape[-1]
    d2 = sin2.shape[-1]
    x11 = x[..., :d1]
    x21 = x[..., d1 : d1 + d2]
    x12 = x[..., d1 + d2 : 2 * d1 + d2]
    x22 = x[..., 2 * d1 + d2 :]
    return jnp.concatenate(
        [
            x11 * cos1 - x12 * sin1,
            x21 * cos2 - x22 * sin2,
            x12 * cos1 + x11 * sin1,
            x22 * cos2 + x21 * sin2,
        ],
        axis=-1,
    )
