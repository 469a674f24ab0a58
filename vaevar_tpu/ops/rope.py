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


def rope3_tables(shape, head_dim: int):
    """Axial 3D rotary tables, reference rope3
    (networks/utils/positional_encodings.py:272-316): head dim split
    [d12, d12, d3, d12, d12, d3] with d12 = (dim//2)//3 rotated by the
    first two coordinates and d3 = dim//2 - 2*d12 by the third."""
    t, h, w = shape
    coords = np.stack(
        np.meshgrid(np.arange(t), np.arange(h), np.arange(w), indexing="ij")
    ).reshape(3, -1)
    half = head_dim // 2
    d12 = half // 3
    d3 = half - 2 * d12
    inv12 = 10000.0 ** -(np.arange(d12) / d12)
    inv3 = 10000.0 ** -(np.arange(d3) / d3)
    mk = lambda c, inv: c[:, None] * inv[None, :]
    s1, s2, s3 = mk(coords[0], inv12), mk(coords[1], inv12), mk(coords[2], inv3)
    f = lambda a: a.astype(np.float32)
    return (
        f(np.sin(s1)), f(np.cos(s1)),
        f(np.sin(s2)), f(np.cos(s2)),
        f(np.sin(s3)), f(np.cos(s3)),
    )


def apply_rope3(x, tables):
    """Rotate last dim of x (..., N, head_dim) by 3D position."""
    sin1, cos1, sin2, cos2, sin3, cos3 = (jnp.asarray(t) for t in tables)
    d12 = sin1.shape[-1]
    d3 = sin3.shape[-1]
    half = 2 * d12 + d3
    x11 = x[..., :d12]
    x21 = x[..., d12 : 2 * d12]
    x31 = x[..., 2 * d12 : half]
    x12 = x[..., half : half + d12]
    x22 = x[..., half + d12 : half + 2 * d12]
    x32 = x[..., half + 2 * d12 :]
    return jnp.concatenate(
        [
            x11 * cos1 - x12 * sin1,
            x21 * cos2 - x22 * sin2,
            x31 * cos3 - x32 * sin3,
            x12 * cos1 + x11 * sin1,
            x22 * cos2 + x21 * sin2,
            x32 * cos3 + x31 * sin3,
        ],
        axis=-1,
    )
