"""Windowing primitives for shifted-window attention (channel-last layout).

Equivalent behavior to the reference `window_partition` / `window_reverse`
(networks/utils/utils.py:82-132) plus a numpy builder for the Swin shift
attention mask reproducing the reference's longitude-periodic quirk: the
reference's `w_slices` end with `slice(0, None)` which overwrites the whole
longitude range, so the mask only compartmentalizes latitude regions
(networks/utils/Attention.py:500-563, networks_old/utils/swinblock.py:236-258).
Window geometry is static, so masks are baked as numpy constants at trace
time — no device work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_partition(x, window_size):
    """(B, H, W, C) -> (B*nWin, wh*ww, C). wh|H and ww|W must hold."""
    B, H, W, C = x.shape
    wh, ww = window_size
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(windows, window_size, H, W):
    """(B*nWin, wh*ww, C) -> (B, H, W, C)."""
    wh, ww = window_size
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // wh) * (W // ww))
    x = windows.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def shift2d(x, shift_h: int, shift_w: int):
    """Cyclic shift on (B, H, W, C); negative = forward Swin shift."""
    if shift_h == 0 and shift_w == 0:
        return x
    return jnp.roll(x, shift=(shift_h, shift_w), axis=(1, 2))


def swin_attention_mask(
    H: int, W: int, window_size, shift_size, neg: float = -np.inf
) -> np.ndarray | None:
    """Static Swin SW-MSA mask, or None when no mask is needed.

    Returns (nWin, N, N) additive mask (0 / `neg`). Latitude-only
    compartmentalization (longitude treated as periodic), matching the
    reference exactly. Mask is None when shift is zero or the window spans
    the full longitude (reference Attention.py:580-583).
    """
    wh, ww = window_size
    sh, sw = shift_size
    if sw == 0 and sh == 0:
        return None
    if ww == W:
        return None
    # Region labels vary only along H; the last w-slice in the reference
    # overwrites the full row, so each h-region holds one label.
    img = np.zeros((H, W), dtype=np.float64)
    h_slices = (slice(0, H - wh), slice(H - wh, H - sh), slice(H - sh, H))
    for i, hs in enumerate(h_slices):
        img[hs, :] = 3 * i + 2  # label value irrelevant; only (in)equality matters
    img = img[None, :, :, None]  # (1, H, W, 1)
    wins = np.reshape(
        np.transpose(
            img.reshape(1, H // wh, wh, W // ww, ww, 1), (0, 1, 3, 2, 4, 5)
        ),
        (-1, wh * ww),
    )
    mask = wins[:, None, :] - wins[:, :, None]
    out = np.where(mask != 0, neg, 0.0).astype(np.float32)
    return out
