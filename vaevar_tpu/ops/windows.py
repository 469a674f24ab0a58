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


def sd_attention_mask(
    grid, window_size, shift_size, dilated_size=None, neg: float = -np.inf
) -> np.ndarray | None:
    """Static SW-MSA mask for SD_attn's full parameter surface: 2-D or 3-D
    windows and dilated token groups (Attention.py:500-569).

    Returns (nGroups, N, N) additive mask with nGroups = nWin_total *
    prod(dilated) and N = prod(window_size), group order (window-raster,
    dilated-offset-raster) matching SD_attn's batch regrouping
    (Attention.py:543-556,600-609); or None when the reference builds no
    mask (lon shift zero, or the total window spans the full longitude,
    Attention.py:580-589).

    Reference quirks reproduced deliberately:
    - region slices use `window_size`, NOT the dilated total window
      (create_mask slices at Attention.py:511-537 vs the total-window
      partition at :541);
    - the final longitude slice is `slice(0, None)`, overwriting the whole
      row range — longitude is treated as periodic, so labels only
      compartmentalize the leading (time/latitude) axes.
    """
    import itertools

    nd = len(window_size)
    dil = tuple(dilated_size) if dilated_size is not None else (1,) * nd
    total = tuple(w * d for w, d in zip(window_size, dil))
    if shift_size[-1] == 0 or total[-1] == grid[-1]:
        return None

    img = np.zeros(grid, dtype=np.float64)
    ax_slices = [
        (slice(0, -w), slice(-w, -s), slice(-s, None))
        for w, s in zip(window_size[:-1], shift_size[:-1])
    ]
    w_last = window_size[-1]
    ax_slices.append(
        (slice(0, -w_last), slice(-w_last, 0), slice(0, None))
    )
    cnt = 0
    for idx in itertools.product(*ax_slices):
        img[idx] = cnt
        cnt += 1

    # partition by the TOTAL window, then regroup so each dilated offset
    # is one mask row of the window_size-lattice tokens
    rs = []
    for g, w, d in zip(grid, window_size, dil):
        rs += [g // (w * d), w, d]
    lab = img.reshape(rs)
    n_axes = [3 * i for i in range(nd)]
    w_axes = [3 * i + 1 for i in range(nd)]
    d_axes = [3 * i + 2 for i in range(nd)]
    lab = lab.transpose(n_axes + d_axes + w_axes).reshape(
        -1, int(np.prod(window_size))
    )
    mask = lab[:, None, :] - lab[:, :, None]
    return np.where(mask != 0, neg, 0.0).astype(np.float32)
