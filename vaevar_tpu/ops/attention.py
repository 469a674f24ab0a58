"""Multi-head attention cores for windowed attention.

Two execution paths chosen statically by sequence length:

- dense: one fused logits->softmax->values chain, ideal for the small
  windows of the Swin stages (N = 16..2048) where XLA tiles straight onto
  the MXU;
- flash: online-softmax attention (ops/pallas_attn.py kernel when
  available, else the custom-VJP scan in ops/flash.py), used for the
  full-grid stage of the 0.25deg LG net (N = 16200, dim 1152) where the
  dense logits matrix would not fit HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_attention(q, k, v, mask=None):
    """q,k,v: (B, h, N, d). mask: (nW, N, N) additive or None. Returns (B,h,N,d).

    When mask is given, B must be a multiple of nW with window-major minor
    index (b = outer*nW + w), matching window_partition ordering.
    """
    dtype = q.dtype
    scale_dtype = jnp.float32
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=scale_dtype)
    if mask is not None:
        nW = mask.shape[0]
        B, h, N, _ = logits.shape
        logits = logits.reshape(B // nW, nW, h, N, N)
        logits = logits + mask[None, :, None].astype(scale_dtype)
        logits = logits.reshape(B, h, N, N)
    w = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


def window_attention_core(q, k, v, mask=None, flash_min_seq: int = 4096):
    """Dispatch between dense and flash paths on static N (q pre-scaled)."""
    N = q.shape[2]
    if mask is None and N >= flash_min_seq:
        from vaevar_tpu.ops import pallas_attn

        if pallas_attn.available():
            return pallas_attn.flash_attention(q, k, v)
        # custom-VJP flash: O(N) memory in forward AND backward
        from vaevar_tpu.ops.flash import flash_attention as flash_vjp

        return flash_vjp(q, k, v)
    return dense_attention(q, k, v, mask)
