"""Multi-head attention cores for windowed attention.

Two execution paths chosen statically by sequence length:

- dense: one fused logits->softmax->values chain, ideal for the small
  windows of the Swin stages (N = 16..2048) where XLA tiles straight onto
  the MXU;
- flash: online-softmax attention chunked over both query and key blocks
  (lax.scan), used for the full-grid stage of the 0.25deg LG net
  (N = 16200, dim 1152) where the dense logits matrix would not fit HBM.

A Pallas TPU kernel backs the flash path when enabled (ops/pallas_attn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


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


def flash_attention(q, k, v, block_q: int = 1024, block_k: int = 1024):
    """Memory-efficient unmasked attention via online softmax.

    q,k,v: (B, h, N, d) with q pre-scaled. Peak memory O(block_q * N) per
    scan step instead of O(N^2).
    """
    B, h, N, d = q.shape
    nq = -(-N // block_q)
    pad_q = nq * block_q - N
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    nk = -(-N // block_k)
    pad_k = nk * block_k - N
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    kv_valid = jnp.arange(nk * block_k) < N  # mask padded keys

    qb = q.reshape(B, h, nq, block_q, d).transpose(2, 0, 1, 3, 4)
    kb = k.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    kv_validb = kv_valid.reshape(nk, block_k)

    def per_q_block(q_blk):
        def kv_step(carry, inp):
            m, l, acc = carry
            k_blk, v_blk, valid = inp
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk, k_blk, preferred_element_type=jnp.float32
            )
            s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, h, block_q), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, h, block_q), jnp.float32)
        acc0 = jnp.zeros((B, h, block_q, d), jnp.float32)
        (m, l, acc), _ = lax.scan(kv_step, (m0, l0, acc0), (kb, vb, kv_validb))
        return (acc / l[..., None]).astype(q.dtype)

    out = lax.map(per_q_block, qb)  # (nq, B, h, block_q, d)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, h, nq * block_q, d)
    return out[:, :, :N]


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
