"""Flash attention with O(N) memory in forward AND backward (custom VJP).

Used for the full-grid LG stage at 0.25deg (N = 90*180 = 16200, head_dim
192) where dense logits (N^2 per head) would blow HBM — including inside
the 4D-Var cost, so the backward pass must also be memory-bounded: the
standard blockwise-recompute flash backward (dV = P^T dO, dS = P*(dP - D),
dQ = dS K, dK = dS^T Q) is implemented with lax.scan over key blocks.

The unmasked case only (the full-grid stage is never shifted, so its mask
is None — reference Attention.py:580-592). Shapes: (B, h, N, d), q
pre-scaled by 1/sqrt(d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 512, block_k: int = 1024):
    out, _, _ = _forward(q, k, v, block_q, block_k)
    return out


def _forward(q, k, v, block_q, block_k):
    """Returns (out, m, l) with m/l the per-row softmax stats."""
    B, h, N, d = q.shape
    nq = -(-N // block_q)
    nk = -(-N // block_k)
    qp = _pad_to(q, nq * block_q, 2)
    kp = _pad_to(k, nk * block_k, 2)
    vp = _pad_to(v, nk * block_k, 2)
    kv_valid = (jnp.arange(nk * block_k) < N).reshape(nk, block_k)

    qb = qp.reshape(B, h, nq, block_q, d).transpose(2, 0, 1, 3, 4)
    kb = kp.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = vp.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)

    def per_q(q_blk):
        def step(carry, inp):
            m, l, acc = carry
            k_blk, v_blk, valid = inp
            s = jnp.einsum("bhqd,bhkd->bhqk", q_blk, k_blk,
                           preferred_element_type=jnp.float32)
            s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32)
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, h, block_q), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, h, block_q), jnp.float32)
        a0 = jnp.zeros((B, h, block_q, d), jnp.float32)
        (m, l, acc), _ = lax.scan(step, (m0, l0, a0), (kb, vb, kv_valid))
        return (acc / l[..., None]).astype(q.dtype), m, l

    outs, ms, ls = lax.map(per_q, qb)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, h, nq * block_q, d)[:, :, :N]
    m = ms.transpose(1, 2, 0, 3).reshape(B, h, nq * block_q)[:, :, :N]
    l = ls.transpose(1, 2, 0, 3).reshape(B, h, nq * block_q)[:, :, :N]
    return out, m, l


def _fwd(q, k, v, block_q, block_k):
    out, m, l = _forward(q, k, v, block_q, block_k)
    return out, (q, k, v, out, m, l)


def _bwd(block_q, block_k, res, dout):
    q, k, v, out, m, l = res
    B, h, N, d = q.shape
    nq = -(-N // block_q)
    nk = -(-N // block_k)

    qp = _pad_to(q, nq * block_q, 2)
    kp = _pad_to(k, nk * block_k, 2)
    vp = _pad_to(v, nk * block_k, 2)
    dop = _pad_to(dout, nq * block_q, 2)
    mp = _pad_to(m, nq * block_q, 2)
    # pad l with 1 to avoid 0/0 on padded rows
    lp = jnp.concatenate(
        [l, jnp.ones((B, h, nq * block_q - N), l.dtype)], axis=2
    ) if nq * block_q > N else l
    Dp = jnp.sum(dop.astype(jnp.float32) * _pad_to(out, nq * block_q, 2), axis=-1)

    q_valid = (jnp.arange(nq * block_q) < N).reshape(nq, block_q)
    kv_valid = (jnp.arange(nk * block_k) < N).reshape(nk, block_k)

    qb = qp.reshape(B, h, nq, block_q, d).transpose(2, 0, 1, 3, 4)
    dob = dop.reshape(B, h, nq, block_q, d).transpose(2, 0, 1, 3, 4)
    mb = mp.reshape(B, h, nq, block_q).transpose(2, 0, 1, 3)
    lb = lp.reshape(B, h, nq, block_q).transpose(2, 0, 1, 3)
    Db = Dp.reshape(B, h, nq, block_q).transpose(2, 0, 1, 3)
    kb = kp.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = vp.reshape(B, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)

    def p_block(q_blk, m_blk, l_blk, k_blk, kvv):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_blk, k_blk,
                       preferred_element_type=jnp.float32)
        s = jnp.where(kvv[None, None, None, :], s, -jnp.inf)
        return jnp.exp(s - m_blk[..., None]) / l_blk[..., None]

    # dq: for each q block, scan over kv blocks
    def dq_block(args):
        q_blk, do_blk, m_blk, l_blk, D_blk = args

        def step(acc, inp):
            k_blk, v_blk, kvv = inp
            p = p_block(q_blk, m_blk, l_blk, k_blk, kvv)
            dp = jnp.einsum("bhqd,bhkd->bhqk", do_blk, v_blk,
                            preferred_element_type=jnp.float32)
            ds = p * (dp - D_blk[..., None])
            return acc + jnp.einsum(
                "bhqk,bhkd->bhqd", ds.astype(k_blk.dtype), k_blk,
                preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((B, h, block_q, d), jnp.float32)
        acc, _ = lax.scan(step, acc0, (kb, vb, kv_valid))
        return acc.astype(q.dtype)

    dqb = lax.map(dq_block, (qb, dob, mb, lb, Db))
    dq = dqb.transpose(1, 2, 0, 3, 4).reshape(B, h, nq * block_q, d)[:, :, :N]

    # dk/dv: for each kv block, scan over q blocks
    def dkv_block(args):
        k_blk, v_blk, kvv = args

        def step(carry, inp):
            dk_acc, dv_acc = carry
            q_blk, do_blk, m_blk, l_blk, D_blk, qv = inp
            p = p_block(q_blk, m_blk, l_blk, k_blk, kvv)
            p = jnp.where(qv[None, None, :, None], p, 0.0)
            dv_acc = dv_acc + jnp.einsum(
                "bhqk,bhqd->bhkd", p.astype(do_blk.dtype), do_blk,
                preferred_element_type=jnp.float32)
            dp = jnp.einsum("bhqd,bhkd->bhqk", do_blk, v_blk,
                            preferred_element_type=jnp.float32)
            ds = p * (dp - D_blk[..., None])
            dk_acc = dk_acc + jnp.einsum(
                "bhqk,bhqd->bhkd", ds.astype(q_blk.dtype), q_blk,
                preferred_element_type=jnp.float32)
            return (dk_acc, dv_acc), None

        z = jnp.zeros((B, h, block_k, d), jnp.float32)
        (dk_acc, dv_acc), _ = lax.scan(
            step, (z, z), (qb, dob, mb, lb, Db, q_valid)
        )
        return dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)

    dkb, dvb = lax.map(dkv_block, (kb, vb, kv_valid))
    dk = dkb.transpose(1, 2, 0, 3, 4).reshape(B, h, nk * block_k, d)[:, :, :N]
    dv = dvb.transpose(1, 2, 0, 3, 4).reshape(B, h, nk * block_k, d)[:, :, :N]
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
