"""Pallas TPU flash attention (forward + custom-VJP backward).

First-party kernels for the unmasked full-grid attention of the LG stage
(reference: full-map window attention, networks/LGUnet_all.py:689 with
mask=None per networks/utils/Attention.py:580-592). At 0.25deg the LG
grid is 90x180 = 16200 tokens with head_dim up to 192, so dense logits
(N^2 f32 per head) would thrash HBM; these kernels keep the working set
in VMEM with online softmax, O(block) memory in forward AND backward —
the backward recomputes P blockwise from the saved logsumexp, the
standard flash-2 scheme (dV = P^T dO; dS = P*(dP - D); dQ = dS K;
dK = dS^T Q).

Layout: inputs (B, h, N, d) with q pre-scaled by 1/sqrt(d); internally
flattened to (B*h, N, d). The kernel grid iterates (bh, q_block,
k_block) with the k dimension innermost; running max / sum / accumulator
live in VMEM scratch that persists across the sequential TPU grid steps.
All accumulation in f32 regardless of input dtype (bf16 in production).

Falls back to ops/flash.py (pure-JAX lax.scan online softmax) off-TPU;
tests run these kernels in interpret mode on CPU for bit-level parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(np.finfo(np.float32).min)


def available() -> bool:
    return jax.default_backend() == "tpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# --- forward -----------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, n_valid, block_k):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if n_valid % block_k:  # mask padded keys (last k block only)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * block_k
        s = jnp.where(
            jnp.logical_or(kk < nk - 1, col < n_valid), s, _NEG_INF
        )

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kk == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(l)).astype(jnp.float32)


def _fwd_call(q, k, v, block_q, block_k, interpret):
    BH, N, d = q.shape
    Np_q = _ceil_to(N, block_q)
    Np_k = _ceil_to(N, block_k)
    qp = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Np_k - N), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Np_k - N), (0, 0)))
    nq, nk = Np_q // block_q, Np_k // block_k

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=N, block_k=block_k),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Np_q, d), q.dtype),
            jax.ShapeDtypeStruct((BH, Np_q, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N], lse[:, :N, 0]


# --- backward ----------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_scr, *, n_valid, block_k):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid % block_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * block_k
        s = jnp.where(
            jnp.logical_or(kk < pl.num_programs(2) - 1, col < n_valid),
            s, _NEG_INF,
        )
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, n_valid, block_q):
    qq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # s^T computed directly: (bk, bq) = k @ q^T
    st = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # padded q rows: lse is 0 there; mask p^T columns
    row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1) + qq * block_q
    lse = lse_ref[0][:1, :]  # (1, bq) — row-replicated transposed layout
    pt = jnp.exp(st - lse)
    pt = jnp.where(row < n_valid, pt, 0.0)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        pt.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, bq)
    dst = pt * (dpt - delta_ref[0][:1, :])
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        dst.astype(q_ref.dtype), q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_call(q, k, v, out, lse, do, block_q, block_k, interpret):
    BH, N, d = q.shape
    Np_q = _ceil_to(N, block_q)
    Np_k = _ceil_to(N, block_k)
    qp = jnp.pad(q, ((0, 0), (0, Np_q - N), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Np_k - N), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Np_k - N), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, Np_q - N), (0, 0)))
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    deltap = jnp.pad(delta, ((0, 0), (0, Np_q - N)))
    lsep = jnp.pad(lse, ((0, 0), (0, Np_q - N)))
    # replicate scalars along a 128-lane axis (column layout, dq kernel) and
    # an 8-sublane axis (row layout, dkv kernel) for clean VMEM tiling
    lse128 = jnp.broadcast_to(lsep[..., None], (*lsep.shape, 128))
    delta128 = jnp.broadcast_to(deltap[..., None], (*deltap.shape, 128))
    lse_t = jnp.broadcast_to(lsep[:, None, :], (BH, 8, Np_q))
    delta_t = jnp.broadcast_to(deltap[:, None, :], (BH, 8, Np_q))
    nq, nk = Np_q // block_q, Np_k // block_k

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_valid=N, block_k=block_k),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Np_q, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lse128, delta128)[:, :N]

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_valid=N, block_q=block_q),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Np_k, d), k.dtype),
            jax.ShapeDtypeStruct((BH, Np_k, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lse_t, delta_t)
    return dq, dk[:, :N], dv[:, :N]


# --- public op (custom VJP over (B, h, N, d)) ----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = 1024, block_k: int = 1024,
                    interpret: bool = False):
    """Unmasked flash attention, (B, h, N, d), q pre-scaled by 1/sqrt(d).

    Default 1024x1024 blocks measured fastest at the 0.25deg LG-stage shape
    (N=16200, d=192) on v5e; blocks are clamped for short sequences.
    """
    out, _ = _flash_fwd(q, k, v, block_q, block_k, interpret)
    return out


def _clamp(block: int, n: int) -> int:
    return min(block, _ceil_to(n, 128))


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    B, h, N, d = q.shape
    block_q, block_k = _clamp(block_q, N), _clamp(block_k, N)
    f = lambda x: x.reshape(B * h, N, d)
    out, lse = _fwd_call(f(q), f(k), f(v), block_q, block_k, interpret)
    return out.reshape(B, h, N, d), (q, k, v, out, lse)


def _flash_bwd(block_q, block_k, interpret, res, dout):
    q, k, v, out, lse = res
    B, h, N, d = q.shape
    block_q, block_k = _clamp(block_q, N), _clamp(block_k, N)
    f = lambda x: x.reshape(B * h, N, d)
    dq, dk, dv = _bwd_call(
        f(q), f(k), f(v), out, lse, f(dout), block_q, block_k, interpret
    )
    g = lambda x: x.reshape(B, h, N, d)
    return g(dq), g(dk), g(dv)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
