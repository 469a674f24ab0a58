"""Fused Swin transformer block for small windows (Pallas TPU).

The enc/dec stages of LGUnet run window attention with tiny windows
(4x4 = 16 tokens) at small widths (C=96/192). Executed as separate XLA
ops (LayerNorm, window partition reshape, qkv, per-window attention,
reverse, proj, MLP) each op is latency/bandwidth-bound: the whole
enc+dec path measures ~13 ms per decoder forward against a ~2 ms matmul
roofline (profiled on v5e). This module fuses the ENTIRE pre-norm block

    x = x + proj(win_attn(LN1(x)))
    x = x + fc2(gelu(fc1(LN2(x))))

into one Pallas kernel per block: one pass over HBM, all intermediates
in VMEM.

Two TPU-first tricks make the kernel trivial:

1. **Raster-order block-diagonal attention.** Tokens stay in (H, W)
   raster order; a program processes one window-row slab of wh*W tokens.
   Window structure (same-window connectivity), the relative-position
   bias, AND the shifted-window latitude mask are all folded into one
   precomputed additive (heads, TT, TT) tensor: S = q k^T + biasmask.
   Cross-window pairs get -1e9 (softmax-exact zero), in-window pairs get
   the rel-pos bias (+ the reference's -100 boundary mask quirk,
   networks_old/utils/swinblock.py:258). No window partition/reverse
   reshapes exist anywhere. The wasted FLOPs on masked pairs are noise
   next to the block's matmuls at these window sizes.

2. **Shift by jnp.roll outside the kernel.** Per-token ops commute with
   the cyclic shift, so a shifted block is roll -> fused block (with the
   boundary mask on the last row slab) -> roll back, exactly the
   reference semantics (swin roll + mask compartmentalization;
   longitude periodic, da_4dvar 1.4deg grids).

Semantics match `lgunet.Block` with attn_type="relbias" (old-gen
SwinTransformerBlock, networks_old/utils/swinblock.py:64-309): pre-norm,
eps=1e-5, rel-pos-bias table indexed row-major, -100 shift mask.

Backward: custom VJP. v1 backward = jax.vjp of the pure-jnp reference
implementation (recompute; XLA). The reference impl (`block_reference`)
is also the non-TPU fallback, and interpret-mode tests pin the kernel to
it bitwise-tolerance-level.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # structural cross-window block: softmax-exact zero
_MASK_NEG = -100.0  # reference boundary mask value (swinblock.py:258)


def available() -> bool:
    return jax.default_backend() == "tpu"


# --- static geometry tables --------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rel_onehot(wh: int, ww: int):
    """Shared rel-pos one-hot (ops/posenc.py) — same table row order as
    the modular WindowAttention, so checkpoints stay interchangeable."""
    from vaevar_tpu.ops.posenc import relative_position_onehot

    return relative_position_onehot((wh, ww))


@functools.lru_cache(maxsize=None)
def _boundary_nn(wh: int, ww: int, sh: int):
    """f32 (N, N) additive -100 pattern for windows in the wrapped (last)
    slab of a shifted block: latitude regions split window rows into
    [0, wh-sh) and [wh-sh, wh) — swin_attention_mask's last-row pattern."""
    N = wh * ww
    region = (np.arange(N) // ww >= wh - sh).astype(np.int64)
    bad = region[:, None] != region[None, :]
    return np.where(bad, np.float32(_MASK_NEG), np.float32(0.0))


def build_biasmask(table, *, W: int, wh: int, ww: int, sh: int, sw: int):
    """(2, heads, TT, TT) f32 additive attention tensor from the learned
    rel-pos table (T, heads), TT = wh*W raster-order slab tokens: slot 0 =
    interior slabs, slot 1 = the boundary slab (== slot 0 when unshifted).

    Built with a one-hot matmul + broadcasting only (no gather), so its
    VJP back to the table is a matmul, not a scatter (a scatter inside an
    nn.scan'd stack is ~500x slower, see lgunet.py:119-123).
    """
    heads = table.shape[-1]
    N = wh * ww
    nWc = W // ww
    bias_nn = jnp.einsum(
        "nt,th->nh", jnp.asarray(_rel_onehot(wh, ww)),
        table.astype(jnp.float32),
    ).reshape(N, N, heads)
    if sh or sw:
        bias_bnd = bias_nn + jnp.asarray(_boundary_nn(wh, ww, sh))[..., None]
    else:
        bias_bnd = bias_nn
    both = jnp.stack([bias_nn, bias_bnd])  # (2, N, N, heads)
    # expand window-pair bias to the raster slab: token t = (r, cb, ci);
    # same window iff cb equal; in-window rel position = (r, ci) pair.
    b6 = both.reshape(2, wh, ww, wh, ww, heads)
    b6 = b6[:, :, None, :, :, None, :, :]  # (2, wh,1,ww, wh,1,ww, h)
    eye = jnp.asarray(
        np.eye(nWc, dtype=bool)[None, None, :, None, None, :, None, None]
    )
    full = jnp.where(eye, b6, jnp.float32(_NEG))
    full = jnp.broadcast_to(full, (2, wh, nWc, ww, wh, nWc, ww, heads))
    TT = wh * W
    return full.reshape(2, TT, TT, heads).transpose(0, 3, 1, 2)


# --- pure-jnp reference (fallback + VJP backward) ----------------------------


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _slab_block(xs, biasmask, p, *, heads, eps):
    """One row slab (TT, C) -> (TT, C). biasmask (heads, TT, TT) f32."""
    TT, C = xs.shape
    hd = C // heads
    dt = xs.dtype

    y = _ln(xs, p["ln1_scale"], p["ln1_bias"], eps)
    qkv = (
        jnp.dot(y, p["qkv_kernel"].astype(dt),
                preferred_element_type=jnp.float32)
        + p["qkv_bias"].astype(jnp.float32)
    ).astype(dt)
    qkv = qkv.reshape(TT, 3, heads, hd)
    q = qkv[:, 0].transpose(1, 0, 2) * jnp.asarray(hd**-0.5, dt)
    k = qkv[:, 1].transpose(1, 0, 2)
    v = qkv[:, 2].transpose(1, 0, 2)  # (heads, TT, hd)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (heads, TT, TT)
    s = s + biasmask
    pw = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jax.lax.dot_general(
        pw, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (heads, TT, hd)
    o = o.transpose(1, 0, 2).reshape(TT, C)
    attn = (
        jnp.dot(o, p["proj_kernel"].astype(dt),
                preferred_element_type=jnp.float32)
        + p["proj_bias"].astype(jnp.float32)
    ).astype(dt)
    x1 = xs + attn

    y2 = _ln(x1, p["ln2_scale"], p["ln2_bias"], eps)
    h = (
        jnp.dot(y2, p["fc1_kernel"].astype(dt),
                preferred_element_type=jnp.float32)
        + p["fc1_bias"].astype(jnp.float32)
    )
    h = jax.nn.gelu(h, approximate=False).astype(dt)
    out = (
        jnp.dot(h, p["fc2_kernel"].astype(dt),
                preferred_element_type=jnp.float32)
        + p["fc2_bias"].astype(jnp.float32)
    ).astype(dt)
    return x1 + out


def block_reference(x, biasmask, p, *, wh, heads, eps=1e-5):
    """Pure-jnp fused block on (B, H, W, C) raster input (pre-rolled).
    biasmask (2, heads, TT, TT) defines the slab geometry: TT = wh * SC."""
    B, H, W, C = x.shape
    TT = biasmask.shape[-1]
    SC = TT // wh
    n = H // wh
    m = W // SC
    xs = x.reshape(B, n, wh, m, SC, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B * n * m, TT, C)
    sel = jnp.repeat(
        jnp.concatenate(
            [jnp.zeros(n - 1, jnp.int32), jnp.ones(1, jnp.int32)]
        ),
        m,
    )
    sel = jnp.tile(sel, B)
    bm = biasmask[sel]  # (B*n*m, heads, TT, TT)
    out = jax.vmap(
        lambda a, b: _slab_block(a, b, p, heads=heads, eps=eps)
    )(xs, bm)
    out = out.reshape(B, n, m, wh, SC, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)


# --- pallas kernel -----------------------------------------------------------


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 erf for f32 (|err| < 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p0 = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p0 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _fused_kernel(x_ref, bm_ref, wqkv_ref, bqkv_ref, wproj_ref, projb_ref,
                  g1_ref, b1_ref, g2_ref, b2_ref, w1_ref, w1b_ref, w2_ref,
                  w2b_ref, o_ref, o_scr, *, heads, eps):
    wh, SC, C = x_ref.shape[1:]
    TT = wh * SC
    xs = x_ref[0].reshape(TT, C)  # sublane-merge only; lane dim untouched
    hd = C // heads
    dt = xs.dtype

    # LN1 (f32 stats)
    xf = xs.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * g1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32))
    y = y.astype(dt)

    # one qkv matmul; heads are LANE SLICES (no lane reshapes — Mosaic
    # cannot shape-cast the lane dim, but strided lane slices lower fine)
    qkv = (
        jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[0].astype(jnp.float32)
    ).astype(dt)
    scale = jnp.asarray(hd**-0.5, dt)
    for h in range(heads):
        qh = qkv[:, h * hd:(h + 1) * hd] * scale
        kh = qkv[:, C + h * hd:C + (h + 1) * hd]
        vh = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TT, TT)
        s = s + bm_ref[0, h]
        pw = jax.nn.softmax(s, axis=-1).astype(dt)
        o_scr[:, h * hd:(h + 1) * hd] = jnp.dot(
            pw, vh, preferred_element_type=jnp.float32
        ).astype(dt)
    attn = (
        jnp.dot(o_scr[:], wproj_ref[:], preferred_element_type=jnp.float32)
        + projb_ref[0].astype(jnp.float32)
    ).astype(dt)
    x1 = xs + attn

    xf1 = x1.astype(jnp.float32)
    mu2 = jnp.mean(xf1, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(xf1 - mu2), axis=-1, keepdims=True)
    y2 = (xf1 - mu2) * jax.lax.rsqrt(var2 + eps)
    y2 = (y2 * g2_ref[0].astype(jnp.float32) + b2_ref[0].astype(jnp.float32))
    y2 = y2.astype(dt)

    h = (
        jnp.dot(y2, w1_ref[:], preferred_element_type=jnp.float32)
        + w1b_ref[0].astype(jnp.float32)
    )
    # exact-form gelu via an f32 erf approximation: Mosaic has no
    # erf/erfc lowering. Abramowitz-Stegun 7.1.26, max abs error 1.5e-7
    # — two orders below bf16 resolution, so indistinguishable from the
    # stock jax.nn.gelu(approximate=False) in bf16 outputs.
    h = 0.5 * h * (1.0 + _erf_f32(h * np.float32(1.0 / math.sqrt(2.0))))
    h = h.astype(dt)
    out = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        + w2b_ref[0].astype(jnp.float32)
    ).astype(dt)
    o_ref[0] = (x1 + out).reshape(wh, SC, C)


def _slab_cols(W: int, ww: int) -> int:
    """Columns per kernel slab: ~128 tokens keeps the block-diagonal
    softmax waste bounded (exp work scales with slab size) while the
    matmuls stay big enough for the MXU."""
    for sc in (32, 16, 8):
        if sc % ww == 0 and W % sc == 0:
            return sc
    return W


def _pallas_block(x, biasmask, p, *, wh, heads, eps, interpret=False):
    """x (B, H, W, C) raster (pre-rolled); biasmask (2, heads, TT, TT)
    with TT = wh * SC defining the slab geometry."""
    B, H, W, C = x.shape
    TT = biasmask.shape[-1]
    SC = TT // wh
    n = H // wh
    m = W // SC
    dt = x.dtype
    hd = C // heads

    def cast(a):
        return a.astype(dt)

    wqkv = cast(p["qkv_kernel"])
    bqkv = cast(p["qkv_bias"]).reshape(1, -1)
    wproj = cast(p["proj_kernel"])

    hidden = p["fc1_kernel"].shape[-1]
    grid = (B, n, m)
    full = lambda *shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_fused_kernel, heads=heads, eps=eps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wh, SC, C), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, heads, TT, TT),
                lambda b, i, j: (jnp.where(i == n - 1, 1, 0), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(C, 3 * C),
            full(1, 3 * C),
            full(C, C),
            full(1, C),
            full(1, C),
            full(1, C),
            full(1, C),
            full(1, C),
            full(C, hidden),
            full(1, hidden),
            full(hidden, C),
            full(1, C),
        ],
        out_specs=pl.BlockSpec((1, wh, SC, C), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, C), dt)],
        interpret=interpret,
    )(
        x, biasmask,
        wqkv, bqkv, wproj,
        cast(p["proj_bias"]).reshape(1, -1),
        cast(p["ln1_scale"]).reshape(1, -1),
        cast(p["ln1_bias"]).reshape(1, -1),
        cast(p["ln2_scale"]).reshape(1, -1),
        cast(p["ln2_bias"]).reshape(1, -1),
        cast(p["fc1_kernel"]), cast(p["fc1_bias"]).reshape(1, -1),
        cast(p["fc2_kernel"]), cast(p["fc2_bias"]).reshape(1, -1),
    )
    return out


# --- public op with custom VJP ----------------------------------------------

_PARAM_KEYS = (
    "ln1_scale", "ln1_bias", "qkv_kernel", "qkv_bias", "proj_kernel",
    "proj_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
    "fc2_kernel", "fc2_bias",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core(x, biasmask, p, wh, heads, eps):
    if available():
        return _pallas_block(x, biasmask, p, wh=wh, heads=heads, eps=eps)
    return block_reference(x, biasmask, p, wh=wh, heads=heads, eps=eps)


def _fused_core_fwd(x, biasmask, p, wh, heads, eps):
    return _fused_core(x, biasmask, p, wh, heads, eps), (x, biasmask, p)


def _fused_core_bwd(wh, heads, eps, res, g):
    x, biasmask, p = res
    # recompute-based VJP through the reference impl; XLA fuses decently
    # and correctness is pinned to block_reference. A hand-written Pallas
    # backward kernel can swap in here without touching callers.
    _, vjp = jax.vjp(
        lambda xx, bb, pp: block_reference(xx, bb, pp, wh=wh, heads=heads,
                                           eps=eps),
        x, biasmask, p,
    )
    return vjp(g)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_swin_block(
    x, params, rel_bias_table, *, window, shift, heads, eps=1e-5,
):
    """Full fused Swin block on (B, H, W, C).

    params: dict with _PARAM_KEYS arrays; rel_bias_table ((2wh-1)(2ww-1),
    heads). Handles the cyclic shift by rolling outside the kernel.
    Equivalent to lgunet.Block(attn_type="relbias") — goldens in
    tests/test_fused_block.py.
    """
    B, H, W, C = x.shape
    wh, ww = window
    sh, sw = shift
    bm = build_biasmask(rel_bias_table, W=_slab_cols(W, ww), wh=wh, ww=ww,
                        sh=sh, sw=sw)
    if sh or sw:
        x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
    out = _fused_core(x, bm, dict(params), wh, heads, eps)
    if sh or sw:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out
