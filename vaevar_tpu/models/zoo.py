"""Layer zoo: the reference's auxiliary attention / MLP / block variants.

None of these are used by the shipped LGUnet configs (SURVEY.md section 2a:
"present but unused"), but they are part of the reference's component
surface (networks/utils/{Attention,mlp,Blocks,moe_utils,mae_utils}.py) and
are provided for config parity and experimentation. Channel-last (NHWC)
flax modules reusing the framework's window / rope / attention primitives;
deterministic (all shipped drop rates are 0).

Behavioral references, file:line into /root/reference:
- CrossAttention           networks/utils/Attention.py:15-63
- ConvAttention            networks/utils/Attention.py:66-230
- DilatedAttention         networks/utils/Attention.py:233-339
- GAUAttention (Flash_attn)networks/utils/Attention.py:669-814
- HydraAttention           networks/utils/Attention.py:817-958
- HiLoAttention            networks/utils/Attention.py:1027-1131
- MoEWindowAttention       networks/utils/Attention.py:1134-1451
- GluMlp / GatedMlp / ConvMlp / MAGMlp / RCAB / RDCAB / DWMlp / MoEMlp
                           networks/utils/mlp.py:35-302
- ConvNeXtBlock / HiLoBlock / ConvFFNBlock / MoEWindowBlock
                           networks/utils/Blocks.py:12-319
- SEBlock (SElayer) / ScaleOffset / attn_norm / PeriodicPad2d
                           networks/utils/utils.py:27-49,135-158,218-252
- ViTBlock / ViTCrossAttention / ViTDecoderBlock
                           networks/utils/mae_utils.py:157-252
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.ops import moe as moe_ops
from vaevar_tpu.ops import posenc
from vaevar_tpu.ops import rope as rope_ops
from vaevar_tpu.ops import windows as win_ops
from vaevar_tpu.ops.attention import dense_attention

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _dense(feat, name=None, use_bias=True, dtype=None, kernel_init=_trunc02):
    return nn.Dense(feat, name=name, use_bias=use_bias,
                    kernel_init=kernel_init,
                    bias_init=nn.initializers.zeros, dtype=dtype)


def periodic_pad2d(x, pad_hw):
    """Longitude-circular, latitude-zero padding of (B, H, W, C)
    (reference PeriodicPad2d, networks/utils/utils.py:238-252)."""
    ph, pw = pad_hw
    if pw:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    if ph:
        x = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
    return x


def attn_norm(x, method: str = "softmax"):
    """softmax / squared-relu / softmax-plus attention normalizers
    (utils.py:27-49)."""
    if method == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if method == "squared_relu":
        return jax.nn.relu(x) ** 2
    if method == "softmax_plus":
        n = x.shape[-1]
        mask = (x > -jnp.inf / 10).astype(x.dtype)
        scale = np.log(n) / np.log(512) * mask + (1 - mask)
        return jax.nn.softmax(x * scale, axis=-1)
    raise ValueError(method)


class ScaleOffset(nn.Module):
    """Per-channel learned scale (init N(0, 0.02)) + offset (utils.py:135-158)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.normal(0.02), (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        return x * gamma + beta


class SEBlock(nn.Module):
    """Squeeze-excite channel attention over (B, H, W, C) (SElayer,
    utils.py:218-234)."""

    dim: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = _dense(self.dim // self.reduction, name="fc1", dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = _dense(self.dim, name="fc2", dtype=self.dtype)(y)
        return x * jax.nn.sigmoid(y)


class RelativePositionalBias(nn.Module):
    """Additive (N, N) bias from a learned table for an n-D window
    (positional_encodings.py:320-361). Call on logits (..., nH, N, N)."""

    window_size: Sequence[int]
    num_heads: int = 1

    def setup(self):
        table_len = 1
        for s in self.window_size:
            table_len *= 2 * s - 1
        self.table = self.param("table", _trunc02, (table_len, self.num_heads))
        idx = posenc.relative_position_index(self.window_size).reshape(-1)
        onehot = np.zeros((idx.shape[0], table_len), np.float32)
        onehot[np.arange(idx.shape[0]), idx] = 1.0
        self._onehot = onehot  # one-hot matmul beats gather on TPU backward

    def __call__(self, logits):
        N = int(np.prod(self.window_size))
        bias = jnp.einsum(
            "nt,th->nh", jnp.asarray(self._onehot),
            self.table.astype(jnp.float32),
        ).reshape(N, N, self.num_heads)
        return logits + bias.transpose(2, 0, 1)


# --- attention variants -------------------------------------------------------


class CrossAttention(nn.Module):
    """x attends to window-avg-pooled y (Cross_attn, Attention.py:15-63)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        B, H, W, C = x.shape
        h = self.num_heads
        hd = C // h
        q = _dense(C, name="l_q", dtype=self.dtype)(x)
        q = q.reshape(B, H * W, h, hd).transpose(0, 2, 1, 3)
        wh, ww = self.window_size
        y_pool = nn.avg_pool(y, (wh, ww), (wh, ww))
        kv = _dense(2 * C, name="l_kv", dtype=self.dtype)(
            y_pool.reshape(B, -1, C)
        )
        kv = kv.reshape(B, -1, 2, h, hd).transpose(2, 0, 3, 1, 4)
        out = dense_attention(q * hd**-0.5, kv[0], kv[1])
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return _dense(C, name="l_proj", dtype=self.dtype)(out)


class _WindowCore(nn.Module):
    """Shared windowed rope attention over pre-projected qkv chunks."""

    window_size: tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self, qkv, shift, resolution):
        H, W = resolution
        win = self.window_size
        N = win[0] * win[1]
        C3 = qkv.shape[-1]
        C = C3 // 3
        h = self.num_heads
        hd = C // h
        if shift[0] or shift[1]:
            qkv = win_ops.shift2d(qkv, -shift[0], -shift[1])
            mask = win_ops.swin_attention_mask(H, W, win, shift, neg=-100.0)
        else:
            mask = None
        qkvw = win_ops.window_partition(qkv, win)  # (B*nW, N, 3C)
        B_ = qkvw.shape[0]
        qkvw = qkvw.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkvw[0], qkvw[1], qkvw[2]
        tables = rope_ops.rope2_tables(win, hd)
        q = rope_ops.apply_rope2(q, tables) * hd**-0.5
        k = rope_ops.apply_rope2(k, tables)
        out = dense_attention(q, k, v, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        x = win_ops.window_reverse(out, win, H, W)
        if shift[0] or shift[1]:
            x = win_ops.shift2d(x, shift[0], shift[1])
        return x


class ConvAttention(nn.Module):
    """4-branch window attention: qkv split into 4 chunks, each attending
    with a different shift (none / lon / lat / both), concatenated
    (Conv_attn, Attention.py:66-230). head_dim = dim//heads//4."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        wh, ww = self.window_size
        qkv = _dense(3 * C, name="qkv", dtype=self.dtype)(x)
        chunks = jnp.split(qkv, 4, axis=-1)  # each (B,H,W,3C/4)
        shifts = [(0, 0), (0, ww // 2), (wh // 2, 0), (wh // 2, ww // 2)]
        outs = []
        for i, (chunk, shift) in enumerate(zip(chunks, shifts)):
            outs.append(
                _WindowCore(self.window_size, self.num_heads,
                            name=f"branch{i}")(chunk, shift, (H, W))
            )
        return _dense(C, name="proj", dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1)
        )


class DilatedAttention(nn.Module):
    """Window attention over dilated token grids: tokens are grouped by
    residue modulo `dilated_size` inside a total window, so each window
    spans window_size*dilated_size cells (Dilated_attn,
    Attention.py:233-339)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dilated_size: tuple[int, int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        wh, ww = self.window_size
        dh, dw = self.dilated_size
        h = self.num_heads
        hd = C // h
        # (B, H, W, C) -> dilated windows: split the grid into
        # (total_wh, total_ww) tiles, then stride by (dh, dw) within a tile
        x = x.reshape(B, H // (wh * dh), wh, dh, W // (ww * dw), ww, dw, C)
        x = x.transpose(0, 1, 4, 3, 6, 2, 5, 7).reshape(-1, wh * ww, C)
        B_ = x.shape[0]
        qkv = _dense(3 * C, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(B_, wh * ww, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        tables = rope_ops.rope2_tables(self.window_size, hd)
        q = rope_ops.apply_rope2(q, tables) * hd**-0.5
        k = rope_ops.apply_rope2(k, tables)
        out = dense_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(
            B, H // (wh * dh), W // (ww * dw), dh, dw, wh, ww, C
        )
        out = out.transpose(0, 1, 5, 3, 2, 6, 4, 7).reshape(B, H, W, C)
        return _dense(C, name="proj", dtype=self.dtype)(out)


class GAUAttention(nn.Module):
    """Gated attention unit, quadratic window branch + optional linear
    global branch (Flash_attn, Attention.py:669-814): shared s-dim base,
    per-branch ScaleOffset, squared-relu attention with relative position
    bias, silu-gated output u * (quad + lin)."""

    dim: int
    window_size: tuple[int, int]
    expansion_factor: int = 2
    s: int = 128
    attn_type: str = "lin"  # "lin" | "quad"
    lin_rope_shape: tuple[int, int] = (32, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        win = self.window_size
        N = win[0] * win[1]
        hidden = self.expansion_factor * self.dim
        xw = win_ops.window_partition(x, win)  # (B*nW, N, C)
        B_ = xw.shape[0]
        nW = B_ // B
        uvb = jax.nn.silu(
            _dense(2 * hidden + self.s, name="uv", dtype=self.dtype)(xw)
        )
        u, v, base = jnp.split(uvb, [hidden, 2 * hidden], axis=-1)
        quad_q = ScaleOffset(self.s, name="quad_q")(base)
        quad_k = ScaleOffset(self.s, name="quad_k")(base)
        tables = rope_ops.rope2_tables(win, self.s)
        quad_q = rope_ops.apply_rope2(quad_q, tables) / N
        quad_k = rope_ops.apply_rope2(quad_k, tables)
        logits = jnp.einsum("bns,bms->bnm", quad_q, quad_k,
                            preferred_element_type=jnp.float32)
        logits = RelativePositionalBias(win, 1, name="rel_bias")(
            logits.reshape(B_, 1, N, N)
        ).reshape(B_, N, N)
        quad = jnp.einsum(
            "bnm,bmd->bnd", attn_norm(logits, "squared_relu").astype(v.dtype), v
        )
        out = quad
        if self.attn_type == "lin":
            lin_q = ScaleOffset(self.s, name="lin_q")(base)
            lin_k = ScaleOffset(self.s, name="lin_k")(base)
            # rope over the full grid, not the window
            grid_tables = rope_ops.rope2_tables((H, W), self.s)
            rot = lambda t: win_ops.window_partition(
                rope_ops.apply_rope2(
                    win_ops.window_reverse(t, win, H, W).reshape(B, H * W, -1),
                    grid_tables,
                ).reshape(B, H, W, -1),
                win,
            )
            lin_q, lin_k = rot(lin_q), rot(lin_k)
            lin_kv = jnp.einsum(
                "bns,bnd->bsd",
                lin_k.reshape(B, nW * N, self.s),
                v.reshape(B, nW * N, hidden) / (N * nW),
                preferred_element_type=jnp.float32,
            )
            lin = jnp.einsum(
                "bns,bsd->bnd", lin_q.reshape(B, nW * N, self.s),
                lin_kv.astype(v.dtype),
            ).reshape(B_, N, hidden)
            out = out + lin
        y = _dense(self.dim, name="proj", dtype=self.dtype)(u * out)
        return win_ops.window_reverse(y, win, H, W)


class HydraAttention(nn.Module):
    """Window attention (local or strided-global grouping) with an optional
    hydra branch: normalized k*v global aggregate gating the query path when
    use_attn=False (Hydra_attn, Attention.py:817-958)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    local: bool = True
    use_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        win = self.window_size
        N = win[0] * win[1]
        h = self.num_heads
        hd = C // h
        if self.use_attn:
            xw = win_ops.window_partition(x, win)  # (B*nW, N, C)
            if not self.local:
                # global grouping: attend across windows at fixed in-window
                # position (Attention.py:896)
                nW = xw.shape[0] // B
                xw = xw.reshape(B, nW, N, C).transpose(0, 2, 1, 3)
                xw = xw.reshape(B * N, nW, C)
            B_, M, _ = xw.shape
            qkv = _dense(3 * C, name="qkv", dtype=self.dtype)(xw)
            qkv = qkv.reshape(B_, M, 3, h, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if self.local:
                tables = rope_ops.rope2_tables(win, hd)
                q = rope_ops.apply_rope2(q, tables)
                k = rope_ops.apply_rope2(k, tables)
            out = dense_attention(q * hd**-0.5, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(B_, M, C)
            if not self.local:
                nW = (H // win[0]) * (W // win[1])
                out = out.reshape(B, N, nW, C).transpose(0, 2, 1, 3)
                out = out.reshape(B * nW, N, C)
            y = win_ops.window_reverse(out, win, H, W)
        else:
            kv = _dense(2 * C, name="kv", dtype=self.dtype)(x)
            k, v = jnp.split(kv, 2, axis=-1)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
            hy_kv = jnp.sum((k * v).reshape(B, -1, C), axis=-2, keepdims=True)
            q = _dense(C, name="q", dtype=self.dtype)(x).reshape(B, -1, C)
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
            y = (q * hy_kv).reshape(B, H, W, C)
        return _dense(C, name="proj", dtype=self.dtype)(y)


class HiLoAttention(nn.Module):
    """Hi-Fi local window heads + Lo-Fi pooled-kv global heads, concatenated
    (HiLo, Attention.py:1027-1131). alpha = fraction of Lo-Fi heads."""

    dim: int
    num_heads: int
    window_size: tuple[int, int] = (2, 2)
    alpha: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        l_heads = int(self.num_heads * self.alpha)
        h_heads = self.num_heads - l_heads
        ws = self.window_size
        if ws[0] == 1 and ws[1] == 1:
            l_heads, h_heads = self.num_heads, 0
        l_dim = l_heads * head_dim
        h_dim = h_heads * head_dim
        scale = head_dim**-0.5
        outs = []
        if h_heads > 0:
            xw = win_ops.window_partition(x, ws)  # (B*nW, N, C)
            B_, N = xw.shape[0], ws[0] * ws[1]
            qkv = _dense(3 * h_dim, name="h_qkv", dtype=self.dtype)(xw)
            qkv = qkv.reshape(B_, N, 3, h_heads, head_dim).transpose(
                2, 0, 3, 1, 4
            )
            out = dense_attention(qkv[0] * scale, qkv[1], qkv[2])
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, h_dim)
            hifi = win_ops.window_reverse(out, ws, H, W)
            outs.append(_dense(h_dim, name="h_proj", dtype=self.dtype)(hifi))
        if l_heads > 0:
            q = _dense(l_dim, name="l_q", dtype=self.dtype)(x)
            q = q.reshape(B, H * W, l_heads, head_dim).transpose(0, 2, 1, 3)
            src = nn.avg_pool(x, ws, ws) if max(ws) > 1 else x
            kv = _dense(2 * l_dim, name="l_kv", dtype=self.dtype)(
                src.reshape(B, -1, C)
            )
            kv = kv.reshape(B, -1, 2, l_heads, head_dim).transpose(
                2, 0, 3, 1, 4
            )
            out = dense_attention(q * scale, kv[0], kv[1])
            out = out.transpose(0, 2, 1, 3).reshape(B, H, W, l_dim)
            outs.append(_dense(l_dim, name="l_proj", dtype=self.dtype)(out))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs[::-1], -1)


# --- MoE layers ----------------------------------------------------------------


class MoEDense(nn.Module):
    """Top-1-routed bank of dense experts with capacity dropping.

    The expert bank is a stacked-parameter einsum (E, in, out) — all experts
    compute on all tokens (MXU-cheap at reference expert counts), the
    combine zeroes non-routed slots (ops/moe.py design note). Returns
    (y, z_loss, balance_loss)."""

    features: int
    num_experts: int
    attr_dim: int
    expert_capacity: float = 1.0
    router_noise: float = 1e-2
    is_scale_prob: bool = True
    drop_tokens: bool = True
    act: Callable | None = None
    hidden: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attr=None, deterministic: bool = True):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        attr_t = tokens if attr is None else attr.reshape(B, H * W, -1)
        router = _dense(self.num_experts, name="router")
        rng = None
        if not deterministic and self.has_rng("moe"):
            rng = self.make_rng("moe")
        idx, probs, logits = moe_ops.top1_route(
            attr_t, router, rng, self.router_noise
        )
        z_loss = moe_ops.router_z_loss(logits)
        balance = moe_ops.load_balancing_loss(probs, idx, self.num_experts)

        hid = self.hidden or self.features
        w1 = self.param("w1", _trunc02, (self.num_experts, C, hid))
        b1 = self.param("b1", nn.initializers.zeros, (self.num_experts, hid))
        expert_out = jnp.einsum("btc,ech->ebth", tokens, w1) + b1[:, None, None]
        if self.act is not None:
            expert_out = self.act(expert_out)
            w2 = self.param("w2", _trunc02,
                            (self.num_experts, hid, self.features))
            b2 = self.param(
                "b2", nn.initializers.zeros, (self.num_experts, self.features)
            )
            expert_out = (
                jnp.einsum("ebth,eho->ebto", expert_out, w2)
                + b2[:, None, None]
            )

        flat_idx = idx.reshape(-1)
        mask = moe_ops.capacity_mask(
            flat_idx, self.num_experts, self.expert_capacity, self.drop_tokens
        )
        p_max = jnp.max(probs, axis=-1).reshape(-1)
        y = moe_ops.moe_combine(
            expert_out.reshape(self.num_experts, -1, expert_out.shape[-1]),
            mask, p_max, tokens.reshape(-1, C), self.is_scale_prob,
        )
        return y.reshape(B, H, W, self.features), z_loss, balance


class MoEMlp(nn.Module):
    """MLP with top-1 switch experts (Mlp_withmoe, mlp.py:271-302)."""

    dim: int
    hidden: int
    num_experts: int = 4
    expert_capacity: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attr=None, deterministic: bool = True):
        return MoEDense(
            self.dim, self.num_experts, self.dim, self.expert_capacity,
            act=lambda t: nn.gelu(t, approximate=False), hidden=self.hidden,
            dtype=self.dtype, name="experts",
        )(x, attr, deterministic)


class MoEWindowAttention(nn.Module):
    """SD-style window attention whose qkv and proj projections are top-1
    MoE banks (SD_attn_withmoe, Attention.py:1134-1451). Returns
    (y, z_losses, balance_losses)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    num_experts: int = 4
    shift_size: tuple[int, int] = (0, 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attr=None, deterministic: bool = True):
        B, H, W, C = x.shape
        win = self.window_size
        N = win[0] * win[1]
        h = self.num_heads
        hd = C // h
        qkv, z1, b1 = MoEDense(
            3 * C, self.num_experts, C, dtype=self.dtype, name="qkv_moe"
        )(x, attr, deterministic)
        core = _WindowCore(win, h, name="core")(
            qkv, self.shift_size, (H, W)
        )
        y, z2, b2 = MoEDense(
            C, self.num_experts, C, dtype=self.dtype, name="proj_moe"
        )(core, attr, deterministic)
        return y, (z1 + z2), (b1 + b2)


# --- MLP zoo -------------------------------------------------------------------


class GluMlp(nn.Module):
    """GLU-gated MLP (mlp.py:35-64); sigmoid gate on the second half."""

    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        val, gates = jnp.split(y, 2, axis=-1)
        return _dense(self.dim, name="fc2", dtype=self.dtype)(
            val * jax.nn.sigmoid(gates)
        )


class GatedMlp(nn.Module):
    """gMLP spatial gating over (B, H, W, C): split hidden, layernorm the
    gate half, mix it spatially with a learned (HW, HW) linear, multiply
    (mlp.py:67-121). Residual inside, matching the reference."""

    dim: int
    hidden: int | None = None
    get_weight: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        hidden = self.hidden or (C if self.get_weight else 2 * C)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        y = nn.gelu(_dense(hidden, name="fc1", dtype=self.dtype)(y),
                    approximate=False)
        if self.get_weight:
            u, v = y, None
        else:
            u, v = jnp.split(y, 2, axis=-1)
        u = nn.LayerNorm(epsilon=1e-6, name="norm1")(u)
        u = u.reshape(B, H * W, -1).transpose(0, 2, 1)
        u = _dense(H * W, name="spatial_fc", dtype=self.dtype)(u)
        u = u.transpose(0, 2, 1).reshape(B, H, W, -1)
        if self.get_weight:
            return u
        y = _dense(self.dim, name="fc2", dtype=self.dtype)((u + 1.0) * v)
        return y + shortcut


class ConvMlp(nn.Module):
    """1x1 conv MLP with channel-first semantics folded into dense layers
    (mlp.py:123-144)."""

    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        y = jax.nn.relu(y)
        return _dense(self.dim, name="fc2", dtype=self.dtype)(y)


class MAGMlp(nn.Module):
    """Multi-axis gated MLP (MAXIM; mlp.py:147-183): channel-split into a
    local branch (windows) and a global branch (grid-strided windows), each
    through a GatedMlp, concatenated with an outer residual."""

    dim: int
    window_size: tuple[int, int] = (4, 8)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        wh, ww = self.window_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        y = nn.gelu(_dense(C, name="fc1", dtype=self.dtype)(y),
                    approximate=False)
        lb, gb = jnp.split(y, 2, axis=-1)
        # local: plain windows
        lw = win_ops.window_partition(lb, (wh, ww)).reshape(-1, wh, ww, C // 2)
        lw = GatedMlp(C // 2, dtype=self.dtype, name="local_gmlp")(lw)
        lb = win_ops.window_reverse(lw.reshape(-1, wh * ww, C // 2),
                                    (wh, ww), H, W)
        # global: grid partition (gh, gw) tiles -> windows of shape (wh, ww)
        gh, gw = H // wh, W // ww
        gwnd = gb.reshape(B, wh, gh, ww, gw, C // 2).transpose(0, 2, 4, 1, 3, 5)
        gwnd = gwnd.reshape(-1, wh, ww, C // 2)
        gwnd = GatedMlp(C // 2, dtype=self.dtype, name="global_gmlp")(gwnd)
        gb = gwnd.reshape(B, gh, gw, wh, ww, C // 2).transpose(
            0, 3, 1, 4, 2, 5
        ).reshape(B, H, W, C // 2)
        y = _dense(self.dim, name="fc2", dtype=self.dtype)(
            jnp.concatenate([lb, gb], axis=-1)
        )
        return shortcut + y


class RCAB(nn.Module):
    """Residual channel-attention block: norm -> periodic-pad 3x3 conv x2
    -> squeeze-excite -> residual (mlp.py:185-212)."""

    dim: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        y = periodic_pad2d(y, (1, 1))
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1",
                    dtype=self.dtype)(y)
        y = nn.leaky_relu(y)
        y = periodic_pad2d(y, (1, 1))
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2",
                    dtype=self.dtype)(y)
        y = SEBlock(self.dim, self.reduction, self.dtype, name="se")(y)
        return shortcut + y


class RDCAB(nn.Module):
    """Residual dense channel-attention block: norm -> MLP -> SE -> residual
    (mlp.py:214-228)."""

    dim: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        y = _dense(self.dim, name="fc1", dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = _dense(self.dim, name="fc2", dtype=self.dtype)(y)
        y = SEBlock(self.dim, self.reduction, self.dtype, name="se")(y)
        return shortcut + y


class DWMlp(nn.Module):
    """MLP with a 3x3 depthwise conv between fc1 and activation — positional
    information without explicit encodings (mlp.py:231-269)."""

    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        y = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, name="dwconv",
                    dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        return _dense(self.dim, name="fc2", dtype=self.dtype)(y)


# --- blocks -------------------------------------------------------------------


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block with periodic (lon-wrap) padding and grouped dwconv
    (Convnet_block, Blocks.py:12-50). groups=12 as in the reference."""

    dim: int
    kernel_size: tuple[int, int] = (4, 8)
    groups: int = 12
    layer_scale_init: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        kh, kw = self.kernel_size
        y = periodic_pad2d(x, (kh // 2, kw // 2))
        y = nn.Conv(self.dim, self.kernel_size, padding="VALID",
                    feature_group_count=self.groups, name="dwconv",
                    dtype=self.dtype)(y)
        # even kernels + symmetric pad overshoot by 1; crop to input size
        y = y[:, : x.shape[1], : x.shape[2]]
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = _dense(4 * self.dim, name="pwconv1", dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = _dense(self.dim, name="pwconv2", dtype=self.dtype)(y)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            y = gamma * y
        return shortcut + y


class HiLoBlock(nn.Module):
    """Pre/post-norm HiLo attention + DWMlp block (Hilo_Block,
    Blocks.py:162-197)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int = 1
    mlp_ratio: float = 4.0
    alpha: float = 0.9
    pre_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        attn = HiLoAttention(self.dim, self.num_heads, self.window_size,
                             self.alpha, self.dtype, name="attn")
        mlp = DWMlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                    name="convffn")
        n1 = nn.LayerNorm(epsilon=1e-6, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-6, name="norm2")
        if self.pre_norm:
            x = x + attn(n1(x))
            return x + mlp(n2(x))
        x = n1(x + attn(x))
        return n2(x + mlp(x))


class ConvFFNBlock(nn.Module):
    """Norm + DWMlp residual block, no attention (ConvFFNBlock,
    Blocks.py:199-229)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + DWMlp(self.dim, int(self.dim * self.mlp_ratio),
                         self.dtype, name="mlp")(y)


class MoEWindowBlock(nn.Module):
    """Pre-norm transformer block with MoE attention + MoE MLP
    (Windowattn_block_withmoe, Blocks.py:232-319). Returns
    (x, z_losses, balance_losses)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int = 1
    mlp_ratio: float = 4.0
    num_experts: int = 4
    shift_size: tuple[int, int] = (0, 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attr=None, deterministic: bool = True):
        y, z1, b1 = MoEWindowAttention(
            self.dim, self.window_size, self.num_heads, self.num_experts,
            self.shift_size, self.dtype, name="attn",
        )(nn.LayerNorm(epsilon=1e-6, name="norm")(x), attr, deterministic)
        x = x + y
        y, z2, b2 = MoEMlp(
            self.dim, int(self.dim * self.mlp_ratio), self.num_experts,
            dtype=self.dtype, name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, name="norm2")(x), attr, deterministic)
        return x + y, (z1, z2), (b1, b2)


# --- ViT / MAE blocks -----------------------------------------------------------


class ViTAttention(nn.Module):
    """Plain token MHSA over (B, N, C) (mae_utils.py:157-181)."""

    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = _dense(3 * C, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        out = dense_attention(qkv[0] * hd**-0.5, qkv[1], qkv[2])
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return _dense(C, name="proj", dtype=self.dtype)(out)


class ViTCrossAttention(nn.Module):
    """Query tokens attend to a context sequence (mae_utils.py:184-213)."""

    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        q = _dense(C, name="q", dtype=self.dtype)(x)
        kv = _dense(2 * C, name="kv", dtype=self.dtype)(context)
        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        kv = kv.reshape(B, -1, 2, h, hd).transpose(2, 0, 3, 1, 4)
        out = dense_attention(q * hd**-0.5, kv[0], kv[1])
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return _dense(C, name="proj", dtype=self.dtype)(out)


class ViTBlock(nn.Module):
    """Pre-norm ViT encoder block (mae_utils.py:216-231)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x + ViTAttention(self.dim, self.num_heads, self.dtype,
                             name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = _dense(int(self.dim * self.mlp_ratio), name="fc1",
                   dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        return x + _dense(self.dim, name="fc2", dtype=self.dtype)(y)


class ViTDecoderBlock(nn.Module):
    """Pre-norm decoder block: self-attn, cross-attn to context, MLP
    (mae_utils.py:234-252)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        x = x + ViTAttention(self.dim, self.num_heads, self.dtype,
                             name="self_attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        )
        x = x + ViTCrossAttention(self.dim, self.num_heads, self.dtype,
                                  name="cross_attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm_q")(x),
            nn.LayerNorm(epsilon=1e-6, name="norm_ctx")(context),
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = _dense(int(self.dim * self.mlp_ratio), name="fc1",
                   dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        return x + _dense(self.dim, name="fc2", dtype=self.dtype)(y)
