"""LGUnet: Swin-transformer U-Net backbone (flax.linen, channel-last).

One module covers both reference generations (see SURVEY.md section 1): the
macro topology Enc_net -> LG_net -> Dec_net with per-variable-group encoders
and decoders, U-Net skip connections, and a global/windowed transformer stack
at the coarse resolution. Behavioral reference:

- new-gen: networks/LGUnet_all.py:742-777 (`LGUnet_all_1`), SD_attn with RoPE
  (networks/utils/Attention.py:467-664), full-grid attention in LG stage 0
  (networks/LGUnet_all.py:689);
- old-gen: networks_old/transformer.py:716-752 (`LGUnet_all`),
  SwinTransformerBlock with relative-position-bias + optional LoRA q rank
  (networks_old/utils/swinblock.py:64-309).

TPU-first choices: NHWC layout end to end, static numpy masks / RoPE tables
baked at trace time, optional `jax.checkpoint` per block, dense-or-flash
attention dispatch on window token count, bf16 compute with f32 params.

Dropout / drop-path are zero in every shipped reference config and are not
implemented; modules are deterministic.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.config import LGUnetConfig
from vaevar_tpu.ops import attention as attn_ops
from vaevar_tpu.ops import rope as rope_ops
from vaevar_tpu.ops import windows as win_ops

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _dense(feat, name=None, use_bias=True, dtype=None):
    return nn.Dense(
        feat,
        name=name,
        use_bias=use_bias,
        kernel_init=_trunc02,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
    )


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(N, N) index into the (2wh-1)*(2ww-1) relative position bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """Shifted-window MHSA over (B, H, W, C) with RoPE or rel-pos-bias."""

    dim: int
    num_heads: int
    window_size: tuple[int, int]
    shift_size: tuple[int, int]
    resolution: tuple[int, int]
    attn_type: str = "rope"  # "rope" | "relbias"
    lora_rank: int = 0
    dtype: Any = None
    flash_min_seq: int = 4096

    def setup(self):
        H, W = self.resolution
        wh, ww = self.window_size
        sh, sw = self.shift_size
        if self.attn_type == "relbias":
            # old-gen clamp: window cannot exceed the grid
            # (networks_old/utils/swinblock.py:220-223)
            if min(H, W) <= min(wh, ww):
                wh = ww = min(H, W)
                sh = sw = 0
        self._win = (wh, ww)
        self._shift = (sh, sw)
        N = wh * ww
        head_dim = self.dim // self.num_heads
        self.scale = head_dim**-0.5

        self.qkv = _dense(self.dim * 3, name="qkv", dtype=self.dtype)
        self.proj = _dense(self.dim, name="proj", dtype=self.dtype)
        if self.lora_rank > 0:
            self.qA = _dense(self.lora_rank, name="qA", use_bias=False, dtype=self.dtype)
            self.qB = nn.Dense(
                self.dim,
                name="qB",
                use_bias=False,
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
            )

        if self.attn_type == "rope":
            self._rope_tables = rope_ops.rope2_tables(self._win, head_dim)
            neg = -np.inf
        else:
            self.rel_bias_table = self.param(
                "rel_bias_table",
                _trunc02,
                ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
            )
            self._rel_index = _relative_position_index(wh, ww).reshape(-1)
            # old-gen uses -100 rather than -inf (swinblock.py:258)
            neg = -100.0
        self._mask = win_ops.swin_attention_mask(H, W, self._win, self._shift, neg=neg)

    def __call__(self, x):
        B, H, W, C = x.shape
        wh, ww = self._win
        sh, sw = self._shift
        N = wh * ww
        h = self.num_heads
        hd = C // h

        if sh or sw:
            x = win_ops.shift2d(x, -sh, -sw)
        xw = win_ops.window_partition(x, self._win)  # (B*nW, N, C)
        B_ = xw.shape[0]

        qkv = self.qkv(xw)
        if self.lora_rank > 0:
            q_lora = self.qB(self.qA(xw))
            qkv = qkv.at[..., :C].add(q_lora)
        qkv = qkv.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, h, N, hd)

        if self.attn_type == "rope":
            q = rope_ops.apply_rope2(q, self._rope_tables)
            k = rope_ops.apply_rope2(k, self._rope_tables)
            q = q * self.scale
            out = attn_ops.window_attention_core(
                q, k, v, self._mask, self.flash_min_seq
            )
        else:
            q = q * self.scale
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            )
            bias = self.rel_bias_table[self._rel_index].reshape(N, N, h)
            logits = logits + bias.transpose(2, 0, 1)[None]
            if self._mask is not None:
                nW = self._mask.shape[0]
                logits = logits.reshape(B_ // nW, nW, h, N, N)
                logits = logits + jnp.asarray(self._mask)[None, :, None]
                logits = logits.reshape(B_, h, N, N)
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", w, v)

        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        x = win_ops.window_reverse(out, self._win, H, W)
        if sh or sw:
            x = win_ops.shift2d(x, sh, sw)
        return self.proj(x)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return _dense(self.dim, name="fc2", dtype=self.dtype)(x)


class Block(nn.Module):
    """Pre-norm window-attention transformer block (Blocks.py:103-159)."""

    dim: int
    num_heads: int
    window_size: tuple[int, int]
    shift_size: tuple[int, int]
    resolution: tuple[int, int]
    attn_type: str
    lora_rank: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = None
    flash_min_seq: int = 4096

    @nn.compact
    def __call__(self, x):
        attn = WindowAttention(
            self.dim,
            self.num_heads,
            self.window_size,
            self.shift_size,
            self.resolution,
            self.attn_type,
            self.lora_rank,
            self.dtype,
            self.flash_min_seq,
            name="attn",
        )
        x = x + attn(nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp")(y)
        return x


def _block_cls(remat: bool):
    return nn.remat(Block) if remat else Block


def _make_blocks(cfg: LGUnetConfig, dim, heads, depth, resolution, window, prefix):
    """Blocks with alternating shift (even: none, odd: window//2)."""
    cls = _block_cls(cfg.remat)
    blocks = []
    for i in range(depth):
        shift = (0, 0) if i % 2 == 0 else (window[0] // 2, window[1] // 2)
        blk = cls(
            dim=dim,
            num_heads=heads,
            window_size=window,
            shift_size=shift,
            resolution=resolution,
            attn_type=cfg.attn_type,
            lora_rank=cfg.lora_rank,
            mlp_ratio=cfg.mlp_ratio,
            dtype=cfg.dtype,
            flash_min_seq=cfg.flash_min_seq,
            name=f"{prefix}_blk{i}",
        )
        blocks.append(blk)
    return blocks


def _apply_blocks(blocks, x, remat: bool):
    del remat  # remat is baked into the block class
    for blk in blocks:
        x = blk(x)
    return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + norm + linear 4C->2C (LGUnet_all.py:62-97)."""

    dim: int  # input dim C; output 2C

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return _dense(2 * self.dim, name="reduction", use_bias=False)(x)


class PatchExpand(nn.Module):
    """Linear C->2C + depth-to-space 2x2 + norm (LGUnet_all.py:100-119)."""

    dim: int  # input dim C; output C//2

    @nn.compact
    def __call__(self, x):
        x = _dense(2 * self.dim, name="expand", use_bias=False)(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H, W, 2, 2, C // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 4)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class GroupEncoder(nn.Module):
    """Per-variable-group hierarchical encoder (Transformer_Encoder)."""

    cfg: LGUnetConfig
    in_chans: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        pr = cfg.patches_resolution
        # patch embed: conv k=patch_size s=stride, then flatten + abs pos emb
        x = nn.Conv(
            cfg.enc_dim,
            kernel_size=cfg.patch_size,
            strides=cfg.stride,
            padding="VALID",
            name="patch_embed",
            dtype=cfg.dtype,
        )(x)
        pos = self.param("pos_embed", _trunc02, (1, pr[0], pr[1], cfg.enc_dim))
        x = x + pos

        downsamples = []
        L = len(cfg.enc_depths)
        for i in range(L):
            dim = cfg.enc_dim * 2**i
            res = (pr[0] // 2**i, pr[1] // 2**i)
            if i > 0:
                x = PatchMerging(dim // 2, name=f"merge{i}")(x)
            blocks = _make_blocks(
                cfg, dim, cfg.enc_heads[i], cfg.enc_depths[i], res,
                cfg.window_size, f"enc{i}",
            )
            x = _apply_blocks(blocks, x, cfg.remat)
            downsamples.append(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, downsamples


class GroupDecoder(nn.Module):
    """Per-variable-group hierarchical decoder with U-Net skips."""

    cfg: LGUnetConfig

    @nn.compact
    def __call__(self, x, downsamples):
        cfg = self.cfg
        pr = cfg.patches_resolution
        L = len(cfg.enc_depths)
        for i in range(L):
            dim = cfg.enc_dim * 2 ** (L - 1 - i)
            res = (pr[0] // 2 ** (L - 1 - i), pr[1] // 2 ** (L - 1 - i))
            skip = downsamples[L - 1 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            x = _dense(dim, name=f"concat_back{i}", dtype=cfg.dtype)(x)
            blocks = _make_blocks(
                cfg, dim, cfg.enc_heads[L - 1 - i], cfg.enc_depths[L - 1 - i],
                res, cfg.window_size, f"dec{i}",
            )
            x = _apply_blocks(blocks, x, cfg.remat)
            if i < L - 1:
                x = PatchExpand(dim, name=f"expand{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm_up")(x)


class LGStack(nn.Module):
    """Coarse-resolution global/windowed transformer (LG_net)."""

    cfg: LGUnetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        Hg, Wg = cfg.lg_resolution
        pos = self.param("pos_embed", _trunc02, (1, Hg, Wg, cfg.embed_dim))
        x = x + pos
        for li, (depth, heads) in enumerate(zip(cfg.lg_depths, cfg.lg_heads)):
            if li == 0 and cfg.lg_full_attn_first:
                window = (Hg, Wg)  # full-grid attention, never shifted
                cls = _block_cls(cfg.remat)
                blocks = []
                for i in range(depth):
                    blocks.append(
                        cls(
                            dim=cfg.embed_dim,
                            num_heads=heads,
                            window_size=window,
                            shift_size=(0, 0),
                            resolution=(Hg, Wg),
                            attn_type=cfg.attn_type,
                            lora_rank=cfg.lora_rank,
                            mlp_ratio=cfg.mlp_ratio,
                            dtype=cfg.dtype,
                            flash_min_seq=cfg.flash_min_seq,
                            name=f"lg{li}_blk{i}",
                        )
                    )
            else:
                blocks = _make_blocks(
                    cfg, cfg.embed_dim, heads, depth, (Hg, Wg),
                    cfg.window_size, f"lg{li}",
                )
            x = _apply_blocks(blocks, x, cfg.remat)
        return x


class LGUnet(nn.Module):
    """Full backbone. Input (B, C_in, H, W) -> output (B, 2*C_out', H, W).

    Output layout matches the reference Dec_net (LGUnet_all.py:624-650):
    concat of per-group first-half channels ("mean"), then per-group
    second-half channels ("std"). For even per-group channel counts the
    first `sum(outchans)//2` channels are the mean forecast.
    """

    cfg: LGUnetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        if cfg.dtype is not None:
            x = x.astype(cfg.dtype)

        # --- Enc_net: per-group encoders + linear fuse
        splits = np.cumsum(cfg.inchans_list)[:-1]
        groups = jnp.split(x, splits, axis=-1)
        feats, skips = [], []
        for gi, g in enumerate(groups):
            f, ds = GroupEncoder(cfg, cfg.inchans_list[gi], name=f"enc_g{gi}")(g)
            feats.append(f)
            skips.append(ds)
        fused = _dense(cfg.embed_dim, name="enc_proj", dtype=cfg.dtype)(
            jnp.concatenate(feats, axis=-1)
        )

        # --- LG_net at coarse resolution
        out = LGStack(cfg, name="lg")(fused)

        # --- Dec_net: linear proj -> split per group -> decoders -> conv heads
        L = len(cfg.enc_depths)
        gdim = cfg.enc_dim * 2 ** (L - 1)
        out = _dense(gdim * cfg.n_groups, name="dec_proj", dtype=cfg.dtype)(out)
        parts = jnp.split(out, cfg.n_groups, axis=-1)
        means, stds = [], []
        for gi, p in enumerate(parts):
            d = GroupDecoder(cfg, name=f"dec_g{gi}")(p, skips[gi])
            head = nn.ConvTranspose(
                cfg.outchans_list[gi],
                kernel_size=cfg.patch_size,
                strides=cfg.stride,
                padding="VALID",
                name=f"head_g{gi}",
                dtype=cfg.dtype,
            )(d)
            c = cfg.outchans_list[gi]
            means.append(head[..., : c // 2])
            stds.append(head[..., c // 2 :])
        y = jnp.concatenate(means + stds, axis=-1)
        y = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)  # NHWC -> NCHW
        return y
