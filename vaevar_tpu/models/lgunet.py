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

TPU-first choices:
- NHWC layout end to end; static numpy masks / RoPE tables baked at trace
  time; bf16 compute with f32 params;
- `nn.scan` over block pairs and `nn.vmap` over the 5 identical variable
  groups: the traced graph stays small (fast XLA compiles) and parameters
  stack along a leading axis;
- optional `jax.checkpoint` per scanned pair (activation recompute);
- dense-or-flash attention dispatch on window token count (the 0.25deg
  full-grid LG stage uses O(N) flash attention with a custom VJP).

Dropout / drop-path are zero in every shipped reference config and are not
implemented; modules are deterministic.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.config import LGUnetConfig
from vaevar_tpu.ops import attention as attn_ops
from vaevar_tpu.ops import posenc as posenc_ops
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


class WindowAttention(nn.Module):
    """Shifted-window MHSA over (B, H, W, C) with RoPE or rel-pos-bias.

    Covers SD_attn's full parameter surface (Attention.py:467-664): 2-D
    windows (the production configs) plus the dilated-token-group path
    (`dilated_size` > 1, Attention.py:475-489,600-609) and 3-D
    (time, lat, lon) windows over (B, T, H, W, C) inputs with rope3
    (Attention.py:543-565). Dilated/3-D run the general einsum path and
    require attn_type="rope" (the old-gen relbias block has neither)."""

    dim: int
    num_heads: int
    window_size: tuple[int, ...]
    shift_size: tuple[int, ...]
    resolution: tuple[int, ...]
    attn_type: str = "rope"  # "rope" | "relbias"
    lora_rank: int = 0
    dtype: Any = None
    flash_min_seq: int = 4096
    dilated_size: tuple[int, ...] | None = None  # None => all ones

    def setup(self):
        nd = len(self.window_size)
        dil = tuple(self.dilated_size) if self.dilated_size else (1,) * nd
        if nd == 3 or any(d > 1 for d in dil):
            if self.attn_type != "rope":
                raise ValueError(
                    "dilated/3-D windows exist only in SD_attn "
                    "(attn_type='rope'); the old-gen relbias block has "
                    "neither (Attention.py:467 vs swinblock.py:64)"
                )
            self._setup_general(dil)
            return
        self._general = False
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
            self.qA = _dense(self.lora_rank, name="qA", use_bias=False,
                             dtype=self.dtype)
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
            T = (2 * wh - 1) * (2 * ww - 1)
            self.rel_bias_table = self.param("rel_bias_table", _trunc02,
                                             (T, self.num_heads))
            # one-hot matmul instead of gather (shared builder with the
            # fused Pallas block; see ops/posenc.relative_position_onehot)
            self._rel_onehot = posenc_ops.relative_position_onehot((wh, ww))
            # old-gen uses -100 rather than -inf (swinblock.py:258)
            neg = -100.0
        self._mask = win_ops.swin_attention_mask(H, W, self._win, self._shift,
                                                 neg=neg)

    def _setup_general(self, dil):
        """SD_attn general path: dilated groups and/or 3-D windows."""
        self._general = True
        self._win = tuple(self.window_size)
        self._shift = tuple(self.shift_size)
        self._dil = dil
        self._total = tuple(w * d for w, d in zip(self._win, dil))
        head_dim = self.dim // self.num_heads
        self.scale = head_dim**-0.5
        self.qkv = _dense(self.dim * 3, name="qkv", dtype=self.dtype)
        self.proj = _dense(self.dim, name="proj", dtype=self.dtype)
        if self.lora_rank > 0:
            self.qA = _dense(self.lora_rank, name="qA", use_bias=False,
                             dtype=self.dtype)
            self.qB = nn.Dense(self.dim, name="qB", use_bias=False,
                               kernel_init=nn.initializers.zeros,
                               dtype=self.dtype)
        if len(self._win) == 3:
            self._rope_tables = rope_ops.rope3_tables(self._win, head_dim)
        else:
            self._rope_tables = rope_ops.rope2_tables(self._win, head_dim)
        self._mask = win_ops.sd_attention_mask(
            self.resolution, self._win, self._shift, dil, neg=-np.inf
        )

    def _call_general(self, x):
        """x: (B, *grid, C) with grid of len(window_size) axes. Token
        groups are the window_size lattice strided by dilated_size inside
        each total window (Attention.py:600-609); shift engages only when
        the longitude component is nonzero (Attention.py:585-589)."""
        win, dil, shift = self._win, self._dil, self._shift
        nd = len(win)
        grid = x.shape[1:-1]
        B, C = x.shape[0], x.shape[-1]
        h = self.num_heads
        hd = C // h
        N = int(np.prod(win))
        spatial_axes = tuple(range(1, 1 + nd))

        engage = shift[-1] > 0
        if engage:
            x = jnp.roll(x, tuple(-s for s in shift), axis=spatial_axes)

        # partition: grid axis g -> (n, w, d); groups are (n..., d...),
        # tokens are the (w...) raster — SD_attn's regrouped batch order
        rs = [B]
        for g, w, d in zip(grid, win, dil):
            rs += [g // (w * d), w, d]
        xw = x.reshape(*rs, C)
        n_axes = [1 + 3 * i for i in range(nd)]
        w_axes = [2 + 3 * i for i in range(nd)]
        d_axes = [3 + 3 * i for i in range(nd)]
        perm = [0] + n_axes + d_axes + w_axes + [1 + 3 * nd]
        xw = xw.transpose(perm).reshape(-1, N, C)
        B_ = xw.shape[0]

        qkv = self.qkv(xw)
        if self.lora_rank > 0:
            qkv = qkv.at[..., :C].add(self.qB(self.qA(xw)))
        qkv = qkv.reshape(B_, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, h, N, hd)

        apply_rope = (rope_ops.apply_rope3 if nd == 3
                      else rope_ops.apply_rope2)
        q = apply_rope(q, self._rope_tables) * self.scale
        k = apply_rope(k, self._rope_tables)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        if self._mask is not None:
            nW = self._mask.shape[0]
            logits = logits.reshape(B_ // nW, nW, h, N, N)
            logits = logits + jnp.asarray(self._mask)[None, :, None]
            logits = logits.reshape(B_, h, N, N)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", w, v)
        out = out.transpose(0, 2, 1, 3)  # (B_, N, h, hd)

        # inverse of the partition transpose
        inv_shape = (
            [B]
            + [g // (w_ * d_) for g, w_, d_ in zip(grid, win, dil)]
            + list(dil) + list(win) + [C]
        )
        out = out.reshape(inv_shape)
        inv_perm = [0] * (2 + 3 * nd)
        for dst, src in enumerate(perm):
            inv_perm[src] = dst
        x = out.transpose(inv_perm).reshape(B, *grid, C)
        if engage:
            x = jnp.roll(x, shift, axis=spatial_axes)
        return self.proj(x)

    def __call__(self, x):
        if self._general:
            return self._call_general(x)
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
            bias = jnp.einsum(
                "nt,th->nh", jnp.asarray(self._rel_onehot),
                self.rel_bias_table.astype(jnp.float32),
            ).reshape(N, N, h)
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
    window_size: tuple[int, ...]
    shift_size: tuple[int, ...]
    resolution: tuple[int, ...]
    attn_type: str
    lora_rank: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = None
    flash_min_seq: int = 4096
    dilated_size: tuple[int, ...] | None = None  # SD_attn dilated groups
    # NOTE round 4: the fused Pallas Swin block integration (a `fuse`
    # flag routing relbias blocks through a fused_swin_block kernel)
    # was REMOVED after three rounds of measurement: forward-fused blocks
    # match modular XLA +-5% (docs/PERF.md rounds 1/3), and the round-4
    # MFU/remat probes show the enc/dec stages are latency-bound by the
    # architecture's tiny dims (C=96 matmuls at ~7 TF/s vs the 117 TF/s
    # roofline, ~80 us/op floor under XLA AND Mosaic alike) — no fusion
    # can aggregate past that without changing the model. Round 5's
    # batch-scaling probe (docs/PERF.md) closed the remaining reuse case
    # and the orphaned kernel was pruned (git history: ops/fused_block.py).

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
            dilated_size=self.dilated_size,
            name="attn",
        )
        # old-gen blocks never receive the eps=1e-6 norm partial and fall
        # back to the torch default (networks_old/transformer.py:179-195 vs
        # swinblock.py:226); mirrored for checkpoint parity
        eps = 1e-5 if self.attn_type == "relbias" else 1e-6
        x = x + attn(nn.LayerNorm(epsilon=eps, dtype=self.dtype,
                                  name="norm1")(x))
        y = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                    name="mlp")(y)
        return x


class _BlockPair(nn.Module):
    """Unshifted block followed by a shifted block (scan body)."""

    kw: dict

    @nn.compact
    def __call__(self, x, _):
        kw = dict(self.kw)
        window = kw["window_size"]
        zero = (0,) * len(window)
        x = Block(**kw, shift_size=zero, name="b0")(x)
        x = Block(**kw, shift_size=tuple(w // 2 for w in window),
                  name="b1")(x)
        return x, None


class _BlockOne(nn.Module):
    """Single unshifted block (scan body for the full-grid LG stage)."""

    kw: dict

    @nn.compact
    def __call__(self, x, _):
        zero = (0,) * len(self.kw["window_size"])
        x = Block(**self.kw, shift_size=zero, name="b")(x)
        return x, None


class BlockStack(nn.Module):
    """`depth` blocks with alternating shift, compiled as nn.scan over pairs.

    Scanning keeps the traced graph one-pair deep regardless of depth —
    critical for XLA compile time at 12+ LG blocks — with params stacked
    along the scan axis. `shifted=False` scans single unshifted blocks.
    """

    cfg: LGUnetConfig
    dim: int
    num_heads: int
    depth: int
    resolution: tuple[int, ...]
    window: tuple[int, ...]
    shifted: bool = True
    dilated: bool = True  # apply cfg.dilated_size (off for full-grid LG0)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dil = None
        if self.dilated and any(d > 1 for d in cfg.dilated_size):
            # SD_attn trims a longer dilated list to the window rank
            # (Attention.py:475)
            dil = tuple(cfg.dilated_size[-len(self.window):])
        kw = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=self.window,
            resolution=self.resolution,
            attn_type=cfg.attn_type,
            lora_rank=cfg.lora_rank,
            mlp_ratio=cfg.mlp_ratio,
            dtype=cfg.dtype,
            flash_min_seq=cfg.flash_min_seq,
            dilated_size=dil,
        )
        if self.shifted and self.depth % 2 == 0:
            body, length = _BlockPair, self.depth // 2
        elif not self.shifted:
            body, length = _BlockOne, self.depth
        else:  # odd shifted depth: unscanned fallback
            for i in range(self.depth):
                shift = (0,) * len(self.window) if i % 2 == 0 else tuple(
                    w // 2 for w in self.window)
                x = Block(**kw, shift_size=shift, name=f"blk{i}")(x)
            return x
        if cfg.remat:
            body = nn.remat(body, prevent_cse=False)
        if length == 1:  # no scan machinery for a single body
            x, _ = body(kw, name="scan")(x, None)
            return x
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=length,
        )
        x, _ = scanned(kw, name="scan")(x, None)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + norm + linear 4C->2C (LGUnet_all.py:62-97)."""

    dim: int  # input dim C; output 2C

    # NOTE: stage-boundary ops intentionally run in f32 with the
    # original dtype promotion semantics — threading bf16 through them
    # (and pre-casting pos_embed) measured ~15% SLOWER per cost+grad on
    # v5e (docs/PERF.md "dtype threading" entry).
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

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        pr = cfg.patches_resolution
        x = nn.Conv(
            cfg.enc_dim,
            kernel_size=cfg.patch_size,
            strides=cfg.stride,
            padding="VALID",
            name="patch_embed",
            dtype=cfg.dtype,
        )(x)
        pos = self.param("pos_embed", _trunc02, (1, pr[0], pr[1], cfg.enc_dim))
        x = x + pos  # f32 promotion of the stream is deliberate, see
        # PatchMerging note

        downsamples = []
        L = len(cfg.enc_depths)
        for i in range(L):
            dim = cfg.enc_dim * 2**i
            res = (pr[0] // 2**i, pr[1] // 2**i)
            if i > 0:
                x = PatchMerging(dim // 2, name=f"merge{i}")(x)
            x = BlockStack(
                cfg, dim, cfg.enc_heads[i], cfg.enc_depths[i], res,
                cfg.window_size, name=f"enc{i}",
            )(x)
            downsamples.append(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, downsamples


class GroupDecoder(nn.Module):
    """Per-variable-group hierarchical decoder with U-Net skips + conv head."""

    cfg: LGUnetConfig
    out_chans: int

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
            x = BlockStack(
                cfg, dim, cfg.enc_heads[L - 1 - i], cfg.enc_depths[L - 1 - i],
                res, cfg.window_size, name=f"dec{i}",
            )(x)
            if i < L - 1:
                x = PatchExpand(dim, name=f"expand{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm_up")(x)
        return nn.ConvTranspose(
            self.out_chans,
            kernel_size=cfg.patch_size,
            strides=cfg.stride,
            padding="VALID",
            name="head",
            dtype=cfg.dtype,
        )(x)


class LGStack(nn.Module):
    """Coarse-resolution global/windowed transformer (LG_net)."""

    cfg: LGUnetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        Hg, Wg = cfg.lg_resolution
        pos = self.param("pos_embed", _trunc02, (1, Hg, Wg, cfg.embed_dim))
        x = x + pos
        lg_win = cfg.lg_window
        win3d = len(lg_win) == 3
        if win3d:
            # LG_net's 3-D branch reshapes to (B, T=1, H, W, C) and the
            # swin stages run 3-D windows + rope3 (LGUnet_all.py:731-734)
            x = x[:, None]
        for li, (depth, heads) in enumerate(zip(cfg.lg_depths, cfg.lg_heads)):
            full = li == 0 and cfg.lg_full_attn_first
            if full:
                # full-grid stage is 2-D regardless (LG_net passes the
                # [H, W] window for i_layer==0, LGUnet_all.py:689)
                xf = x[:, 0] if win3d else x
                xf = BlockStack(
                    cfg, cfg.embed_dim, heads, depth, (Hg, Wg), (Hg, Wg),
                    shifted=False, dilated=False, name=f"lg{li}",
                )(xf)
                x = xf[:, None] if win3d else xf
                continue
            x = BlockStack(
                cfg,
                cfg.embed_dim,
                heads,
                depth,
                (1, Hg, Wg) if win3d else (Hg, Wg),
                lg_win,
                shifted=True,
                name=f"lg{li}",
            )(x)
        return x[:, 0] if win3d else x


def _uniform_groups(chans: tuple[int, ...]) -> bool:
    return len(chans) > 2 and len(set(chans[1:])) == 1


class LGUnet(nn.Module):
    """Full backbone. Input (B, C_in, H, W) -> output (B, C_out, H, W).

    Output layout matches the reference Dec_net (LGUnet_all.py:624-650):
    concat of per-group first-half channels ("mean"), then per-group
    second-half channels ("std"). For even per-group channel counts the
    first `sum(outchans)//2` channels are the mean forecast.

    The 5 identical upper-air groups run under one nn.vmap (stacked params,
    one traced program); group 0 (surface) runs standalone.
    """

    cfg: LGUnetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        if cfg.dtype is not None:
            x = x.astype(cfg.dtype)

        vmap_groups = _uniform_groups(cfg.inchans_list) and _uniform_groups(
            cfg.outchans_list
        )
        splits = np.cumsum(cfg.inchans_list)[:-1]
        groups = jnp.split(x, splits, axis=-1)

        # --- Enc_net: per-group encoders + linear fuse
        if vmap_groups:
            f0, ds0 = GroupEncoder(cfg, name="enc_g0")(groups[0])
            xs = jnp.stack(groups[1:], axis=0)  # (G-1, B, H, W, c)
            VEnc = nn.vmap(
                GroupEncoder,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
            )
            fr, dsr = VEnc(cfg, name="enc_gs")(xs)  # (G-1, B, h, w, C), list
            G1 = len(cfg.inchans_list) - 1
            fr_cat = jnp.moveaxis(fr, 0, -2).reshape(
                *fr.shape[1:-1], G1 * fr.shape[-1]
            )
            fused_in = jnp.concatenate([f0, fr_cat], axis=-1)
        else:
            feats, skips = [], []
            for gi, g in enumerate(groups):
                f, ds = GroupEncoder(cfg, name=f"enc_g{gi}")(g)
                feats.append(f)
                skips.append(ds)
            fused_in = jnp.concatenate(feats, axis=-1)

        fused = _dense(cfg.embed_dim, name="enc_proj", dtype=cfg.dtype)(fused_in)

        # --- LG_net at coarse resolution
        out = LGStack(cfg, name="lg")(fused)

        # --- Dec_net: linear proj -> split per group -> decoders -> heads
        L = len(cfg.enc_depths)
        gdim = cfg.enc_dim * 2 ** (L - 1)
        out = _dense(gdim * cfg.n_groups, name="dec_proj", dtype=cfg.dtype)(out)
        parts = jnp.split(out, cfg.n_groups, axis=-1)

        if vmap_groups:
            c0 = cfg.outchans_list[0]
            c1 = cfg.outchans_list[1]
            head0 = GroupDecoder(cfg, c0, name="dec_g0")(parts[0], ds0)
            prest = jnp.stack(parts[1:], axis=0)
            VDec = nn.vmap(
                GroupDecoder,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
            )
            heads = VDec(cfg, c1, name="dec_gs")(prest, dsr)  # (G-1,B,H,W,c1)
            G1 = cfg.n_groups - 1

            def flat(t):  # (G-1, B, H, W, c) -> (B, H, W, (G-1)*c)
                return jnp.moveaxis(t, 0, -2).reshape(
                    *t.shape[1:-1], G1 * t.shape[-1]
                )

            mean = jnp.concatenate(
                [head0[..., : c0 // 2], flat(heads[..., : c1 // 2])], axis=-1
            )
            std = jnp.concatenate(
                [head0[..., c0 // 2 :], flat(heads[..., c1 // 2 :])], axis=-1
            )
        else:
            means, stds = [], []
            for gi, p in enumerate(parts):
                head = GroupDecoder(cfg, cfg.outchans_list[gi],
                                    name=f"dec_g{gi}")(p, skips[gi])
                c = cfg.outchans_list[gi]
                means.append(head[..., : c // 2])
                stds.append(head[..., c // 2 :])
            mean = jnp.concatenate(means, axis=-1)
            std = jnp.concatenate(stds, axis=-1)

        y = jnp.concatenate([mean, std], axis=-1)
        return jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)  # -> NCHW
