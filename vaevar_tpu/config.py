"""Typed configuration for the LGUnet backbone, VAE, and DA engine.

One dataclass-based config system replacing the reference's mix of YAML
blobs, argparse namespaces and filename conventions. `LGUnetConfig`
parameterizes a single backbone covering both reference generations:

- new-gen (networks/LGUnet_all.py `LGUnet_all_1`): RoPE window attention,
  rectangular windows, full-grid attention in the first LG stage;
- old-gen (networks_old/transformer.py `LGUnet_all`): relative-position-bias
  attention, square windows, optional LoRA rank on q.

`from_reference_dict` maps reference YAML keys (e.g.
output/model/model_0.25degree/training_options.yaml:68-119,
nf_model/parameters0_old.yaml) onto this config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class LGUnetConfig:
    img_size: tuple[int, int] = (128, 256)
    patch_size: tuple[int, int] = (2, 2)
    stride: tuple[int, int] = (2, 2)
    inchans_list: tuple[int, ...] = (4, 13, 13, 13, 13, 13)
    outchans_list: tuple[int, ...] = (4, 13, 13, 13, 13, 13)
    enc_dim: int = 96
    embed_dim: int = 1152
    window_size: tuple[int, int] = (4, 4)
    enc_depths: tuple[int, ...] = (2, 2)
    enc_heads: tuple[int, ...] = (3, 6)
    lg_depths: tuple[int, ...] = (4, 4, 4)
    lg_heads: tuple[int, ...] = (6, 6, 6)
    mlp_ratio: float = 4.0
    attn_type: str = "rope"  # "rope" (new-gen) | "relbias" (old-gen)
    lora_rank: int = 0
    lg_full_attn_first: bool = True  # new-gen: stage0 of LG attends full grid
    remat: bool = False  # jax.checkpoint each block (activation recompute)
    dtype: Any = None  # compute dtype (None => float32); params stay f32
    flash_min_seq: int = 4096  # windows with N >= this use chunked attention
    # SD_attn extended surface (Attention.py:475-489,543-565), default off
    # in every shipped reference config:
    dilated_size: tuple[int, ...] = (1, 1)  # dilated token groups per axis
    lg_window_size: tuple[int, ...] | None = None  # LG-stage window
    # override; a len-3 value (t, h, w) with t == 1 runs the LG swin
    # stages with 3-D windows + rope3 over (B, T=1, H, W, C), matching
    # LG_net's 3-D branch (networks/LGUnet_all.py:657,731-734)

    def __post_init__(self):
        if len(self.window_size) != 2:
            raise ValueError(
                "window_size is the enc/dec window and must be 2-D; use "
                "lg_window_size for a 3-D LG-stage window (the reference "
                "encoder cannot take 3-D windows either: SD_attn would "
                "mis-unpack 4-D input, Attention.py:577)"
            )
        if self.lg_window_size is not None and len(self.lg_window_size) == 3 \
                and self.lg_window_size[0] != 1:
            raise ValueError(
                "3-D LG windows run at T=1 (LG_net.forward hardcodes T=1, "
                "networks/LGUnet_all.py:728): lg_window_size[0] must be 1"
            )

    @property
    def lg_window(self) -> tuple[int, ...]:
        return self.lg_window_size or self.window_size

    @property
    def n_groups(self) -> int:
        return len(self.inchans_list)

    @property
    def patches_resolution(self) -> tuple[int, int]:
        return (self.img_size[0] // self.stride[0], self.img_size[1] // self.stride[1])

    @property
    def lg_resolution(self) -> tuple[int, int]:
        f = 2 ** (len(self.enc_depths) - 1)
        pr = self.patches_resolution
        return (pr[0] // f, pr[1] // f)

    @property
    def out_chans(self) -> int:
        return sum(self.outchans_list)

    @property
    def in_chans(self) -> int:
        return sum(self.inchans_list)

    def replace(self, **kw) -> "LGUnetConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_reference_dict(
        cls, d: dict, attn_type: str = "rope", **overrides
    ) -> "LGUnetConfig":
        """Build from a reference-style params dict (YAML `lgunet_all` block)."""

        def pair(v) -> tuple[int, int]:
            if isinstance(v, (list, tuple)):
                return (int(v[-2]), int(v[-1]))
            return (int(v), int(v))

        kw = dict(
            img_size=pair(d["img_size"]),
            patch_size=pair(d.get("patch_size", (2, 2))),
            stride=pair(d.get("stride", (2, 2))),
            inchans_list=tuple(d["inchans_list"]),
            outchans_list=tuple(d["outchans_list"]),
            enc_dim=int(d.get("enc_dim", 96)),
            embed_dim=int(d.get("embed_dim", 1152)),
            window_size=pair(d.get("window_size", (4, 4))),
            enc_depths=tuple(d.get("enc_depths", (2, 2))),
            enc_heads=tuple(d.get("enc_heads", (3, 6))),
            lg_depths=tuple(d.get("lg_depths", ())),
            lg_heads=tuple(d.get("lg_heads", ())),
            attn_type=attn_type,
            lora_rank=int(d.get("rank", 0)),
            lg_full_attn_first=attn_type == "rope",
            remat=bool(d.get("use_checkpoint", False)),
        )
        kw.update(overrides)
        return cls(**kw)


# --- canonical model configs of record -------------------------------------

#: 0.25deg forecast model (reference training_options.yaml:68-119; new-gen).
FORECAST_025 = LGUnetConfig(
    img_size=(721, 1440),
    patch_size=(3, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(8, 26, 26, 26, 26, 26),
    enc_dim=96,
    embed_dim=1152,
    window_size=(6, 12),
    enc_depths=(2, 2, 2),
    enc_heads=(3, 6, 6),
    lg_depths=(4, 4, 4),
    lg_heads=(6, 6, 6),
    attn_type="rope",
    remat=True,
)

#: 1.4deg flow model used inside the 4D-Var window (old-gen topology; the
#: reference loads it from ../fengwu-lite which is not in-repo, so geometry
#: follows the VAE yaml family at 128x256).
FLOW_140 = LGUnetConfig(
    img_size=(128, 256),
    patch_size=(2, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(8, 26, 26, 26, 26, 26),
    enc_dim=96,
    embed_dim=1152,
    window_size=(4, 4),
    enc_depths=(2, 2),
    enc_heads=(3, 6),
    lg_depths=(4, 4, 4),
    lg_heads=(6, 6, 6),
    attn_type="relbias",
    lg_full_attn_first=False,
)

#: VAE encoder (nf_model/parameters0_old.yaml `encoder`): 69ch -> 64ch=mu||logvar.
VAE_ENCODER = LGUnetConfig(
    img_size=(128, 256),
    patch_size=(2, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(4, 12, 12, 12, 12, 12),
    enc_dim=96,
    embed_dim=1152,
    window_size=(4, 4),
    enc_depths=(2, 2),
    enc_heads=(3, 6),
    lg_depths=(4, 4, 4),
    lg_heads=(6, 6, 6),
    attn_type="relbias",
    lg_full_attn_first=False,
)

#: VAE encoder must also use windowed LG stages (old-gen topology,
#: networks_old/transformer.py:628-712 — no full-grid stage).
VAE_DECODER = VAE_ENCODER.replace(
    inchans_list=(2, 6, 6, 6, 6, 6),
    outchans_list=(4, 13, 13, 13, 13, 13),
)


def micro_config(img_size=(16, 32), attn_type="rope", **overrides) -> LGUnetConfig:
    """Minimal topology-preserving config for CPU dry runs."""
    kw = dict(
        img_size=img_size,
        patch_size=(2, 2),
        stride=(2, 2),
        inchans_list=(4, 13, 13, 13, 13, 13),
        outchans_list=(8, 26, 26, 26, 26, 26),
        enc_dim=4,
        embed_dim=16,
        window_size=(4, 4),
        enc_depths=(1, 1),
        enc_heads=(1, 1),
        lg_depths=(1,),
        lg_heads=(1,),
        attn_type=attn_type,
        lg_full_attn_first=attn_type == "rope",
    )
    kw.update(overrides)
    return LGUnetConfig(**kw)


def micro_vae_configs(img_size=(16, 32)):
    """Micro-scale (enc_cfg, dec_cfg) pair with the VAE_ENCODER/VAE_DECODER
    topology (old-gen relbias, windowed LG stages): 69ch -> 16ch=mu||logvar,
    latent 8ch -> 69ch. Used by scripts/convert_ckpt.py --micro and tests."""
    enc = micro_config(
        img_size=img_size, attn_type="relbias",
        inchans_list=(13, 56), outchans_list=(2, 14),
    )
    dec = enc.replace(inchans_list=(2, 6), outchans_list=(13, 56))
    return enc, dec


def tiny_config(
    img_size=(32, 64), attn_type="rope", lg_full_attn_first=True
) -> LGUnetConfig:
    """Small config for tests: same topology, tiny dims."""
    return LGUnetConfig(
        img_size=img_size,
        patch_size=(2, 2),
        stride=(2, 2),
        inchans_list=(4, 13, 13, 13, 13, 13),
        outchans_list=(8, 26, 26, 26, 26, 26),
        enc_dim=8,
        embed_dim=48,
        window_size=(4, 4),
        enc_depths=(2, 2),
        enc_heads=(2, 2),
        lg_depths=(2, 2),
        lg_heads=(2, 2),
        attn_type=attn_type,
        lg_full_attn_first=lg_full_attn_first,
    )


@dataclass(frozen=True)
class DAConfig:
    """Cycled variational DA configuration (reference arg_parser, da_4dvar.py:28-60)."""

    da_mode: str = "vae4dvar"  # free_run | interpolation | sc4dvar | vae4dvar
    da_win: int = 1  # number of hourly slots in the window (1 => 3D-Var)
    nit: int = 4  # outer iterations
    lbfgs_iters: int = 10  # inner L-BFGS iterations per outer step
    lbfgs_history: int = 10
    obs_std: float = 0.005
    obs_coeff: float = 1.0
    filter_coeff: float = 0.1
    obs_type: str = "column_random_0001"
    q_type: int = 1
    scale_factor: float = 2.0
    modify_tp: int = 2
    interp_dim: int = 40
    init_lag: int = 8
    init_tp: int = 0
    save_interval: int = 5
    use_eval: bool = False
    latent_shape: tuple[int, ...] = (1, 32, 128, 256)
    grid_hw: tuple[int, int] = (721, 1440)  # analysis grid
    solver_hw: tuple[int, int] = (128, 256)  # CVT / latent grid
    # one jax.checkpoint per rollout step inside the window cost
    # (cost._make_window_obs_reduced). Default on = bounded live set in
    # the backward; turn off to trade HBM for less recompute when the
    # segment program fits comfortably (probe:
    # scripts/profiling/prof_win6_variants.py, run_da --win_remat)
    window_step_checkpoint: bool = True
    # dispatch granularity of the da_win>1 solve (identical optimizer
    # trajectory at every setting — L-BFGS state continuation):
    #   "iter"    one quasi-Newton iteration per XLA program (safest: a
    #             full-grid window cost runs minutes per eval and a long
    #             program trips the TPU-worker watchdog, docs/PERF.md)
    #   "segment" one outer segment (lbfgs_iters) per program
    #   "fused"   whole Nit x iters solve in ONE program — only honored on
    #             the REDUCED window quadratic (~13 s device time); saves
    #             all per-dispatch round-trips
    # Measured (v5e, win6 reduced, prof_win6_dispatch.py): iter 17.45 s,
    # segment 16.58 s, fused 12.62 s per solve at 6.5-6.8 GiB — fused is
    # 28% faster and far under the worker watchdog, so it is the default;
    # non-reduced window costs (real obs) fall back to per-iteration
    # dispatch automatically.
    window_dispatch: str = "fused"
    # closure-eval budget per L-BFGS segment. None = torch.optim.LBFGS's
    # default (max_iter * 5 // 4, the reference semantics,
    # da_4dvar.py:1119,1240). Production extension: sparse-obs windows
    # (e.g. 3 observed columns at 1.4deg) spend most of their budget in
    # zoom-linesearch grind once easy descent is done (docs/PERF.md) —
    # a tighter budget trades analysis-fit tail for wall clock.
    lbfgs_max_evals: int | None = None
    # strong-Wolfe linesearch implementation (da/lbfgs.py):
    #   "auto"     (default) resolve at the first solve: "jvp-zoom"
    #              whenever the cost lowers under forward-mode AD, else
    #              "zoom" (custom-VJP flash-attention costs). Measured
    #              round 5 (docs/PERF.md): 21.0 vs 29.8 s/cycle on the
    #              grinding win6@1.4deg north-star, 1.29 vs 1.40 on the
    #              3D-Var primary. With window_dispatch="fused", jvp-zoom
    #              window solves are demoted to segment dispatch (the
    #              fused forward-mode window program wedges the XLA
    #              compile service — solver.window_dispatch_kwargs).
    #   "zoom"     optax's reverse-mode probes: every probe pays a full
    #              value_and_grad (fwd + remat recompute + grad ops
    #              through the decoder + da_win flow steps)
    #   "jvp-zoom" forward-mode probes (scale_by_jvp_zoom_linesearch):
    #              probe 1 pays value_and_grad, later probes ONE jax.jvp
    #              (~2 forwards, zero backward activations), true grad
    #              restored at the accepted point. Identical trajectory
    #              to fp noise; wins when the zoom grinds (sparse-obs
    #              windows — the 1.4deg north-star, docs/PERF.md).
    #              Caveats: (1) requires a forward-mode-differentiable
    #              cost — custom-VJP flash attention (mask-free stages
    #              with N >= flash_min_seq, e.g. the 0.25deg LG net's
    #              full-grid stage) is rejected with a clear error at the
    #              first solve; (2) in the DESCENT regime (~1-2 probes/
    #              iter, the well-conditioned 0.25deg configs) the
    #              accepted-point gradient restore costs one extra
    #              value_and_grad when the accepted stepsize is not the
    #              first probe's, so jvp-zoom is roughly parity-to-
    #              slightly-slower there and only wins on grinding zooms
    #              (measured numbers: docs/PERF.md round 5).
    lbfgs_linesearch: str = "auto"

    def replace(self, **kw) -> "DAConfig":
        return dataclasses.replace(self, **kw)
