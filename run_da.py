"""Cycled variational DA runner (CLI).

TPU-native equivalent of `python da_4dvar.py ...` (reference
da_4dvar.py:28-60,1344-1347). Same knob surface; model checkpoints are
orbax trees saved by this framework (the reference's torch .pth files are
not distributed). Without --data_dir, a deterministic synthetic ERA5-like
source drives the cycle (useful for benchmarks and smoke runs).

Example (config of record, da_4dvar_script.sh:14):
  python run_da.py --da_mode vae4dvar --da_win 1 --Nit 4 --obs_std 0.005 \
      --obs_type column_random_0001 --modify_tp 2 --scale_factor 2.0 \
      --q_type 1 --filter_coeff 0.1 \
      --start_time "2022-01-01 00:00:00" --end_time "2023-01-01 12:00:00"
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--start_time", type=str, default="2022-01-01 00:00:00")
    p.add_argument("--end_time", type=str, default="2022-01-03 00:00:00")
    p.add_argument("--coeff_dir", type=str, default="dataset/bq_info_lr/")
    p.add_argument("--da_mode", type=str, default="vae4dvar",
                   choices=["free_run", "interpolation", "sc4dvar", "vae4dvar"])
    p.add_argument("--da_win", type=int, default=1)
    p.add_argument("--interp_dim", type=int, default=40)
    p.add_argument("--init_lag", type=int, default=8)
    p.add_argument("--init_tp", type=int, default=0)
    p.add_argument("--Nit", type=int, default=4)
    p.add_argument("--obs_std", type=float, default=0.005)
    p.add_argument("--obs_coeff", type=float, default=1.0)
    p.add_argument("--filter_coeff", type=float, default=0.1)
    p.add_argument("--lbfgs_max_evals", type=int, default=None,
                   help="closure-eval budget per L-BFGS segment (default: "
                        "torch's max_iter*5//4). Sparse-obs windows grind "
                        "the zoom linesearch once easy descent is done; a "
                        "tighter budget trades fit tail for wall clock")
    p.add_argument("--lbfgs_linesearch", type=str, default="auto",
                   choices=("auto", "zoom", "jvp-zoom"),
                   help="strong-Wolfe probes: reverse-mode (zoom) or "
                        "forward-mode (jvp-zoom — same trajectory, probes "
                        "cost ~2 forwards instead of fwd+bwd; 29%% faster "
                        "on grinding sparse-obs window solves, parity-or-"
                        "better in the descent regime — docs/PERF.md r5). "
                        "auto (default) picks jvp-zoom when the cost "
                        "supports forward-mode AD, else zoom. Explicit "
                        "jvp-zoom is rejected with a clear error for "
                        "costs using custom-VJP flash attention (mask-"
                        "free stages with N >= flash_min_seq, e.g. "
                        "0.25deg full-grid LG)")
    p.add_argument("--obs_type", type=str, default="column_random_0001")
    p.add_argument("--use_eval", action="store_true",
                   help="hold out obs cells and report obs-space error")
    p.add_argument("--mask_eval", type=str, default=None,
                   help="path to an eval-holdout mask .npy (C_obs, H, W); "
                        "synthetic 20%% holdout if omitted")
    p.add_argument("--reports_dir", type=str, default=None,
                   help="station-report JSON dir for real_* obs types; "
                        "synthetic station network if omitted")
    p.add_argument("--n_stations", type=int, default=2000)
    p.add_argument("--prefix", type=str, default="run")
    p.add_argument("--q_type", type=int, default=1)
    p.add_argument("--scale_factor", type=float, default=2.0)
    p.add_argument("--save_interval", type=int, default=5)
    p.add_argument("--modify_tp", type=int, default=2)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--flow_ckpt", type=str, default=None)
    p.add_argument("--forecast_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None,
                   help="LocalNpyStore root; synthetic source if omitted")
    p.add_argument("--data_layout", type=str, default="state",
                   choices=["state", "reference"],
                   help="state: one (69,H,W) npy per timestamp; reference: "
                        "the upstream per-variable-per-level archive layout")
    p.add_argument("--grid", type=str, default="721x1440")
    p.add_argument("--solver_grid", type=str, default="128x256")
    p.add_argument("--work_dir", type=str, default="da_cycle_results")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh for the variational solve: 'SHxSW' "
                        "(e.g. 2x4) shards the (lat, lon) grid; "
                        "'TPxSHxSW' (e.g. 2x2x2) additionally splits the "
                        "decoder/flow LG-stage matmuls tensor-parallel "
                        "over a leading tp axis")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 compute (default on; --no-bf16 for f32)")
    p.add_argument("--fast_init", action="store_true",
                   help="materialize random params via eval_shape + host "
                        "RNG (seconds, not minutes) when no ckpt is given")
    p.add_argument("--micro", action="store_true",
                   help="micro model configs (smoke runs / CPU mesh tests); "
                        "latent becomes 8 channels")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--win_remat", type=str, default="both",
                   choices=["both", "block", "step", "none"],
                   help="rematerialization inside the 4D-Var window cost: "
                   "block-level model remat and/or one jax.checkpoint per "
                   "rollout step. 'both' (default) minimizes HBM; on chips "
                   "with headroom 'block'/'step'/'none' trade memory for "
                   "less backward recompute (probe: scripts/profiling/"
                   "prof_win6_variants.py)")
    p.add_argument("--window_dispatch", type=str, default="fused",
                   choices=["iter", "segment", "fused"],
                   help="dispatch granularity of the da_win>1 solve "
                   "(identical trajectory): one iteration / one outer "
                   "segment / the whole solve per XLA program. 'fused' "
                   "(default; 28%% faster on v5e) is honored only on the "
                   "reduced window quadratic — full-grid window costs "
                   "fall back to per-iteration dispatch (probe: "
                   "scripts/profiling/prof_win6_dispatch.py)")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the obs-prefetch worker thread (serial "
                   "obs read -> solve loop, the reference's structure)")
    p.add_argument("--save_field", action="store_true",
                   help="dump xb/xa per cycle to the work dir")
    p.add_argument("--save_gt", action="store_true",
                   help="dump truth per cycle to the work dir")
    p.add_argument("--save_obs", action="store_true",
                   help="dump observations per cycle to the work dir")
    p.add_argument("--forecast_eval", action="store_true",
                   help="per-cycle multi-step forecast WRMSE from the "
                   "analysis (forecast_wrmse.npy)")
    p.add_argument("--forecast_eval_steps", type=int, default=20)
    p.add_argument("--obs_from_numpy", type=str, default=None,
                   help="directory of pre-gridded obs "
                   "({year}/{YYYY-MM-DDTHH}-obs.npy/-mask.npy) used "
                   "instead of station gridding for real obs types")
    return p.parse_args()


def _load_b_assets(coeff_dir: str, scale_factor: float):
    """Real B coefficients (da_4dvar.py:520-526) when present; otherwise a
    LOUD synthetic fallback — silently swapping B changes every sc4dvar
    analysis, so the substitution must never pass unnoticed (VERDICT r4)."""
    import sys

    from vaevar_tpu.da.cvt import BMatrixAssets

    if os.path.exists(os.path.join(coeff_dir, "len_scale.npy")):
        return BMatrixAssets.load(coeff_dir, scale_factor)
    print(
        f"WARNING: B-matrix coefficient dir {coeff_dir!r} has no "
        f"len_scale.npy — falling back to CALIBRATED SYNTHETIC B "
        f"(BMatrixAssets.synthetic). Analyses will NOT match runs using "
        f"the reference's dataset/bq_info_lr coefficients; pass "
        f"--coeff_dir to use real assets.",
        file=sys.stderr, flush=True,
    )
    return BMatrixAssets.synthetic(scale_factor)


def main():
    args = arg_parser()
    import jax
    import jax.numpy as jnp

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from vaevar_tpu.parallel.mesh import init_distributed

    # multihost no-op unless SLURM/coordinator env set (same bootstrap as
    # the training CLIs); must precede the first backend touch below so a
    # --mesh spanning hosts (v5p pods) sees the global device set
    init_distributed()

    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()

    # validate the mesh spec before any (slow) model initialization
    mesh = None
    mesh_tp = 1
    if args.mesh:
        from vaevar_tpu.parallel import mesh as pmesh

        try:
            dims = [int(v) for v in args.mesh.split("x")]
            assert len(dims) in (2, 3)
        except (ValueError, AssertionError):
            raise SystemExit("--mesh must be 'SHxSW' (e.g. 2x4) or "
                             f"'TPxSHxSW' (e.g. 2x2x2), got {args.mesh!r}")
        if len(dims) == 3:
            mesh_tp, sh, sw = dims
        else:
            sh, sw = dims
        n = mesh_tp * sh * sw
        if n > jax.device_count():
            raise SystemExit(
                f"--mesh {args.mesh} needs {n} devices, have "
                f"{jax.device_count()}"
            )
        axes = {"sh": sh, "sw": sw} if mesh_tp == 1 else {
            "tp": mesh_tp, "sh": sh, "sw": sw}
        mesh = pmesh.make_mesh(axes, jax.devices()[:n])

    from vaevar_tpu.config import DAConfig, FLOW_140, FORECAST_025, VAE_DECODER
    from vaevar_tpu.da.cvt import BMatrixAssets, CVTransform
    from vaevar_tpu.da.cycler import CycledDA
    from vaevar_tpu.da.dynamics import make_integrate
    from vaevar_tpu.data.era5 import (
        LocalNpyStore, ReferenceLayoutStore, SyntheticEra5,
    )
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.train import checkpoint as ckpt

    hw = tuple(int(v) for v in args.grid.split("x"))
    shw = tuple(int(v) for v in args.solver_grid.split("x"))
    dtype = jnp.bfloat16 if args.bf16 else None

    # the stock 1.4deg configs are built for 128x256; re-target them when a
    # different solver grid is requested (smoke runs at e.g. 64x128)
    def fit_grid(model_cfg, grid):
        c = model_cfg.replace(img_size=grid)
        coarse = (grid[0] // c.stride[0] // 4, grid[1] // c.stride[1] // 4)
        if min(coarse) < 1 or any(
            g % (s * 4 * w) for g, s, w in
            zip(grid, c.stride, c.window_size)
        ):
            raise SystemExit(
                f"--solver_grid {grid[0]}x{grid[1]} incompatible with model "
                f"stride {c.stride} x4 downsampling and window "
                f"{c.window_size}; use multiples of "
                f"({c.stride[0] * 4 * c.window_size[0]}, "
                f"{c.stride[1] * 4 * c.window_size[1]})"
            )
        return c

    cfg = DAConfig(
        da_mode=args.da_mode,
        da_win=args.da_win,
        nit=args.Nit,
        obs_std=args.obs_std,
        obs_coeff=args.obs_coeff,
        filter_coeff=args.filter_coeff,
        obs_type=args.obs_type,
        use_eval=args.use_eval,
        q_type=args.q_type,
        scale_factor=args.scale_factor,
        modify_tp=args.modify_tp,
        interp_dim=args.interp_dim,
        init_lag=args.init_lag,
        init_tp=args.init_tp,
        save_interval=args.save_interval,
        window_step_checkpoint=args.win_remat in ("both", "step"),
        window_dispatch=args.window_dispatch,
        lbfgs_max_evals=args.lbfgs_max_evals,
        lbfgs_linesearch=args.lbfgs_linesearch,
        latent_shape=(1, 8 if args.micro else 32, *shw),
        grid_hw=hw,
        solver_hw=shw,
    )

    if args.data_dir and args.data_layout == "reference":
        source = ReferenceLayoutStore(args.data_dir, hw)
    elif args.data_dir:
        source = LocalNpyStore(args.data_dir, hw)
    else:
        source = SyntheticEra5(hw=hw, seed=args.seed)

    # models -------------------------------------------------------------
    rng = jax.random.PRNGKey(args.seed)
    if args.fast_init:
        from vaevar_tpu.utils.fast_init import fast_init

        _init = lambda model, x, s: jax.device_put(fast_init(model, x, seed=s))
    else:
        _init = lambda model, x, s: model.init(jax.random.PRNGKey(s), x)
    from vaevar_tpu import config as cfgs

    if args.micro:
        # relbias like the real VAE_DECODER; matches convert_ckpt --micro
        dec_base = cfgs.micro_vae_configs(img_size=shw)[1]
        flow_base = cfgs.micro_config(img_size=shw)
    else:
        dec_base, flow_base = fit_grid(VAE_DECODER, shw), fit_grid(FLOW_140, shw)
    # remat decoder blocks in 4D-Var: the decoder backward otherwise keeps
    # ~6 GB of activations live on top of the window rollout (measured on
    # v5e; docs/PERF.md). 3D-Var keeps the faster non-remat backward.
    block_remat = args.da_win > 1 and args.win_remat in ("both", "block")
    dec_cfg = dec_base.replace(dtype=dtype, remat=block_remat)
    decoder = LGUnet(dec_cfg)
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
    dec_params = (
        # full-VAE trees (run_train_vae.py output / converted reference
        # VAE_lr ckpts) and decoder-only trees are both accepted
        ckpt.vae_decoder_params(ckpt.restore(args.vae_ckpt))
        if args.vae_ckpt else _init(decoder, z0, args.seed)
    )

    # remat flow blocks when the model runs INSIDE the 4D-Var cost: the
    # window backward otherwise keeps ~4 GB of flow activations live
    flow_cfg = flow_base.replace(dtype=dtype, remat=block_remat)
    flow = LGUnet(flow_cfg)
    flow_params = (
        ckpt.restore(args.flow_ckpt) if args.flow_ckpt
        else _init(flow, jnp.zeros((1, 69, *shw)), args.seed + 1)
    )
    flow_integrate = make_integrate(flow.apply, model_hw=shw)

    if args.forecast_ckpt or (args.fast_init and hw != shw):
        if args.micro:
            fc_base = cfgs.micro_config(img_size=hw)
        elif hw == FORECAST_025.img_size:
            fc_base = FORECAST_025
        else:
            fc_base = fit_grid(FLOW_140.replace(attn_type="rope",
                                                lg_full_attn_first=True), hw)
        fc_cfg = fc_base.replace(dtype=dtype)
        fc = LGUnet(fc_cfg)
        forecast_params = (
            ckpt.restore(args.forecast_ckpt) if args.forecast_ckpt
            else _init(fc, jnp.zeros((1, 69, *hw)), args.seed + 2)
        )
        forecast_integrate = make_integrate(fc.apply)
    else:
        # without a trained 0.25deg checkpoint, advance with the flow model
        forecast_params = flow_params
        forecast_integrate = lambda p, x, steps, interpolation=True: (
            flow_integrate(p, x, steps, True)
        )

    if mesh is not None and mesh_tp > 1:
        # tensor-parallel LG-stage placement for the models that run
        # inside the solve; solver._shard_inputs (replicate_missing)
        # preserves these placements and replicates the rest
        from vaevar_tpu.parallel import mesh as pmesh

        dec_params = pmesh.shard_tensor_parallel(dec_params, mesh)
        flow_params = pmesh.shard_tensor_parallel(flow_params, mesh)
        if forecast_params is flow_params:
            forecast_params = flow_params
        # (a distinct forecast model runs outside the solver; the cycler
        # replicates it)

    reports_source = None
    if args.obs_type.startswith(("real", "prepbufr")):
        # both station families read prepbufr-style JSON reports: real_*
        # grids values onto the augmented obs-level space, prepbufr_* only
        # grids the 69-channel MASK (da_4dvar.py:190-274 vs :301-440)
        from vaevar_tpu.data.reports import LocalReportsStore, SyntheticReports

        reports_source = (
            LocalReportsStore(args.reports_dir) if args.reports_dir
            else SyntheticReports(
                source, n_stations=args.n_stations, seed=args.seed + 3,
                # spread synthetic report times across the window so 4D-Var
                # slots 1..5 actually see obs (real prepbufr files carry
                # reports throughout the window; dt=0 would put everything
                # in slot 0 and waste the second-file read)
                dt_range=(-3.0, 3.0) if args.da_win > 1 else (0.0, 0.0),
            )
        )

    name = (
        f"{args.prefix}_stdmodify{args.modify_tp}_{args.obs_type}"
        f"_std{args.obs_std:.3f}_win{args.da_win}_Nit{args.Nit}"
    )
    da = CycledDA(
        cfg,
        source,
        forecast_integrate,
        forecast_params=forecast_params,
        flow_apply=flow.apply if args.da_win > 1 else None,
        flow_params=flow_params,
        decoder_apply=decoder.apply,
        vae_params=dec_params,
        cvt=CVTransform(
            _load_b_assets(args.coeff_dir, args.scale_factor),
            solver_hw=shw,
            out_hw=hw,
        ) if args.da_mode == "sc4dvar" else None,
        reports_source=reports_source,
        mask_eval=(np.load(args.mask_eval).astype("float32")
                   if args.mask_eval else None),
        coeff_dir=args.coeff_dir,
        mesh=mesh,
        work_dir=os.path.join(args.work_dir, name),
        seed=args.seed,
        prefetch_obs=not args.no_prefetch,
        save_field=args.save_field,
        save_gt=args.save_gt,
        save_obs=args.save_obs,
        forecast_eval=args.forecast_eval,
        forecast_eval_steps=args.forecast_eval_steps,
        obs_from_numpy=args.obs_from_numpy,
    )
    da.run_assimilation(args.start_time, args.end_time)
    print("DA complete")


if __name__ == "__main__":
    main()
