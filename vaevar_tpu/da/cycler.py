"""Cycled data assimilation driver: background -> analysis -> 6h forecast.

Equivalent of the reference `cyclic_4dvar.run_assimilation` + state machine
(da_4dvar.py:455-518,649-727,1314-1342): restartable on-disk state
(xb.npy + current_time.txt), per-cycle metric accumulation dumped as .npy,
spin-up initialization, and the four DA modes (free_run, interpolation,
sc4dvar, vae4dvar). The inner variational solve is fully on-device; this
driver is the thin host-side loop around it.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from vaevar_tpu import channels
from vaevar_tpu.config import DAConfig
from vaevar_tpu.da import baselines, cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.ops.interp import augment_levels, obs_level_interp_matrix
from vaevar_tpu.parallel.mesh import host_value
from vaevar_tpu.utils import metrics as M

CYCLE = pd.Timedelta("6h")
STEP = pd.Timedelta("1h")

_METRIC_KEYS = (
    "bg_wrmse", "ana_wrmse", "bg_mse", "ana_mse", "bg_bias", "ana_bias",
    "error_obs",
)


@jax.jit
def _score_device(x, gt0):
    """Physical-unit WRMSE/bias/MSE of a field vs truth, fully on device
    (da_4dvar.py:946-957 semantics: metrics on normalized fields scaled
    back by STD)."""
    mean = jnp.asarray(channels.MEAN).reshape(-1, 1, 1)
    std = jnp.asarray(channels.STD).reshape(-1, 1, 1)
    xn = (x - mean) / std
    gn = (gt0 - mean) / std
    wrmse = M.weighted_rmse(xn[None], gn[None]) * jnp.asarray(channels.STD)
    bias = M.weighted_bias((xn - gn)[None]) * jnp.asarray(channels.STD)
    mse = jnp.mean((xn - gn) ** 2)
    return wrmse, bias, mse


@dataclass
class CycledDA:
    cfg: DAConfig
    state_source: object  # .get_state(ts) -> (69, H, W) physical
    forecast_integrate: Callable  # integrate(params, x, steps) on grid
    forecast_params: object = None
    flow_apply: Optional[Callable] = None  # hourly model for 4D-Var windows
    flow_params: object = None
    decoder_apply: Optional[Callable] = None  # vae4dvar decoder fn
    vae_params: object = None
    cvt: Optional[Callable] = None  # sc4dvar transform(u, xb)
    reports_source: object = None  # station JSON reports for real obs types
    work_dir: str = "da_cycle_results/run"
    seed: int = 0
    mask_dir: Optional[str] = None
    coeff_dir: Optional[str] = None  # Q-matrix / B-matrix asset dir
    mask_eval: Optional[np.ndarray] = None  # obs-space holdout (C_obs, H, W)
    err_std: Optional[np.ndarray] = None  # per-channel decoder scaling for
    # vae4dvar (None => channels.ERR_STD, the reference stdTr table,
    # da_4dvar.py:1181); OSSE/synthetic worlds pass the empirical NMC
    # error std the VAE was trained with
    mesh: object = None  # jax.sharding.Mesh for spatially-sharded solves
    verbose: bool = True
    prefetch_obs: bool = True  # overlap next cycle's host-side obs/truth
    # IO + gridding + QC with the current device solve (one worker thread;
    # submissions stay in time order so synthetic-mask RNG draws are
    # identical to the serial loop)
    save_field: bool = False  # dump xb/xa per cycle (da_4dvar.py:713-716)
    save_gt: bool = False  # dump truth per cycle (da_4dvar.py:717-719)
    save_obs: bool = False  # dump obs per cycle (da_4dvar.py:720-722)
    forecast_eval: bool = False  # per-cycle multi-step forecast WRMSE from
    # the analysis — the reference reserves forecast_wrmse and its dump
    # (da_4dvar.py:512,708-710) but ships evaluate() as a stub (:1311);
    # here the intended evaluation is implemented
    forecast_eval_steps: int = 20  # leads of 6 h (20 = 5 days)
    obs_from_numpy: Optional[str] = None  # pre-gridded obs dir
    # (obs.load_numpy_obs) instead of station gridding, real obs types only

    metrics_list: dict = field(default_factory=lambda: {k: [] for k in _METRIC_KEYS})

    def __post_init__(self):
        os.makedirs(self.work_dir, exist_ok=True)
        self._rng = np.random.default_rng(self.seed)
        hw = self.cfg.grid_hw
        obs_var = obs_mod.obs_error_variance(self.cfg.obs_std, self.cfg.modify_tp)
        q = obs_mod.load_q_matrix(
            self.coeff_dir or self.mask_dir or ".", self.cfg.q_type,
            self.cfg.da_win, hw
        ) if self.cfg.da_win > 1 else None
        self.R = obs_mod.build_R(obs_var, q, self.cfg.da_win, hw)
        self.is_real_obs = self.cfg.obs_type.startswith("real")
        if self.cfg.obs_type.startswith("prepbufr"):
            # fail at construction, not at the first cycle
            if self.cfg.da_win not in (1, 6):
                raise NotImplementedError(
                    "prepbufr obs: da_win must be 1 or 6 (da_4dvar.py:192)"
                )
            if self.reports_source is None:
                raise ValueError(
                    "obs_type=prepbufr* needs a reports_source "
                    "(LocalReportsStore/SyntheticReports)"
                )
        if self.is_real_obs:
            self._interp = obs_level_interp_matrix(self.cfg.interp_dim)
            # R on obs levels (da_4dvar.py:744-756)
            import jax.numpy as _jnp

            self.R_aug = np.asarray(
                augment_levels(_jnp.asarray(self.R), self._interp)
            )
            self._std_aug = obs_mod.std_layer_augmented(self.cfg.interp_dim)
        else:
            self._interp = None
        if self.cfg.use_eval and self.mask_eval is None:
            # synthetic stand-in for dataset/mask_eval1.npy (not in the
            # reference repo): hold out ~20% of obs cells for validation
            c_obs = 4 + 5 * self.cfg.interp_dim if self.is_real_obs else 69
            self.mask_eval = (
                np.random.default_rng(self.seed + 7)
                .random((c_obs, *hw)) < 0.2
            ).astype(np.float32)
        if self.forecast_eval:
            self.metrics_list["forecast_wrmse"] = []
        self._load_metrics()
        self._reduce_obs = None
        self._solver = self._build_solver()
        self._params = {"decoder": self.vae_params, "flow": self.flow_params}
        # jitted 6h advance; params traced so checkpoint swaps don't recompile
        self._advance = jax.jit(
            lambda p, x: self.forecast_integrate(p, x, 1, True),
        )
        if self.mesh is not None and self.forecast_params is not None:
            # params used OUTSIDE the solver (the 6h advance) must live on
            # the solve mesh: a jit on a process-spanning mesh can't mix
            # local and global arrays (solver params are committed per
            # solve by _shard_inputs)
            from vaevar_tpu.parallel import mesh as pmesh

            # replicate_missing: tensor-parallel placements survive
            self.forecast_params = pmesh.replicate_missing(
                self.forecast_params, self.mesh)

    @property
    def _reducible(self):
        # per-channel obs + nearest upsample: the obs quadratic reduces
        # exactly onto the solver grid (cost.ReducedObs for da_win=1,
        # cost.ReducedWindowObs for windows — the full path's per-step
        # nearest resizes collapse to a static coarse gather). Applies to
        # both vae4dvar (decoder_hr nearest, nf_model/vae.py:90) and
        # sc4dvar (CVT nearest upsample, da_4dvar.py:928); real obs
        # (level-augmented innovations + QC masks) keep the full windowed
        # form, as does the flow-less persistence fallback.
        if self._interp is not None:
            return False
        if self.cfg.da_win > 1 and self.flow_apply is None:
            return False
        if self.cfg.da_mode == "vae4dvar":
            return True
        return self.cfg.da_mode == "sc4dvar" and hasattr(
            self.cvt, "increment"
        )

    @property
    def _use_reduced_obs(self):
        return self._reducible and self.cfg.da_win == 1

    def _build_solver(self):
        cfg = self.cfg
        if cfg.da_mode == "vae4dvar":
            assert self.decoder_apply is not None
            if self._use_reduced_obs:
                c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(
                    self.decoder_apply, obs_coeff=cfg.obs_coeff,
                    err_std=self.err_std,
                )
                self._reduce_obs = jax.jit(
                    lambda b: cost_mod.reduce_obs(b, cfg.solver_hw)
                )
            elif self._reducible:  # da_win > 1, synthetic obs
                c, to_state, parts = (
                    cost_mod.make_vae4dvar_cost_window_reduced(
                        self.decoder_apply, self.flow_apply,
                        da_win=cfg.da_win, obs_coeff=cfg.obs_coeff,
                        err_std=self.err_std,
                        step_checkpoint=cfg.window_step_checkpoint,
                    )
                )
                self._reduce_obs = jax.jit(
                    lambda b: cost_mod.reduce_obs_window(b, cfg.solver_hw)
                )
            else:
                c, to_state, parts = cost_mod.make_vae4dvar_cost(
                    self.decoder_apply,
                    self.flow_apply,
                    flow_hw=cfg.solver_hw,
                    da_win=cfg.da_win,
                    obs_coeff=cfg.obs_coeff,
                    interp_matrix=self._interp,
                    err_std=self.err_std,
                )
            return VariationalSolver(
                c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
                history=cfg.lbfgs_history, mesh=self.mesh,
                max_segment_evals=cfg.lbfgs_max_evals,
                linesearch=cfg.lbfgs_linesearch,
                **self._window_dispatch_kw(),
            )
        if cfg.da_mode == "sc4dvar":
            assert self.cvt is not None
            if self._use_reduced_obs:
                c, to_state, parts = cost_mod.make_sc4dvar_cost_reduced(
                    self.cvt.increment, obs_coeff=cfg.obs_coeff,
                )
                self._reduce_obs = jax.jit(
                    lambda b: cost_mod.reduce_obs(b, cfg.solver_hw)
                )
            elif self._reducible:  # da_win > 1, synthetic obs
                c, to_state, parts = (
                    cost_mod.make_sc4dvar_cost_window_reduced(
                        self.cvt.increment, self.flow_apply,
                        da_win=cfg.da_win, obs_coeff=cfg.obs_coeff,
                        step_checkpoint=cfg.window_step_checkpoint,
                    )
                )
                self._reduce_obs = jax.jit(
                    lambda b: cost_mod.reduce_obs_window(b, cfg.solver_hw)
                )
            else:
                c, to_state, parts = cost_mod.make_sc4dvar_cost(
                    self.cvt, self.flow_apply, flow_hw=cfg.solver_hw,
                    da_win=cfg.da_win, obs_coeff=cfg.obs_coeff,
                    interp_matrix=self._interp,
                )
            # reference uses max_iter=5 per segment for sc4dvar
            # (da_4dvar.py:1119)
            return VariationalSolver(
                c, to_state, parts, lbfgs_iters=min(cfg.lbfgs_iters, 5),
                history=cfg.lbfgs_history, mesh=self.mesh,
                max_segment_evals=cfg.lbfgs_max_evals,
                linesearch=cfg.lbfgs_linesearch,
                **self._window_dispatch_kw(),
            )
        return None

    def _window_dispatch_kw(self):
        """Solver dispatch granularity for da_win>1 (DAConfig.window_dispatch;
        3D-Var always runs the fused single-program solve)."""
        from vaevar_tpu.da.solver import window_dispatch_kwargs

        if self.cfg.da_win <= 1:
            return {}
        return window_dispatch_kwargs(self.cfg.window_dispatch,
                                      self._reducible,
                                      self.cfg.lbfgs_linesearch)

    # --- resume machinery -----------------------------------------------

    def _load_metrics(self):
        for k in self.metrics_list:
            p = os.path.join(self.work_dir, f"{k}.npy")
            if os.path.exists(p):
                self.metrics_list[k] = list(np.load(p, allow_pickle=True))
        # replay entries newer than the last consolidated snapshot (a
        # preemption between snapshots loses nothing)
        log = os.path.join(self.work_dir, "metrics_log.jsonl")
        if os.path.exists(log):
            import json

            with open(log) as f:
                for line in f:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    lst = self.metrics_list.get(e["k"])
                    if lst is not None and e["i"] == len(lst):
                        v = e["v"]
                        lst.append(np.asarray(v) if isinstance(v, list)
                                   else v)
        self._flushed = {k: len(v) for k, v in self.metrics_list.items()}

    def save_eval_result(self, consolidate: bool = False):
        """Persist per-cycle metrics. Per cycle only NEW entries append to
        metrics_log.jsonl (O(1) host IO); the reference instead rewrites
        every growing .npy each cycle (da_4dvar.py:704-710) — O(cycles^2)
        over a year-long run. The consolidated reference-format .npy dumps
        are written when `consolidate` (save_interval cadence + run end),
        after which the jsonl is truncated (it is redundant)."""
        import json

        new = []
        for k, v in self.metrics_list.items():
            n0 = self._flushed.get(k, 0)
            for i in range(n0, len(v)):
                val = v[i]
                new.append({"k": k, "i": i,
                            "v": val.tolist() if hasattr(val, "tolist")
                            else val})
            self._flushed[k] = len(v)
        if new:
            with open(os.path.join(self.work_dir, "metrics_log.jsonl"),
                      "a") as f:
                for e in new:
                    f.write(json.dumps(e) + "\n")
        if not consolidate:
            return
        for k, v in self.metrics_list.items():
            try:
                arr = np.asarray(v)
            except ValueError:  # ragged (e.g. truth-limited forecast_eval)
                arr = np.array(v, dtype=object)
            np.save(os.path.join(self.work_dir, k), arr)
        open(os.path.join(self.work_dir, "metrics_log.jsonl"), "w").close()

    def save_ckpt(self, current_time, xb):
        np.save(os.path.join(self.work_dir, "xb.npy"), host_value(xb))
        with open(os.path.join(self.work_dir, "current_time.txt"), "w") as f:
            f.write(str(current_time))

    def get_current_states(self, start_time):
        tpath = os.path.join(self.work_dir, "current_time.txt")
        xpath = os.path.join(self.work_dir, "xb.npy")
        current = pd.Timestamp(open(tpath).read()) if os.path.exists(tpath) else start_time
        if os.path.exists(xpath):
            xb = self._dev(np.load(xpath))
        else:
            xb = self.get_initial_state(start_time)
        return current, xb

    def get_initial_state(self, start_time):
        """Spin-up per init_tp (da_4dvar.py:649-664)."""
        cfg = self.cfg
        if cfg.init_tp == 0:
            x0 = self._dev(
                self.state_source.get_state(start_time - cfg.init_lag * CYCLE)
            )
            return self.forecast_integrate(
                self.forecast_params, x0, cfg.init_lag, True
            )
        if cfg.init_tp == 1:
            return self._dev(
                self.state_source.get_state(start_time - cfg.init_lag * CYCLE)
            )
        return self._dev(
            self.state_source.get_state(start_time - 4 * 183 * CYCLE)
        )

    # --- per-cycle pieces -------------------------------------------------

    def get_obs_info(self, current_time):
        """(yo, H, R, gt). Synthetic families: obs = truth at mask points
        (reference uses noiseless synthetic obs, da_4dvar.py:449). "real"
        obs types: station reports gridded onto the augmented obs-level
        space with QC filtering (da_4dvar.py:758-805)."""
        cfg = self.cfg
        frames = [self.state_source.get_state(current_time)]
        t = current_time
        for _ in range(cfg.da_win - 1):
            t = t + STEP
            frames.append(self.state_source.get_state(t))
        gt = np.stack(frames)  # (T, 69, H, W)

        if self.is_real_obs:
            if self.obs_from_numpy:
                yo, H = obs_mod.load_numpy_obs(
                    self.obs_from_numpy, current_time, cfg.da_win
                )
            else:
                reports = [self.reports_source.get_reports(current_time)]
                if cfg.da_win > 3:
                    reports.append(
                        self.reports_source.get_reports(current_time + CYCLE)
                    )
                yo, H = obs_mod.grid_real_obs(
                    reports, cfg.da_win, cfg.interp_dim, cfg.grid_hw
                )
            gt_aug = np.asarray(
                augment_levels(jnp.asarray(gt), self._interp)
            )
            H = obs_mod.qc_filter(
                yo, gt_aug, H, cfg.filter_coeff, cfg.obs_type, self._std_aug
            )
            if cfg.obs_type.startswith("real_simuz"):
                yo[:, 4:44] = gt_aug[:, 4:44] * H[:, 4:44]
            elif cfg.obs_type.startswith("real_simu"):
                yo = gt_aug * H
            R = self.R_aug
        elif cfg.obs_type.startswith("prepbufr"):
            # station-JSON mask family (da_4dvar.py:190-274): H from
            # gridded reports, obs = truth at mask points, 69-channel R.
            # The reference supports ONLY da_win 1 or 6 here (:192);
            # __post_init__ enforces that at construction.
            yo = gt
            H = obs_mod.station_mask_from_reports(
                self.reports_source.get_reports(current_time),
                cfg.da_win, cfg.grid_hw,
            )
            if cfg.da_win > 3:
                H = obs_mod.station_mask_from_reports(
                    self.reports_source.get_reports(current_time + CYCLE),
                    cfg.da_win, cfg.grid_hw, second_file=True, H_out=H,
                )
            R = self.R
        else:
            yo = gt
            H = obs_mod.make_obs_mask(
                cfg.obs_type, cfg.da_win, cfg.grid_hw, self._rng, self.mask_dir
            )
            R = self.R
        return (
            self._dev(yo),
            self._dev(H),
            self._dev(R),
            self._dev(gt),
        )

    def _dev(self, a):
        """Device placement for host-built arrays: plain asarray without a
        mesh; committed to the solve mesh otherwise — full (..., H, W)
        fields sharded over sh/sw, broadcastables replicated (the same
        rule as VariationalSolver._shard_inputs). Required on process-
        spanning meshes, where device programs can't mix local arrays
        with global ones."""
        if self.mesh is None:
            return jnp.asarray(a)
        from jax.sharding import PartitionSpec as P

        from vaevar_tpu.parallel import mesh as pmesh

        nd = jnp.ndim(a)
        full = nd >= 2 and a.shape[-1] > 1 and a.shape[-2] > 1
        spec = pmesh.state_spec_for(self.mesh, a.shape) if full else P()
        return pmesh.shard(a, self.mesh, spec)

    def _score(self, prefix, x, gt0):
        # one jitted device program + one tiny (69,)-sized host pull per
        # score — no full-field host round-trips (the reference pulls via
        # .cpu() at da_4dvar.py:1127-1128; the solver path here stays
        # on-device, so scoring shouldn't be the sync point either)
        wrmse, bias, mse = jax.device_get(
            _score_device(self._dev(x), self._dev(gt0))
        )
        self.metrics_list[f"{prefix}_wrmse"].append(wrmse)
        self.metrics_list[f"{prefix}_bias"].append(bias)
        self.metrics_list[f"{prefix}_mse"].append(float(mse))
        return wrmse

    def _save_intermediate(self, current_time, xb, xa, gt, yo):
        """Optional per-cycle field dumps (da_4dvar.py:713-722; the
        reference writes gt/obs under intermediate/ground_truth — here
        everything lands in work_dir)."""
        stamp = str(current_time).replace(" ", "_")
        if self.save_field:
            np.save(os.path.join(self.work_dir, f"xb_{stamp}"),
                    host_value(xb))
            np.save(os.path.join(self.work_dir, f"xa_{stamp}"),
                    host_value(xa))
        if self.save_gt:
            np.save(os.path.join(self.work_dir, f"gt_{stamp}"),
                    host_value(gt))
        if self.save_obs:
            np.save(os.path.join(self.work_dir, f"obs_{stamp}"),
                    host_value(yo))

    def _forecast_eval(self, xa, current_time):
        """Multi-step forecast WRMSE from the analysis: per-lead (69,)
        physical-unit WRMSE vs truth, appended per cycle to
        metrics_list["forecast_wrmse"] (shape grows (cycles, leads, 69)).
        Stops early where truth is unavailable."""
        x = xa
        t = current_time
        rows = []
        for _ in range(self.forecast_eval_steps):
            x = self._advance(self.forecast_params, x)
            t = t + CYCLE
            # end-of-truth stops the ladder; genuine IO/loader failures
            # propagate (a bare except would silently truncate the row)
            has = getattr(self.state_source, "has", None)
            if has is not None and not has(t):
                break
            try:
                gt = self.state_source.get_state(t)
            except FileNotFoundError:
                break
            wrmse, _, _ = jax.device_get(
                _score_device(x, self._dev(gt))
            )
            rows.append(wrmse)
        if rows:
            self.metrics_list["forecast_wrmse"].append(np.stack(rows))

    def _obs_holdout_error(self, xa, yo0, H_old0):
        """Obs-space holdout RMSE on eval cells (da_4dvar.py:1285-1287)."""
        xhat = host_value(xa)
        if self.is_real_obs:
            xhat = np.asarray(
                augment_levels(jnp.asarray(xhat[None]), self._interp)
            )[0]
        w = self.mask_eval * host_value(H_old0)
        num = np.sum((xhat - host_value(yo0)) ** 2 * w, axis=(1, 2))
        den = np.maximum(np.sum(w, axis=(1, 2)), 1e-10)
        return np.sqrt(num / den)

    def one_step_da(self, gt, xb, yo, H, R):
        cfg = self.cfg
        mode = cfg.da_mode
        H_old = H
        if cfg.use_eval:
            H = H * (1.0 - self._dev(self.mask_eval)[None])
        w_bg = self._score("bg", xb, gt[0])
        if self.verbose:
            print(
                f"  bg: z500 {w_bg[11]:.4g} t850 {w_bg[66]:.4g} t2m {w_bg[2]:.4g}",
                flush=True,
            )

        if mode == "free_run":
            xa = xb
        elif mode == "interpolation":
            xa = self._dev(
                baselines.interpolation_analysis(
                    host_value(xb), host_value(yo[0]), host_value(H[0]),
                    real_obs=self.is_real_obs, dim_out=cfg.interp_dim,
                )
            )
        elif mode == "vae4dvar":
            bundle = ObsBundle(xb=xb, yo=yo, H=H, R=R)
            if self._reduce_obs is not None:
                bundle = self._reduce_obs(bundle)
            z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
            _, xa, diag = self._solver.solve(
                z0, bundle, self._params, nit=cfg.nit, gt=gt,
                verbose=self.verbose, name="vae4dvar",
            )
        elif mode == "sc4dvar":
            bundle = ObsBundle(xb=xb, yo=yo, H=H, R=R)
            if self._reduce_obs is not None:
                bundle = self._reduce_obs(bundle)
            w0 = jnp.zeros((channels.N_CHANNELS, *cfg.solver_hw), jnp.float32)
            _, xa, diag = self._solver.solve(
                w0, bundle, self._params, nit=cfg.nit, gt=gt,
                verbose=self.verbose, name="sc4dvar",
            )
        else:
            raise NotImplementedError(mode)

        if cfg.use_eval:
            self.metrics_list["error_obs"].append(
                self._obs_holdout_error(xa, yo[0], H_old[0])
            )
        w_ana = self._score("ana", xa, gt[0])
        if self.verbose:
            print(
                f"  ana: z500 {w_ana[11]:.4g} t850 {w_ana[66]:.4g} "
                f"t2m {w_ana[2]:.4g}",
                flush=True,
            )
        return xa

    # --- main loop --------------------------------------------------------

    def run_assimilation(self, start_time, end_time):
        """The outer 6h cycle loop (da_4dvar.py:1314-1342). The reference
        runs obs read -> solve -> advance strictly serially; here the next
        cycle's obs/truth preparation (disk reads of da_win 69-ch frames,
        station gridding, QC — all host-side) runs on a worker thread
        UNDER the current cycle's device solve, so the device never waits
        on host IO between cycles (prefetch_obs=False restores the serial
        loop)."""
        from concurrent.futures import ThreadPoolExecutor

        start_time = pd.Timestamp(start_time)
        end_time = pd.Timestamp(end_time)
        current_time, xb = self.get_current_states(start_time)
        epoch = 0
        pool = ThreadPoolExecutor(max_workers=1) if self.prefetch_obs \
            else None
        fut = (pool.submit(self.get_obs_info, current_time)
               if pool and current_time + CYCLE <= end_time else None)
        try:
            while current_time + CYCLE <= end_time:
                if self.verbose:
                    print(f"cycle @ {current_time}", flush=True)
                t0 = time.time()
                yo, H, R, gt = (
                    fut.result() if fut is not None
                    else self.get_obs_info(current_time)
                )
                nxt = current_time + CYCLE
                submit_next = pool is not None and nxt + CYCLE <= end_time
                fut = None
                if submit_next and not self.forecast_eval:
                    fut = pool.submit(self.get_obs_info, nxt)
                xa = self.one_step_da(gt, xb, yo, H, R)
                self._save_intermediate(current_time, xb, xa, gt, yo)
                if self.forecast_eval:
                    # before the on-disk snapshot, so a preemption never
                    # leaves forecast_wrmse one row behind ana_wrmse; and
                    # BEFORE submitting the next prefetch — its truth
                    # reads must not run concurrently with the worker's
                    # (ReferenceLayoutStore.get_state shares one native
                    # pool and epoch counter, unsynchronized)
                    self._forecast_eval(xa, current_time)
                    if submit_next:
                        fut = pool.submit(self.get_obs_info, nxt)
                self.save_eval_result()
                xb = self._advance(self.forecast_params, xa)
                current_time = nxt
                if epoch % self.cfg.save_interval == 0:
                    self.save_ckpt(current_time, xb)
                    self.save_eval_result(consolidate=True)
                epoch += 1
                if self.verbose:
                    print(f"  cycle took {time.time() - t0:.2f}s",
                          flush=True)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
        self.save_ckpt(current_time, xb)
        self.save_eval_result(consolidate=True)
        return xb
