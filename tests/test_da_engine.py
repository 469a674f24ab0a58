"""End-to-end DA engine tests on tiny grids (CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu import channels
from vaevar_tpu import config as cfgs
from vaevar_tpu.da import baselines
from vaevar_tpu.da import cost as cost_mod
from vaevar_tpu.da import obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.cvt import BMatrixAssets, CVTransform
from vaevar_tpu.da.cycler import CycledDA
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.data.era5 import LocalNpyStore, SyntheticEra5
from vaevar_tpu.models.vae import VAE

HW = (32, 64)


import functools


@functools.lru_cache(maxsize=1)
def tiny_vae():
    enc = cfgs.tiny_config(attn_type="relbias", lg_full_attn_first=False)
    enc = enc.replace(outchans_list=(4, 12, 12, 12, 12, 12))
    dec = enc.replace(
        inchans_list=(2, 6, 6, 6, 6, 6), outchans_list=(4, 13, 13, 13, 13, 13)
    )
    model = VAE(enc, dec)
    x = jnp.zeros((1, 69, *HW))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    dec_apply = lambda p, z: model.apply(p, z, method=VAE.decoder)
    return model, params, dec_apply


class TestObs:
    def test_obs_error_variance_modify_tp(self):
        v0 = obs_mod.obs_error_variance(0.005, 0)
        v2 = obs_mod.obs_error_variance(0.005, 2)
        np.testing.assert_allclose(v2[56:], v0[56:] / 16)
        np.testing.assert_allclose(v2[2], v0[2] / 16)
        np.testing.assert_allclose(v2[3:56], v0[3:56])

    def test_make_obs_mask_free(self):
        rng = np.random.default_rng(0)
        H = obs_mod.make_obs_mask("free_0001", 1, (100, 100), rng)
        assert H.shape == (1, 69, 100, 100)
        assert H[0, 0].sum() == 1000
        # column obs: identical mask across channels
        assert (H[0, 0] == H[0, 40]).all()

    def test_make_obs_mask_column_random(self):
        rng = np.random.default_rng(0)
        H = obs_mod.make_obs_mask("column_random_0100", 2, (100, 100), rng)
        assert H.shape == (2, 69, 100, 100)
        assert H[0, 0].sum() == pytest.approx(100)  # 1% of 1e4

    def test_build_R_with_q(self):
        var = obs_mod.obs_error_variance(0.01)
        q = np.ones((2, 69, 8, 16), np.float32)
        R = obs_mod.build_R(var, q, 3, (8, 16))
        np.testing.assert_allclose(R[0, :, 0, 0], var)
        np.testing.assert_allclose(R[1, :, 0, 0], var + 1)

    def test_station_gridding(self):
        reports = {
            "a": {"position": [180.0, 0.0, 500.0, 0.0],
                  "value": [None, 5500.0, 1.0, 2.0, 3.0, 250.0, None, 1012.0]},
            "b": {"position": [None, 0.0, 500.0, 0.0], "value": [0] * 8},
        }
        H = obs_mod.station_mask_from_reports(reports, 1, hw=(181, 360))
        lat, lon = 90, 180
        h = int(np.sum((obs_mod._STATION_HEIGHT_BINS - 500.0) <= 0))
        for vi in range(5):
            assert H[0, 4 + h + 13 * vi, lat, lon] == 1
        assert H[0, 3, lat, lon] == 1  # msl
        # surface mirrors lowest level
        assert (H[0, 0] == H[0, 42]).all()

    def test_real_obs_gridding_units(self):
        reports = [{
            "r1": {"position": [0.0, 90.0, 1000.0, 0.0],
                   "value": [1000.0, 100.0, 5.0, 1.0, 2.0, 20.0, None, 1000.0]},
        }]
        obs, H = obs_mod.grid_real_obs(reports, 1, dim_out=40, hw=(19, 36))
        assert obs.shape == (1, 204, 19, 36)
        lat, lon = 0, 0
        levels = obs_mod.obs_height_levels(40)
        bins = np.sqrt(levels[:-1] * levels[1:])
        h = int(np.sum((bins - 1000.0) <= 0))
        # z converted via *9.8 + lapse; q via *1e-6; t via +273.15 + lapse
        assert H[0, 4 + h, lat, lon] == 1
        assert obs[0, 4 + 40 + h, lat, lon] == pytest.approx(5e-6)
        assert obs[0, 3, lat, lon] == pytest.approx(1e5)

    def test_qc_filter(self):
        std_aug = obs_mod.std_layer_augmented(40)
        yo = np.zeros((1, 204, 4, 4), np.float32)
        gt = np.zeros_like(yo)
        yo[0, 50, 0, 0] = 100 * std_aug[50]  # gross error
        Hm = np.ones_like(yo)
        H2 = obs_mod.qc_filter(yo, gt, Hm, 0.1, "real", std_aug)
        assert H2[0, 50, 0, 0] == 0
        assert H2[0, 50, 1, 1] == 1


class TestVae4dvarSolve:
    @pytest.mark.slow
    def test_cost_decreases_and_analysis_beats_background(self):
        model, params, dec_apply = tiny_vae()
        src = SyntheticEra5(hw=HW, seed=3)
        gt = jnp.asarray(src.get_state(0))[None]  # (1, 69, H, W)
        xb = jnp.asarray(src.get_state(0)) + jnp.asarray(
            0.5 * channels.STD.reshape(-1, 1, 1) * np.random.default_rng(1).normal(
                size=(69, *HW)
            )
        ).astype(jnp.float32)
        rng = np.random.default_rng(0)
        H = jnp.asarray(obs_mod.make_obs_mask("free_0001", 1, HW, rng))
        var = obs_mod.obs_error_variance(0.005, 2)
        R = jnp.asarray(obs_mod.build_R(var, None, 1, HW))
        c, to_state, parts = cost_mod.make_vae4dvar_cost(dec_apply)
        bundle = ObsBundle(xb=xb, yo=gt, H=H, R=R)
        mp = {"decoder": params, "flow": None}
        z0 = jnp.zeros((1, 32, *HW), jnp.float32)
        j0 = float(c(z0, bundle, mp))
        solver = VariationalSolver(c, to_state, parts, lbfgs_iters=8)
        z, xa, diag = solver.solve(z0, bundle, mp, nit=2, gt=gt, verbose=False)
        j1 = float(c(z, bundle, mp))
        assert j1 < j0
        # background equals analysis at z=0; J must strictly improve
        assert diag.loss_obs[-1] < diag.loss_obs[0]
        # fused (diagnostics-free) path follows the identical optimizer
        # trajectory: L-BFGS state persists across segments exactly like
        # one continuous run (torch-LBFGS semantics, da_4dvar.py:1240,1298)
        z_f, xa_f, _ = solver.solve(z0, bundle, mp, nit=2, gt=None,
                                    verbose=False)
        np.testing.assert_allclose(np.asarray(z_f), np.asarray(z), rtol=2e-4,
                                   atol=2e-4)

    def test_sc4dvar_cost_decreases(self):
        src = SyntheticEra5(hw=HW, seed=4)
        gt = jnp.asarray(src.get_state(0))[None]
        xb = gt[0] + jnp.asarray(
            0.3 * channels.STD.reshape(-1, 1, 1)
        ).astype(jnp.float32)
        b = BMatrixAssets.synthetic()
        cvt = CVTransform(b, solver_hw=HW, out_hw=HW, hpad=28)
        rng = np.random.default_rng(0)
        H = jnp.asarray(obs_mod.make_obs_mask("free_0001", 1, HW, rng))
        R = jnp.asarray(obs_mod.build_R(obs_mod.obs_error_variance(0.01), None, 1, HW))
        c, to_state, parts = cost_mod.make_sc4dvar_cost(cvt)
        bundle = ObsBundle(xb=xb, yo=gt, H=H, R=R)
        w0 = jnp.zeros((69, *HW), jnp.float32)
        solver = VariationalSolver(c, to_state, parts, lbfgs_iters=5)
        w, xa, diag = solver.solve(w0, bundle, {}, nit=2, gt=gt, verbose=False)
        assert float(c(w, bundle, {})) < float(c(w0, bundle, {}))


class TestCycler:
    def _mk(self, tmp_path, mode, **kw):
        model, params, dec_apply = tiny_vae()
        src = SyntheticEra5(hw=HW, seed=5)
        kw.setdefault("da_win", 1)
        kw.setdefault("obs_type", "free_0001")
        cfg = cfgs.DAConfig(
            da_mode=mode,
            nit=1,
            lbfgs_iters=4,
            grid_hw=HW,
            solver_hw=HW,
            latent_shape=(1, 32, *HW),
            init_tp=1,
            init_lag=1,
            **kw,
        )
        integrate = lambda p, x, steps, interpolation=False: x  # persistence
        return CycledDA(
            cfg,
            src,
            integrate,
            decoder_apply=dec_apply,
            vae_params=params,
            cvt=CVTransform(BMatrixAssets.synthetic(), HW, HW, hpad=28),
            work_dir=str(tmp_path / mode),
            verbose=False,
        )

    @pytest.mark.slow
    def test_free_run_two_cycles(self, tmp_path):
        da = self._mk(tmp_path, "free_run")
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 12:00")
        assert len(da.metrics_list["bg_wrmse"]) == 2
        assert os.path.exists(os.path.join(da.work_dir, "xb.npy"))

    @pytest.mark.slow
    def test_vae4dvar_cycle_and_resume(self, tmp_path):
        da = self._mk(tmp_path, "vae4dvar")
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        n1 = len(da.metrics_list["ana_wrmse"])
        assert n1 == 1
        # resume: a fresh driver picks up where the first left off
        da2 = self._mk(tmp_path, "vae4dvar")
        da2.run_assimilation("2022-01-01 00:00", "2022-01-01 12:00")
        assert len(da2.metrics_list["ana_wrmse"]) == 2

    def test_lbfgs_max_evals_knob(self, tmp_path):
        """DAConfig.lbfgs_max_evals (run_da --lbfgs_max_evals) reaches
        the solver; default is torch's max_iter*5//4."""
        da = self._mk(tmp_path, "vae4dvar")
        assert da._solver.max_segment_evals == 4 * 5 // 4  # iters=4 here
        da2 = self._mk(tmp_path, "vae4dvar", lbfgs_max_evals=99)
        assert da2._solver.max_segment_evals == 99

    def test_interpolation_mode(self, tmp_path):
        da = self._mk(tmp_path, "interpolation")
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        assert len(da.metrics_list["ana_wrmse"]) == 1

    def test_save_field_and_forecast_eval(self, tmp_path):
        """--save_field/--save_gt/--save_obs per-cycle dumps and the
        per-cycle forecast WRMSE rollout (da_4dvar.py:708-722; the
        reference reserves forecast_wrmse but stubs evaluate())."""
        da = self._mk(tmp_path, "free_run")
        da.save_field = da.save_gt = da.save_obs = True
        da.forecast_eval = True
        da.forecast_eval_steps = 3
        da.metrics_list["forecast_wrmse"] = []
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        stamped = [f for f in os.listdir(da.work_dir)
                   if f.startswith(("xa_", "xb_", "gt_", "obs_"))]
        assert len(stamped) == 4, stamped
        fw = np.load(os.path.join(da.work_dir, "forecast_wrmse.npy"),
                     allow_pickle=True)
        assert np.asarray(fw[0]).shape == (3, 69)

    def test_metric_log_append_and_replay(self, tmp_path):
        """Per-cycle metric persistence is O(1) appends to
        metrics_log.jsonl; the consolidated reference-format .npy dumps
        happen only at save_interval/run end. A restart BETWEEN
        consolidations must replay the jsonl tail exactly."""
        da = self._mk(tmp_path, "free_run")
        da.metrics_list["bg_wrmse"].append(np.arange(69, dtype=np.float32))
        da.metrics_list["bg_mse"].append(0.5)
        da.save_eval_result()  # append-only: no .npy yet
        assert os.path.exists(os.path.join(da.work_dir,
                                           "metrics_log.jsonl"))
        assert not os.path.exists(os.path.join(da.work_dir, "bg_wrmse.npy"))
        # crash-restart between consolidations: jsonl tail replays
        da2 = self._mk(tmp_path, "free_run")
        assert len(da2.metrics_list["bg_wrmse"]) == 1
        np.testing.assert_allclose(da2.metrics_list["bg_wrmse"][0],
                                   np.arange(69))
        assert da2.metrics_list["bg_mse"] == [0.5]
        # consolidation writes the .npy dumps and truncates the log;
        # replay after that must not duplicate entries
        da2.metrics_list["bg_mse"].append(0.25)
        da2.save_eval_result(consolidate=True)
        assert os.path.getsize(
            os.path.join(da.work_dir, "metrics_log.jsonl")) == 0
        np.testing.assert_allclose(
            np.load(os.path.join(da.work_dir, "bg_mse.npy")), [0.5, 0.25])
        da3 = self._mk(tmp_path, "free_run")
        assert da3.metrics_list["bg_mse"] == [0.5, 0.25]
        assert len(da3.metrics_list["bg_wrmse"]) == 1

    def test_obs_from_numpy(self, tmp_path):
        """Pre-gridded obs files replace station gridding
        (da_4dvar.py:179-190,302-304) and feed the same QC pipeline."""
        import pandas as pd

        from vaevar_tpu.da import obs as obs_mod

        root = tmp_path / "npyobs"
        t = pd.Timestamp("2022-01-01 00:00")
        d = root / "2022"
        os.makedirs(d)
        stem = str(t.to_datetime64())[:13]
        rr = np.random.default_rng(0)
        C = 4 + 5 * 40
        yo = rr.normal(size=(1, C, *HW)).astype(np.float32)
        Hm = (rr.random((1, C, *HW)) < 0.1).astype(np.float32)
        np.save(d / f"{stem}-obs.npy", yo)
        np.save(d / f"{stem}-mask.npy", Hm)

        got_yo, got_H = obs_mod.load_numpy_obs(str(root), t, 1)
        np.testing.assert_array_equal(got_yo, yo)
        np.testing.assert_array_equal(got_H, Hm)

        da = self._mk(tmp_path, "free_run", obs_type="real_simu")
        da.obs_from_numpy = str(root)
        yo2, H2, R2, gt = da.get_obs_info(t)
        assert yo2.shape == (1, C, *HW)
        # QC + real_simu substitution applied downstream of the file load
        assert float(jnp.sum(H2)) <= float(np.sum(Hm))
        np.testing.assert_allclose(
            np.asarray(yo2), np.asarray(yo2) * (np.asarray(H2) > 0)
        )

    @pytest.mark.slow
    def test_window_cycle_reduced_matches_full(self, tmp_path, monkeypatch):
        """A da_win=2 vae4dvar cycle through the cycler: the reduced
        window path (production default for synthetic obs) reproduces the
        full windowed cost's analysis."""
        from vaevar_tpu.models.lgunet import LGUnet

        flow = LGUnet(cfgs.micro_config(img_size=HW))
        fparams = flow.init(jax.random.PRNGKey(7), jnp.zeros((1, 69, *HW)))

        def mk(workdir):
            da = self._mk(tmp_path / workdir, "vae4dvar", da_win=2)
            da.flow_apply = flow.apply
            da.flow_params = fparams
            da._params["flow"] = fparams
            da._reduce_obs = None
            da._solver = da._build_solver()
            return da

        da_r = mk("red")
        assert da_r._reduce_obs is not None  # window-reduced engaged
        da_r.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")

        monkeypatch.setattr(CycledDA, "_reducible",
                            property(lambda self: False))
        da_f = mk("full")
        assert da_f._reduce_obs is None
        da_f.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")

        np.testing.assert_allclose(
            np.asarray(da_r.metrics_list["ana_wrmse"]),
            np.asarray(da_f.metrics_list["ana_wrmse"]),
            rtol=1e-4,
        )

    @pytest.mark.slow
    def test_prefetch_matches_serial(self, tmp_path):
        """Threaded obs prefetch (overlapping IO with the solve) must
        reproduce the serial loop bit-for-bit: same synthetic-mask RNG
        draw order, same metrics over 3 cycles."""
        da_s = self._mk(tmp_path / "serial", "vae4dvar")
        da_s.prefetch_obs = False
        da_s.run_assimilation("2022-01-01 00:00", "2022-01-01 18:00")
        da_p = self._mk(tmp_path / "prefetch", "vae4dvar")
        assert da_p.prefetch_obs
        da_p.run_assimilation("2022-01-01 00:00", "2022-01-01 18:00")
        for k in ("bg_wrmse", "ana_wrmse"):
            np.testing.assert_array_equal(
                np.asarray(da_s.metrics_list[k]),
                np.asarray(da_p.metrics_list[k]),
            )


class TestInterpolationGolden:
    """Value-level parity of baselines.interpolation_analysis with a
    direct transcription of the reference's interpolation branch
    (da_4dvar.py:968-1061): per-layer scipy griddata fill of unobserved
    cells, >10-known threshold, NaN -> background fallback, and (real obs)
    the 13->40-level augmentation before / inverse after. The reference
    hardcodes `for i in range(204)` (:1017) — its branch only ever runs on
    real obs; ours generalizes the loop to C_obs channels."""

    @staticmethod
    def _reference_interpolation(xb, y0, H0, real, dim_out=40):
        import torch
        import torch.nn.functional as F
        from scipy.interpolate import griddata

        from vaevar_tpu.ops.interp import (
            obs_level_interp_matrix, obs_level_interp_matrix_inv)

        nlev = 13
        if real:
            interp = torch.from_numpy(
                np.asarray(obs_level_interp_matrix(dim_out)))
            xb0 = torch.from_numpy(xb).unsqueeze(0)
            xb_aug = [xb0[:, :4]]
            for i in range(5):
                mat = xb0[:, 4 + i * nlev: 4 + (i + 1) * nlev]
                mat = F.linear(mat.transpose(1, 3), interp).transpose(1, 3)
                xb_aug.append(mat)
            xb0 = torch.cat(xb_aug, 1).squeeze(0).numpy()
        else:
            xb0 = xb.copy()

        xa = xb0.copy()
        for i in range(y0.shape[0]):  # reference: range(204), real-only
            a, b = y0[i], H0[i]
            known_values = a[b == 1]
            known_coords = np.argwhere(b == 1)
            unknown_coords = np.argwhere(b == 0)
            if len(known_values) > 10:
                xa[i][b == 0] = griddata(known_coords, known_values,
                                         unknown_coords, method="linear")
        mask = np.isnan(xa)
        xa[mask] = xb0[mask]

        if real:
            interp_inv = torch.from_numpy(
                np.asarray(obs_level_interp_matrix_inv(dim_out)))
            xa0 = torch.from_numpy(xa).unsqueeze(0)
            xa_aug = [xa0[:, :4]]
            for i in range(5):
                mat = xa0[:, 4 + i * dim_out: 4 + (i + 1) * dim_out]
                mat = F.linear(mat.transpose(1, 3),
                               interp_inv).transpose(1, 3)
                xa_aug.append(mat)
            xa = torch.cat(xa_aug, 1).squeeze(0).numpy()
        return xa

    def test_synthetic_obs_matches_reference_transcription(self):
        rr = np.random.default_rng(0)
        hw = (19, 36)
        xb = rr.normal(size=(69, *hw)).astype(np.float32)
        yo = rr.normal(size=(69, *hw)).astype(np.float32)
        Hm = np.zeros((69, *hw), np.float32)
        cols = rr.random(hw) < 0.15  # column obs, ~100 points/channel
        Hm[:] = cols
        Hm[5] = 0.0  # a channel below the >10-known threshold: untouched
        got = baselines.interpolation_analysis(xb, yo, Hm)
        want = self._reference_interpolation(xb, yo, Hm, real=False)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        assert not np.allclose(got, xb)  # the fill actually happened
        np.testing.assert_array_equal(got[5], xb[5])

    @pytest.mark.slow
    def test_real_obs_matches_reference_transcription(self):
        rr = np.random.default_rng(1)
        hw = (19, 36)
        dim_out = 40
        C = 4 + 5 * dim_out
        xb = rr.normal(size=(69, *hw)).astype(np.float32)
        yo = rr.normal(size=(C, *hw)).astype(np.float32)
        Hm = np.zeros((C, *hw), np.float32)
        Hm[:] = rr.random(hw) < 0.2
        got = baselines.interpolation_analysis(
            xb, yo, Hm, real_obs=True, dim_out=dim_out)
        want = self._reference_interpolation(xb, yo, Hm, real=True,
                                             dim_out=dim_out)
        assert got.shape == want.shape == (69, *hw)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestData:
    def test_synthetic_coherence(self):
        src = SyntheticEra5(hw=(16, 32), seed=0)
        s0 = src.get_state(0)
        s1 = src.get_state(1)
        s0b = src.get_state(0)
        np.testing.assert_array_equal(s0, s0b)  # deterministic
        assert not np.allclose(s0, s1)  # evolves
        # consecutive states are correlated (synoptic coherence)
        c0 = (s0 - channels.MEAN.reshape(-1, 1, 1)) / channels.STD.reshape(-1, 1, 1)
        c1 = (s1 - channels.MEAN.reshape(-1, 1, 1)) / channels.STD.reshape(-1, 1, 1)
        corr = np.mean(c0 * c1) / (np.std(c0) * np.std(c1))
        assert corr > 0.5

    def test_local_store_roundtrip(self, tmp_path):
        import pandas as pd

        store = LocalNpyStore(str(tmp_path), hw=(8, 16))
        ts = pd.Timestamp("2022-01-01 06:00")
        x = np.random.default_rng(0).normal(size=(69, 8, 16)).astype(np.float32)
        store.save_state(ts, x)
        assert store.has(ts)
        np.testing.assert_array_equal(store.get_state(ts), x)


class TestReducedObsCost:
    """cost.make_vae4dvar_cost_reduced == full cost for da_win=1 (exact
    algebra for nearest upsampling)."""

    @pytest.mark.slow
    def test_reduced_equals_full(self):
        import functools

        from vaevar_tpu import config as cfgs
        from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
        from vaevar_tpu.da.cost import ObsBundle
        from vaevar_tpu.models.lgunet import LGUnet

        low, full = (16, 32), (47, 93)  # non-integer ratio on purpose
        dec_cfg = cfgs.micro_config(img_size=low, inchans_list=(2, 6),
                                    outchans_list=(13, 56))
        dec = LGUnet(dec_cfg)
        z = 0.1 * jnp.ones((1, 8, *low), jnp.float32)
        params = {"decoder": dec.init(jax.random.PRNGKey(0), z),
                  "flow": None}

        rr = np.random.default_rng(0)
        xb = jnp.asarray(rr.normal(size=(69, *full)), jnp.float32)
        yo = jnp.asarray(rr.normal(size=(1, 69, *full)), jnp.float32)
        Hm = jnp.asarray((rr.random((1, 69, *full)) < 0.3).astype(np.float32))
        R = jnp.asarray(0.5 + rr.random((1, 69, *full)).astype(np.float32))
        bundle = ObsBundle(xb=xb, yo=yo, H=Hm, R=R)

        cf, tsf, pf = cost_mod.make_vae4dvar_cost(dec.apply, obs_coeff=1.3)
        cr, tsr, pr = cost_mod.make_vae4dvar_cost_reduced(dec.apply,
                                                          obs_coeff=1.3)
        red = cost_mod.reduce_obs(bundle, low)

        jf = float(cf(z, bundle, params))
        jr = float(cr(z, red, params))
        assert abs(jf - jr) / abs(jf) < 1e-5, (jf, jr)
        # states identical
        np.testing.assert_allclose(
            np.asarray(tsf(z, bundle, params)),
            np.asarray(tsr(z, red, params)), atol=1e-5,
        )
        # gradients identical up to f32 summation order (values O(1e6);
        # measured median rel diff 3e-7, max 2e-4)
        gf = np.asarray(jax.grad(lambda q: cf(q, bundle, params))(z))
        gr = np.asarray(jax.grad(lambda q: cr(q, red, params))(z))
        rel = np.abs(gr - gf) / (np.abs(gf) + 1e-3)
        assert np.median(rel) < 1e-5 and rel.max() < 1e-3

    def test_sc4dvar_reduced_equals_full(self):
        """Same reduction for the CVT path (nearest upsample at
        da_4dvar.py:928 admits the identical per-cell quadratic)."""
        from vaevar_tpu.da import cost as cost_mod
        from vaevar_tpu.da.cost import ObsBundle
        from vaevar_tpu.da.cvt import BMatrixAssets, CVTransform

        low, full = (32, 64), (97, 190)
        cvt = CVTransform(BMatrixAssets.synthetic(), solver_hw=low,
                          out_hw=full, hpad=28)
        rr = np.random.default_rng(1)
        w = jnp.asarray(0.1 * rr.normal(size=(69, *low)), jnp.float32)
        xb = jnp.asarray(rr.normal(size=(69, *full)), jnp.float32)
        yo = jnp.asarray(rr.normal(size=(1, 69, *full)), jnp.float32)
        Hm = jnp.asarray((rr.random((1, 69, *full)) < 0.3).astype(np.float32))
        R = jnp.asarray(0.5 + rr.random((1, 69, *full)).astype(np.float32))
        bundle = ObsBundle(xb=xb, yo=yo, H=Hm, R=R)

        cf, tsf, _ = cost_mod.make_sc4dvar_cost(cvt, obs_coeff=0.7)
        cr, tsr, _ = cost_mod.make_sc4dvar_cost_reduced(cvt.increment,
                                                        obs_coeff=0.7)
        red = cost_mod.reduce_obs(bundle, low)

        jf = float(cf(w, bundle, None))
        jr = float(cr(w, red, None))
        assert abs(jf - jr) / abs(jf) < 1e-5, (jf, jr)
        np.testing.assert_allclose(
            np.asarray(tsf(w, bundle, None)),
            np.asarray(tsr(w, red, None)), atol=1e-5,
        )
        gf = np.asarray(jax.grad(lambda q: cf(q, bundle, None))(w))
        gr = np.asarray(jax.grad(lambda q: cr(q, red, None))(w))
        rel = np.abs(gr - gf) / (np.abs(gf) + 1e-3)
        # f32 summation-order noise; measured median 1e-7, max 1.5e-3
        assert np.median(rel) < 1e-5 and rel.max() < 5e-3


@pytest.mark.slow
class TestReducedWindowCost:
    """cost.make_vae4dvar_cost_window_reduced == full windowed cost for
    da_win>1: the nearest down/up resizes of the in-cost rollout cancel
    exactly, so the per-slot reduction is exact algebra (ReducedWindowObs)."""

    def _setup(self, da_win=3):
        from vaevar_tpu.models.lgunet import LGUnet

        low, full = (16, 32), (47, 93)  # non-integer ratio on purpose
        dec_cfg = cfgs.micro_config(img_size=low, inchans_list=(2, 6),
                                    outchans_list=(13, 56))
        dec = LGUnet(dec_cfg)
        z = 0.1 * jnp.ones((1, 8, *low), jnp.float32)
        flow = LGUnet(cfgs.micro_config(img_size=low))
        params = {
            "decoder": dec.init(jax.random.PRNGKey(0), z),
            "flow": flow.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 69, *low))),
        }
        rr = np.random.default_rng(0)
        m = channels.MEAN.reshape(-1, 1, 1)
        s = channels.STD.reshape(-1, 1, 1)
        xb = jnp.asarray(m + s * rr.normal(size=(69, *full)), jnp.float32)
        yo = jnp.asarray(m[None] + s[None] * rr.normal(
            size=(da_win, 69, *full)), jnp.float32)
        Hm = jnp.asarray(
            (rr.random((da_win, 69, *full)) < 0.3).astype(np.float32))
        R = jnp.asarray(
            (0.5 + rr.random((da_win, 69, *full))).astype(np.float32))
        bundle = ObsBundle(xb=xb, yo=yo, H=Hm, R=R)
        return dec.apply, flow.apply, bundle, params, z, low

    def test_window_reduced_equals_full(self):
        da_win = 3
        dec_apply, flow_apply, bundle, params, z, low = self._setup(da_win)
        cf, tsf, pf = cost_mod.make_vae4dvar_cost(
            dec_apply, flow_apply, flow_hw=low, da_win=da_win,
            obs_coeff=1.3)
        cr, tsr, pr = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, flow_apply, da_win=da_win, obs_coeff=1.3)
        red = cost_mod.reduce_obs_window(bundle, low)

        jf = float(cf(z, bundle, params))
        jr = float(cr(z, red, params))
        assert abs(jf - jr) / abs(jf) < 1e-5, (jf, jr)
        np.testing.assert_allclose(
            np.asarray(tsf(z, bundle, params)),
            np.asarray(tsr(z, red, params)), atol=1e-5,
        )
        jb_f, jo_f = pf(z, bundle, params)
        jb_r, jo_r = pr(z, red, params)
        np.testing.assert_allclose(float(jo_r), float(jo_f), rtol=1e-5)
        np.testing.assert_allclose(float(jb_r), float(jb_f), rtol=1e-6)
        gf = np.asarray(jax.grad(lambda q: cf(q, bundle, params))(z))
        gr = np.asarray(jax.grad(lambda q: cr(q, red, params))(z))
        rel = np.abs(gr - gf) / (np.abs(gf) + 1e-3)
        # elementwise agreement is f32-noise-bound on near-zero entries
        # (the cell-mean ybar rounds at 1e-7 relative, amplified where the
        # innovation is tiny); the norm-relative error is the meaningful
        # bound for the optimizer trajectory
        nrel = np.linalg.norm(gr - gf) / np.linalg.norm(gf)
        assert np.median(rel) < 1e-5 and nrel < 5e-4, (np.median(rel), nrel)

    def test_step_checkpoint_knob_is_value_neutral(self):
        """window_step_checkpoint (run_da --win_remat) is a pure
        rematerialization toggle: J, Jo, and grads must be IDENTICAL with
        it on or off (jax.checkpoint changes recompute, not values)."""
        da_win = 3
        dec_apply, flow_apply, bundle, params, z, low = self._setup(da_win)
        red = cost_mod.reduce_obs_window(bundle, low)
        c_on, _, p_on = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, flow_apply, da_win=da_win, step_checkpoint=True)
        c_off, _, p_off = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, flow_apply, da_win=da_win, step_checkpoint=False)
        np.testing.assert_allclose(float(c_on(z, red, params)),
                                   float(c_off(z, red, params)), rtol=1e-6)
        np.testing.assert_allclose(
            float(p_on(z, red, params)[1]), float(p_off(z, red, params)[1]),
            rtol=1e-6)
        g_on = np.asarray(jax.grad(lambda q: c_on(q, red, params))(z))
        g_off = np.asarray(jax.grad(lambda q: c_off(q, red, params))(z))
        nrel = np.linalg.norm(g_on - g_off) / np.linalg.norm(g_off)
        assert nrel < 1e-5, nrel

    def test_window_dispatch_modes_identical_trajectory(self):
        """DAConfig.window_dispatch (run_da --window_dispatch) only changes
        XLA program granularity: per-iteration, per-segment, and fused
        solves must return the same analysis (L-BFGS state continuation)."""
        from vaevar_tpu.da.solver import VariationalSolver

        da_win = 2
        dec_apply, flow_apply, bundle, params, z, low = self._setup(da_win)
        red = cost_mod.reduce_obs_window(bundle, low)
        c, ts, parts = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, flow_apply, da_win=da_win)

        kws = {
            "iter": dict(segment_dispatch=True, iters_per_dispatch=1),
            "segment": dict(segment_dispatch=True, iters_per_dispatch=None),
            "fused": {},
        }
        # the dispatched granularities share bitwise-identical programs;
        # the fused path runs the same segment body inside a lax.scan,
        # where XLA's different fusion choices shift f32 rounding by ulps
        # (measured norm-rel 1.8e-8 here; a z500-scale physical field has
        # ~4e-3 PER ULP, so elementwise atol is not a meaningful bound)
        xas = {}
        for mode, kw in kws.items():
            s = VariationalSolver(c, ts, parts, lbfgs_iters=4, history=4,
                                  **kw)
            _, xa, _ = s.solve(z, red, params, nit=2, gt=None, verbose=False)
            xas[mode] = np.asarray(xa)

        def nrel(a, b):
            return np.linalg.norm(a - b) / np.linalg.norm(b)

        np.testing.assert_array_equal(xas["segment"], xas["iter"])
        assert nrel(xas["fused"], xas["iter"]) < 1e-6

    @pytest.mark.slow
    def test_jvp_zoom_linesearch_matches_zoom_on_window_solve(self):
        """DAConfig.lbfgs_linesearch="jvp-zoom" (run_da --lbfgs_linesearch)
        replaces reverse-mode linesearch probes with forward-mode jvp
        probes (da/lbfgs.scale_by_jvp_zoom_linesearch). The zoom's
        decisions consume only (value, slope), and jvp's slope equals
        vdot(grad, direction) to fp noise — the analysis must match the
        reverse-mode solve to optimizer-trajectory noise."""
        from vaevar_tpu.da.solver import VariationalSolver

        da_win = 2
        dec_apply, flow_apply, bundle, params, z, low = self._setup(da_win)
        red = cost_mod.reduce_obs_window(bundle, low)
        c, ts, parts = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, flow_apply, da_win=da_win)

        xas = {}
        for ls in ("zoom", "jvp-zoom"):
            s = VariationalSolver(c, ts, parts, lbfgs_iters=4, history=4,
                                  linesearch=ls)
            x, xa, _ = s.solve(z, red, params, nit=2, gt=None, verbose=False)
            xas[ls] = (np.asarray(xa), float(c(x, red, params)))

        nrel = (np.linalg.norm(xas["jvp-zoom"][0] - xas["zoom"][0])
                / np.linalg.norm(xas["zoom"][0]))
        assert nrel < 1e-5, nrel
        np.testing.assert_allclose(xas["jvp-zoom"][1], xas["zoom"][1],
                                   rtol=1e-4)

    def test_jvp_zoom_rejects_custom_vjp_cost_with_clear_error(self):
        """lbfgs_linesearch="jvp-zoom" + a cost that routes through the
        custom-VJP flash attention (ops/flash.py — forward-mode AD cannot
        trace custom_vjp) must fail at the FIRST solve with an actionable
        message, not jax's obscure trace-time TypeError (ADVICE r4,
        da/solver._assert_jvp_compatible)."""
        from vaevar_tpu.da.solver import VariationalSolver
        from vaevar_tpu.ops.flash import flash_attention

        def cost(x, bundle, params):
            q = x.reshape(1, 1, 8, 4)
            return jnp.sum(flash_attention(q, q, q, 4, 4) ** 2)

        s = VariationalSolver(cost, lambda x, b, p: x,
                              lambda x, b, p: (0.0, 0.0),
                              lbfgs_iters=2, linesearch="jvp-zoom")
        with pytest.raises(ValueError, match="jvp-zoom"):
            s.solve(jnp.ones(32), jnp.zeros(1), {}, nit=1, gt=None,
                    verbose=False)
        # same cost under reverse-mode zoom is fine (no guard, no error)
        s2 = VariationalSolver(cost, lambda x, b, p: x,
                               lambda x, b, p: (0.0, 0.0),
                               lbfgs_iters=2, linesearch="zoom")
        x, _, _ = s2.solve(jnp.ones(32), jnp.zeros(1), {}, nit=1, gt=None,
                           verbose=False)
        assert np.all(np.isfinite(np.asarray(x)))

    def test_cycler_window_dispatch_mapping(self):
        """_window_dispatch_kw: 3D-Var ignores the knob; 'fused' falls back
        to per-iteration dispatch when the cost is NOT reducible (full-grid
        window programs run minutes and trip the worker watchdog)."""
        from vaevar_tpu.config import DAConfig
        from vaevar_tpu.da.cycler import CycledDA

        class Dummy:
            _window_dispatch_kw = CycledDA._window_dispatch_kw

        d = Dummy()
        d.cfg = DAConfig(da_win=1, window_dispatch="fused")
        d._reducible = True
        assert d._window_dispatch_kw() == {}

        d.cfg = DAConfig(da_win=6, window_dispatch="iter")
        assert d._window_dispatch_kw() == {
            "segment_dispatch": True, "iters_per_dispatch": 1}

        d.cfg = DAConfig(da_win=6, window_dispatch="segment")
        assert d._window_dispatch_kw() == {
            "segment_dispatch": True, "iters_per_dispatch": None}

        # "fused" is only honored for reverse-mode zoom: forward-mode
        # linesearches ("jvp-zoom"/"auto", the default) demote to segment
        # dispatch — the fused jvp window program wedges the XLA compile
        # service (docs/PERF.md round 5)
        d.cfg = DAConfig(da_win=6, window_dispatch="fused",
                         lbfgs_linesearch="zoom")
        assert d._window_dispatch_kw() == {}
        d.cfg = DAConfig(da_win=6, window_dispatch="fused")  # auto default
        assert d._window_dispatch_kw() == {
            "segment_dispatch": True, "iters_per_dispatch": None}
        d.cfg = DAConfig(da_win=6, window_dispatch="fused",
                         lbfgs_linesearch="zoom")
        d._reducible = False  # e.g. real obs: full windowed cost
        assert d._window_dispatch_kw() == {
            "segment_dispatch": True, "iters_per_dispatch": 1}

    def test_auto_linesearch_resolves_by_cost(self):
        """lbfgs_linesearch="auto" (the DAConfig default) must resolve to
        "jvp-zoom" for forward-mode-differentiable costs and quietly fall
        back to "zoom" for custom-VJP flash costs — no error, same
        analysis either way (trajectory identity is pinned separately)."""
        from vaevar_tpu.da.solver import VariationalSolver
        from vaevar_tpu.ops.flash import flash_attention

        def plain_cost(x, bundle, params):
            return jnp.sum((x - 1.0) ** 2) + jnp.sum(x * bundle)

        s = VariationalSolver(plain_cost, lambda x, b, p: x,
                              lambda x, b, p: (0.0, 0.0),
                              lbfgs_iters=2, linesearch="auto")
        assert s.linesearch == "auto" and not hasattr(s, "segment")
        x, _, _ = s.solve(jnp.ones(8), jnp.zeros(8), {}, nit=1, gt=None,
                          verbose=False)
        assert s.linesearch == "jvp-zoom"
        assert np.all(np.isfinite(np.asarray(x)))

        def flash_cost(x, bundle, params):
            q = x.reshape(1, 1, 8, 4)
            return jnp.sum(flash_attention(q, q, q, 4, 4) ** 2)

        s2 = VariationalSolver(flash_cost, lambda x, b, p: x,
                               lambda x, b, p: (0.0, 0.0),
                               lbfgs_iters=2, linesearch="auto")
        x2, _, _ = s2.solve(jnp.ones(32), jnp.zeros(1), {}, nit=1, gt=None,
                            verbose=False)
        assert s2.linesearch == "zoom"
        assert np.all(np.isfinite(np.asarray(x2)))

    def test_resample_gather_matches_resize_composition(self):
        """S = down∘up as an index table equals actually composing the
        torch-convention nearest resizes (the identity only at integer
        ratios — 47/16 and 93/32 are not)."""
        from vaevar_tpu.da.cost import _resample_gather
        from vaevar_tpu.ops.interp import resize_nearest

        v = jnp.arange(16 * 32, dtype=jnp.float32).reshape(1, 16, 32)
        dn = resize_nearest(resize_nearest(v, (47, 93)), (16, 32))
        gh = _resample_gather(47, 16)
        gw = _resample_gather(93, 32)
        np.testing.assert_array_equal(
            np.asarray(dn), np.asarray(v)[:, gh][:, :, gw]
        )
        assert not np.array_equal(gh, np.arange(16))  # genuinely non-trivial

    def test_degenerates_to_3dvar_reducer(self):
        """At da_win=1 the window reducer and the 3D-Var reducer are the
        same quadratic (slot-0 innovation form) — J and grads agree."""
        dec_apply, _flow, bundle, params, z, low = self._setup(da_win=1)
        c3, _, _ = cost_mod.make_vae4dvar_cost_reduced(dec_apply,
                                                       obs_coeff=1.3)
        cw, _, _ = cost_mod.make_vae4dvar_cost_window_reduced(
            dec_apply, None, da_win=1, obs_coeff=1.3)
        r3 = cost_mod.reduce_obs(bundle, low)
        rw = cost_mod.reduce_obs_window(bundle, low)
        j3, jw = float(c3(z, r3, params)), float(cw(z, rw, params))
        assert abs(j3 - jw) / abs(j3) < 1e-5, (j3, jw)
        g3 = np.asarray(jax.grad(lambda q: c3(q, r3, params))(z))
        gw = np.asarray(jax.grad(lambda q: cw(q, rw, params))(z))
        nrel = np.linalg.norm(gw - g3) / np.linalg.norm(g3)
        assert nrel < 5e-4, nrel

    def test_sc4dvar_window_reduced_equals_full(self):
        da_win = 2
        _dec, flow_apply, bundle, params, _z, low = self._setup(da_win)
        b = BMatrixAssets.synthetic()
        cvt = CVTransform(b, solver_hw=low, out_hw=bundle.xb.shape[-2:],
                          hpad=28)
        w = jnp.asarray(
            0.1 * np.random.default_rng(3).normal(size=(69, *low)),
            jnp.float32)
        cf, tsf, pf = cost_mod.make_sc4dvar_cost(
            cvt, flow_apply, flow_hw=low, da_win=da_win, obs_coeff=0.7)
        cr, tsr, pr = cost_mod.make_sc4dvar_cost_window_reduced(
            cvt.increment, flow_apply, da_win=da_win, obs_coeff=0.7)
        red = cost_mod.reduce_obs_window(bundle, low)
        jf = float(cf(w, bundle, params))
        jr = float(cr(w, red, params))
        assert abs(jf - jr) / abs(jf) < 1e-5, (jf, jr)
        np.testing.assert_allclose(
            np.asarray(tsf(w, bundle, params)),
            np.asarray(tsr(w, red, params)), atol=1e-5,
        )


@pytest.mark.slow
class TestWindowCost4DVar:
    """da_win>1: the in-scan accumulated obs term must equal the explicit
    materialized window (obs_term over _window_predict) and be
    differentiable through the rollout."""

    def _setup(self, da_win=3):
        from vaevar_tpu.models.lgunet import LGUnet

        model, params, dec_apply = tiny_vae()
        flow_cfg = cfgs.tiny_config(attn_type="relbias",
                                    lg_full_attn_first=False)
        flow = LGUnet(flow_cfg.replace(
            outchans_list=(8, 26, 26, 26, 26, 26)))
        fparams = flow.init(jax.random.PRNGKey(2), jnp.zeros((1, 69, *HW)))
        rr = np.random.default_rng(0)
        xb = jnp.asarray(
            channels.MEAN.reshape(-1, 1, 1)
            + channels.STD.reshape(-1, 1, 1)
            * rr.normal(size=(69, *HW)),
            jnp.float32,
        )
        yo = jnp.asarray(
            channels.MEAN.reshape(-1, 1, 1)[None]
            + channels.STD.reshape(-1, 1, 1)[None]
            * rr.normal(size=(da_win, 69, *HW)),
            jnp.float32,
        )
        Hm = jnp.asarray(
            (rr.random((da_win, 69, *HW)) < 0.1).astype(np.float32)
        )
        R = jnp.ones((da_win, 69, *HW), jnp.float32)
        bundle = ObsBundle(xb=xb, yo=yo, H=Hm, R=R)
        mp = {"decoder": params, "flow": fparams}
        return dec_apply, flow.apply, bundle, mp

    def test_accumulated_equals_materialized(self):
        da_win = 3
        dec_apply, flow_apply, bundle, mp = self._setup(da_win)
        c, to_state, parts = cost_mod.make_vae4dvar_cost(
            dec_apply, flow_apply, flow_hw=HW, da_win=da_win)
        z = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 32, *HW)) * 0.1,
            jnp.float32,
        )
        got = float(c(z, bundle, mp))
        # explicit materialized reference
        x0 = to_state(z, bundle, mp)
        preds = cost_mod._window_predict(x0, flow_apply, HW, da_win, mp)
        want = float(
            0.5 * jnp.sum(z**2) + cost_mod.obs_term(preds, bundle)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)
        jb, jo = parts(z, bundle, mp)
        np.testing.assert_allclose(float(jb) + float(jo), got, rtol=1e-5)

    def test_gradient_flows_through_rollout(self):
        da_win = 2
        dec_apply, flow_apply, bundle, mp = self._setup(da_win)
        c, _, _ = cost_mod.make_vae4dvar_cost(
            dec_apply, flow_apply, flow_hw=HW, da_win=da_win)
        z = jnp.zeros((1, 32, *HW), jnp.float32)
        g = jax.grad(lambda q: c(q, bundle, mp))(z)
        assert float(jnp.sum(jnp.abs(g))) > 0
        assert np.isfinite(np.asarray(g)).all()
