"""Real-obs (station network) DA cycle + eval holdout tests."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu import config as cfgs
from vaevar_tpu.da.cycler import CycledDA
from vaevar_tpu.data.era5 import SyntheticEra5
from vaevar_tpu.data.reports import LocalReportsStore, SyntheticReports
from vaevar_tpu.models.vae import VAE

HW = (32, 64)


@functools.lru_cache(maxsize=1)
def micro_vae():
    enc = cfgs.micro_config(img_size=HW, attn_type="relbias",
                            outchans_list=(4, 12, 12, 12, 12, 12))
    dec = enc.replace(
        inchans_list=(2, 6, 6, 6, 6, 6), outchans_list=(4, 13, 13, 13, 13, 13)
    )
    model = VAE(enc, dec)
    x = jnp.zeros((1, 69, *HW))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    dec_apply = lambda p, z: model.apply(p, z, method=VAE.decoder)
    return model, params, dec_apply


class TestSyntheticReports:
    def test_reports_roundtrip_units(self):
        src = SyntheticEra5(hw=HW, seed=0)
        rep = SyntheticReports(src, n_stations=50, seed=1)
        d = rep.get_reports(0)
        assert len(d) == 50
        elem = next(iter(d.values()))
        assert len(elem["position"]) == 4 and len(elem["value"]) == 8

    def test_local_store_missing_returns_empty(self, tmp_path):
        store = LocalReportsStore(str(tmp_path))
        assert store.get_reports(__import__("pandas").Timestamp("2022-01-01")) == {}


class TestRealObsCycle:
    def _mk(self, tmp_path, mode="vae4dvar", obs_type="real_simu", **kw):
        model, params, dec_apply = micro_vae()
        src = SyntheticEra5(hw=HW, seed=5)
        cfg = cfgs.DAConfig(
            da_mode=mode,
            da_win=1,
            nit=1,
            lbfgs_iters=3,
            obs_type=obs_type,
            grid_hw=HW,
            solver_hw=HW,
            latent_shape=(1, 32, *HW),
            init_tp=1,
            init_lag=1,
            interp_dim=40,
            **kw,
        )
        integrate = lambda p, x, steps, interpolation=False: x
        return CycledDA(
            cfg,
            src,
            integrate,
            decoder_apply=dec_apply,
            vae_params=params,
            reports_source=SyntheticReports(src, n_stations=200, seed=2),
            work_dir=str(tmp_path / f"{mode}_{obs_type}"),
            verbose=False,
        )

    @pytest.mark.slow
    def test_real_simu_cycle(self, tmp_path):
        da = self._mk(tmp_path)
        yo, H, R, gt = da.get_obs_info(__import__("pandas").Timestamp("2022-01-01"))
        assert yo.shape == (1, 204, *HW)
        assert H.shape == (1, 204, *HW)
        # R is broadcastable per-channel (obs.build_R keeps grid dims at 1)
        assert R.shape == (1, 204, 1, 1)
        assert float(jnp.sum(H)) > 0
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        assert len(da.metrics_list["ana_wrmse"]) == 1

    @pytest.mark.slow
    def test_real_obs_values_match_truth(self, tmp_path):
        # real_simu substitutes yo = gt_aug * H, so innovations at obs
        # points are zero against the truth
        import pandas as pd

        da = self._mk(tmp_path)
        yo, H, R, gt = da.get_obs_info(pd.Timestamp("2022-01-01"))
        from vaevar_tpu.ops.interp import augment_levels

        gt_aug = augment_levels(gt, da._interp)
        diff = np.asarray((yo - gt_aug) * H)
        np.testing.assert_allclose(diff, 0.0, atol=1e-4)

    @pytest.mark.slow
    def test_eval_holdout(self, tmp_path):
        da = self._mk(tmp_path, use_eval=True)
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        assert len(da.metrics_list["error_obs"]) == 1
        err = da.metrics_list["error_obs"][0]
        assert err.shape == (204,)
        assert np.isfinite(err).all()


class TestPrepbufrCycle:
    """obs_type=prepbufr*: station-JSON gridded 69-channel MASK family
    (da_4dvar.py:190-274) — reachable end to end through CycledDA."""

    def _mk(self, tmp_path, da_win=1, dt_range=(0.0, 0.0), **kw):
        model, params, dec_apply = micro_vae()
        src = SyntheticEra5(hw=HW, seed=5)
        cfg = cfgs.DAConfig(
            da_mode="vae4dvar", da_win=da_win, nit=1, lbfgs_iters=3,
            obs_type="prepbufr", q_type=-1, grid_hw=HW, solver_hw=HW,
            latent_shape=(1, 32, *HW), init_tp=1, init_lag=1, **kw,
        )
        integrate = lambda p, x, steps, interpolation=False: x
        return CycledDA(
            cfg, src, integrate,
            flow_apply=(lambda p, z: jnp.concatenate([z, z], 1))
            if da_win > 1 else None,
            decoder_apply=dec_apply, vae_params=params,
            reports_source=SyntheticReports(src, n_stations=200, seed=2,
                                            dt_range=dt_range),
            work_dir=str(tmp_path / f"prepbufr_win{da_win}"),
            verbose=False,
        )

    @pytest.mark.slow
    def test_prepbufr_cycle_win1(self, tmp_path):
        import pandas as pd

        da = self._mk(tmp_path)
        yo, H, R, gt = da.get_obs_info(pd.Timestamp("2022-01-01"))
        assert H.shape == (1, 69, *HW)
        assert R.shape == (1, 69, 1, 1)  # 69-channel R, NOT obs-level aug
        assert float(jnp.sum(H)) > 0
        # obs = truth at mask points (synthetic family semantics)
        np.testing.assert_allclose(np.asarray(yo), np.asarray(gt))
        # surface winds/temp mirror the lowest level (da_4dvar.py:272-274)
        Hn = np.asarray(H)
        np.testing.assert_array_equal(Hn[:, 0], Hn[:, 42])
        np.testing.assert_array_equal(Hn[:, 1], Hn[:, 55])
        np.testing.assert_array_equal(Hn[:, 2], Hn[:, 68])
        da.run_assimilation("2022-01-01 00:00", "2022-01-01 06:00")
        assert len(da.metrics_list["ana_wrmse"]) == 1

    def test_prepbufr_win6_two_file_slots(self, tmp_path):
        """da_win=6 reads TWO report files (ts and ts+6h); the second
        file's negative offsets land on slots 3-5 (da_4dvar.py:251-257)."""
        import pandas as pd

        da = self._mk(tmp_path, da_win=6, dt_range=(-3.0, 3.0))
        yo, H, R, gt = da.get_obs_info(pd.Timestamp("2022-01-01"))
        assert H.shape == (6, 69, *HW)
        per_slot = np.asarray(H).sum(axis=(1, 2, 3))
        # dt spread across [-3, 3): file 1 fills slots 0-3, file 2 (dt<-0.5
        # relative to +6h) fills slots 3-5 — every slot must see obs
        assert (per_slot > 0).all(), per_slot

    def test_prepbufr_guards(self, tmp_path):
        with pytest.raises(NotImplementedError, match="1 or 6"):
            self._mk(tmp_path, da_win=2)
        model, params, dec_apply = micro_vae()
        src = SyntheticEra5(hw=HW, seed=5)
        cfg = cfgs.DAConfig(
            da_mode="vae4dvar", obs_type="prepbufr", grid_hw=HW,
            solver_hw=HW, latent_shape=(1, 32, *HW),
        )
        with pytest.raises(ValueError, match="reports_source"):
            CycledDA(cfg, src, lambda p, x, s, i=False: x,
                     decoder_apply=dec_apply, vae_params=params,
                     work_dir=str(tmp_path / "noreports"), verbose=False)

    def test_report_fields_accepts_numpy_scalars(self):
        """Report sources often index numpy arrays without float()
        coercion; np.float32 positions must not be classed as malformed."""
        from vaevar_tpu.da import obs as obs_mod

        elem = {
            "position": [np.float32(90.0), np.float64(45.0),
                         np.float32(500.0), np.int64(0)],
            "value": [np.float32(500.0), np.float32(5500.0), None, None,
                      None, None, None, None],
        }
        got = obs_mod._report_fields(elem)
        assert got is not None
        # while bools and NaNs are still rejected
        assert obs_mod._report_fields(
            {"position": [True, 45.0, 500.0, 0.0], "value": [0.0] * 8}
        ) is None
        assert obs_mod._report_fields(
            {"position": [np.float32("nan"), 45.0, 500.0, 0.0],
             "value": [0.0] * 8}
        ) is None

    def test_make_obs_mask_rejects_prepbufr_with_pointer(self):
        from vaevar_tpu.da import obs as obs_mod

        with pytest.raises(ValueError, match="station_mask_from_reports"):
            obs_mod.make_obs_mask("prepbufr", 1, HW,
                                  np.random.default_rng(0))

    @pytest.mark.slow
    def test_cli_accepts_prepbufr(self, tmp_path):
        """The shipped reference launch knob (obs_type=prepbufr...) runs
        through run_da.py."""
        import os
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "run_da.py", "--da_mode", "vae4dvar",
             "--obs_type", "prepbufr", "--fast_init", "--micro",
             "--grid", "32x64", "--solver_grid", "32x64", "--Nit", "1",
             "--n_stations", "100",
             "--start_time", "2022-01-01 00:00:00",
             "--end_time", "2022-01-01 06:00:00",
             "--work_dir", str(tmp_path)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "DA complete" in r.stdout


class TestReportFixtures:
    """Real-file schema variance: fixture JSONs under tests/data/
    station_reports/ carry every reference edge case (da_4dvar.py:196-236:
    None positions, missing value slots, out-of-window dt, both-file slot
    overlap) PLUS malformed rows real prepbufr-derived files exhibit
    (missing keys, short lists, string/NaN positions). Malformed rows are
    skipped, never raised on."""

    FIXTURES = os.path.join(os.path.dirname(__file__), "data",
                            "station_reports")

    @pytest.fixture(scope="class")
    def store(self):
        return LocalReportsStore(self.FIXTURES)

    def _reports(self, store):
        import pandas as pd

        return (store.get_reports(pd.Timestamp("2022-01-01 00:00")),
                store.get_reports(pd.Timestamp("2022-01-01 06:00")))

    def test_station_mask_tolerates_malformed(self, store):
        from vaevar_tpu.da import obs as obs_mod

        first, second = self._reports(store)
        assert len(first) == 16  # all rows load, including the broken ones
        hw = (181, 360)
        Hm = obs_mod.station_mask_from_reports(first, 6, hw)
        Hm = obs_mod.station_mask_from_reports(second, 6, hw,
                                               second_file=True, H_out=Hm)
        # slots: file1 dt 0,1,2,4.2 -> 0..3 (+surface at 0); file2 -3,-2,-1
        # -> 3,4,5. The overlap cell (10E, 60N, 925) sets slot 3 from BOTH.
        per_slot = (Hm.sum(axis=(1, 2, 3)) > 0)
        assert per_slot.all(), Hm.sum(axis=(1, 2, 3))
        lat, lon = obs_mod._grid_indices(10.0, 60.0, hw)
        h = int(np.sum((obs_mod._STATION_HEIGHT_BINS - 925.0) <= 0))
        assert Hm[3, 4 + h, lat, lon] == 1  # z at the overlap cell
        # None-position / malformed rows contributed nothing: the only
        # dt=0 z-report cells are good_dt0, good_surface, none_pressure
        lat0, lon0 = obs_mod._grid_indices(90.0, 45.0, hw)
        h500 = int(np.sum((obs_mod._STATION_HEIGHT_BINS - 500.0) <= 0))
        assert Hm[0, 4 + h500, lat0, lon0] == 1
        assert Hm[0].sum() > 0
        # surface mirroring held through accumulation
        np.testing.assert_array_equal(Hm[:, 2], Hm[:, 68])

    def test_grid_real_obs_tolerates_malformed(self, store):
        from vaevar_tpu.da import obs as obs_mod

        first, second = self._reports(store)
        hw = (181, 360)
        yo, Hm = obs_mod.grid_real_obs([first, second], da_win=6,
                                       dim_out=40, hw=hw)
        assert np.isfinite(yo).all()
        per_slot = (Hm.sum(axis=(1, 2, 3)) > 0)
        assert per_slot.all(), Hm.sum(axis=(1, 2, 3))
        # the slot-3 overlap cell averages the two files' z reports
        lat, lon = obs_mod._grid_indices(10.0, 60.0, hw)
        levels = obs_mod.obs_height_levels(40)
        bins = np.sqrt(levels[:-1] * levels[1:])
        h = int(np.sum((bins - 925.0) <= 0))
        geo = obs_mod._geopotential_coeff(h)
        corr = geo * (np.log(925.0) - np.log(levels[h]))
        want = ((700.0 * 9.8 + corr) + (710.0 * 9.8 + corr)) / 2
        assert yo[3, 4 + h, lat, lon] == pytest.approx(want, rel=1e-6)
        # the none-pressure-value row is skipped here (value[0] anchors
        # binning and lapse corrections) though the MASK family grids it
        latp, lonp = obs_mod._grid_indices(200.0, 50.0, hw)
        assert Hm[0, :, latp, lonp].sum() == 0

    def test_full_cycle_from_fixture_store(self, store, tmp_path):
        """The fixture files drive a real_simu cycle end to end."""
        import pandas as pd

        model, params, dec_apply = micro_vae()
        src = SyntheticEra5(hw=HW, seed=5)
        cfg = cfgs.DAConfig(
            # nofiltering: the fixture values are schema probes, not truth
            # samples — the QC gross-error check would (correctly) reject
            # them all against the synthetic truth
            da_mode="vae4dvar", da_win=1, nit=1, lbfgs_iters=3,
            obs_type="real_simu_nofiltering", grid_hw=HW, solver_hw=HW,
            latent_shape=(1, 32, *HW), init_tp=1, init_lag=1, interp_dim=40,
        )
        da = CycledDA(
            cfg, src, lambda p, x, steps, interpolation=False: x,
            decoder_apply=dec_apply, vae_params=params,
            reports_source=store,
            work_dir=str(tmp_path / "fixture_cycle"), verbose=False,
        )
        yo, H, R, gt = da.get_obs_info(pd.Timestamp("2022-01-01 00:00"))
        assert float(jnp.sum(H)) > 0
        assert np.isfinite(np.asarray(yo)).all()


class TestSecondFileSlots:
    """End-to-end da_win=6 two-file gridding: the second report file
    (valid at +6h) maps NEGATIVE time offsets onto window slots 3-5
    (reference da_4dvar.py:251-257), the first file onto slots 0-3."""

    @staticmethod
    def _report(dt, level=500.0, t_c=10.0):
        return {
            "position": [90.0, 45.0, level, dt],
            "value": [level, None, None, None, None, t_c, None, None],
        }

    def test_two_file_slot_mapping(self):
        from vaevar_tpu.da import obs as obs_mod

        hw = (181, 360)
        first = {f"a{i}": self._report(dt, t_c=10.0 + i)
                 for i, dt in enumerate([0.0, 1.0, 2.0, 3.0, -1.0])}
        second = {f"b{i}": self._report(dt, t_c=20.0 + i)
                  for i, dt in enumerate([-3.0, -2.0, -1.0, 0.0])}
        yo, Hm = obs_mod.grid_real_obs([first, second], da_win=6,
                                       dim_out=40, hw=hw)
        lat, lon = obs_mod._grid_indices(90.0, 45.0, hw)
        levels = obs_mod.obs_height_levels(40)
        bins = np.sqrt(levels[:-1] * levels[1:])
        h = int(np.sum((bins - 500.0) <= 0))
        tmp_layer = 4 + h + 4 * 40  # temperature block

        got_slots = set(np.nonzero(Hm[:, tmp_layer, lat, lon])[0].tolist())
        # first file: dt 0,1,2,3 -> slots 0..3; dt=-1 dropped.
        # second file: dt -3,-2,-1 -> slots 3,4,5; dt=0 dropped.
        assert got_slots == {0, 1, 2, 3, 4, 5}

        # slot 3 averages the first file's dt=3.0 (t=13C) and the second
        # file's dt=-3.0 (t=20C) reports: (13+20)/2 + 273.15 (+lapse 0 at
        # exactly the bin level) in Kelvin
        corr = obs_mod._temperature_coeff(h) * (
            np.log(500.0) - np.log(levels[h])
        )
        want3 = (13.0 + 20.0) / 2 + 273.15 + corr
        assert yo[3, tmp_layer, lat, lon] == pytest.approx(want3, rel=1e-6)
        # slots 4, 5 carry only the second file's values
        want4 = 21.0 + 273.15 + corr
        assert yo[4, tmp_layer, lat, lon] == pytest.approx(want4, rel=1e-6)

    def test_interp_dim_guard(self):
        from vaevar_tpu.da import obs as obs_mod

        with pytest.raises(ValueError, match="40-level"):
            obs_mod.grid_real_obs([{}], da_win=1, dim_out=20, hw=(16, 32))
