"""Real-obs (station network) DA cycle + eval holdout tests."""

import functools

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
