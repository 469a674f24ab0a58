"""Unit tests for core primitives: metrics, windows, rope, interp.

Goldens come from torch (CPU) implementations that follow the reference
formulas, or from brute-force numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vaevar_tpu import channels
from vaevar_tpu.ops import interp, rope, windows
from vaevar_tpu.utils import metrics


def _torch_weighted_rmse(pred, target):
    num_lat = pred.shape[2]
    j = torch.arange(num_lat, dtype=torch.float64)
    lat = 90.0 - j * 180.0 / (num_lat - 1)
    cos = torch.cos(3.1416 / 180.0 * lat)
    s = cos.sum()
    w = (num_lat * cos / s).reshape(1, 1, -1, 1)
    res = torch.sqrt(torch.mean(w * (pred - target) ** 2, dim=(-1, -2)))
    return torch.mean(res, dim=0)


class TestMetrics:
    def test_wrmse_golden(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(2, 5, 33, 64))
        tgt = rng.normal(size=(2, 5, 33, 64))
        want = _torch_weighted_rmse(torch.tensor(pred), torch.tensor(tgt)).numpy()
        got = np.asarray(metrics.weighted_rmse(jnp.asarray(pred), jnp.asarray(tgt)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bias_zero_for_equal(self):
        x = jnp.ones((1, 3, 21, 8))
        np.testing.assert_allclose(np.asarray(metrics.weighted_bias(x - x)), 0.0)

    def test_acc_perfect_correlation(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 2, 19, 16)))
        got = np.asarray(metrics.weighted_acc(x, x))
        np.testing.assert_allclose(got, 1.0, rtol=1e-6)

    def test_regional_weights_sum(self):
        w, sl = metrics.lat_weights(721, "northern")
        # reference scales by souther_index for north/south regions
        assert w.sum() == pytest.approx(int(70.0 / 180.0 * 721 + 0.5), rel=1e-5)

    def test_metrics_facade_physical_units(self):
        rng = np.random.default_rng(2)
        pred = jnp.asarray(rng.normal(size=(1, 69, 33, 64)))
        gt = jnp.asarray(rng.normal(size=(1, 69, 33, 64)))
        m = metrics.Metrics()
        wrmse = m.WRMSE(pred, gt, None, None, channels.STD)
        assert wrmse.shape == (69,)
        base = metrics.weighted_rmse(pred, gt)
        np.testing.assert_allclose(
            np.asarray(wrmse), np.asarray(base) * channels.STD, rtol=1e-6
        )

    def test_metrics_recorder_expands_channels(self):
        rng = np.random.default_rng(3)
        pred = jnp.asarray(rng.normal(size=(1, 4, 33, 64)))
        gt = jnp.asarray(rng.normal(size=(1, 4, 33, 64)))
        clim = jnp.zeros((4, 33, 64))
        rec = metrics.MetricsRecorder(
            ["MSE", "MAE", "WRMSE", "NWRMSE", "Bias", "WACC", "Anomaly",
             "Activity"]
        )
        out = rec.evaluate_batch(
            {"pred": pred, "gt": gt, "clim_mean": clim,
             "std": np.ones(4, np.float32)}
        )
        assert isinstance(out["MSE"], float) and isinstance(out["MAE"], float)
        # per-channel metrics expand to name + channel index
        for i in range(4):
            assert f"WRMSE{i}" in out and f"WACC{i}" in out
        assert out["WRMSE0"] > 0

    def test_anomaly_reference_quirk_scalar_numerator(self):
        """The reference's anomaly numerator is a scalar mean over ALL
        dims (utils/metrics.py:132) — verify we replicate it by checking
        the ratio structure against a manual computation."""
        rng = np.random.default_rng(4)
        p = jnp.asarray(rng.normal(size=(1, 3, 33, 64)))
        t = jnp.asarray(rng.normal(size=(1, 3, 33, 64)))
        got = np.asarray(metrics.weighted_anomaly(p, t))
        w, _ = metrics.lat_weights(33)
        w = w.reshape(1, 1, -1, 1)
        pa = np.asarray(p) - np.mean(w * np.asarray(p), axis=(-1, -2),
                                     keepdims=True)
        ta = np.asarray(t) - np.mean(w * np.asarray(t), axis=(-1, -2),
                                     keepdims=True)
        nume = np.mean(w * pa * ta)
        deno = np.sqrt(np.mean(w * pa**2, axis=(-1, -2))) * np.sqrt(
            np.mean(w * ta**2, axis=(-1, -2)))
        np.testing.assert_allclose(got, (nume / deno).mean(0), rtol=1e-5)


class TestWindows:
    def test_partition_reverse_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 12, 24, 5)))
        wins = windows.window_partition(x, (6, 12))
        assert wins.shape == (2 * 2 * 2, 72, 5)
        back = windows.window_reverse(wins, (6, 12), 12, 24)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_partition_matches_torch_reference_order(self):
        # reference window_partition (networks/utils/utils.py:97-102)
        rng = np.random.default_rng(1)
        xn = rng.normal(size=(2, 8, 16, 3)).astype(np.float32)
        xt = torch.tensor(xn)
        wh, ww = 4, 8
        t = xt.view(2, 8 // wh, wh, 16 // ww, ww, 3).permute(0, 1, 3, 2, 4, 5)
        want = t.contiguous().view(-1, wh * ww, 3).numpy()
        got = np.asarray(
            windows.window_partition(jnp.asarray(xn), (wh, ww))
        )
        np.testing.assert_array_equal(got, want)

    def test_mask_none_cases(self):
        assert windows.swin_attention_mask(8, 16, (4, 8), (0, 0)) is None
        # full-longitude window => periodic, no mask
        assert windows.swin_attention_mask(8, 16, (4, 16), (2, 8)) is None

    def test_mask_lat_compartments(self):
        H, W, ws, ss = 8, 16, (4, 4), (2, 2)
        mask = windows.swin_attention_mask(H, W, ws, ss)
        assert mask is not None and mask.shape == (8, 16, 16)
        # brute force: labels vary only with latitude region
        def region(h):
            if h < H - ws[0]:
                return 0
            if h < H - ss[0]:
                return 1
            return 2

        labels = np.array([region(h) for h in range(H)])
        for wi in range(mask.shape[0]):
            bh = (wi // (W // ws[1])) * ws[0]
            rows = labels[bh : bh + ws[0]]
            lab = np.repeat(rows, ws[1])
            want = np.where(lab[None, :] != lab[:, None], -np.inf, 0.0)
            np.testing.assert_array_equal(mask[wi], want)


class TestRope:
    def test_rope_matches_reference_formula(self):
        # torch transcription of reference rope2 (positional_encodings.py:230-268)
        shape, dim = (4, 8), 16
        coords0 = torch.arange(shape[0])
        coords1 = torch.arange(shape[1])
        coords = torch.stack(
            torch.meshgrid([coords0, coords1], indexing="ij")
        ).reshape(2, -1)
        half = dim // 2
        d1, d2 = half // 2, half - half // 2
        inv1 = 10000 ** -(torch.arange(0, d1) / d1)
        inv2 = 10000 ** -(torch.arange(0, d2) / d2)
        sin1 = torch.sin(coords[0].unsqueeze(-1) * inv1)
        cos1 = torch.cos(coords[0].unsqueeze(-1) * inv1)
        sin2 = torch.sin(coords[1].unsqueeze(-1) * inv2)
        cos2 = torch.cos(coords[1].unsqueeze(-1) * inv2)

        rng = np.random.default_rng(0)
        xn = rng.normal(size=(3, shape[0] * shape[1], dim)).astype(np.float32)
        x = torch.tensor(xn)
        x11, x21, x12, x22 = x.split([d1, d2, d1, d2], dim=-1)
        want = torch.cat(
            [
                x11 * cos1 - x12 * sin1,
                x21 * cos2 - x22 * sin2,
                x12 * cos1 + x11 * sin1,
                x22 * cos2 + x21 * sin2,
            ],
            dim=-1,
        ).numpy()

        tables = rope.rope2_tables(shape, dim)
        got = np.asarray(rope.apply_rope2(jnp.asarray(xn), tables))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_rope_preserves_norm(self):
        tables = rope.rope2_tables((6, 12), 32)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 72, 32)))
        y = rope.apply_rope2(x, tables)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )


class TestInterp:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((721, 1440), (128, 256)), ((128, 256), (721, 1440)), ((13, 27), (40, 11))],
    )
    def test_nearest_matches_torch(self, in_hw, out_hw):
        rng = np.random.default_rng(0)
        xn = rng.normal(size=(1, 3, *in_hw)).astype(np.float32)
        want = F.interpolate(torch.tensor(xn), out_hw).numpy()  # default nearest
        got = np.asarray(interp.resize_nearest(jnp.asarray(xn), out_hw))
        np.testing.assert_array_equal(got, want)

    def test_obs_interp_matrix_partition_of_unity(self):
        m = interp.obs_level_interp_matrix(40)
        assert m.shape == (40, 13)
        levels = interp.obs_height_levels(40)
        src = np.asarray(channels.PRESSURE_LEVELS, dtype=np.float64)
        inside = (levels >= src[0]) & (levels <= src[-1])
        np.testing.assert_allclose(m.sum(1)[inside], 1.0, rtol=1e-5)
        # exact match rows are one-hot
        for i, lv in enumerate(levels):
            if lv in src:
                assert m[i].max() == 1.0 and m[i].sum() == 1.0

    def test_obs_interp_matrix_matches_torch_reference(self):
        # transcription of reference obs_interpolater.get_interp (da_4dvar.py:72-82)
        dim_in, dim_out = 13, 40
        hl = [50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000]
        hln = np.round(np.exp(np.linspace(3.91202301, 6.90775528, dim_out)))
        want = np.zeros((dim_out, dim_in))
        for i in range(len(hln)):
            for j in range(len(hl)):
                if hln[i] == hl[j]:
                    want[i, j] = 1
                elif hl[j] < hln[i] < hl[j + 1]:
                    want[i, j] = (np.log(hl[j + 1]) - np.log(hln[i])) / (
                        np.log(hl[j + 1]) - np.log(hl[j])
                    )
                    want[i, j + 1] = (np.log(hln[i]) - np.log(hl[j])) / (
                        np.log(hl[j + 1]) - np.log(hl[j])
                    )
        got = interp.obs_level_interp_matrix(dim_out)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_augment_levels_shape(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 69, 8, 16)))
        m = interp.obs_level_interp_matrix(40)
        y = interp.augment_levels(x, m)
        assert y.shape == (2, 204, 8, 16)
        # surface channels pass through
        np.testing.assert_array_equal(np.asarray(y[:, :4]), np.asarray(x[:, :4]))


class TestChannels:
    def test_registry(self):
        assert channels.N_CHANNELS == 69
        assert channels.CHANNEL_NAMES[11] == "z500"
        assert channels.CHANNEL_NAMES[66] == "t850"

    def test_normalize_roundtrip(self):
        x = np.random.default_rng(3).normal(size=(69, 4, 8)) * channels.STD.reshape(
            -1, 1, 1
        ) + channels.MEAN.reshape(-1, 1, 1)
        z = channels.normalize(x)
        back = channels.denormalize(z)
        np.testing.assert_allclose(back, x, rtol=1e-10)


class TestMeters:
    def test_smoothed_value(self):
        from vaevar_tpu.utils.meters import SmoothedValue

        s = SmoothedValue(window_size=3)
        for v in [1.0, 2.0, 3.0, 4.0]:
            s.update(v)
        assert s.value == 4.0 and s.median == 3.0
        assert abs(s.avg - 3.0) < 1e-9  # window [2,3,4]
        assert abs(s.global_avg - 2.5) < 1e-9
        s.synchronize_between_processes()  # no-op single process
        assert s.count == 4

    def test_metric_logger_iterates(self, capsys):
        from vaevar_tpu.utils.meters import MetricLogger

        ml = MetricLogger()
        for i in ml.log_every(range(5), print_freq=2, header="ep0"):
            ml.update(loss=float(i))
        out = capsys.readouterr().out
        assert "ep0" in out and "loss" in out and "done in" in out
        assert abs(ml.meters["loss"].global_avg - 2.0) < 1e-9

    def test_scalar_writer(self, tmp_path):
        import json

        from vaevar_tpu.utils.meters import ScalarWriter

        w = ScalarWriter(str(tmp_path))
        w.add_scalar("loss", 1.5, 0)
        w.add_scalars({"a": 1, "b": 2}, 1)
        w.close()
        lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
        assert len(lines) == 3 and lines[0]["tag"] == "loss"
        assert {l["tag"] for l in lines[1:]} == {"a", "b"}
