"""Golden parity: flax LGUnet forward == reference PyTorch LGUnet_all_1.

Loads the reference implementation from /root/reference (skipped when the
snapshot is absent, e.g. in a standalone checkout), randomly initializes it
on CPU, ports the state_dict through
vaevar_tpu.utils.port_torch.lgunet_params_from_torch, and asserts the two
forwards agree. This is the SURVEY.md section 7 golden-parity requirement
(backbone step 2) and validates checkpoint porting end to end.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu.config import LGUnetConfig
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.port_torch import lgunet_params_from_torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference snapshot not available",
)


def _install_stubs():
    """Stub the reference's unavailable deps (timm/fairscale/torchvision/
    turtle) with the trivial shipped-config behavior (all drop rates 0)."""
    import torch
    import torch.nn as tnn

    if "turtle" not in sys.modules:
        t = types.ModuleType("turtle")
        t.forward = None
        sys.modules["turtle"] = t
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = lambda v: tuple(v) if isinstance(
            v, (list, tuple)
        ) else (v, v)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "fairscale" not in sys.modules:
        fs = types.ModuleType("fairscale")
        fs_nn = types.ModuleType("fairscale.nn")
        fs_ck = types.ModuleType("fairscale.nn.checkpoint")
        fs_ca = types.ModuleType("fairscale.nn.checkpoint.checkpoint_activations")
        fs_ca.checkpoint_wrapper = lambda m, **kw: m
        for name, mod in [
            ("fairscale", fs), ("fairscale.nn", fs_nn),
            ("fairscale.nn.checkpoint", fs_ck),
            ("fairscale.nn.checkpoint.checkpoint_activations", fs_ca),
        ]:
            sys.modules[name] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if REF not in sys.path:
        sys.path.insert(0, REF)


# tiny two-gen coverage: uniform groups (vmap path), scanned LG stacks
CFG = LGUnetConfig(
    img_size=(16, 32),
    patch_size=(2, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(8, 26, 26, 26, 26, 26),
    enc_dim=8,
    embed_dim=48,
    window_size=(2, 4),
    enc_depths=(2, 2),
    enc_heads=(2, 4),
    lg_depths=(2, 4),
    lg_heads=(4, 4),
    attn_type="rope",
    lg_full_attn_first=True,
    dtype=None,
)


@pytest.fixture(scope="module")
def torch_model_and_input():
    _install_stubs()
    import torch

    from networks.LGUnet_all import LGUnet_all_1

    torch.manual_seed(0)
    model = LGUnet_all_1(
        img_size=list(CFG.img_size),
        patch_size=list(CFG.patch_size),
        stride=list(CFG.stride),
        in_chans=CFG.in_chans,
        out_chans=CFG.out_chans,
        inchans_list=list(CFG.inchans_list),
        outchans_list=list(CFG.outchans_list),
        enc_dim=CFG.enc_dim,
        embed_dim=CFG.embed_dim,
        window_size=list(CFG.window_size),
        enc_depths=list(CFG.enc_depths),
        enc_heads=list(CFG.enc_heads),
        lg_depths=list(CFG.lg_depths),
        lg_heads=list(CFG.lg_heads),
    ).eval()
    # re-randomize so zeros-inited leaves (pos embeds) are exercised too
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    x = torch.randn(2, CFG.in_chans, *CFG.img_size)
    with torch.no_grad():
        y_ref = model(x)
    return model, x.numpy(), y_ref.numpy()


@pytest.mark.slow
class TestGoldenParity:
    def test_forward_matches_reference(self, torch_model_and_input):
        model, x, y_ref = torch_model_and_input
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = lgunet_params_from_torch(sd, CFG)

        flax_model = LGUnet(CFG)
        y = flax_model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), y_ref, atol=2e-4, rtol=2e-3
        )

    def test_param_tree_structurally_complete(self, torch_model_and_input):
        model, x, _ = torch_model_and_input
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        ported = lgunet_params_from_torch(sd, CFG)
        flax_model = LGUnet(CFG)
        init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x))

        flat_p = jax.tree_util.tree_leaves_with_path(ported)
        flat_i = dict(
            (jax.tree_util.keystr(p), l.shape)
            for p, l in jax.tree_util.tree_leaves_with_path(init)
        )
        assert len(flat_p) == len(flat_i)
        for path, leaf in flat_p:
            key = jax.tree_util.keystr(path)
            assert key in flat_i, f"extra leaf {key}"
            assert tuple(leaf.shape) == tuple(flat_i[key]), (
                f"{key}: ported {leaf.shape} vs init {flat_i[key]}"
            )


OLD_CFG = LGUnetConfig(
    img_size=(16, 32),
    patch_size=(2, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(8, 26, 26, 26, 26, 26),
    enc_dim=8,
    embed_dim=48,
    window_size=(2, 2),
    enc_depths=(2, 2),
    enc_heads=(2, 4),
    lg_depths=(2, 4),
    lg_heads=(4, 4),
    attn_type="relbias",
    lora_rank=2,
    lg_full_attn_first=False,
    dtype=None,
)


def _make_old_torch(rank=2, seed=0):
    _install_stubs()
    import torch

    from networks_old.transformer import LGUnet_all

    torch.manual_seed(seed)
    model = LGUnet_all(
        img_size=list(OLD_CFG.img_size),
        patch_size=list(OLD_CFG.patch_size),
        stride=list(OLD_CFG.stride),
        in_chans=OLD_CFG.in_chans,
        out_chans=OLD_CFG.out_chans,
        inchans_list=list(OLD_CFG.inchans_list),
        outchans_list=list(OLD_CFG.outchans_list),
        enc_dim=OLD_CFG.enc_dim,
        embed_dim=OLD_CFG.embed_dim,
        window_size=OLD_CFG.window_size[0],
        enc_depths=list(OLD_CFG.enc_depths),
        enc_heads=list(OLD_CFG.enc_heads),
        lg_depths=list(OLD_CFG.lg_depths),
        lg_heads=list(OLD_CFG.lg_heads),
        rank=rank,
    ).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


@pytest.mark.slow
class TestOldGenParity:
    def test_forward_matches_reference_with_lora(self):
        _install_stubs()
        import torch

        model = _make_old_torch(rank=OLD_CFG.lora_rank)
        x = torch.randn(2, OLD_CFG.in_chans, *OLD_CFG.img_size)
        with torch.no_grad():
            y_ref = model(x).numpy()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = lgunet_params_from_torch(sd, OLD_CFG)
        y = LGUnet(OLD_CFG).apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
class TestSDAttnFullSurface:
    """lgunet.WindowAttention == reference SD_attn across its FULL
    parameter surface: dilated token groups (Attention.py:475-489,600-609)
    and 3-D (T, H, W) windows with rope3 (Attention.py:543-565), shifted
    and unshifted — the paths no shipped config exercises but the module
    supports."""

    CASES = [
        # (grid, window, shift, dilated)
        ("2d-dilated", (8, 16), (2, 4), (0, 0), (2, 2)),
        ("2d-dilated-shift", (8, 16), (2, 4), (1, 2), (2, 2)),
        ("3d-shift", (4, 8, 16), (2, 2, 4), (1, 1, 2), (1, 1, 1)),
        ("3d-dilated-shift", (4, 8, 16), (2, 2, 2), (1, 1, 1), (1, 2, 2)),
        ("3d-noshift", (4, 8, 16), (2, 2, 4), (0, 0, 0), (1, 1, 1)),
    ]

    @pytest.mark.parametrize("name,grid,win,shift,dil",
                             CASES, ids=[c[0] for c in CASES])
    def test_matches_sd_attn(self, name, grid, win, shift, dil):
        _install_stubs()
        import torch

        from networks.utils.Attention import SD_attn

        from vaevar_tpu.models.lgunet import WindowAttention

        dim, heads = 16, 2
        torch.manual_seed(0)
        m = SD_attn(dim, window_size=list(win), num_heads=heads,
                    shift_size=list(shift), dilated_size=list(dil)).eval()
        x = np.random.default_rng(3).normal(
            size=(2, *grid, dim)).astype(np.float32)
        with torch.no_grad():
            y_ref = m(torch.from_numpy(x)).numpy()

        wa = WindowAttention(dim, heads, tuple(win), tuple(shift),
                             tuple(grid), attn_type="rope",
                             dilated_size=tuple(dil))
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = {"params": {
            "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
            "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        }}
        y = np.asarray(wa.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-4)

    def test_config_level_wiring_loads(self):
        """A 3-D LG window + dilated enc/dec config constructs and runs
        end to end through the backbone (LG_net 3-D branch semantics,
        networks/LGUnet_all.py:657,731-734)."""
        from vaevar_tpu.config import micro_config

        cfg = micro_config(img_size=(16, 32), window_size=(2, 2),
                           lg_window_size=(1, 2, 4), dilated_size=(2, 2))
        m = LGUnet(cfg)
        x = jnp.zeros((1, 69, 16, 32))
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (1, 138, 16, 32)
        assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
class TestVAEParity:
    def test_vae_lr_roundtrip(self):
        """Port a reference VAE_lr (enc 69->16, dec 8->69 style micro) and
        compare encoder mu/logvar + decoder output."""
        _install_stubs()
        import torch

        from nf_model.vae import VAE_lr  # noqa: F401  (structure check only)
        from networks_old.transformer import LGUnet_all

        from vaevar_tpu.models.vae import VAE
        from vaevar_tpu.utils.port_torch import vae_params_from_torch

        enc_cfg = OLD_CFG.replace(
            inchans_list=(4, 13, 13, 13, 13, 13),
            outchans_list=(4, 12, 12, 12, 12, 12),
            lora_rank=0,
        )
        dec_cfg = OLD_CFG.replace(
            inchans_list=(2, 6, 6, 6, 6, 6),
            outchans_list=(4, 13, 13, 13, 13, 13),
            lora_rank=0,
        )

        torch.manual_seed(1)

        class TorchVAE(torch.nn.Module):
            """VAE_lr minus the yaml loading (nf_model/vae.py:53-70)."""

            def __init__(self):
                super().__init__()
                common = dict(
                    img_size=list(OLD_CFG.img_size), patch_size=[2, 2],
                    stride=[2, 2], in_chans=69, out_chans=69,
                    enc_dim=OLD_CFG.enc_dim, embed_dim=OLD_CFG.embed_dim,
                    window_size=2, enc_depths=[2, 2], enc_heads=[2, 4],
                    lg_depths=[2, 4], lg_heads=[4, 4], rank=0,
                )
                self.enc = LGUnet_all(
                    inchans_list=list(enc_cfg.inchans_list),
                    outchans_list=list(enc_cfg.outchans_list), **common)
                self.dec = LGUnet_all(
                    inchans_list=list(dec_cfg.inchans_list),
                    outchans_list=list(dec_cfg.outchans_list), **common)

        tm = TorchVAE().eval()
        with torch.no_grad():
            for p in tm.parameters():
                p.add_(0.02 * torch.randn_like(p))

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = vae_params_from_torch(sd, enc_cfg, dec_cfg)
        vae = VAE(enc_cfg, dec_cfg)

        x = torch.randn(1, 69, *OLD_CFG.img_size)
        with torch.no_grad():
            enc_out = tm.enc(x).numpy()
        mu_ref, logvar_ref = np.split(enc_out, 2, axis=1)
        mu, logvar = vae.apply(params, jnp.asarray(x.numpy()),
                               method=VAE.encoder)
        np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=2e-4,
                                   rtol=2e-3)
        np.testing.assert_allclose(np.asarray(logvar), logvar_ref, atol=2e-4,
                                   rtol=2e-3)

        z = torch.randn(1, sum(enc_cfg.outchans_list) // 2,
                        *OLD_CFG.img_size) * 0.5
        with torch.no_grad():
            dec_ref = tm.dec(z).numpy()
        dec = vae.apply(params, jnp.asarray(z.numpy()), method=VAE.decoder)
        np.testing.assert_allclose(np.asarray(dec), dec_ref, atol=2e-4,
                                   rtol=2e-3)


class TestMetricsParity:
    """Our JAX metric library vs the reference torch implementation,
    loaded directly from the snapshot (utils/metrics.py)."""

    @pytest.fixture(scope="class")
    def ref_metrics(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_metrics", os.path.join(REF, "utils", "metrics.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @pytest.fixture(scope="class")
    def fields(self):
        rng = np.random.default_rng(11)
        pred = rng.normal(size=(2, 5, 721, 96)).astype(np.float32)
        gt = rng.normal(size=(2, 5, 721, 96)).astype(np.float32)
        return pred, gt

    @pytest.mark.parametrize(
        "region", ["all", "northern", "southern", "tropics"]
    )
    def test_wrmse_bias_acc_activity_anomaly(self, ref_metrics, fields,
                                             region):
        import torch

        from vaevar_tpu.utils import metrics as M

        pred, gt = fields
        tp, tg = torch.tensor(pred), torch.tensor(gt)

        want = ref_metrics.type_weighted_rmse_torch(tp, tg, region).numpy()
        got = np.asarray(M.weighted_rmse(jnp.asarray(pred), jnp.asarray(gt),
                                         region))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        want = ref_metrics.type_weighted_bias_torch(tp - tg, region).numpy()
        got = np.asarray(M.weighted_bias(jnp.asarray(pred - gt), region))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

        want = ref_metrics.type_weighted_activity_torch(tp, region).numpy()
        got = np.asarray(M.weighted_activity(jnp.asarray(pred), region))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        want = ref_metrics.type_weighted_anomaly_torch(tp, tg, region).numpy()
        got = np.asarray(M.weighted_anomaly(jnp.asarray(pred),
                                            jnp.asarray(gt), region))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

        want = ref_metrics.type_weighted_acc_torch(tp, tg, region).numpy()
        got = np.asarray(M.weighted_acc(jnp.asarray(pred), jnp.asarray(gt),
                                        region))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_metrics_recorder_matches_reference(self, ref_metrics, fields):
        import torch

        from vaevar_tpu.utils import metrics as M

        pred, gt = fields
        clim = np.zeros_like(pred[0])
        std = np.ones(pred.shape[1], np.float32)
        names = ["MSE", "MAE", "WRMSE", "Bias", "WACC", "Activity"]
        ref_rec = ref_metrics.MetricsRecorder(names)
        want = ref_rec.evaluate_batch(
            {"pred": torch.tensor(pred), "gt": torch.tensor(gt),
             "clim_mean": torch.tensor(clim), "std": torch.tensor(std)}
        )
        got = M.MetricsRecorder(names).evaluate_batch(
            {"pred": jnp.asarray(pred), "gt": jnp.asarray(gt),
             "clim_mean": jnp.asarray(clim), "std": std}
        )
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-6)


class TestLossParity:
    """Training-loss goldens: poss_loss/lp_loss vs the reference's
    basemodel.Possloss/LpLoss (model/model.py:150-207), executing the
    reference's OWN method source (extracted by ast — importing
    model.py pulls petrel/timm/tensorboard)."""

    @pytest.fixture(scope="class")
    def ref_losses(self):
        import ast

        import torch
        import torch.nn.functional as F

        src = open(os.path.join(REF, "model/model.py")).read()
        tree = ast.parse(src)
        fns = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.name in (
                "Possloss", "LpLoss",
            ):
                seg = ast.get_source_segment(src, node)
                import textwrap

                fns[node.name] = textwrap.dedent(seg)
        ns = {"torch": torch, "F": F, "np": np}
        exec(fns["LpLoss"], ns)
        exec(fns["Possloss"], ns)
        return ns["LpLoss"], ns["Possloss"]

    def test_lp_loss_matches(self, ref_losses):
        import torch

        from vaevar_tpu.train.forecast_trainer import lp_loss

        ref_lp, _ = ref_losses
        rr = np.random.default_rng(0)
        pred = rr.normal(size=(3, 7, 8, 16)).astype(np.float32)
        tar = rr.normal(size=(3, 7, 8, 16)).astype(np.float32)
        want = float(ref_lp(None, torch.tensor(pred), torch.tensor(tar)))
        got = float(lp_loss(jnp.asarray(pred), jnp.asarray(tar)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    @pytest.mark.parametrize("inc_var_loss", [True, False])
    def test_poss_loss_matches(self, ref_losses, inc_var_loss):
        import types

        import torch

        from vaevar_tpu.train.forecast_trainer import poss_loss

        _, ref_poss = ref_losses
        rr = np.random.default_rng(1)
        B, C, H, W = 2, 6, 8, 16
        pred = rr.normal(size=(B, 2 * C, H, W)).astype(np.float32)
        tar = rr.normal(size=(B, C, H, W)).astype(np.float32)
        maxlv = (np.ones((1, C * H * W), np.float32) / 2
                 + 0.1 * rr.normal(size=(1, C * H * W)).astype(np.float32))
        minlv = (-np.ones((1, C * H * W), np.float32) * 10
                 + 0.1 * rr.normal(size=(1, C * H * W)).astype(np.float32))
        self_ = types.SimpleNamespace(
            max_logvar=torch.tensor(maxlv), min_logvar=torch.tensor(minlv),
            device="cpu",
        )
        want = float(ref_poss(self_, torch.tensor(pred), torch.tensor(tar),
                              inc_var_loss=inc_var_loss))
        got = float(poss_loss(jnp.asarray(pred), jnp.asarray(tar),
                              jnp.asarray(maxlv), jnp.asarray(minlv),
                              inc_var_loss=inc_var_loss))
        np.testing.assert_allclose(got, want, rtol=2e-5)


class TestVAELossParity:
    def test_elbo_matches_reference_loss_function(self):
        """elbo_loss vs nf_model/vae.py:104-107 loss_function (executed
        from the reference's own source)."""
        import ast
        import textwrap

        import torch

        from vaevar_tpu.models.vae import elbo_loss

        src = open(os.path.join(REF, "nf_model/vae.py")).read()
        seg = next(
            ast.get_source_segment(src, n) for n in ast.walk(ast.parse(src))
            if isinstance(n, ast.FunctionDef) and n.name == "loss_function"
        )
        ns = {"torch": torch}
        exec(textwrap.dedent(seg), ns)
        rr = np.random.default_rng(2)
        x = rr.normal(size=(2, 5, 8, 16)).astype(np.float32)
        rx = rr.normal(size=(2, 5, 8, 16)).astype(np.float32)
        mu = rr.normal(size=(2, 3, 4, 8)).astype(np.float32)
        lv = rr.normal(size=(2, 3, 4, 8)).astype(np.float32)
        wt, wm, wk = ns["loss_function"](
            torch.tensor(rx), torch.tensor(x), torch.tensor(mu),
            torch.tensor(lv), sigma=2.0,
        )
        gt_, gm, gk = elbo_loss(jnp.asarray(rx), jnp.asarray(x),
                                jnp.asarray(mu), jnp.asarray(lv), sigma=2.0)
        np.testing.assert_allclose(float(gt_), float(wt), rtol=1e-5)
        np.testing.assert_allclose(float(gm), float(wm), rtol=1e-5)
        np.testing.assert_allclose(float(gk), float(wk), rtol=1e-5)
