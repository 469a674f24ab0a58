"""Checkpoint conversion surface: scripts/convert_ckpt.py + the VAE-tree
handoff between the training CLIs and run_da.

The reference distributes weights as torch .pth files with three wrapper
layouts and two loading quirks (da_4dvar.py:552-603: ``{"model":
{"lgunet_all": sd}}`` / ``{"model": sd}`` / bare; ``module.`` prefix strip;
``max_logvar``/``min_logvar`` drop). A reference user migrating here runs
``scripts/convert_ckpt.py`` once per checkpoint and feeds the outputs to the
``run_da.py`` / training-CLI ckpt knobs.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu import config as cfgs
from vaevar_tpu.utils.port_torch import reference_state_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference snapshot not available",
)


class TestReferenceStateDict:
    def test_forecast_wrapper_and_module_prefix(self):
        # da_4dvar.py:557-564: nested ['model']['lgunet_all'], DDP prefix
        obj = {"model": {"lgunet_all": {
            "module.enc.proj.weight": 1, "module.max_logvar": 9,
        }}, "optimizer": {}}
        assert reference_state_dict(obj) == {"enc.proj.weight": 1}

    def test_flow_wrapper(self):
        # da_4dvar.py:576-583: single ['model'] wrapper
        obj = {"model": {"net.pos_embed": 2, "min_logvar": 0}}
        assert reference_state_dict(obj) == {"net.pos_embed": 2}

    def test_bare_vae_state_dict(self):
        # da_4dvar.py:592: VAE files are bare state_dicts
        sd = {"enc.enc.proj.weight": 3, "dec.dec.proj.weight": 4}
        assert reference_state_dict(sd) == sd

    def test_model_key_that_is_a_tensor_is_kept(self):
        # only dict-valued 'model' keys are wrappers
        sd = {"model": 7, "other": 8}
        assert reference_state_dict(sd) == sd


class TestVaeDecoderParams:
    def test_full_vae_tree_extracts_decoder(self):
        from vaevar_tpu.train.checkpoint import vae_decoder_params

        full = {"params": {"enc": {"a": 1}, "dec": {"b": 2}}}
        assert vae_decoder_params(full) == {"params": {"b": 2}}

    def test_decoder_only_tree_passes_through(self):
        from vaevar_tpu.train.checkpoint import vae_decoder_params

        dec = {"params": {"enc_proj": {"kernel": 1}, "lg": {}}}
        assert vae_decoder_params(dec) is dec


@needs_reference
class TestYamlConfig:
    def test_forecast_yaml_matches_forecast_025_preset(self):
        """convert_ckpt --config on the shipped 0.25deg yaml reproduces the
        FORECAST_025 preset (training_options.yaml:68-119 via the
        model.params.sub_model.lgunet_all path, da_4dvar.py:555)."""
        import yaml

        import convert_ckpt

        path = os.path.join(
            REF, "output/model/model_0.25degree/training_options.yaml"
        )
        with open(path) as f:
            block = convert_ckpt.lgunet_block_from_yaml(yaml.safe_load(f))
        cfg = cfgs.LGUnetConfig.from_reference_dict(block, attn_type="rope")
        ref = cfgs.FORECAST_025
        for f_ in ("img_size", "patch_size", "stride", "inchans_list",
                   "outchans_list", "enc_dim", "embed_dim", "window_size",
                   "enc_depths", "enc_heads", "lg_depths", "lg_heads"):
            assert getattr(cfg, f_) == getattr(ref, f_), f_
        assert cfg.remat  # use_checkpoint: true

    def test_network_params_layout(self):
        # the flow yaml layout (da_4dvar.py:577): model.network_params
        import convert_ckpt

        block = {"img_size": [128, 256], "inchans_list": [4, 13],
                 "outchans_list": [8, 26]}
        got = convert_ckpt.lgunet_block_from_yaml(
            {"model": {"network_params": block}}
        )
        assert got is block

    def test_missing_block_raises(self):
        import convert_ckpt

        with pytest.raises(SystemExit, match="lgunet params block"):
            convert_ckpt.lgunet_block_from_yaml({"model": {"type": "x"}})


def _old_torch_lgunet(cfg, seed=0):
    """Reference old-gen LGUnet_all built from an LGUnetConfig."""
    from tests.test_torch_parity import _install_stubs

    _install_stubs()
    import torch

    from networks_old.transformer import LGUnet_all

    torch.manual_seed(seed)
    model = LGUnet_all(
        img_size=list(cfg.img_size), patch_size=list(cfg.patch_size),
        stride=list(cfg.stride), in_chans=cfg.in_chans,
        out_chans=cfg.out_chans, inchans_list=list(cfg.inchans_list),
        outchans_list=list(cfg.outchans_list), enc_dim=cfg.enc_dim,
        embed_dim=cfg.embed_dim, window_size=cfg.window_size[0],
        enc_depths=list(cfg.enc_depths), enc_heads=list(cfg.enc_heads),
        lg_depths=list(cfg.lg_depths), lg_heads=list(cfg.lg_heads),
        rank=cfg.lora_rank,
    ).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


@needs_reference
@pytest.mark.slow
class TestConvertCliEndToEnd:
    def test_flow_pth_to_orbax_forward_parity(self, tmp_path):
        """{'model': sd} wrapper + module. prefixes -> CLI -> restored tree
        drives the flax forward to torch agreement."""
        import torch

        import convert_ckpt
        from vaevar_tpu.models.lgunet import LGUnet
        from vaevar_tpu.train import checkpoint as ckpt

        cfg = cfgs.micro_config(attn_type="relbias")
        tm = _old_torch_lgunet(cfg)
        sd = {"module." + k: v for k, v in tm.state_dict().items()}
        src = tmp_path / "checkpoint_best.pth"
        torch.save({"model": sd, "epoch": 3}, src)

        out = tmp_path / "flow_ported"
        convert_ckpt.main(["flow", str(src), str(out), "--micro"])

        params = ckpt.restore(str(out))
        x = np.random.default_rng(0).standard_normal(
            (1, cfg.in_chans, *cfg.img_size)
        ).astype(np.float32)
        with torch.no_grad():
            y_ref = tm(torch.from_numpy(x)).numpy()
        y = LGUnet(cfg).apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=2e-3)

    def test_vae_pth_to_orbax_decoder_parity(self, tmp_path):
        """Bare VAE_lr state_dict -> CLI -> full tree restores and its dec
        branch drives the standalone decoder (the run_da handoff)."""
        import torch

        import convert_ckpt
        from vaevar_tpu.models.lgunet import LGUnet
        from vaevar_tpu.train import checkpoint as ckpt
        from vaevar_tpu.train.checkpoint import vae_decoder_params

        enc_cfg, dec_cfg = cfgs.micro_vae_configs()
        enc_tm = _old_torch_lgunet(enc_cfg, seed=1)
        dec_tm = _old_torch_lgunet(dec_cfg, seed=2)
        sd = {}
        sd.update({"enc." + k: v for k, v in enc_tm.state_dict().items()})
        sd.update({"dec." + k: v for k, v in dec_tm.state_dict().items()})
        src = tmp_path / "vae_sigma2.pth"
        torch.save(sd, src)

        out = tmp_path / "vae_ported"
        convert_ckpt.main(["vae", str(src), str(out), "--micro"])

        tree = ckpt.restore(str(out))
        assert set(tree["params"]) == {"enc", "dec"}
        dec_params = vae_decoder_params(tree)
        z = np.random.default_rng(1).standard_normal(
            (1, dec_cfg.in_chans, *dec_cfg.img_size)
        ).astype(np.float32)
        with torch.no_grad():
            y_ref = dec_tm(torch.from_numpy(z)).numpy()
        y = LGUnet(dec_cfg).apply(dec_params, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_run_da_accepts_full_vae_tree(tmp_path):
    """run_da --vae_ckpt consumes the FULL VAE tree run_train_vae.py saves
    (vae_latest), not just a pre-extracted decoder tree."""
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.train import checkpoint as ckpt

    shw = (32, 64)
    dec_cfg = cfgs.micro_vae_configs(img_size=shw)[1]  # run_da's micro dec
    dec = LGUnet(dec_cfg)
    z0 = jnp.zeros((1, 8, *shw), jnp.float32)
    dec_params = dec.init(jax.random.PRNGKey(0), z0)
    full = {"params": {"enc": {"unused": np.zeros(1, np.float32)},
                       "dec": dec_params["params"]}}
    path = tmp_path / "vae_latest"
    ckpt.save(str(path), full)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "run_da.py", "--da_mode", "vae4dvar",
         "--fast_init", "--micro", "--grid", "32x64",
         "--solver_grid", "32x64", "--Nit", "1",
         "--vae_ckpt", str(path),
         "--start_time", "2022-01-01 00:00:00",
         "--end_time", "2022-01-01 06:00:00",
         "--work_dir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DA complete" in r.stdout
