"""One-cycle analysis golden at the PRODUCTION geometry.

Same oracle construction as tests/test_one_cycle_golden.py (torch
transcription of the reference vae4dvar branch, da_4dvar.py:1238-1306,
with ported weights and torch.optim.LBFGS), but at the REAL shapes the
shipped configs run: VAE_DECODER (215.9M params, old-gen relbias),
latent z (1, 32, 128, 256), 1.4deg analysis grid (128x256) — the
missing full-chain check VERDICT r3 flagged (component goldens covered
real shapes; the end-to-end one-cycle parity only ran micro shapes).

Heavy: the torch oracle needs ~4 closure evals x ~80 s fwd+bwd on this
host's single CPU core, the jax side a production-size CPU compile.
Gated behind RUN_PROD_GOLDEN=1 (in addition to the slow marker) so the
regular full tier stays bounded; run explicitly with

    RUN_PROD_GOLDEN=1 python -m pytest tests/test_prod_geometry_golden.py -q

Pinned result (this host, 2026-08-19, nit=1 x iters=2, free_0010 obs):
analysis-field rel error 6.6e-07, z500 WRMSE rel diff 1.4e-07
(bounds 1e-3 / 1e-2), increment divergence 9.6e-4 (bound 0.4) — see
docs/PARITY.md "production-geometry golden".
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from vaevar_tpu import channels, config as cfgs  # noqa: E402
from vaevar_tpu.config import VAE_DECODER  # noqa: E402
from vaevar_tpu.da import obs as obs_mod  # noqa: E402
from vaevar_tpu.da.cycler import CycledDA  # noqa: E402
from vaevar_tpu.data.era5 import SyntheticEra5  # noqa: E402
from vaevar_tpu.models.lgunet import LGUnet  # noqa: E402
from vaevar_tpu.utils.metrics import weighted_rmse  # noqa: E402
from vaevar_tpu.utils.port_torch import lgunet_params_from_torch  # noqa: E402

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "networks_old")),
        reason="reference snapshot not available",
    ),
    pytest.mark.skipif(
        os.environ.get("RUN_PROD_GOLDEN") != "1",
        reason="production-geometry golden is ~15 min on one CPU core; "
               "set RUN_PROD_GOLDEN=1 to run",
    ),
]

HW = (128, 256)  # 1.4deg analysis grid — also the latent/solver grid
MEAN3 = channels.MEAN.reshape(-1, 1, 1).astype(np.float32)
STD3 = channels.STD.reshape(-1, 1, 1).astype(np.float32)
STDTR = channels.ERR_STD.astype(np.float32).reshape(1, 69, 1, 1)

NIT, ITERS = 1, 2  # enough linesearch/curvature steps to pin the chain


def _z500_wrmse(x, gt0):
    xn = (x - MEAN3) / STD3
    gn = (gt0 - MEAN3) / STD3
    w = np.asarray(weighted_rmse(jnp.asarray(xn)[None], jnp.asarray(gn)[None]))
    return float(w[11] * channels.STD[11])


def test_production_geometry_one_cycle():
    from test_torch_parity import _install_stubs

    _install_stubs()
    from networks_old.transformer import LGUnet_all

    cfg = VAE_DECODER
    torch.manual_seed(0)
    tdec = LGUnet_all(
        img_size=list(cfg.img_size), patch_size=[2, 2], stride=[2, 2],
        in_chans=cfg.in_chans, out_chans=cfg.out_chans,
        inchans_list=list(cfg.inchans_list),
        outchans_list=list(cfg.outchans_list),
        enc_dim=cfg.enc_dim, embed_dim=cfg.embed_dim,
        window_size=cfg.window_size[0],
        enc_depths=list(cfg.enc_depths), enc_heads=list(cfg.enc_heads),
        lg_depths=list(cfg.lg_depths), lg_heads=list(cfg.lg_heads), rank=0,
    ).eval()
    with torch.no_grad():
        for p in tdec.parameters():
            p.add_(0.02 * torch.randn_like(p))
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    dec_params = lgunet_params_from_torch(sd, cfg)
    dec = LGUnet(cfg)

    rng = np.random.default_rng(0)
    gt0 = (MEAN3 + STD3 * rng.normal(size=(69, *HW))).astype(np.float32)
    gt = gt0[None]
    xb = (gt0 + 0.5 * STD3 * rng.normal(size=(69, *HW))).astype(np.float32)
    H = obs_mod.make_obs_mask("free_0010", 1, HW, rng).astype(np.float32)
    R = obs_mod.build_R(
        obs_mod.obs_error_variance(0.005, 2), None, 1, HW
    ).astype(np.float32)
    yo = gt.copy()

    # --- torch oracle (da_4dvar.py:1183-1208 loss, :1238-1306 loop) ----
    import torch.nn.functional as F

    std_t = torch.tensor(STD3)
    stdTr_t = torch.tensor(STDTR)
    xb_t, yo_t = torch.tensor(xb), torch.tensor(yo)
    H_t, R_t = torch.tensor(H), torch.tensor(R)

    def loss(z):
        reg = torch.sum(z ** 2) / 2
        x = F.interpolate(tdec(z), HW)  # decoder_hr (nf_model/vae.py:87-90)
        x = (x * stdTr_t) * std_t.reshape(1, -1, 1, 1) + xb_t
        return reg + torch.sum(H_t * (x[0][None] - yo_t) ** 2 / R_t) / 2

    z = torch.zeros(1, 32, *HW, requires_grad=True)
    lbfgs = torch.optim.LBFGS([z], history_size=10, max_iter=ITERS,
                              line_search_fn="strong_wolfe")

    def closure():
        lbfgs.zero_grad()
        obj = loss(z)
        obj.backward()
        return obj

    for _ in range(NIT):
        lbfgs.step(closure)
    with torch.no_grad():
        xa_t = (F.interpolate(tdec(z), HW)[0] * stdTr_t[0] * std_t
                + xb_t).numpy()

    # --- our production path (reduced obs quadratic, optax L-BFGS) -----
    da_cfg = cfgs.DAConfig(
        da_mode="vae4dvar", da_win=1, nit=NIT, lbfgs_iters=ITERS,
        obs_std=0.005, modify_tp=2, obs_type="free_0010", q_type=-1,
        grid_hw=HW, solver_hw=HW, latent_shape=(1, 32, *HW),
        init_tp=1, init_lag=1,
    )
    da = CycledDA(
        da_cfg, SyntheticEra5(hw=HW, seed=5),
        lambda p, x, steps, interpolation=False: x,
        decoder_apply=lambda p, q: dec.apply(p, q),
        vae_params=dec_params,
        work_dir=tempfile.mkdtemp(), verbose=False,
    )
    xa_j = np.asarray(
        da.one_step_da(jnp.asarray(gt), jnp.asarray(xb), jnp.asarray(yo),
                       jnp.asarray(H), jnp.asarray(R))
    )

    field_rel = np.linalg.norm(xa_j - xa_t) / np.linalg.norm(xa_t)
    inc_rel = np.linalg.norm((xa_j - xb) - (xa_t - xb)) / max(
        np.linalg.norm(xa_t - xb), 1e-12
    )
    wj, wt = _z500_wrmse(xa_j, gt0), _z500_wrmse(xa_t, gt0)
    wb = _z500_wrmse(xb, gt0)
    print(f"prod golden: field_rel {field_rel:.3g} inc_rel {inc_rel:.3g} "
          f"z500 ana (jax {wj:.6g} torch {wt:.6g} bg {wb:.6g})")
    assert field_rel < 1e-3, field_rel
    assert inc_rel < 0.4, inc_rel
    # the BASELINE "Z500 analysis RMSE within 1%" criterion at real shapes
    assert abs(wj - wt) / wt < 1e-2, (wj, wt)
    assert wj < wb and wt < wb, (wj, wt, wb)
