"""Production-geometry full-chain PINNED regression (automated cadence).

tests/test_prod_geometry_golden.py carries the torch-oracle parity at
real shapes but is double-gated (slow + RUN_PROD_GOLDEN=1) because the
oracle needs ~15 min of single-core torch; its pinned result is a manual
run — nothing automated would catch a full-chain regression at
production shapes (VERDICT r4 item 7).

This test re-runs ONLY the jax side of the same one-cycle construction —
VAE_DECODER (215.9M params) from deterministic seeded init, latent
(1, 32, 128, 256), 1.4deg grid, free_0010 obs, the production reduced-
obs cycler path (da_4dvar.py:1238-1306 semantics) — and compares summary
statistics of the analysis against a COMMITTED artifact
(tests/goldens/prod_geometry_pinned.json, produced by
scripts/make_prod_pinned.py). Any drift in the decoder forward, cost,
L-BFGS trajectory, or cycler wiring at real shapes moves these numbers.

Tolerances are loose enough for cross-version float drift (the solve is
deterministic on a fixed binary; an XLA upgrade may perturb reductions
at ~1e-6) and tight enough that a semantic change — a changed default, a
reordered transform, a linesearch regression — fails loudly. If the
change is INTENDED, regenerate with:

    python scripts/make_prod_pinned.py
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ART = os.path.join(os.path.dirname(__file__), "goldens",
                   "prod_geometry_pinned.json")


def compute_summary():
    """The pinned quantities; shared with scripts/make_prod_pinned.py."""
    import jax.numpy as jnp

    from vaevar_tpu import channels, config as cfgs
    from vaevar_tpu.config import VAE_DECODER
    from vaevar_tpu.da import obs as obs_mod
    from vaevar_tpu.da.cycler import CycledDA
    from vaevar_tpu.data.era5 import SyntheticEra5
    from vaevar_tpu.models.lgunet import LGUnet
    from vaevar_tpu.utils.fast_init import fast_init
    from vaevar_tpu.utils.metrics import weighted_rmse

    HW = (128, 256)
    MEAN3 = channels.MEAN.reshape(-1, 1, 1).astype(np.float32)
    STD3 = channels.STD.reshape(-1, 1, 1).astype(np.float32)

    dec = LGUnet(VAE_DECODER)
    dec_params = fast_init(dec, jnp.zeros((1, 32, *HW), jnp.float32), seed=0)

    rng = np.random.default_rng(0)
    gt0 = (MEAN3 + STD3 * rng.normal(size=(69, *HW))).astype(np.float32)
    gt = gt0[None]
    xb = (gt0 + 0.5 * STD3 * rng.normal(size=(69, *HW))).astype(np.float32)
    H = obs_mod.make_obs_mask("free_0010", 1, HW, rng).astype(np.float32)
    R = obs_mod.build_R(
        obs_mod.obs_error_variance(0.005, 2), None, 1, HW
    ).astype(np.float32)
    yo = gt.copy()

    da_cfg = cfgs.DAConfig(
        da_mode="vae4dvar", da_win=1, nit=1, lbfgs_iters=2,
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
    xa = np.asarray(
        da.one_step_da(jnp.asarray(gt), jnp.asarray(xb), jnp.asarray(yo),
                       jnp.asarray(H), jnp.asarray(R))
    )

    xn = (xa - MEAN3) / STD3
    gn = (gt0 - MEAN3) / STD3
    w = np.asarray(
        weighted_rmse(jnp.asarray(xn)[None], jnp.asarray(gn)[None])
    ) * channels.STD
    inc = xa - xb
    return {
        "z500_ana_wrmse": float(w[11]),
        "t850_ana_wrmse": float(w[66]),
        "t2m_ana_wrmse": float(w[2]),
        "inc_norm": float(np.linalg.norm(inc)),
        "xa_norm": float(np.linalg.norm(xa)),
        # strided probe of the analysis increment: catches spatially-
        # structured drift that norms average away
        "inc_probe": np.round(
            inc[::17, ::31, ::53].astype(np.float64), 5
        ).reshape(-1).tolist(),
        "bg_z500_wrmse": float(
            (np.asarray(weighted_rmse(
                jnp.asarray((xb - MEAN3) / STD3)[None],
                jnp.asarray(gn)[None],
            )) * channels.STD)[11]
        ),
    }


def test_production_geometry_pinned():
    assert os.path.exists(ART), (
        f"missing committed artifact {ART}; generate with "
        "python scripts/make_prod_pinned.py"
    )
    with open(ART) as f:
        pinned = json.load(f)
    got = compute_summary()

    for k in ("z500_ana_wrmse", "t850_ana_wrmse", "t2m_ana_wrmse",
              "inc_norm", "xa_norm", "bg_z500_wrmse"):
        rel = abs(got[k] - pinned[k]) / max(abs(pinned[k]), 1e-12)
        assert rel < 5e-3, (k, got[k], pinned[k], rel)
    probe_g = np.asarray(got["inc_probe"])
    probe_p = np.asarray(pinned["inc_probe"])
    assert probe_g.shape == probe_p.shape
    rel = np.linalg.norm(probe_g - probe_p) / max(
        np.linalg.norm(probe_p), 1e-12
    )
    assert rel < 1e-2, rel
    # NOTE deliberately no ana<bg science assertion here: with seeded-
    # random decoder weights and 2 L-BFGS iters the increment is noise-
    # level (pinned artifact: ana z500 1657.556 vs bg 1657.544). Science
    # guards live in tests/test_osse_science.py with TRAINED weights;
    # this test pins full-chain numerics at production shapes.
