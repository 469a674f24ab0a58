"""Primary-path probe: does the fused Pallas Swin block (fuse_blocks)
help the production reduced 3D-Var solve? Times one 10-iteration L-BFGS
segment with the decoder built fuse_blocks off (default) vs on.
PERF.md round-1 finding: per-block it matches XLA +-5%; this measures
the end-to-end solve where dispatch overheads could tip either way."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache

compile_cache.enable()

from vaevar_tpu import channels
from vaevar_tpu.config import DAConfig, VAE_DECODER
from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.lbfgs import segment_carry_init
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

cfg = DAConfig()
HW = cfg.grid_hw
z0 = jnp.zeros(cfg.latent_shape, jnp.float32)

rr = np.random.default_rng(0)
base = channels.MEAN.reshape(-1, 1, 1) + channels.STD.reshape(
    -1, 1, 1) * rr.normal(size=(69, *HW)).astype(np.float32)
xb = jnp.asarray(base, jnp.float32)
gt = jnp.asarray(base + 0.3 * channels.STD.reshape(-1, 1, 1)
                 * rr.normal(size=(69, *HW)), jnp.float32)[None]
Hm = jnp.asarray(obs_mod.make_obs_mask(cfg.obs_type, 1, HW, rr))
R = jnp.asarray(obs_mod.build_R(
    obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp), None, 1, HW))
full = ObsBundle(xb=xb, yo=gt, H=Hm, R=R)


def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))


def run(name, fuse):
    dec_cfg = VAE_DECODER.replace(dtype=jnp.bfloat16)
    if fuse:
        dec_cfg = dec_cfg.replace(fuse_blocks=True)
    decoder = LGUnet(dec_cfg)
    params = {"decoder": jax.device_put(fast_init(decoder, z0, seed=0))}
    c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
    solver = VariationalSolver(c, to_state, parts,
                               lbfgs_iters=cfg.lbfgs_iters,
                               history=cfg.lbfgs_history)
    red = jax.jit(lambda b: cost_mod.reduce_obs(b, (128, 256)))(full)
    st = solver.seg_init(z0)
    ev0 = segment_carry_init()  # each call = one OUTER segment
    x, s, _ = solver.segment(z0, st, ev0, red, params)
    x, s, _ = solver.segment(x, s, ev0, red, params)
    sync(x)
    t0 = time.time()
    x, s2 = z0, st
    for _ in range(10):
        x, s2, _ = solver.segment(x, s2, ev0, red, params)
    sync(x)
    # 10 segment dispatches x lbfgs_iters quasi-Newton iterations each
    n_qn = 10 * cfg.lbfgs_iters
    print(f"{name}: {n_qn} L-BFGS iters {time.time() - t0:.2f}s",
          flush=True)


for name, fuse in [("modular", False), ("fused", True)]:
    if sys.argv[1:] and name not in sys.argv[1:]:
        continue
    run(name, fuse)
