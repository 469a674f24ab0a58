"""Compile-only HBM probe for the da_win=6 window segment program.

Builds the exact bench_vae4dvar_4dvar_win6 segment (one quasi-Newton
iteration per dispatch, production granularity) and prints
compiled.memory_analysis() — the tool that caught the 16-18 GB layout-
copy blowups. Run on the TPU host; no execution, compile only.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache

compile_cache.enable()

from vaevar_tpu import channels
from vaevar_tpu.config import DAConfig, FLOW_140, VAE_DECODER
from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

DA_WIN = 6
cfg = DAConfig()
HW = cfg.grid_hw
dtype = jnp.bfloat16

decoder = LGUnet(VAE_DECODER.replace(dtype=dtype, remat=True))
flow = LGUnet(FLOW_140.replace(dtype=dtype, remat=True))
z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
params = {
    "decoder": fast_init(decoder, z0, seed=0),
    "flow": fast_init(flow, jnp.zeros((1, 69, 128, 256)), seed=1),
}

rr = np.random.default_rng(0)
xb = jnp.zeros((69, *HW), jnp.float32)
gt = jnp.zeros((DA_WIN, 69, *HW), jnp.float32)
Hm = jnp.asarray(obs_mod.make_obs_mask(cfg.obs_type, DA_WIN, HW, rr))
R = jnp.asarray(obs_mod.build_R(
    obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp), None, DA_WIN, HW
))
bundle = ObsBundle(xb=xb, yo=gt, H=Hm, R=R)

c, to_state, parts = cost_mod.make_vae4dvar_cost(
    decoder.apply, flow_apply=flow.apply, flow_hw=(128, 256), da_win=DA_WIN,
)
solver = VariationalSolver(c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
                           history=cfg.lbfgs_history,
                           segment_dispatch=True, iters_per_dispatch=1)
st = jax.eval_shape(solver._seg_init_raw, z0)
lowered = jax.jit(solver._segment_raw).lower(z0, st, bundle, params)
print("lowered; compiling...", flush=True)
compiled = lowered.compile()
m = compiled.memory_analysis()
print(m)
