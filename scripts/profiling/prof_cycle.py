"""Phase-level timing of the bench cycle on the real TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

from vaevar_tpu import channels
from vaevar_tpu.config import DAConfig, FLOW_140, VAE_DECODER
from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.dynamics import make_integrate
from vaevar_tpu.da.lbfgs import segment_carry_init
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

cfg = DAConfig()
HW = cfg.grid_hw
dtype = jnp.bfloat16

dec_cfg = VAE_DECODER.replace(dtype=dtype)
decoder = LGUnet(dec_cfg)
z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
dec_params = jax.device_put(fast_init(decoder, z0, seed=0))

flow_cfg = FLOW_140.replace(dtype=dtype)
flow = LGUnet(flow_cfg)
flow_params = jax.device_put(fast_init(flow, jnp.zeros((1, 69, 128, 256)), seed=1))
integrate = jax.jit(lambda p, x: make_integrate(flow.apply, (128, 256))(p, x, 1, True))
params = {"decoder": dec_params, "flow": flow_params}

rr = np.random.default_rng(0)
base = channels.MEAN.reshape(-1, 1, 1) + channels.STD.reshape(-1, 1, 1) * rr.normal(
    size=(69, *HW)).astype(np.float32)
xb = jnp.asarray(base, jnp.float32)
gt = jnp.asarray(base + 0.3 * channels.STD.reshape(-1, 1, 1) * rr.normal(size=(69, *HW)),
                 jnp.float32)[None]
Hm = jnp.asarray(obs_mod.make_obs_mask(cfg.obs_type, cfg.da_win, HW, rr))
R = jnp.asarray(obs_mod.build_R(obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp),
                                None, cfg.da_win, HW))
full_bundle = ObsBundle(xb=xb, yo=gt, H=Hm, R=R)
reduce = jax.jit(lambda b: cost_mod.reduce_obs(b, (128, 256)))

c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
solver = VariationalSolver(c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
                           history=cfg.lbfgs_history)

def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))

# warmup all phases
bundle = reduce(full_bundle); sync(bundle.a)
st0 = solver.seg_init(z0)
ev0 = segment_carry_init()
zz, st1, _ = solver.segment(z0, st0, ev0, bundle, params); sync(zz)
fused = solver.fused_solve(cfg.nit)
zf, xaf = fused(z0, bundle, params); sync(xaf)
xa = solver.to_state(zz, bundle, params); sync(xa)
xn = integrate(params["flow"], xa); sync(xn)

def t(f, n=5):
    t0 = time.time()
    for _ in range(n):
        sync(f())
    return (time.time() - t0) / n

print("reduce      :", t(lambda: reduce(full_bundle).a))
print("segment(10) :", t(lambda: solver.segment(z0, st0, ev0, bundle, params)[0], n=3))
print(f"fused({cfg.nit}x10) :", t(lambda: fused(z0, bundle, params)[1], n=3))
print("to_state    :", t(lambda: solver.to_state(zz, bundle, params)))
print("integrate   :", t(lambda: integrate(params["flow"], xa)))

# cost+grad single eval timing (bundle/params as traced args — closing
# over them bakes ~300MB of constants into the program and overflows the
# axon remote-compile request)
vg = jax.jit(jax.value_and_grad(c))
v, g = vg(z0, bundle, params); sync(g)
print("cost+grad   :", t(lambda: vg(z0, bundle, params)[1]))
# decoder fwd only
dec_fwd = jax.jit(lambda p, z: decoder.apply(p, z))
o = dec_fwd(dec_params, z0); sync(o)
print("decoder fwd :", t(lambda: dec_fwd(dec_params, z0)))
