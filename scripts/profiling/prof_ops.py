"""Op-level timing experiments on the vae4dvar decoder hot path."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

from vaevar_tpu.config import VAE_DECODER
from vaevar_tpu.da import cost as cost_mod
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

dtype = jnp.bfloat16
dec_cfg = VAE_DECODER.replace(dtype=dtype)
decoder = LGUnet(dec_cfg)
z0 = jnp.zeros((1, 32, 128, 256), jnp.float32)
params = jax.device_put(fast_init(decoder, z0, seed=0))
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"decoder params: {n_params/1e6:.1f}M")

def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))

def t(f, n=20):
    sync(f())
    t0 = time.time()
    for _ in range(n):
        sync(f())
    return (time.time() - t0) / n

# 1. forward
fwd = jax.jit(lambda p, z: decoder.apply(p, z))
print("fwd f32 params   :", t(lambda: fwd(params, z0)))

# 2. forward with pre-cast bf16 params
pbf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, params)
print("fwd bf16 params  :", t(lambda: fwd(pbf16, z0)))

# 3. cost fwd+bwd (reduced quadratic, traced args like the solver)
c, to_state, _ = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
rr = np.random.default_rng(0)
red = cost_mod.ReducedObs(
    xb=jnp.asarray(rr.normal(size=(69, 721, 1440)), jnp.float32),
    a=jnp.asarray(rr.random((69, 128, 256)), jnp.float32),
    b=jnp.asarray(rr.normal(size=(69, 128, 256)), jnp.float32),
    c=jnp.float32(1.0),
)
vg = jax.jit(jax.value_and_grad(lambda q, b, p: c(q, b, p)))
pp = {"decoder": params, "flow": None}
print("cost+grad f32p   :", t(lambda: vg(z0, red, pp)[1], n=10))
ppb = {"decoder": pbf16, "flow": None}
print("cost+grad bf16p  :", t(lambda: vg(z0, red, ppb)[1], n=10))
