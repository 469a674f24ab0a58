"""Device-time measurement with in-jit loops (amortizes ~35ms tunnel sync)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

from vaevar_tpu.config import VAE_DECODER
from vaevar_tpu.da import cost as cost_mod
from vaevar_tpu.da.lbfgs import lbfgs_minimize
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

dtype = jnp.bfloat16


def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))


def t(f, n=3):
    sync(f())
    t0 = time.time()
    for _ in range(n):
        sync(f())
    return (time.time() - t0) / n


# raw matmul x200 in one jit
a = jnp.ones((2048, 1152), dtype)
w = jnp.ones((1152, 4608), dtype)


@jax.jit
def mm_loop(a, w):
    def body(i, acc):
        return acc + jnp.sum((a + i) @ w)
    return jax.lax.fori_loop(0, 200, body, jnp.float32(0))


dt = t(lambda: mm_loop(a, w))
print(f"matmul 2048x1152x4608 x200: {dt:.4f}s -> {dt/200*1e3:.3f} ms/mm "
      f"-> {21.7e9*200/dt/1e12:.1f} TFLOPS")

cfg = VAE_DECODER.replace(dtype=dtype)
decoder = LGUnet(cfg)
z0 = jnp.zeros((1, 32, 128, 256), jnp.float32)
params = jax.device_put(fast_init(decoder, z0, seed=0))


@jax.jit
def fwd_loop(p, z):
    def body(i, acc):
        return acc + jnp.sum(decoder.apply(p, z + 0.0 * i)[0, 0, 0, :8])
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))


dt = t(lambda: fwd_loop(params, z0))
print(f"decoder fwd x10: {dt:.4f}s -> {dt/10*1e3:.2f} ms/fwd")

c, _, _ = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
rr = np.random.default_rng(0)
red = cost_mod.ReducedObs(
    xb=jnp.asarray(rr.normal(size=(69, 721, 1440)), jnp.float32),
    a=jnp.asarray(rr.random((69, 128, 256)), jnp.float32),
    b=jnp.asarray(rr.normal(size=(69, 128, 256)), jnp.float32),
    c=jnp.float32(1.0),
)
pp = {"decoder": params, "flow": None}
vgf = jax.value_and_grad(lambda q, b, p: c(q, b, p))


@jax.jit
def vg_loop(z, b, p):
    def body(i, acc):
        v, g = vgf(z + 0.0 * i, b, p)
        return acc + v + jnp.sum(g[0, 0, 0, :8])
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))


dt = t(lambda: vg_loop(z0, red, pp))
print(f"cost+grad x10: {dt:.4f}s -> {dt/10*1e3:.2f} ms/eval")


def seg(iters):
    f = jax.jit(lambda z, b, p: lbfgs_minimize(
        lambda q: c(q, b, p), z, max_iters=iters, history=10).x)
    f(z0, red, pp)  # compile
    return t(lambda: f(z0, red, pp))


s10 = seg(10)
s20 = seg(20)
print(f"segment 10: {s10:.4f}s, segment 20: {s20:.4f}s, "
      f"per-iter: {(s20-s10)/10*1e3:.2f} ms")
