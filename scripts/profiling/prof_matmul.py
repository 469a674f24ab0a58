"""Check whether the ~0.35ms/op floor is the strided reduce or real."""
import time
import jax
import jax.numpy as jnp

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

dtype = jnp.bfloat16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[::997]))


a = jnp.zeros((8192, 96), dtype)
w1 = jnp.zeros((96, 384), dtype)
w2 = jnp.zeros((384, 96), dtype)


# chained: 200 matmul pairs, no per-iter reduce
@jax.jit
def chain(a, w1, w2):
    def body(i, x):
        return (x @ w1) @ w2 * 0.5
    return jax.lax.fori_loop(0, 200, body, a)


sync(chain(a, w1, w2))
t0 = time.time()
sync(chain(a, w1, w2))
dt = (time.time() - t0) / 200
print(f"chained mm pair 8192x96x384: {dt*1e3:8.4f} ms/pair "
      f"{2*2*8192*96*384/dt/1e12:6.2f} TF")


# per-iter full sum (no stride)
@jax.jit
def full_sum(a, w1):
    def body(i, acc):
        return acc + jnp.sum(((a + i) @ w1).astype(jnp.float32))
    return jax.lax.fori_loop(0, 200, body, jnp.float32(0))


sync(full_sum(a, w1)[None])
t0 = time.time()
sync(full_sum(a, w1)[None])
print(f"per-iter full-sum mm       : {(time.time()-t0)/200*1e3:8.4f} ms")


# per-iter strided sum (the old harness)
@jax.jit
def strided(a, w1):
    def body(i, acc):
        out = (a + i) @ w1
        return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[::997])
    return jax.lax.fori_loop(0, 200, body, jnp.float32(0))


sync(strided(a, w1)[None])
t0 = time.time()
sync(strided(a, w1)[None])
print(f"per-iter strided-sum mm    : {(time.time()-t0)/200*1e3:8.4f} ms")

# big matmul chained for reference
A = jnp.zeros((2048, 1152), dtype)
W1 = jnp.zeros((1152, 4608), dtype)
W2 = jnp.zeros((4608, 1152), dtype)


@jax.jit
def chain_big(A, W1, W2):
    def body(i, x):
        return (x @ W1) @ W2 * 0.5
    return jax.lax.fori_loop(0, 200, body, A)


sync(chain_big(A, W1, W2))
t0 = time.time()
sync(chain_big(A, W1, W2))
dt = (time.time() - t0) / 200
print(f"chained big mm pair        : {dt*1e3:8.4f} ms/pair "
      f"{2*2*2048*1152*4608/dt/1e12:6.2f} TF")
