"""Raw matmul timings at enc-stage shapes to isolate the slowness."""
import time
import jax
import jax.numpy as jnp

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

dtype = jnp.bfloat16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[::997]))


def loop_time(f, args, n=100):
    @jax.jit
    def run(*a):
        def body(i, acc):
            out = f(*a, i)
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[::997])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    sync(run(*args))
    t0 = time.time()
    sync(run(*args))
    return (time.time() - t0) / n


# fc1 shape: (8192, 96) @ (96, 384)
a = jnp.zeros((8192, 96), dtype)
w = jnp.zeros((96, 384), dtype)
t = loop_time(lambda a, w, i: (a + i) @ w, (a, w))
print(f"mm 8192x96x384 bf16      : {t*1e3:8.4f} ms  {2*8192*96*384/t/1e12:6.2f} TF")

# f32 weights cast at use (the model's pattern)
wf = jnp.zeros((96, 384), jnp.float32)
t = loop_time(lambda a, w, i: (a + i) @ w.astype(dtype), (a, wf))
print(f"mm f32w cast             : {t*1e3:8.4f} ms")

# batched over 4D like the model: (1, 64, 128, 96) @ (96, 384)
a4 = jnp.zeros((1, 64, 128, 96), dtype)
t = loop_time(lambda a, w, i: (a + i) @ w, (a4, w))
print(f"mm 4d (1,64,128,96)@...  : {t*1e3:8.4f} ms")

# gelu exact on the hidden
h = jnp.zeros((8192, 384), dtype)
t = loop_time(lambda h, i: jax.nn.gelu(h + i, approximate=False), (h,))
print(f"gelu exact 8192x384      : {t*1e3:8.4f} ms")
t = loop_time(lambda h, i: jax.nn.gelu(h + i, approximate=True), (h,))
print(f"gelu tanh  8192x384      : {t*1e3:8.4f} ms")

# layernorm at (8192, 96) f32
x = jnp.zeros((8192, 96), dtype)
import flax.linen as nn
ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
p = ln.init(jax.random.PRNGKey(0), x)
t = loop_time(lambda x, i: ln.apply(p, x + i), (x,))
print(f"layernorm 8192x96        : {t*1e3:8.4f} ms")

# the full Mlp chain as raw ops
w1 = jnp.zeros((96, 384), dtype)
b1 = jnp.zeros((384,), dtype)
w2 = jnp.zeros((384, 96), dtype)
b2 = jnp.zeros((96,), dtype)


def mlp(a, i):
    h = (a + i) @ w1 + b1
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2 + b2


t = loop_time(lambda a, i: mlp(a, i), (a,))
print(f"raw mlp chain            : {t*1e3:8.4f} ms")

# window-attention core shapes: (1536, 3, 16, 32) qk
q = jnp.zeros((1536, 3, 16, 32), dtype)
k = jnp.zeros((1536, 3, 16, 32), dtype)
v = jnp.zeros((1536, 3, 16, 32), dtype)


def attn(q, k, v, i):
    lg = jnp.einsum("bhnd,bhmd->bhnm", q + i, k,
                    preferred_element_type=jnp.float32)
    wgt = jax.nn.softmax(lg, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", wgt, v)


t = loop_time(attn, (q, k, v))
print(f"win attn core 1536x3x16  : {t*1e3:8.4f} ms")
