"""Bisect the enc+dec 12.8ms: per-group stages, attention variants."""
import time
import jax
import jax.numpy as jnp
import flax.linen as nn

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

from vaevar_tpu.config import VAE_DECODER
from vaevar_tpu.models import lgunet as L
from vaevar_tpu.utils.fast_init import fast_init

dtype = jnp.bfloat16
N = 20


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[::997]))


def loop_time(apply_fn, params, x, n=N):
    @jax.jit
    def run(p, x):
        def body(i, acc):
            out = apply_fn(p, x + 0.0 * i)
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf.astype(jnp.float32).reshape(-1)[::997])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    sync(run(params, x))
    t0 = time.time()
    sync(run(params, x))
    return (time.time() - t0) / n


cfg = VAE_DECODER.replace(dtype=dtype)

# one group encoder at (1, 128, 256, 6)
g1 = jnp.zeros((1, 128, 256, 6), dtype)
m_enc = L.GroupEncoder(cfg)
p_enc = jax.device_put(fast_init(m_enc, g1, seed=0))
print(f"1-group encoder    : {loop_time(m_enc.apply, p_enc, g1)*1e3:8.3f} ms")

# vmapped 5-group encoder
g5 = jnp.zeros((5, 1, 128, 256, 6), dtype)
VEnc = nn.vmap(L.GroupEncoder, in_axes=0, out_axes=0,
               variable_axes={"params": 0}, split_rngs={"params": True})
m_v = VEnc(cfg)
p_v = jax.device_put(fast_init(m_v, g5, seed=0))
print(f"5-group vmap enc   : {loop_time(m_v.apply, p_v, g5)*1e3:8.3f} ms")

# one enc Block at stage0 dims: (1, 64, 128, 96), 3 heads, window 4x4
x0 = jnp.zeros((1, 64, 128, 96), dtype)
for at in ("relbias", "rope"):
    m_b = L.Block(dim=96, num_heads=3, window_size=(4, 4), shift_size=(0, 0),
                  resolution=(64, 128), attn_type=at, dtype=dtype)
    p_b = jax.device_put(fast_init(m_b, x0, seed=0))
    print(f"enc blk 96 4x4 {at:8s}: {loop_time(m_b.apply, p_b, x0)*1e3:8.3f} ms")

# larger window
m_b8 = L.Block(dim=96, num_heads=3, window_size=(8, 8), shift_size=(0, 0),
               resolution=(64, 128), attn_type="relbias", dtype=dtype)
p_b8 = jax.device_put(fast_init(m_b8, x0, seed=0))
print(f"enc blk 96 8x8 relb  : {loop_time(m_b8.apply, p_b8, x0)*1e3:8.3f} ms")

# attention alone vs mlp alone at enc dims
m_a = L.WindowAttention(dim=96, num_heads=3, window_size=(4, 4),
                        shift_size=(0, 0), resolution=(64, 128),
                        attn_type="relbias", dtype=dtype)
p_a = jax.device_put(fast_init(m_a, x0, seed=0))
print(f"enc attn 96 4x4      : {loop_time(m_a.apply, p_a, x0)*1e3:8.3f} ms")

m_m = L.Mlp(dim=96, hidden=384, dtype=dtype)
p_m = jax.device_put(fast_init(m_m, x0, seed=0))
print(f"enc mlp 96           : {loop_time(m_m.apply, p_m, x0)*1e3:8.3f} ms")

# stage1 block: (1, 32, 64, 192), 6 heads
x1 = jnp.zeros((1, 32, 64, 192), dtype)
m_b1 = L.Block(dim=192, num_heads=6, window_size=(4, 4), shift_size=(0, 0),
               resolution=(32, 64), attn_type="relbias", dtype=dtype)
p_b1 = jax.device_put(fast_init(m_b1, x1, seed=0))
print(f"enc blk 192 4x4      : {loop_time(m_b1.apply, p_b1, x1)*1e3:8.3f} ms")

# 5-group vmapped single block (the actual execution shape)
xv = jnp.zeros((5, 1, 64, 128, 96), dtype)
VBlk = nn.vmap(L.Block, in_axes=0, out_axes=0,
               variable_axes={"params": 0}, split_rngs={"params": True})
m_vb = VBlk(dim=96, num_heads=3, window_size=(4, 4), shift_size=(0, 0),
            resolution=(64, 128), attn_type="relbias", dtype=dtype)
p_vb = jax.device_put(fast_init(m_vb, xv, seed=0))
print(f"5-group vmap enc blk : {loop_time(m_vb.apply, p_vb, xv)*1e3:8.3f} ms")
