"""Bisect decoder forward time: enc/dec groups vs LG stack vs attention."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from vaevar_tpu.utils import compile_cache
compile_cache.enable()

from vaevar_tpu.config import VAE_DECODER
from vaevar_tpu.models import lgunet as L
from vaevar_tpu.utils.fast_init import fast_init

dtype = jnp.bfloat16


def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))


def t(f, n=20):
    sync(f())
    t0 = time.time()
    for _ in range(n):
        sync(f())
    return (time.time() - t0) / n


z0 = jnp.zeros((1, 32, 128, 256), jnp.float32)

# full decoder
cfg = VAE_DECODER.replace(dtype=dtype)
m_full = L.LGUnet(cfg)
p_full = jax.device_put(fast_init(m_full, z0, seed=0))
f_full = jax.jit(lambda p, z: m_full.apply(p, z))
print("full decoder        :", t(lambda: f_full(p_full, z0)))

# enc+dec only (no LG blocks)
cfg_nolg = cfg.replace(lg_depths=(), lg_heads=())
m_nolg = L.LGUnet(cfg_nolg)
p_nolg = jax.device_put(fast_init(m_nolg, z0, seed=0))
f_nolg = jax.jit(lambda p, z: m_nolg.apply(p, z))
print("enc+dec only        :", t(lambda: f_nolg(p_nolg, z0)))

# LG stack alone at (1, 32, 64, 1152)
x_lg = jnp.zeros((1, 32, 64, 1152), dtype)
m_lg = L.LGStack(cfg)
p_lg = jax.device_put(fast_init(m_lg, x_lg, seed=0))
f_lg = jax.jit(lambda p, x: m_lg.apply(p, x))
print("LG stack (12 blocks):", t(lambda: f_lg(p_lg, x_lg)))

# one windowed rel-bias block at LG dims
m_blk = L.Block(dim=1152, num_heads=6, window_size=(4, 4), shift_size=(0, 0),
                resolution=(32, 64), attn_type="relbias", dtype=dtype)
p_blk = jax.device_put(fast_init(m_blk, x_lg, seed=0))
f_blk = jax.jit(lambda p, x: m_blk.apply(p, x))
print("1 LG block          :", t(lambda: f_blk(p_blk, x_lg)))

# attention only vs mlp only at LG dims
m_attn = L.WindowAttention(dim=1152, num_heads=6, window_size=(4, 4),
                           shift_size=(0, 0), resolution=(32, 64),
                           attn_type="relbias", dtype=dtype)
p_attn = jax.device_put(fast_init(m_attn, x_lg, seed=0))
f_attn = jax.jit(lambda p, x: m_attn.apply(p, x))
print("1 LG attention      :", t(lambda: f_attn(p_attn, x_lg)))

m_mlp = L.Mlp(dim=1152, hidden=4608, dtype=dtype)
p_mlp = jax.device_put(fast_init(m_mlp, x_lg, seed=0))
f_mlp = jax.jit(lambda p, x: m_mlp.apply(p, x))
print("1 LG mlp            :", t(lambda: f_mlp(p_mlp, x_lg)))

# raw matmul reference: (2048, 1152) x (1152, 4608)
a = jnp.zeros((2048, 1152), dtype)
w = jnp.zeros((1152, 4608), dtype)
f_mm = jax.jit(lambda a, w: a @ w)
print("raw matmul 2048x1152x4608:", t(lambda: f_mm(a, w), n=50))
