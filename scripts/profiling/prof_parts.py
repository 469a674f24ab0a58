"""Bisect decoder device time with in-jit fori loops (tunnel-sync free)."""
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
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::97]))


def loop_time(make_apply, params, x, n=N):
    """Time n applications inside one jit."""

    @jax.jit
    def run(p, x):
        def body(i, acc):
            out = make_apply(p, x + 0.0 * i)
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[::997])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    sync(run(params, x))  # compile+warm
    t0 = time.time()
    sync(run(params, x))
    return (time.time() - t0) / n


z0 = jnp.zeros((1, 32, 128, 256), jnp.float32)
cfg = VAE_DECODER.replace(dtype=dtype)

m_full = L.LGUnet(cfg)
p_full = jax.device_put(fast_init(m_full, z0, seed=0))
print(f"full decoder fwd : {loop_time(m_full.apply, p_full, z0)*1e3:8.3f} ms")

cfg_nolg = cfg.replace(lg_depths=(), lg_heads=())
m_nolg = L.LGUnet(cfg_nolg)
p_nolg = jax.device_put(fast_init(m_nolg, z0, seed=0))
print(f"enc+dec only     : {loop_time(m_nolg.apply, p_nolg, z0)*1e3:8.3f} ms")

x_lg = jnp.zeros((1, 32, 64, 1152), dtype)
m_lg = L.LGStack(cfg)
p_lg = jax.device_put(fast_init(m_lg, x_lg, seed=0))
print(f"LG stack 12 blk  : {loop_time(m_lg.apply, p_lg, x_lg)*1e3:8.3f} ms")

m_blk = L.Block(dim=1152, num_heads=6, window_size=(4, 4), shift_size=(0, 0),
                resolution=(32, 64), attn_type="relbias", dtype=dtype)
p_blk = jax.device_put(fast_init(m_blk, x_lg, seed=0))
print(f"1 LG block 4x4   : {loop_time(m_blk.apply, p_blk, x_lg)*1e3:8.3f} ms")

m_attn = L.WindowAttention(dim=1152, num_heads=6, window_size=(4, 4),
                           shift_size=(0, 0), resolution=(32, 64),
                           attn_type="relbias", dtype=dtype)
p_attn = jax.device_put(fast_init(m_attn, x_lg, seed=0))
print(f"1 LG attn 4x4    : {loop_time(m_attn.apply, p_attn, x_lg)*1e3:8.3f} ms")

m_mlp = L.Mlp(dim=1152, hidden=4608, dtype=dtype)
p_mlp = jax.device_put(fast_init(m_mlp, x_lg, seed=0))
print(f"1 LG mlp         : {loop_time(m_mlp.apply, p_mlp, x_lg)*1e3:8.3f} ms")
