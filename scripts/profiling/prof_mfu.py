"""End-to-end MFU of the production decoder/flow forwards (VERDICT r3
item 4): XLA-reported FLOPs / measured device time / v5e bf16 peak.

Times with in-jit chained repetition (one host sync for n iterations) so
the ~33 ms tunnel sync does not pollute sub-100ms measurements.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vaevar_tpu.utils import compile_cache

compile_cache.enable()

from vaevar_tpu.config import FLOW_140, VAE_DECODER  # noqa: E402
from vaevar_tpu.models.lgunet import LGUnet  # noqa: E402
from vaevar_tpu.utils.fast_init import fast_init  # noqa: E402

V5E_BF16_PEAK = 197e12  # TPU v5e: 197 bf16 TFLOP/s per chip


def mfu(name, model, x0, seed, n=50):
    params = jax.device_put(fast_init(model, x0, seed=seed))

    def fwd(p, x):
        return model.apply(p, x)

    # FLOPs from the compiled module
    comp = jax.jit(fwd).lower(params, x0).compile()
    try:
        flops = comp.cost_analysis()["flops"]
    except (KeyError, TypeError):
        flops = float("nan")

    def chain(p, x):
        def body(i, x):
            y = model.apply(p, x)[:, : x.shape[1]]
            return y * (1.0 + 1e-9 * i)  # keep the chain data-dependent
        return jax.lax.fori_loop(0, n, body, x)

    cj = jax.jit(chain)
    y = cj(params, x0)
    _ = float(jnp.sum(y[0, ::7, ::11, ::13]))
    t0 = time.time()
    y = cj(params, x0)
    _ = float(jnp.sum(y[0, ::7, ::11, ::13]))
    dt = (time.time() - t0) / n
    print(f"{name}: fwd {dt*1e3:.2f} ms, {flops/1e9:.1f} GFLOP, "
          f"{flops/dt/1e12:.1f} TF/s, MFU {flops/dt/V5E_BF16_PEAK*100:.1f}%",
          flush=True)


def main():
    dtype = jnp.bfloat16
    dec = LGUnet(VAE_DECODER.replace(dtype=dtype))
    mfu("decoder fwd (215.9M, z 32x128x256)", dec,
        jnp.zeros((1, 32, 128, 256), jnp.float32), seed=0)
    flow = LGUnet(FLOW_140.replace(dtype=dtype))
    mfu("flow fwd (FLOW_140, 69x128x256)", flow,
        jnp.zeros((1, 69, 128, 256), jnp.float32), seed=1)


if __name__ == "__main__":
    main()
