"""Decompose the forecast train step (bench round-5: 14.4 s/step at b2,
~100x the 19.5 ms flow forward — find where it goes).

Stages: model fwd (b2), fwd+bwd loss grad, full train step; each in-jit
chained (one sync per batch), memory-gated before execution.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from vaevar_tpu.config import FLOW_140  # noqa: E402
from vaevar_tpu.models.lgunet import LGUnet  # noqa: E402
from vaevar_tpu.train.forecast_trainer import (  # noqa: E402
    make_forecast_train_step,
)
from vaevar_tpu.utils.fast_init import fast_init  # noqa: E402


def main():
    bench.wait_for_backend()
    hw, batch = (128, 256), 2
    cfg = FLOW_140.replace(dtype=jnp.bfloat16, remat=True)
    model = LGUnet(cfg)
    params = jax.device_put(fast_init(model, jnp.zeros((1, 69, *hw)), seed=0))
    rr = np.random.default_rng(0)
    inp = jnp.asarray(rr.normal(size=(batch, 69, *hw)), jnp.float32)
    tars = [jnp.asarray(rr.normal(size=(batch, 69, *hw)), jnp.float32)]

    n = 8

    def chain_fwd(p, x):
        def body(i, xx):
            y = model.apply(p, xx)
            return xx * 0.999 + 1e-6 * y[:, :69]
        return jax.lax.fori_loop(0, n, body, x)

    f = jax.jit(chain_fwd).lower(params, inp).compile()
    if bench._guard_hbm(f, "fwd_b2"):
        r = f(params, inp)
        bench._sync(r[0])
        t0 = time.time()
        r = f(params, r)
        bench._sync(r[0])
        print(f"fwd b2: {(time.time()-t0)/n*1e3:.1f} ms")

    out_c = 2 * sum(cfg.inchans_list)
    init_fn, train_step = make_forecast_train_step(
        model.apply, loss_type="Possloss", out_shape=(out_c, *hw)
    )
    trainable, opt_state = init_fn(params)

    step = jax.jit(train_step, donate_argnums=(0, 1))
    compiled = step.lower(trainable, opt_state, inp, tars).compile()
    if not bench._guard_hbm(compiled, "train_step"):
        return
    trainable, opt_state, loss = compiled(trainable, opt_state, inp, tars)
    float(loss)
    t0 = time.time()
    for _ in range(5):
        trainable, opt_state, loss = compiled(trainable, opt_state, inp, tars)
    float(loss)
    bench._tree_sync(trainable)
    print(f"train step: {(time.time()-t0)/5:.3f} s/step")


if __name__ == "__main__":
    main()
