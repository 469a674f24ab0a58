"""Batch-scaling of the win6 cost eval: the latency-amortization probe
VERDICT r4 item 8 asked for before accepting the 13.5% MFU floor.

The enc/dec stages are latency-bound (C=96 matmuls at a ~80 us floor,
docs/PERF.md matmul table) and every production solve runs them at
B=1 — one latent per cost eval. If a B=K vmapped eval costs much less
than K times the B=1 eval, the architecture floor is NOT a wall-clock
floor: K speculative linesearch probe points (or K ensemble members /
K concurrent cycle states) can share one dispatch.

Stages:
  1. decoder-only forward, B = 1/2/4/8 (vmap over z), ms per SAMPLE
  2. win6 reduced cost forward, same sweep
  3. win6 reduced cost value_and_grad (the linesearch probe op in the
     grind regime is a forward; the accepted-step op is a vag)

Methodology: in-jit chained repetition, one sync per batch (bench._sync);
every program memory_analysis()-gated before execution (house rule).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from vaevar_tpu.da import cost as cost_mod  # noqa: E402

DA_WIN = 6
HW = (128, 256)
BATCHES = (1, 2, 4, 8)
N_CHAIN = 8


def _chain(body, n):
    def run(z, bu, pa):
        def step(i, zz):
            out = body(zz, bu, pa)
            return zz * 0.999 + 1e-6 * out
        return jax.lax.fori_loop(0, n, step, z)
    return jax.jit(run)


def _bench_batched(name, body_of_b, z1, bundle, params):
    print(f"== {name} ==")
    base = None
    for b in BATCHES:
        zb = jnp.broadcast_to(z1, (b, *z1.shape)) + 1e-3 * jnp.arange(
            b, dtype=jnp.float32
        ).reshape(b, 1, 1, 1, 1)
        f = _chain(body_of_b, N_CHAIN)
        compiled = f.lower(zb, bundle, params).compile()
        if not bench._guard_hbm(compiled, f"{name}_b{b}"):
            continue
        r = compiled(zb, bundle, params)
        bench._sync(r[0])
        t0 = time.time()
        r = compiled(r, bundle, params)
        bench._sync(r[0])
        dt = (time.time() - t0) / N_CHAIN
        per = dt / b * 1e3
        if base is None:
            base = dt
        print(f"  B={b}: {dt*1e3:7.1f} ms/eval  {per:7.1f} ms/sample  "
              f"scaling x{dt/base:.2f} for x{b} work")


def main():
    bench.wait_for_backend()
    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()

    cfg, decoder, flow, _integrate, params, full_bundle = bench._setup(
        da_win=DA_WIN, hw=HW
    )
    reduce = jax.jit(lambda b: cost_mod.reduce_obs_window(b, HW))
    bundle = reduce(full_bundle)
    c, _to_state, _parts = cost_mod.make_vae4dvar_cost_window_reduced(
        decoder.apply, flow_apply=flow.apply, da_win=DA_WIN,
    )
    z1 = jnp.zeros(cfg.latent_shape, jnp.float32)

    picks = sys.argv[1:] or ["decoder", "cost", "vag"]

    if "decoder" in picks:
        def body(zb, bu, pa):
            y = jax.vmap(lambda q: decoder.apply(pa["decoder"], q))(zb)
            s = jnp.sum(y.astype(jnp.float32), axis=(1, 2, 3, 4))
            return s.reshape(-1, 1, 1, 1, 1)

        _bench_batched("decoder fwd", body, z1, bundle, params)

    if "cost" in picks:
        def body_c(zb, bu, pa):
            s = jax.vmap(lambda q: c(q, bu, pa))(zb)
            return s.reshape(-1, 1, 1, 1, 1)

        _bench_batched("win6 reduced cost fwd", body_c, z1, bundle, params)

    if "vag" in picks:
        def body_g(zb, bu, pa):
            def one(q):
                v, g = jax.value_and_grad(lambda t: c(t, bu, pa))(q)
                return v + 1e-9 * jnp.sum(g[0, ::7, ::11, ::13])
            s = jax.vmap(one)(zb)
            return s.reshape(-1, 1, 1, 1, 1)

        _bench_batched("win6 reduced cost vag", body_g, z1, bundle, params)


if __name__ == "__main__":
    main()
