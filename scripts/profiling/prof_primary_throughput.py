"""Primary-bench throughput decomposition (VERDICT r3 item 2).

Three measurements of the same production cycle (reduce -> fused solve ->
integrate):
  a) per-cycle host-sync timing (what bench.py r3 did) — includes one
     tunnel RTT per cycle;
  b) chained N cycles, ONE final sync — the pipelined steady-state
     throughput a real cycled run achieves (the cycler's host pulls are
     tiny scores that overlap the next dispatch);
  c) per-segment iteration/eval counts — whether the torch max_eval
     budget (18c0e00) changed the trajectory length vs round-3's 1.104.

Run from repo root: python scripts/profiling/prof_primary_throughput.py
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import bench  # noqa: E402
from vaevar_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def main():
    from vaevar_tpu.da import cost as cost_mod
    from vaevar_tpu.da.lbfgs import segment_carry_init
    from vaevar_tpu.da.solver import VariationalSolver

    cfg, decoder, _flow, integrate, params, full_bundle = bench._setup(da_win=1)
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
    reduce = jax.jit(lambda b: cost_mod.reduce_obs(b, (128, 256)))
    c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
    solver = VariationalSolver(c, to_state, parts,
                               lbfgs_iters=cfg.lbfgs_iters,
                               history=cfg.lbfgs_history)

    def one_cycle(full):
        bundle = reduce(full)
        _, xa, _ = solver.solve(z0, bundle, params, nit=cfg.nit, gt=None,
                                verbose=False)
        return integrate(params["flow"], xa)

    xb = one_cycle(full_bundle)
    bench._sync(xb)

    # (c) per-segment n_iters / evals through the segmented path
    st = solver.seg_init(z0)
    x = z0
    bundle = reduce(full_bundle)
    print("per-segment trajectory (budget = 12 evals):")
    for kk in range(cfg.nit):
        carry = segment_carry_init()
        x, st, carry = solver.segment(x, st, carry, bundle, params)
        it = int(optax.tree_utils.tree_get(st, "count"))
        print(f"  seg {kk}: cum iters {it}, evals {int(carry.evals)}")

    # (a) per-cycle sync (bench.py r3 style), 6 cycles
    times = []
    for _ in range(6):
        t0 = time.time()
        xb = one_cycle(full_bundle._replace(xb=xb))
        bench._sync(xb)
        times.append(time.time() - t0)
    print(f"(a) per-cycle sync: median {statistics.median(times):.3f} "
          f"min {min(times):.3f} max {max(times):.3f}")

    # (b) chained, one sync
    for n in (4, 10):
        t0 = time.time()
        for _ in range(n):
            xb = one_cycle(full_bundle._replace(xb=xb))
        bench._sync(xb)
        dt = (time.time() - t0) / n
        print(f"(b) chained x{n}, one sync: {dt:.3f} s/cycle")


if __name__ == "__main__":
    main()
