"""Headline-bench variance probe (VERDICT r3 item 2).

Replicates bench.bench_vae4dvar_3dvar's one_cycle exactly, then times N
individual cycles through the tunnel: per-cycle wall seconds, median,
mean, spread. Distinguishes tunnel-latency variance from a code
regression (driver BENCH_r03 read 1.486 s vs the README's 1.104 s).

Run from the repo root: python scripts/profiling/prof_bench_variance.py [N]
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from vaevar_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12


def main():
    from vaevar_tpu.da import cost as cost_mod
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

    t_c0 = time.time()
    xb_next = one_cycle(full_bundle)  # warmup/compile
    bench._sync(xb_next)
    print(f"warmup+compile: {time.time() - t_c0:.2f}s", flush=True)

    times = []
    for i in range(N):
        t0 = time.time()
        xb_next = one_cycle(full_bundle._replace(xb=xb_next))
        bench._sync(xb_next)
        dt = time.time() - t0
        times.append(dt)
        print(f"cycle {i:2d}: {dt:.3f}s", flush=True)

    times_s = sorted(times)
    print(f"\nN={N}  median={statistics.median(times):.3f}  "
          f"mean={statistics.mean(times):.3f}  "
          f"min={times_s[0]:.3f}  max={times_s[-1]:.3f}  "
          f"stdev={statistics.stdev(times):.3f}")
    # mean-of-3 windows, what bench.py reports today: show its spread
    m3 = [statistics.mean(times[i:i + 3]) for i in range(0, N - 2)]
    print(f"rolling mean-of-3: min={min(m3):.3f} max={max(m3):.3f}")


if __name__ == "__main__":
    main()
