"""Measure forward-mode (jvp) vs reverse-mode linesearch probes on the
win6 window cost, plus the eval-count decomposition of the 1.4deg
north-star cycle (VERDICT r4 item 3).

Stages (each guarded by memory_analysis before execution — house rule):
  1. primitive costs at the win6 reduced cost, 128x256 grid: forward,
     jvp (value+slope), value_and_grad — in-jit chained repetition, one
     sync per batch (tunnel methodology, docs/PERF.md).
  2. full win6@1.4deg cycle with linesearch="zoom" vs "jvp-zoom"
     (fused window dispatch, config of record otherwise), n cycles each.
  3. eval/iteration decomposition: segmented solve, per-segment charged
     evals + iterations (the floor = evals x per-eval device time).
  4. the PRIMARY 3D-Var cycle with both linesearches (neutrality check).

Usage: python scripts/profiling/prof_jvp_linesearch.py [stage ...]
(default: all stages).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench harness: _setup, _sync, guards)
from vaevar_tpu.da import cost as cost_mod  # noqa: E402
from vaevar_tpu.da.lbfgs import segment_carry_init  # noqa: E402
from vaevar_tpu.da.solver import (  # noqa: E402
    VariationalSolver,
    window_dispatch_kwargs,
)

DA_WIN = 6
HW = (128, 256)


def _mk(linesearch="zoom", dispatch="fused"):
    cfg, decoder, flow, integrate, params, full_bundle = bench._setup(
        da_win=DA_WIN, hw=HW
    )
    reduce = jax.jit(lambda b: cost_mod.reduce_obs_window(b, (128, 256)))
    c, to_state, parts = cost_mod.make_vae4dvar_cost_window_reduced(
        decoder.apply, flow_apply=flow.apply, da_win=DA_WIN,
    )
    solver = VariationalSolver(
        c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
        history=cfg.lbfgs_history, linesearch=linesearch,
        **window_dispatch_kwargs(dispatch),
    )
    return cfg, c, solver, reduce, integrate, params, full_bundle


def stage_primitives():
    print("== stage 1: probe primitives (win6 reduced cost, 128x256) ==")
    cfg, c, _solver, reduce, _integrate, params, full_bundle = _mk()
    bundle = reduce(full_bundle)
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)

    # house rule: bundle/params are traced ARGUMENTS of the jitted chain,
    # never closed over (413 compile-request + constant-folding blowups)
    def chain(body, n):
        def run(z, bu, pa):
            fun = lambda q: c(q, bu, pa)  # noqa: E731

            def step(i, zz):
                out = body(fun, zz)
                # fold a scalar back in to chain the dependency
                return zz * 0.999 + 1e-6 * out
            return jax.lax.fori_loop(0, n, step, z)
        return jax.jit(run)

    n = 8
    variants = {
        "forward": lambda fun, zz: fun(zz),
        "jvp(value+slope)": lambda fun, zz: jax.jvp(fun, (zz,), (zz,))[1],
    }

    # value_and_grad variant: chain on the value; grad is computed too
    def vag_body(fun, zz):
        v, g = jax.value_and_grad(fun)(zz)
        return v + 1e-9 * jnp.sum(g[0, ::7, ::11, ::13])

    variants["value_and_grad"] = vag_body

    out = {}
    for name, body in variants.items():
        f = chain(body, n)
        compiled = f.lower(z0, bundle, params).compile()
        if not bench._guard_hbm(compiled, f"prim_{name}"):
            continue
        r = compiled(z0, bundle, params)
        bench._sync(r)
        t0 = time.time()
        r = compiled(r, bundle, params)
        bench._sync(r)
        dt = (time.time() - t0) / n
        out[name] = dt
        print(f"  {name}: {dt*1e3:.1f} ms/eval")
    if "value_and_grad" in out and "jvp(value+slope)" in out:
        print(f"  jvp/vag ratio: "
              f"{out['jvp(value+slope)'] / out['value_and_grad']:.2f}")
    return out


def _cycle_fn(solver, reduce, integrate, params, cfg):
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)

    def one_cycle(full):
        bundle = reduce(full)
        _, xa, _ = solver.solve(z0, bundle, params, nit=cfg.nit, gt=None,
                                verbose=False)
        return integrate(params["flow"], xa)

    return one_cycle


def stage_cycle():
    print("== stage 2: win6@1.4deg cycle, zoom vs jvp-zoom ==")
    for ls in ("zoom", "jvp-zoom"):
        cfg, _c, solver, reduce, integrate, params, full_bundle = _mk(ls)
        one_cycle = _cycle_fn(solver, reduce, integrate, params, cfg)
        # guard the fused program before executing (house rule)
        bundle = reduce(full_bundle)
        z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
        fused = solver.fused_solve(cfg.nit)
        compiled = jax.jit(fused).lower(z0, bundle, params).compile()
        if not bench._guard_hbm(compiled, f"win6_140_{ls}"):
            continue
        dt = bench._time_cycles(one_cycle, full_bundle, n=5, median=True)
        print(f"  {ls}: {dt:.3f} s/cycle "
              f"(month: {124 * dt:.0f} s, budget 600)")


def stage_cycle_seg():
    """zoom vs jvp-zoom at SEGMENT dispatch (one program per nit segment).

    Exists because the FUSED jvp-zoom program wedged the remote compile
    service for >75 min on 2026-08-21 (the zoom fused program compiles in
    ~10 min): until that is understood, segment dispatch is the
    practical granularity for jvp-zoom, and the apples-to-apples
    comparison is both linesearches at the SAME granularity."""
    print("== stage 2b: win6@1.4deg cycle at SEGMENT dispatch ==")
    for ls in ("zoom", "jvp-zoom"):
        cfg, _c, solver, reduce, integrate, params, full_bundle = _mk(
            ls, dispatch="segment"
        )
        one_cycle = _cycle_fn(solver, reduce, integrate, params, cfg)
        bundle = reduce(full_bundle)
        z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
        st0 = solver.seg_init(z0)
        compiled = jax.jit(solver._segment_raw).lower(
            z0, st0, segment_carry_init(), bundle, params
        ).compile()
        if not bench._guard_hbm(compiled, f"win6_140_seg_{ls}"):
            continue
        dt = bench._time_cycles(one_cycle, full_bundle, n=5, median=True)
        print(f"  {ls}@segment: {dt:.3f} s/cycle "
              f"(month: {124 * dt:.0f} s, budget 600)")


def stage_decomposition():
    print("== stage 3: eval decomposition (segmented win6@1.4deg) ==")
    cfg, _c, solver, reduce, integrate, params, full_bundle = _mk(
        "zoom", dispatch="segment"
    )
    bundle = reduce(full_bundle)
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
    st0 = solver.seg_init(z0)
    ev0 = segment_carry_init()
    compiled = jax.jit(solver._segment_raw).lower(
        z0, st0, ev0, bundle, params
    ).compile()
    if not bench._guard_hbm(compiled, "win6_140_segment"):
        return
    x, st = z0, st0
    # warmup segment for compile
    _ = solver.segment(x, st, ev0, bundle, params)
    bench._sync(_[0])
    total_e, total_t = 0, 0.0
    x, st = z0, solver.seg_init(z0)
    for kk in range(cfg.nit):
        carry = segment_carry_init()
        t0 = time.time()
        x, st, carry = solver.segment(x, st, carry, bundle, params)
        bench._sync(x)
        dt = time.time() - t0
        ev = int(carry.evals)
        import optax

        it = int(optax.tree_utils.tree_get(st, "count"))
        total_e += ev
        total_t += dt
        print(f"  segment {kk}: {ev} evals, cum iters {it}, {dt:.2f} s "
              f"({dt / max(ev, 1) * 1e3:.0f} ms/eval)")
    print(f"  TOTAL: {total_e} evals, {total_t:.2f} s "
          f"=> {total_t / max(total_e, 1) * 1e3:.0f} ms/eval")


def stage_primary():
    print("== stage 4: PRIMARY 3D-Var neutrality, zoom vs jvp-zoom ==")
    from vaevar_tpu.da.solver import VariationalSolver as VS

    for ls in ("zoom", "jvp-zoom"):
        cfg, decoder, _flow, integrate, params, full_bundle = bench._setup(
            da_win=1
        )
        z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
        reduce = jax.jit(lambda b: cost_mod.reduce_obs(b, (128, 256)))
        c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(
            decoder.apply)
        solver = VS(c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
                    history=cfg.lbfgs_history, linesearch=ls)
        one_cycle = _cycle_fn(solver, reduce, integrate, params, cfg)
        dt = bench._time_cycles(one_cycle, full_bundle, n=8, median=True)
        print(f"  {ls}: {dt:.3f} s/cycle")


STAGES = {
    "primitives": stage_primitives,
    "cycle": stage_cycle,
    "cycle-seg": stage_cycle_seg,
    "decomposition": stage_decomposition,
    "primary": stage_primary,
}


if __name__ == "__main__":
    bench.wait_for_backend()
    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()
    picks = sys.argv[1:] or list(STAGES)
    for p in picks:
        STAGES[p]()
