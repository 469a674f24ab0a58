"""win6 reduced-window solve: dispatch-granularity probe (+1.4deg anomaly).

The per-iteration segment dispatch (segment_dispatch=True,
iters_per_dispatch=1) was adopted when the window cost still held
full-resolution arrays and a fused solve ran for many minutes on-device
(docs/PERF.md watchdog postmortem). With the exact reduced quadratic the
WHOLE 40-iteration solve is ~18 s of device time — far under the 1-2 min
watchdog ceiling — so the 40 per-iteration tunnel round-trips may now be
pure overhead. Times three granularities of the identical optimizer
trajectory:

  seg1   one quasi-Newton iteration per dispatched program (current default)
  seg10  one outer segment (10 iterations) per program
  fused  the whole Nit x 10 solve as ONE program (memory-checked first)

and, because the round-3 bench measured the 1.4deg north-star config at
~222 s/cycle vs 17.5 s at 0.25deg for the SAME inner solve, it also
phase-times a 1.4deg-bundle cycle (reduce / solve / integrate separately).

Usage: python prof_win6_dispatch.py [seg1|seg10|fused|anomaly ...]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu.utils import compile_cache

compile_cache.enable()

from vaevar_tpu import channels
from vaevar_tpu.config import DAConfig, FLOW_140, VAE_DECODER
from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.dynamics import make_integrate
from vaevar_tpu.da.lbfgs import segment_carry_init
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

DA_WIN = 6
dtype = jnp.bfloat16


def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))


def make_bundle(HW):
    rr = np.random.default_rng(0)
    base = channels.MEAN.reshape(-1, 1, 1) + channels.STD.reshape(
        -1, 1, 1) * rr.normal(size=(69, *HW)).astype(np.float32)
    xb = jnp.asarray(base, jnp.float32)
    gt = jnp.broadcast_to(jnp.asarray(
        base + 0.3 * channels.STD.reshape(-1, 1, 1)
        * rr.normal(size=(69, *HW)), jnp.float32)[None], (DA_WIN, 69, *HW))
    cfg = DAConfig()
    Hm = jnp.asarray(obs_mod.make_obs_mask(cfg.obs_type, DA_WIN, HW, rr))
    R = jnp.asarray(obs_mod.build_R(
        obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp), None,
        DA_WIN, HW))
    return cfg, ObsBundle(xb=xb, yo=gt, H=Hm, R=R)


def make_models():
    # base remat variant (block remat + step ckpt on): the shipped default
    # until prof_win6_variants decides otherwise
    decoder = LGUnet(VAE_DECODER.replace(dtype=dtype, remat=True))
    flow = LGUnet(FLOW_140.replace(dtype=dtype, remat=True))
    z0 = jnp.zeros(DAConfig().latent_shape, jnp.float32)
    params = {
        "decoder": jax.device_put(fast_init(decoder, z0, seed=0)),
        "flow": jax.device_put(
            fast_init(flow, jnp.zeros((1, 69, 128, 256)), seed=1)),
    }
    c, to_state, parts = cost_mod.make_vae4dvar_cost_window_reduced(
        decoder.apply, flow_apply=flow.apply, da_win=DA_WIN,
    )
    return z0, params, flow, (c, to_state, parts)


def timed_solve(solver, z0, red, params, cfg, label, n=2):
    _, xa, _ = solver.solve(z0, red, params, nit=cfg.nit, gt=None,
                            verbose=False)  # warmup/compile
    sync(xa)
    t0 = time.time()
    for _ in range(n):
        _, xa, _ = solver.solve(z0, red, params, nit=cfg.nit, gt=None,
                                verbose=False)
        sync(xa)
    print(f"{label}: solve {(time.time() - t0) / n:.2f}s "
          f"(Nit={cfg.nit} x {cfg.lbfgs_iters} iters)", flush=True)


def run_granularity(which):
    cfg, full = make_bundle((721, 1440))
    z0, params, _flow, (c, to_state, parts) = make_models()
    red = jax.jit(lambda b: cost_mod.reduce_obs_window(b, (128, 256)))(full)

    if which in ("seg1", "seg10"):
        ipd = 1 if which == "seg1" else cfg.lbfgs_iters
        solver = VariationalSolver(c, to_state, parts,
                                   lbfgs_iters=cfg.lbfgs_iters,
                                   history=cfg.lbfgs_history,
                                   segment_dispatch=True,
                                   iters_per_dispatch=ipd)
        # memory-check the segment program before executing (house rule)
        st = solver.seg_init(z0)
        ev0 = segment_carry_init()
        comp = jax.jit(solver._segment_raw).lower(z0, st, ev0, red, params
                                                  ).compile()
        mem = comp.memory_analysis()
        gib = (mem.temp_size_in_bytes + mem.output_size_in_bytes) / 2**30
        print(f"{which}: segment program hbm {gib:.2f} GiB", flush=True)
        if gib > 12.5:
            print(f"{which}: SKIPPED (worker-OOM risk)", flush=True)
            return
        timed_solve(solver, z0, red, params, cfg, which)
    else:  # fused
        solver = VariationalSolver(c, to_state, parts,
                                   lbfgs_iters=cfg.lbfgs_iters,
                                   history=cfg.lbfgs_history)
        comp = solver.fused_solve(cfg.nit).lower(z0, red, params).compile()
        mem = comp.memory_analysis()
        gib = (mem.temp_size_in_bytes + mem.output_size_in_bytes) / 2**30
        print(f"fused: program hbm {gib:.2f} GiB", flush=True)
        if gib > 12.5:
            print("fused: SKIPPED (worker-OOM risk)", flush=True)
            return
        timed_solve(solver, z0, red, params, cfg, "fused")


def run_anomaly():
    """Phase-time one 1.4deg north-star cycle: reduce / solve / integrate."""
    cfg, full = make_bundle((128, 256))
    z0, params, flow, (c, to_state, parts) = make_models()
    reduce = jax.jit(lambda b: cost_mod.reduce_obs_window(b, (128, 256)))
    solver = VariationalSolver(c, to_state, parts,
                               lbfgs_iters=cfg.lbfgs_iters,
                               history=cfg.lbfgs_history,
                               segment_dispatch=True, iters_per_dispatch=1)
    integrate = jax.jit(
        lambda p, x: make_integrate(flow.apply, (128, 256))(p, x, 1, True))

    red = reduce(full)
    sync(red.xb)
    _, xa, _ = solver.solve(z0, red, params, nit=cfg.nit, gt=None,
                            verbose=False)
    sync(xa)
    sync(integrate(params["flow"], xa))  # all compiled

    t0 = time.time()
    red = reduce(full)
    sync(red.xb)
    t_red = time.time() - t0

    # per-segment dispatch timing with a sync after EVERY dispatch (devious
    # but diagnostic: isolates per-dispatch tunnel latency from device time)
    st = solver.seg_init(z0)
    x = z0
    ev = segment_carry_init()
    t0 = time.time()
    x, st, ev = solver.segment(x, st, ev, red, params)
    sync(x)
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(9):
        x, st, ev = solver.segment(x, st, ev, red, params)
    sync(x)
    t_nine = time.time() - t0
    print(f"anomaly(1.4deg): reduce {t_red:.3f}s, first segment "
          f"{t_first:.2f}s, next 9 segments {t_nine:.2f}s "
          f"({t_nine / 9:.2f}s/iter)", flush=True)

    t0 = time.time()
    _, xa, _ = solver.solve(z0, red, params, nit=cfg.nit, gt=None,
                            verbose=False)
    sync(xa)
    t_solve = time.time() - t0
    t0 = time.time()
    sync(integrate(params["flow"], xa))
    t_int = time.time() - t0
    print(f"anomaly(1.4deg): full solve {t_solve:.2f}s, integrate "
          f"{t_int:.2f}s", flush=True)


for v in (sys.argv[1:] or ["seg1", "seg10", "fused", "anomaly"]):
    if v == "anomaly":
        run_anomaly()
    else:
        run_granularity(v)
