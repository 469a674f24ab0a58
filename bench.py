"""Headline benchmark: seconds per cycled-DA step, vae4dvar config of record.

Reproduces the reference launch configuration (da_4dvar_script.sh:14 /
BASELINE.md): da_mode=vae4dvar, da_win=1 (3D-Var limit), Nit=4 outer
iterations x 10 strong-Wolfe L-BFGS steps, latent z (1, 32, 128, 256),
VAE decoder at the parameters0_old geometry, 721x1440 analysis grid,
column_random_0001 observations, modify_tp=2 obs errors — then advances
the state 6h with the 1.4deg flow model. Weights are seeded-random (the
reference's checkpoints are not distributed with the repo); the timing
exercises the exact compute graph of a production cycle.

Baseline: the reference publishes no numbers (BASELINE.json "published": {}).
vs_baseline is measured against the BASELINE.md north-star budget of a
1-month cycled run on v5e-8 in <10 min, i.e. 600 s / 124 cycles = 4.84 s
per cycle; vs_baseline = budget / measured (>1 means faster than target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BUDGET_S_PER_CYCLE = 600.0 / 124.0  # v5e-8 north star


def main():
    from vaevar_tpu.utils import compile_cache

    compile_cache.enable()

    from vaevar_tpu import channels
    from vaevar_tpu.config import DAConfig, FLOW_140, VAE_DECODER
    from vaevar_tpu.da import cost as cost_mod, obs as obs_mod
    from vaevar_tpu.da.cost import ObsBundle
    from vaevar_tpu.da.dynamics import make_integrate
    from vaevar_tpu.da.solver import VariationalSolver
    from vaevar_tpu.models.lgunet import LGUnet

    cfg = DAConfig()  # config of record
    HW = cfg.grid_hw  # (721, 1440)
    dtype = jnp.bfloat16

    from vaevar_tpu.utils.fast_init import fast_init

    dec_cfg = VAE_DECODER.replace(dtype=dtype)
    decoder = LGUnet(dec_cfg)
    z0 = jnp.zeros(cfg.latent_shape, jnp.float32)
    dec_params = jax.device_put(fast_init(decoder, z0, seed=0))

    flow_cfg = FLOW_140.replace(dtype=dtype)
    flow = LGUnet(flow_cfg)
    flow_params = jax.device_put(
        fast_init(flow, jnp.zeros((1, 69, 128, 256)), seed=1)
    )
    integrate = jax.jit(
        lambda p, x: make_integrate(flow.apply, (128, 256))(p, x, 1, True)
    )
    params = {"decoder": dec_params, "flow": flow_params}

    # synthetic cycle data (host-side, outside the timed region)
    rr = np.random.default_rng(0)
    base = channels.MEAN.reshape(-1, 1, 1) + channels.STD.reshape(
        -1, 1, 1
    ) * rr.normal(size=(69, *HW)).astype(np.float32)
    xb = jnp.asarray(base, jnp.float32)
    gt = jnp.asarray(
        base + 0.3 * channels.STD.reshape(-1, 1, 1) * rr.normal(size=(69, *HW)),
        jnp.float32,
    )[None]
    Hm = jnp.asarray(
        obs_mod.make_obs_mask(cfg.obs_type, cfg.da_win, HW, rr)
    )
    R = jnp.asarray(
        obs_mod.build_R(
            obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp), None,
            cfg.da_win, HW,
        )
    )
    full_bundle = ObsBundle(xb=xb, yo=gt, H=Hm, R=R)
    reduce = jax.jit(lambda b: cost_mod.reduce_obs(b, (128, 256)))

    c, to_state, parts = cost_mod.make_vae4dvar_cost_reduced(decoder.apply)
    solver = VariationalSolver(c, to_state, parts, lbfgs_iters=cfg.lbfgs_iters,
                               history=cfg.lbfgs_history)

    def one_cycle(full):
        # per-cycle obs reduction onto the solver grid (exact, cost.ReducedObs)
        bundle = reduce(full)
        _, xa, _ = solver.solve(z0, bundle, params, nit=cfg.nit, gt=None,
                                verbose=False)
        xb_next = integrate(params["flow"], xa)
        return xb_next

    # forces completion even where block_until_ready returns early (the
    # remote-TPU tunnel): a host read cannot happen before the value exists
    def sync(x):
        return float(jnp.sum(x[0, ::97, ::101]))

    # warmup (compile)
    xb_next = one_cycle(full_bundle)
    sync(xb_next)

    # timed cycles
    n = 3
    t0 = time.time()
    for _ in range(n):
        xb_next = one_cycle(full_bundle._replace(xb=xb_next))
        sync(xb_next)
    dt = (time.time() - t0) / n

    print(
        json.dumps(
            {
                "metric": "sec_per_da_cycle_vae4dvar_3dvar_721x1440",
                "value": round(dt, 3),
                "unit": "s",
                "vs_baseline": round(BUDGET_S_PER_CYCLE / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
