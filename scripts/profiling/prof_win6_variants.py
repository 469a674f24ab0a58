"""win6 reduced-window segment: remat-variant probe (memory + time).

With the exact reduced window quadratic the segment program no longer
holds full-resolution arrays, so the remat stack (flow/decoder block
remat + one jax.checkpoint per rollout step) may be pure recompute
overhead. Compiles each variant, prints program HBM, and times one
segment dispatch. Usage: python prof_win6_variants.py [variant...]
variants: base (block remat on, step ckpt on), noblock, nostep, none
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
from vaevar_tpu.da.lbfgs import segment_carry_init
from vaevar_tpu.da.solver import VariationalSolver
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init

DA_WIN = 6
cfg = DAConfig()
HW = cfg.grid_hw
dtype = jnp.bfloat16
z0 = jnp.zeros(cfg.latent_shape, jnp.float32)

rr = np.random.default_rng(0)
base = channels.MEAN.reshape(-1, 1, 1) + channels.STD.reshape(
    -1, 1, 1) * rr.normal(size=(69, *HW)).astype(np.float32)
xb = jnp.asarray(base, jnp.float32)
gt = jnp.broadcast_to(jnp.asarray(
    base + 0.3 * channels.STD.reshape(-1, 1, 1)
    * rr.normal(size=(69, *HW)), jnp.float32)[None], (DA_WIN, 69, *HW))
Hm = jnp.asarray(obs_mod.make_obs_mask(cfg.obs_type, DA_WIN, HW, rr))
R = jnp.asarray(obs_mod.build_R(
    obs_mod.obs_error_variance(cfg.obs_std, cfg.modify_tp), None, DA_WIN, HW
))
full_bundle = ObsBundle(xb=xb, yo=gt, H=Hm, R=R)


def sync(x):
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[::9973]))


def run(name, block_remat, step_ckpt, flow_remat=None):
    # flow_remat=None ties the flow's block remat to the decoder's
    # (the round-3 on/off probe); the mixed variants split them — with
    # the step checkpoint on, only ONE rollout step's activations are
    # live during its backward, so dropping a single model's block
    # remat may fit the 12.5 GiB guard while skipping its recompute.
    if flow_remat is None:
        flow_remat = block_remat
    decoder = LGUnet(VAE_DECODER.replace(dtype=dtype, remat=block_remat))
    flow = LGUnet(FLOW_140.replace(dtype=dtype, remat=flow_remat))
    params = {
        "decoder": jax.device_put(fast_init(decoder, z0, seed=0)),
        "flow": jax.device_put(
            fast_init(flow, jnp.zeros((1, 69, 128, 256)), seed=1)),
    }
    c, to_state, parts = cost_mod.make_vae4dvar_cost_window_reduced(
        decoder.apply, flow_apply=flow.apply, da_win=DA_WIN,
        step_checkpoint=step_ckpt,
    )
    solver = VariationalSolver(c, to_state, parts,
                               lbfgs_iters=cfg.lbfgs_iters,
                               history=cfg.lbfgs_history,
                               segment_dispatch=True, iters_per_dispatch=1)
    red = jax.jit(lambda b: cost_mod.reduce_obs_window(b, (128, 256)))(
        full_bundle)
    st = solver.seg_init(z0)
    ev0 = segment_carry_init()
    lowered = jax.jit(solver._segment_raw).lower(z0, st, ev0, red, params)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    try:
        prog_gib = (mem.temp_size_in_bytes + mem.output_size_in_bytes) / 2**30
        print(f"{name}: program hbm {prog_gib:.2f} GiB "
              f"(temp {mem.temp_size_in_bytes / 2**30:.2f})", flush=True)
        # do NOT execute a variant that would OOM the worker: a worker OOM
        # kills the axon tunnel for hours (docs/PERF.md round-2 postmortem).
        # ~2 GB of params/inputs are resident next to the program on a
        # 15.75 GiB v5e chip.
        if prog_gib > 12.5:
            print(f"{name}: SKIPPED execution (would risk worker OOM)",
                  flush=True)
            return
    except AttributeError:
        print(f"{name}: mem {mem}", flush=True)
    # time 10 dispatched iterations (one outer segment's worth). Two
    # warmup calls out of caution (a seg_init/carried-state signature
    # mismatch once caused a second compile here; lbfgs_init_state now
    # strengthens its leaf dtypes so both calls share one program).
    x, s, ev = solver.segment(z0, st, ev0, red, params)
    x, s, ev = solver.segment(x, s, ev, red, params)
    sync(x)
    t0 = time.time()
    x, s2, ev = z0, st, ev0
    for _ in range(10):
        x, s2, ev = solver.segment(x, s2, ev, red, params)
    sync(x)
    print(f"{name}: 10 iters {time.time() - t0:.2f}s", flush=True)


VARIANTS = {
    "base": (True, True),
    "noblock": (False, True),
    "nostep": (True, False),
    "none": (False, False),
    # mixed: (decoder block remat, step ckpt, flow block remat)
    "flowfull": (True, True, False),   # flow blocks keep activations
    "decfull": (False, True, True),    # decoder blocks keep activations
}
for v in (sys.argv[1:] or list(VARIANTS)):
    run(v, *VARIANTS[v])
