"""VAE training on NMC background-error samples.

Rebuilds the reference `vae_nmc_model.train` (model/model.py:571-659, minus
the leftover debug crash at :610-614): per batch of 5 six-hourly normalized
frames, the error sample is

    err = (frame[4] - fengwu^4(frame[0])) / err_std,  downsampled to the
    latent grid (nearest),

and the VAE minimizes recon/(2 sigma^2) + KLD with Adam (lr 1e-4).

Data parallelism is mesh-native: the train step is jitted with the batch
sharded over the "dp" axis and params replicated; XLA inserts the gradient
all-reduce over ICI (no DDP wrapper, no explicit psum). The reference's
`check_ddp_consistency` becomes a cheap replicated-params checksum.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaevar_tpu import channels
from vaevar_tpu.models.vae import VAE, elbo_loss
from vaevar_tpu.ops.interp import resize_nearest


def nmc_error_sample(frames, fengwu_apply, fengwu_params, latent_hw,
                     nmc_steps: int = 4, err_std=None):
    """frames: (B, 5, C, H, W) normalized. Returns (B, C, *latent_hw)."""
    C = frames.shape[2]
    pred = frames[:, 0]
    for _ in range(nmc_steps):
        pred = jax.lax.stop_gradient(fengwu_apply(fengwu_params, pred)[:, :C])
    if err_std is None:
        err_std = channels.ERR_STD[:C]
    err_std = jnp.asarray(err_std, jnp.float32).reshape(1, -1, 1, 1)
    err = (frames[:, nmc_steps] - pred) / err_std
    return resize_nearest(err, latent_hw)


def make_vae_train_step(
    vae: VAE,
    fengwu_apply: Callable,
    sigma: float = 2.0,
    lr: float = 1e-4,
    latent_hw=(128, 256),
    nmc_steps: int = 4,
    err_std=None,
):
    """Returns (init_fn, train_step). train_step is jittable/shardable."""
    opt = optax.adam(lr)

    def init_fn(rng, sample_frames, fengwu_params, params=None):
        """With `params`, skips the data-dependent shape init and returns
        a fresh optimizer state for them (warm starts) — keeping the
        opt_state structure owned by this module's optimizer."""
        if params is None:
            err = nmc_error_sample(
                sample_frames, fengwu_apply, fengwu_params, latent_hw,
                nmc_steps, err_std,
            )
            params = vae.init(rng, err, jax.random.PRNGKey(0))
        return params, opt.init(params)

    def loss_fn(params, err, rng):
        recon, mu, logvar = vae.apply(params, err, rng)
        total, sse, kld = elbo_loss(recon, err, mu, logvar, sigma)
        return total, (sse, kld)

    def train_step(params, opt_state, fengwu_params, frames, rng):
        err = nmc_error_sample(
            frames, fengwu_apply, fengwu_params, latent_hw, nmc_steps, err_std
        )
        (total, (sse, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, err, rng
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": total, "rec_sse": sse, "kld": kld}
        return params, opt_state, metrics

    return init_fn, train_step


def train_vae(
    vae: VAE,
    fengwu_apply: Callable,
    fengwu_params,
    data_iter: Iterable | Callable,
    epochs: int = 1,
    steps_per_epoch: int | None = None,
    sigma: float = 2.0,
    lr: float = 1e-4,
    latent_hw=(128, 256),
    nmc_steps: int = 4,
    seed: int = 0,
    log_every: int = 10,
    logger=print,
    sample_at_epoch_end: bool = True,
    mesh=None,
    ckpt_dir: str | None = None,
    resume: bool = True,
    init_params=None,
    err_std=None,
):
    """Full training loop, streaming host batches.

    `data_iter` is either a plain iterable (reused every epoch) or a
    factory `epoch -> iterable` — pass the factory for per-epoch
    reshuffling (reference DistributedSampler.set_epoch,
    utils/builder.py:133). With `mesh`, batches are sharded over the
    "dp" axis (+ spatial axes if present) and params/opt state are
    replicated — XLA inserts the gradient all-reduce. With `ckpt_dir`,
    the full train state {params, opt_state, epoch, metric_best} is
    saved at every epoch end as checkpoint_latest (+ checkpoint_best on
    improvement) and training RESUMES from checkpoint_latest when one
    exists (reference model/model.py:313-382). Per-step RNG is derived
    by fold_in(seed, epoch, step) so a resumed run replays the identical
    trajectory from the restored epoch boundary.
    """
    init_fn, train_step = make_vae_train_step(
        vae, fengwu_apply, sigma, lr, latent_hw, nmc_steps, err_std
    )
    step_j = jax.jit(train_step, donate_argnums=(0, 1))
    base_rng = jax.random.PRNGKey(seed)

    factory = data_iter if callable(data_iter) else (lambda _e: data_iter)

    if init_params is not None:
        # warm start from given params (e.g. --vae_ckpt): fresh optimizer
        # state from the train step's own optimizer, no data batch needed
        params, opt_state = init_fn(None, None, None, params=init_params)
    else:
        probe = iter(factory(0))
        try:
            first = next(probe, None)
        finally:
            # stop a prefetched() worker immediately: the probe only needs
            # ONE batch for shape init; leaving the iterator to GC lets the
            # worker buffer `depth` more disk reads that epoch 0 discards
            if hasattr(probe, "close"):
                probe.close()
        if first is None:
            raise ValueError("empty training loader: no batch to size init")
        params, opt_state = init_fn(base_rng, jnp.asarray(first),
                                    fengwu_params)

    start_epoch = 0
    metric_best = float("inf")
    if ckpt_dir and resume:
        from vaevar_tpu.train import checkpoint as ckpt

        got = ckpt.restore_train_state(ckpt_dir, params, opt_state)
        if got is not None:
            params, opt_state, meta = got
            start_epoch = int(meta.get("epoch", -1)) + 1
            metric_best = float(meta.get("metric_best", float("inf")))
            logger(f"resumed from {ckpt_dir}/checkpoint_latest at epoch "
                   f"{start_epoch}")

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from vaevar_tpu.parallel import mesh as pmesh

        ax = mesh.axis_names
        dp = "dp" if "dp" in ax else None
        sh = "sh" if "sh" in ax else None
        sw = "sw" if "sw" in ax else None
        bspec = P(dp, None, None, sh, sw)  # (B, L, C, H, W)
        params = pmesh.replicate(params, mesh)
        opt_state = pmesh.replicate(opt_state, mesh)
        fengwu_params = pmesh.replicate(fengwu_params, mesh)
        put = lambda b: pmesh.global_batch(np.ascontiguousarray(b), mesh,
                                           bspec)
    else:
        put = jnp.asarray

    history = []
    for epoch in range(start_epoch, epochs):
        epoch_losses = []
        for j, batch in enumerate(factory(epoch)):
            if steps_per_epoch is not None and j >= steps_per_epoch:
                break
            sub = jax.random.fold_in(jax.random.fold_in(base_rng, epoch), j)
            params, opt_state, m = step_j(
                params, opt_state, fengwu_params, put(batch), sub
            )
            if (j + 1) % log_every == 0:
                logger(
                    f"epoch {epoch} iter {j} loss {float(m['loss']):.3f} "
                    f"rec {float(m['rec_sse']):.3f} kld {float(m['kld']):.3f}"
                )
            rec = {k: float(v) for k, v in m.items()}
            history.append(rec)
            epoch_losses.append(rec["loss"])
        if sample_at_epoch_end:
            # prior sample sanity check (model/model.py:648-653)
            sub = jax.random.fold_in(base_rng, 10_000 + epoch)
            latent_ch = vae.dec_cfg.in_chans
            z = jax.random.normal(sub, (1, latent_ch, *latent_hw))
            y = vae.apply(params, z, method=VAE.decoder)
            logger(
                f"epoch {epoch} prior-sample std "
                f"{float(jnp.std(y)):.3f}"
            )
        if ckpt_dir and jax.process_index() == 0:
            from vaevar_tpu.train import checkpoint as ckpt

            epoch_mean = float(np.mean(epoch_losses)) if epoch_losses \
                else float("inf")
            if epoch_mean < metric_best:
                metric_best = epoch_mean
                ckpt.save_train_state(ckpt_dir, params, opt_state, epoch,
                                      metric_best=metric_best,
                                      alias="checkpoint_best")
            ckpt.save_train_state(ckpt_dir, params, opt_state, epoch,
                                  metric_best=metric_best,
                                  alias="checkpoint_latest")
    return params, history


def replicated_checksum(params) -> float:
    """Cheap analogue of check_ddp_consistency (utils/misc.py:408-420):
    under jit+sharding replication is an invariant, but a scalar checksum
    is useful for cross-host log comparison."""
    leaves = jax.tree_util.tree_leaves(params)
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
