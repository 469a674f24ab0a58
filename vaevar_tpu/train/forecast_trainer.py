"""Supervised forecast-model training (LpLoss / Possloss).

Rebuilds the reference `basemodel` trainer (model/model.py:26-514):

- Possloss: Gaussian NLL over the (mean, logvar) output halves with
  learnable soft-clamped logvar bounds (model/model.py:160-207,95-98);
- LpLoss: relative L2 (model/model.py:153-158);
- one- or two-step training (second step feeds the mean back);
- `calculate_q`: per-pixel one-step error variance — the Q-matrix estimate
  used by the DA engine (model/model.py:469-490);
- `multi_step_predict` rollout evaluation (model/model.py:492-514).

Optimizer: optax AdamW + cosine schedule (replacing torch/timm factories,
utils/builder.py:300-382).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaevar_tpu import channels


def lp_loss(pred, target):
    B = pred.shape[0]
    d = jnp.linalg.norm(pred.reshape(B, -1) - target.reshape(B, -1), axis=1)
    n = jnp.linalg.norm(target.reshape(B, -1), axis=1)
    return jnp.mean(d / n)


def poss_loss(pred, target, max_logvar, min_logvar, inc_var_loss: bool = True):
    """Gaussian NLL with clamped logvar; pred has 2x target channels."""
    mean, logvar = jnp.split(pred, 2, axis=1)
    B = pred.shape[0]
    lv = logvar.reshape(B, -1)
    lv = max_logvar - jax.nn.softplus(max_logvar - lv)
    lv = min_logvar + jax.nn.softplus(lv - min_logvar)
    lv = lv.reshape(target.shape)
    inv_var = jnp.exp(-lv)
    if inc_var_loss:
        mse = jnp.mean((mean - target) ** 2 * inv_var, axis=(-1, -2, -3))
        var = jnp.mean(lv, axis=(-1, -2, -3))
        total = mse + var
    else:
        total = jnp.mean((mean - target) ** 2, axis=(-1, -2, -3))
    total = total + 0.01 * jnp.mean(max_logvar) - 0.01 * jnp.mean(min_logvar)
    return jnp.mean(total)


def make_forecast_train_step(
    model_apply: Callable,
    loss_type: str = "Possloss",
    lr: float = 5e-6,
    total_steps: int = 10_000,
    two_step: bool = False,
    out_shape=None,  # (out_chans, H, W) needed for Possloss logvar bounds
):
    sched = optax.cosine_decay_schedule(lr, total_steps)
    opt = optax.adamw(sched, b1=0.9, b2=0.9)

    def init_extra():
        if loss_type != "Possloss":
            return {}
        c, h, w = out_shape
        n = c * h * w // 2
        return {
            "max_logvar": jnp.ones((1, n), jnp.float32) / 2.0,
            "min_logvar": -jnp.ones((1, n), jnp.float32) * 10.0,
        }

    def loss_fn(trainable, inp, tar):
        params = trainable["model"]
        pred = model_apply(params, inp)
        if loss_type == "Possloss":
            l1 = poss_loss(
                pred, tar[0], trainable["max_logvar"], trainable["min_logvar"]
            )
        else:
            l1 = lp_loss(pred[:, : tar[0].shape[1]], tar[0])
        if two_step and len(tar) > 1:
            pred2 = model_apply(params, pred[:, : tar[0].shape[1]])
            if loss_type == "Possloss":
                l2 = poss_loss(
                    pred2, tar[1], trainable["max_logvar"], trainable["min_logvar"]
                )
            else:
                l2 = lp_loss(pred2[:, : tar[1].shape[1]], tar[1])
            return l1 + l2
        return l1

    def init_fn(model_params):
        trainable = {"model": model_params, **init_extra()}
        return trainable, opt.init(trainable)

    def train_step(trainable, opt_state, inp, tars):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, inp, tars)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return init_fn, train_step


def make_eval_step(model_apply, loss_type: str = "Possloss",
                   two_step: bool = False):
    """Validation step (reference basemodel.test_one_step,
    model/model.py:235-257): same loss as training plus the prediction
    mean half for metric evaluation."""

    def eval_step(trainable, inp, tars):
        params = trainable["model"]
        pred = model_apply(params, inp)
        nch = tars[0].shape[1]
        if loss_type == "Possloss":
            loss = poss_loss(pred, tars[0], trainable["max_logvar"],
                             trainable["min_logvar"])
        else:
            loss = lp_loss(pred[:, :nch], tars[0])
        if two_step and len(tars) > 1:
            pred2 = model_apply(params, pred[:, :nch])
            if loss_type == "Possloss":
                loss = loss + poss_loss(pred2, tars[1],
                                        trainable["max_logvar"],
                                        trainable["min_logvar"])
            else:
                loss = loss + lp_loss(pred2[:, :nch], tars[1])
        return loss, pred[:, :nch]

    return jax.jit(eval_step)


def evaluate(eval_step, trainable, val_iter: Iterable, recorder=None,
             data_std=None, put=None) -> dict:
    """Run the validation loop; returns mean scalars over batches —
    the reference's basemodel.test (model/model.py:414-431). `recorder`
    is a utils.metrics.MetricsRecorder; metrics are evaluated on the
    normalized fields with data_std scaling to physical units.

    `put` places batches on device (defaults to jnp.asarray). In
    multi-process runs it must be the same global-batch placement as
    training — jit rejects host-local arrays mixed with multihost-global
    params, and the recorder pull then all-gathers pred/target so every
    rank computes identical metrics."""
    put = put or jnp.asarray
    sums, n = {}, 0
    for inp, tars in val_iter:
        inp_j = put(np.asarray(inp))
        tars_j = [put(np.asarray(t)) for t in tars]
        loss, pred = eval_step(trainable, inp_j, tars_j)
        scalars = {"loss": float(loss)}
        if recorder is not None:
            if getattr(pred, "is_fully_addressable", True):
                pred_np, gt_np = np.asarray(pred), np.asarray(tars_j[0])
            else:
                from jax.experimental import multihost_utils as mhu

                pred_np = np.asarray(mhu.process_allgather(pred,
                                                           tiled=True))
                gt_np = np.asarray(mhu.process_allgather(tars_j[0],
                                                         tiled=True))
            scalars.update(recorder.evaluate_batch({
                "pred": pred_np, "gt": gt_np, "std": data_std,
            }))
        for k, v in scalars.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def train_forecast(
    model_apply,
    init_params,
    train_factory,  # epoch -> iterable of (inp, [tar...]) normalized batches
    val_factory=None,  # () -> iterable for the held-out validation range
    epochs: int = 1,
    steps_per_epoch: int | None = None,
    loss_type: str = "Possloss",
    lr: float = 5e-6,
    two_step: bool = False,
    out_shape=None,
    ckpt_dir: str | None = None,
    resume: bool = True,
    save_best_param: str = "loss",
    recorder=None,
    data_std=None,
    logger=print,
    log_every: int = 10,
    mesh=None,
    writer=None,
):
    """Epoch-loop trainer with validation-driven best-checkpoint selection
    and full mid-run resume — the reference's basemodel.trainer
    (model/model.py:396-410) + save/load_checkpoint (:313-382).

    Checkpoints carry {model+logvar bounds, optimizer state, epoch,
    metric_best}; checkpoint_best is refreshed whenever the epoch's mean
    validation `save_best_param` improves (reference whether_save_best,
    save_best default "MSE" → here default "loss"). `writer` (a
    meters.ScalarWriter) logs per-step train loss and per-epoch val
    scalars at the TRUE global step — resumed runs continue the scalar
    stream instead of overwriting steps 0..N.

    With `mesh`, batches shard over the "dp" axis (+ "sh"/"sw" spatial
    axes when present) and trainable/opt state replicate — XLA inserts
    the gradient all-reduce (the reference's 32-GPU DDP,
    training_options.yaml:7)."""
    total = (steps_per_epoch or 1000) * epochs
    init_fn, train_step = make_forecast_train_step(
        model_apply, loss_type=loss_type, lr=lr, total_steps=total,
        two_step=two_step, out_shape=out_shape,
    )
    trainable, opt_state = init_fn(init_params)
    eval_step = make_eval_step(model_apply, loss_type, two_step)

    start_epoch = 0
    start_step = 0
    metric_best = None
    if ckpt_dir and resume:
        from vaevar_tpu.train import checkpoint as ckpt

        got = ckpt.restore_train_state(ckpt_dir, trainable, opt_state)
        if got is not None:
            trainable, opt_state, meta = got
            start_epoch = int(meta.get("epoch", -1)) + 1
            # the TRUE global step persisted at save time — NOT derived
            # from steps_per_epoch (which may be None / epoch lengths may
            # vary), so a resumed ScalarWriter stream never overwrites.
            # Checkpoints written before step= was persisted carry step=0;
            # fall back to the old derivation rather than restart at 0.
            start_step = int(meta.get("step", 0)) or (
                start_epoch * (steps_per_epoch or 0)
            )
            metric_best = meta.get("metric_best")
            logger(f"resumed at epoch {start_epoch} step {start_step} "
                   f"(metric_best={metric_best})")

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from vaevar_tpu.parallel import mesh as pmesh

        ax = mesh.axis_names
        bspec = P("dp" if "dp" in ax else None, None,
                  "sh" if "sh" in ax else None,
                  "sw" if "sw" in ax else None)  # (B, C, H, W)
        trainable = pmesh.replicate(trainable, mesh)
        opt_state = pmesh.replicate(opt_state, mesh)
        put = lambda b: pmesh.global_batch(np.ascontiguousarray(b), mesh,
                                           bspec)
    else:
        put = jnp.asarray

    step_j = jax.jit(train_step, donate_argnums=(0, 1))
    history = []
    gstep = start_step
    for epoch in range(start_epoch, epochs):
        for j, (inp, tars) in enumerate(train_factory(epoch)):
            if steps_per_epoch is not None and j >= steps_per_epoch:
                break
            trainable, opt_state, loss = step_j(
                trainable, opt_state, put(np.asarray(inp)),
                [put(np.asarray(t)) for t in tars],
            )
            if (j + 1) % log_every == 0:
                logger(f"epoch {epoch} iter {j} loss {float(loss):.4f}")
            history.append(float(loss))
            if writer is not None and jax.process_index() == 0:
                writer.add_scalar("loss", float(loss), gstep)
            gstep += 1
        val = {}
        if val_factory is not None:
            val = evaluate(eval_step, trainable, val_factory(), recorder,
                           data_std, put=put)
            if writer is not None and jax.process_index() == 0:
                writer.add_scalars({f"val_{k}": v for k, v in val.items()
                                    if not k[-1].isdigit()}, epoch)
            shown = {k: v for k, v in val.items() if not k[-1].isdigit()}
            shown.update({  # the reference's channels of record
                k: val[k] for k in ("WRMSE11", "WRMSE66", "WRMSE2")
                if k in val
            })
            logger(f"epoch {epoch} val: " + " ".join(
                f"{k} {v:.4g}" for k, v in sorted(shown.items())))
        if ckpt_dir and jax.process_index() == 0:
            from vaevar_tpu.train import checkpoint as ckpt

            metric_now = val.get(save_best_param)
            if metric_now is not None and (
                metric_best is None or metric_now < metric_best
            ):
                metric_best = metric_now
                ckpt.save_train_state(ckpt_dir, trainable, opt_state, epoch,
                                      step=gstep, metric_best=metric_best,
                                      alias="checkpoint_best")
            ckpt.save_train_state(ckpt_dir, trainable, opt_state, epoch,
                                  step=gstep, metric_best=metric_best,
                                  alias="checkpoint_latest")
    return trainable, history


def calculate_q(model_apply, params, pairs: Iterable) -> np.ndarray:
    """Per-pixel one-step forecast error variance (model/model.py:469-490).

    pairs yields (inp, tar) normalized (B, 69, H, W) arrays. Returns
    (69, H, W) mean squared error — the Q-matrix diagonal estimate.
    """
    acc = None
    n = 0
    fwd = jax.jit(lambda p, x, c: model_apply(p, x)[:, :c], static_argnums=2)
    for inp, tar in pairs:
        pred = fwd(params, jnp.asarray(inp), tar.shape[1])
        sq = jnp.mean((pred - jnp.asarray(tar)) ** 2, axis=0)
        acc = sq if acc is None else acc + sq
        n += 1
    return np.asarray(acc / max(n, 1))


def multi_step_predict(model_apply, params, inp, steps: int,
                       n_channels: int = channels.N_CHANNELS):
    """Normalized rollout (model/model.py:492-514): returns (steps, B, C, H, W)."""
    fwd = jax.jit(lambda p, x: model_apply(p, x)[:, :n_channels])
    outs = []
    x = jnp.asarray(inp)
    for _ in range(steps):
        x = fwd(params, x)
        outs.append(x)
    return jnp.stack(outs)
