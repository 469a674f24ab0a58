"""Optimizer / LR-schedule / trainable-mask factories.

Optax equivalent of the reference's ConfigBuilder optimizer zoo
(utils/builder.py:300-352: SGD, ASGD, Adagrad, Adamax, Adadelta, Adam,
AdamW, RMSprop) and timm `create_scheduler` (utils/builder.py:355-382 —
the shipped configs use cosine with warmup, training_options.yaml).

`lora_mask` realizes the reference's `VAE_lr.finetune()` semantics
(nf_model/vae.py:92-97: freeze everything except the LoRA A/B projections)
as an optax mask — frozen leaves get zero updates instead of mutable
requires_grad flags, keeping the train step pure.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import optax

_LORA_KEYS = ("qA", "qB", "kA", "kB", "vA", "vB")


def make_schedule(params: Mapping[str, Any] | None, base_lr: float,
                  total_steps: int):
    """timm-style schedule spec -> optax schedule.

    keys: sched ('cosine'|'step'|'constant'), warmup_epochs/warmup_steps,
    min_lr, decay_rate, decay_steps."""
    p = dict(params or {})
    kind = p.get("sched", "cosine")
    warmup = int(p.get("warmup_steps", p.get("warmup_epochs", 0)))
    min_lr = float(p.get("min_lr", 0.0))
    if kind == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup, 1), alpha=min_lr / base_lr
            if base_lr else 0.0,
        )
    elif kind == "step":
        steps = int(p.get("decay_steps", max(total_steps // 3, 1)))
        rate = float(p.get("decay_rate", 0.1))
        main = optax.exponential_decay(
            base_lr, steps, rate, staircase=True, end_value=min_lr
        )
    elif kind == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise NotImplementedError(f"schedule {kind}")
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), main], [warmup]
        )
    return main


def make_optimizer(opt_type: str = "AdamW", lr=1e-4, weight_decay: float = 0.0,
                   **kw) -> optax.GradientTransformation:
    """Name-compatible optimizer factory (utils/builder.py:332-351)."""
    t = opt_type.lower()
    if t == "sgd":
        return optax.sgd(lr, momentum=kw.get("momentum", 0.0),
                         nesterov=kw.get("nesterov", False))
    if t == "asgd":  # optax has no ASGD; SGD is the convex-phase equivalent
        return optax.sgd(lr)
    if t == "adagrad":
        return optax.adagrad(lr)
    if t == "adamax":
        return optax.adamax(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999))
    if t == "adadelta":
        return optax.adadelta(lr, rho=kw.get("rho", 0.9))
    if t == "adam":
        return optax.adam(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999))
    if t == "adamw":
        return optax.adamw(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
                           weight_decay=weight_decay)
    if t == "rmsprop":
        return optax.rmsprop(lr, decay=kw.get("alpha", 0.99),
                             momentum=kw.get("momentum", 0.0))
    raise NotImplementedError(f"optimizer {opt_type}")


def lora_mask(params) -> Any:
    """True for LoRA adapter leaves (qA/qB/kA/kB/vA/vB), False elsewhere —
    pass to `optax.masked` to train only the adapters
    (nf_model/vae.py:92-97)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_lora(path):
        return any(
            getattr(k, "key", None) in _LORA_KEYS for k in path
        )

    paths = {jax.tree_util.keystr(p): is_lora(p) for p, _ in flat}

    def mask_fn(path, _leaf):
        return paths[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def finetune_optimizer(params, opt_type: str = "Adam", lr=1e-4, **kw):
    """Optimizer that updates only LoRA adapters; all other leaves frozen
    (zero updates — optax.masked alone would pass raw gradients through)."""
    labels = jax.tree_util.tree_map(
        lambda m: "lora" if m else "frozen", lora_mask(params)
    )
    return optax.multi_transform(
        {"lora": make_optimizer(opt_type, lr, **kw),
         "frozen": optax.set_to_zero()},
        labels,
    )
