"""Parameter dtype management for inference-dominated paths.

The DA inner loop evaluates the decoder hundreds of times per cycle with
frozen weights. With f32 master params and bf16 compute, XLA re-converts
every parameter on every evaluation (~1.3 GB of convert traffic per
cost+grad for the 216M-param decoder). Pre-casting the params once is
numerically IDENTICAL to cast-at-use (same bf16 rounding, same matmul
inputs) and removes that traffic.

Params consumed in f32 regardless of compute dtype (`rel_bias_table`,
lgunet.py:164) are kept in f32 so their values do not round-trip
through bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: param names (leaf key in the tree path) that must stay f32
_KEEP_F32 = ("rel_bias_table",)


def cast_params_bf16(params, keep: tuple[str, ...] = _KEEP_F32):
    """Cast f32 param leaves to bf16, except leaves whose key path contains
    a name in `keep`. Exactly equivalent to XLA's per-use casts when the
    model computes in bf16."""

    def cast(path, leaf):
        if leaf.dtype != jnp.float32:
            return leaf
        if any(k in str(p) for p in path for k in keep):
            return leaf
        return leaf.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)
