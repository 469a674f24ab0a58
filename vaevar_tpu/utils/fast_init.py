"""Fast parameter materialization via jax.eval_shape + host RNG.

`model.init` compiles and runs the whole forward plus per-param threefry —
~6 minutes for the 216M-param decoder. For benchmarks, smoke runs, and any
context where weights are random anyway, `fast_init` gets the param tree
shape from `jax.eval_shape` (no compute) and fills leaves with numpy
normals in seconds. Not for training reproducibility — use `model.init`
when init statistics matter.
"""

from __future__ import annotations

import jax
import numpy as np


def fast_init(model, *sample_args, seed: int = 0, scale: float = 0.02,
              method=None):
    shapes = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a, method=method)
        if method is not None
        else model.init(jax.random.PRNGKey(0), *a),
        *sample_args,
    )
    rng = np.random.default_rng(seed)

    def fill(leaf):
        a = (scale * rng.standard_normal(leaf.shape)).astype(leaf.dtype)
        return a

    return jax.tree_util.tree_map(fill, shapes)
