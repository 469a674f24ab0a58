"""On-device L-BFGS with strong-Wolfe line search (jittable, pure).

TPU-native replacement for the reference's torch.optim.LBFGS
(history_size=10, max_iter=10, line_search_fn="strong_wolfe";
da_4dvar.py:1119,1240): the whole minimization — two-loop recursion, zoom
line search, rollout forward+reverse AD inside the cost closure — compiles
to a single XLA program via `lax.while_loop`, so the cycled DA inner loop
never leaves the chip. Built on optax's lbfgs transform with zoom
(strong-Wolfe) linesearch.

The reference instantiates ONE torch LBFGS per analysis and calls
`.step(closure)` Nit times (da_4dvar.py:1240,1298), so curvature history
and step scaling PERSIST across the outer diagnostic iterations. Mirrored
here: `lbfgs_minimize` accepts `init_state` (the state returned by a
previous segment) and runs `max_iters` ADDITIONAL quasi-Newton iterations
from it.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class SegmentCarry(NamedTuple):
    """Per-OUTER-SEGMENT stopping-rule state (torch's per-.step() budget
    and change conditions). Thread through lbfgs_minimize calls when one
    segment spans several calls (iters_per_dispatch < lbfgs_iters); start
    each new segment from `segment_carry_init()`."""

    evals: jax.Array  # closure evals charged (incl. the entry eval)
    step_max: jax.Array  # max|d*t| of the last accepted step
    dloss: jax.Array  # |loss - prev_loss| of the last accepted step


def segment_carry_init() -> SegmentCarry:
    return SegmentCarry(
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(jnp.inf, jnp.float32),
    )


class LBFGSResult(NamedTuple):
    x: jax.Array
    value: jax.Array
    grad_norm: jax.Array
    n_iters: jax.Array
    seg_carry: SegmentCarry  # thread back in within the same segment
    state: Any  # optax state; feed back via init_state to continue

    @property
    def n_evals(self):
        return self.seg_carry.evals


def _make_opt(history: int, max_linesearch_steps: int):
    return optax.lbfgs(
        memory_size=history,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )


def lbfgs_init_state(x0, history: int = 10, max_linesearch_steps: int = 25):
    """Fresh optimizer state for `lbfgs_minimize(..., init_state=...)`.

    Leaf dtypes are strengthened (convert_element_type drops weak_type):
    optax's zoom-linesearch init leaves three weak-typed scalars that
    become strong after one update, so without this every segment-
    dispatched solve would compile its program TWICE (one signature for
    the fresh state, one for the carried state)."""
    state = _make_opt(history, max_linesearch_steps).init(x0)
    import jax.lax as lax

    return jax.tree.map(
        lambda l: lax.convert_element_type(l, jnp.asarray(l).dtype), state
    )


def _tree_max_abs(tree):
    return optax.tree_utils.tree_norm(tree, ord=jnp.inf)


def lbfgs_minimize(
    fun: Callable,
    x0,
    max_iters: int = 10,
    history: int = 10,
    tol: float = 0.0,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    max_linesearch_steps: int = 25,
    max_evals: int | None = None,
    seg_carry: SegmentCarry | None = None,
    init_state=None,
) -> LBFGSResult:
    """Minimize `fun` from `x0`. Runs exactly like torch LBFGS semantics:
    up to `max_iters` quasi-Newton iterations with a strong-Wolfe zoom line
    search and torch.optim.LBFGS's stopping rules (defaults match torch):

    - entry/per-iteration optimality: max|grad| <= tolerance_grad
      (torch's `opt_cond`; checked before iterating, so a converged
      continued state no-ops like torch's `.step()` does);
    - lack of progress: max|d*t| <= tolerance_change or
      |loss - prev_loss| < tolerance_change, checked after each accepted
      step WITHIN a call (like torch, a new call re-tries regardless);
    - closure-eval budget: iterate only while the segment has charged
      fewer than `max_evals` closure evaluations (torch's `max_eval`,
      default `max_iters * 5 // 4`). 1 is charged at segment entry and
      each iteration charges its linesearch's evals, so a grinding zoom
      (up to `max_linesearch_steps` probes on an ill-posed cost) ends the
      segment early exactly like torch instead of burning
      `max_iters x max_linesearch_steps` decoder/rollout evals. The
      budget is per OUTER segment: pass `seg_carry` = the previous
      result's `.seg_carry` when one segment spans several
      lbfgs_minimize calls (iters_per_dispatch < lbfgs_iters), and
      `segment_carry_init()` (the default) at each new segment — the
      change conditions and the eval budget then behave identically at
      every dispatch granularity;
    - plus the legacy `tol` on the gradient 2-norm (0 = disabled).

    Jit-safe. With `init_state` (from a previous result's `.state`),
    continues the SAME minimization — curvature pairs, step scaling, and
    the cached (value, grad) at x0 carry over, and up to `max_iters` more
    iterations run.
    """
    if max_evals is None:
        max_evals = max_iters * 5 // 4  # torch.optim.LBFGS default
    opt = _make_opt(history, max_linesearch_steps)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        x, state, _, _, evals = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun
        )
        x = optax.apply_updates(x, updates)
        # progress measures for torch's tolerance_change checks: the
        # linesearch cached the accepted point's value in the new state
        step_max = _tree_max_abs(updates)
        dloss = jnp.abs(optax.tree_utils.tree_get(state, "value") - value)
        evals = evals + optax.tree_utils.tree_get(
            state, "num_linesearch_steps"
        )
        return x, state, step_max, dloss, evals

    if init_state is None:
        init_state = opt.init(x0)
    it0 = optax.tree_utils.tree_get(init_state, "count")

    def cond(carry):
        x, state, step_max, dloss, evals = carry
        it = optax.tree_utils.tree_get(state, "count")
        # grad at the CURRENT x: the linesearch cache (valid whenever
        # it > 0; a fresh state caches zeros, so force the first
        # iteration of a fresh minimization like the old behavior —
        # torch would pay one closure eval to check the true entry grad)
        g = optax.tree_utils.tree_get(state, "grad")
        opt_cond = (_tree_max_abs(g) <= tolerance_grad) & (it > 0)
        # step_max/dloss start at inf at a segment's first cond eval
        # (SegmentCarry init), so the change conditions never fire at
        # segment entry — like torch — but DO persist across dispatch
        # boundaries within a segment (identical trajectory at every
        # iters_per_dispatch granularity)
        no_progress = (
            (step_max <= tolerance_change) | (dloss < tolerance_change)
        )
        gnorm_ok = (it == it0) | (optax.tree_utils.tree_norm(g) > tol)
        return (
            (it < it0 + max_iters) & (evals < max_evals)
            & ~opt_cond & ~no_progress & gnorm_ok
        )

    if seg_carry is None:
        seg_carry = segment_carry_init()
    # segment entry charges one closure eval (torch's current_evals = 1);
    # continuation calls within the SAME segment (evals > 0) don't — the
    # entry (value, grad) are cached from the previous call
    ev0 = jnp.asarray(seg_carry.evals, jnp.int32)
    evals_init = ev0 + (ev0 == 0).astype(jnp.int32)
    x, state, step_max, dloss, evals = jax.lax.while_loop(
        cond, step,
        (x0, init_state, jnp.asarray(seg_carry.step_max, jnp.float32),
         jnp.asarray(seg_carry.dloss, jnp.float32), evals_init),
    )
    return LBFGSResult(
        x=x,
        # the linesearch already evaluated f at the accepted point; reuse it
        # instead of paying one more decoder forward per segment
        value=optax.tree_utils.tree_get(state, "value"),
        grad_norm=optax.tree_utils.tree_norm(
            optax.tree_utils.tree_get(state, "grad")
        ),
        n_iters=optax.tree_utils.tree_get(state, "count"),
        seg_carry=SegmentCarry(evals, step_max, dloss),
        state=state,
    )
