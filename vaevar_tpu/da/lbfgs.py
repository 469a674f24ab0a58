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

import functools
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


# optax versions whose _src.linesearch internals the jvp-zoom linesearch
# was validated against (trajectory-identity suite green). An untested
# newer optax may still work — the assert is a tripwire, not a lock; add
# the version here after the parity tests pass against it.
_OPTAX_TESTED = ("0.2.6",)


def _check_optax_compat():
    import optax as _optax

    ver = getattr(_optax, "__version__", "unknown")
    try:
        from optax._src.linesearch import (  # noqa: F401
            ScaleByZoomLinesearchState,
            ZoomLinesearchInfo,
            zoom_linesearch,
        )
    except ImportError as e:
        raise ImportError(
            f"lbfgs linesearch='jvp-zoom' relies on optax._src.linesearch "
            f"internals that are absent/renamed in installed optax {ver} "
            f"(tested: {_OPTAX_TESTED}). Use linesearch='zoom' or port "
            f"scale_by_jvp_zoom_linesearch to the new internals and add "
            f"the version to _OPTAX_TESTED after the trajectory-identity "
            f"tests pass."
        ) from e
    if ver not in _OPTAX_TESTED:
        import warnings

        warnings.warn(
            f"jvp-zoom linesearch validated against optax {_OPTAX_TESTED}, "
            f"installed {ver}: run tests/test_sht_cvt_lbfgs.py::"
            f"TestJvpZoomLinesearch before trusting trajectories.",
            stacklevel=3,
        )


def scale_by_jvp_zoom_linesearch(
    max_linesearch_steps: int,
    initial_guess_strategy: str = "one",
):
    """Strong-Wolfe zoom linesearch with FORWARD-MODE probes (TPU-first).

    Same algorithm and trajectory as `optax.scale_by_zoom_linesearch`
    (Nocedal & Wright 3.5/3.6) — the zoom's accept/bracket decisions use
    only the probe's value and its slope along the search direction —
    but each probe after the first computes (value, slope) with ONE
    `jax.jvp` instead of `jax.value_and_grad`. On the DA window costs
    the difference is large: a reverse-mode probe through the remat'd
    decoder + da_win flow-model rollout costs fwd + recompute + grad ops
    (~2.5-4x a forward), while the jvp probe costs ~2 forwards and holds
    ZERO backward activations (forward-mode needs no remat at all). The
    grinding-zoom regime of sparse-obs windows (docs/PERF.md, 1.4deg
    north-star section) spends most closure evals on rejected probes,
    which is exactly where this pays.

    Hybrid eval schedule (keeps the descent regime at parity):
      * probe 1 pays the true `value_and_grad` — when it is accepted
        (the ~always case in descent regime, ~1.05 evals/iter measured)
        the iteration costs exactly what the standard linesearch costs
        and the cached gradient is already the true one;
      * probes 2..k use `jax.jvp`; the gradient they store is the
        pseudo-gradient (slope/|u|^2) u whose vdot with the direction
        reproduces the slope exactly, so every bracketing decision
        matches the reverse-mode linesearch to fp noise;
      * at the end, the TRUE (value, grad) at the accepted point is
        restored: reused from probe 1 / the segment entry when the
        accepted stepsize is theirs, recomputed with one value_and_grad
        otherwise — `optax.value_and_grad_from_state` and the L-BFGS
        curvature pairs therefore always see exact gradients.

    The charged eval count (`num_linesearch_steps`) stays the probe
    count, identical to the reverse-mode linesearch, so torch's
    max_eval budget semantics (da_4dvar.py:1119,1240) are unchanged.

    RESTRICTIONS:
      * the cost must be forward-mode differentiable: the custom-VJP
        flash-attention ops are NOT (VariationalSolver fails early with
        an actionable message — see `_assert_jvp_compatible`);
      * this re-implements optax's scale_by_zoom_linesearch update loop
        on top of `optax._src.linesearch` INTERNALS (zoom_linesearch,
        ScaleByZoomLinesearchState, the init/step signatures incl.
        prev_stepsize/initial_guess_strategy). Written and tested
        against optax 0.2.6; `_check_optax_compat` below is the upgrade
        tripwire (clear error instead of a silent trajectory divergence
        or an ImportError deep in a solve), and the jvp-vs-zoom
        trajectory-identity tests (tests/test_sht_cvt_lbfgs.py::
        TestJvpZoomLinesearch) are the behavioral one.
    """
    _check_optax_compat()
    from optax._src import base as optax_base
    from optax._src.linesearch import (
        ScaleByZoomLinesearchState,
        ZoomLinesearchInfo,
        zoom_linesearch,
    )

    init_ls, step_ls, cond_step_ls = zoom_linesearch(
        max_linesearch_steps=max_linesearch_steps,
    )

    def init_fn(params):
        val_dtype = jnp.real(jnp.asarray(jax.tree.leaves(params)[0])).dtype
        return ScaleByZoomLinesearchState(
            learning_rate=jnp.asarray(1.0, dtype=val_dtype),
            value=jnp.asarray(jnp.inf, dtype=val_dtype),
            grad=optax.tree_utils.tree_zeros_like(params),
            info=ZoomLinesearchInfo(
                num_linesearch_steps=jnp.asarray(0),
                decrease_error=jnp.asarray(jnp.inf),
                curvature_error=jnp.asarray(jnp.inf),
            ),
        )

    def update_fn(updates, state, params, *, value, grad, value_fn,
                  **extra_args):
        del extra_args  # DA costs close over their data; no fn kwargs
        vag = jax.value_and_grad(value_fn)
        u_sq = optax.tree_utils.tree_vdot(updates, updates)

        def jvp_probe(w):
            v, slope = jax.jvp(value_fn, (w,), (updates,))
            # pseudo-gradient: vdot(ghat, updates) == slope exactly; the
            # true gradient at the accepted point is restored below
            coef = jnp.where(u_sq > 0.0, slope / jnp.maximum(u_sq, 1e-38),
                             0.0)
            ghat = optax.tree_utils.tree_scale(coef, updates)
            return v, ghat

        ls0 = init_ls(
            updates, params, value=value, grad=grad,
            prev_stepsize=state.learning_rate,
            initial_guess_strategy=initial_guess_strategy,
        )
        # probe 1: true value_and_grad (always runs — a fresh zoom state
        # has done=failed=False, exactly like optax's while_loop)
        ls1 = step_ls(ls0, value_and_grad_fn=vag, fn_kwargs={})
        s1, v1, g1 = ls1.stepsize, ls1.value, ls1.grad
        final = jax.lax.while_loop(
            cond_step_ls,
            functools.partial(step_ls, value_and_grad_fn=jvp_probe,
                              fn_kwargs={}),
            ls1,
        )
        eta = final.stepsize

        # restore the TRUE (value, grad) at the accepted point
        reuse_first = eta == s1
        reuse_entry = eta == 0.0

        def _reuse(_):
            v = jnp.where(reuse_entry, value, v1)
            g = jax.tree.map(
                lambda a, b: jnp.where(reuse_entry, a, b), grad, g1
            )
            return v, g

        def _recompute(_):
            w_eta = optax.tree_utils.tree_add_scale(params, eta, updates)
            return vag(w_eta)

        value_f, grad_f = jax.lax.cond(
            reuse_first | reuse_entry, _reuse, _recompute, None
        )

        new_state = ScaleByZoomLinesearchState(
            learning_rate=eta,
            value=value_f,
            grad=grad_f,
            info=ZoomLinesearchInfo(
                num_linesearch_steps=final.count,
                decrease_error=final.decrease_error,
                curvature_error=final.curvature_error,
            ),
        )
        scaled = optax.tree_utils.tree_scale(eta, updates)
        return scaled, optax.tree_utils.tree_cast_like(new_state, state)

    return optax_base.GradientTransformationExtraArgs(init_fn, update_fn)


def _make_opt(history: int, max_linesearch_steps: int,
              linesearch: str = "zoom"):
    if linesearch == "jvp-zoom":
        ls = scale_by_jvp_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        )
    elif linesearch == "zoom":
        ls = optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        )
    else:
        raise ValueError(f"unknown linesearch {linesearch!r} "
                         "(expected 'zoom' or 'jvp-zoom')")
    return optax.lbfgs(memory_size=history, linesearch=ls)


def lbfgs_init_state(x0, history: int = 10, max_linesearch_steps: int = 25,
                     linesearch: str = "zoom"):
    """Fresh optimizer state for `lbfgs_minimize(..., init_state=...)`.

    Leaf dtypes are strengthened (convert_element_type drops weak_type):
    optax's zoom-linesearch init leaves three weak-typed scalars that
    become strong after one update, so without this every segment-
    dispatched solve would compile its program TWICE (one signature for
    the fresh state, one for the carried state)."""
    state = _make_opt(history, max_linesearch_steps, linesearch).init(x0)
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
    linesearch: str = "zoom",
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

    `linesearch` selects the strong-Wolfe implementation: "zoom"
    (optax's reverse-mode probes) or "jvp-zoom" (forward-mode probes —
    see `scale_by_jvp_zoom_linesearch`; same trajectory to fp noise,
    much cheaper when the zoom grinds on heavy window costs).

    Jit-safe. With `init_state` (from a previous result's `.state`),
    continues the SAME minimization — curvature pairs, step scaling, and
    the cached (value, grad) at x0 carry over, and up to `max_iters` more
    iterations run.
    """
    if max_evals is None:
        max_evals = max_iters * 5 // 4  # torch.optim.LBFGS default
    opt = _make_opt(history, max_linesearch_steps, linesearch)
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
