"""Optimizer-trajectory parity: lbfgs_minimize vs torch.optim.LBFGS.

The reference's analyses are TRUNCATED optimizations (Nit segments x
max_iter strong-Wolfe L-BFGS iterations, one persistent optimizer —
da_4dvar.py:1119,1240,1298), so analysis parity depends on the optimizer
*trajectory*, not just the eventual minimizer. This file pins
`da.lbfgs.lbfgs_minimize` (optax lbfgs + zoom linesearch, state
continuation) against `torch.optim.LBFGS(history_size=10,
line_search_fn="strong_wolfe")` run the reference way (one optimizer,
`.step(closure)` per segment).

Measured behavior (pinned below, seeds 0..5, f32):

- On quadratics both line searches interpolate to the exact 1D minimizer
  from their (different) initial trial steps, so the trajectories agree
  essentially EXACTLY (rel < 1e-3) until f32 roundoff perturbs the
  curvature pairs near convergence — most seeds match through 3 full
  segments.
- When the paths do split (one seed in six; zoom vs cubic bracketing
  accept different Wolfe points early), the iterate divergence CONTRACTS
  across segments (0.24 -> 0.005 here) and the objective reached by the
  JAX solve stays at parity or better (<= +2% of |f_torch|; it is
  usually lower).

The effect of this bounded divergence on an actual ANALYSIS (decoder
cost, physical fields, z500 WRMSE) is measured end-to-end in
tests/test_one_cycle_golden.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vaevar_tpu.da.lbfgs import lbfgs_init_state, lbfgs_minimize  # noqa: E402

SEGMENTS = 4
ITERS = 10
HISTORY = 10


def _quadratic(seed: int, n: int = 64, cond_pow: float = 4.0):
    """Random SPD quadratic with condition number 10**cond_pow."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eig = np.logspace(0.0, cond_pow, n)
    A = ((Q * eig) @ Q.T).astype(np.float32)
    A = (A + A.T) / 2
    b = rng.normal(size=n).astype(np.float32)
    return A, b


def _run_jax(A, b, segments=SEGMENTS):
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    fun = lambda x: 0.5 * x @ Aj @ x - bj @ x
    x = jnp.zeros(A.shape[0], jnp.float32)
    state = lbfgs_init_state(x, history=HISTORY)
    xs, fs = [], []
    for _ in range(segments):
        res = lbfgs_minimize(fun, x, max_iters=ITERS, history=HISTORY,
                             init_state=state, max_evals=10_000)
        x, state = res.x, res.state
        xs.append(np.asarray(x))
        fs.append(float(fun(x)))
    return xs, fs


def _run_torch(A, b, segments=SEGMENTS):
    At, bt = torch.tensor(A), torch.tensor(b)
    x = torch.zeros(A.shape[0], dtype=torch.float32, requires_grad=True)
    # tolerance_grad/change zeroed and max_eval unbounded so torch runs the
    # full iteration budget like lbfgs_minimize(tol=0, max_evals=10_000):
    # this suite pins the FULL-BUDGET trajectory. Budget-binding stops are
    # impl-sensitive (optax counts zoom steps, torch counts ls closure
    # evals) and are pinned separately by the grinding-linesearch test.
    opt = torch.optim.LBFGS([x], history_size=HISTORY, max_iter=ITERS,
                            max_eval=10_000,
                            line_search_fn="strong_wolfe",
                            tolerance_grad=0.0, tolerance_change=0.0)

    def closure():
        opt.zero_grad()
        f = 0.5 * x @ At @ x - bt @ x
        f.backward()
        return f

    xs, fs = [], []
    for _ in range(segments):
        opt.step(closure)
        xs.append(x.detach().numpy().copy())
        with torch.no_grad():
            fs.append(float(0.5 * x @ At @ x - bt @ x))
    return xs, fs


class TestLBFGSTorchTrajectory:
    def _divergence(self, seed):
        A, b = _quadratic(seed)
        xs_j, fs_j = _run_jax(A, b)
        xs_t, fs_t = _run_torch(A, b)
        rel = [
            np.linalg.norm(xj - xt) / (np.linalg.norm(xt) + 1e-30)
            for xj, xt in zip(xs_j, xs_t)
        ]
        excess = [
            (fj - ft) / abs(ft) for fj, ft in zip(fs_j, fs_t)
        ]
        return rel, excess

    @pytest.mark.slow
    def test_trajectory_divergence_bounds(self):
        """Per-segment iterate divergence vs torch is bounded, contracts,
        and the objective never falls meaningfully behind torch's."""
        exact_seeds = 0
        for seed in range(6):
            rel, excess = self._divergence(seed)
            # bounded everywhere: worst observed 0.238 seg-0 (seed 0)
            assert rel[0] <= 0.35, (seed, rel)
            assert all(r <= 0.08 for r in rel[1:]), (seed, rel)
            # contracts: the last segment is closer than the first split
            assert rel[-1] <= max(rel[0], 0.03) + 1e-6, (seed, rel)
            # objective parity-or-better per segment (<= +2% of |f_t|)
            assert all(e <= 0.02 for e in excess), (seed, excess)
            if all(r < 1e-3 for r in rel[:3]):
                exact_seeds += 1
        # the typical regime is EXACT agreement through 3 segments: both
        # line searches interpolate to the same accepted point
        assert exact_seeds >= 4, exact_seeds

    def test_single_segment_exact_match_regime(self):
        """One segment on a quadratic where both searches accept identical
        steps: iterates agree to f32 tolerance (pins the two-loop
        recursion + gamma scaling semantics, not just the line search)."""
        A, b = _quadratic(1)
        xs_j, _ = _run_jax(A, b, segments=1)
        xs_t, _ = _run_torch(A, b, segments=1)
        rel = np.linalg.norm(xs_j[0] - xs_t[0]) / np.linalg.norm(xs_t[0])
        assert rel < 1e-3, rel

    def test_default_tolerances_stop_early_like_torch(self):
        """With torch-DEFAULT tolerances (tolerance_grad=1e-7,
        tolerance_change=1e-9) both optimizers stop a converged easy
        quadratic early, land on the same minimizer, and a CONTINUED
        segment on the converged state no-ops (torch's entry opt_cond)."""
        rng = np.random.default_rng(3)
        n = 8
        Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        eig = np.logspace(0.0, 1.0, n)  # cond 10: converges well inside 40
        A = ((Q * eig) @ Q.T).astype(np.float32)
        A = (A + A.T) / 2
        b = rng.normal(size=n).astype(np.float32)

        # torch, reference defaults (da_4dvar.py:1240: only history_size,
        # max_iter, line_search_fn are set; tolerances stay at defaults)
        At, bt = torch.tensor(A), torch.tensor(b)
        x_t = torch.zeros(n, dtype=torch.float32, requires_grad=True)
        opt = torch.optim.LBFGS([x_t], history_size=HISTORY, max_iter=ITERS,
                                line_search_fn="strong_wolfe")

        def closure():
            opt.zero_grad()
            f = 0.5 * x_t @ At @ x_t - bt @ x_t
            f.backward()
            return f

        for _ in range(SEGMENTS):
            opt.step(closure)
        t_iters = opt.state[x_t]["n_iter"]
        assert t_iters < SEGMENTS * ITERS  # torch stopped early

        # jax, defaults
        Aj, bj = jnp.asarray(A), jnp.asarray(b)
        fun = lambda x: 0.5 * x @ Aj @ x - bj @ x
        x = jnp.zeros(n, jnp.float32)
        state = lbfgs_init_state(x, history=HISTORY)
        for _ in range(SEGMENTS):
            res = lbfgs_minimize(fun, x, max_iters=ITERS, history=HISTORY,
                                 init_state=state)
            x, state = res.x, res.state
        j_iters = int(res.n_iters)
        assert j_iters < SEGMENTS * ITERS  # we stopped early too
        # same minimizer (exact minimum is A^-1 b)
        x_star = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        # f32 + tolerance_grad=1e-7 on max|grad| leaves ~1e-5 in x
        for got in (np.asarray(x), x_t.detach().numpy()):
            assert np.linalg.norm(got - x_star) / np.linalg.norm(x_star) \
                < 5e-5
        # the exact stop iteration is f32-noise territory (max|grad|
        # hovers around 1e-7, |dloss| around 1e-9, and torch's max_eval
        # budget of 1.25*max_iter closure evals can end a segment first) —
        # measured here: torch 15, jax 24 of the 40-iteration budget. The
        # meaningful invariants are above: both stop early, same minimizer.
        assert j_iters <= 30 and t_iters <= 30, (j_iters, t_iters)

        # a further segment on the converged state re-tries at most ONE
        # iteration then stops again: torch's change-condition breaks do
        # not persist across .step() calls (each new call iterates unless
        # the ENTRY max|grad| <= tolerance_grad check fires), and the
        # retried step moves x only at tolerance_change scale
        res2 = lbfgs_minimize(fun, x, max_iters=ITERS, history=HISTORY,
                              init_state=state)
        assert int(res2.n_iters) - j_iters <= 1, (int(res2.n_iters), j_iters)
        np.testing.assert_allclose(np.asarray(res2.x), np.asarray(x),
                                   rtol=0, atol=5e-6)

    def test_eval_budget_caps_grinding_linesearch_like_torch(self):
        """torch.optim.LBFGS bounds each .step() at max_eval = 1.25 x
        max_iter closure evals (default; the reference leaves it,
        da_4dvar.py:1119,1240). On an ill-posed cost whose zoom line
        search grinds (up to max_linesearch_steps probes per iteration),
        that budget — not max_iter — ends the segment. Without it a
        grinding 40-iteration DA solve burns up to 25x more decoder/
        rollout evals than the reference would (measured: the 1.4deg
        3-obs-column win6 solve took 135 s vs ~20 budget-capped,
        docs/PERF.md)."""
        # non-smooth kink: |1-x0| + Rosenbrock valley — strong-Wolfe
        # curvature condition fails near the kink and the zoom saturates
        def f_np(x):
            return abs(1.0 - x[0]) * 50.0 + 100.0 * (x[1] - x[0] ** 2) ** 2

        fj = lambda x: jnp.abs(1.0 - x[0]) * 50.0 + 100.0 * (
            x[1] - x[0] ** 2) ** 2
        x0 = jnp.asarray([-1.2, 1.0])

        res = lbfgs_minimize(fj, x0, max_iters=ITERS, history=HISTORY)
        res_unbounded = lbfgs_minimize(fj, x0, max_iters=ITERS,
                                       history=HISTORY, max_evals=10_000)
        budget = ITERS * 5 // 4  # torch's default max_eval for max_iter=10
        # the budget is what stopped the segment (not max_iters), and the
        # unbounded run confirms more iterations were available
        assert int(res.n_evals) >= budget
        assert int(res.n_iters) < int(res_unbounded.n_iters), (
            int(res.n_iters), int(res_unbounded.n_iters))
        # a single iteration may overshoot by at most one full linesearch
        assert int(res.n_evals) <= budget + 25

        # torch on the same cost: its .step() also ends on max_eval, well
        # short of max_iter iterations
        x_t = torch.tensor([-1.2, 1.0], requires_grad=True)
        opt = torch.optim.LBFGS([x_t], history_size=HISTORY, max_iter=ITERS,
                                line_search_fn="strong_wolfe",
                                tolerance_grad=0.0, tolerance_change=0.0)

        def closure():
            opt.zero_grad()
            f = torch.abs(1.0 - x_t[0]) * 50.0 + 100.0 * (
                x_t[1] - x_t[0] ** 2) ** 2
            f.backward()
            return f

        opt.step(closure)
        t_state = opt.state[x_t]
        assert t_state["func_evals"] >= budget
        assert t_state["n_iter"] < ITERS

    def test_state_continuation_matches_torch_persistence(self):
        """4 x 10-iter segments with carried state land within a contracted
        bound of torch's persistent-optimizer run, while a RESTARTED
        (history-dropping) run does not — i.e. the state continuation is
        load-bearing for trajectory parity, as in the reference where one
        torch optimizer persists across Nit outer iterations."""
        A, b = _quadratic(0)
        xs_t, _ = _run_torch(A, b)

        # carried state (the production path)
        xs_j, _ = _run_jax(A, b)
        rel_cont = np.linalg.norm(xs_j[-1] - xs_t[-1]) / np.linalg.norm(
            xs_t[-1]
        )

        # fresh optimizer per segment: drops curvature history
        Aj, bj = jnp.asarray(A), jnp.asarray(b)
        fun = lambda x: 0.5 * x @ Aj @ x - bj @ x
        x = jnp.zeros(A.shape[0], jnp.float32)
        for _ in range(SEGMENTS):
            x = lbfgs_minimize(fun, x, max_iters=ITERS,
                               history=HISTORY).x
        rel_fresh = np.linalg.norm(np.asarray(x) - xs_t[-1]) / (
            np.linalg.norm(xs_t[-1])
        )
        assert rel_cont < 0.01, rel_cont
        assert rel_fresh > rel_cont, (rel_fresh, rel_cont)
