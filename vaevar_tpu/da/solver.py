"""Outer variational solve loop with per-iteration diagnostics.

Mirrors the reference optimization protocol (da_4dvar.py:1109-1177,
1238-1306): Nit outer iterations, each running an L-BFGS segment
(strong-Wolfe) of `lbfgs_iters` quasi-Newton steps, with WRMSE/bias
diagnostics against truth evaluated between segments.

`VariationalSolver` jits the segment/diagnostic programs ONCE per run —
per-cycle data (xb, yo, H, R) are traced arguments (ObsBundle), so a
year-long cycled run compiles exactly one solve program.

Multi-chip: pass a `jax.sharding.Mesh` with spatial axes ("sh", "sw") —
the solve inputs (control variable, background, obs arrays) are committed
to (lat, lon)-sharded layouts and GSPMD partitions the whole jitted solve,
inserting ICI collectives for window shifts / convs / reductions. This is
the sharded-0.25deg design of SURVEY.md section 2c: the L-BFGS state
inherits the control variable's sharding, params stay replicated.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu import channels
from vaevar_tpu.da.cost import ObsBundle
from vaevar_tpu.da.lbfgs import (
    lbfgs_init_state,
    lbfgs_minimize,
    segment_carry_init,
)
from vaevar_tpu.utils import metrics as M


def window_dispatch_kwargs(mode: str, reducible: bool = True,
                           linesearch: str = "zoom") -> dict:
    """VariationalSolver kwargs for a DAConfig.window_dispatch mode
    ("iter" | "segment" | "fused") — identical optimizer trajectory at
    every granularity. "fused" is only honored on the reduced window
    quadratic: a full-grid window cost runs minutes per XLA program and
    trips the TPU-worker watchdog (docs/PERF.md). "fused" is also
    demoted to "segment" for forward-mode linesearches ("jvp-zoom", or
    "auto" which resolves to it whenever the cost allows): the fused
    nit-scan of the jvp-zoom window program wedged the remote XLA
    compile service for >75 min (2026-08-21, win6@1.4deg; the zoom
    equivalent compiles in ~10 min), while the per-segment jvp-zoom
    program compiles in ~15 min and RUNS 29%% faster than fused-zoom
    (docs/PERF.md round 5)."""
    if mode == "fused" and not reducible:
        mode = "iter"
    if mode == "fused" and linesearch in ("jvp-zoom", "auto"):
        mode = "segment"
    if mode == "fused":
        return {}
    return {
        "segment_dispatch": True,
        "iters_per_dispatch": 1 if mode == "iter" else None,
    }


@dataclass
class SolveDiagnostics:
    wrmse: list = field(default_factory=list)  # per outer iter, (69,)
    bias: list = field(default_factory=list)
    loss_reg: list = field(default_factory=list)
    loss_obs: list = field(default_factory=list)
    seconds: float = 0.0


class VariationalSolver:
    """Holds jit caches for one (cost, to_state) family across a whole run."""

    def __init__(
        self,
        cost: Callable,  # (x, bundle, params) -> scalar
        to_state: Callable,  # (x, bundle, params) -> (69, H, W)
        cost_parts: Callable,  # (x, bundle, params) -> (jb, jo)
        lbfgs_iters: int = 10,
        history: int = 10,
        mesh=None,  # jax.sharding.Mesh with "sh"/"sw" axes for spatial SPMD
        segment_dispatch: bool = False,
        iters_per_dispatch: int | None = None,
        max_segment_evals: int | None = None,
        linesearch: str = "zoom",
    ):
        """segment_dispatch=True keeps multiple short device dispatches
        instead of fusing the whole solve into a single XLA program. Use
        it when a single cost evaluation is heavy (4D-Var windows: da_win
        flow-model steps fwd+bwd per eval, each zoom-linesearch probe
        included) — a fused Nit*iters program then runs for many minutes
        on-device, which trips TPU-worker watchdogs and loses everything
        on preemption. iters_per_dispatch bounds the quasi-Newton
        iterations per dispatched program (default: lbfgs_iters, i.e. one
        dispatch per outer segment like the reference's .step() loop;
        1 = one dispatch per iteration). L-BFGS state continuation makes
        every granularity follow the identical optimizer trajectory."""
        self.mesh = mesh
        self.segment_dispatch = segment_dispatch
        ipd = (iters_per_dispatch or lbfgs_iters) if segment_dispatch \
            else lbfgs_iters  # fused/scan paths always run full segments
        ipd = max(1, min(ipd, lbfgs_iters))
        if lbfgs_iters % ipd:
            ipd = 1  # uneven split would overshoot; finest granularity
        self._ipd = ipd
        self._mean = jnp.asarray(channels.MEAN, jnp.float32).reshape(-1, 1, 1)
        self._std = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

        # torch's per-.step() closure-eval budget (max_eval = max_iter*5//4,
        # da_4dvar.py:1119,1240 leave it at the default): one OUTER segment
        # of lbfgs_iters iterations gets this many cost evals, regardless
        # of how many dispatched programs the segment is split into.
        # max_segment_evals overrides it (a large value disables budgeting;
        # note a BINDING budget makes the stop iteration sensitive to ulp-
        # level f32 differences between compilation contexts, so fused vs
        # dispatched solves only agree exactly when the budget doesn't bind)
        seg_evals = (max_segment_evals if max_segment_evals is not None
                     else lbfgs_iters * 5 // 4)
        self.max_segment_evals = seg_evals

        def diagnostics(x, bundle, params, gt0):
            xhat_n = (to_state(x, bundle, params) - self._mean) / self._std
            gt_n = (gt0 - self._mean) / self._std
            wrmse = M.weighted_rmse(xhat_n[None], gt_n[None]) * jnp.asarray(
                channels.STD
            )
            bias = M.weighted_bias((xhat_n - gt_n)[None]) * jnp.asarray(channels.STD)
            jb, jo = cost_parts(x, bundle, params)
            return wrmse, bias, jb, jo

        self.diagnostics = jax.jit(diagnostics)
        self.to_state = jax.jit(to_state)
        self._cost = cost
        self._to_state_raw = to_state
        self._diagnostics_raw = diagnostics
        self._lbfgs_iters = lbfgs_iters
        self._history = history
        self._fused_cache = {}
        self._scan_cache = {}
        # "auto" defers the linesearch choice to the first solve (forward-
        # mode probes whenever the cost supports jvp — see
        # ensure_programs); explicit modes build the jitted programs now.
        self.linesearch = linesearch
        if linesearch != "auto":
            self._build_programs(linesearch)

    def _build_programs(self, linesearch: str):
        """Construct the linesearch-dependent jitted programs.

        The reference creates ONE torch LBFGS per analysis and calls
        .step() Nit times (da_4dvar.py:1240,1298): optimizer state carries
        across the outer diagnostic iterations. `segment` therefore
        threads the optax state through."""
        cost, history, ipd = self._cost, self._history, self._ipd
        seg_evals = self.max_segment_evals

        def seg_init(x):
            return lbfgs_init_state(x, history=history, linesearch=linesearch)

        def segment(x, state, carry, bundle, params):
            res = lbfgs_minimize(
                lambda q: cost(q, bundle, params), x, max_iters=ipd,
                history=history, init_state=state,
                max_evals=seg_evals, seg_carry=carry,
                linesearch=linesearch,
            )
            return res.x, res.state, res.seg_carry

        self.linesearch = linesearch
        self._jvp_checked = linesearch != "jvp-zoom"
        self.seg_init = jax.jit(seg_init)
        self.segment = jax.jit(segment)
        self._segment_raw = segment
        self._seg_init_raw = seg_init

    def ensure_programs(self, x0, bundle, params):
        """Resolve linesearch="auto" (idempotent; no device work).

        "auto" picks "jvp-zoom" — forward-mode linesearch probes,
        trajectory-identical to "zoom" and 29% faster on the grinding
        1.4deg win6 north-star, parity-or-better elsewhere (docs/PERF.md
        round 5) — whenever the cost lowers under jax.jvp, falling back
        to "zoom" for reverse-only costs (custom-VJP flash attention).
        Callers that touch `seg_init`/`segment`/`_segment_raw` directly
        (bench AOT gates, profiling scripts) must call this first when
        the solver may have been built with "auto"."""
        if self.linesearch != "auto":
            return
        self._build_programs(
            "jvp-zoom" if self._jvp_compatible(x0, bundle, params)
            else "zoom"
        )

    def fused_solve(self, nit: int):
        """One jitted program for the whole solve when no per-iteration
        diagnostics are requested: lax.scan over the nit L-BFGS segments
        (state carried, per-segment closure-eval budget reset like torch's
        per-.step() max_eval) + final to_state — identical optimizer
        trajectory to the segmented path (the reference's diagnostics
        between .step() calls don't touch state)."""
        if nit not in self._fused_cache:

            def run(x0, bundle, params):
                def body(carry, _):
                    x, st = carry
                    x2, st2, _ = self._segment_raw(
                        x, st, segment_carry_init(), bundle, params
                    )
                    return (x2, st2), None

                (xf, _), _ = jax.lax.scan(
                    body, (x0, self._seg_init_raw(x0)), None, length=nit
                )
                return xf, self._to_state_raw(xf, bundle, params)

            self._fused_cache[nit] = jax.jit(run)
        return self._fused_cache[nit]

    def scan_solve(self, nit: int):
        """One jitted program for the whole diagnostics-enabled solve:
        lax.scan over the Nit segments with WRMSE/bias/Jb/Jo computed ON
        DEVICE before each segment (+ once after the last), so the verbose
        path costs zero host round-trips mid-solve. Same optimizer
        trajectory as the segmented path; the per-iteration printout the
        reference emits during optimization (da_4dvar.py:1269) is emitted
        from the returned stacked diagnostics afterwards."""
        if nit not in self._scan_cache:

            def run(x0, bundle, params, gt0):
                def body(carry, _):
                    x, st = carry
                    d = self._diagnostics_raw(x, bundle, params, gt0)
                    x2, st2, _ = self._segment_raw(
                        x, st, segment_carry_init(), bundle, params
                    )
                    return (x2, st2), d

                (xf, _), ds = jax.lax.scan(
                    body, (x0, self._seg_init_raw(x0)), None, length=nit
                )
                d_last = self._diagnostics_raw(xf, bundle, params, gt0)
                ds = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b[None]]), ds,
                    jax.tree.map(jnp.asarray, d_last),
                )
                return xf, self._to_state_raw(xf, bundle, params), ds

            self._scan_cache[nit] = jax.jit(run)
        return self._scan_cache[nit]

    def solve(
        self,
        x0,
        bundle: ObsBundle,
        params=None,
        nit: int = 4,
        gt=None,
        verbose: bool = True,
        name: str = "da",
    ):
        params = {} if params is None else params
        self.ensure_programs(x0, bundle, params)
        if not self._jvp_checked:
            self._assert_jvp_compatible(x0, bundle, params)
            self._jvp_checked = True
        if self.mesh is not None:
            x0, bundle, params, gt = self._shard_inputs(x0, bundle, params, gt)
        diag = SolveDiagnostics()
        t0 = time.time()
        if self.segment_dispatch:
            return self._solve_segmented(x0, bundle, params, nit, gt,
                                         verbose, name, diag, t0)
        if gt is None:  # no per-iter diagnostics: single fused program
            x, xa = self.fused_solve(nit)(x0, bundle, params)
            diag.seconds = time.time() - t0
            return x, xa, diag
        # diagnostics requested: one scanned program, print afterwards
        x, xa, (wrmse, bias, jb, jo) = self.scan_solve(nit)(
            x0, bundle, params, gt[0]
        )
        wrmse, bias = np.asarray(wrmse), np.asarray(bias)
        jb, jo = np.asarray(jb), np.asarray(jo)
        for kk in range(nit + 1):
            self._record_iter(diag, wrmse[kk], bias[kk], float(jb[kk]),
                              float(jo[kk]), kk, verbose, name)
        diag.seconds = time.time() - t0
        return x, xa, diag

    def _jvp_compatible(self, x0, bundle, params) -> bool:
        """Whether the cost lowers under forward-mode AD (abstract-shape
        jvp lowering; no compile, no device work — the custom_vjp
        complaint only fires at jit-lowering, not under eval_shape).

        The flash-attention ops (ops/pallas_attn.py, ops/flash.py) are
        `jax.custom_vjp` functions — reverse-mode only; `jax.jvp` raises
        at trace time. They activate whenever a mask-free attention stage
        has N >= flash_min_seq (the 0.25deg LG net's full-grid stage,
        N=16200) or lg_full_attn_first=True at large grids. Rather than
        introspect model configs (fragile), LOWER a jvp of the actual
        cost once per run."""
        def probe(x, b, p):
            return jax.jvp(
                lambda q: self._cost(q, b, p), (x,), (x,)
            )[1]

        # bundle/params are abstract TRACED args of the probe too — closed
        # over they'd be embedded as (multi-GiB at real-obs geometries)
        # lowering constants (house rule, CLAUDE.md)
        abstract, a_bundle, a_params = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                           jnp.asarray(a).dtype),
            (x0, bundle, params),
        )
        try:
            jax.jit(probe).lower(abstract, a_bundle, a_params)
        except TypeError as e:
            if "custom_vjp" not in str(e) and "forward-mode" not in str(e):
                raise
            return False
        return True

    def _assert_jvp_compatible(self, x0, bundle, params):
        """Fail EARLY and clearly when linesearch="jvp-zoom" was requested
        EXPLICITLY for a cost that forward-mode AD cannot trace (the
        "auto" mode instead falls back to "zoom" — see ensure_programs).
        """
        if not self._jvp_compatible(x0, bundle, params):
            raise ValueError(
                "lbfgs_linesearch='jvp-zoom' needs a forward-mode-"
                "differentiable cost, but this cost hits a custom-VJP "
                "flash-attention op (mask-free attention stage with "
                "N >= flash_min_seq — e.g. the 0.25deg LG net's full-grid "
                "stage, or lg_full_attn_first=True at large grids). "
                "Use lbfgs_linesearch='zoom' for this config, or raise "
                "flash_min_seq above the largest mask-free stage so the "
                "dense attention path (jvp-capable) is used instead."
            )

    @staticmethod
    def _record_iter(diag, wrmse, bias, jb, jo, kk, verbose, name):
        diag.wrmse.append(np.asarray(wrmse))
        diag.bias.append(np.asarray(bias))
        diag.loss_reg.append(jb)
        diag.loss_obs.append(jo)
        if verbose:
            w = np.asarray(wrmse)
            print(
                f"[{name}] iter {kk}: z500 {w[11]:.4g} q500 {w[24]:.4g} "
                f"t2m {w[2]:.4g} t850 {w[66]:.4g} u500 {w[37]:.4g} "
                f"v500 {w[50]:.4g} Jb {jb:.4g} Jo {jo:.4g}",
                flush=True,
            )

    def _solve_segmented(self, x0, bundle, params, nit, gt, verbose, name,
                         diag, t0):
        """Per-segment dispatch with carried L-BFGS state (identical
        trajectory to the fused/scanned paths)."""
        x = x0
        opt_state = self.seg_init(x0)
        for kk in range(nit + 1):
            if gt is not None:
                wrmse, bias, jb, jo = self.diagnostics(x, bundle, params,
                                                       gt[0])
                self._record_iter(diag, wrmse, bias, float(jb), float(jo),
                                  kk, verbose, name)
            if kk < nit:
                carry = segment_carry_init()  # per-segment stop-rule reset
                for _ in range(self._lbfgs_iters // self._ipd):
                    x, opt_state, carry = self.segment(x, opt_state, carry,
                                                       bundle, params)
        diag.seconds = time.time() - t0
        return x, self.to_state(x, bundle, params), diag

    def _shard_inputs(self, x0, bundle, params, gt):
        """Commit solve inputs to (lat, lon) shardings; GSPMD propagates
        through the jitted programs from these layouts.

        Works for both bundle types: ObsBundle fields are (..., H, W)
        grids sharded over sh/sw; ReducedObs additionally carries the 0-d
        `c`, which (like any sub-2-d field) is replicated."""
        from jax.sharding import PartitionSpec as P

        from vaevar_tpu.parallel import mesh as pmesh

        m = self.mesh

        def sh(a):
            nd = jnp.ndim(a)
            # broadcastable fields (e.g. per-channel R, (T, C, 1, 1))
            # replicate: size-1 spatial dims can't split over sh/sw
            full = nd >= 2 and a.shape[-1] > 1 and a.shape[-2] > 1
            spec = pmesh.state_spec_for(m, a.shape) if full else P()
            return pmesh.shard(a, m, spec)

        x0 = sh(x0)
        bundle = type(bundle)(*(sh(f) for f in bundle))
        # introspection for tests/diagnostics: which layout each obs field
        # actually got (e.g. the (T, 204, H, W) real-obs tensors MUST be
        # partitioned — at 0.25deg they exceed one chip's HBM replicated)
        self._last_bundle_shardings = {
            name: getattr(f, "sharding", None)
            for name, f in zip(bundle._fields, bundle)
        }
        # replicate_missing keeps deliberate placements (tensor-parallel
        # kernels, expert banks) so tp x sh x sw meshes compose
        params = pmesh.replicate_missing(params, m)
        if gt is not None:
            gt = sh(gt)
        return x0, bundle, params, gt
