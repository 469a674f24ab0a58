"""Variational cost functions J(z) / J(w) as pure jitted functions.

vae4dvar (da_4dvar.py:1183-1208):
    x0 = xb + decoder_hr(z) * err_std * model_std
    J(z) = 1/2 ||z||^2 + obs_coeff * 1/2 sum_t H (M_t(x0) - yo)^2 / R

sc4dvar (da_4dvar.py:1064-1101):
    J(w) = 1/2 ||w||^2 + obs_coeff * Jo(B^1/2 w + xb)

Builders close over *static structure* only (apply fns, config). Everything
numeric travels as traced arguments: per-cycle data in an `ObsBundle`, model
weights in a `params` dict ({"decoder": ..., "flow": ...}). One jit
compilation therefore serves the entire cycled run AND weights never become
XLA constants (closure weights trigger pathological constant-folding of
transposes in the backward; measured ~10x compile-time inflation).

The window rollout M_t is the hourly flow model applied inside the cost with
rematerialized reverse-mode AD (da/dynamics.rollout_window). For "real" obs
the predicted state is augmented to the 204-channel observation-level space
before the innovation (da_4dvar.py:1196-1206).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vaevar_tpu import channels
from vaevar_tpu.da.dynamics import make_integrate, rollout_window
from vaevar_tpu.ops.interp import augment_levels, resize_nearest


class ObsBundle(NamedTuple):
    """Per-cycle data: background + observations (all device arrays)."""

    xb: jnp.ndarray  # (69, H, W)
    yo: jnp.ndarray  # (T, C_obs, H, W)
    H: jnp.ndarray  # (T, C_obs, H, W)
    R: jnp.ndarray  # broadcastable against yo: (T, C_obs, 1, 1) from
    # obs.build_R (R never varies spatially in any supported q_type), or
    # full (T, C_obs, H, W)


class ReducedObs(NamedTuple):
    """Obs term pre-reduced onto the solver grid (da_win=1 only).

    For nearest upsampling the analysis is piecewise-constant per solver
    cell, so Jo(e) = 1/2 sum_cells [a e^2 - 2 b e + c] EXACTLY, with e the
    low-res increment and per-cell sums over the full-resolution grid:
        a = sum H/R,  b = sum (H/R)(yo - xb),  c = sum (H/R)(yo - xb)^2.
    This turns every L-BFGS cost/grad evaluation's O(69*721*1440)
    obs work + fwd/bwd resize into O(69*128*256); the reduction itself is
    two thin one-time matmuls per cycle (MXU-cheap)."""

    xb: jnp.ndarray  # (69, H, W) full-resolution background
    a: jnp.ndarray  # (C, h, w)
    b: jnp.ndarray  # (C, h, w)
    c: jnp.ndarray  # ()


def reduce_obs(bundle: ObsBundle, low_hw) -> ReducedObs:
    """Exact reduction of (yo, H, R) onto the solver grid (see ReducedObs).
    Valid when da_win == 1 and the increment is nearest-upsampled."""
    from vaevar_tpu.ops.interp import _nearest_idx

    Hf, Wf = bundle.xb.shape[-2:]
    hl, wl = low_hw
    hi = _nearest_idx(Hf, hl)
    wi = _nearest_idx(Wf, wl)
    Mh = jnp.asarray(np.eye(hl, dtype=np.float32)[hi])  # (Hf, hl)
    Mw = jnp.asarray(np.eye(wl, dtype=np.float32)[wi])  # (Wf, wl)

    w = bundle.H[0] / bundle.R[0]  # (C, Hf, Wf)
    r = bundle.yo[0] - bundle.xb  # innovation at full res

    def down(t):
        return jnp.einsum(
            "chw,hi,wj->cij", t, Mh, Mw, preferred_element_type=jnp.float32
        )

    a = down(w)
    b = down(w * r)
    c = jnp.sum(w * r * r)
    return ReducedObs(xb=bundle.xb, a=a, b=b, c=c)


class ReducedWindowObs(NamedTuple):
    """Window (da_win > 1) obs term pre-reduced onto the solver grid.

    Valid when the flow rollout runs with nearest resize to/from the
    solver grid (dynamics.make_integrate interpolation semantics,
    da_4dvar.py:671-679) and obs channels are unaugmented: the slot-t
    full-resolution prediction is EXACTLY up(m_t) with m_t on the coarse
    grid (and xb + up(e) for slot 0), where the coarse states obey
    m_1 = M(down(xb) + S e), m_{t+1} = M(S m_t) with S = down∘up — a
    STATIC coarse->coarse resampling gather under the torch floor-index
    nearest convention (S = identity only at integer grid ratios).
    Every slot's 1/2 sum H (pred - yo)^2 / R therefore collapses to a
    per-coarse-cell quadratic in the coarse prediction:

        slot 0:   p_0 = e (the low-res increment), target yo_0 - xb
        slot t>0: p_t = x_t_low (physical coarse state), target yo_t

    stored in the CELL-CENTERED form (ybar = weighted cell-mean target,
    sum_cell w (tgt - ybar) = 0 exactly, so the cross term vanishes):

        Jo_t = 1/2 [ sum a_t (p_t - ybar_t)^2 + c_t ]
        a_t = sum_cell w_t,  ybar_t = sum_cell (w_t tgt_t) / a_t,
        c_t = sum w_t (tgt_t - ybar_t)^2,   w_t = H_t / R_t.

    The centered form matters numerically: the naive expansion
    sum a p^2 - 2 b p + c cancels ~4 f32 digits when p is a raw physical
    state (z500 ~ 5e4), whereas p - ybar is innovation-sized.

    The L-BFGS segment program then holds NO full-resolution arrays at
    all (the lax-scan/full-grid form needed 12-18 GB of HBM at da_win=6
    / 0.25deg — over a v5e chip), and each cost/grad evaluation does its
    obs work at (h, w) instead of (H, W)."""

    xb: jnp.ndarray  # (69, H, W) full-res background (used by to_state)
    xb_low: jnp.ndarray  # (69, h, w) nearest-sampled background
    a: jnp.ndarray  # (T, C, h, w)
    ybar: jnp.ndarray  # (T, C, h, w) weighted cell-mean target
    c: jnp.ndarray  # (T,)


def reduce_obs_window(bundle: ObsBundle, low_hw) -> ReducedWindowObs:
    """Exact per-slot reduction of (yo, H, R) onto the solver grid (see
    ReducedWindowObs). One-time per-cycle cost: two thin einsums over the
    (T, C, H, W) obs arrays — MXU work outside the optimization loop."""
    from vaevar_tpu.ops.interp import _nearest_idx

    Hf, Wf = bundle.xb.shape[-2:]
    hl, wl = low_hw
    Mh = jnp.asarray(np.eye(hl, dtype=np.float32)[_nearest_idx(Hf, hl)])
    Mw = jnp.asarray(np.eye(wl, dtype=np.float32)[_nearest_idx(Wf, wl)])

    w = bundle.H / bundle.R  # (T, C, Hf, Wf); R broadcasts
    tgt = jnp.concatenate(
        [bundle.yo[:1] - bundle.xb[None], bundle.yo[1:]], axis=0
    )

    def down(t):
        return jnp.einsum(
            "schw,hi,wj->scij", t, Mh, Mw, preferred_element_type=jnp.float32
        )

    a = down(w)
    ybar = jnp.where(a > 0, down(w * tgt) / jnp.where(a > 0, a, 1.0), 0.0)
    dev = tgt - resize_nearest(ybar, (Hf, Wf))
    return ReducedWindowObs(
        xb=bundle.xb,
        xb_low=resize_nearest(bundle.xb, low_hw),
        a=a,
        ybar=ybar,
        c=jnp.sum(w * dev * dev, axis=(1, 2, 3)),
    )


def _resample_gather(n_full: int, n_low: int) -> np.ndarray:
    """Index table of S = down∘up on one axis (see ReducedWindowObs)."""
    from vaevar_tpu.ops.interp import _nearest_idx

    down = _nearest_idx(n_low, n_full)  # coarse j -> fine row
    up = _nearest_idx(n_full, n_low)  # fine f -> coarse cell
    return up[down]


def _make_window_obs_reduced(increment: Callable, flow_apply: Callable,
                             da_win: int, step_checkpoint: bool = True):
    """Jo over the window from a ReducedWindowObs: the hourly rollout runs
    NATIVELY on the solver grid — the full path's per-step up/down
    resizes collapse to the static gather S (see ReducedWindowObs) —
    with one jax.checkpoint per step."""
    if da_win > 1 and flow_apply is None:
        raise ValueError(
            "reduced window cost requires a flow model for da_win > 1 "
            "(the persistence fallback scores xb + up(e) against every "
            "slot, which only reduces in innovation form — use the full "
            "windowed cost)"
        )

    def quad(a_t, ybar_t, c_t, p):
        d = p - ybar_t
        return 0.5 * (jnp.sum(a_t * d * d) + c_t)

    def window_obs(x, bundle: ReducedWindowObs, params):
        e = increment(x, params)  # (69, h, w) physical increment
        jo = quad(bundle.a[0], bundle.ybar[0], bundle.c[0], e)
        if da_win == 1:
            return jo
        Hf, Wf = bundle.xb.shape[-2:]
        hl, wl = e.shape[-2:]
        gh = _resample_gather(Hf, hl)
        gw = _resample_gather(Wf, wl)
        if np.array_equal(gh, np.arange(hl)) and np.array_equal(
            gw, np.arange(wl)
        ):
            S = lambda v: v
        else:
            S = lambda v: v[..., gh, :][..., gw]
        integrate = make_integrate(flow_apply)
        flow_params = params["flow"]
        step = lambda s: integrate(flow_params, s, 1)
        if step_checkpoint:
            step = jax.checkpoint(step)
        nxt = bundle.xb_low + S(e)  # down(xb + up(e)), exactly
        for t in range(1, da_win):
            m = step(nxt)
            jo = jo + quad(bundle.a[t], bundle.ybar[t], bundle.c[t], m)
            nxt = S(m)
        return jo

    return window_obs


def make_vae4dvar_cost_window_reduced(
    decoder_apply: Callable,
    flow_apply: Callable | None = None,
    da_win: int = 1,
    obs_coeff: float = 1.0,
    err_std=None,
    step_checkpoint: bool = True,
):
    """4D-Var vae4dvar cost on the REDUCED window quadratic (see
    ReducedWindowObs): identical J to make_vae4dvar_cost up to float
    associativity; no full-resolution tensors inside the L-BFGS program."""
    err = jnp.asarray(
        channels.ERR_STD if err_std is None else err_std, jnp.float32
    ).reshape(-1, 1, 1)
    mstd = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def increment(z, params):
        return decoder_apply(params["decoder"], z)[0].astype(
            jnp.float32
        ) * err * mstd

    window_obs = _make_window_obs_reduced(increment, flow_apply, da_win,
                                          step_checkpoint)

    def to_state(z, bundle: ReducedWindowObs, params):
        e = increment(z, params)
        return bundle.xb + resize_nearest(e, bundle.xb.shape[-2:])

    def cost(z, bundle: ReducedWindowObs, params):
        return 0.5 * jnp.sum(z**2) + obs_coeff * window_obs(z, bundle,
                                                            params)

    def cost_parts(z, bundle: ReducedWindowObs, params):
        # Jo unscaled, matching make_vae4dvar_cost (da_4dvar.py:1269).
        return 0.5 * jnp.sum(z**2), window_obs(z, bundle, params)

    return cost, to_state, cost_parts


def make_sc4dvar_cost_window_reduced(
    increment: Callable,
    flow_apply: Callable | None = None,
    da_win: int = 1,
    obs_coeff: float = 1.0,
    step_checkpoint: bool = True,
):
    """4D-Var sc4dvar cost on the REDUCED window quadratic: the CVT
    increment is nearest-upsampled (da_4dvar.py:928), so the same per-slot
    reduction as vae4dvar applies. `increment(w)` = B^1/2 w on the solver
    grid (CVTransform.increment)."""

    def inc(w, params):
        del params
        return increment(w)

    window_obs = _make_window_obs_reduced(inc, flow_apply, da_win,
                                          step_checkpoint)

    def to_state(w, bundle: ReducedWindowObs, params):
        del params
        return bundle.xb + resize_nearest(
            increment(w), bundle.xb.shape[-2:]
        )

    def cost(w, bundle: ReducedWindowObs, params):
        return 0.5 * jnp.sum(w**2) + obs_coeff * window_obs(w, bundle,
                                                            params)

    def cost_parts(w, bundle: ReducedWindowObs, params):
        return 0.5 * jnp.sum(w**2), window_obs(w, bundle, params)

    return cost, to_state, cost_parts


def obs_term(x_pred, bundle: ObsBundle, interp_matrix=None):
    """1/2 sum H (x_pred - yo)^2 / R with optional level augmentation."""
    if interp_matrix is not None:
        x_pred = augment_levels(x_pred, interp_matrix)
    return 0.5 * jnp.sum(bundle.H * (x_pred - bundle.yo) ** 2 / bundle.R)


def _window_predict(x0, flow_apply, flow_hw, da_win, params):
    if da_win == 1 or flow_apply is None:
        return x0[None]
    integrate = make_integrate(flow_apply, flow_hw)
    flow_params = params["flow"]

    def flow_step(x):
        return integrate(flow_params, x, 1, interpolation=True)

    return rollout_window(x0, flow_step, da_win)


def _make_window_obs(flow_apply, flow_hw, da_win, interp_matrix):
    """Jo accumulated INSIDE the remat'd rollout scan.

    Materializing all da_win predicted states and their 204-channel
    augmented innovations at once (the reference's structure,
    da_4dvar.py:1190-1206) costs ~13 GB of XLA temp at 128x256 — past a
    v5e's HBM alongside the resident models. Folding each slot's obs
    quadratic into the rollout step bounds the live set to ONE slot;
    jax.checkpoint recomputes the step (flow fwd + augment) in the
    backward. Same J up to float associativity.
    """

    def jo_slot(x, yo_t, h_t, r_t):
        p = x[None]
        if interp_matrix is not None:
            p = augment_levels(p, interp_matrix)
        return 0.5 * jnp.sum(h_t * (p[0] - yo_t) ** 2 / r_t)

    def window_obs(x0, bundle, params):
        if flow_apply is None and da_win > 1:
            # no flow model: persistence — x0 scored against EVERY slot
            # (the materialized obs_term's broadcast semantics)
            return obs_term(x0[None], bundle, interp_matrix)
        jo = jo_slot(x0, bundle.yo[0], bundle.H[0], bundle.R[0])
        if da_win == 1:
            return jo
        integrate = make_integrate(flow_apply, flow_hw)
        flow_params = params["flow"]

        def step(x, yo_t, h_t, r_t):
            x = integrate(flow_params, x, 1, interpolation=True)
            return x, jo_slot(x, yo_t, h_t, r_t)

        # unrolled with STATIC slot slices, one jax.checkpoint per step:
        # same bounded live set as a scanned body, but no dynamic-slice of
        # the stacked (T, C, H, W) obs arrays — a lax.scan + jnp.take form
        # forced XLA to hold yo/H twice (argument layout + while-body
        # layout), ~7 GB of pure layout copies at da_win=6/0.25deg that
        # pushed the window program past v5e HBM
        step = jax.checkpoint(step)
        x = x0
        for t in range(1, da_win):
            x, jo_t = step(x, bundle.yo[t], bundle.H[t], bundle.R[t])
            jo = jo + jo_t
        return jo

    return window_obs


def make_vae4dvar_cost(
    decoder_apply: Callable,
    flow_apply: Callable | None = None,
    flow_hw=(128, 256),
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
    err_std=None,
):
    """Returns (cost, decode_to_state, cost_parts): fns of (x, bundle, params).

    decoder_apply(params["decoder"], z) -> (1, 69, h', w') raw decoder output
    at the latent grid; nearest-upsampled to xb's grid, scaled by
    err_std*model_std and added to xb (da_4dvar.py:1185-1188).
    """
    err = jnp.asarray(
        channels.ERR_STD if err_std is None else err_std, jnp.float32
    ).reshape(-1, 1, 1)
    mstd = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def decode_to_state(z, bundle: ObsBundle, params):
        d = decoder_apply(params["decoder"], z)[0]  # (69, h', w')
        d = resize_nearest(d, bundle.xb.shape[-2:])
        return bundle.xb + d * err * mstd

    window_obs = _make_window_obs(flow_apply, flow_hw, da_win, interp_matrix)

    def cost(z, bundle: ObsBundle, params):
        x0 = decode_to_state(z, bundle, params)
        return 0.5 * jnp.sum(z**2) + obs_coeff * window_obs(x0, bundle,
                                                            params)

    def cost_parts(z, bundle: ObsBundle, params):
        x0 = decode_to_state(z, bundle, params)
        return 0.5 * jnp.sum(z**2), window_obs(x0, bundle, params)

    return cost, decode_to_state, cost_parts


def make_vae4dvar_cost_reduced(decoder_apply: Callable, obs_coeff: float = 1.0,
                               err_std=None):
    """3D-Var (da_win=1) vae4dvar cost on the REDUCED obs quadratic
    (see ReducedObs): bundle is a ReducedObs; identical J to
    make_vae4dvar_cost up to float associativity, ~30x less obs work per
    L-BFGS evaluation at 0.25deg."""
    err = jnp.asarray(
        channels.ERR_STD if err_std is None else err_std, jnp.float32
    ).reshape(-1, 1, 1)
    mstd = jnp.asarray(channels.STD, jnp.float32).reshape(-1, 1, 1)

    def increment(z, params):
        return decoder_apply(params["decoder"], z)[0].astype(
            jnp.float32
        ) * err * mstd  # (69, h, w) low-res increment e

    def decode_to_state(z, bundle: ReducedObs, params):
        e = increment(z, params)
        return bundle.xb + resize_nearest(e, bundle.xb.shape[-2:])

    def obs_quad(z, bundle: ReducedObs, params):
        e = increment(z, params)
        return 0.5 * (
            jnp.sum(bundle.a * e * e) - 2.0 * jnp.sum(bundle.b * e)
            + bundle.c
        )

    def cost(z, bundle: ReducedObs, params):
        return 0.5 * jnp.sum(z**2) + obs_coeff * obs_quad(z, bundle, params)

    def cost_parts(z, bundle: ReducedObs, params):
        # Jo returned UNSCALED, matching make_vae4dvar_cost and the
        # reference's loss_obs printout (da_4dvar.py:1269 applies obs_coeff
        # only when summing the total).
        return 0.5 * jnp.sum(z**2), obs_quad(z, bundle, params)

    return cost, decode_to_state, cost_parts


def make_sc4dvar_cost_reduced(increment: Callable, obs_coeff: float = 1.0):
    """3D-Var (da_win=1) sc4dvar cost on the REDUCED obs quadratic: the CVT
    output is nearest-upsampled (da_4dvar.py:928, F.interpolate default), so
    the same per-cell reduction as vae4dvar applies. `increment(w)` is
    CVTransform.increment: B^1/2 w on the solver grid."""

    def to_state(w, bundle: ReducedObs, params):
        del params
        e = increment(w)
        return bundle.xb + resize_nearest(e, bundle.xb.shape[-2:])

    def obs_quad(w, bundle: ReducedObs):
        e = increment(w)
        return 0.5 * (
            jnp.sum(bundle.a * e * e) - 2.0 * jnp.sum(bundle.b * e) + bundle.c
        )

    def cost(w, bundle: ReducedObs, params):
        del params
        return 0.5 * jnp.sum(w**2) + obs_coeff * obs_quad(w, bundle)

    def cost_parts(w, bundle: ReducedObs, params):
        del params
        # Jo unscaled, matching make_sc4dvar_cost (see vae4dvar note).
        return 0.5 * jnp.sum(w**2), obs_quad(w, bundle)

    return cost, to_state, cost_parts


def make_sc4dvar_cost(
    transform: Callable,
    flow_apply: Callable | None = None,
    flow_hw=(128, 256),
    da_win: int = 1,
    obs_coeff: float = 1.0,
    interp_matrix=None,
):
    """Returns (cost, to_state, cost_parts): fns of (w, bundle, params).

    `transform` is the CVT B^1/2 (static linear tables, no trainable params,
    so closing over them is fine — they are never transposed in matmuls)."""

    def to_state(w, bundle: ObsBundle, params):
        del params
        return transform(w, bundle.xb)

    window_obs = _make_window_obs(flow_apply, flow_hw, da_win, interp_matrix)

    def cost(w, bundle: ObsBundle, params):
        x0 = to_state(w, bundle, params)
        return 0.5 * jnp.sum(w**2) + obs_coeff * window_obs(x0, bundle,
                                                            params)

    def cost_parts(w, bundle: ObsBundle, params):
        x0 = to_state(w, bundle, params)
        return 0.5 * jnp.sum(w**2), window_obs(x0, bundle, params)

    return cost, to_state, cost_parts
