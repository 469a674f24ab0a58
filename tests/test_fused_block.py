"""Fused Pallas Swin block kernel (ops/fused_block.py) vs the modular Block.

The model-level `fuse_blocks` flag was RETIRED in round 4 (three rounds of
measurement showed the fused forward matches modular XLA +-5% — the
enc/dec stages are latency-bound by the architecture's tiny dims, see
docs/PERF.md). The kernel remains as an ops-level primitive; these tests
pin it against the modular Block by loading the SAME trained param tree
into the kernel's flat param dict, plus the interpret-mode kernel-vs-
reference and biasmask-structure pins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu.models import lgunet as L
from vaevar_tpu.ops import fused_block as F


def _mk_blocks(shift, dim=32, heads=2, res=(16, 24), win=(4, 4), dtype=None):
    """Modular Block + a callable running ops.fused_block on the SAME
    param tree (the mapping the retired model flag used to apply)."""
    kw = dict(dim=dim, num_heads=heads, window_size=win, shift_size=shift,
              resolution=res, attn_type="relbias", dtype=dtype)
    mod = L.Block(**kw)

    class _Fused:
        def init(self, rng, x):
            return mod.init(rng, x)

        def apply(self, p, x):
            t = p["params"]
            flat = dict(
                ln1_scale=t["norm1"]["scale"], ln1_bias=t["norm1"]["bias"],
                qkv_kernel=t["attn"]["qkv"]["kernel"],
                qkv_bias=t["attn"]["qkv"]["bias"],
                proj_kernel=t["attn"]["proj"]["kernel"],
                proj_bias=t["attn"]["proj"]["bias"],
                ln2_scale=t["norm2"]["scale"], ln2_bias=t["norm2"]["bias"],
                fc1_kernel=t["mlp"]["fc1"]["kernel"],
                fc1_bias=t["mlp"]["fc1"]["bias"],
                fc2_kernel=t["mlp"]["fc2"]["kernel"],
                fc2_bias=t["mlp"]["fc2"]["bias"],
            )
            tab = t["attn"]["rel_bias_table"]
            if dtype is not None:
                x = x.astype(dtype)
            return F.fused_swin_block(x, flat, tab, window=win, shift=shift,
                                      heads=heads, eps=1e-5)

    return mod, _Fused()


class TestNumerics:
    @pytest.mark.parametrize("shift", [(0, 0), (2, 2)])
    @pytest.mark.slow
    def test_matches_modular_f32(self, shift):
        mod, fus = _mk_blocks(shift)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 24, 32)), jnp.float32
        )
        p = mod.init(jax.random.PRNGKey(1), x)
        y_mod = mod.apply(p, x)
        y_fus = fus.apply(p, x)  # same tree loads directly
        np.testing.assert_allclose(
            np.asarray(y_mod), np.asarray(y_fus), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("shift", [(0, 0), (2, 2)])
    @pytest.mark.slow
    def test_matches_modular_bf16(self, shift):
        mod, fus = _mk_blocks(shift, dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 24, 32)), jnp.float32
        )
        p = mod.init(jax.random.PRNGKey(1), x)
        y_mod = np.asarray(mod.apply(p, x), np.float32)
        y_fus = np.asarray(fus.apply(p, x), np.float32)
        scale = np.abs(y_mod).max()
        np.testing.assert_allclose(y_mod / scale, y_fus / scale, atol=3e-2)

    @pytest.mark.slow
    def test_grads_match_modular(self):
        mod, fus = _mk_blocks((2, 2))
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 16, 24, 32)), jnp.float32
        )
        p = mod.init(jax.random.PRNGKey(1), x)

        def loss(m, pp, xx):
            return jnp.sum(jnp.sin(m.apply(pp, xx)))

        gx_m, gp_m = jax.grad(lambda xx, pp: loss(mod, pp, xx), (0, 1))(x, p)
        gx_f, gp_f = jax.grad(lambda xx, pp: loss(fus, pp, xx), (0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_f),
                                   rtol=1e-4, atol=1e-4)
        for km, kf in zip(
            jax.tree_util.tree_leaves(gp_m), jax.tree_util.tree_leaves(gp_f)
        ):
            np.testing.assert_allclose(np.asarray(km), np.asarray(kf),
                                       rtol=1e-4, atol=1e-4)


class TestKernelInterpret:
    @pytest.mark.parametrize("shift", [(0, 0), (2, 2)])
    def test_pallas_kernel_matches_reference(self, shift):
        """Interpret-mode kernel == pure-jnp reference on tiny shapes."""
        rng = np.random.default_rng(3)
        B, H, W, C, heads = 1, 8, 8, 16, 2
        wh = ww = 4
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
        tab = jnp.asarray(rng.normal(size=(49, heads)) * 0.1, jnp.float32)
        p = {
            "ln1_scale": jnp.ones(C), "ln1_bias": jnp.zeros(C),
            "qkv_kernel": jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1,
                                      jnp.float32),
            "qkv_bias": jnp.zeros(3 * C),
            "proj_kernel": jnp.asarray(rng.normal(size=(C, C)) * 0.1,
                                       jnp.float32),
            "proj_bias": jnp.zeros(C),
            "ln2_scale": jnp.ones(C), "ln2_bias": jnp.zeros(C),
            "fc1_kernel": jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1,
                                      jnp.float32),
            "fc1_bias": jnp.zeros(4 * C),
            "fc2_kernel": jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1,
                                      jnp.float32),
            "fc2_bias": jnp.zeros(C),
        }
        sh, sw = shift
        bm = F.build_biasmask(tab, W=W, wh=wh, ww=ww, sh=sh, sw=sw)
        xr = jnp.roll(x, (-sh, -sw), (1, 2)) if (sh or sw) else x
        y_ref = F.block_reference(xr, bm, p, wh=wh, heads=heads, eps=1e-5)
        y_ker = F._pallas_block(xr, bm, p, wh=wh, heads=heads, eps=1e-5,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_ker),
                                   rtol=1e-5, atol=1e-5)


class TestBiasmask:
    def test_structure(self):
        """Cross-window pairs blocked; in-window pairs carry the table."""
        heads, wh, ww, W = 1, 4, 4, 8
        tab = jnp.arange(49, dtype=jnp.float32).reshape(49, 1)
        bm = np.asarray(F.build_biasmask(tab, W=W, wh=wh, ww=ww, sh=0, sw=0))
        TT = wh * W
        assert bm.shape == (2, heads, TT, TT)
        # token (r=0,c=0) and (r=0,c=4): different windows
        assert bm[0, 0, 0, 4] <= -1e8
        # same token: rel index center (wh-1)*(2ww-1)+(ww-1) = 24
        assert bm[0, 0, 0, 0] == 24.0
        # query (0,0) vs key (1,1) same window: dh=-1, dw=-1 -> idx 16
        t2 = 1 * W + 1
        assert bm[0, 0, 0, t2] == 16.0

    def test_boundary_mask_matches_swin_mask(self):
        """Boundary slot == interior bias + swin_attention_mask pattern of
        the last window row."""
        from vaevar_tpu.ops.windows import swin_attention_mask

        wh = ww = 4
        H, W = 16, 8
        sh = sw = 2
        tab = jnp.zeros((49, 2), jnp.float32)
        bm = np.asarray(F.build_biasmask(tab, W=W, wh=wh, ww=ww, sh=sh,
                                         sw=sw))
        ref = swin_attention_mask(H, W, (wh, ww), (sh, sw), neg=-100.0)
        # last window-row mask (N, N), same for both windows in the row
        last = ref[-1]
        # map raster slab -> window order for window col-block 0
        TT = wh * W
        r = np.arange(TT) // W
        c = np.arange(TT) % W
        sel = np.where(c < ww)[0]  # tokens of window 0, raster order
        n_order = r[sel] * ww + c[sel]
        got = bm[1, 0][np.ix_(sel, sel)]
        want = last[np.ix_(n_order, n_order)]
        # window-0 in-window additive mask must equal the reference's
        np.testing.assert_allclose(got, want, atol=1e-6)
