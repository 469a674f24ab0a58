"""Layer zoo: shapes, semantics, and MoE routing invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu.models import zoo
from vaevar_tpu.ops import moe as moe_ops
from vaevar_tpu.ops import posenc
from vaevar_tpu.ops import rope as rope_ops

K0 = jax.random.PRNGKey(0)


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def _run(module, *args):
    params = module.init(K0, *args)
    return module.apply(params, *args)


class TestPosenc:
    def test_sinusoidal_shapes(self):
        assert posenc.positional_encoding_1d(10, 6).shape == (10, 6)
        assert posenc.positional_encoding_2d(4, 8, 10).shape == (4, 8, 10)
        assert posenc.positional_encoding_3d(2, 4, 8, 12).shape == (2, 4, 8, 12)

    def test_sinusoidal_values_bounded_distinct(self):
        e = posenc.positional_encoding_2d(8, 16, 16)
        assert np.abs(e).max() <= 1.0 + 1e-6
        assert not np.allclose(e[0, 0], e[3, 7])

    def test_sincos_posemb(self):
        e = posenc.build_2d_sincos_posemb(4, 8, 64)
        assert e.shape == (1, 32, 64)
        # sin^2 + cos^2 = 1 per frequency pair
        s, c = e[0, :, :16], e[0, :, 16:32]
        np.testing.assert_allclose(s**2 + c**2, 1.0, atol=1e-5)

    def test_relative_position_index_symmetric_diag(self):
        idx = posenc.relative_position_index((3, 5))
        assert idx.shape == (15, 15)
        # the diagonal (zero offset) maps to a single table entry
        assert len(set(np.diag(idx))) == 1
        assert idx.max() < 5 * 9

    def test_rope3_norm_preserving(self):
        shape, d = (2, 3, 4), 12
        tables = rope_ops.rope3_tables(shape, d)
        x = _x((5, np.prod(shape), d))
        y = rope_ops.apply_rope3(x, tables)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )
        # position 0 is the identity rotation
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-6
        )


class TestMoEOps:
    def test_router_z_loss_matches_formula(self):
        logits = _x((2, 10, 4))
        expected = float(
            np.mean(
                np.log(np.sum(np.exp(np.asarray(logits)), axis=-1)) ** 2
            )
        )
        assert abs(float(moe_ops.router_z_loss(logits)) - expected) < 1e-5

    def test_balance_loss_uniform_is_one(self):
        # perfectly uniform routing + uniform probs -> loss == 1
        E, T = 4, 64
        idx = jnp.asarray(np.arange(T) % E)
        probs = jnp.full((T, E), 1.0 / E)
        assert abs(float(moe_ops.load_balancing_loss(probs, idx, E)) - 1.0) < 1e-5

    def test_capacity_mask_drops_overflow(self):
        idx = jnp.zeros(8, jnp.int32)  # all tokens to expert 0
        m = moe_ops.capacity_mask(idx, 4, 1.0)  # capacity = 2
        assert float(m[:, 0].sum()) == 2.0  # only first 2 kept
        m_all = moe_ops.capacity_mask(idx, 4, 1.0, drop_tokens=False)
        assert float(m_all[:, 0].sum()) == 8.0

    def test_moe_combine_identity_for_dropped(self):
        x = _x((4, 3))
        outs = jnp.zeros((2, 4, 3))
        mask = jnp.zeros((4, 2))  # nothing routed
        probs = jnp.full((4,), 0.7)
        y = moe_ops.moe_combine(outs, mask, probs, x)
        # dropped tokens pass through, then the reference scales every
        # token by its top router prob (moe_utils.py:336-347)
        np.testing.assert_allclose(
            np.asarray(y), 0.7 * np.asarray(x), atol=1e-6
        )


HW = (8, 16)


class TestAttentionZoo:
    def test_cross_attention(self):
        m = zoo.CrossAttention(32, (2, 4), 4)
        y = _run(m, _x((2, *HW, 32)), _x((2, *HW, 32), 1))
        assert y.shape == (2, *HW, 32)

    def test_conv_attention(self):
        m = zoo.ConvAttention(32, (4, 4), 2)
        y = _run(m, _x((1, *HW, 32)))
        assert y.shape == (1, *HW, 32)

    def test_dilated_attention_matches_window_grouping(self):
        m = zoo.DilatedAttention(16, (2, 4), 2, dilated_size=(2, 2))
        y = _run(m, _x((1, 8, 16, 16)))
        assert y.shape == (1, 8, 16, 16)

    def test_dilated_identity_dilation_runs(self):
        m = zoo.DilatedAttention(16, (4, 4), 2, dilated_size=(1, 1))
        y = _run(m, _x((1, 8, 16, 16)))
        assert jnp.isfinite(y).all()

    def test_gau_attention_lin_and_quad(self):
        for t in ("lin", "quad"):
            m = zoo.GAUAttention(16, (4, 4), attn_type=t, s=8)
            y = _run(m, _x((1, *HW, 16)))
            assert y.shape == (1, *HW, 16), t

    def test_hydra_attention_paths(self):
        for local, use_attn in [(True, True), (False, True), (True, False)]:
            m = zoo.HydraAttention(16, (4, 4), 2, local=local,
                                   use_attn=use_attn)
            y = _run(m, _x((1, *HW, 16)))
            assert y.shape == (1, *HW, 16)

    def test_hilo_head_split(self):
        m = zoo.HiLoAttention(32, 4, (2, 2), alpha=0.5)
        y = _run(m, _x((1, *HW, 32)))
        assert y.shape == (1, *HW, 32)
        # alpha=0 -> pure Hi-Fi; ws=(1,1) -> pure Lo-Fi
        y2 = _run(zoo.HiLoAttention(32, 4, (2, 2), alpha=0.0), _x((1, *HW, 32)))
        assert y2.shape == (1, *HW, 32)
        y3 = _run(zoo.HiLoAttention(32, 4, (1, 1), alpha=0.5), _x((1, *HW, 32)))
        assert y3.shape == (1, *HW, 32)

    def test_moe_window_attention_losses(self):
        m = zoo.MoEWindowAttention(16, (4, 4), 2, num_experts=3)
        x = _x((1, *HW, 16))
        params = m.init(K0, x)
        y, z, b = m.apply(params, x)
        assert y.shape == x.shape
        assert np.isfinite(float(z)) and np.isfinite(float(b))


class TestMlpZoo:
    def test_glu_mlp_gating_semantics(self):
        m = zoo.GluMlp(8, 16)
        x = _x((2, 5, 8))
        params = m.init(K0, x)
        y = m.apply(params, x)
        # manual: fc1 -> split -> val * sigmoid(gate) -> fc2
        w1 = params["params"]["fc1"]["kernel"]
        b1 = params["params"]["fc1"]["bias"]
        h = np.asarray(x) @ np.asarray(w1) + np.asarray(b1)
        val, gate = h[..., :8], h[..., 8:]
        act = val / (1 + np.exp(-gate)) * 0 + val * (1 / (1 + np.exp(-gate)))
        w2 = np.asarray(params["params"]["fc2"]["kernel"])
        b2 = np.asarray(params["params"]["fc2"]["bias"])
        np.testing.assert_allclose(np.asarray(y), act @ w2 + b2, atol=1e-5)

    @pytest.mark.parametrize("cls,kw", [
        (zoo.GatedMlp, {"dim": 16}),
        (zoo.ConvMlp, {"dim": 16, "hidden": 32}),
        (zoo.MAGMlp, {"dim": 16, "window_size": (4, 8)}),
        (zoo.RCAB, {"dim": 16}),
        (zoo.RDCAB, {"dim": 16}),
        (zoo.DWMlp, {"dim": 16, "hidden": 32}),
    ])
    def test_mlp_variants_shape(self, cls, kw):
        m = cls(**kw)
        x = _x((1, *HW, 16))
        y = _run(m, x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())

    def test_moe_mlp(self):
        m = zoo.MoEMlp(16, 32, num_experts=2)
        x = _x((1, *HW, 16))
        params = m.init(K0, x)
        y, z, b = m.apply(params, x)
        assert y.shape == x.shape

    @pytest.mark.sharded
    def test_expert_parallel_matches_replicated(self):
        """Expert parallelism (ep): sharding the stacked (E, in, out)
        expert banks over an 8-device "ep" mesh axis must reproduce the
        single-device MoE exactly — GSPMD computes each device's expert
        slice locally and psums the dense combine. The reference runs
        all experts on one device (moe_utils.py FusedExperts); this is
        the TPU-native expert-parallel dispatch."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vaevar_tpu.parallel import mesh as pmesh

        E = 8
        m = zoo.MoEMlp(16, 32, num_experts=E)
        x = _x((2, *HW, 16))
        params = m.init(K0, x)
        y_ref, z_ref, b_ref = m.apply(params, x)

        mesh = pmesh.make_mesh({"ep": E}, jax.devices()[:E])
        p_ep = pmesh.shard_experts(params, mesh, E)
        leaves = jax.tree_util.tree_leaves_with_path(p_ep)
        banks = [l for path, l in leaves
                 if getattr(l, "ndim", 0) >= 1 and l.shape[0] == E]
        assert banks and all(
            not l.sharding.is_fully_replicated for l in banks
        ), "expert banks must actually shard over ep"
        x_ep = jax.device_put(x, NamedSharding(mesh, P()))

        y, z, b = jax.jit(m.apply)(p_ep, x_ep)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-6, atol=1e-6)
        np.testing.assert_allclose(float(z), float(z_ref), rtol=1e-6)
        np.testing.assert_allclose(float(b), float(b_ref), rtol=1e-6)

        # gradients flow expert-parallel too: grads inherit the bank
        # sharding and match the replicated run
        def loss(p, q):
            yy, zz, bb = m.apply(p, q)
            return jnp.mean(yy**2) + zz + bb

        g_ref = jax.grad(loss)(params, x)
        g_ep = jax.jit(jax.grad(loss))(p_ep, x_ep)
        flat_ref = jax.tree_util.tree_leaves(g_ref)
        flat_ep = jax.tree_util.tree_leaves(g_ep)
        for a, bleaf in zip(flat_ref, flat_ep):
            np.testing.assert_allclose(np.asarray(bleaf), np.asarray(a),
                                       rtol=5e-5, atol=1e-6)


class TestBlocks:
    def test_convnext_block_residual(self):
        m = zoo.ConvNeXtBlock(24, kernel_size=(4, 8), groups=12)
        x = _x((1, *HW, 24))
        params = m.init(K0, x)
        y = m.apply(params, x)
        # layer-scale init 1e-6 -> output ~ input
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)

    def test_hilo_and_convffn_blocks(self):
        y = _run(zoo.HiLoBlock(16, (2, 2), num_heads=2, alpha=0.5),
                 _x((1, *HW, 16)))
        assert y.shape == (1, *HW, 16)
        y = _run(zoo.ConvFFNBlock(16), _x((1, *HW, 16)))
        assert y.shape == (1, *HW, 16)

    def test_moe_window_block(self):
        m = zoo.MoEWindowBlock(16, (4, 4), num_heads=2, num_experts=2,
                               shift_size=(2, 2))
        x = _x((1, *HW, 16))
        params = m.init(K0, x)
        y, zs, bs = m.apply(params, x)
        assert y.shape == x.shape and len(zs) == 2 and len(bs) == 2

    def test_vit_blocks(self):
        x = _x((2, 10, 16))
        ctx = _x((2, 7, 16), 3)
        assert _run(zoo.ViTBlock(16, 4), x).shape == x.shape
        m = zoo.ViTDecoderBlock(16, 4)
        params = m.init(K0, x, ctx)
        assert m.apply(params, x, ctx).shape == x.shape

    def test_periodic_pad(self):
        x = _x((1, 4, 8, 2))
        y = zoo.periodic_pad2d(x, (1, 2))
        assert y.shape == (1, 6, 12, 2)
        np.testing.assert_allclose(
            np.asarray(y[:, 1:-1, :2]), np.asarray(x[:, :, -2:])
        )
        assert float(jnp.abs(y[:, 0]).sum()) == 0.0  # lat rows zero


class TestGradients:
    @pytest.mark.slow
    def test_zoo_modules_differentiable(self):
        x = _x((1, *HW, 16))
        for m in [zoo.GAUAttention(16, (4, 4), s=8),
                  zoo.HiLoAttention(16, 2, (2, 2)),
                  zoo.ConvNeXtBlock(16, groups=4)]:
            params = m.init(K0, x)

            def loss(p):
                return jnp.sum(m.apply(p, x) ** 2)

            g = jax.grad(loss)(params)
            leaves = jax.tree_util.tree_leaves(g)
            assert all(bool(jnp.isfinite(l).all()) for l in leaves)
