"""Flash attention (custom VJP) vs dense: forward and gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu.ops.attention import dense_attention
from vaevar_tpu.ops.flash import flash_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


class TestFlashVJP:
    def test_forward_matches_dense(self):
        q, k, v = (_rand((2, 3, 300, 32), i) for i in range(3))
        d = dense_attention(q, k, v)
        f = flash_attention(q, k, v, 128, 128)
        np.testing.assert_allclose(np.asarray(f), np.asarray(d), atol=2e-5)

    @pytest.mark.slow
    def test_grads_match_dense(self):
        q, k, v = (_rand((1, 2, 200, 16), 10 + i) for i in range(3))
        g = _rand((1, 2, 200, 16), 99)

        def loss_dense(q, k, v):
            return jnp.sum(dense_attention(q, k, v) * g)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, 64, 64) * g)

        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    @pytest.mark.slow
    def test_nondivisible_blocks(self):
        q, k, v = (_rand((1, 1, 130, 8), 20 + i) for i in range(3))
        d = dense_attention(q, k, v)
        f = flash_attention(q, k, v, 64, 48)
        np.testing.assert_allclose(np.asarray(f), np.asarray(d), atol=2e-5)

        def loss(q):
            return jnp.sum(flash_attention(q, k, v, 64, 48) ** 2)

        gq = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(gq)).all()


class TestPallasKernels:
    """Pallas TPU kernels in interpret mode vs dense reference."""

    def test_forward_matches_dense(self):
        from vaevar_tpu.ops import pallas_attn

        q, k, v = (_rand((2, 2, 300, 64), 30 + i) for i in range(3))
        d = dense_attention(q, k, v)
        f = pallas_attn.flash_attention(q, k, v, 128, 128, True)
        np.testing.assert_allclose(np.asarray(f), np.asarray(d), atol=2e-5)

    @pytest.mark.slow
    def test_grads_match_dense(self):
        from vaevar_tpu.ops import pallas_attn

        q, k, v = (_rand((1, 2, 200, 32), 40 + i) for i in range(3))
        g = _rand((1, 2, 200, 32), 98)

        def loss_dense(q, k, v):
            return jnp.sum(dense_attention(q, k, v) * g)

        def loss_pallas(q, k, v):
            return jnp.sum(pallas_attn.flash_attention(q, k, v, 128, 128, True) * g)

        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_bf16_inputs(self):
        from vaevar_tpu.ops import pallas_attn

        q, k, v = (
            _rand((1, 1, 256, 64), 50 + i).astype(jnp.bfloat16) for i in range(3)
        )
        d = dense_attention(q, k, v)
        f = pallas_attn.flash_attention(q, k, v, 128, 128, True)
        assert f.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(f, np.float32), np.asarray(d, np.float32), atol=3e-2
        )
