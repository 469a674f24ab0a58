"""Optimizer/schedule factories and the LoRA finetune mask."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaevar_tpu.train import builder


class TestOptimizers:
    @pytest.mark.parametrize("name", [
        "SGD", "ASGD", "Adagrad", "Adamax", "Adadelta", "Adam", "AdamW",
        "RMSprop",
    ])
    def test_all_reference_optimizers_step(self, name):
        opt = builder.make_optimizer(name, lr=0.1)
        params = {"w": jnp.ones(4)}
        state = opt.init(params)
        g = {"w": jnp.ones(4)}
        upd, _ = opt.update(g, state, params)
        new = optax.apply_updates(params, upd)
        assert float(new["w"][0]) < 1.0  # moved against the gradient

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            builder.make_optimizer("LBFGS")


class TestSchedules:
    def test_cosine_with_warmup(self):
        s = builder.make_schedule(
            {"sched": "cosine", "warmup_steps": 10, "min_lr": 1e-6}, 1e-3, 100
        )
        assert float(s(0)) == 0.0
        assert abs(float(s(10)) - 1e-3) < 1e-9
        assert float(s(99)) < 1e-4

    def test_step_and_constant(self):
        s = builder.make_schedule(
            {"sched": "step", "decay_steps": 10, "decay_rate": 0.5}, 1.0, 100
        )
        assert float(s(0)) == 1.0 and abs(float(s(10)) - 0.5) < 1e-9
        c = builder.make_schedule({"sched": "constant"}, 2.0, 100)
        assert float(c(50)) == 2.0


class TestLoraFinetune:
    def _params(self):
        return {
            "params": {
                "attn": {
                    "qA": {"kernel": jnp.ones((4, 2))},
                    "qB": {"kernel": jnp.ones((2, 4))},
                    "qkv": {"kernel": jnp.ones((4, 12)), "bias": jnp.ones(12)},
                },
                "mlp": {"fc1": {"kernel": jnp.ones((4, 8))}},
            }
        }

    def test_mask_selects_only_lora(self):
        mask = builder.lora_mask(self._params())
        p = mask["params"]
        assert p["attn"]["qA"]["kernel"] and p["attn"]["qB"]["kernel"]
        assert not p["attn"]["qkv"]["kernel"] and not p["attn"]["qkv"]["bias"]
        assert not p["mlp"]["fc1"]["kernel"]

    def test_finetune_optimizer_freezes_backbone(self):
        params = self._params()
        opt = builder.finetune_optimizer(params, "SGD", lr=0.5)
        state = opt.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        upd, _ = opt.update(g, state, params)
        new = optax.apply_updates(params, upd)
        # LoRA leaves moved, everything else untouched
        assert float(new["params"]["attn"]["qA"]["kernel"][0, 0]) != 1.0
        np.testing.assert_array_equal(
            np.asarray(new["params"]["attn"]["qkv"]["kernel"]),
            np.asarray(params["params"]["attn"]["qkv"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(new["params"]["mlp"]["fc1"]["kernel"]),
            np.asarray(params["params"]["mlp"]["fc1"]["kernel"]),
        )

    @pytest.mark.slow
    def test_mask_on_real_lgunet_lora_params(self):
        from vaevar_tpu import config as cfgs
        from vaevar_tpu.models.lgunet import LGUnet

        cfg = cfgs.micro_config(attn_type="relbias", lora_rank=2)
        m = LGUnet(cfg)
        x = jnp.zeros((1, 69, 16, 32))
        params = m.init(jax.random.PRNGKey(0), x)
        mask = builder.lora_mask(params)
        leaves_true = [
            l for l in jax.tree_util.tree_leaves(mask) if l is True
        ]
        assert leaves_true, "no LoRA leaves found in LGUnet params"
