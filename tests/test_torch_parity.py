"""Golden parity: flax LGUnet forward == reference PyTorch LGUnet_all_1.

Loads the reference implementation from /root/reference (skipped when the
snapshot is absent, e.g. in a standalone checkout), randomly initializes it
on CPU, ports the state_dict through
vaevar_tpu.utils.port_torch.lgunet_params_from_torch, and asserts the two
forwards agree. This is the SURVEY.md section 7 golden-parity requirement
(backbone step 2) and validates checkpoint porting end to end.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaevar_tpu.config import LGUnetConfig
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.port_torch import lgunet_params_from_torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference snapshot not available",
)


def _install_stubs():
    """Stub the reference's unavailable deps (timm/fairscale/torchvision/
    turtle) with the trivial shipped-config behavior (all drop rates 0)."""
    import torch
    import torch.nn as tnn

    if "turtle" not in sys.modules:
        t = types.ModuleType("turtle")
        t.forward = None
        sys.modules["turtle"] = t
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = lambda v: tuple(v) if isinstance(
            v, (list, tuple)
        ) else (v, v)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "fairscale" not in sys.modules:
        fs = types.ModuleType("fairscale")
        fs_nn = types.ModuleType("fairscale.nn")
        fs_ck = types.ModuleType("fairscale.nn.checkpoint")
        fs_ca = types.ModuleType("fairscale.nn.checkpoint.checkpoint_activations")
        fs_ca.checkpoint_wrapper = lambda m, **kw: m
        for name, mod in [
            ("fairscale", fs), ("fairscale.nn", fs_nn),
            ("fairscale.nn.checkpoint", fs_ck),
            ("fairscale.nn.checkpoint.checkpoint_activations", fs_ca),
        ]:
            sys.modules[name] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if REF not in sys.path:
        sys.path.insert(0, REF)


# tiny two-gen coverage: uniform groups (vmap path), scanned LG stacks
CFG = LGUnetConfig(
    img_size=(16, 32),
    patch_size=(2, 2),
    stride=(2, 2),
    inchans_list=(4, 13, 13, 13, 13, 13),
    outchans_list=(8, 26, 26, 26, 26, 26),
    enc_dim=8,
    embed_dim=48,
    window_size=(2, 4),
    enc_depths=(2, 2),
    enc_heads=(2, 4),
    lg_depths=(2, 4),
    lg_heads=(4, 4),
    attn_type="rope",
    lg_full_attn_first=True,
    dtype=None,
)


@pytest.fixture(scope="module")
def torch_model_and_input():
    _install_stubs()
    import torch

    from networks.LGUnet_all import LGUnet_all_1

    torch.manual_seed(0)
    model = LGUnet_all_1(
        img_size=list(CFG.img_size),
        patch_size=list(CFG.patch_size),
        stride=list(CFG.stride),
        in_chans=CFG.in_chans,
        out_chans=CFG.out_chans,
        inchans_list=list(CFG.inchans_list),
        outchans_list=list(CFG.outchans_list),
        enc_dim=CFG.enc_dim,
        embed_dim=CFG.embed_dim,
        window_size=list(CFG.window_size),
        enc_depths=list(CFG.enc_depths),
        enc_heads=list(CFG.enc_heads),
        lg_depths=list(CFG.lg_depths),
        lg_heads=list(CFG.lg_heads),
    ).eval()
    # re-randomize so zeros-inited leaves (pos embeds) are exercised too
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    x = torch.randn(2, CFG.in_chans, *CFG.img_size)
    with torch.no_grad():
        y_ref = model(x)
    return model, x.numpy(), y_ref.numpy()


class TestGoldenParity:
    def test_forward_matches_reference(self, torch_model_and_input):
        model, x, y_ref = torch_model_and_input
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = lgunet_params_from_torch(sd, CFG)

        flax_model = LGUnet(CFG)
        y = flax_model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), y_ref, atol=2e-4, rtol=2e-3
        )

    def test_param_tree_structurally_complete(self, torch_model_and_input):
        model, x, _ = torch_model_and_input
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        ported = lgunet_params_from_torch(sd, CFG)
        flax_model = LGUnet(CFG)
        init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x))

        flat_p = jax.tree_util.tree_leaves_with_path(ported)
        flat_i = dict(
            (jax.tree_util.keystr(p), l.shape)
            for p, l in jax.tree_util.tree_leaves_with_path(init)
        )
        assert len(flat_p) == len(flat_i)
        for path, leaf in flat_p:
            key = jax.tree_util.keystr(path)
            assert key in flat_i, f"extra leaf {key}"
            assert tuple(leaf.shape) == tuple(flat_i[key]), (
                f"{key}: ported {leaf.shape} vs init {flat_i[key]}"
            )
