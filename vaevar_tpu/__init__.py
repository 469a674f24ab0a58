"""vaevar_tpu — TPU-native latent-space variational data assimilation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the VAE-Var
reference system (cycled 3D/4D-Var for global weather with a VAE-learned
background-error covariance), designed TPU-first:

- flax.linen LGUnet backbone (one module covering both reference
  generations: RoPE windowed attention and rel-pos-bias + LoRA),
- pure jitted variational cost functions J(z) / J(w),
- on-device L-BFGS with strong-Wolfe line search,
- differentiable spherical-harmonic transform (Legendre einsum + rFFT)
  for the classical control-variable transform,
- `jax.sharding.Mesh` spatial + data parallelism for the 0.25deg state,
- Pallas windowed flash attention for the hot attention op.

Reference behavior studied from /root/reference (xiaoyi018/VAE-Var);
architecture is original and TPU-native.
"""

__version__ = "0.1.0"

from vaevar_tpu import channels  # noqa: F401
