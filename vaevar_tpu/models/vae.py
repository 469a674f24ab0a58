"""Background-error VAE (encoder / reparameterized sampler / decoder).

Equivalent of the reference `VAE_lr` (nf_model/vae.py:53-107): encoder and
decoder are LGUnet backbones (old-gen topology per
nf_model/parameters0_old.yaml); the encoder output splits in half along
channels into (mu, logvar); `decoder_hr` upsamples the decoded 128x256 field
to 721x1440 with torch-nearest semantics (nf_model/vae.py:87-90).

The ELBO follows nf_model/vae.py:104-107:
    loss = sum((recon-x)^2)/(2 sigma^2) - 0.5 sum(1 + logvar - mu^2 - e^logvar)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vaevar_tpu.config import LGUnetConfig, VAE_DECODER, VAE_ENCODER
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.ops.interp import resize_nearest


class VAE(nn.Module):
    """Latent background-error model. Latent: (B, latent_ch, H', W')."""

    enc_cfg: LGUnetConfig = VAE_ENCODER
    dec_cfg: LGUnetConfig = VAE_DECODER

    def setup(self):
        self.enc = LGUnet(self.enc_cfg, name="enc")
        self.dec = LGUnet(self.dec_cfg, name="dec")

    def encoder(self, x):
        """(B, C, H, W) -> (mu, logvar) each (B, latent_ch, H', W')."""
        out = self.enc(x)
        mu, logvar = jnp.split(out, 2, axis=1)
        return mu, logvar

    def sampling(self, rng, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return mu + eps * std

    def decoder(self, z):
        return self.dec(z)

    def decoder_hr(self, z, out_hw=(721, 1440)):
        x = self.dec(z)
        return resize_nearest(x, out_hw)

    def __call__(self, x, rng):
        mu, logvar = self.encoder(x)
        z = self.sampling(rng, mu, logvar)
        return self.decoder(z), mu, logvar


def elbo_loss(recon_x, x, mu, logvar, sigma: float):
    """Returns (total, reconstruction_sse, kld) like nf_model/vae.py:104-107."""
    sse = jnp.sum((recon_x - x) ** 2)
    mse = sse / (2.0 * sigma**2)
    kld = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))
    return mse + kld, sse, kld
