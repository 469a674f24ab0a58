"""Differentiable real spherical harmonic transform (Legendre einsum + rFFT).

TPU-native replacement for the reference's `torch_harmonics`
RealSHT/InverseRealSHT on the equiangular grid (da_4dvar.py:617-618,884-885):
associated-Legendre synthesis/analysis become batched einsums (MXU-friendly)
over precomputed float64->float32 tables; the longitude transform is a real
FFT. The transform is linear, so reverse-mode AD is exact and free.

Conventions (orthonormal, matching torch_harmonics norm="ortho",
grid="equiangular", csphase=True — its defaults, pinned against scipy
sph_harm_y goldens in tests/test_sht_golden.py):
- colatitudes theta_j = j*pi/(nlat-1), poles included, Clenshaw-Curtis
  quadrature weights;
- analysis:  f_lm = sum_j w_j Phat_lm(theta_j) * (2*pi/nlon) * rfft(f)_m(j)
- synthesis: f(j,k) = Re sum_m [sum_l f_lm Phat_lm(theta_j)] e^{i m phi_k}
  with m>0 counted twice (hermitian irfft).

For a zonally symmetric kernel g, isht(scale_l * sht(f) * g_l0) implements
isotropic spherical convolution (the CVT horizontal smoothing).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def clenshaw_curtis_weights(n: int) -> np.ndarray:
    """Quadrature weights for nodes x_j = cos(j*pi/(n-1)), j=0..n-1."""
    N = n - 1
    theta = np.pi * np.arange(n) / N
    w = np.zeros(n)
    v = np.ones(N - 1)
    if N % 2 == 0:
        w[0] = w[N] = 1.0 / (N**2 - 1)
        for k in range(1, N // 2):
            v -= 2.0 * np.cos(2.0 * k * theta[1:N]) / (4.0 * k**2 - 1)
        v -= np.cos(N * theta[1:N]) / (N**2 - 1)
    else:
        w[0] = w[N] = 1.0 / N**2
        for k in range(1, (N - 1) // 2 + 1):
            v -= 2.0 * np.cos(2.0 * k * theta[1:N]) / (4.0 * k**2 - 1)
    w[1:N] = 2.0 * v / N
    return w


@functools.lru_cache(maxsize=8)
def _legendre_table(nlat: int, lmax: int, mmax: int) -> np.ndarray:
    """Orthonormalized associated Legendre Phat[l, m, j] at the grid nodes.

    Phat_lm = (-1)^m sqrt((2l+1)/(4 pi) (l-m)!/(l+m)!) P_lm — WITH the
    Condon-Shortley phase, matching torch_harmonics' csphase=True default
    (the RealSHT the reference constructs at da_4dvar.py:617-618) and
    scipy's sph_harm_y, so coefficient arrays are directly comparable.
    float64 recurrences, returned as float64 (cast at use sites).
    """
    theta = np.pi * np.arange(nlat) / (nlat - 1)
    x = np.cos(theta)
    s = np.sin(theta)
    P = np.zeros((lmax, mmax, nlat))
    P[0, 0] = np.sqrt(1.0 / (4.0 * np.pi))
    # diagonal: Phat_mm (the -1 factor accumulates the CS phase (-1)^m)
    for m in range(1, mmax):
        if m < lmax:
            P[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * s * P[m - 1, m - 1]
    # first off-diagonal: Phat_{m+1,m}
    for m in range(mmax):
        if m + 1 < lmax:
            P[m + 1, m] = np.sqrt(2 * m + 3.0) * x * P[m, m]
    # upward recurrence in l
    for m in range(mmax):
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            P[l, m] = a * (x * P[l - 1, m] - b * P[l - 2, m])
    return P


class SHT:
    """Real SHT on the (nlat, nlon) equiangular grid. Methods are jittable."""

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None,
                 mmax: int | None = None):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or (nlon // 2 + 1)
        P = _legendre_table(nlat, self.lmax, self.mmax)
        w = clenshaw_curtis_weights(nlat)
        self._P = jnp.asarray(P, jnp.float32)  # (l, m, j)
        self._Pw = jnp.asarray(P * w[None, None, :], jnp.float32)

    def analysis(self, x):
        """(..., nlat, nlon) real -> (..., lmax, mmax) complex coefficients."""
        F = jnp.fft.rfft(x, axis=-1) * (2.0 * np.pi / self.nlon)
        F = F[..., : self.mmax]  # (..., j, m)
        return jnp.einsum("lmj,...jm->...lm", self._Pw.astype(F.real.dtype), F)

    def synthesis(self, c):
        """(..., lmax, mmax) complex -> (..., nlat, nlon) real."""
        g = jnp.einsum("lmj,...lm->...jm", self._P.astype(c.real.dtype), c)
        nfreq = self.nlon // 2 + 1
        if self.mmax < nfreq:
            pad = [(0, 0)] * (g.ndim - 1) + [(0, nfreq - self.mmax)]
            g = jnp.pad(g, pad)
        # hermitian synthesis without the 1/n of the standard irfft
        return jnp.fft.irfft(g, n=self.nlon, axis=-1) * self.nlon

    def zonal_coeffs(self, profile):
        """m=0 coefficients (real) of a zonally-symmetric field given its
        latitude profile (..., nlat)."""
        F = 2.0 * np.pi * profile  # (..., nlat); zonal mean of the field

        return jnp.einsum("lj,...j->...l", self._Pw[:, 0, :], F)

    def isotropic_smooth(self, x, kernel_l0, sph_scale=None):
        """isht(scale * sht(x) * g_l0): spherical convolution with a zonal
        kernel. kernel_l0: (..., lmax) broadcastable against x's batch dims.

        sph_scale defaults to the spherical convolution factor
        2*pi*sqrt(4*pi/(2l+1)) (reference da_4dvar.py:627-628).
        """
        if sph_scale is None:
            l = jnp.arange(self.lmax, dtype=jnp.float32)
            sph_scale = 2.0 * np.pi * jnp.sqrt(4.0 * np.pi / (2.0 * l + 1.0))
        c = self.analysis(x)
        scale = (sph_scale * kernel_l0)[..., :, None]  # (..., l, 1) over m
        return self.synthesis(c * scale)


def gaussian_lat_kernel(hpad: int, nlat: int, len_scale) -> jnp.ndarray:
    """Reference CVT kernel profile: rows i<hpad get exp(-i^2/(8 len^2)),
    rows >= hpad are zero (da_4dvar.py:620-625). len_scale: (C,) ->
    (C, nlat)."""
    i = np.arange(nlat, dtype=np.float32)
    mask = (i < hpad).astype(np.float32)
    ls = jnp.asarray(len_scale)[..., None]
    return jnp.exp(-(jnp.asarray(i) ** 2) / (8.0 * ls**2)) * jnp.asarray(mask)
