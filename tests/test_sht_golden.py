"""Golden parity of ops/sht.py against the torch_harmonics conventions.

torch_harmonics (the reference's SHT backend, da_4dvar.py:617-638) cannot
be installed in this environment, so the conventions it documents —
orthonormal spherical harmonics WITH the Condon-Shortley phase
(csphase=True), Clenshaw-Curtis quadrature on the pole-inclusive
equiangular grid, analysis prefactor 2*pi/nlon from
`2*pi*rfft(norm="forward")`, unscaled hermitian irfft synthesis — are
pinned here against an INDEPENDENT implementation: scipy.special.sph_harm_y
(same orthonormal+CS convention) with brute-force quadrature/synthesis.

Any normalization or phase drift in ops/sht.py relative to the reference's
transform chain fails these tests.
"""

import numpy as np
import pytest
import scipy.special as sp

import jax.numpy as jnp

from vaevar_tpu.ops.sht import (
    SHT,
    _legendre_table,
    clenshaw_curtis_weights,
    gaussian_lat_kernel,
)

NLAT, NLON = 32, 64
LTEST, MTEST = 12, 8  # band limit low enough for exact CC quadrature


def _grid():
    theta = np.pi * np.arange(NLAT) / (NLAT - 1)  # colatitude, poles incl.
    phi = 2.0 * np.pi * np.arange(NLON) / NLON
    return theta, phi


def _scipy_Y(l, m, theta, phi):
    """Orthonormal Y_l^m with CS phase on the (theta, phi) grid."""
    return sp.sph_harm_y(l, m, theta[:, None], phi[None, :])


class TestLegendreTableGolden:
    def test_table_matches_scipy_sph_harm(self):
        """Phat[l, m, j] == Y_l^m(theta_j, phi=0) for every (l, m):
        normalization, recurrence, and CS phase all pinned."""
        theta, _ = _grid()
        P = _legendre_table(NLAT, LTEST, MTEST)
        for m in range(MTEST):
            for l in range(m, LTEST):
                want = sp.sph_harm_y(l, m, theta, 0.0).real
                np.testing.assert_allclose(
                    P[l, m], want, atol=1e-12,
                    err_msg=f"l={l} m={m}",
                )


class TestAnalysisGolden:
    def test_analysis_recovers_known_coefficients(self):
        """f = Re sum c_lm Y_lm (m=0 real + m>0 counted twice) analyzed
        back to exactly c_lm — the torch_harmonics RealSHT contract."""
        theta, phi = _grid()
        rng = np.random.default_rng(0)
        c = np.zeros((LTEST, MTEST), np.complex128)
        c[:LTEST, 0] = rng.normal(size=LTEST)
        for m in range(1, MTEST):
            c[m:LTEST, m] = rng.normal(size=LTEST - m) + 1j * rng.normal(
                size=LTEST - m
            )

        f = np.zeros((NLAT, NLON))
        for m in range(MTEST):
            for l in range(m, LTEST):
                Y = _scipy_Y(l, m, theta, phi)
                term = (c[l, m] * Y).real
                f += term if m == 0 else 2.0 * term

        sht = SHT(NLAT, NLON)
        got = np.asarray(sht.analysis(jnp.asarray(f, jnp.float64)))
        np.testing.assert_allclose(got[:LTEST, :MTEST], c, atol=5e-5)
        # no spill where CC quadrature is exact (l + LTEST-1 <= nlat-1);
        # beyond that the quadrature aliases, identically to torch_harmonics
        exact = NLAT - LTEST + 1
        assert np.abs(got[LTEST:exact, :MTEST]).max() < 5e-5

    def test_quadrature_orthonormality(self):
        """<Y_lm, Y_l'm> under the CC-weighted grid inner product ==
        delta_ll' (exact for l+l' < nlat) — the quadrature contract."""
        theta, phi = _grid()
        w = clenshaw_curtis_weights(NLAT)
        dphi = 2.0 * np.pi / NLON
        for m in (0, 1, 3):
            for l1, l2 in [(m, m), (m + 1, m + 1), (m, m + 2), (m + 1, m + 4)]:
                Y1 = _scipy_Y(l1, m, theta, phi)
                Y2 = _scipy_Y(l2, m, theta, phi)
                ip = np.sum(w[:, None] * (Y1 * np.conj(Y2)).real) * dphi
                assert ip == pytest.approx(1.0 if l1 == l2 else 0.0, abs=1e-10)


class TestSynthesisGolden:
    def test_synthesis_matches_scipy_field(self):
        """isht(delta_lm) == the real-SHT basis field (m=0: Y_l0;
        m>0: 2 Re Y_lm) — torch_harmonics InverseRealSHT semantics."""
        theta, phi = _grid()
        sht = SHT(NLAT, NLON)
        for l, m in [(0, 0), (3, 0), (4, 2), (7, 5)]:
            c = np.zeros((NLAT, NLON // 2 + 1), np.complex128)
            c[l, m] = 1.0 + (0.5j if m > 0 else 0.0)
            got = np.asarray(sht.synthesis(jnp.asarray(c)))
            Y = c[l, m] * _scipy_Y(l, m, theta, phi)
            want = Y.real if m == 0 else 2.0 * Y.real
            np.testing.assert_allclose(got, want, atol=5e-5,
                                       err_msg=f"l={l} m={m}")


class TestSmoothingOperatorGolden:
    def test_isotropic_smooth_matches_bruteforce_reference_math(self):
        """The full CVT horizontal smoothing
        isht(sph_scale * sht(u) * coeffs_kernel[:, 0]) (da_4dvar.py:884-888)
        against a brute-force scipy-basis implementation."""
        theta, phi = _grid()
        rng = np.random.default_rng(1)
        u = rng.normal(size=(NLAT, NLON))

        # kernel profile exactly as get_static_info builds it
        len_scale = 2.0
        hpad = 28
        kern_profile = np.where(
            np.arange(NLAT) < hpad,
            np.exp(-np.arange(NLAT) ** 2 / (8 * len_scale**2)), 0.0
        )
        sph_scale = 2 * np.pi * np.sqrt(4 * np.pi / (2 * np.arange(NLAT) + 1))

        # brute force in the scipy basis (exact on the analyzed band)
        w = clenshaw_curtis_weights(NLAT)
        dphi = 2.0 * np.pi / NLON
        want = np.zeros((NLAT, NLON))
        kern = np.broadcast_to(kern_profile[:, None], (NLAT, NLON))
        # kernel m=0 coefficients
        k0 = np.zeros(NLAT)
        for l in range(NLAT - 1):
            Y = _scipy_Y(l, 0, theta, phi)
            k0[l] = np.sum(w[:, None] * kern * np.conj(Y).real) * dphi
        for m in range(NLON // 2 + 1):
            for l in range(m, NLAT - 1):
                Y = _scipy_Y(l, m, theta, phi)
                c_u = np.sum(w[:, None] * u * np.conj(Y)) * dphi
                term = (sph_scale[l] * k0[l] * c_u * Y).real
                want += term if m == 0 else 2.0 * term

        sht = SHT(NLAT, NLON)
        kern_j = gaussian_lat_kernel(hpad, NLAT, np.array([len_scale]))
        k0_ours = sht.zonal_coeffs(kern_j)[0]
        np.testing.assert_allclose(np.asarray(k0_ours), k0, atol=5e-4)
        got = np.asarray(sht.isotropic_smooth(jnp.asarray(u), k0_ours))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
