"""Classical control-variable transform (B^1/2) for sc4dvar.

Pure-function equivalent of the reference `cyclic_4dvar.transform`
(da_4dvar.py:878-931): control u (69, 128, 256) -> analysis increment added
to the background on the 721x1440 grid. Steps:

1. per-channel isotropic spherical smoothing via SHT with a Gaussian
   latitude-profile kernel (da_4dvar.py:883-888), scaled 11/len_scale^2;
2. streamfunction regression coupling: every channel gains
   sum_k psi_k * reg_coeff[ch, k] where psi = the u-wind block (or z+u
   blocks when reg_coeff has 26 rows) (da_4dvar.py:890-897);
3. surface std scaling for the 4 surface channels (da_4dvar.py:901);
4. per-variable vertical EOF projection V diag(sqrt(lambda)) (da_4dvar.py:903-906);
5. psi/chi -> (u, v) winds via spherical finite differences
   (da_4dvar.py:908-926), replicating the reference's stencils and signs;
6. nearest upsample to the analysis grid + xb (da_4dvar.py:928).

All static tables are closed over; the function is jit- and AD-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vaevar_tpu.channels import N_LEVELS, N_SINGLE
from vaevar_tpu.ops.interp import resize_nearest
from vaevar_tpu.ops.sht import SHT, gaussian_lat_kernel

_EARTH_M_PER_DEG = 111195.0


@dataclass(frozen=True)
class BMatrixAssets:
    """Static B-matrix coefficient arrays (reference dataset/bq_info_lr)."""

    len_scale: np.ndarray  # (69,), already multiplied by scale_factor
    reg_coeff: np.ndarray  # (69, 13) or (69, 26)
    std_sur: np.ndarray  # (4,)
    vert_eig_value: np.ndarray  # (5, 13)
    vert_eig_vec: np.ndarray  # (5, 13, 13)

    @classmethod
    def load(cls, coeff_dir: str, scale_factor: float = 1.0) -> "BMatrixAssets":
        import os

        ld = lambda n: np.load(os.path.join(coeff_dir, n)).astype(np.float32)
        return cls(
            len_scale=ld("len_scale.npy") * scale_factor,
            reg_coeff=ld("reg_coeff.npy"),
            std_sur=ld("std_sur.npy"),
            vert_eig_value=ld("vert_eig_value.npy"),
            vert_eig_vec=ld("vert_eig_vec.npy"),
        )

    @classmethod
    def synthetic(cls, scale_factor: float = 1.0, seed: int = 0,
                  calibrate: bool = True) -> "BMatrixAssets":
        """Plausible stand-in assets for tests / runs without the .npy files.

        With `calibrate` (default), the per-block output scales are fitted
        so that B^1/2 of a unit-normal control has per-channel std near the
        NMC background-error magnitude ERR_STD*STD (the same table
        vae4dvar's decoder increment is scaled by, da_4dvar.py:1181). The
        reference's REAL assets are physically scaled this way by
        construction; uncalibrated random tables leave the wind channels
        ~1e5 too weak (the psi/chi->wind stencils divide by the grid
        metric) and the humidity channels relatively huge, making the
        sc4dvar quadratic so anisotropic (~12 orders across channels) that
        NO optimizer can move the analysis. Calibration runs once per
        (scale_factor, seed) on the production 128x256 solver grid and is
        cached."""
        key = (float(scale_factor), int(seed))
        if calibrate and key in _SYNTH_CACHE:
            return _SYNTH_CACHE[key]
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(5, 13, 13))
        vecs = np.stack([np.linalg.qr(m)[0] for m in q]).astype(np.float32)
        vals = np.exp(rng.normal(size=(5, 13))).astype(np.float32)
        raw = cls(
            len_scale=(1.0 + 3.0 * rng.random(69).astype(np.float32)) * scale_factor,
            reg_coeff=(0.1 * rng.normal(size=(69, 13))).astype(np.float32),
            std_sur=np.ones(4, np.float32),
            vert_eig_value=vals,
            vert_eig_vec=vecs,
        )
        if not calibrate:
            return raw
        from vaevar_tpu import channels

        probe_t = CVTransform(raw, solver_hw=(128, 256), out_hw=(128, 256))
        u = jnp.asarray(
            rng.normal(size=(2, 69, 128, 256)), jnp.float32
        )
        import jax

        got = np.asarray(jax.vmap(probe_t.increment)(u)).std(axis=(0, 2, 3))
        got = np.maximum(got, 1e-30)
        target = (channels.ERR_STD * channels.STD).astype(np.float64)
        r = target / got
        nl, ns = N_LEVELS, N_SINGLE
        # per-channel calibration: output channel l of block i scales
        # linearly with ROW l of its EOF matrix (out_l = V[l,:] sqrt(L) blk;
        # the coupling term reads the PRE-EOF psi channels, so there is no
        # feedback). Level-l winds come from psi_l AND chi_l jointly
        # (u_l = dy psi_l - dx chi_l, v_l = -dx psi_l - dy chi_l), so
        # blocks 2/3 share one per-level factor = gmean of the u_l, v_l
        # ratios.
        vecs_cal = raw.vert_eig_vec.astype(np.float64).copy()
        for i in (0, 1, 4):
            vecs_cal[i] *= r[ns + i * nl : ns + (i + 1) * nl, None]
        g_lvl = np.sqrt(r[ns + 2 * nl : ns + 3 * nl]
                        * r[ns + 3 * nl : ns + 4 * nl])
        vecs_cal[2] *= g_lvl[:, None]
        vecs_cal[3] *= g_lvl[:, None]
        out = cls(
            len_scale=raw.len_scale,
            reg_coeff=raw.reg_coeff,
            # surface channels scale directly through std_sur
            std_sur=(target[:ns] / got[:ns]).astype(np.float32),
            vert_eig_value=raw.vert_eig_value,
            vert_eig_vec=vecs_cal.astype(np.float32),
        )
        _SYNTH_CACHE[key] = out
        return out


_SYNTH_CACHE: dict = {}


class CVTransform:
    """Callable B^1/2: (u, xb) -> xb + increment on `out_hw`."""

    def __init__(
        self,
        b: BMatrixAssets,
        solver_hw: tuple[int, int] = (128, 256),
        out_hw: tuple[int, int] = (721, 1440),
        hpad: int = 112,
    ):
        self.b = b
        self.out_hw = out_hw
        nlat, nlon = solver_hw
        self.nlat, self.nlon = nlat, nlon
        self.sht = SHT(nlat, nlon)
        kern = gaussian_lat_kernel(hpad, nlat, b.len_scale)  # (69, nlat)
        self.kernel_l0 = self.sht.zonal_coeffs(kern)  # (69, lmax)
        self.psi_wide = b.reg_coeff.shape[1] != N_LEVELS

    def __call__(self, u, xb):
        """u: (69, nlat, nlon) control; xb: (69, *out_hw) background."""
        return resize_nearest(self.increment(u), self.out_hw) + xb

    def increment(self, u):
        """B^1/2 u on the solver grid, before the nearest upsample
        (da_4dvar.py:878-926). Exposed separately so 3D-Var can use the
        exact reduced obs quadratic (cost.ReducedObs)."""
        b = self.b
        nlev = N_LEVELS

        inc = self.sht.isotropic_smooth(u, jnp.asarray(self.kernel_l0))
        inc = 11.0 * inc / jnp.asarray(b.len_scale).reshape(-1, 1, 1) ** 2

        u_blk = slice(N_SINGLE + 2 * nlev, N_SINGLE + 3 * nlev)
        if self.psi_wide:
            psi = jnp.concatenate(
                [inc[N_SINGLE : N_SINGLE + nlev], inc[u_blk]], axis=0
            )
        else:
            psi = inc[u_blk]
        coupling = jnp.einsum("ck,khw->chw", jnp.asarray(b.reg_coeff), psi)
        vmode = inc + coupling

        sfvp = vmode.at[:N_SINGLE].multiply(jnp.asarray(b.std_sur).reshape(-1, 1, 1))
        blocks = []
        for i in range(5):
            blk = sfvp[N_SINGLE + i * nlev : N_SINGLE + (i + 1) * nlev]
            mat = jnp.asarray(b.vert_eig_vec[i]) * jnp.sqrt(
                jnp.asarray(b.vert_eig_value[i])
            ).reshape(1, -1)
            blocks.append(jnp.einsum("lk,khw->lhw", mat, blk))
        sfvp = jnp.concatenate([sfvp[:N_SINGLE]] + blocks, axis=0)

        # psi/chi -> winds with the reference's exact stencils
        nlat = self.nlat
        x_scaling = jnp.sin(
            jnp.linspace(1.0 / 180.0 * np.pi, 179.0 / 180.0 * np.pi, nlat)
        ).reshape(1, -1, 1)

        def partial_x(f):
            fw = jnp.roll(f, -1, axis=2)  # f[k+1]
            bw = jnp.roll(f, 1, axis=2)  # f[k-1]
            return (bw - fw) / (2.0 * _EARTH_M_PER_DEG * 180.0 / nlat * x_scaling)

        dlat = _EARTH_M_PER_DEG * 180.0 / (nlat - 1)

        def partial_y(f):
            interior = (f[:, 2:] - f[:, :-2]) / (2.0 * dlat)
            first = (f[:, 1:2] - f[:, 0:1]) / dlat
            last = (f[:, -1:] - f[:, -2:-1]) / dlat
            return jnp.concatenate([first, interior, last], axis=1)

        sf = sfvp[N_SINGLE + 2 * nlev : N_SINGLE + 3 * nlev]
        vp = sfvp[N_SINGLE + 3 * nlev : N_SINGLE + 4 * nlev]
        uwind = partial_y(sf) - partial_x(vp)
        vwind = -partial_x(sf) - partial_y(vp)
        recon = jnp.concatenate(
            [
                sfvp[: N_SINGLE + 2 * nlev],
                uwind,
                vwind,
                sfvp[N_SINGLE + 4 * nlev :],
            ],
            axis=0,
        )
        return recon
