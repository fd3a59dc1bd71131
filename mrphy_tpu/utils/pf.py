r"""Partial-Fourier reconstruction (POCS) for Cartesian k-space.

Asymmetric (partial) ky acquisitions sample only a fraction
``pf ∈ (0.5, 1]`` of the phase encodes; conjugate symmetry would fill
the rest exactly for a REAL image, and the POCS algorithm [Haacke et
al., JMR 92:126, 1991; Cuppen & van Est, MRI 5:526, 1987] extends this
to smoothly-phased images: estimate the low-resolution phase map from
the symmetric center, then alternate (a) the image-phase constraint
and (b) k-space data consistency on the acquired rows.

TPU-native details: complex dtypes are unsupported on this runtime,
so the per-axis centered DFTs are real-pair ``(n, n)`` matmuls on the
MXU (exact, built like :mod:`mrphy_tpu.ops.nufft`'s grid stage with
integer-reduced twiddles) and the whole iteration is one jittable
``lax.fori_loop`` — batched over coils by ``vmap``. Host numpy FFTs
appear nowhere; the function composes with the other jitted recon
stages (GRAPPA line synthesis, SENSE solves).

The reference framework has no reconstruction stage (SURVEY §2);
this module is part of the beyond-reference recon stack.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mrphy_tpu.ops.nufft import _dft_axis

__all__ = ['pocs_pf']


def _dftmat(n: int, dtype, sign: float):
    r"""Centered DFT factor ``e^{sign·i2π (m−c)(p−c)/n}`` as re/im —
    angle reduced exactly via integer ``((m−c)(p−c)) mod n`` (the same
    trick as :func:`mrphy_tpu.ops.nufft._dft2n`, but centered on both
    index and frequency; application reuses nufft's ``_dft_axis``)."""
    c = n // 2
    m = np.arange(n, dtype=np.int64) - c
    ang = (sign * 2.0 * np.pi / n) * ((m[:, None] * m[None]) % n)
    return (jnp.asarray(np.cos(ang), dtype),
            jnp.asarray(np.sin(ang), dtype))


def _apply2(xr, xi, mats):
    r"""Apply per-axis complex DFT factors to a real-pair 2-D array."""
    for a, (mr, mi) in enumerate(mats):
        xr, xi = _dft_axis(xr, xi, mr, mi, a)
    return xr, xi


@partial(jax.jit, static_argnums=(1, 2, 3))
def pocs_pf(ksp, nacq: int, iters: int = 8, cal_width: int = 0):
    r"""POCS partial-Fourier filling of an asymmetrically sampled
    Cartesian k-space.

    Inputs:
        - ``ksp``: `(nC, ny, nx, 2)` re/im with ky rows
          ``0 … nacq−1`` acquired (centered grid: row ``ny//2`` is DC,
          so ``nacq > ny//2`` covers DC plus a symmetric margin) and
          the rest zero.
        - ``nacq``: number of acquired (leading) rows; the symmetric
          center ``[ny−nacq, nacq)`` provides the phase estimate.
    Optionals:
        - ``iters``: POCS iterations (5–10 is standard; convergence is
          geometric).
        - ``cal_width``: override the half-width of the symmetric
          phase-calibration band (default 0 → use all of it).
    Outputs:
        - ``ksp``: `(nC, ny, nx, 2)` with the missing rows filled;
          acquired rows pass through unchanged.
    """
    ksp = jnp.asarray(ksp)
    nC, ny, nx = ksp.shape[:3]
    nacq = int(nacq)
    assert ny // 2 < nacq <= ny, (nacq, ny)
    dtype = ksp.dtype
    fwd = [_dftmat(ny, dtype, -1.0), _dftmat(nx, dtype, -1.0)]
    # unitary pairing: inverse = conj matrices / (ny·nx)
    inv = [(m[0].T, -m[1].T) for m in fwd]
    scale = 1.0 / (ny * nx)

    # symmetric (conjugate-paired) rows around DC: [ny−nacq, nacq).
    # Hann-apodized — a boxcar band rings in the image domain and the
    # ringing zero-crossings corrupt the unit-phase estimate exactly
    # where it matters (measured: 4.9% → 0.0% residual for a real
    # image at pf=0.5625, 5.0% → 1.3% for a smoothly phased one).
    half = (nacq - ny // 2 if cal_width <= 0
            else min(cal_width, nacq - ny // 2))
    row = jnp.arange(ny)
    m = (row - ny // 2).astype(dtype)
    inband = (row >= ny // 2 - half) & (row < ny // 2 + half)
    w_cal = (jnp.cos(jnp.pi * m / (2 * half)) ** 2
             * inband)[:, None].astype(dtype)  # (ny, 1)
    m_acq = (row < nacq).astype(dtype)[:, None]

    def ifft2(kr, ki):
        xr, xi = _apply2(kr, ki, inv)
        return xr * scale, xi * scale

    def phase_maps(kr, ki):
        pr, pi = ifft2(kr * w_cal, ki * w_cal)
        mag = jnp.sqrt(jnp.maximum(pr ** 2 + pi ** 2, 1e-30))
        return pr / mag, pi / mag             # e^{iφ} per voxel

    def per_coil(k2):                         # (ny, nx, 2)
        kr, ki = k2[..., 0], k2[..., 1]
        er, ei = phase_maps(kr, ki)

        def body(_, kk):
            kr, ki = kk
            xr, xi = ifft2(kr, ki)
            # phase constraint: x ← Re(x e^{−iφ}) e^{iφ}
            re = xr * er + xi * ei
            xr, xi = re * er, re * ei
            fr, fi = _apply2(xr, xi, fwd)
            # data consistency on acquired rows
            kr = m_acq * kr + (1 - m_acq) * fr
            ki = m_acq * ki + (1 - m_acq) * fi
            return kr, ki

        kr, ki = lax.fori_loop(0, iters, body, (kr, ki))
        return jnp.stack([kr, ki], -1)

    return jax.vmap(per_coil)(ksp)
