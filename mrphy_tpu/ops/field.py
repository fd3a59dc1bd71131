r"""Susceptibility-induced B0 fields: the k-space dipole forward model
and its (truncated) inversion — the QSM model family.

A tissue magnetic-susceptibility distribution ``χ(r)`` perturbs the
main field; the measured (Lorentz-sphere-corrected) relative shift is
the convolution of ``χ`` with the unit dipole response, which is
diagonal in k-space [Salomir et al., Conc. MR B 19:26, 2003; Marques &
Bowtell, Conc. MR B 25:65, 2005]:

.. math:: \delta(\mathbf{k}) = D(\mathbf{k})\,\chi(\mathbf{k}),
          \qquad D(\mathbf{k}) = \tfrac13 -
          \frac{(\mathbf{k}\cdot\hat z)^2}{|\mathbf{k}|^2}

(``δ = ΔB_z/B0``, same units as ``χ``; ``D(0) = 0`` — the spatially
uniform shift is demodulated, the MR-visible convention). This is the
forward model behind quantitative susceptibility mapping (QSM) and the
physics source of the off-resonance maps the rest of the framework
consumes (``SpinArray.df``, :func:`mrphy_tpu.ops.nufft.nufft`'s time
segmentation, ``examples/fieldmap_recon.py``): ``df = f0 · chi2field(χ)``
with ``f0 = γB0`` in Hz.

Exact consequences of this kernel, used as test oracles
(``tests/test_field.py``):

- an infinite cylinder ∥ B0 (χ in the ``k_z = 0`` plane, where
  ``D ≡ 1/3`` away from DC) maps to ``δ = χ/3`` *pointwise* — exact on
  the periodic grid to DFT rounding;
- a sphere has zero interior shift (``1/3 − 1/3`` on every shell);
- an infinite cylinder ⊥ B0 has interior shift ``−χ/6`` and the
  classic exterior ``cos 2φ`` dipole pattern;
- the operator is self-adjoint (``D`` is real and even).

TPU-native details: complex dtypes are unsupported on this runtime, so
the centered per-axis DFTs are real-pair MXU matmuls (exact,
integer-reduced twiddles — the machinery of
:func:`mrphy_tpu.utils.pf.pocs_pf` / :mod:`mrphy_tpu.ops.nufft`); the
whole forward is jittable, differentiable, and linear, so it can sit
inside recon/design losses (e.g. fitting χ directly to a measured
field map).

The reference framework has no field-simulation stage (SURVEY §2);
this module is part of the beyond-reference model families.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.ops.nufft import _dft_axis
from mrphy_tpu.utils.pf import _dftmat

__all__ = ['dipole_kernel', 'chi2field', 'field2chi_tkd']


def dipole_kernel(shape, *, voxel=(1.0, 1.0, 1.0), zdir=(0.0, 0.0, 1.0),
                  dtype=jnp.float32):
    r"""Centered k-space unit dipole response ``D(k)``.

    Inputs:
        - ``shape``: `(n1, n2, n3)` spatial grid (last three axes of
          the ``chi`` arrays; DC at ``n//2`` per axis, matching the
          package's centered-DFT convention).
    Optionals:
        - ``voxel``: `(3,)` voxel size per axis (any length unit —
          ``D`` is scale-invariant but anisotropy matters).
        - ``zdir``: B0 direction in the array coordinate frame
          (normalized internally; default: the last axis).
    Outputs:
        - ``D``: `(n1, n2, n3)` real array, ``D(0) = 0``.

    Host numpy (one-off, like the trajectory generators); the result
    is a constant under jit.
    """
    shape = tuple(int(n) for n in shape)
    assert len(shape) == 3, shape
    voxel = np.asarray(voxel, np.float64)
    assert voxel.shape == (3,) and (voxel > 0).all(), voxel
    z = np.asarray(zdir, np.float64)
    z = z / np.linalg.norm(z)
    ks = [(np.arange(n) - n // 2) / (n * v)
          for n, v in zip(shape, voxel)]
    kx, ky, kz = np.meshgrid(*ks, indexing='ij')
    kdz = kx * z[0] + ky * z[1] + kz * z[2]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    with np.errstate(invalid='ignore', divide='ignore'):
        D = 1.0 / 3.0 - (kdz ** 2) / k2
    D[shape[0] // 2, shape[1] // 2, shape[2] // 2] = 0.0   # DC
    return jnp.asarray(D, dtype)


def _fft3(xr, xi, mats):
    for a, (mr, mi) in enumerate(mats):
        xr, xi = _dft_axis(xr, xi, mr, mi, a)
    return xr, xi


@partial(jax.jit, static_argnums=(2,))
def _apply_diag(chi, diag, nb: int):
    r"""``IFFT(diag · FFT(chi))`` over the last 3 axes, real-pair
    matmul DFTs, real in → real out (``diag`` real and even)."""
    shape = chi.shape[-3:]
    dtype = chi.dtype
    fwd = [_dftmat(n, dtype, -1.0) for n in shape]
    inv = [(m[0].T, -m[1].T) for m in fwd]
    scale = 1.0 / float(np.prod(shape))

    def one(x):
        kr, ki = _fft3(x, jnp.zeros_like(x), fwd)
        kr, ki = kr * diag, ki * diag
        xr, _ = _fft3(kr, ki, inv)
        return xr * scale

    flat = chi.reshape((-1,) + shape) if nb else chi[None]
    out = jax.vmap(one)(flat)
    return out.reshape(chi.shape)


def chi2field(chi, *, voxel=(1.0, 1.0, 1.0), zdir=(0.0, 0.0, 1.0),
              D=None):
    r"""Susceptibility map → relative field-shift map ``δ = ΔB_z/B0``.

    Inputs:
        - ``chi``: `(..., n1, n2, n3)` susceptibility (any units — ppm
          in, ppm out; leading axes batch).
    Optionals:
        - ``voxel``/``zdir``: grid geometry, see :func:`dipole_kernel`.
        - ``D``: precomputed kernel (overrides ``voxel``/``zdir``) —
          pass it when calling inside a jitted loss to avoid the host
          rebuild per trace.
    Outputs:
        - ``δ``: same shape/units as ``chi``; multiply by ``γB0`` (Hz)
          for an off-resonance map ``df``.

    Jittable, linear, differentiable, self-adjoint (tested at 1e-12).
    """
    chi = jnp.asarray(chi)
    assert chi.ndim >= 3, f'expected (..., n1, n2, n3), got {chi.shape}'
    if D is None:
        D = dipole_kernel(chi.shape[-3:], voxel=voxel, zdir=zdir,
                          dtype=chi.dtype)
    else:
        D = jnp.asarray(D, chi.dtype)
        assert D.shape == chi.shape[-3:], (D.shape, chi.shape)
    return _apply_diag(chi, D, int(chi.ndim > 3))


def field2chi_tkd(field, *, thresh: float = 0.2, voxel=(1.0, 1.0, 1.0),
                  zdir=(0.0, 0.0, 1.0), D=None):
    r"""Thresholded k-space division (TKD) QSM inversion
    [Shmueli et al., MRM 62:1510, 2009; Wharton & Bowtell 2010]:

    .. math:: \hat\chi(\mathbf{k}) = \delta(\mathbf{k}) \,/\,
              \mathrm{sgn}(D)\,\max(|D|, t)

    The dipole kernel vanishes on the magic-angle cone, making the
    inverse problem ill-posed; TKD floors ``|D|`` at ``thresh``
    (``t ≈ 0.1–0.3`` in the literature). Modes with ``|D| ≥ t`` are
    recovered EXACTLY (``chi2field(field2chi_tkd(f))`` matches ``f``
    on those modes at rounding — tested); cone modes are attenuated,
    the method's known streaking/underestimation trade-off.

    Inputs/optionals: as :func:`chi2field`, plus ``thresh``; ``field``
    is ``δ`` in any units (same units out).
    Outputs:
        - ``chi_hat``: same shape as ``field``.
    """
    field = jnp.asarray(field)
    assert field.ndim >= 3, field.shape
    if D is None:
        D = dipole_kernel(field.shape[-3:], voxel=voxel, zdir=zdir,
                          dtype=field.dtype)
    else:
        D = jnp.asarray(D, field.dtype)
    t = jnp.asarray(thresh, field.dtype)
    sgn = jnp.where(D < 0, -1.0, 1.0).astype(field.dtype)
    Dinv = sgn / jnp.maximum(jnp.abs(D), t)
    return _apply_diag(field, Dinv, int(field.ndim > 3))
