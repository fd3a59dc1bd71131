r"""Susceptibility-induced B0 fields and the full QSM pipeline: the
k-space dipole forward model, Laplacian phase unwrapping, SHARP
background-field removal, and TKD / TV-regularized inversion.

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

from mrphy_tpu.utils.pf import _dftmat, _apply2 as _fft3

__all__ = ['dipole_kernel', 'chi2field', 'field2chi_tkd',
           'unwrap_phase', 'smv_kernel', 'sharp_background',
           'field2chi_tv']

_PH = jax.lax.Precision.HIGHEST


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
        assert D.shape == field.shape[-3:], (D.shape, field.shape)
    t = jnp.asarray(thresh, field.dtype)
    sgn = jnp.where(D < 0, -1.0, 1.0).astype(field.dtype)
    Dinv = sgn / jnp.maximum(jnp.abs(D), t)
    return _apply_diag(field, Dinv, int(field.ndim > 3))


# ------------------------------------------------------------------
# Laplacian phase unwrapping (DCT / Neumann)
# ------------------------------------------------------------------

def _dctmat2(n: int, dtype):
    r"""Orthonormal DCT-II factor `(n, n)` (host-built constant)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    C = np.cos(np.pi * (m + 0.5) * k / n) * np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return jnp.asarray(C, dtype)


def _dct3(x, mats, trans: bool):
    r"""Per-axis orthonormal DCT-II (or its inverse, ``trans=True``)
    over a 3-D array — MXU tensordots, all real."""
    for a, M in enumerate(mats):
        M = M.T if trans else M
        x = jnp.moveaxis(
            jnp.tensordot(M, x, axes=([1], [a]), precision=_PH), 0, a)
    return x


def _lap_neumann(f):
    r"""3-D discrete Laplacian with reflective (Neumann) boundaries —
    the operator the DCT diagonalizes exactly."""
    out = jnp.zeros_like(f)
    for a in range(3):
        n = f.shape[a]
        fp = jnp.concatenate(
            [f.take(jnp.array([0]), a),
             jax.lax.slice_in_dim(f, 0, n - 1, axis=a)], a)
        fm = jnp.concatenate(
            [jax.lax.slice_in_dim(f, 1, n, axis=a),
             f.take(jnp.array([-1]), a)], a)
        out = out + fp + fm - 2.0 * f
    return out


@partial(jax.jit, static_argnums=(1, 2, 3))
def _unwrap3(psi, nb: int, congruent: bool, niter: int):
    shape = psi.shape[-3:]
    dtype = psi.dtype
    mats = [_dctmat2(n, dtype) for n in shape]
    lam = sum(np.reshape(-4.0 * np.sin(np.pi * np.arange(n)
                                       / (2.0 * n)) ** 2,
                         [-1 if i == a else 1 for i in range(3)])
              for a, n in enumerate(shape))
    inv = np.where(lam == 0, 0.0, 1.0 / np.where(lam == 0, 1.0, lam))
    inv = jnp.asarray(inv, dtype)
    two_pi = 2.0 * np.pi

    def smooth(p):
        s, c = jnp.sin(p), jnp.cos(p)
        L = c * _lap_neumann(s) - s * _lap_neumann(c)
        return _dct3(_dct3(L, mats, False) * inv, mats, True)

    def one(p):
        u = smooth(p)
        for _ in range(niter):            # Picard: re-unwrap residual
            w = p - u
            w = w - two_pi * jnp.round(w / two_pi)     # wrap to (-pi,pi]
            u = u + smooth(w)
        if congruent:
            # center the residual's circular mean at 0 first: the
            # smooth estimate carries an arbitrary global offset, and
            # rounding near a half-multiple of 2pi would flip
            # voxel-wise (alpha keeps the result congruent to p)
            r = u - p
            alpha = jnp.arctan2(jnp.mean(jnp.sin(r)), jnp.mean(jnp.cos(r)))
            u = p + two_pi * jnp.round((r - alpha) / two_pi)
        return u

    flat = psi.reshape((-1,) + shape) if nb else psi[None]
    return jax.vmap(one)(flat).reshape(psi.shape)


def unwrap_phase(psi, *, congruent: bool = True, niter: int = 3):
    r"""3-D Laplacian phase unwrapping [Schofield & Zhu, Opt. Lett.
    28:1194, 2003] — the TPU-native unwrapper (no sequential region
    growing): the true phase Laplacian is recovered from the wrapped
    phase via ``cos ψ·∇²sin ψ − sin ψ·∇²cos ψ`` and inverted with a
    DCT (Neumann boundaries — a DFT would force periodicity the field
    map doesn't have). All dense MXU matmuls; jittable; batched.

    Inputs:
        - ``psi``: `(..., n1, n2, n3)` wrapped phase, radians.
    Optionals:
        - ``congruent``: re-bias the smooth estimate to be EXACTLY
          congruent to ``psi`` mod 2π (Schofield & Zhu's final step:
          ``ψ + 2π·round((u−ψ)/2π)``). Whenever the smooth estimate is
          within π of the truth everywhere, the congruent result is
          *exact* up to one global 2πk offset (tested). Set False for
          a smooth (harmonic-free) estimate, e.g. as a fit initializer.
        - ``niter``: Picard refinements — each re-unwraps the wrapped
          residual ``wrap(ψ − u)``, whose range shrinks every pass, so
          steep phases that break the one-shot estimate (error > π)
          still converge to exact congruent recovery (tested at 40 rad
          of total range on a 32³ grid).
    Outputs:
        - unwrapped phase, same shape (global offset arbitrary).
    """
    psi = jnp.asarray(psi)
    assert psi.ndim >= 3, psi.shape
    return _unwrap3(psi, int(psi.ndim > 3), bool(congruent), int(niter))


# ------------------------------------------------------------------
# SHARP background-field removal
# ------------------------------------------------------------------

def _smv_hat(shape, radius: float):
    r"""Host-numpy centered SMV-kernel spectrum (f64)."""
    shape = tuple(int(n) for n in shape)
    ks = [np.arange(n) - n // 2 for n in shape]
    X, Y, Z = np.meshgrid(*ks, indexing='ij')
    k = ((X ** 2 + Y ** 2 + Z ** 2) <= radius * radius).astype(np.float64)
    k /= k.sum()
    return np.fft.fftshift(np.fft.fftn(np.fft.ifftshift(k))).real


def smv_kernel(shape, radius: float, *, dtype=jnp.float32):
    r"""Centered spectrum of the normalized spherical-mean-value
    kernel of ``radius`` (voxels). Host numpy one-off;
    ``_apply_diag(x, smv_kernel(...))`` is the exact circular SMV
    convolution (verified against a numpy-FFT oracle at 1e-16)."""
    return jnp.asarray(_smv_hat(shape, radius), dtype)


def sharp_background(field, mask, *, radius: float = 4.0,
                     thresh: float = 0.05):
    r"""SHARP background-field removal [Schweser et al., NeuroImage
    54:2789, 2011]: inside a tissue mask, any field sourced OUTSIDE
    the mask is harmonic, so it is annihilated by ``(δ − ρ_R)`` (ρ_R =
    spherical-mean kernel, the mean-value property); deconvolving the
    filtered field with a thresholded ``1/(1 − ρ̂_R)`` returns the
    local (internal-source) field.

    Inputs:
        - ``field``: `(..., n1, n2, n3)` total field (any units).
        - ``mask``: `(n1, n2, n3)` static bool (numpy), the tissue
          support — same static-mask convention as ``SpinArray.mask``.
    Optionals:
        - ``radius``: SMV radius in voxels (larger = stronger removal,
          more erosion).
        - ``thresh``: deconvolution floor on ``|1 − ρ̂|`` (SVD-style
          truncation).
    Outputs:
        - ``(f_local, mask_eroded)``: the background-free field
          (zeroed outside ``mask_eroded``) and the eroded-by-``radius``
          numpy mask it is valid on.

    Jittable and differentiable in ``field`` (mask/kernel are static).
    """
    field = jnp.asarray(field)
    assert field.ndim >= 3, field.shape
    shape = field.shape[-3:]
    mask = np.asarray(mask, bool)
    assert mask.shape == shape, (mask.shape, shape)

    khat = _smv_hat(shape, radius)
    # erode by SMV support: keep voxels whose whole SMV sphere is in
    sm = np.fft.ifftn(np.fft.fftn(mask.astype(np.float64))
                      * np.fft.ifftshift(khat)).real
    mask_er = sm >= 1.0 - 1e-9

    dmr = (1.0 - khat).astype(np.float64)
    inv = np.where(np.abs(dmr) < thresh, 0.0,
                   1.0 / np.where(np.abs(dmr) < thresh, 1.0, dmr))
    m = jnp.asarray(mask_er, field.dtype)
    nb = int(field.ndim > 3)
    b = _apply_diag(field, jnp.asarray(dmr, field.dtype), nb) * m
    f_loc = _apply_diag(b, jnp.asarray(inv, field.dtype), nb) * m
    return f_loc, mask_er


# ------------------------------------------------------------------
# TV-regularized dipole inversion
# ------------------------------------------------------------------

def _tv_smooth(c, eps):
    gs = [jnp.diff(c, axis=a, append=c.take(jnp.array([0]), axis=a))
          for a in range(-3, 0)]
    return jnp.sum(jnp.sqrt(sum(g * g for g in gs) + eps))


def field2chi_tv(field, *, lam: float = 1e-4, iters: int = 400,
                 lr: float = 3e-2, thresh: float = 0.1,
                 eps: float = 1e-6, mask=None,
                 voxel=(1.0, 1.0, 1.0), zdir=(0.0, 0.0, 1.0), D=None):
    r"""TV-regularized dipole inversion (MEDI-style spatial prior):

    .. math:: \hat\chi = \arg\min_\chi \|(\mathrm{chi2field}(\chi)
              - \delta)\cdot w\|_2^2 + \lambda\,\mathrm{TV}_\epsilon(\chi)

    optimized by Adam THROUGH the differentiable forward (one
    ``lax.scan``), initialized at :func:`field2chi_tkd`. The spatial
    prior fills in the magic-angle cone the data cannot constrain —
    on the test phantom it roughly halves the χ RMSE vs TKD
    (``examples/qsm.py`` measures both).

    Inputs/optionals: as :func:`field2chi_tkd`, plus ``lam`` (TV
    weight), ``iters``/``lr`` (Adam schedule), ``eps`` (smoothed-TV
    knee), and ``mask`` (static `(n1,n2,n3)` bool: fit the data term
    only inside — e.g. :func:`sharp_background`'s eroded mask — and
    zero χ̂ outside).
    Outputs:
        - ``chi_hat``: same shape as ``field``.
    """
    import optax

    field = jnp.asarray(field)
    assert field.ndim >= 3, field.shape
    if D is None:
        D = dipole_kernel(field.shape[-3:], voxel=voxel, zdir=zdir,
                          dtype=field.dtype)
    else:
        D = jnp.asarray(D, field.dtype)
        assert D.shape == field.shape[-3:], (D.shape, field.shape)
    w = (jnp.asarray(np.asarray(mask, bool), field.dtype)
         if mask is not None else None)
    nb = int(field.ndim > 3)
    chi0 = field2chi_tkd(field, thresh=thresh, D=D)
    if w is not None:
        chi0 = chi0 * w

    def loss_fn(c):
        r = _apply_diag(c, D, nb) - field
        if w is not None:
            r = r * w
        return jnp.sum(r * r) + lam * _tv_smooth(c, eps)

    opt = optax.adam(lr)

    def body(carry, _):
        c, st = carry
        g = jax.grad(loss_fn)(c)
        upd, st = opt.update(g, st)
        return (c + upd, st), None

    (chi, _), _ = jax.lax.scan(body, (chi0, opt.init(chi0)), None,
                               length=int(iters))
    return chi * w if w is not None else chi
