r"""Susceptibility→field (QSM model family) tests — exact oracles:

- infinite cylinder ∥ B0 maps to ``δ = (χ − χ̄)/3`` POINTWISE (the
  dipole kernel is identically 1/3 on the ``k_z = 0`` plane) — exact
  on the periodic grid, tested at f64 rounding;
- a discretized sphere has ~zero interior shift;
- a cylinder ⊥ B0 has interior shift ``−χ/6``;
- the operator is linear and self-adjoint (1e-12, matches the vjp);
- TKD recovers any mode with ``|D| ≥ thresh`` exactly;
- ``zdir`` is a pure rotation of the kernel (axis-permutation check);
- batched == loop.

Beyond-reference family (the torch reference has no field-simulation
stage); cross-link: ``δ·γB0`` is the ``df`` map consumed by
``SpinArray``/``nufft`` time segmentation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu.ops.field import dipole_kernel, chi2field, field2chi_tkd


def _rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------------
# dipole kernel
# ------------------------------------------------------------------

def test_kernel_basic():
    D = dipole_kernel((8, 6, 4), dtype=jnp.float64)
    D = np.asarray(D)
    assert D.shape == (8, 6, 4)
    assert D[4, 3, 2] == 0.0                       # DC (centered)
    assert np.isfinite(D).all()
    # range of 1/3 - cos^2: [-2/3, 1/3]
    assert (D >= -2 / 3 - 1e-12).all() and (D <= 1 / 3 + 1e-12).all()
    # kz = 0 plane (away from DC): exactly 1/3
    pl = D[:, :, 2].copy()
    pl[4, 3] = 1 / 3
    np.testing.assert_allclose(pl, 1 / 3, rtol=0, atol=1e-15)


def test_kernel_zdir_rotation():
    # zdir = x on a cubic grid == the z-kernel with axes 0<->2 swapped
    Dz = np.asarray(dipole_kernel((10, 10, 10), dtype=jnp.float64))
    Dx = np.asarray(dipole_kernel((10, 10, 10), zdir=(1.0, 0.0, 0.0),
                                  dtype=jnp.float64))
    np.testing.assert_allclose(Dx, Dz.transpose(2, 1, 0), atol=1e-15)


# ------------------------------------------------------------------
# exact physics oracles
# ------------------------------------------------------------------

def test_cylinder_parallel_exact():
    # chi independent of z (any in-plane pattern): delta = (chi-mean)/3
    # pointwise, exact on the periodic grid.
    rng = _rng(1)
    chi2d = rng.standard_normal((12, 10))
    chi = jnp.asarray(np.broadcast_to(chi2d[..., None], (12, 10, 6)),
                      jnp.float64)
    d = chi2field(chi)
    want = (chi - chi.mean()) / 3.0
    np.testing.assert_allclose(np.asarray(d), np.asarray(want),
                               rtol=0, atol=1e-12)


def test_sphere_interior_zero():
    n, R = 40, 9.0
    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    chi0 = 1.0
    chi = jnp.asarray((r <= R) * chi0, jnp.float64)
    d = np.asarray(chi2field(chi))
    core = r <= R - 3.0            # away from the jagged boundary
    assert core.sum() > 200
    # continuous result: exactly 0 inside; discrete grid leaves a few %
    assert np.abs(d[core]).max() < 0.02 * chi0


def test_cylinder_perp_interior():
    # infinite cylinder along x (perp to B0=z): interior shift -chi/6
    n, R = 48, 10.0
    ax = np.arange(n) - n // 2
    y, z = np.meshgrid(ax, ax, indexing='ij')
    r = np.sqrt(y ** 2 + z ** 2)
    chi0 = 1.0
    chi2d = (r <= R) * chi0
    chi = jnp.asarray(np.broadcast_to(chi2d[None], (4, n, n)), jnp.float64)
    d = np.asarray(chi2field(chi))
    core = np.broadcast_to((r <= R - 3.0)[None], (4, n, n))
    # demodulated convention: interior - mean background offset
    got = d[core].mean()
    want = -chi0 / 6.0 * (1.0 - np.pi * R * R / (n * n))  # DC removed
    np.testing.assert_allclose(got, want, rtol=0.05)


# ------------------------------------------------------------------
# operator structure
# ------------------------------------------------------------------

def test_linear_self_adjoint():
    rng = _rng(2)
    a = jnp.asarray(rng.standard_normal((6, 8, 10)), jnp.float64)
    b = jnp.asarray(rng.standard_normal((6, 8, 10)), jnp.float64)
    Aa, Ab = chi2field(a), chi2field(b)
    # linearity
    np.testing.assert_allclose(np.asarray(chi2field(2.5 * a - b)),
                               np.asarray(2.5 * Aa - Ab), atol=1e-12)
    # self-adjointness <Aa, b> == <a, Ab>
    np.testing.assert_allclose(float(jnp.vdot(Aa, b)),
                               float(jnp.vdot(a, Ab)), rtol=1e-12)
    # ... and therefore vjp(f)(v) == A v
    _, vjp = jax.vjp(chi2field, a)
    np.testing.assert_allclose(np.asarray(vjp(b)[0]), np.asarray(Ab),
                               atol=1e-12)


def test_batched_matches_loop():
    rng = _rng(3)
    chi = jnp.asarray(rng.standard_normal((3, 6, 6, 8)), jnp.float64)
    d = np.asarray(chi2field(chi))
    for i in range(3):
        np.testing.assert_allclose(d[i], np.asarray(chi2field(chi[i])),
                                   atol=1e-13)


def test_f32_path():
    rng = _rng(4)
    chi = jnp.asarray(rng.standard_normal((8, 8, 8)), jnp.float32)
    d = chi2field(chi)
    assert d.dtype == jnp.float32
    d64 = chi2field(chi.astype(jnp.float64))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d64),
                               rtol=0, atol=1e-5)


# ------------------------------------------------------------------
# TKD inversion
# ------------------------------------------------------------------

def test_tkd_single_mode_exact():
    # one k-mode with |D| > thresh: TKD round-trips chi exactly
    n = 16
    D = np.asarray(dipole_kernel((n, n, n), dtype=jnp.float64))
    # mode k = (0, 0, 2) about DC: D = 1/3 - 1 = -2/3 (|D| max)
    ax = np.arange(n)
    chi = np.cos(2 * np.pi * 2 * ax / n)          # z-only variation
    chi = jnp.asarray(np.broadcast_to(chi[None, None], (n, n, n)),
                      jnp.float64)
    assert abs(D[n // 2, n // 2, n // 2 + 2] + 2 / 3) < 1e-12
    f = chi2field(chi)
    # both conjugate modes sit at D = -2/3, so f = -2/3 chi pointwise
    np.testing.assert_allclose(np.asarray(f), np.asarray(-2 / 3 * chi),
                               atol=1e-12)
    chi_hat = field2chi_tkd(f, thresh=0.2)
    np.testing.assert_allclose(np.asarray(chi_hat), np.asarray(chi),
                               rtol=0, atol=1e-12)


def test_tkd_rejects_wrong_shaped_D():
    # regression: a broadcast-compatible but wrong-shaped explicit D
    # used to produce a silently wrong inversion (chi2field asserted,
    # field2chi_tkd did not)
    import pytest
    n = 8
    f = jnp.asarray(np.random.default_rng(0).normal(size=(n, n, n)))
    bad = jnp.ones((n,))                      # broadcasts against (n,n,n)
    with pytest.raises(AssertionError):
        field2chi_tkd(f, D=bad)


def test_tkd_recovers_well_conditioned_modes():
    # random chi: after TKD, the re-forward field matches the data on
    # every mode with |D| >= thresh (and only attenuates cone modes).
    rng = _rng(5)
    n = 12
    chi = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    t = 0.15
    f = chi2field(chi)
    f_hat = chi2field(field2chi_tkd(f, thresh=t))
    D = np.asarray(dipole_kernel((n, n, n), dtype=jnp.float64))
    err_k = np.fft.fftshift(np.fft.fftn(np.asarray(f_hat - f)))
    good = np.abs(D) >= t
    assert good.sum() > 0.5 * D.size
    assert np.abs(err_k[good]).max() < 1e-9 * np.abs(
        np.fft.fftshift(np.fft.fftn(np.asarray(f)))).max()


def test_tkd_jittable_differentiable():
    rng = _rng(6)
    chi = jnp.asarray(rng.standard_normal((6, 6, 6)), jnp.float64)
    D = dipole_kernel((6, 6, 6), dtype=jnp.float64)

    @jax.jit
    def loss(c):
        return jnp.sum(chi2field(c, D=D) ** 2)

    g = jax.grad(loss)(chi)
    # d/dc sum((Ac)^2) = 2 A^T A c = 2 A A c (self-adjoint)
    want = 2.0 * chi2field(chi2field(chi))
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-11)


@pytest.mark.parametrize('thresh', [0.1, 0.3])
def test_tkd_thresh_monotone(thresh):
    # larger thresh == more attenuation == smaller recovered norm
    rng = _rng(7)
    chi = jnp.asarray(rng.standard_normal((8, 8, 8)), jnp.float64)
    f = chi2field(chi)
    x = np.linalg.norm(np.asarray(field2chi_tkd(f, thresh=thresh)))
    x2 = np.linalg.norm(np.asarray(field2chi_tkd(f, thresh=thresh + 0.2)))
    assert x2 <= x + 1e-12


# ------------------------------------------------------------------
# Laplacian phase unwrapping
# ------------------------------------------------------------------

from mrphy_tpu.ops.field import (unwrap_phase, smv_kernel,  # noqa: E402
                                 sharp_background, field2chi_tv)


def _bowl(n, amp, tilt=3.0):
    ax = (np.arange(n) - n // 2) / (n / 2)
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    return amp * np.exp(-(x ** 2 + y ** 2 + z ** 2) / 0.6) + tilt * x


@pytest.mark.parametrize('amp', [12.0, 25.0])
def test_unwrap_exact_congruent(amp):
    # smooth phase wrapping many times: congruent unwrap is exact up
    # to ONE global 2*pi*k offset
    phi = _bowl(32, amp)
    psi = np.angle(np.exp(1j * phi))
    u = np.asarray(unwrap_phase(jnp.asarray(psi, jnp.float64)))
    d = u - phi
    k = np.round(d.mean() / (2 * np.pi))
    np.testing.assert_allclose(d, 2 * np.pi * k, rtol=0, atol=1e-9)


def test_unwrap_steep_needs_picard():
    # 40 rad of range on a 32^3 grid: one-shot estimate errs > pi
    # (congruence alone cannot fix it); Picard iterations converge
    # to exact recovery
    phi = _bowl(32, 40.0)
    psi = np.angle(np.exp(1j * phi))
    u = np.asarray(unwrap_phase(jnp.asarray(psi, jnp.float64), niter=4))
    d = u - phi
    k = np.round(d.mean() / (2 * np.pi))
    np.testing.assert_allclose(d, 2 * np.pi * k, rtol=0, atol=1e-9)


def test_unwrap_smooth_estimate():
    # congruent=False returns the smooth Poisson estimate (no 2pi
    # re-bias): close to truth but not congruent
    phi = _bowl(32, 12.0)
    psi = np.angle(np.exp(1j * phi))
    u = np.asarray(unwrap_phase(jnp.asarray(psi, jnp.float64),
                                congruent=False))
    d = u - phi
    d -= d.mean()
    assert np.abs(d).max() < 0.5, np.abs(d).max()


def test_unwrap_batched_f32():
    phi = np.stack([_bowl(16, 8.0), _bowl(16, 15.0)])
    psi = np.angle(np.exp(1j * phi)).astype(np.float32)
    u = np.asarray(unwrap_phase(jnp.asarray(psi)))
    assert u.shape == psi.shape and u.dtype == np.float32
    for i in range(2):
        ui = np.asarray(unwrap_phase(jnp.asarray(psi[i])))
        np.testing.assert_allclose(u[i], ui, atol=1e-5)
        d = u[i] - phi[i]
        k = np.round(d.mean() / (2 * np.pi))
        np.testing.assert_allclose(d, 2 * np.pi * k, rtol=0, atol=1e-2)


def test_unwrap_already_unwrapped_is_identity():
    # |phase| < pi everywhere: congruent unwrap returns psi exactly
    phi = _bowl(16, 0.8, tilt=0.3)
    phi -= phi.mean()
    assert np.abs(phi).max() < np.pi
    u = np.asarray(unwrap_phase(jnp.asarray(phi, jnp.float64)))
    np.testing.assert_allclose(u, phi, atol=1e-12)


# ------------------------------------------------------------------
# SMV kernel / SHARP
# ------------------------------------------------------------------

def test_smv_kernel_is_exact_convolution():
    rng = _rng(8)
    n = 12
    x = rng.standard_normal((n, n, n))
    khat = smv_kernel((n, n, n), 2.5, dtype=jnp.float64)
    got = np.asarray(__import__('mrphy_tpu.ops.field', fromlist=['x'])
                     ._apply_diag(jnp.asarray(x), khat, 0))
    ax = np.arange(n) - n // 2
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    k = ((X ** 2 + Y ** 2 + Z ** 2) <= 2.5 ** 2).astype(float)
    k /= k.sum()
    want = np.fft.ifftn(np.fft.fftn(x)
                        * np.fft.fftn(np.fft.ifftshift(k))).real
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharp_removes_external_field():
    n = 48
    ax = np.arange(n) - n // 2
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    mask = X ** 2 + Y ** 2 + Z ** 2 <= 16 ** 2
    chi_in = np.where((X - 4) ** 2 + (Y - 3) ** 2 + Z ** 2 <= 3 ** 2,
                      0.3, 0.0)
    # strong source just outside the mask (2-voxel gap): its field
    # inside the mask is harmonic -> SHARP-removable
    chi_out = np.where((X - 21) ** 2 + Y ** 2 + (Z - 6) ** 2 <= 3.5 ** 2,
                       5.0, 0.0)
    f_tot = chi2field(jnp.asarray(chi_in + chi_out, jnp.float64))
    f_true = np.asarray(chi2field(jnp.asarray(chi_in, jnp.float64)))
    f_loc, m_er = sharp_background(f_tot, mask, radius=4.0)
    f_loc = np.asarray(f_loc)
    assert m_er.sum() > 0 and (mask | ~m_er).all()     # eroded subset
    a = f_loc[m_er] - f_loc[m_er].mean()
    b = f_true[m_er] - f_true[m_er].mean()
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    # and the background was a same-order contaminant in the input
    bg = np.asarray(f_tot) - f_true
    bg_frac = np.linalg.norm(bg[m_er] - bg[m_er].mean()) / np.linalg.norm(b)
    assert bg_frac > 0.5, bg_frac
    assert rel < 0.05, rel


def test_sharp_differentiable_in_field():
    n = 16
    ax = np.arange(n) - n // 2
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    mask = X ** 2 + Y ** 2 + Z ** 2 <= 6 ** 2

    def loss(f):
        fl, _ = sharp_background(f, mask, radius=2.0)
        return jnp.sum(fl ** 2)

    f = jnp.asarray(_rng(9).standard_normal((n, n, n)))
    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------------------------------------
# TV dipole inversion
# ------------------------------------------------------------------

def test_tv_beats_tkd():
    n = 24
    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    chi = np.zeros((n, n, n))
    chi[(x + 4) ** 2 + (y + 4) ** 2 + z ** 2 <= 9] = 0.4
    chi[(x - 5) ** 2 + (y - 5) ** 2 <= 4] = 0.3
    f = chi2field(jnp.asarray(chi, jnp.float64))
    chi_tkd = np.asarray(field2chi_tkd(f, thresh=0.1))
    chi_tv = np.asarray(field2chi_tv(f, iters=200))
    r_tkd = np.sqrt(np.mean((chi_tkd - chi) ** 2))
    r_tv = np.sqrt(np.mean((chi_tv - chi) ** 2))
    assert r_tv < 0.7 * r_tkd, (r_tv, r_tkd)


def test_tv_mask_zeroes_outside():
    n = 16
    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    mask = x ** 2 + y ** 2 + z ** 2 <= 6 ** 2
    chi = np.where(x ** 2 + y ** 2 + z ** 2 <= 9, 0.3, 0.0)
    f = chi2field(jnp.asarray(chi, jnp.float64))
    ch = np.asarray(field2chi_tv(f, iters=50, mask=mask))
    assert (ch[~mask] == 0).all()
    assert np.abs(ch[mask]).max() > 0


# ------------------------------------------------------------------
# cross-subsystem: the field module feeds the simulator's df contract
# ------------------------------------------------------------------

def test_chi2field_feeds_freeprec():
    # chi (ppm) -> delta -> df (Hz) -> Bloch free precession: the
    # accumulated transverse phase must be -2*pi*df*t per the
    # simulator's documented sign convention (slowsims.freeprec) --
    # pins the unit/sign contract between the QSM family and the
    # engines (SpinArray.df consumers).
    from mrphy_tpu.ops.slowsims import freeprec

    n = 16
    f0 = 127.74e6 * 1e-6            # Hz/ppm at 3 T
    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    chi = np.where(x ** 2 + y ** 2 + z ** 2 <= 16, 0.5, 0.0)  # ppm
    delta = chi2field(jnp.asarray(chi, jnp.float64))          # ppm
    df = f0 * delta.reshape(1, -1)                            # (1, nS) Hz

    M = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float64),
                 (1, n ** 3, 1))
    t = 5e-3
    Mt = freeprec(M, t, df=df)
    got = np.arctan2(np.asarray(Mt[..., 1]), np.asarray(Mt[..., 0]))
    want = -2 * np.pi * np.asarray(df) * t
    # |phase| < pi here (max |df| ~ 43 Hz * 5 ms) -> no wrap ambiguity
    assert np.abs(want).max() < np.pi
    np.testing.assert_allclose(got, want, atol=1e-12)
