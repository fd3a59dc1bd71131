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
