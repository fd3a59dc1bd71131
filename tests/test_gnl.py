r"""Gradient-nonlinearity tests:

- every solid-harmonic basis column is HARMONIC (trace of the exact
  jax Hessian = 0 at random points) — the physical requirement on a
  source-free coil field, and a strong oracle against wrong forms;
- zero coefficients = identity map; displacement algebra;
- Newton/fixed-point inversion round-trips at 1e-9 on 10%-level
  deviations;
- Jacobian determinant matches analytic values for linear maps;
- GNL-as-effective-location is EXACTLY the assembled Bz: rfgr2beff
  with ``gnl_loc(loc)`` equals the manual sum of per-axis coil fields.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu.utils.shim import sh_basis
from mrphy_tpu.utils.gnl import (gnl_loc, gnl_displacement, gnl_invert,
                                 gnl_jacdet)


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.slow
def test_sh_basis_columns_are_harmonic():
    pts = jnp.asarray(_rng(0).standard_normal((64, 3)))

    def lap(j):
        def fj(r):
            return sh_basis(r, 3)[j]
        H = jax.vmap(jax.hessian(fj))(pts)        # (64, 3, 3)
        return np.asarray(jnp.trace(H, axis1=-2, axis2=-1))

    nB = sh_basis(pts[:1], 3).shape[-1]
    assert nB == 16
    for j in range(nB):
        np.testing.assert_allclose(lap(j), 0.0, atol=1e-10,
                                   err_msg=f'column {j} not harmonic')


def test_identity_and_displacement():
    loc = jnp.asarray(_rng(1).standard_normal((2, 5, 3)))
    z = jnp.zeros((3, 16))
    np.testing.assert_allclose(np.asarray(gnl_loc(loc, z)),
                               np.asarray(loc), atol=0)
    c = z.at[2, 9].set(0.01)     # z-coil z^3-family term
    d = gnl_displacement(loc, c)
    assert (np.asarray(d[..., :2]) == 0).all()
    x, y, zz = loc[..., 0], loc[..., 1], loc[..., 2]
    want = 0.01 * zz * (2 * zz ** 2 - 3 * (x ** 2 + y ** 2))
    np.testing.assert_allclose(np.asarray(d[..., 2]), np.asarray(want),
                               rtol=1e-12)


def test_invert_round_trip():
    rng = _rng(2)
    loc = jnp.asarray(rng.uniform(-1, 1, (200, 3)))
    c = jnp.asarray(0.03 * rng.standard_normal((3, 16)))
    le = gnl_loc(loc, c)
    # ~10%-level displacements in the unit FOV
    assert 0.02 < float(jnp.abs(le - loc).max()) < 0.6
    back = gnl_invert(le, c, iters=60)
    np.testing.assert_allclose(np.asarray(back), np.asarray(loc),
                               atol=1e-9)
    # and forward(inverse) == target too
    np.testing.assert_allclose(np.asarray(gnl_loc(back, c)),
                               np.asarray(le), atol=1e-9)


def test_jacdet_analytic():
    loc = jnp.asarray(_rng(3).standard_normal((40, 3)))
    # linear deviations: f_x = x + 0.1x + 0.2y, f_y = y, f_z = z - 0.05z
    c = jnp.zeros((3, 4)).at[0, 1].set(0.1).at[0, 2].set(0.2) \
                         .at[2, 3].set(-0.05)
    det = np.asarray(gnl_jacdet(loc, c, order=1))
    np.testing.assert_allclose(det, 1.1 * 1.0 * 0.95, rtol=1e-12)


def test_effective_loc_is_exact_bz():
    # rfgr2beff(loc_eff) Bz == sum_a g_a(t) * f_a(r): GNL simulation
    # without engine changes
    from mrphy_tpu.ops.beffective import rfgr2beff

    rng = _rng(4)
    N, nM, nT = 1, 7, 9
    loc = jnp.asarray(rng.uniform(-1, 1, (N, nM, 3)))
    gr = jnp.asarray(rng.standard_normal((N, 3, nT)))
    rf = jnp.zeros((N, 2, nT))
    c = jnp.asarray(0.05 * rng.standard_normal((3, 16)))
    le = gnl_loc(loc, c)
    beff = rfgr2beff(rf, gr, le)
    bz = np.asarray(beff[..., 2])                    # (N, nM, nT)
    want = np.einsum('nma,nat->nmt', np.asarray(le), np.asarray(gr))
    np.testing.assert_allclose(bz, want, atol=1e-12)


def test_jittable():
    c = jnp.asarray(0.02 * _rng(5).standard_normal((3, 16)))
    loc = jnp.asarray(_rng(6).uniform(-1, 1, (10, 3)))
    f = jax.jit(lambda r: gnl_invert(gnl_loc(r, c), c, iters=20))
    np.testing.assert_allclose(np.asarray(f(loc)), np.asarray(loc),
                               atol=1e-7)
    # differentiable end to end
    g = jax.grad(lambda r: jnp.sum(gnl_loc(r, c) ** 2))(loc)
    assert np.isfinite(np.asarray(g)).all()
