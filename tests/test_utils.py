r"""Round-trip and golden tests for mrphy_tpu.utils.

Mirrors the reference test strategy (`/root/reference/tests/test_utils.py`):
every conversion pair is verified as a round-trip; `ctrsub` against exact
values. Adds jit-compilation checks the reference has no analog for.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, rfmax0, smax0
from mrphy_tpu import utils

ATOL32 = 1e-4


class TestUtils:
    dtype = jnp.float32
    gam = jnp.asarray(gamH, dtype)
    dt = jnp.asarray(dt0, dtype)

    def test_ctrsub(self):
        x = utils.ctrsub(np.arange(7))
        assert np.all(x == np.array([0, 0, 1, 1, 2, 2, 3]))
        assert utils.ctrsub(7) == 3
        assert utils.ctrsub((4, 5)) == (2, 2)

    def test_kgs_roundtrip(self):
        k = jnp.asarray([[[1., 2., 3., 4., 0.]]], self.dtype)
        gTx = utils.k2g(k, True, dt=self.dt, gam=self.gam)
        gRx = utils.k2g(k, False, dt=self.dt, gam=self.gam)
        gTx1 = utils.s2g(utils.g2s(gTx, self.dt), self.dt)

        np.testing.assert_allclose(
            utils.g2k(gTx, True, dt=self.dt, gam=self.gam), k, atol=ATOL32)
        np.testing.assert_allclose(
            utils.g2k(gRx, False, dt=self.dt, gam=self.gam), k, atol=ATOL32)
        np.testing.assert_allclose(gTx, gTx1, atol=ATOL32)

    def test_k2g_requires_tx_origin(self):
        k = jnp.asarray([[[1., 2., 3., 4., 5.]]], self.dtype)
        with pytest.raises(ValueError):
            utils.k2g(k, True, dt=self.dt, gam=self.gam)

    def test_kgs_unicode_kwargs(self):
        k = jnp.asarray([[[1., 0.]]], self.dtype)
        a = utils.g2k(utils.k2g(k, False, self.dt, **{'γ': self.gam}),
                      False, self.dt, **{'γ': self.gam})
        np.testing.assert_allclose(a, k, atol=ATOL32)

    def test_rf_c2r_r2c_roundtrip(self):
        rng = np.random.default_rng(0)
        rf0 = rng.random((1, 2, 5))
        rf1 = utils.rf_c2r(utils.rf_r2c(rf0))
        np.testing.assert_allclose(rf0, rf1, atol=ATOL32)
        # with coil dim
        rf0 = rng.random((2, 2, 5, 3))
        rf1 = utils.rf_c2r(utils.rf_r2c(rf0))
        np.testing.assert_allclose(rf0, rf1, atol=ATOL32)

    def test_rf_converters_without_backend_complex(self, monkeypatch):
        r"""On runtimes without complex dtypes (axon TPU) the converters
        stay usable: rf_r2c returns a host numpy complex array, rf_c2r
        accepts it and returns a real device array."""
        from mrphy_tpu.utils import rf as rfmod
        monkeypatch.setattr(rfmod, '_complex_ok', lambda: False)
        rng = np.random.default_rng(2)
        rf0 = rng.random((1, 2, 7))
        rfc = rfmod.rf_r2c(rf0)
        assert isinstance(rfc, np.ndarray) and np.iscomplexobj(rfc)
        rf1 = rfmod.rf_c2r(rfc)
        assert isinstance(rf1, jax.Array)
        np.testing.assert_allclose(rf0, np.asarray(rf1), atol=ATOL32)

    def test_rfclamp_tan_roundtrip(self):
        rng = np.random.default_rng(1)
        rfmax = jnp.asarray(rfmax0, self.dtype)
        rf0 = utils.rfclamp(
            rfmax0 * (rng.random((1, 2, 10)) - 0.5) * 4, rfmax)
        assert bool(jnp.all(jnp.linalg.norm(rf0, axis=1) <= rfmax0))
        trho, theta = utils.rf2trho_theta(rf0, rfmax)
        rf1 = utils.trho_theta2rf(trho, theta, rfmax)
        np.testing.assert_allclose(rf0, rf1, atol=ATOL32)
        # unicode aliases point to the same functions
        assert utils.rf2tρθ is utils.rf2trho_theta
        assert utils.tρθ2rf is utils.trho_theta2rf

    def test_rfclamp_logit_roundtrip(self):
        rng = np.random.default_rng(2)
        rfmax = jnp.asarray(rfmax0, self.dtype)
        rf0 = utils.rfclamp(
            rfmax0 * (rng.random((1, 2, 10)) - 0.5) * 4, rfmax)
        lrho, theta = utils.rf2lrho_theta(rf0, rfmax)
        rf1 = utils.lrho_theta2rf(lrho, theta, rfmax)
        np.testing.assert_allclose(rf0, rf1, atol=ATOL32)

    def test_sclamp_tan_roundtrip(self):
        rng = np.random.default_rng(3)
        smax = jnp.asarray(smax0, self.dtype)
        s0 = utils.sclamp(smax0 * (rng.random((1, 3, 10)) - 0.5) * 4, smax)
        assert bool(jnp.all(jnp.abs(s0) <= smax0))
        s1 = utils.ts2s(utils.s2ts(s0, smax), smax)
        np.testing.assert_allclose(s0, s1, atol=ATOL32 * smax0)

    def test_uphirot_matches_rotation_matrix(self):
        rng = np.random.default_rng(4)
        u = rng.normal(size=(2, 5, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        phi = rng.normal(size=(2, 5))
        v = rng.normal(size=(2, 5, 3))

        vo = utils.uphirot(u, phi, v)

        # oracle: Rodrigues rotation matrix
        def rotmat(u, phi):
            ux = np.array([[0, -u[2], u[1]],
                           [u[2], 0, -u[0]],
                           [-u[1], u[0], 0]])
            return (np.cos(phi) * np.eye(3)
                    + (1 - np.cos(phi)) * np.outer(u, u)
                    + np.sin(phi) * ux)

        for i in range(2):
            for j in range(5):
                expect = rotmat(u[i, j], phi[i, j]) @ v[i, j]
                np.testing.assert_allclose(vo[i, j], expect, atol=1e-9)

    def test_uphirot_trailing_nv_dim(self):
        rng = np.random.default_rng(5)
        u = rng.normal(size=(1, 4, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        phi = rng.normal(size=(1, 4))
        v = rng.normal(size=(1, 4, 3, 6))
        vo = utils.uphirot(u, phi, v)
        for nv in range(6):
            np.testing.assert_allclose(
                vo[..., nv], utils.uphirot(u, phi, v[..., nv]), atol=1e-12)

    def test_jittable(self):
        k = jnp.asarray([[[1., 2., 0.]]], self.dtype)
        f = jax.jit(lambda k: utils.g2k(
            utils.k2g(k, False, self.dt, gam=self.gam),
            False, self.dt, gam=self.gam))
        np.testing.assert_allclose(f(k), k, atol=ATOL32)


class TestShim:
    r"""Spherical-harmonic B0 shimming: exact recovery of in-basis
    fields, weighted/masked fits, residual reduction on out-of-basis
    maps, and batch broadcasting."""

    def test_exact_recovery_in_basis(self):
        import jax.numpy as jnp
        from mrphy_tpu.utils.shim import sh_basis, shim_fit, shim_apply
        rng = np.random.default_rng(3)
        loc = jnp.asarray(rng.uniform(-8, 8, (200, 3)), jnp.float64)
        c_true = jnp.asarray(rng.standard_normal(9), jnp.float64)
        df = (sh_basis(loc) @ c_true[:, None])[:, 0]
        c, res = shim_fit(df, loc)
        assert float(jnp.abs(c - c_true).max()) < 1e-9
        assert float(jnp.abs(res).max()) < 1e-9
        assert float(jnp.abs(shim_apply(df, loc, c)).max()) < 1e-9

    def test_out_of_basis_residual_shrinks_with_order(self):
        import jax.numpy as jnp
        from mrphy_tpu.utils.shim import shim_fit
        rng = np.random.default_rng(5)
        loc = jnp.asarray(rng.uniform(-8, 8, (400, 3)), jnp.float64)
        x, y, z = loc[:, 0], loc[:, 1], loc[:, 2]
        df = 10 + 3 * x - 2 * z + 0.4 * x * y + 0.05 * x ** 3  # cubic
        r0 = float(jnp.linalg.norm(shim_fit(df, loc, order=0)[1]))
        r1 = float(jnp.linalg.norm(shim_fit(df, loc, order=1)[1]))
        r2 = float(jnp.linalg.norm(shim_fit(df, loc, order=2)[1]))
        assert r2 < r1 < r0
        assert r2 < 0.35 * float(jnp.linalg.norm(df))

    def test_weighted_fit_ignores_masked_voxels(self):
        import jax.numpy as jnp
        from mrphy_tpu.utils.shim import sh_basis, shim_fit
        rng = np.random.default_rng(7)
        loc = jnp.asarray(rng.uniform(-8, 8, (300, 3)), jnp.float64)
        c_true = jnp.asarray(rng.standard_normal(9), jnp.float64)
        df = (sh_basis(loc) @ c_true[:, None])[:, 0]
        # corrupt voxels outside the "support"; weights exclude them
        w = jnp.asarray(rng.uniform(0, 1, 300) > 0.3, jnp.float64)
        df_bad = jnp.where(w > 0, df, 1e3)
        c, _ = shim_fit(df_bad, loc, w_=w)
        assert float(jnp.abs(c - c_true).max()) < 1e-9

    def test_batched(self):
        import jax.numpy as jnp
        from mrphy_tpu.utils.shim import sh_basis, shim_fit
        rng = np.random.default_rng(9)
        loc = jnp.asarray(rng.uniform(-8, 8, (1, 120, 3)), jnp.float64)
        c_true = jnp.asarray(rng.standard_normal((2, 9)), jnp.float64)
        B = sh_basis(loc)[0]
        df = jnp.einsum('mb,nb->nm', B, c_true)
        c, res = shim_fit(df, loc)
        assert c.shape == (2, 9)
        assert float(jnp.abs(c - c_true).max()) < 1e-9
        assert float(jnp.abs(res).max()) < 1e-8


class TestInterpMatrix:
    r"""On-device resampling matrices (``utils/interp.py``, round 4):
    every kind pinned against ``scipy.interpolate.interp1d`` on the
    same grids — the matrix IS the interpolation operator, so f64
    agreement is at solver precision."""

    def _grids(self, seed=0, n=23, m=41, uniform=False):
        rng = np.random.default_rng(seed)
        if uniform:
            t_o = np.arange(n) * 4e-6
        else:
            t_o = np.cumsum(rng.uniform(0.5, 1.5, n))
        t_n = np.sort(rng.uniform(t_o[0], t_o[-1], m))
        y = rng.standard_normal((3, n))
        return t_o, t_n, y

    def test_all_kinds_vs_scipy(self):
        from scipy import interpolate
        from mrphy_tpu.utils.interp import interp_matrix
        for uniform in (False, True):
            t_o, t_n, y = self._grids(uniform=uniform)
            for kind in ('linear', 'cubic', 'nearest', 'nearest-up',
                         'previous', 'next', 'zero', 'quadratic',
                         'slinear'):
                C = interp_matrix(t_o, t_n, kind)
                got = y @ C.T
                want = interpolate.interp1d(
                    t_o, y, axis=-1, kind=kind)(t_n)
                np.testing.assert_allclose(
                    got, want, atol=1e-11,
                    err_msg=f'{kind} uniform={uniform}')

    def test_exact_at_samples(self):
        # querying the knots reproduces the data exactly (cubic spline
        # interpolates): C restricted to t_o is the identity
        from mrphy_tpu.utils.interp import interp_matrix
        t_o, _, y = self._grids(seed=1)
        C = interp_matrix(t_o, t_o, 'cubic')
        np.testing.assert_allclose(y @ C.T, y, atol=1e-11)

    def test_apply_on_device_and_grads(self):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.utils.interp import interp_matrix, interp1d_apply
        t_o, t_n, y = self._grids(seed=2)
        C = interp_matrix(t_o, t_n, 'cubic')
        yj = jnp.asarray(y)
        out = interp1d_apply(C, yj, axis=-1)
        np.testing.assert_allclose(np.asarray(out), y @ C.T, rtol=1e-12)
        g = jax.grad(lambda v: float(0) + jnp.sum(
            interp1d_apply(C, v, axis=-1) ** 2))(yj)
        assert np.all(np.isfinite(np.asarray(g)))
        # the adjoint of the matrix apply is the transposed matmul
        np.testing.assert_allclose(np.asarray(g), 2 * (y @ C.T) @ C,
                                   rtol=1e-10)

    def test_guards(self):
        from mrphy_tpu.utils.interp import interp_matrix
        t_o, t_n, _ = self._grids()
        with pytest.raises(AssertionError):
            interp_matrix(t_o[::-1], t_n, 'cubic')     # not increasing
        with pytest.raises(AssertionError):
            interp_matrix(t_o, t_n + t_o[-1], 'cubic')  # extrapolation
        with pytest.raises(AssertionError):
            interp_matrix(t_o[:3], t_o[:3], 'cubic')   # n < 4
