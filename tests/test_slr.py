r"""SLR designer tests: exact inverse recursion, convention closure
against the framework's own Bloch simulator, and designed-profile specs.

The conventions (rotation sense, polynomial variable, profile maps) are
pinned HERE by simulation, not assumed from literature: if these pass,
``slr_design`` pulses do what :mod:`mrphy_tpu.ops` says they do.
"""

import numpy as np
import jax.numpy as jnp
import jax

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu.design.slr import (slr_design, rf2ab, ab2rf, b2a, dzls,
                                  dinf, ab_profile, slr_gr)
from mrphy_tpu.ops import slowsims


def _achieved_profile(rf_nt2, om):
    a, b = rf2ab(rf_nt2, dt=dt0, gam=gamH)
    return ab_profile(a, b, om)


def _bands(nT, tb, d1b, d2b):
    w = dinf(d1b, d2b) / tb
    return (1 - w) * tb / (2 * nT * dt0), (1 + w) * tb / (2 * nT * dt0)


class TestSLRTransform:

    def test_roundtrip_rf_ab_rf(self):
        rng = np.random.default_rng(0)
        rf = 0.05 * rng.standard_normal((64, 2))
        a, b = rf2ab(rf, dt=dt0, gam=gamH)
        rf2 = ab2rf(a, b, dt=dt0, gam=gamH)
        np.testing.assert_allclose(np.asarray(rf2), rf, atol=1e-12)

    def test_unitarity_on_grid(self):
        rng = np.random.default_rng(1)
        rf = 0.05 * rng.standard_normal((64, 2))
        a, b = rf2ab(rf, dt=dt0, gam=gamH)
        om = jnp.linspace(-pi, pi, 201)
        A, B = ab_profile(a, b, om)
        u = A[:, 0]**2 + A[:, 1]**2 + B[:, 0]**2 + B[:, 1]**2
        np.testing.assert_allclose(np.asarray(u), 1.0, atol=1e-12)

    def test_bloch_sim_closure(self):
        r"""m_xy = 2 conj(A)B and m_z = 1−2|B|² match the simulator on
        an off-resonance grid (residual = hard-pulse splitting error,
        O(θ_rf·θ_z) per step — verified to shrink with the angles)."""
        rng = np.random.default_rng(2)
        nT, nF = 64, 81
        rf = 0.0125 * rng.standard_normal((nT, 2))
        df = jnp.linspace(-500., 500., nF)
        om = 2 * pi * df * dt0
        M0 = jnp.tile(jnp.asarray([0., 0., 1.]), (1, nF, 1))
        beff = jnp.zeros((1, nF, nT, 3))
        beff = beff.at[..., 0].set(rf[:, 0])
        beff = beff.at[..., 1].set(rf[:, 1])
        beff = beff.at[..., 2].set((df / gamH)[:, None])
        M = slowsims.blochsim(M0, beff, T1=None, T2=None,
                              gam=jnp.asarray(gamH), dt=jnp.asarray(dt0))
        A, B = _achieved_profile(rf, om)
        mxy_r = 2 * (A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1])
        mxy_i = 2 * (A[:, 0] * B[:, 1] - A[:, 1] * B[:, 0])
        mz = 1 - 2 * (B[:, 0]**2 + B[:, 1]**2)
        np.testing.assert_allclose(np.asarray(M[0, :, 0]), mxy_r,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(M[0, :, 1]), mxy_i,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(M[0, :, 2]), mz, atol=2e-4)

    def test_b2a_magnitude_and_minphase(self):
        h = dzls(128, 6.0, 0.01, 0.01)
        b = 0.7 * h
        a = b2a(b)
        om = jnp.linspace(-pi, pi, 401)
        A, B = ab_profile(a, b, om)
        amag2 = A[:, 0]**2 + A[:, 1]**2
        bmag2 = B[:, 0]**2 + B[:, 1]**2
        np.testing.assert_allclose(np.asarray(amag2 + bmag2), 1.0,
                                   atol=1e-3)
        # minimum-phase: energy front-loaded in the coefficients
        e = np.cumsum(np.asarray(a[:, 0]**2 + a[:, 1]**2))
        assert e[16] / e[-1] > 0.99

    def test_grad_flows_through_inverse_recursion(self):
        r"""b ↦ rf = ab2rf(b2a(b), b) is differentiable (profile
        fine-tuning / SLR-in-the-loop workflows)."""
        h = dzls(32, 4.0, 0.01, 0.01)

        def energy(b):
            rf = ab2rf(b2a(b), b, dt=dt0, gam=gamH)
            return jnp.sum(rf ** 2)

        g = jax.grad(energy)(0.5 * h)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0


class TestSLRDesign:
    nT, tb, d1, d2 = 128, 6.0, 0.01, 0.01

    def _om(self, nF=801):
        f = jnp.linspace(-0.5 / dt0 / 2, 0.5 / dt0 / 2, nF)
        return 2 * pi * f * dt0, np.abs(np.asarray(f))

    def test_ex_profile_on_spec(self):
        rf, _ = slr_design(self.nT, self.tb, ptype='ex', flip=pi / 2,
                           d1=self.d1, d2=self.d2)
        assert rf.shape == (1, 2, self.nT)
        om, fa = self._om()
        fp, fs = _bands(self.nT, self.tb, (self.d1 / 2) ** 0.5,
                        self.d2 / 2 ** 0.5)
        A, B = _achieved_profile(jnp.stack([rf[0, 0], rf[0, 1]], -1), om)
        mxy = 2 * jnp.sqrt((A[:, 0]**2 + A[:, 1]**2)
                           * (B[:, 0]**2 + B[:, 1]**2))
        assert float(jnp.min(mxy[fa < fp])) > 1 - 2.5 * self.d1
        assert float(jnp.max(mxy[fa > fs])) < 2.5 * self.d2

    def test_inv_profile_on_spec(self):
        rf, _ = slr_design(self.nT, self.tb, ptype='inv', flip=pi,
                           d1=self.d1, d2=self.d2)
        om, fa = self._om()
        fp, fs = _bands(self.nT, self.tb, self.d1 / 8,
                        (self.d2 / 2) ** 0.5)
        _, B = _achieved_profile(jnp.stack([rf[0, 0], rf[0, 1]], -1), om)
        mz = 1 - 2 * (B[:, 0]**2 + B[:, 1]**2)
        assert float(jnp.max(mz[fa < fp])) < -1 + 2.5 * self.d1
        assert float(jnp.min(mz[fa > fs])) > 1 - 2.5 * self.d2

    def test_se_refocusing_on_spec(self):
        rf, _ = slr_design(self.nT, self.tb, ptype='se', flip=pi,
                           d1=self.d1, d2=self.d2)
        om, fa = self._om()
        fp, fs = _bands(self.nT, self.tb, self.d1 / 4, self.d2 ** 0.5)
        _, B = _achieved_profile(jnp.stack([rf[0, 0], rf[0, 1]], -1), om)
        b2 = B[:, 0]**2 + B[:, 1]**2          # crushed-SE efficiency
        assert float(jnp.min(b2[fa < fp])) > 1 - 2.5 * self.d1
        assert float(jnp.max(b2[fa > fs])) < 2.5 * self.d2

    def test_ls_close_to_pm(self):
        r"""The jittable LS beta stays within a few × the pm ripples."""
        rf, _ = slr_design(self.nT, self.tb, ptype='ex', flip=pi / 2,
                           d1=self.d1, d2=self.d2, ftype='ls')
        om, fa = self._om()
        fp, fs = _bands(self.nT, self.tb, (self.d1 / 2) ** 0.5,
                        self.d2 / 2 ** 0.5)
        A, B = _achieved_profile(jnp.stack([rf[0, 0], rf[0, 1]], -1), om)
        mxy = 2 * jnp.sqrt((A[:, 0]**2 + A[:, 1]**2)
                           * (B[:, 0]**2 + B[:, 1]**2))
        assert float(jnp.min(mxy[fa < fp])) > 0.9
        assert float(jnp.max(mxy[fa > fs])) < 0.05

    def test_slice_select_bloch_simulation(self):
        r"""End-to-end: SLR 90° + matched slice gradient, simulated
        spatially with the Bloch engine — in-slice excited, out-of-slice
        untouched (the production slice-selection workload)."""
        nT, tb, sl = 128, 6.0, 0.5               # 0.5 cm slice
        rf, _ = slr_design(nT, tb, ptype='ex', flip=pi / 2)
        gr = slr_gr(nT, tb, sl)
        g = float(gr[0, 2, 0])
        bw = tb / (nT * dt0)
        assert np.isclose(gamH * g * sl, bw)
        nM = 101
        x = jnp.linspace(-1.5 * sl, 1.5 * sl, nM)
        M0 = jnp.tile(jnp.asarray([0., 0., 1.]), (1, nM, 1))
        beff = jnp.zeros((1, nM, nT, 3))
        beff = beff.at[..., 0].set(rf[0, 0])
        beff = beff.at[..., 1].set(rf[0, 1])
        beff = beff.at[..., 2].set((g * x)[:, None])
        M = slowsims.blochsim(M0, beff, T1=None, T2=None,
                              gam=jnp.asarray(gamH), dt=jnp.asarray(dt0))
        mxy = np.hypot(np.asarray(M[0, :, 0]), np.asarray(M[0, :, 1]))
        xa = np.abs(np.asarray(x))
        w = dinf((self.d1 / 2) ** 0.5, self.d2 / 2 ** 0.5) / tb
        assert mxy[xa < (1 - w) * sl / 2].min() > 0.97
        assert mxy[xa > (1 + w) * sl / 2].max() < 0.03

    def test_bad_ptype_raises(self):
        import pytest
        with pytest.raises(AssertionError, match='spam'):
            slr_design(64, 4.0, ptype='spam')
