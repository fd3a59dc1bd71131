r"""Golden-value and cross-implementation tests for the autodiff oracle.

Mirrors `/root/reference/tests/test_slowsims.py`: (1) golden magnetization
triples, (2) blochsim == per-step blochsim_1step == A/B-propagator apply,
(3) gradients through the scan path and the A/B path agree.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import pi
from mrphy_tpu.ops import beffective, slowsims

from tests._scenario import (pulse_arrays, MO_GOLD_RELAX, FREEPREC_GOLD)

ATOL = 1e-9
DTYPE = jnp.float64


class TestSlowsims:

    def test_blochsims_golden_and_equivalence(self):
        sc = pulse_arrays(nM=3, nT=512, dtype=DTYPE)
        gam, dt = sc['gam'], sc['dt']

        M0 = jnp.asarray([[[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]], DTYPE)
        T1 = jnp.asarray([[1.]], DTYPE)
        T2 = jnp.asarray([[4e-2]], DTYPE)
        E1, E2 = jnp.exp(-dt / T1), jnp.exp(-dt / T2)
        E1_1, gam2pidt = E1 - 1, 2 * pi * gam * dt

        beff = beffective.rfgr2beff(sc['rf'], sc['gr'], sc['loc'],
                                    df=sc['df'], b1Map=sc['b1Map'], gam=gam)
        A, B = beffective.beff2ab(beff, E1=E1, E2=E2, gam=gam, dt=dt)

        Mo1 = slowsims.blochsim(M0, beff, T1=T1, T2=T2, gam=gam, dt=dt)

        Mo2 = M0
        for t in range(beff.shape[-2]):
            Mo2, _ = slowsims.blochsim_1step(Mo2, None, beff[..., t, :],
                                             E1, E1_1, E2, gam2pidt)

        Mo3 = slowsims.blochsim_ab(M0, A, B)

        for Mo in (Mo1, Mo2, Mo3):
            np.testing.assert_allclose(Mo, MO_GOLD_RELAX, atol=ATOL)

        # associative-scan A/B propagator agrees with the sequential scan
        Aa, Ba = beffective.beff2ab_assoc(beff, E1=E1, E2=E2, gam=gam, dt=dt)
        np.testing.assert_allclose(Aa, A, atol=ATOL)
        np.testing.assert_allclose(Ba, B, atol=ATOL)

        # segmented (remat) engine agrees
        Mo4 = slowsims.blochsim_segmented(M0, beff, T1=T1, T2=T2, gam=gam,
                                          dt=dt, segments=8)
        np.testing.assert_allclose(Mo4, MO_GOLD_RELAX, atol=ATOL)

    def test_grads_scan_vs_ab_path(self):
        sc = pulse_arrays(nM=3, nT=512, dtype=DTYPE)
        gam, dt = sc['gam'], sc['dt']
        M0 = jnp.asarray([[[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]], DTYPE)
        T1 = jnp.asarray([[1.]], DTYPE)
        T2 = jnp.asarray([[4e-2]], DTYPE)
        E1, E2 = jnp.exp(-dt / T1), jnp.exp(-dt / T2)

        def loss_scan(rf, gr):
            beff = beffective.rfgr2beff(rf, gr, sc['loc'], df=sc['df'],
                                        b1Map=sc['b1Map'], gam=gam)
            return jnp.sum(slowsims.blochsim(M0, beff, T1=T1, T2=T2,
                                             gam=gam, dt=dt))

        def loss_ab(rf, gr):
            beff = beffective.rfgr2beff(rf, gr, sc['loc'], df=sc['df'],
                                        b1Map=sc['b1Map'], gam=gam)
            A, B = beffective.beff2ab(beff, E1=E1, E2=E2, gam=gam, dt=dt)
            return jnp.sum(slowsims.blochsim_ab(M0, A, B))

        g1 = jax.grad(loss_scan, argnums=(0, 1))(sc['rf'], sc['gr'])
        g2 = jax.grad(loss_ab, argnums=(0, 1))(sc['rf'], sc['gr'])
        np.testing.assert_allclose(g1[0], g2[0], atol=ATOL)
        np.testing.assert_allclose(g1[1], g2[1], atol=ATOL)

    def test_freeprec_golden(self):
        Mi = jnp.asarray([[[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]], DTYPE)
        E1 = jnp.asarray([[0.5]], DTYPE)
        E2 = jnp.asarray([[0.5]], DTYPE)
        dur = jnp.asarray(0.5, DTYPE)
        T1, T2 = -dur / jnp.log(E1), -dur / jnp.log(E2)
        df = jnp.asarray([[1 / 4 / dur, -1 / 4 / dur, 1]], DTYPE)

        Mo = slowsims.freeprec(Mi, dur, T1=T1, T2=T2, df=df)
        np.testing.assert_allclose(Mo, FREEPREC_GOLD, atol=ATOL)

        # unicode kwarg
        Mo2 = slowsims.freeprec(Mi, dur, T1=T1, T2=T2, **{'Δf': df})
        np.testing.assert_allclose(Mo2, FREEPREC_GOLD, atol=ATOL)

    def test_blochsim_tparallel(self):
        r"""Parallel-in-time path equals the sequential scan."""
        sc = pulse_arrays(nM=5, nT=64, dtype=DTYPE)
        gam, dt = sc['gam'], sc['dt']
        M0 = jnp.asarray(np.random.default_rng(0).random((1, 5, 3)), DTYPE)
        T1 = jnp.asarray([[1.]], DTYPE)
        T2 = jnp.asarray([[4e-2]], DTYPE)
        beff = beffective.rfgr2beff(sc['rf'], sc['gr'], sc['loc'],
                                    df=sc['df'], b1Map=sc['b1Map'],
                                    gam=gam)
        a = slowsims.blochsim_tparallel(M0, beff, T1=T1, T2=T2, gam=gam,
                                        dt=dt)
        b = slowsims.blochsim(M0, beff, T1=T1, T2=T2, gam=gam, dt=dt)
        np.testing.assert_allclose(a, b, atol=ATOL)
        # no-relax variant
        np.testing.assert_allclose(
            slowsims.blochsim_tparallel(M0, beff, gam=gam, dt=dt),
            slowsims.blochsim(M0, beff, gam=gam, dt=dt), atol=ATOL)


class TestAssocTreeReduction:

    @pytest.mark.parametrize('nT', [1, 2, 7, 33, 64, 513])
    def test_beff2ab_assoc_odd_lengths(self, nT):
        r"""The pairwise tree reduction holds the temporally-last step
        out at odd levels — every length must compose in the right
        order. Compared against the sequential beff2ab at 1e-9 (f64)."""
        rng = np.random.default_rng(nT)
        beff = jnp.asarray(rng.normal(size=(2, 5, nT, 3)) * 0.05)
        E1 = jnp.asarray(np.exp(-4e-6 / 1.47))
        E2 = jnp.asarray(np.exp(-4e-6 / 0.07))
        A0, B0 = beffective.beff2ab(beff, E1=E1, E2=E2)
        A1, B1 = beffective.beff2ab_assoc(beff, E1=E1, E2=E2)
        assert jnp.max(jnp.abs(A0 - A1)) < 1e-9
        assert jnp.max(jnp.abs(B0 - B1)) < 1e-9

    def test_tparallel_grads_match_scan(self):
        r"""jax.grad through the tree reduction (w.r.t. Beff and M0)
        equals grads through the sequential scan at 1e-9 (f64)."""
        rng = np.random.default_rng(5)
        M0 = jnp.asarray(rng.random((1, 6, 3)) - 0.5)
        beff = jnp.asarray(rng.normal(size=(1, 6, 48, 3)) * 0.05)
        T1 = jnp.asarray([[1.0]])
        T2 = jnp.asarray([[0.05]])

        def loss(fn, M0, beff):
            return jnp.sum(fn(M0, beff, T1=T1, T2=T2) ** 2)

        for argnum in (0, 1):
            ga = jax.grad(lambda m, b: loss(
                slowsims.blochsim_tparallel, m, b), argnum)(M0, beff)
            gb = jax.grad(lambda m, b: loss(
                slowsims.blochsim, m, b), argnum)(M0, beff)
            assert jnp.max(jnp.abs(ga - gb)) < 1e-9, float(
                jnp.max(jnp.abs(ga - gb)))
