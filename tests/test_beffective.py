r"""Direct beffective tests (most coverage is via the sims/mobjs suites)."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH
from mrphy_tpu.ops import beffective

DTYPE = jnp.float64


class TestRfgr2beff:

    def test_gam_shape_N_with_df(self):
        r"""(N,)-shaped gamma with off-resonance must right-pad, not
        broadcast against the spatial dims (review finding: silently
        wrong when N coincides with a spatial extent)."""
        rng = np.random.default_rng(0)
        N, n = 4, 4  # N == last spatial dim: the dangerous case
        rf = jnp.asarray(rng.random((N, 2, 6)), DTYPE)
        gr = jnp.asarray(rng.random((N, 3, 6)), DTYPE)
        loc = jnp.asarray(rng.random((N, n, n, n, 3)), DTYPE)
        df = jnp.asarray(rng.random((N, n, n, n)) * 10, DTYPE)

        gam_n = jnp.full((N,), gamH, DTYPE)
        a = beffective.rfgr2beff(rf, gr, loc, df=df, gam=gam_n)
        b = beffective.rfgr2beff(rf, gr, loc, df=df, gam=gamH)
        np.testing.assert_allclose(a, b, atol=1e-12)

        # per-batch distinct gamma lands on the batch axis
        gam_d = jnp.asarray([gamH, 2 * gamH, gamH, gamH], DTYPE)
        c = beffective.rfgr2beff(rf, gr, loc, df=df, gam=gam_d)
        np.testing.assert_allclose(np.asarray(c)[0], np.asarray(b)[0],
                                   atol=1e-12)
        assert float(jnp.max(jnp.abs(c[1] - b[1]))) > 0  # batch 1 differs


class TestConcomitant:
    r"""Lowest-order Maxwell term: Bc = ((gx z − gz x/2)² +
    (gy z − gz y/2)²)/(2 B0), added to Bz when b0 is given."""

    def test_pure_gx_off_isocenter_z(self):
        import jax
        b0, gx, z = 15000.0, 3.0, 5.0        # 1.5 T, 3 G/cm, 5 cm
        rf = jnp.zeros((1, 2, 4))
        gr = jnp.zeros((1, 3, 4)).at[0, 0].set(gx)
        loc = jnp.asarray([[[0.0, 0.0, z]]])
        beff = beffective.rfgr2beff(rf, gr, loc, b0=b0)
        np.testing.assert_allclose(beff[0, 0, :, 2],
                                   (gx * z) ** 2 / (2 * b0), rtol=1e-6)
        # isocenter: no concomitant field; b0=None identical
        beff0 = beffective.rfgr2beff(rf, gr, jnp.zeros((1, 1, 3)),
                                     b0=b0)
        np.testing.assert_allclose(beff0[0, 0, :, 2], 0, atol=1e-12)
        # 1/B0 scaling
        beff2 = beffective.rfgr2beff(rf, gr, loc, b0=2 * b0)
        np.testing.assert_allclose(np.asarray(beff2[0, 0, :, 2]) * 2,
                                   beff[0, 0, :, 2], rtol=1e-12)

    def test_gz_cross_terms_and_grad_flow(self):
        import jax
        rng = np.random.default_rng(0)
        b0 = 30000.0
        rf = jnp.zeros((1, 2, 6))
        gr = jnp.asarray(rng.uniform(-3, 3, (1, 3, 6)))
        loc = jnp.asarray(rng.uniform(-8, 8, (1, 5, 3)))
        beff = beffective.rfgr2beff(rf, gr, loc, b0=b0)
        g = np.asarray(gr[0])
        x, y, z = np.asarray(loc[0]).T
        bc = ((np.outer(z, g[0]) - 0.5 * np.outer(x, g[2])) ** 2
              + (np.outer(z, g[1]) - 0.5 * np.outer(y, g[2])) ** 2) \
            / (2 * b0)
        base = np.einsum('sx,xt->st', np.asarray(loc[0]), g)
        np.testing.assert_allclose(beff[0, :, :, 2], base + bc,
                                   rtol=1e-9)
        # differentiable w.r.t. gr (design can pre-compensate)
        gg = jax.grad(lambda gr: jnp.sum(beffective.rfgr2beff(
            rf, gr, loc, b0=b0) ** 2))(gr)
        assert np.isfinite(gg).all() and np.abs(gg).max() > 0
