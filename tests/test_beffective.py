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
