r"""Integration tests for the BASELINE.json scenario configs:

- multi-coil B1 excitation with off-resonance on a 3-D SpinCube followed
  by free precession (config 3, scaled down for CPU CI);
- the full excite→freeprec sequence keeps |M| physical and matches the
  oracle engine end-to-end.
"""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import dt0, pi
from mrphy_tpu.models import mobjs
from mrphy_tpu.ops import slowsims

DTYPE = jnp.float64
ATOL = 1e-9


def _cube_3d(n=8, nCoils=4):
    rng = np.random.default_rng(0)
    shape = (1, n, n, n)
    fov = jnp.asarray([[4., 4., 4.]], DTYPE)
    cube = mobjs.SpinCube(shape, fov,
                          T1_=jnp.asarray([[1.]], DTYPE),
                          T2_=jnp.asarray([[4e-2]], DTYPE), dtype=DTYPE)
    cube.df = jnp.asarray(rng.normal(size=shape) * 20, DTYPE)
    b1 = rng.normal(size=shape + (2, nCoils)) * 0.3 + 0.5
    return cube, jnp.asarray(b1, DTYPE)


class TestMultiCoilSequence:

    def test_excite_then_freeprec_matches_oracle(self):
        nT, nCoils = 64, 4
        cube, b1Map = _cube_3d(n=8, nCoils=nCoils)
        rng = np.random.default_rng(1)

        t = jnp.arange(nT, dtype=DTYPE).reshape(1, 1, nT)
        rf = 0.2 * jnp.concatenate(
            [jnp.cos(t / nT * 2 * pi), jnp.sin(t / nT * 2 * pi)],
            1)[..., None] * jnp.asarray(rng.random((1, 1, 1, nCoils)),
                                        DTYPE)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)) * 0.5, DTYPE)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0, dtype=DTYPE)

        # excite (fast engine through the object model)
        cube.applypulse(p, b1Map=b1Map, doUpdate=True)
        M_excited = cube.M_

        # oracle cross-check of the excitation
        beff_ = cube.pulse2beff(p, b1Map=b1Map)
        M_oracle = slowsims.blochsim(
            jnp.broadcast_to(jnp.asarray([0., 0., 1.], DTYPE),
                             M_excited.shape),
            beff_, T1=cube.T1_, T2=cube.T2_, gam=cube.gam_, dt=p.dt)
        np.testing.assert_allclose(M_excited, M_oracle, atol=ATOL)

        # free precession with the cube's off-resonance
        dur = jnp.asarray(5e-3, DTYPE)
        M_fp = cube.freeprec(dur, doEmbed=False)
        M_fp_oracle = slowsims.freeprec(M_excited, dur, T1=cube.T1_,
                                        T2=cube.T2_, df=cube.df_)
        np.testing.assert_allclose(M_fp, M_fp_oracle, atol=ATOL)

        # physics sanity: |M| <= 1 everywhere after relax + precession
        assert float(jnp.max(jnp.linalg.norm(M_fp, axis=-1))) <= 1 + 1e-9

    def test_multicoil_reduces_to_singlecoil_sum(self):
        r"""Coils with unit sensitivities sum like a single coil driven by
        the summed rf (rfgr2beff coil conventions, beffective.py:144-165).
        """
        nT, nCoils = 32, 3
        cube, _ = _cube_3d(n=4, nCoils=nCoils)
        rng = np.random.default_rng(2)
        rf = jnp.asarray(rng.random((1, 2, nT, nCoils)), DTYPE)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)), DTYPE)
        p_multi = mobjs.Pulse(rf=rf, gr=gr, dt=dt0, dtype=DTYPE)
        p_sum = mobjs.Pulse(rf=jnp.sum(rf, -1), gr=gr, dt=dt0, dtype=DTYPE)

        ones_b1 = jnp.concatenate(
            [jnp.ones(cube.shape + (1, nCoils), DTYPE),
             jnp.zeros(cube.shape + (1, nCoils), DTYPE)], axis=-2)
        M1 = cube.applypulse(p_multi, b1Map=ones_b1)
        M2 = cube.applypulse(p_sum)
        np.testing.assert_allclose(M1, M2, atol=ATOL)
