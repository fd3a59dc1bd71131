r"""Simultaneous multislice modulation: the Bloch-simulated profile
shows every band excited at its slice center and suppression between,
and the quadratic phase schedule cuts peak B1 vs coherent stacking."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu.design import slr_design, slr_gr, sms_modulate, sms_phases
from mrphy_tpu.ops import slowsims

NT, TB, SLTHICK = 256, 6.0, 0.5
NB, SEP = 3, 1.5


def _profile(rf, gz, z):
    nZ = z.shape[0]
    M0 = jnp.tile(jnp.asarray([0., 0., 1.]), (1, nZ, 1))
    beff = jnp.zeros((1, nZ, NT, 3))
    beff = beff.at[..., 0].set(rf[0, 0])
    beff = beff.at[..., 1].set(rf[0, 1])
    beff = beff.at[..., 2].set(gz * z[:, None])
    M = slowsims.blochsim(M0, beff, T1=None, T2=None,
                          gam=jnp.asarray(gamH), dt=jnp.asarray(dt0))
    return np.hypot(*np.asarray(M)[0, :, :2].T)


class TestSms:

    def test_multiband_profile(self):
        rf, _ = slr_design(NT, TB, ptype='ex', flip=pi / 2)
        gz = float(np.asarray(slr_gr(NT, TB, SLTHICK))[0, 2, 0])
        rf_mb = sms_modulate(rf, NB, SEP, gz)
        z = jnp.linspace(-3., 3., 121)
        mxy = _profile(rf_mb, gz, z)
        zc = (np.arange(NB) - (NB - 1) / 2) * SEP
        for z0 in zc:                      # every band excited
            inband = np.abs(np.asarray(z) - z0) < 0.3 * SLTHICK
            assert mxy[inband].min() > 0.95, z0
        # suppressed between bands and outside
        out = np.all(np.abs(np.asarray(z)[:, None] - zc[None])
                     > 1.2 * SLTHICK, axis=1)
        assert mxy[out].max() < 0.05, mxy[out].max()

    def test_scrambled_phases_cut_peak_b1(self):
        rf, _ = slr_design(NT, TB, ptype='ex', flip=pi / 2)
        gz = float(np.asarray(slr_gr(NT, TB, SLTHICK))[0, 2, 0])
        peak = {}
        for sched in ('none', 'quad', 'opt'):
            mb = sms_modulate(rf, 4, SEP, gz, phases=sched)
            peak[sched] = float(jnp.max(jnp.hypot(mb[0, 0], mb[0, 1])))
        # quad is weak at nb=4 (bands 1 and 3 alias mod 2pi); the
        # minimax schedule approaches the incoherent bound (0.5x)
        assert peak['quad'] < 0.75 * peak['none'], peak
        assert peak['opt'] < 0.65 * peak['none'], peak

    def test_explicit_phases_and_coil_dim(self):
        rf, _ = slr_design(NT, TB, ptype='ex', flip=pi / 2)
        gz = float(np.asarray(slr_gr(NT, TB, SLTHICK))[0, 2, 0])
        ph = np.asarray(sms_phases(NB, 'quad'))
        a = sms_modulate(rf, NB, SEP, gz, phases=ph)
        b = sms_modulate(rf, NB, SEP, gz, phases='quad')
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # trailing coil dim broadcasts
        rfc = jnp.stack([rf[..., None, 0]] * 2, -1) \
            if False else jnp.repeat(rf[..., None], 2, -1)
        c = sms_modulate(rfc, NB, SEP, gz, phases=ph)
        assert c.shape == rfc.shape
        np.testing.assert_allclose(np.asarray(c[..., 0]), np.asarray(a),
                                   rtol=1e-6)

    def test_single_band_identity(self):
        rf, _ = slr_design(NT, TB, ptype='ex', flip=pi / 2)
        out = sms_modulate(rf, 1, SEP, 0.1, phases='none')
        np.testing.assert_allclose(np.asarray(out), np.asarray(rf),
                                   atol=1e-7)
