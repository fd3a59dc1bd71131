r"""Adiabatic hyperbolic-secant pulse: the defining B1-insensitivity
signature, validated by Bloch simulation — inversion holds across a
2.5× amplitude range and the sweep bandwidth, and collapses below the
adiabatic threshold."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu.design.adiabatic import (adiabatic_bir4, adiabatic_hypsec,
                                        hypsec_bw, hypsec_threshold)
from mrphy_tpu.ops import slowsims

NT, BETA, MU = 2048, 5.3, 4.9
DUR = NT * float(dt0)
THR = hypsec_threshold(BETA, MU, DUR)


def _simulate_mz(rf, df_hz, nT=NT):
    nF = df_hz.shape[0]
    M0 = jnp.tile(jnp.asarray([0., 0., 1.]), (1, nF, 1))
    beff = jnp.zeros((1, nF, nT, 3))
    beff = beff.at[..., 0].set(rf[0, 0])
    beff = beff.at[..., 1].set(rf[0, 1])
    beff = beff.at[..., 2].set((df_hz / gamH)[:, None])
    M = slowsims.blochsim(M0, beff, T1=None, T2=None,
                          gam=jnp.asarray(gamH), dt=jnp.asarray(dt0))
    return np.asarray(M[0, :, 2])


def _simulate_mz_n(rf, nT):
    return float(_simulate_mz(rf, jnp.asarray([0.]), nT)[0])


class TestHypsec:

    def test_waveform_shapes_and_modulation(self):
        rf, bw = adiabatic_hypsec(NT, beta=BETA, mu=MU, b1max=0.2)
        assert rf.shape == (1, 2, NT)
        amp = np.hypot(np.asarray(rf[0, 0]), np.asarray(rf[0, 1]))
        assert np.isclose(amp.max(), 0.2)
        assert np.isclose(amp[0] / amp.max(), 1 / np.cosh(BETA),
                          rtol=1e-3)
        assert np.isclose(bw, hypsec_bw(BETA, MU, DUR))
        # instantaneous frequency (phase derivative) sweeps ±μβ·(2/dur)
        ph = np.unwrap(np.arctan2(np.asarray(rf[0, 1]),
                                  np.asarray(rf[0, 0])))
        f_inst = np.diff(ph) / (2 * pi * float(dt0))     # Hz
        f_lim = MU * BETA / (2 * pi) * (2 / DUR)
        assert np.isclose(f_inst[0], f_lim * np.tanh(BETA), rtol=2e-2)
        assert np.isclose(f_inst[-1], -f_lim * np.tanh(BETA), rtol=2e-2)

    def test_inversion_is_b1_insensitive_above_threshold(self):
        bw = hypsec_bw(BETA, MU, DUR)
        df = jnp.linspace(-0.35 * bw, 0.35 * bw, 9)
        for scale in (1.9, 2.8, 4.7):                 # × threshold
            rf, _ = adiabatic_hypsec(NT, beta=BETA, mu=MU,
                                     b1max=scale * THR)
            mz = _simulate_mz(rf, df)
            assert mz.max() < -0.95, (scale, mz)

    def test_no_inversion_below_threshold(self):
        rf, _ = adiabatic_hypsec(NT, beta=BETA, mu=MU, b1max=0.3 * THR)
        mz = _simulate_mz(rf, jnp.asarray([0.]))
        assert mz[0] > 0.0                             # stays up

    def test_bir4_waveform_structure(self):
        rf = adiabatic_bir4(1024, pi / 2, b1max=0.2)
        assert rf.shape == (1, 2, 1024)
        amp = np.hypot(np.asarray(rf[0, 0]), np.asarray(rf[0, 1]))
        assert np.isclose(amp.max(), 0.2, rtol=1e-3)
        # tanh amplitude vanishes at the quarter boundaries (the BIR-1
        # segment joints) and is full-scale at the ends and middle
        for i in (255, 256, 767, 768):
            assert amp[i] < 0.2 * np.tanh(10 / 128), (i, amp[i])
        for i in (0, 511, 512, 1023):
            assert amp[i] > 0.2 * 0.999, (i, amp[i])
        # phase jumps by pi + theta/2 at the 1/4 boundary
        ph = np.arctan2(np.asarray(rf[0, 1]), np.asarray(rf[0, 0]))
        jump = (ph[256] - ph[255]) % (2 * np.pi)
        assert np.isclose(jump, np.pi + pi / 4, atol=0.05), jump

    def test_bir4_rotation_is_b1_insensitive(self):
        r"""The defining property: plane rotation by theta (Mz ->
        cos(theta) from +z) for ANY amplitude above threshold — where
        a conventional pulse's flip scales linearly with B1."""
        nT = 2048
        for theta in (pi / 4, pi / 2, pi):
            for scale in (0.6, 1.0, 2.4):
                rf = adiabatic_bir4(nT, theta, b1max=0.15 * scale)
                mz = _simulate_mz_n(rf, nT)
                assert abs(mz - np.cos(theta)) < 0.02, (theta, scale, mz)

    def test_bir4_zero_theta_is_identity(self):
        rf = adiabatic_bir4(2048, 0.0, b1max=0.25)
        assert _simulate_mz_n(rf, 2048) > 0.999

    def test_slr_contrast_scaled_inversion_fails_at_2x_b1(self):
        r"""The complementary fact that motivates adiabatic pulses: a
        conventional (SLR) inversion over/under-flips when B1 errs."""
        from mrphy_tpu.design import slr_design
        rf, _ = slr_design(512, 6.0, ptype='inv', flip=pi)
        mz_nom = _simulate_mz(
            jnp.pad(rf, ((0, 0), (0, 0), (0, NT - 512))),
            jnp.asarray([0.]))
        mz_2x = _simulate_mz(
            jnp.pad(2.0 * rf, ((0, 0), (0, 0), (0, NT - 512))),
            jnp.asarray([0.]))
        assert mz_nom[0] < -0.98
        assert mz_2x[0] > -0.5                         # badly over-flipped


class TestWurst:
    # inversion degrades when gamma*B1 approaches the remaining sweep
    # after a spin's resonance crossing, so the usable band is inside
    # the sweep width by a ~gamma*B1 margin: test at |df| <= 0.25*bw
    # with gamma*B1 <= 0.17*bw (b1max 0.12 G, 2x range, bw 6 kHz)
    NTW, BW = 4096, 6e3

    def test_b1_insensitive_inversion_across_the_band(self):
        from mrphy_tpu.design.adiabatic import adiabatic_wurst
        rf, Q = adiabatic_wurst(self.NTW, n=20., bw=self.BW, b1max=0.12)
        assert Q > 3, Q
        df = jnp.asarray([-0.25 * self.BW, 0.0, 0.25 * self.BW])
        for scale in (1.0, 1.5, 2.0):
            mz = _simulate_mz(scale * rf, df, nT=self.NTW)
            assert np.all(mz < -0.99), (scale, mz)
        # collapses below the adiabatic threshold
        mz_low = _simulate_mz(0.25 * rf, jnp.asarray([0.0]),
                              nT=self.NTW)
        assert mz_low[0] > -0.5, mz_low

    def test_band_edge_is_where_promised(self):
        from mrphy_tpu.design.adiabatic import adiabatic_wurst
        rf, _ = adiabatic_wurst(self.NTW, bw=self.BW, b1max=0.12)
        inside = _simulate_mz(rf, jnp.asarray([0.25 * self.BW]),
                              nT=self.NTW)
        outside = _simulate_mz(rf, jnp.asarray([0.8 * self.BW]),
                               nT=self.NTW)
        assert inside[0] < -0.98 and outside[0] > 0.5, (inside, outside)

    def test_amplitude_envelope_flat_top(self):
        from mrphy_tpu.design.adiabatic import adiabatic_wurst
        rf, _ = adiabatic_wurst(1024, n=20., b1max=0.2)
        amp = np.hypot(np.asarray(rf[0, 0]), np.asarray(rf[0, 1]))
        assert np.isclose(amp.max(), 0.2, rtol=1e-6)
        assert (amp > 0.19).mean() > 0.6      # WURST-20: wide flat top
        assert amp[0] < 0.01 and amp[-1] < 0.01
