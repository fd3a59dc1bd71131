r"""VERSE peak-B1 capping: exact on-resonance equivalence (per-sample
axis+angle preservation), the cap itself, and the documented
off-resonance sensitivity cost."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0
from mrphy_tpu.design.verse import verse_b1cap
from mrphy_tpu.ops import slowsims


def _slab(nT=256, gz=0.6, peak=0.22):
    t = (np.arange(nT) - nT / 2 + 0.5) * float(dt0)
    env = np.sinc(3e3 * t) * np.hamming(nT)
    rf = np.zeros((1, 2, nT))
    rf[0, 0] = peak * env / env.max()
    gr = np.zeros((1, 3, nT))
    gr[0, 2] = gz
    return jnp.asarray(rf), jnp.asarray(gr)


def _profile(rf, gr, zs, df=0.0):
    nz, nT = zs.size, rf.shape[-1]
    beff = jnp.zeros((1, nz, nT, 3))
    beff = beff.at[..., 0].set(rf[0, 0]).at[..., 1].set(rf[0, 1])
    beff = beff.at[..., 2].set(
        gr[0, 2] * jnp.asarray(zs)[:, None] + df / gamH)
    M0 = jnp.tile(jnp.asarray([0., 0., 1.]), (1, nz, 1))
    M = slowsims.blochsim(M0, beff, T1=None, T2=None,
                          gam=jnp.asarray(gamH), dt=jnp.asarray(dt0))
    return np.asarray(M)[0]


class TestVerse:

    def test_cap_and_exact_onres_profile(self):
        rf, gr = _slab(peak=0.22)
        cap = 0.08
        rf_v, gr_v = verse_b1cap(rf, gr, cap, dt=float(dt0), smax=1e9)
        amp = np.hypot(np.asarray(rf_v)[0, 0], np.asarray(rf_v)[0, 1])
        assert amp.max() <= cap * (1 + 1e-12)
        assert rf_v.shape[-1] > rf.shape[-1]          # pulse lengthened
        zs = np.linspace(-1.5, 1.5, 41)
        M0 = _profile(rf, gr, zs)
        Mv = _profile(jnp.asarray(rf_v), jnp.asarray(gr_v), zs)
        np.testing.assert_allclose(Mv, M0, atol=1e-6)  # EXACT on-res

    def test_identity_when_under_cap(self):
        rf, gr = _slab(peak=0.05)
        rf_v, gr_v = verse_b1cap(rf, gr, 0.08)
        np.testing.assert_allclose(rf_v, rf, atol=0)
        np.testing.assert_allclose(gr_v, gr, atol=0)

    def test_duration_matches_mean_alpha(self):
        rf, gr = _slab(peak=0.3)
        cap = 0.1
        amp = np.hypot(np.asarray(rf)[0, 0], np.asarray(rf)[0, 1])
        alpha = np.maximum(1, np.ceil(amp / cap - 1e-12).astype(int))
        rf_v, _ = verse_b1cap(rf, gr, cap)
        assert rf_v.shape[-1] == int(alpha.sum())

    def test_offres_sensitivity_documented(self):
        # VERSE trades peak B1 for df sensitivity: at 200 Hz the
        # VERSE'd profile deviates more from its on-res self than the
        # original does (the classic caveat, pinned here)
        rf, gr = _slab(peak=0.22)
        rf_v, gr_v = verse_b1cap(rf, gr, 0.08)
        zs = np.linspace(-1.5, 1.5, 41)
        d0 = np.abs(_profile(rf, gr, zs, df=200.)
                    - _profile(rf, gr, zs)).max()
        dv = np.abs(_profile(jnp.asarray(rf_v), jnp.asarray(gr_v), zs,
                             df=200.)
                    - _profile(jnp.asarray(rf_v), jnp.asarray(gr_v),
                               zs)).max()
        assert dv > d0, (dv, d0)
