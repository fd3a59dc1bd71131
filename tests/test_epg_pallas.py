r"""Fused EPG dictionary kernel (:mod:`mrphy_tpu.ops.epg_pallas`).

Interpret-mode parity vs the XLA engine (the compiled-Mosaic path is
pinned on the real chip by ``benchmarks/tpu_checks.py`` — see
CLAUDE.md on why interpret mode alone cannot catch Mosaic-specific
numerics).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import jax

from mrphy_tpu.ops import epg
from mrphy_tpu.ops.epg_pallas import (epg_spgr_pallas,
                                      epg_cpmg_pallas,
                                      epgx_spgr_pallas,
                                      epgx_cpmg_pallas,
                                      epgx_mt_spgr_pallas)

RNG = np.random.default_rng(0)
NTR, NA, K = 40, 100, 24
FLIPS = jnp.asarray(RNG.uniform(0.1, 1.2, NTR), jnp.float32)
PHIS = epg.rf_spoil_phases(NTR).astype(jnp.float32)
T1 = jnp.asarray(RNG.uniform(0.3, 3.0, NA), jnp.float32)
T2 = jnp.asarray(RNG.uniform(0.02, 0.3, NA), jnp.float32)
TR, TE = 0.012, 0.005


class TestEPGPallasParity:
    def _pair(self, **kw):
        base = dict(T1=T1, T2=T2, tr=TR, te=TE, K=K)
        base.update(kw)
        phis = base.pop('phis', PHIS)
        ref = epg.epg_spgr(FLIPS, phis, **base)
        out = epg_spgr_pallas(FLIPS, phis, tile=128, interpret=True,
                              **base)
        assert out.shape == ref.shape
        return float(jnp.max(jnp.abs(out - ref)))

    def test_rf_spoiled(self):
        r"""Quadratic-phase RF-spoiled train; nA=100 also exercises the
        atom padding path (tile=128)."""
        assert self._pair() < 2e-6

    def test_fisp_zero_phases(self):
        assert self._pair(phis=None, te=0.0) < 2e-6

    def test_kshift_rewind(self):
        assert self._pair(kshift=-1) < 2e-6

    def test_kshift_2_per_atom_m0(self):
        M0 = jnp.asarray(RNG.uniform(0.5, 1.5, NA), jnp.float32)
        assert self._pair(kshift=2, M0=M0) < 2e-6

    def test_backend_kwarg_dispatch(self):
        r"""`epg_spgr(backend='pallas')` routes to the kernel —
        including the fused spoiler-diffusion path (round 4)."""
        out = epg.epg_spgr(FLIPS, PHIS, T1=T1, T2=T2, tr=TR, te=TE,
                           K=K, backend='pallas')
        # interpret-mode reference through the same dispatch surface
        ref = epg_spgr_pallas(FLIPS, PHIS, T1=T1, T2=T2, tr=TR, te=TE,
                              K=K, tile=128, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 2e-6
        # diffusion is a supported fused feature now: parity vs XLA
        dkw = dict(T1=T1, T2=T2, tr=TR, te=TE, K=K, D=1e-5, dk=30.0)
        d_out = epg.epg_spgr(FLIPS, PHIS, backend='pallas', **dkw)
        d_ref = epg.epg_spgr(FLIPS, PHIS, backend='xla', **dkw)
        assert d_out.shape == d_ref.shape
        assert float(jnp.max(jnp.abs(d_out - d_ref))) < 2e-5

    def test_vs_f64_oracle(self):
        r"""Absolute accuracy: the f32 kernel sits at f32 rounding of
        the f64 XLA truth (not merely agreeing with the f32 XLA
        path's own rounding)."""
        ref = epg.epg_spgr(FLIPS.astype(jnp.float64),
                           PHIS.astype(jnp.float64),
                           T1=T1.astype(jnp.float64),
                           T2=T2.astype(jnp.float64), tr=TR, te=TE,
                           K=K)
        out = epg_spgr_pallas(FLIPS, PHIS, T1=T1, T2=T2, tr=TR, te=TE,
                              K=K, tile=128, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) < 5e-5 * scale

    def test_b1_dictionary_dimension(self):
        r"""Per-atom ``b1`` equals the XLA path's batched
        ``b1[:, None] * flips`` (the MRF B1+ grid axis)."""
        b1 = jnp.asarray(RNG.uniform(0.7, 1.3, NA), jnp.float32)
        ref = epg.epg_spgr(b1[:, None] * FLIPS, PHIS, T1=T1, T2=T2,
                           tr=TR, te=TE, K=K)
        out = epg_spgr_pallas(FLIPS, PHIS, T1=T1, T2=T2, tr=TR, te=TE,
                              K=K, b1=b1, tile=128, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_rejects_batched_train(self):
        with pytest.raises(AssertionError):
            epg_spgr_pallas(jnp.zeros((4, NTR)), None, T1=1.0, T2=0.1,
                            tr=TR, interpret=True)


class TestCPMGPallasParity:
    r"""CPMG mapping kernel vs the XLA train."""

    ESP = 0.01
    CFLIPS = jnp.asarray(RNG.uniform(1.5, np.pi, 32), jnp.float32)

    def test_basic(self):
        ref = epg.epg_cpmg(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP)
        out = epg_cpmg_pallas(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                              tile=128, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_slice_profile_per_voxel_excitation(self):
        al = jnp.asarray(RNG.uniform(0.3, np.pi / 2, NA), jnp.float32)
        ph = jnp.asarray(RNG.uniform(0, 2 * np.pi, NA), jnp.float32)
        M0 = jnp.asarray(RNG.uniform(0.5, 1.5, NA), jnp.float32)
        ref = epg.epg_cpmg(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                           alpha_ex=al, phi_ex=ph, M0=M0)
        out = epg_cpmg_pallas(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                              alpha_ex=al, phi_ex=ph, M0=M0, tile=128,
                              interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_b1_scaled_refocusing(self):
        b1 = jnp.asarray(RNG.uniform(0.7, 1.3, NA), jnp.float32)
        ref = epg.epg_cpmg(b1[:, None] * self.CFLIPS, T1=T1, T2=T2,
                           esp=self.ESP)
        out = epg_cpmg_pallas(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                              b1=b1, tile=128, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_perfect_180_analytic(self):
        r"""All-180° refocusing: |echo n| = exp(−n·esp/T2) exactly."""
        f180 = jnp.full((32,), np.pi, jnp.float32)
        o = epg_cpmg_pallas(f180, T1=1.0, T2=0.1, esp=self.ESP,
                            tile=128, interpret=True)
        mag = np.linalg.norm(np.asarray(o)[0], axis=-1)
        ana = np.exp(-(np.arange(1, 33) * self.ESP) / 0.1)
        assert np.abs(mag / ana - 1).max() < 1e-5

    def test_backend_kwarg_dispatch(self):
        out = epg.epg_cpmg(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                           backend='pallas')
        ref = epg_cpmg_pallas(self.CFLIPS, T1=T1, T2=T2, esp=self.ESP,
                              tile=128, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6
        # diffusion is a supported fused feature now (round 5):
        # parity vs the XLA scan through the same dispatch surface
        dkw = dict(T1=T1, T2=T2, esp=self.ESP, D=1e-5, dk=30.0)
        d_out = epg.epg_cpmg(self.CFLIPS, backend='pallas', **dkw)
        d_ref = epg.epg_cpmg(self.CFLIPS, backend='xla', **dkw)
        assert d_out.shape == d_ref.shape
        assert float(jnp.max(jnp.abs(d_out - d_ref))) < 2e-5


class TestEPGXPallasParity:
    r"""Two-pool (EPG-X) kernel vs the XLA engine."""

    KW = dict(T1a=jnp.asarray(RNG.uniform(0.5, 2.0, NA), jnp.float32),
              T2a=jnp.asarray(RNG.uniform(0.05, 0.3, NA), jnp.float32),
              T1b=jnp.asarray(RNG.uniform(0.2, 0.6, NA), jnp.float32),
              T2b=jnp.asarray(RNG.uniform(0.005, 0.03, NA),
                              jnp.float32),
              kab=jnp.asarray(RNG.uniform(1.0, 10.0, NA), jnp.float32),
              kba=jnp.asarray(RNG.uniform(5.0, 40.0, NA), jnp.float32),
              tr=TR, K=K)

    def _pair(self, **kw):
        base = dict(self.KW)
        base.update(kw)
        phis = base.pop('phis', PHIS)
        ref = epg.epgx_spgr(FLIPS, phis, **base)
        out = epgx_spgr_pallas(FLIPS, phis, tile=128, interpret=True,
                               **base)
        assert out.shape == ref.shape
        return float(jnp.max(jnp.abs(out - ref)))

    def test_rf_spoiled_dfb(self):
        r"""Per-atom pool-b shift exercises the complex transverse
        propagator; nA=100 exercises the padding path."""
        dfb = jnp.asarray(RNG.uniform(-20, 20, NA), jnp.float32)
        assert self._pair(dfb=dfb) < 3e-6

    def test_kshift_rewind_m0b(self):
        M0b = jnp.asarray(RNG.uniform(0.05, 0.3, NA), jnp.float32)
        assert self._pair(kshift=-1, M0b=M0b, phis=None) < 3e-6

    def test_no_detailed_balance(self):
        r"""kab·M0a ≠ kba·M0b: the affine recovery must be the exact
        A⁻¹(E−I)b form, not the equilibrium shortcut."""
        assert self._pair(kab=8.0, kba=3.0, M0a=1.0, M0b=0.4) < 3e-6

    def test_decoupled_matches_single_pool(self):
        r"""kab=kba=0, M0b=0: pool a IS the single-pool train."""
        out = epgx_spgr_pallas(FLIPS, PHIS, T1a=T1, T2a=T2, T1b=0.3,
                               T2b=0.01, kab=0.0, kba=0.0, M0b=0.0,
                               tr=TR, K=K, tile=128, interpret=True)
        ref = epg.epg_spgr(FLIPS, PHIS, T1=T1, T2=T2, tr=TR, te=0.0,
                           K=K)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_backend_kwarg_dispatch(self):
        out = epg.epgx_spgr(FLIPS, PHIS, backend='pallas', **self.KW)
        ref = epgx_spgr_pallas(FLIPS, PHIS, tile=128, interpret=True,
                               **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_b1_dictionary_dimension(self):
        b1 = jnp.asarray(RNG.uniform(0.7, 1.3, NA), jnp.float32)
        ref = epg.epgx_spgr(b1[:, None] * FLIPS, PHIS, **self.KW)
        out = epgx_spgr_pallas(FLIPS, PHIS, b1=b1, tile=128,
                               interpret=True, **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6


class TestEPGXCPMGPallasParity:
    r"""Two-pool CPMG (MWF) kernel vs the XLA train."""

    ESP = 0.01
    CFLIPS = jnp.asarray(RNG.uniform(1.5, np.pi, 32), jnp.float32)
    KW = dict(T1a=jnp.asarray(RNG.uniform(0.5, 2.0, NA), jnp.float32),
              T2a=jnp.asarray(RNG.uniform(0.05, 0.3, NA), jnp.float32),
              T1b=jnp.asarray(RNG.uniform(0.2, 0.6, NA), jnp.float32),
              T2b=jnp.asarray(RNG.uniform(0.005, 0.03, NA),
                              jnp.float32),
              kab=jnp.asarray(RNG.uniform(1.0, 10.0, NA), jnp.float32),
              kba=jnp.asarray(RNG.uniform(5.0, 40.0, NA), jnp.float32),
              esp=0.01)

    def test_basic(self):
        ref = epg.epgx_cpmg(self.CFLIPS, **self.KW)
        out = epgx_cpmg_pallas(self.CFLIPS, tile=128, interpret=True,
                               **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_dfb_m0b_phiex_b1(self):
        r"""Pool-b shift, per-voxel M0b/phi_ex, B1-scaled refocusing —
        all per-atom lanes at once."""
        kw = dict(self.KW,
                  dfb=jnp.asarray(RNG.uniform(-20, 20, NA),
                                  jnp.float32),
                  M0b=jnp.asarray(RNG.uniform(0.05, 0.3, NA),
                                  jnp.float32),
                  phi_ex=jnp.asarray(RNG.uniform(0, 2 * np.pi, NA),
                                     jnp.float32))
        b1 = jnp.asarray(RNG.uniform(0.7, 1.3, NA), jnp.float32)
        ref = epg.epgx_cpmg(b1[:, None] * self.CFLIPS, **kw)
        out = epgx_cpmg_pallas(self.CFLIPS, b1=b1, tile=128,
                               interpret=True, **kw)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_backend_kwarg_dispatch(self):
        out = epg.epgx_cpmg(self.CFLIPS, backend='pallas', **self.KW)
        ref = epgx_cpmg_pallas(self.CFLIPS, tile=128, interpret=True,
                               **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6


class TestEPGXMTPallasParity:
    r"""Bound-pool (EPG-X(MT)) kernel vs the XLA qMT train."""

    WT = jnp.asarray(RNG.uniform(0.0, 0.5, NTR), jnp.float32)
    KW = dict(T1a=jnp.asarray(RNG.uniform(0.5, 2.0, NA), jnp.float32),
              T2a=jnp.asarray(RNG.uniform(0.05, 0.3, NA), jnp.float32),
              T1b=jnp.asarray(RNG.uniform(0.2, 0.6, NA), jnp.float32),
              kab=jnp.asarray(RNG.uniform(1.0, 10.0, NA), jnp.float32),
              kba=jnp.asarray(RNG.uniform(5.0, 40.0, NA), jnp.float32),
              M0b=jnp.asarray(RNG.uniform(0.05, 0.3, NA), jnp.float32),
              tr=TR, K=K)

    def test_saturation_train(self):
        ref = epg.epgx_mt_spgr(FLIPS, PHIS, wt=self.WT, **self.KW)
        out = epgx_mt_spgr_pallas(FLIPS, PHIS, wt=self.WT, tile=128,
                                  interpret=True, **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_per_atom_wscale(self):
        r"""Rank-1 saturation (per-TR power x per-atom lineshape)
        equals the XLA path's fully batched wt."""
        wsc = jnp.asarray(RNG.uniform(0.5, 2.0, NA), jnp.float32)
        ref = epg.epgx_mt_spgr(FLIPS, PHIS, wt=wsc[:, None] * self.WT,
                               **self.KW)
        out = epgx_mt_spgr_pallas(FLIPS, PHIS, wt=self.WT, wscale=wsc,
                                  tile=128, interpret=True, **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6

    def test_b1_and_backend_dispatch(self):
        b1 = jnp.asarray(RNG.uniform(0.7, 1.3, NA), jnp.float32)
        ref = epg.epgx_mt_spgr(b1[:, None] * FLIPS, PHIS, wt=self.WT,
                               **self.KW)
        out = epgx_mt_spgr_pallas(FLIPS, PHIS, wt=self.WT, b1=b1,
                                  tile=128, interpret=True, **self.KW)
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-6
        via = epg.epgx_mt_spgr(FLIPS, PHIS, wt=self.WT,
                               backend='pallas', **self.KW)
        direct = epgx_mt_spgr_pallas(FLIPS, PHIS, wt=self.WT,
                                     tile=128, interpret=True,
                                     **self.KW)
        assert float(jnp.max(jnp.abs(via - direct))) < 3e-6


class TestB1Kwarg:
    r"""The unified per-voxel ``b1`` transmit-scale kwarg: on the XLA
    backends it equals batched ``b1[:, None] * flips``; on the pallas
    backends it reaches the kernels' native b1 lanes; under ``mesh=``
    it shards with the voxels."""

    def _setup(self):
        rng = np.random.default_rng(41)
        nA, nT = 40, 12
        flips = jnp.asarray(rng.uniform(0.3, 1.2, nT), jnp.float32)
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, nA), jnp.float32)
        T2 = jnp.asarray(rng.uniform(0.03, 0.2, nA), jnp.float32)
        b1 = jnp.asarray(rng.uniform(0.7, 1.3, nA), jnp.float32)
        return flips, T1, T2, b1

    def test_epg_spgr_all_backends(self):
        flips, T1, T2, b1 = self._setup()
        kw = dict(T1=T1, T2=T2, tr=12e-3, te=3e-3, K=8)
        ref = epg.epg_spgr(b1[:, None] * flips[None], None, **kw)
        out = epg.epg_spgr(flips, None, b1=b1, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)
        outp = epg.epg_spgr(flips, None, b1=b1, backend='pallas', **kw)
        assert float(jnp.max(jnp.abs(outp - ref))) < 2e-5

    def test_epg_cpmg_scales_refocusing_only(self):
        flips, T1, T2, b1 = self._setup()
        kw = dict(T1=T1, T2=T2, esp=0.01, alpha_ex=1.3)
        ref = epg.epg_cpmg(b1[:, None] * flips[None], **kw)
        out = epg.epg_cpmg(flips, b1=b1, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)
        outp = epg.epg_cpmg(flips, b1=b1, backend='pallas', **kw)
        assert float(jnp.max(jnp.abs(outp - ref))) < 2e-5

    def test_epgx_trains(self):
        flips, T1, T2, b1 = self._setup()
        kw = dict(T1a=T1, T2a=T2, T1b=0.3, T2b=0.01, kab=2.0, kba=8.0)
        for fn, extra in ((epg.epgx_spgr, dict(tr=12e-3, K=8)),
                          (epg.epgx_cpmg, dict(esp=0.01)),):
            ref = fn(b1[:, None] * flips[None], **kw, **extra) \
                if fn is epg.epgx_cpmg else fn(
                    b1[:, None] * flips[None], None, **kw, **extra)
            out = fn(flips, b1=b1, **kw, **extra) \
                if fn is epg.epgx_cpmg else fn(flips, None, b1=b1,
                                               **kw, **extra)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(ref), atol=1e-12)
        mt = dict(T1a=T1, T2a=T2, T1b=0.25, kab=3.0, kba=12.0,
                  tr=12e-3, wt=2.0, K=8)
        ref = epg.epgx_mt_spgr(b1[:, None] * flips[None], None, **mt)
        out = epg.epgx_mt_spgr(flips, None, b1=b1, **mt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    def test_b1_under_mesh(self):
        if len(jax.devices()) < 8:
            import pytest
            pytest.skip('needs the 8-vdev mesh')
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        flips, T1, T2, b1 = self._setup()
        kw = dict(T1=T1, T2=T2, esp=0.01)
        ref = epg.epg_cpmg(flips, b1=b1, **kw)
        out = epg.epg_cpmg(flips, b1=b1, mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)
        from mrphy_tpu.ops import ssfp
        df = jnp.zeros_like(T1)
        ref = ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                               b1=b1)
        out = ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                               b1=b1, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)   # f32 fusion ulps
        outp = ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                                b1=b1, mesh=mesh, backend='pallas')
        assert float(jnp.max(jnp.abs(outp - ref))) < 2e-5
