r"""Pallas fused-kernel parity tests (interpret mode on CPU; the compiled
path is exercised on real TPU by bench.py and the verify recipe)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu.ops import sims

DT32 = jnp.float32


def _mk(nM, nT, nC=1, seed=0):
    rng = np.random.default_rng(seed)
    Mi = jnp.asarray(rng.random((1, nM, 3)) - 0.5, DT32)
    loc = jnp.asarray(rng.random((1, nM, 3)) * 2 - 1, DT32)
    df = jnp.asarray(rng.random((1, nM)) * 50, DT32)
    b1 = jnp.asarray(rng.random((1, nM, 2, nC)), DT32)
    rf = jnp.asarray(rng.random((1, 2, nT, nC)), DT32)
    gr = jnp.asarray(rng.random((1, 3, nT)), DT32)
    T1 = jnp.asarray([[1.]], DT32)
    T2 = jnp.asarray([[4e-2]], DT32)
    return Mi, loc, df, b1, rf, gr, T1, T2


CONFIGS = [
    dict(),                                          # bare
    dict(relax=True),                                # T1/T2
    dict(relax=True, df=True),                       # + off-resonance
    dict(relax=True, df=True, b1=True),              # + B1 map
    dict(relax=True, df=True, b1=True, nC=3),        # multi-coil
]


class TestPallasInterpret:

    @pytest.mark.parametrize('cfg', CONFIGS)
    def test_fwd_and_grads_vs_xla(self, cfg):
        nC = cfg.get('nC', 1)
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1500, 20, nC=nC)
        kw = {}
        if cfg.get('relax'):
            kw.update(T1=T1, T2=T2)
        if cfg.get('df'):
            kw.update(df=df)
        if cfg.get('b1'):
            kw.update(b1Map=b1)
        if nC == 1 and not cfg.get('b1'):
            rf = rf[..., 0]  # exercise the missing-coil-dim path

        a = sims.blochsim_rfgr(Mi, rf, gr, loc, backend='xla', **kw)
        b = sims.blochsim_rfgr(Mi, rf, gr, loc, _pallas_interpret=True,
                               **kw)
        np.testing.assert_allclose(b, a, atol=2e-6)

        # weighted linear loss: Σ|Mo|² is rotation-invariant, so without
        # relaxation its true waveform gradient is exactly zero and the
        # comparison would be noise-over-noise
        W = jnp.asarray(np.random.default_rng(9).normal(size=a.shape),
                        DT32)
        gx = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, backend='xla', **kw)),
            argnums=(0, 1))(rf, gr)
        gp = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, _pallas_interpret=True, **kw)),
            argnums=(0, 1))(rf, gr)
        # tolerance: both engines sit ~5-8e-4 (relative) from the f64
        # truth at f32 — reduction-order noise, verified by comparing
        # each against an f64 oracle; formula errors would be O(1)
        scale_rf = float(jnp.max(jnp.abs(gx[0]))) + 1e-30
        scale_gr = float(jnp.max(jnp.abs(gx[1]))) + 1e-30
        np.testing.assert_allclose(gp[0] / scale_rf, gx[0] / scale_rf,
                                   atol=2e-3)
        np.testing.assert_allclose(gp[1] / scale_gr, gx[1] / scale_gr,
                                   atol=2e-3)

    def test_dmi_matches(self):
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1024, 16)
        kw = dict(T1=T1, T2=T2, df=df)
        gx = jax.grad(lambda m: jnp.sum(sims.blochsim_rfgr(
            m, rf, gr, loc, backend='xla', **kw) ** 2))(Mi)
        gp = jax.grad(lambda m: jnp.sum(sims.blochsim_rfgr(
            m, rf, gr, loc, _pallas_interpret=True, **kw) ** 2))(Mi)
        np.testing.assert_allclose(gp, gx, atol=2e-5)


class TestChunkedBackward:
    r"""The time-chunked backward grid (long-pulse path) vs the
    single-chunk kernel: identical arithmetic EXCEPT that each chunk's
    reconstruction restarts from the forward's exact checkpoint, while
    the single-chunk kernel reconstructs through — so results agree to
    reconstruction rounding (tight f32), not bit-for-bit."""

    @pytest.mark.slow
    def test_chunked_equals_single_chunk(self, monkeypatch):
        from mrphy_tpu.ops import pallas_kernels as pk
        rng = np.random.default_rng(5)
        nM, nT = 700, 24
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(nM, nT, seed=5)
        vel = jnp.asarray(rng.random((1, nM, 3)) - .5, DT32)
        kw = dict(T1=T1, T2=T2, df=df, b1Map=b1, vel=vel,
                  _pallas_interpret=True)
        W = jnp.asarray(rng.normal(size=(1, nM, 3)), DT32)

        def all_grads():
            return jax.grad(
                lambda r, g_, m, lo, d, b_, v: jnp.sum(
                    W * sims.blochsim_rfgr(m, r, g_, lo, T1=T1, T2=T2,
                                           df=d, b1Map=b_, vel=v,
                                           _pallas_interpret=True)),
                argnums=(0, 1, 2, 3, 4, 5, 6))(rf, gr, Mi, loc, df, b1,
                                               vel)

        monkeypatch.setattr(pk, '_pick_tc_wf', lambda nT, K: nT)
        g_single = all_grads()
        jax.clear_caches()   # same shapes: force a retrace with tc=8
        monkeypatch.setattr(pk, '_pick_tc_wf', lambda nT, K: 8)
        g_chunked = all_grads()
        for a, b in zip(g_chunked, g_single):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(b)) + 1e-30
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-6)

    def test_tc_picker(self):
        from mrphy_tpu.ops.pallas_kernels import (_pick_tc_wf,
                                                  _largest_divisor_leq)
        # short pulses: single chunk (identical to the unchunked kernel)
        assert _pick_tc_wf(1000, 5) == 1000
        # long pulses: chunk divides nT and bounds the VMEM block
        K = 5
        tc = _pick_tc_wf(16000, K)
        assert 16000 % tc == 0 and tc * K * 128 * 4 <= 4 << 20
        # divisor-poor nT (prime): fall back to ONE chunk, never a
        # degenerate micro-chunk grid; rfgr_is_available then gates on
        # the single-chunk VMEM block (XLA fallback on real hardware)
        assert _pick_tc_wf(15991, K) == 15991
        assert _largest_divisor_leq(15, 6) == 5
        assert _largest_divisor_leq(17, 16) == 1


class TestBeffStreamingInterpret:
    r"""Beff-streaming Pallas engine vs XLA scan (interpret mode)."""

    @pytest.mark.parametrize('relax', [True, False])
    def test_fwd_and_dbeff(self, relax):
        rng = np.random.default_rng(3)
        nM, nT = 2000, 24
        Mi = jnp.asarray(rng.random((1, nM, 3)), DT32)
        beff = jnp.asarray(rng.normal(size=(1, nM, nT, 3)), DT32)
        kw = (dict(T1=jnp.asarray([[1.]], DT32),
                   T2=jnp.asarray([[4e-2]], DT32)) if relax else {})

        a = sims.blochsim(Mi, beff, backend='xla', **kw)
        b = sims.blochsim(Mi, beff, _pallas_interpret=True, **kw)
        np.testing.assert_allclose(b, a, atol=2e-6)

        W = jnp.asarray(rng.normal(size=a.shape), DT32)
        gx = jax.grad(lambda bb: jnp.sum(W * sims.blochsim(
            Mi, bb, backend='xla', **kw)))(beff)
        gp = jax.grad(lambda bb: jnp.sum(W * sims.blochsim(
            Mi, bb, _pallas_interpret=True, **kw)))(beff)
        scale = float(jnp.max(jnp.abs(gx))) + 1e-30
        np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-4)

    def test_dmi(self):
        rng = np.random.default_rng(4)
        Mi = jnp.asarray(rng.random((1, 1024, 3)), DT32)
        beff = jnp.asarray(rng.normal(size=(1, 1024, 16, 3)), DT32)
        W = jnp.asarray(rng.normal(size=Mi.shape), DT32)
        gx = jax.grad(lambda m: jnp.sum(W * sims.blochsim(
            m, beff, backend='xla')))(Mi)
        gp = jax.grad(lambda m: jnp.sum(W * sims.blochsim(
            m, beff, _pallas_interpret=True)))(Mi)
        np.testing.assert_allclose(gp, gx, atol=2e-5)


class TestBatchedPallas:
    r"""N>1 batched Pallas rf/gr path (interpret mode)."""

    def test_batched_matches_per_batch(self):
        rng = np.random.default_rng(6)
        N, nM, nT, nC = 3, 1024, 16, 2
        Mi = jnp.asarray(rng.random((N, nM, 3)), DT32)
        loc = jnp.asarray(rng.random((N, nM, 3)), DT32)
        df = jnp.asarray(rng.random((N, nM)) * 30, DT32)
        b1 = jnp.asarray(rng.random((N, nM, 2, nC)), DT32)
        rf = jnp.asarray(rng.random((N, 2, nT, nC)), DT32)
        gr = jnp.asarray(rng.normal(size=(N, 3, nT)), DT32)
        T1 = jnp.asarray([[1.]], DT32)
        T2 = jnp.asarray([[4e-2]], DT32)
        kw = dict(T1=T1, T2=T2, df=df, b1Map=b1)

        batched = sims.blochsim_rfgr(Mi, rf, gr, loc,
                                     _pallas_interpret=True, **kw)
        for n in range(N):
            single = sims.blochsim_rfgr(
                Mi[n:n + 1], rf[n:n + 1], gr[n:n + 1], loc[n:n + 1],
                T1=T1, T2=T2, df=df[n:n + 1], b1Map=b1[n:n + 1],
                backend='xla')
            np.testing.assert_allclose(batched[n:n + 1], single,
                                       atol=2e-6)

    def test_batched_grads(self):
        rng = np.random.default_rng(7)
        N, nM, nT = 2, 1024, 12
        Mi = jnp.asarray(rng.random((N, nM, 3)), DT32)
        loc = jnp.asarray(rng.random((N, nM, 3)), DT32)
        rf = jnp.asarray(rng.random((N, 2, nT)), DT32)
        gr = jnp.asarray(rng.normal(size=(N, 3, nT)), DT32)
        T1 = jnp.asarray([[1.]], DT32)
        T2 = jnp.asarray([[4e-2]], DT32)
        W = jnp.asarray(rng.normal(size=Mi.shape), DT32)

        gx = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, T1=T1, T2=T2, backend='xla')),
            argnums=(0, 1))(rf, gr)
        gp = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, T1=T1, T2=T2, _pallas_interpret=True)),
            argnums=(0, 1))(rf, gr)
        for a, b in zip(gp, gx):
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)


class TestFlowPallas:
    r"""Flow (vel) on the Pallas path vs the XLA engine."""

    def test_flow_fwd_and_grads(self):
        rng = np.random.default_rng(8)
        nM, nT = 1024, 16
        Mi = jnp.asarray(rng.random((1, nM, 3)), DT32)
        loc = jnp.asarray(rng.random((1, nM, 3)), DT32)
        vel = jnp.asarray(rng.normal(size=(1, nM, 3)) * 30, DT32)
        rf = jnp.asarray(rng.random((1, 2, nT)), DT32)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)), DT32)
        T1 = jnp.asarray([[1.]], DT32)
        T2 = jnp.asarray([[4e-2]], DT32)
        kw = dict(T1=T1, T2=T2, vel=vel)

        a = sims.blochsim_rfgr(Mi, rf, gr, loc, backend='xla', **kw)
        b = sims.blochsim_rfgr(Mi, rf, gr, loc, _pallas_interpret=True,
                               **kw)
        np.testing.assert_allclose(b, a, atol=2e-6)

        W = jnp.asarray(rng.normal(size=a.shape), DT32)
        gx = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, backend='xla', **kw)), argnums=(0, 1))(rf, gr)
        gp = jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, g_, loc, _pallas_interpret=True, **kw)),
            argnums=(0, 1))(rf, gr)
        for a_, b_ in zip(gp, gx):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-30
            np.testing.assert_allclose(a_ / scale, b_ / scale, atol=2e-3)


class TestSmallPhi:
    r"""max_phi ≤ π/2 drops the sincos range reduction: BIT-IDENTICAL
    results (k=0 ⇒ r=phi, sgn=1), fewer flops."""

    def test_small_phi_bit_identical(self):
        from mrphy_tpu.ops.pallas_kernels import _fast_sincos
        phi = jnp.asarray(np.linspace(0, np.pi / 2, 10001), DT32)
        s0, c0 = _fast_sincos(phi, False)
        s1, c1 = _fast_sincos(phi, True)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    def test_engine_small_phi_matches(self):
        from mrphy_tpu.ops.sims import rfgr_phi_bound
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1024, 16, seed=10)
        rf, gr = rf * 0.02, gr * 0.02          # physical magnitudes
        kw = dict(T1=T1, T2=T2, df=df, _pallas_interpret=True)
        bound = float(rfgr_phi_bound(rf, gr, loc, df=df))
        assert 0 < bound <= np.pi / 2, bound
        a = sims.blochsim_rfgr(Mi, rf, gr, loc, **kw)
        b = sims.blochsim_rfgr(Mi, rf, gr, loc, max_phi=bound, **kw)
        # the sincos VALUES are bit-identical (asserted above); through
        # the compiled engine XLA may fuse the dropped ops' neighbors
        # differently, so allow ULP-scale wiggle
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
        # W-weighted linear loss (sum(Mo²) waveform grads nearly cancel
        # — noise-over-noise, like the other grad tests note)
        W = jnp.asarray(np.random.default_rng(3).normal(size=a.shape),
                        DT32)
        ga = jax.grad(lambda r: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, gr, loc, **kw)))(rf)
        gb = jax.grad(lambda r: jnp.sum(W * sims.blochsim_rfgr(
            Mi, r, gr, loc, max_phi=bound, **kw)))(rf)
        # recompilation of a different (if mathematically equal) graph
        # shifts rounding a few ULP per step; accumulation over the
        # reverse reconstruction lands ~1e-5 — formula errors would be
        # O(1)
        scale = float(jnp.max(jnp.abs(ga))) + 1e-30
        np.testing.assert_allclose(np.asarray(gb) / scale,
                                   np.asarray(ga) / scale, atol=2e-4)

    def test_phi_bound_is_sound(self):
        r"""The analytic bound dominates the actual per-step angle."""
        from mrphy_tpu import gamH, dt0, pi as PI
        from mrphy_tpu.ops import beffective
        from mrphy_tpu.ops.sims import rfgr_phi_bound
        rng = np.random.default_rng(11)
        N, nM, nT, nC = 2, 64, 24, 2
        rf = jnp.asarray(rng.normal(size=(N, 2, nT, nC)), DT32)
        gr = jnp.asarray(rng.normal(size=(N, 3, nT)), DT32)
        loc = jnp.asarray(rng.random((N, nM, 3)) * 2 - 1, DT32)
        df = jnp.asarray(rng.normal(size=(N, nM)) * 100, DT32)
        b1 = jnp.asarray(rng.normal(size=(N, nM, 2, nC)), DT32)
        beff = beffective.rfgr2beff(rf, gr, loc, df=df, b1Map=b1,
                                    gam=gamH)
        phi_true = float(jnp.max(jnp.linalg.norm(beff, axis=-1))
                         * 2 * PI * gamH * dt0)
        bound = float(rfgr_phi_bound(rf, gr, loc, df=df, b1Map=b1))
        assert bound >= phi_true * (1 - 1e-6), (bound, phi_true)


class TestBf16Beff:
    r"""bfloat16 Beff storage: the streaming engine upcasts in-register;
    results match f32 at bf16 field resolution; cotangents mirror the
    storage dtype."""

    def test_bf16_storage_close_to_f32(self):
        rng = np.random.default_rng(12)
        nM, nT = 1024, 24
        Mi = jnp.asarray(rng.random((1, nM, 3)), DT32)
        beff32 = jnp.asarray(rng.normal(size=(1, nM, nT, 3)), DT32)
        beff16 = beff32.astype(jnp.bfloat16)
        kw = dict(T1=jnp.asarray([[1.]], DT32),
                  T2=jnp.asarray([[4e-2]], DT32))
        a = sims.blochsim(Mi, beff32, _pallas_interpret=True, **kw)
        b = sims.blochsim(Mi, beff16, _pallas_interpret=True, **kw)
        assert b.dtype == jnp.float32
        # bf16 rounds the field to ~0.4% per step; error compounds ~√nT
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=0.05)
        g = jax.grad(lambda bb: jnp.sum(sims.blochsim(
            Mi, bb, _pallas_interpret=True, **kw) ** 2))(beff16)
        assert g.dtype == jnp.bfloat16
        g32 = jax.grad(lambda bb: jnp.sum(sims.blochsim(
            Mi, bb, **kw) ** 2))(beff32)
        scale = float(jnp.max(jnp.abs(g32)))
        np.testing.assert_allclose(
            np.asarray(g, np.float32) / scale,
            np.asarray(g32) / scale, atol=0.08)

    def test_bf16_xla_path_works(self):
        rng = np.random.default_rng(13)
        Mi = jnp.asarray(rng.random((1, 64, 3)), DT32)
        beff16 = jnp.asarray(rng.normal(size=(1, 64, 8, 3)),
                             jnp.bfloat16)
        mo = sims.blochsim(Mi, beff16, backend='xla')
        assert mo.dtype == jnp.float32
        g = jax.grad(lambda bb: jnp.sum(sims.blochsim(
            Mi, bb, backend='xla') ** 2))(beff16)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


class TestFastSincos:

    def test_matches_reference_over_range(self):
        r"""The kernels' polynomial sincos is f32-exact (~1e-7) for all
        phi the physics can produce (phi = gam*2pi*dt*|B| >= 0; 60 rad
        corresponds to ~560 Gauss at dt=4us — far beyond hardware)."""
        from mrphy_tpu.ops.pallas_kernels import _fast_sincos
        phi = jnp.asarray(
            np.concatenate([np.linspace(0, 60, 200001),
                            [0.0, 1e-12, 1e-6, np.pi / 2, np.pi]]), DT32)
        s, c = _fast_sincos(phi)
        phi64 = np.asarray(phi, np.float64)
        assert np.abs(np.asarray(s) - np.sin(phi64)).max() < 2e-7
        assert np.abs(np.asarray(c) - np.cos(phi64)).max() < 2e-7


class TestFieldGradients:
    r"""blochsim_rfgr is differentiable w.r.t. loc/df/b1Map/vel (the
    fused adjoint accumulates per-spin field gradients); validated
    against the composed rfgr2beff -> blochsim autodiff chain."""

    def test_pallas_field_grads_match_xla(self):
        nM, nT, nC = 24, 16, 2
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(nM, nT, nC, seed=4)
        vel = jnp.asarray(
            np.random.default_rng(9).random((1, nM, 3)), DT32)

        def loss(loc, df, b1, vel, backend, interp):
            Mo = sims.blochsim_rfgr(
                Mi, rf, gr, loc, T1=T1, T2=T2, df=df, b1Map=b1, vel=vel,
                backend=backend, _pallas_interpret=interp)
            return jnp.sum(Mo ** 2 * jnp.asarray([1., 2., 3.], DT32))

        gx = jax.grad(lambda *a: loss(*a, 'xla', False),
                      argnums=(0, 1, 2, 3))(loc, df, b1, vel)
        gp = jax.grad(lambda *a: loss(*a, 'pallas', True),
                      argnums=(0, 1, 2, 3))(loc, df, b1, vel)
        for name, a, b in zip(('dloc', 'ddf', 'db1', 'dvel'), gp, gx):
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-5, (name, err)
            assert float(jnp.max(jnp.abs(b))) > 0, name

    def test_field_grads_match_composed_chain_f64(self):
        import mrphy_tpu.ops.beffective as beffective
        from mrphy_tpu import gamH, dt0
        rng = np.random.default_rng(11)
        N, nM, nT, nC = 2, 5, 12, 2
        f64 = jnp.float64
        Mi = jnp.asarray(rng.random((N, nM, 3)) - 0.5, f64)
        loc = jnp.asarray(rng.random((N, nM, 3)) * 2 - 1, f64)
        df = jnp.asarray(rng.random((N, nM)) * 100 - 50, f64)
        b1 = jnp.asarray(rng.random((N, nM, 2, nC)) - 0.3, f64)
        rf = jnp.asarray(rng.random((N, 2, nT, nC)) - 0.5, f64)
        gr = jnp.asarray(rng.random((N, 3, nT)) - 0.5, f64)
        T1, T2 = jnp.asarray([[1.]], f64), jnp.asarray([[0.05]], f64)

        def fused(loc, df, b1, adjoint):
            Mo = sims.blochsim_rfgr(Mi, rf, gr, loc, T1=T1, T2=T2, df=df,
                                    b1Map=b1, gam=gamH, dt=dt0,
                                    adjoint=adjoint)
            return jnp.sum(Mo ** 2 * jnp.asarray([1., 2., 3.], f64))

        def composed(loc, df, b1):
            beff = beffective.rfgr2beff(rf, gr, loc, df=df, b1Map=b1,
                                        gam=gamH)
            Mo = sims.blochsim(Mi, beff, T1=T1, T2=T2, gam=gamH, dt=dt0)
            return jnp.sum(Mo ** 2 * jnp.asarray([1., 2., 3.], f64))

        gc = jax.grad(composed, argnums=(0, 1, 2))(loc, df, b1)
        for adj in ('reconstruct', 'history'):
            gf = jax.grad(lambda l, d, b: fused(l, d, b, adj),
                          argnums=(0, 1, 2))(loc, df, b1)
            for name, a, b in zip(('dloc', 'ddf', 'db1'), gf, gc):
                assert float(jnp.max(jnp.abs(a - b))) < 1e-9, (adj, name)

    def test_gam_dt_grads_stay_zero(self):
        r"""Reference contract: no gradients w.r.t. gam (the df/gam
        chain must not leak a partial one)."""
        from mrphy_tpu import dt0
        nM, nT = 8, 8
        Mi, loc, df, b1, rf, gr, T1, T2 = _mk(nM, nT, seed=5)
        gam = jnp.asarray([[4257.6]], DT32)

        def loss(gam):
            Mo = sims.blochsim_rfgr(Mi, rf, gr, loc, T1=T1, T2=T2,
                                    df=df, gam=gam, dt=dt0)
            return jnp.sum(Mo ** 2)
        g = jax.grad(loss)(gam)
        assert float(jnp.max(jnp.abs(g))) == 0.0, g
