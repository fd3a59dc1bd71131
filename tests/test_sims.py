r"""Explicit-Jacobian engine vs autodiff oracle parity tests.

Mirrors `/root/reference/tests/test_sims.py`: forward values and gradients
(∂Mi, ∂Beff) of the custom-VJP engine must match plain autodiff through the
oracle scan at 1e-9 (f64), with and without relaxation; same for freeprec.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.ops import beffective, sims, slowsims

from tests._scenario import pulse_arrays

ATOL = 1e-9
DTYPE = jnp.float64


def _setup(nM=16 * 16 * 2, nT=512):
    sc = pulse_arrays(nM=nM, nT=nT, dtype=DTYPE)
    rng = np.random.default_rng(7)
    M0 = jnp.asarray(rng.random((1, nM, 3)), DTYPE)
    T1 = jnp.asarray([[1.]], DTYPE)
    T2 = jnp.asarray([[4e-2]], DTYPE)
    beff = beffective.rfgr2beff(sc['rf'], sc['gr'], sc['loc'], df=sc['df'],
                                b1Map=sc['b1Map'], gam=sc['gam'])
    return sc, M0, T1, T2, beff


class TestSims:

    def test_missing_coil_dim(self):
        sc, M0, T1, T2, beff = _setup(nM=8, nT=32)
        beff2 = beffective.rfgr2beff(sc['rf'][..., 0], sc['gr'], sc['loc'],
                                     df=sc['df'], b1Map=sc['b1Map'][..., 0],
                                     gam=sc['gam'])
        np.testing.assert_allclose(beff, beff2, atol=ATOL)

    def test_blochsim_fwd_and_grads_with_relax(self):
        sc, M0, T1, T2, beff = _setup()
        gam, dt = sc['gam'], sc['dt']

        def loss_slow(m0, b):
            return jnp.sum(slowsims.blochsim(m0, b, T1=T1, T2=T2,
                                             gam=gam, dt=dt))

        def loss_fast(m0, b):
            return jnp.sum(sims.blochsim(m0, b, T1=T1, T2=T2,
                                         gam=gam, dt=dt, backend='xla'))

        Mo_slow = slowsims.blochsim(M0, beff, T1=T1, T2=T2, gam=gam, dt=dt)
        Mo_fast = sims.blochsim(M0, beff, T1=T1, T2=T2, gam=gam, dt=dt,
                                backend='xla')
        np.testing.assert_allclose(Mo_fast, Mo_slow, atol=ATOL)

        g_slow = jax.grad(loss_slow, argnums=(0, 1))(M0, beff)
        g_fast = jax.grad(loss_fast, argnums=(0, 1))(M0, beff)
        np.testing.assert_allclose(g_fast[0], g_slow[0], atol=ATOL)
        np.testing.assert_allclose(g_fast[1], g_slow[1], atol=ATOL)

    def test_blochsim_fwd_and_grads_no_relax(self):
        sc, M0, T1, T2, beff = _setup()
        gam, dt = sc['gam'], sc['dt']

        def loss_slow(m0, b):
            return jnp.sum(slowsims.blochsim(m0, b, T1=None, T2=None,
                                             gam=gam, dt=dt))

        def loss_fast(m0, b):
            return jnp.sum(sims.blochsim(m0, b, T1=None, T2=None,
                                         gam=gam, dt=dt, backend='xla'))

        np.testing.assert_allclose(
            sims.blochsim(M0, beff, gam=gam, dt=dt, backend='xla'),
            slowsims.blochsim(M0, beff, gam=gam, dt=dt), atol=ATOL)

        g_slow = jax.grad(loss_slow, argnums=(0, 1))(M0, beff)
        g_fast = jax.grad(loss_fast, argnums=(0, 1))(M0, beff)
        np.testing.assert_allclose(g_fast[0], g_slow[0], atol=ATOL)
        np.testing.assert_allclose(g_fast[1], g_slow[1], atol=ATOL)

    def test_blochsim_jit_and_chain_to_rf_gr(self):
        r"""Gradients chain through rfgr2beff to rf/gr under jit, engine vs
        oracle (the reference verifies the chain at test_slowsims.py:86-96).
        """
        sc, M0, T1, T2, _ = _setup(nM=32, nT=64)
        gam, dt = sc['gam'], sc['dt']

        def mk_loss(engine):
            def loss(rf, gr):
                beff = beffective.rfgr2beff(rf, gr, sc['loc'], df=sc['df'],
                                            b1Map=sc['b1Map'], gam=gam)
                return jnp.sum(engine(M0, beff, T1=T1, T2=T2, gam=gam,
                                      dt=dt))
            return loss

        g_fast = jax.jit(jax.grad(mk_loss(
            lambda *a, **k: sims.blochsim(*a, backend='xla', **k)),
            argnums=(0, 1)))(sc['rf'], sc['gr'])
        g_slow = jax.grad(mk_loss(slowsims.blochsim),
                          argnums=(0, 1))(sc['rf'], sc['gr'])
        np.testing.assert_allclose(g_fast[0], g_slow[0], atol=ATOL)
        np.testing.assert_allclose(g_fast[1], g_slow[1], atol=ATOL)

    def test_blochsim_zero_beff_singularity(self):
        r"""ϕ→0 singularity: zero B-effective must give identity rotation
        with finite gradients (reference TODO at sims.py:210-213)."""
        M0 = jnp.asarray([[[0.3, -0.4, 0.5]]], DTYPE)
        beff = jnp.zeros((1, 1, 8, 3), DTYPE)
        Mo = sims.blochsim(M0, beff, T1=None, T2=None, backend='xla')
        np.testing.assert_allclose(Mo, M0, atol=1e-12)
        g = jax.grad(lambda b: jnp.sum(
            sims.blochsim(M0, b, T1=None, T2=None, backend='xla')))(beff)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_freeprec_parity(self):
        sc, M0, T1, T2, _ = _setup(nM=16, nT=4)
        gam = sc['gam']
        dur = jnp.asarray(0.5, DTYPE)
        df = sc['df']

        Mo1 = slowsims.freeprec(M0, dur, T1=T1, T2=T2, df=df)
        Mo2 = sims.freeprec(M0, dur, T1=T1, T2=T2, df=df)
        np.testing.assert_allclose(Mo2, Mo1, atol=ATOL)

        g1 = jax.grad(lambda m: jnp.sum(
            slowsims.freeprec(m, dur, T1=T1, T2=T2, df=df)))(M0)
        g2 = jax.grad(lambda m: jnp.sum(
            sims.freeprec(m, dur, T1=T1, T2=T2, df=df)))(M0)
        np.testing.assert_allclose(g2, g1, atol=ATOL)

        # no relax / no df variants
        np.testing.assert_allclose(
            sims.freeprec(M0, dur, df=df),
            slowsims.freeprec(M0, dur, df=df), atol=ATOL)
        np.testing.assert_allclose(
            sims.freeprec(M0, dur, T1=T1, T2=T2),
            slowsims.freeprec(M0, dur, T1=T1, T2=T2), atol=ATOL)

    def test_freeprec_nondiff_params(self):
        r"""freeprec is differentiable w.r.t. Mi only; df grads are zero
        (reference contract, sims.py:321)."""
        M0 = jnp.asarray([[[1., 0., 0.]]], DTYPE)
        dur = jnp.asarray(0.5, DTYPE)
        df = jnp.asarray([[2.0]], DTYPE)
        g = jax.grad(lambda d: jnp.sum(sims.freeprec(M0, dur, df=d)))(df)
        np.testing.assert_allclose(g, jnp.zeros_like(df), atol=0)


class TestBlochsimRfgr:
    r"""Fused waveform engine vs (rfgr2beff → blochsim) composition."""

    def test_fwd_and_grads_match_composed_path(self):
        sc, M0, T1, T2, beff = _setup(nM=64, nT=128)
        gam, dt = sc['gam'], sc['dt']

        def loss_composed(rf, gr):
            b = beffective.rfgr2beff(rf, gr, sc['loc'], df=sc['df'],
                                     b1Map=sc['b1Map'], gam=gam)
            return jnp.sum(slowsims.blochsim(M0, b, T1=T1, T2=T2,
                                             gam=gam, dt=dt))

        def loss_fused(rf, gr):
            return jnp.sum(sims.blochsim_rfgr(M0, rf, gr, sc['loc'],
                                              T1=T1, T2=T2, df=sc['df'],
                                              b1Map=sc['b1Map'], gam=gam,
                                              dt=dt))

        np.testing.assert_allclose(
            sims.blochsim_rfgr(M0, sc['rf'], sc['gr'], sc['loc'], T1=T1,
                               T2=T2, df=sc['df'], b1Map=sc['b1Map'],
                               gam=gam, dt=dt),
            slowsims.blochsim(M0, beff, T1=T1, T2=T2, gam=gam, dt=dt)[
                ..., :],
            atol=ATOL)

        g_c = jax.grad(loss_composed, argnums=(0, 1))(sc['rf'], sc['gr'])
        g_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(sc['rf'],
                                                            sc['gr'])
        np.testing.assert_allclose(g_f[0], g_c[0], atol=ATOL)
        np.testing.assert_allclose(g_f[1], g_c[1], atol=ATOL)

    def test_no_b1_no_df_no_relax(self):
        sc, M0, T1, T2, _ = _setup(nM=32, nT=64)
        gam, dt = sc['gam'], sc['dt']
        rf3 = sc['rf'][..., 0]  # no coil dim

        b = beffective.rfgr2beff(rf3, sc['gr'], sc['loc'], gam=gam)
        np.testing.assert_allclose(
            sims.blochsim_rfgr(M0, rf3, sc['gr'], sc['loc'], gam=gam,
                               dt=dt),
            slowsims.blochsim(M0, b, gam=gam, dt=dt), atol=ATOL)

    def test_dMi_matches(self):
        sc, M0, T1, T2, beff = _setup(nM=16, nT=32)
        gam, dt = sc['gam'], sc['dt']
        g_f = jax.grad(lambda m: jnp.sum(sims.blochsim_rfgr(
            m, sc['rf'], sc['gr'], sc['loc'], T1=T1, T2=T2, df=sc['df'],
            b1Map=sc['b1Map'], gam=gam, dt=dt)))(M0)
        g_s = jax.grad(lambda m: jnp.sum(slowsims.blochsim(
            m, beff, T1=T1, T2=T2, gam=gam, dt=dt)))(M0)
        np.testing.assert_allclose(g_f, g_s, atol=ATOL)


class TestAdjointModes:
    r"""'reconstruct' (O(nM) memory) vs 'history' adjoints agree with the
    oracle at 1e-9 (f64)."""

    def test_blochsim_adjoint_modes(self):
        sc, M0, T1, T2, beff = _setup(nM=64, nT=256)
        gam, dt = sc['gam'], sc['dt']

        def mk(adjoint):
            return jax.grad(lambda m0, b: jnp.sum(sims.blochsim(
                m0, b, T1=T1, T2=T2, gam=gam, dt=dt, backend='xla',
                adjoint=adjoint) ** 2), argnums=(0, 1))

        g_r = mk('reconstruct')(M0, beff)
        g_h = mk('history')(M0, beff)
        g_o = jax.grad(lambda m0, b: jnp.sum(slowsims.blochsim(
            m0, b, T1=T1, T2=T2, gam=gam, dt=dt) ** 2),
            argnums=(0, 1))(M0, beff)
        for a, b_ in ((g_r, g_o), (g_h, g_o)):
            np.testing.assert_allclose(a[0], b_[0], atol=ATOL)
            np.testing.assert_allclose(a[1], b_[1], atol=ATOL)

    def test_rfgr_adjoint_modes(self):
        sc, M0, T1, T2, _ = _setup(nM=48, nT=128)
        gam, dt = sc['gam'], sc['dt']

        def mk(adjoint):
            return jax.grad(lambda rf, gr: jnp.sum(sims.blochsim_rfgr(
                M0, rf, gr, sc['loc'], T1=T1, T2=T2, df=sc['df'],
                b1Map=sc['b1Map'], gam=gam, dt=dt, adjoint=adjoint) ** 2),
                argnums=(0, 1))

        g_r = mk('reconstruct')(sc['rf'], sc['gr'])
        g_h = mk('history')(sc['rf'], sc['gr'])
        np.testing.assert_allclose(g_r[0], g_h[0], atol=ATOL)
        np.testing.assert_allclose(g_r[1], g_h[1], atol=ATOL)
        assert bool(jnp.all(jnp.isfinite(g_r[0])))


class TestAdjointConditioning:
    r"""Reconstruction-adjoint conditioning envelope.

    Inverting relaxation in the reverse scan amplifies rounding as
    exp(nT·dt/T2); the chunk-checkpointed reconstruction (save the state
    every ≤``_XLA_TC`` steps, restart reconstruction per chunk — see
    ``sims._pick_tc_xla``) bounds this at exp(tc·dt/T2) per chunk for
    ANY pulse length. These tests pin the envelope: f32 default-adjoint
    gradients must match the f64 autodiff oracle deep into the regime
    where an unchunked inversion would have lost most f32 digits
    (nT·dt/T2 = 5 → e⁵ ≈ 150×; = 10 → e¹⁰ ≈ 22 000×), WITHOUT the user
    choosing an adjoint. (Reference context: the memory/compute trade
    discussion at ``/root/reference/mrphy/sims.py:298-301``.)
    """

    def _grads(self, ratio: float, nT: int = 4096, nM: int = 64):
        dt = 4e-6
        T2v = nT * dt / ratio
        rng = np.random.default_rng(12)
        M0 = rng.random((1, nM, 3)) - 0.2
        beff = rng.normal(size=(1, nM, nT, 3)) * 0.05
        T1, T2 = np.asarray([[1.5 * T2v]]), np.asarray([[T2v]])
        W = rng.normal(size=(1, nM, 3))

        def loss(engine, dtype):
            c = lambda x: jnp.asarray(x, dtype)  # noqa: E731
            def f(m0, b):
                return jnp.sum(c(W) * engine(
                    m0, b, T1=c(T1), T2=c(T2), dt=dt))
            return f

        # f32 fast engine, DEFAULT adjoint (no user choice)
        g32 = jax.grad(loss(lambda *a, **k: sims.blochsim(
            *a, backend='xla', **k), jnp.float32), argnums=(0, 1))(
            jnp.asarray(M0, jnp.float32), jnp.asarray(beff, jnp.float32))
        # f64 oracle
        g64 = jax.grad(loss(slowsims.blochsim, jnp.float64),
                       argnums=(0, 1))(jnp.asarray(M0), jnp.asarray(beff))
        rels = []
        for a, b in zip(g32, g64):
            scale = float(jnp.max(jnp.abs(b))) + 1e-300
            rels.append(float(jnp.max(jnp.abs(
                jnp.asarray(a, jnp.float64) - b))) / scale)
        return rels

    def test_ratio_5(self):
        r_mi, r_beff = self._grads(5.0)
        assert r_mi < 2e-4 and r_beff < 2e-4, (r_mi, r_beff)

    def test_ratio_10(self):
        # unchunked reconstruction would amplify rounding ~e^10 ≈ 2e4
        # (≳0.1 relative); checkpointing keeps the f32 noise floor
        r_mi, r_beff = self._grads(10.0)
        assert r_mi < 2e-4 and r_beff < 2e-4, (r_mi, r_beff)

    def test_rfgr_ratio_5(self):
        nM, nT, dt = 48, 2048, 4e-6
        ratio = 5.0
        T2v = nT * dt / ratio
        rng = np.random.default_rng(13)
        M0 = rng.random((1, nM, 3)) - 0.2
        loc = rng.random((1, nM, 3)) * 2 - 1
        rf = rng.random((1, 2, nT)) * 0.1
        gr = rng.normal(size=(1, 3, nT))
        T1, T2 = np.asarray([[1.5 * T2v]]), np.asarray([[T2v]])
        W = rng.normal(size=(1, nM, 3))

        def mk(dtype, engine):
            c = lambda x: jnp.asarray(x, dtype)  # noqa: E731
            def f(rf_, gr_):
                return jnp.sum(c(W) * engine(
                    c(M0), rf_, gr_, c(loc), T1=c(T1), T2=c(T2), dt=dt))
            return jax.grad(f, argnums=(0, 1))

        g32 = mk(jnp.float32, lambda *a, **k: sims.blochsim_rfgr(
            *a, backend='xla', **k))(jnp.asarray(rf, jnp.float32),
                                     jnp.asarray(gr, jnp.float32))

        def oracle(M0_, rf_, gr_, loc_, T1, T2, dt):
            beff = beffective.rfgr2beff(rf_, gr_, loc_)
            return slowsims.blochsim(M0_, beff, T1=T1, T2=T2, dt=dt)
        g64 = mk(jnp.float64, oracle)(jnp.asarray(rf), jnp.asarray(gr))
        for a, b in zip(g32, g64):
            scale = float(jnp.max(jnp.abs(b))) + 1e-300
            rel = float(jnp.max(jnp.abs(
                jnp.asarray(a, jnp.float64) - b))) / scale
            assert rel < 2e-4, rel
