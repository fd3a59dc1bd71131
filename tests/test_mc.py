r"""Bloch–McConnell two-pool exchange simulator tests.

Validation oracle: the exact propagator of the full 6-dim linear BM
system (augmented 7×7 matrix exponential) for piecewise-constant fields.
"""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH
from mrphy_tpu.ops import slowsims

F64 = jnp.float64


def _bm_exact(Ma, Mb, bvec, T, pars):
    r"""Exact constant-field BM solution via augmented expm (scipy)."""
    from scipy.linalg import expm
    T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dfb = pars
    w = 2 * np.pi * gamH * np.asarray(bvec)      # rad/s, pool a
    wb = w + np.asarray([0., 0., 2 * np.pi * dfb])

    def bloch_block(wv, R1, R2):
        # dM/dt = M × γB − R·(M − Meq): cross-product matrix + relax
        return np.array([[-R2, wv[2], -wv[1]],
                         [-wv[2], -R2, wv[0]],
                         [wv[1], -wv[0], -R1]])

    G = np.zeros((7, 7))
    G[:3, :3] = bloch_block(w, 1 / T1a, 1 / T2a) - kab * np.eye(3)
    G[3:6, 3:6] = bloch_block(wb, 1 / T1b, 1 / T2b) - kba * np.eye(3)
    G[:3, 3:6] = kba * np.eye(3)
    G[3:6, :3] = kab * np.eye(3)
    G[2, 6] = Ma0 / T1a
    G[5, 6] = Mb0 / T1b
    z = np.concatenate([np.asarray(Ma), np.asarray(Mb), [1.0]])
    return expm(G * T) @ z


class TestBlochMcConnell:
    PARS = (1.0, 0.06, 0.25, 0.008, 3.0, 15.0, 1.0, 0.2, 150.0)
    #        T1a  T2a  T1b   T2b   kab  kba  Ma0  Mb0   dfb

    def _sim(self, Ma, Mb, bvec, T, nT, pars):
        T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dfb = pars
        beff = jnp.broadcast_to(jnp.asarray(bvec, F64), (1, 1, nT, 3))
        return slowsims.blochsim_mc(
            jnp.asarray(Ma, F64).reshape(1, 1, 3),
            jnp.asarray(Mb, F64).reshape(1, 1, 3), beff,
            T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab, kba=kba,
            Ma0=Ma0, Mb0=Mb0, dfb=dfb, gam=gamH, dt=T / nT)

    def test_zero_exchange_reduces_to_independent_pools(self):
        rng = np.random.default_rng(0)
        nT = 64
        Ma = rng.random(3) - 0.5
        Mb = rng.random(3) - 0.5
        bvec = [0.02, -0.01, 0.5]
        T = nT * 4e-6
        pars = (1.0, 0.06, 0.25, 0.008, 0.0, 0.0, 1.0, 1.0, 0.0)
        Mao, Mbo = self._sim(Ma, Mb, bvec, T, nT, pars)

        beff = jnp.broadcast_to(jnp.asarray(bvec, F64), (1, 1, nT, 3))
        ra = slowsims.blochsim(jnp.asarray(Ma, F64).reshape(1, 1, 3),
                               beff, T1=jnp.asarray([[1.0]], F64),
                               T2=jnp.asarray([[0.06]], F64),
                               gam=jnp.asarray(gamH, F64),
                               dt=jnp.asarray(T / nT, F64))
        rb = slowsims.blochsim(jnp.asarray(Mb, F64).reshape(1, 1, 3),
                               beff, T1=jnp.asarray([[0.25]], F64),
                               T2=jnp.asarray([[0.008]], F64),
                               gam=jnp.asarray(gamH, F64),
                               dt=jnp.asarray(T / nT, F64))
        np.testing.assert_allclose(Mao, ra, atol=1e-12)
        np.testing.assert_allclose(Mbo, rb, atol=1e-12)

    def test_equilibrium_is_fixed_point(self):
        pars = self.PARS
        # detailed-balance equilibrium requires kab*Ma0 == kba*Mb0;
        # adjust kba accordingly so [0,0,Ma0],[0,0,Mb0] is stationary
        pars = pars[:5] + (pars[4] * pars[6] / pars[7],) + pars[6:]
        Ma = [0., 0., pars[6]]
        Mb = [0., 0., pars[7]]
        Mao, Mbo = self._sim(Ma, Mb, [0., 0., 0.], 0.05, 200, pars)
        np.testing.assert_allclose(np.asarray(Mao)[0, 0], Ma, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Mbo)[0, 0], Mb, atol=1e-10)

    def test_converges_to_exact_bm_solution(self):
        r"""Constant field: splitting error vanishes as dt → 0 (first
        order), converging on the exact augmented-expm solution."""
        pars = self.PARS
        Ma = [0.3, -0.2, 0.8]
        Mb = [0.05, 0.02, 0.15]
        bvec = [0.03, 0.0, 0.02]
        T = 0.005
        want = _bm_exact(Ma, Mb, bvec, T, pars)

        def err(nT):
            Mao, Mbo = self._sim(Ma, Mb, bvec, T, nT, pars)
            got = np.concatenate([np.asarray(Mao)[0, 0],
                                  np.asarray(Mbo)[0, 0]])
            return np.abs(got - want[:6]).max()

        e1, e2 = err(250), err(1000)
        assert e1 < 2e-4, e1
        assert e2 < e1 / 2.5, (e1, e2)   # ~first-order in dt

    def test_mt_saturation_transfers_to_free_pool(self):
        r"""Off-resonant RF at the bound pool's shift saturates pool b;
        exchange drags pool a's Mz down — the MT effect. Without
        exchange, pool a is barely touched."""
        T = 0.2
        nT = 2000
        b1 = 0.02                      # strong off-resonant saturation
        bvec = [b1, 0., -self.PARS[8] / gamH]  # on-resonance FOR POOL B
        Ma = [0., 0., 1.0]
        Mb = [0., 0., 0.2]
        Mao, _ = self._sim(Ma, Mb, bvec, T, nT, self.PARS)
        pars0 = self.PARS[:4] + (0.0, 0.0) + self.PARS[6:]
        Mao0, _ = self._sim(Ma, Mb, bvec, T, nT, pars0)
        mz_ex = float(np.asarray(Mao)[0, 0, 2])
        mz_no = float(np.asarray(Mao0)[0, 0, 2])
        assert mz_ex < 0.8 * mz_no, (mz_ex, mz_no)

    def test_differentiable_wrt_exchange_rate(self):
        import jax
        pars = self.PARS

        def mz_a(kab):
            T1a, T2a, T1b, T2b, _, kba, Ma0, Mb0, dfb = pars
            beff = jnp.broadcast_to(
                jnp.asarray([0.01, 0., -dfb / gamH], F64), (1, 1, 64, 3))
            Mao, _ = slowsims.blochsim_mc(
                jnp.asarray([[[0., 0., 1.]]], F64),
                jnp.asarray([[[0., 0., 0.2]]], F64), beff,
                T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab, kba=kba,
                Ma0=Ma0, Mb0=Mb0, dfb=dfb, gam=gamH, dt=1e-4)
            return Mao[0, 0, 2]

        g = jax.grad(mz_a)(jnp.asarray(3.0, F64))
        assert np.isfinite(float(g)) and float(g) < 0  # more exchange,
        #                                 more saturation transfer


def test_grads_finite_at_degenerate_params():
    r"""Gradients must stay finite at q2 == 0 inside the 2×2 expm —
    zero exchange with T2a == T2b is a natural fitting init and used to
    NaN (the cosh(sqrt(·)) branch lacked the double-where guard)."""
    import jax

    def mz(kab, T2a):
        beff = jnp.broadcast_to(jnp.asarray([0.01, 0., 0.], F64),
                                (1, 1, 16, 3))
        Mao, _ = slowsims.blochsim_mc(
            jnp.asarray([[[0., 0., 1.]]], F64),
            jnp.asarray([[[0., 0., 0.2]]], F64), beff,
            T1a=1.0, T2a=T2a, T1b=1.0, T2b=0.05, kab=kab, kba=0.0,
            Ma0=1.0, Mb0=0.2, dfb=0.0, gam=gamH, dt=1e-4)
        return Mao[0, 0, 2]

    g = jax.grad(mz, argnums=(0, 1))(jnp.asarray(0.0, F64),
                                     jnp.asarray(0.05, F64))
    assert all(np.isfinite(float(x)) for x in g), g


class TestBlochMcRfgr:
    r"""Fused waveform engine (ops/mc.py) vs the streaming oracle."""
    PARS = dict(T1a=1.2, T2a=0.06, T1b=1.0, T2b=0.01, kab=3.0,
                kba=150.0, Ma0=1.0, Mb0=0.02, dfb=750.0)

    def _mk(self, nS=40, nT=32, nC=2, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(rng.random((1,) + s), F64)  # noqa
        return dict(
            Mia=mk(nS, 3) - 0.5, Mib=(mk(nS, 3) - 0.5) * 0.04,
            loc=mk(nS, 3) * 2 - 1, df=mk(nS)[..., 0:nS] * 100,
            b1=mk(nS, 2, nC), rf=mk(2, nT, nC) * 0.05,
            gr=jnp.asarray(rng.normal(size=(1, 3, nT)), F64))

    def _oracle(self, a, *, df=None, b1=None, dt=4e-6, **over):
        from mrphy_tpu.ops import beffective
        pars = {**self.PARS, **over}
        beff = beffective.rfgr2beff(a['rf'], a['gr'], a['loc'], df=df,
                                    b1Map=b1, gam=gamH)
        return slowsims.blochsim_mc(a['Mia'], a['Mib'], beff,
                                    gam=gamH, dt=dt, **pars)

    def _fused(self, a, *, df=None, b1=None, dt=4e-6, backend='xla',
               interpret=False, **over):
        from mrphy_tpu.ops import mc
        pars = {**self.PARS, **over}
        return mc.blochsim_mc_rfgr(
            a['Mia'], a['Mib'], a['rf'], a['gr'], a['loc'], df=df,
            b1Map=b1, gam=gamH, dt=dt, backend=backend,
            _pallas_interpret=interpret, **pars)

    def test_fwd_matches_streaming_oracle(self):
        a = self._mk()
        for kw in ({}, {'df': a['df']}, {'df': a['df'], 'b1': a['b1']}):
            Mo = self._oracle(a, **kw)
            Mf = self._fused(a, **kw)
            for o, f in zip(Mo, Mf):
                assert float(jnp.max(jnp.abs(o - f))) < 1e-12

    def test_fwd_chunked_remat_path(self):
        # nT=512 > _XLA_TC engages the chunk-rematerialized scan
        a = self._mk(nS=8, nT=512)
        Mo = self._oracle(a, df=a['df'])
        Mf = self._fused(a, df=a['df'])
        for o, f in zip(Mo, Mf):
            assert float(jnp.max(jnp.abs(o - f))) < 1e-11

    def test_pallas_interpret_matches_xla(self):
        a = self._mk()
        Mx = self._fused(a, df=a['df'], b1=a['b1'])
        Mp = self._fused(a, df=a['df'], b1=a['b1'], interpret=True)
        for x, p in zip(Mx, Mp):
            assert float(jnp.max(jnp.abs(x - p))) < 1e-6  # poly sincos

    def test_grads_match_oracle(self):
        import jax
        a = self._mk(nS=12, nT=24, nC=1)

        def loss_o(rf, loc, kab, dfb, T2b):
            from mrphy_tpu.ops import beffective
            b = beffective.rfgr2beff(rf, a['gr'], loc, df=a['df'],
                                     b1Map=a['b1'], gam=gamH)
            Ma, Mb = slowsims.blochsim_mc(
                a['Mia'], a['Mib'], b, gam=gamH, dt=4e-6,
                **{**self.PARS, 'kab': kab, 'dfb': dfb, 'T2b': T2b})
            return jnp.sum(Ma ** 2) + jnp.sum(Mb ** 2)

        def loss_f(rf, loc, kab, dfb, T2b):
            from mrphy_tpu.ops import mc
            Ma, Mb = mc.blochsim_mc_rfgr(
                a['Mia'], a['Mib'], rf, a['gr'], loc, df=a['df'],
                b1Map=a['b1'], gam=gamH, dt=4e-6, backend='xla',
                **{**self.PARS, 'kab': kab, 'dfb': dfb, 'T2b': T2b})
            return jnp.sum(Ma ** 2) + jnp.sum(Mb ** 2)

        args = (a['rf'], a['loc'], jnp.asarray(3.0, F64),
                jnp.asarray(750.0, F64), jnp.asarray(0.01, F64))
        go = jax.grad(loss_o, argnums=tuple(range(5)))(*args)
        gf = jax.grad(loss_f, argnums=tuple(range(5)))(*args)
        for name, o, f in zip(('rf', 'loc', 'kab', 'dfb', 'T2b'), go, gf):
            rel = float(jnp.max(jnp.abs(o - f))
                        / (jnp.max(jnp.abs(o)) + 1e-30))
            assert rel < 1e-9, (name, rel)

    def test_pallas_vjp_is_xla_grad(self):
        # the Pallas path's fused adjoint kernel vs the XLA backend's
        # autodiff: same math up to the polynomial-vs-exact sincos
        import jax
        a = self._mk(nS=12, nT=24, nC=1)

        def loss(rf, interpret):
            from mrphy_tpu.ops import mc
            Ma, Mb = mc.blochsim_mc_rfgr(
                a['Mia'], a['Mib'], rf, a['gr'], a['loc'], df=a['df'],
                gam=gamH, dt=4e-6,
                backend='xla' if not interpret else 'auto',
                _pallas_interpret=interpret, **self.PARS)
            return jnp.sum(Ma ** 2)

        gx = jax.grad(lambda rf: loss(rf, False))(a['rf'])
        gp = jax.grad(lambda rf: loss(rf, True))(a['rf'])
        rel = float(jnp.max(jnp.abs(gx - gp))
                    / (jnp.max(jnp.abs(gx)) + 1e-30))
        assert rel < 1e-5, rel

    def test_zero_exchange_reduces_to_single_pool(self):
        from mrphy_tpu.ops import sims
        a = self._mk()
        Ma, _ = self._fused(a, df=a['df'], kab=0.0, kba=0.0, Ma0=1.0)
        Ms = sims.blochsim_rfgr(a['Mia'], a['rf'], a['gr'], a['loc'],
                                T1=self.PARS['T1a'], T2=self.PARS['T2a'],
                                df=a['df'], gam=gamH, dt=4e-6,
                                backend='xla')
        assert float(jnp.max(jnp.abs(Ma - Ms))) < 1e-12


class TestFusedMcAdjoint:
    r"""The hand-derived two-phase chunk adjoint (``mc_pallas.
    mc_bwd_planes``) vs the autodiff oracle of the EXACT kernel math —
    an in-test planes-level forward using the same ``_fast_sincos``
    rotation as the kernel, so parity isolates the adjoint derivation
    (1e-9/f64), not the sincos implementation."""

    def _args(self, nC=1, has_dfg=True, has_b1=True, nT=24, seed=3):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        N, S1, L = 1, 8, 128
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), F64)  # noqa
        mi6 = mk(N, 6, S1, L) * 0.5
        rf_t = mk(nT, N, 2, nC) * 0.05
        gr_t = mk(nT, N, 3)
        g2pd = jnp.full((N, S1, L), 2 * np.pi * gamH * 4e-6, F64)
        loc_p = g2pd[:, None] * mk(N, 3, S1, L)
        dfg = (mk(N, S1, L) * 100 * 2 * np.pi * 4e-6) if has_dfg else None
        b1_p = (g2pd[:, None, None] * (mk(N, 2, nC, S1, L) * .3 + .5)
                if has_b1 else None)
        sb = jnp.full((N, S1, L), 750.0 * 2 * np.pi * 4e-6, F64)
        pr = slowsims.mc_propagators(
            jnp.asarray(1.2, F64), jnp.asarray(0.06, F64),
            jnp.asarray(1.0, F64), jnp.asarray(0.01, F64),
            jnp.asarray(3.0, F64), jnp.asarray(150.0, F64),
            jnp.asarray(1.0, F64), jnp.asarray(0.02, F64),
            jnp.asarray(4e-6, F64))
        ones = jnp.ones((N, S1, L), F64)
        Xp = jnp.stack([p * ones for p in pr[:4]], 1)
        Zp = jnp.stack([p * ones for p in pr[4:]], 1)
        return mi6, rf_t, gr_t, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd

    @staticmethod
    def _fwd_ref(mi6, rf_t, gr_t, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd):
        r"""Planes-level scan forward with the KERNEL's sincos."""
        import jax
        from mrphy_tpu.ops.mc_pallas import _mc_rot
        from mrphy_tpu.ops.sims import _assemble_b
        X00, X01, X10, X11 = (Xp[:, k] for k in range(4))
        Z00, Z01, Z10, Z11, ca, cb = (Zp[:, k] for k in range(6))

        def step(m, xs):
            ma, mb = m
            rf_1, gr_1 = xs
            b = _assemble_b(rf_1, gr_1, loc_p, dfg, b1_p, g2pd)
            a1 = _mc_rot(b[:, 0], b[:, 1], b[:, 2],
                         ma[:, 0], ma[:, 1], ma[:, 2], False)
            b1 = _mc_rot(b[:, 0], b[:, 1], b[:, 2] + sb,
                         mb[:, 0], mb[:, 1], mb[:, 2], False)
            ma2 = jnp.stack([X00 * a1[0] + X01 * b1[0],
                             X00 * a1[1] + X01 * b1[1],
                             Z00 * a1[2] + Z01 * b1[2] + ca], 1)
            mb2 = jnp.stack([X10 * a1[0] + X11 * b1[0],
                             X10 * a1[1] + X11 * b1[1],
                             Z10 * a1[2] + Z11 * b1[2] + cb], 1)
            return (ma2, mb2), None

        (ma, mb), _ = jax.lax.scan(step, (mi6[:, :3], mi6[:, 3:]),
                                   (rf_t, gr_t))
        return jnp.concatenate([ma, mb], 1)

    def _check(self, nC, has_dfg, has_b1, tc):
        import jax
        from mrphy_tpu.ops import mc_pallas
        (mi6, rf_t, gr_t, loc_p, dfg, b1_p, sb, Xp, Zp,
         g2pd) = self._args(nC=nC, has_dfg=has_dfg, has_b1=has_b1)
        nT = rf_t.shape[0]
        N = mi6.shape[0]
        rf2 = rf_t.transpose(1, 2, 3, 0).reshape(N, 2 * nC, nT)
        gr2 = gr_t.transpose(1, 2, 0)
        b1_4 = None if b1_p is None else b1_p.reshape(
            N, 2 * nC, *b1_p.shape[3:])
        out, chk = mc_pallas.mc_fwd_planes(
            mi6, rf2, gr2, loc_p, dfg, b1_4, sb, Xp, Zp, g2pd,
            tc=tc, interpret=True)
        ref = self._fwd_ref(mi6, rf_t, gr_t, loc_p, dfg, b1_p, sb,
                            Xp, Zp, g2pd)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-12

        rng = np.random.default_rng(7)
        g6 = jnp.asarray(rng.standard_normal(out.shape), F64)
        _, vjp = jax.vjp(self._fwd_ref, mi6, rf_t, gr_t, loc_p,
                         dfg, b1_p, sb, Xp, Zp, g2pd)
        (ami6, arf_t, agr_t, aloc, adfg, ab1, asb, aX, aZ,
         ag2pd) = vjp(g6)
        (dmi6, drf2, dgr2, dloc, ddfg, db1g, dsb, dXg, dZg) = \
            mc_pallas.mc_bwd_planes(chk, g6, rf2, gr2, loc_p, dfg,
                                    b1_4, sb, Xp, Zp, g2pd, tc=tc,
                                    interpret=True)
        drf_t = drf2.reshape(N, 2, nC, nT).transpose(3, 0, 1, 2)
        dgr_t = dgr2.transpose(2, 0, 1)
        pairs = [('mi', ami6, dmi6), ('rf', arf_t, drf_t),
                 ('gr', agr_t, dgr_t), ('loc', aloc, dloc),
                 ('sb', asb, dsb), ('X', aX, dXg), ('Z', aZ, dZg)]
        if has_dfg:
            pairs.append(('dfg', adfg, ddfg))
        if has_b1:
            pairs.append(('b1', ab1,
                          db1g.reshape(b1_p.shape)))
        # Tolerance 1e-7, not 1e-9: the oracle autodiffs THROUGH the
        # minimax sincos polynomial (whose derivative differs from the
        # true cos/sin by the poly error ~1e-8), while the hand-derived
        # adjoint applies the exact rotation-adjoint algebra at the poly
        # values. A derivation error would show at 1e-4+; the measured
        # gap is the poly-derivative mismatch (~1e-8).
        for name, a, d in pairs:
            rel = float(jnp.max(jnp.abs(a - d))
                        / (jnp.max(jnp.abs(a)) + 1e-30))
            assert rel < 1e-7, (name, rel)

    def test_full_single_chunk(self):
        self._check(nC=1, has_dfg=True, has_b1=True, tc=24)

    def test_full_multi_chunk(self):
        # tc=8 < nT=24 exercises the chunked checkpoint restarts
        self._check(nC=1, has_dfg=True, has_b1=True, tc=8)

    def test_multicoil(self):
        self._check(nC=2, has_dfg=True, has_b1=True, tc=12)

    def test_no_b1(self):
        self._check(nC=1, has_dfg=True, has_b1=False, tc=8)

    def test_no_dfg_no_b1(self):
        self._check(nC=1, has_dfg=False, has_b1=False, tc=24)
