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
        # the Pallas path's custom VJP recomputes through the XLA core:
        # same primals in => gradients equal up to the fwd cotangent diff
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
