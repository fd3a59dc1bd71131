r"""k-space signal encoding tests.

Oracle tiers (the suite-wide strategy, SURVEY §4):
- the closed-form :func:`mrphy_tpu.ops.signal.signal` vs the Bloch
  simulator stepped through the readout (independent machinery: Rodrigues
  rotations + relaxation vs one MXU phase matmul);
- exact adjointness: dot-product identity and the ``jax.vjp`` oracle;
- chunking/padding invariance;
- mesh sharding parity on the 8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, pi
from mrphy_tpu.ops import signal as sig
from mrphy_tpu.ops import slowsims
from mrphy_tpu.utils import g2k
from mrphy_tpu.parallel import make_mesh
from mrphy_tpu.parallel.mesh import (signal_sharded_traceable,
                                     signal_adjoint_sharded_traceable)

DT = 4e-5  # long-ish dwell so 24 steps accrue O(1) rad of phase


def _problem(rng, N=1, nM=12, nT=24, nC=2, dtype=jnp.float64):
    loc_ = jnp.asarray(rng.uniform(-2, 2, (N, nM, 3)), dtype)
    M = jnp.asarray(rng.standard_normal((N, nM, 3)), dtype)
    gr = jnp.asarray(rng.uniform(-2, 2, (N, 3, nT)), dtype)
    k = g2k(gr, False, dt=DT, gam=gamH)
    df = jnp.asarray(rng.uniform(-200, 200, (N, nM)), dtype)
    T2s = jnp.asarray(rng.uniform(5e-4, 5e-3, (N, nM)), dtype)
    sens = jnp.asarray(rng.standard_normal((N, nM, 2, nC)), dtype)
    return M, loc_, gr, k, df, T2s, sens


def _bloch_signal(M, loc_, gr, df, T2s, sens):
    r"""Independent oracle: step the isochromats with the Bloch simulator
    (z-gradient + off-resonance as Bz, T2* as T2) and coil-combine the
    transverse magnetization after every step."""
    N, nM, _ = M.shape
    E2 = jnp.exp(-DT / T2s)
    gam2pidt = jnp.asarray(2 * pi * gamH * DT)

    def step(m, g_t):
        bz = jnp.einsum('nmx,nx->nm', loc_, g_t) + df / gamH
        b = jnp.concatenate([jnp.zeros((N, nM, 2), m.dtype), bz[..., None]],
                            -1)
        m, _ = slowsims.blochsim_1step(m, m, b, 1.0, 0.0, E2, gam2pidt)
        return m, m[..., :2]

    _, mxy = jax.lax.scan(step, M, jnp.moveaxis(gr, -1, 0))  # (nT, N, nM, 2)
    wr = sens[..., 0, :]  # (N, nM, nC)
    wi = sens[..., 1, :]
    mr, mi = mxy[..., 0], mxy[..., 1]
    sr = jnp.einsum('mnc,tnm->nct', wr.transpose(1, 0, 2), mr) \
        - jnp.einsum('mnc,tnm->nct', wi.transpose(1, 0, 2), mi)
    si = jnp.einsum('mnc,tnm->nct', wr.transpose(1, 0, 2), mi) \
        + jnp.einsum('mnc,tnm->nct', wi.transpose(1, 0, 2), mr)
    return jnp.stack([sr, si], -1)  # (N, nC, nT, 2)


class TestSignalOracle:

    def test_matches_bloch_simulation(self):
        rng = np.random.default_rng(0)
        M, loc_, gr, k, df, T2s, sens = _problem(rng)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        s_or = _bloch_signal(M, loc_, gr, df, T2s, sens)
        np.testing.assert_allclose(s, s_or, atol=1e-12)

    def test_defaults_uniform_coil_no_decay(self):
        rng = np.random.default_rng(1)
        M, loc_, gr, k, df, T2s, _ = _problem(rng, nC=1)
        s = sig.signal(M, loc_, k, dt=DT)
        assert s.shape == (1, 1, gr.shape[-1], 2)
        # no df/T2s: pure k-space phase of each spin, summed
        psi = -2 * np.pi * np.einsum('nmx,nxt->nmt', loc_, k)
        mx, my = np.asarray(M[..., 0]), np.asarray(M[..., 1])
        sr = (mx[..., None] * np.cos(psi) - my[..., None] * np.sin(psi)
              ).sum(1)
        si = (mx[..., None] * np.sin(psi) + my[..., None] * np.cos(psi)
              ).sum(1)
        np.testing.assert_allclose(s[:, 0, :, 0], sr, atol=1e-12)
        np.testing.assert_allclose(s[:, 0, :, 1], si, atol=1e-12)

    def test_batched(self):
        rng = np.random.default_rng(2)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, N=3)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        for n in range(3):
            s1 = sig.signal(M[n:n + 1], loc_[n:n + 1], k[n:n + 1],
                            sens=sens[n:n + 1], df=df[n:n + 1],
                            T2s=T2s[n:n + 1], dt=DT)
            np.testing.assert_allclose(s[n:n + 1], s1, atol=1e-13)

    def test_broadcast_leading_one(self):
        rng = np.random.default_rng(3)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, N=2)
        s = sig.signal(M, loc_[:1], k[:1], sens=sens[:1], df=df[:1],
                       T2s=T2s[:1], dt=DT)
        s0 = sig.signal(M[0:1], loc_[:1], k[:1], sens=sens[:1], df=df[:1],
                        T2s=T2s[:1], dt=DT)
        np.testing.assert_allclose(s[0:1], s0, atol=1e-13)

    def test_chunking_invariant(self):
        rng = np.random.default_rng(4)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=13)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        for chunk in (1, 5, 13, 64):  # incl. non-dividing and > nM
            sc = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                            chunk=chunk)
            np.testing.assert_allclose(sc, s, atol=1e-13)

    def test_jit_and_grad(self):
        rng = np.random.default_rng(5)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, dtype=jnp.float32)

        @jax.jit
        def loss(M):
            return jnp.sum(sig.signal(M, loc_, k, sens=sens, df=df,
                                      T2s=T2s, dt=DT) ** 2)

        g = jax.grad(loss)(M)
        assert np.isfinite(g).all() and np.abs(g).max() > 0
        np.testing.assert_allclose(g[..., 2], 0, atol=0)  # Mz: no signal


class TestSignalAdjoint:

    def test_dot_product_identity(self):
        rng = np.random.default_rng(6)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, N=2, nC=3)
        s_ct = jnp.asarray(rng.standard_normal((2, 3, gr.shape[-1], 2)))
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        m_hat = sig.signal_adjoint(s_ct, loc_, k, sens=sens, df=df,
                                   T2s=T2s, dt=DT)
        lhs = jnp.sum(s * s_ct)
        rhs = jnp.sum(M[..., :2] * m_hat)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    def test_matches_vjp(self):
        rng = np.random.default_rng(7)
        M, loc_, gr, k, df, T2s, sens = _problem(rng)
        s_ct = jnp.asarray(rng.standard_normal(
            (1, sens.shape[-1], gr.shape[-1], 2)))
        _, vjp = jax.vjp(lambda m: sig.signal(
            m, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT), M)
        gM, = vjp(s_ct)
        m_hat = sig.signal_adjoint(s_ct, loc_, k, sens=sens, df=df,
                                   T2s=T2s, dt=DT)
        np.testing.assert_allclose(m_hat, gM[..., :2], atol=1e-12)

    def test_chunking_invariant(self):
        rng = np.random.default_rng(8)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=13)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        m0 = sig.signal_adjoint(s, loc_, k, sens=sens, df=df, T2s=T2s,
                                dt=DT)
        for chunk in (1, 5, 64):
            mc = sig.signal_adjoint(s, loc_, k, sens=sens, df=df,
                                    T2s=T2s, dt=DT, chunk=chunk)
            np.testing.assert_allclose(mc, m0, atol=1e-13)


class TestSignalPallas:
    r"""Fused-kernel path (`ops/signal_pallas.py`) vs the XLA path, in
    interpret mode on CPU; the compiled path is exercised on-chip by
    `benchmarks/tpu_checks.py`."""

    def _tol(self, s):
        # both paths are f32; phase roundoff scales with signal size
        return 2e-5 * float(np.abs(np.asarray(s)).max()) + 1e-6

    def test_sincos_m2pi_sweep(self):
        # the cycles-domain fast sincos must hold f32 accuracy over the
        # whole physical phase range (k.x reaches ~N/2 cycles; df.t a
        # few hundred) — reduction is exact arithmetic on half-integers
        from mrphy_tpu.ops.signal_pallas import _sincos_m2pi
        rng = np.random.default_rng(3)
        phi = np.concatenate([
            rng.uniform(-1000.0, 1000.0, 1 << 16),
            np.linspace(-0.5, 0.5, 4097),          # ties at +-0.25
            np.asarray([0.0, 0.25, -0.25, 0.5, 511.75, -511.75])])
        phi32 = jnp.asarray(phi, jnp.float32)
        s, c = _sincos_m2pi(phi32)
        ref = np.exp(-2j * np.pi * np.asarray(phi32, np.float64))
        err = max(float(np.abs(np.asarray(s) - ref.imag).max()),
                  float(np.abs(np.asarray(c) - ref.real).max()))
        assert err < 4e-7, err

    def test_fwd_matches_xla(self):
        rng = np.random.default_rng(20)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=137, nT=97,
                                                 nC=3,
                                                 dtype=jnp.float32)
        s0 = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                       backend='pallas', _pallas_interpret=True)
        np.testing.assert_allclose(s, s0, atol=self._tol(s0))

    def test_fwd_defaults_and_batched(self):
        rng = np.random.default_rng(21)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, N=2, nM=64,
                                                 nT=130,
                                                 dtype=jnp.float32)
        for kw in ({}, {'df': df}, {'T2s': T2s}, {'sens': sens},
                   {'sens': sens, 'df': df, 'T2s': T2s}):
            s0 = sig.signal(M, loc_, k, dt=DT, **kw)
            s = sig.signal(M, loc_, k, dt=DT, backend='pallas',
                           _pallas_interpret=True, **kw)
            np.testing.assert_allclose(s, s0, atol=self._tol(s0),
                                       err_msg=str(kw.keys()))

    def test_adjoint_matches_xla(self):
        rng = np.random.default_rng(22)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=137, nT=97,
                                                 nC=3,
                                                 dtype=jnp.float32)
        s_ct = jnp.asarray(rng.standard_normal((1, 3, 97, 2)),
                           jnp.float32)
        m0 = sig.signal_adjoint(s_ct, loc_, k, sens=sens, df=df,
                                T2s=T2s, dt=DT)
        m = sig.signal_adjoint(s_ct, loc_, k, sens=sens, df=df,
                               T2s=T2s, dt=DT, backend='pallas',
                               _pallas_interpret=True)
        np.testing.assert_allclose(m, m0, atol=self._tol(m0))

    def test_mgrad_matches_xla(self):
        rng = np.random.default_rng(23)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=72, nT=64,
                                                 dtype=jnp.float32)

        def loss(backend):
            return lambda M: jnp.sum(sig.signal(
                M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                backend=backend,
                _pallas_interpret=(backend == 'pallas')) ** 2)

        g0 = jax.grad(loss('xla'))(M)
        g = jax.jit(jax.grad(loss('pallas')))(M)
        np.testing.assert_allclose(g, g0, atol=self._tol(g0))
        np.testing.assert_allclose(g[..., 2], 0, atol=0)

    def test_field_grads_match_xla(self):
        # round 3: the fused backend is FULLY differentiable — one
        # fused VJP kernel emits the loc/ktraj/sens/df/T2s cotangents
        # alongside the exact M adjoint (was a zero-grad contract)
        rng = np.random.default_rng(24)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=72, nT=64,
                                                 nC=3,
                                                 dtype=jnp.float32)

        def loss(backend):
            def f(loc_, k, sens, df, T2s):
                return jnp.sum(sig.signal(
                    M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                    backend=backend,
                    _pallas_interpret=(backend == 'pallas')) ** 2)
            return f

        args = (loc_, k, sens, df, T2s)
        g0 = jax.grad(loss('xla'), argnums=tuple(range(5)))(*args)
        g = jax.jit(jax.grad(loss('pallas'),
                             argnums=tuple(range(5))))(*args)
        for name, x, p in zip(('loc', 'ktraj', 'sens', 'df', 'T2s'),
                              g0, g):
            rel = float(jnp.max(jnp.abs(jnp.asarray(x)
                                        - jnp.asarray(p)))
                        / (jnp.max(jnp.abs(jnp.asarray(x))) + 1e-30))
            assert rel < 2e-4, (name, rel)   # f32 phase roundoff

    def test_field_grads_defaults(self):
        # optional-arg combos: df-only, T2s-only, no-sens
        rng = np.random.default_rng(25)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=40, nT=64,
                                                 dtype=jnp.float32)
        for kw in ({'df': df}, {'T2s': T2s}, {'df': df, 'T2s': T2s}):
            def loss(backend):
                return lambda lo: jnp.sum(sig.signal(
                    M, lo, k, dt=DT, backend=backend,
                    _pallas_interpret=(backend == 'pallas'),
                    **kw) ** 2)
            g0 = jax.grad(loss('xla'))(loc_)
            g = jax.grad(loss('pallas'))(loc_)
            rel = float(jnp.max(jnp.abs(g - g0))
                        / (jnp.max(jnp.abs(g0)) + 1e-30))
            assert rel < 2e-4, (sorted(kw), rel)


class TestSignalSharded:

    def test_signal_mesh_parity(self):
        mesh = make_mesh()  # 1 x 8
        rng = np.random.default_rng(9)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=16)
        s0 = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                       mesh=mesh)
        np.testing.assert_allclose(s, s0, atol=1e-12)
        # traceable inside an outer jit
        s_j = jax.jit(lambda M: signal_sharded_traceable(
            mesh, M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT))(M)
        np.testing.assert_allclose(s_j, s0, atol=1e-12)

    def test_adjoint_mesh_parity(self):
        mesh = make_mesh(batch=2)  # 2 x 4
        rng = np.random.default_rng(10)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, N=2, nM=16)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        m0 = sig.signal_adjoint(s, loc_, k, sens=sens, df=df, T2s=T2s,
                                dt=DT)
        m = sig.signal_adjoint(s, loc_, k, sens=sens, df=df, T2s=T2s,
                               dt=DT, mesh=mesh)
        np.testing.assert_allclose(m, m0, atol=1e-12)
        m_j = jax.jit(lambda s: signal_adjoint_sharded_traceable(
            mesh, s, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT))(s)
        np.testing.assert_allclose(m_j, m0, atol=1e-12)

    def test_mesh_plus_pallas_interpret_parity(self):
        r"""The shard_map + fused-kernel composition (the real multi-chip
        fast path) against the plain XLA result, on the CPU mesh in
        interpret mode."""
        mesh = make_mesh()  # 1 x 8
        rng = np.random.default_rng(12)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=64,
                                                 dtype=jnp.float32)
        s0 = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)
        s = sig.signal(M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT,
                       mesh=mesh, backend='pallas',
                       _pallas_interpret=True)
        tol = 2e-5 * float(np.abs(np.asarray(s0)).max()) + 1e-6
        np.testing.assert_allclose(s, s0, atol=tol)
        m0 = sig.signal_adjoint(s0, loc_, k, sens=sens, df=df, T2s=T2s,
                                dt=DT)
        m = sig.signal_adjoint(s0, loc_, k, sens=sens, df=df, T2s=T2s,
                               dt=DT, mesh=mesh, backend='pallas',
                               _pallas_interpret=True)
        tolm = 2e-5 * float(np.abs(np.asarray(m0)).max()) + 1e-6
        np.testing.assert_allclose(m, m0, atol=tolm)

    def test_grad_through_sharded_signal(self):
        mesh = make_mesh()
        rng = np.random.default_rng(11)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=16)

        def loss(fn):
            return lambda M: jnp.sum(fn(M) ** 2)

        g0 = jax.grad(loss(lambda M: sig.signal(
            M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)))(M)
        g = jax.grad(loss(lambda M: signal_sharded_traceable(
            mesh, M, loc_, k, sens=sens, df=df, T2s=T2s, dt=DT)))(M)
        np.testing.assert_allclose(g, g0, atol=1e-12)


class TestShardedPallasFieldGrads:
    r"""Round 3: the loc/ktraj cotangents of the fused VJP must survive
    the shard_map composition — spin-sharded dloc stays local, the
    replicated trajectory's dk psums over the spin shards."""

    def test_loc_and_k_grads_match_unsharded(self):
        mesh = make_mesh()  # 1 x 8
        rng = np.random.default_rng(13)
        M, loc_, gr, k, df, T2s, sens = _problem(rng, nM=64,
                                                 dtype=jnp.float32)

        def loss(lo, kk, mesh_=None):
            return jnp.sum(sig.signal(
                M, lo, kk, sens=sens, df=df, T2s=T2s, dt=DT,
                mesh=mesh_, backend='pallas',
                _pallas_interpret=True) ** 2)

        g0 = jax.grad(loss, argnums=(0, 1))(loc_, k)
        gl = jax.grad(lambda lo: loss(lo, k, mesh))(loc_)
        gk = jax.grad(lambda kk: loss(loc_, kk, mesh))(k)
        for name, a, b in (('loc', g0[0], gl), ('k', g0[1], gk)):
            rel = float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(a)) + 1e-30))
            assert rel < 1e-5, (name, rel)
