r"""Local-SAR (VOP) machinery: Hermitian-form correctness vs complex
arithmetic, compressor domination guarantee, and the design-loop soft
constraint actually binding."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu.utils.sar import sar_vops, vop_compress


def _random_psd_hermitian(rng, n, nc):
    r"""(n, nc, nc) complex Hermitian PSD, random ranks/scales."""
    A = rng.normal(size=(n, nc, nc)) + 1j * rng.normal(size=(n, nc, nc))
    Q = np.einsum('nij,nkj->nik', A, A.conj())        # A A^H ⪰ 0
    return Q * rng.uniform(0.1, 1.0, size=(n, 1, 1))


class TestSarVops:

    def test_matches_complex_arithmetic(self):
        r"""sar_vops (real split) == mean_t z^H Q z (complex numpy)."""
        rng = np.random.default_rng(0)
        N, nT, nC, nV = 2, 16, 4, 3
        rf = rng.normal(size=(N, 2, nT, nC))
        Q = _random_psd_hermitian(rng, nV, nC)
        Qr, Qi = np.real(Q), np.imag(Q)

        z = rf[:, 0] + 1j * rf[:, 1]                    # (N, nT, nC)
        want = np.einsum('ntc,vcd,ntd->nv', z.conj(), Q, z).real / nT
        got = sar_vops(jnp.asarray(rf), jnp.asarray(Qr), jnp.asarray(Qi))
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert bool(jnp.all(got >= 0))                  # PSD forms

    def test_missing_coil_dim_and_real_q(self):
        r"""(N, xy, nT) rf = one coil; Qi omitted = real VOPs."""
        rng = np.random.default_rng(1)
        rf = rng.normal(size=(1, 2, 8))
        Qr = np.asarray([[[2.0]], [[0.5]]])             # (2, 1, 1)
        got = sar_vops(jnp.asarray(rf), jnp.asarray(Qr))
        pow_ = np.mean(rf[:, 0] ** 2 + rf[:, 1] ** 2, axis=-1)
        np.testing.assert_allclose(got[:, 0], 2.0 * pow_, rtol=1e-12)
        np.testing.assert_allclose(got[:, 1], 0.5 * pow_, rtol=1e-12)


class TestVopCompress:

    def _assert_dominates(self, Q, Qr, Qi, rng, trials=200):
        r"""max over VOPs of z^H V z must upper-bound EVERY position's
        z^H Q_j z (the compressor folds its eps margin into V)."""
        nC = Q.shape[-1]
        z = rng.normal(size=(trials, nC)) + 1j * rng.normal(
            size=(trials, nC))
        V = Qr + 1j * Qi
        s_pos = np.einsum('tc,jcd,td->tj', z.conj(), Q, z).real
        s_vop = np.einsum('tc,vcd,td->tv', z.conj(), V, z).real
        assert np.all(s_vop.max(axis=1) >= s_pos.max(axis=1) - 1e-9)

    def test_dominates_every_position(self):
        rng = np.random.default_rng(2)
        Q = _random_psd_hermitian(rng, 40, 4)
        Qr, Qi, idx = vop_compress(Q, eps=0.1)
        assert 0 < len(idx) < 40                        # it compressed
        assert Qr.shape == (len(idx), 4, 4)
        self._assert_dominates(Q, Qr, Qi, rng)

    def test_cap_keeps_guarantee(self):
        r"""max_iter caps the VOP count by merging, which loosens the
        bound but must keep the domination guarantee."""
        rng = np.random.default_rng(3)
        Q = _random_psd_hermitian(rng, 30, 3)
        Qr, Qi, idx = vop_compress(Q, eps=0.02, max_iter=2)
        assert Qr.shape[0] == 2
        self._assert_dominates(Q, Qr, Qi, rng)

    def test_tighter_eps_more_vops(self):
        rng = np.random.default_rng(4)
        Q = _random_psd_hermitian(rng, 40, 4)
        n_loose = vop_compress(Q, eps=0.5)[0].shape[0]
        n_tight = vop_compress(Q, eps=0.01)[0].shape[0]
        assert n_tight >= n_loose


class TestDesignSar:

    def test_sar_penalty_binds(self):
        r"""pTx design under a local-SAR budget: the unconstrained
        design violates the per-VOP limit; re-running with lam_sar
        brings every VOP under it while the excitation still fits."""
        import dataclasses
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        nC, nT = 4, 64
        cube = mobjs.Examples.spincube()
        rng = np.random.default_rng(5)
        rf = jnp.asarray(0.01 * rng.normal(size=(1, 2, nT, nC)),
                         jnp.float32)
        gr = jnp.asarray(0.1 * rng.normal(size=(1, 3, nT)), jnp.float32)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)
        b1_ = jnp.asarray(0.5 + 0.5 * rng.random((1, cube.nM, 2, nC)),
                          jnp.float32)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.], jnp.float32),
                         (1, cube.nM, 1))
        Q = _random_psd_hermitian(rng, 12, nC)
        Qr, Qi, _ = vop_compress(Q, eps=0.05)
        Qr = jnp.asarray(Qr, jnp.float32)
        Qi = jnp.asarray(Qi, jnp.float32)

        cfg0 = DesignConfig(niter=30, lr=0.05, rfmax=0.25, smax=12e3,
                            dt=float(dt0))
        p0, l0 = design_pulse(cube, p, Mtgt_, b1Map_=b1_, cfg=cfg0)
        sar0 = float(jnp.max(sar_vops(p0.rf, Qr, Qi)))
        assert sar0 > 0

        limit = 0.25 * sar0                # budget the free design busts
        cfg1 = dataclasses.replace(cfg0, lam_sar=50.0 / limit ** 2,
                                   sar_limit=limit)
        p1, l1 = design_pulse(cube, p, Mtgt_, b1Map_=b1_,
                              sarQ_=(Qr, Qi), cfg=cfg1)
        sar1 = float(jnp.max(sar_vops(p1.rf, Qr, Qi)))
        assert sar1 <= limit * 1.10        # soft constraint binds
        assert bool(jnp.all(jnp.isfinite(l1)))
        assert float(l1[-1]) < float(l1[0])

    def test_sarq_single_matrix_form(self):
        r"""sarQ_ as a bare Qr array (real VOPs, no tuple) works."""
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        nC, nT = 2, 32
        cube = mobjs.Examples.spincube()
        rng = np.random.default_rng(6)
        rf = jnp.asarray(0.01 * rng.normal(size=(1, 2, nT, nC)),
                         jnp.float32)
        gr = jnp.asarray(0.1 * rng.normal(size=(1, 3, nT)), jnp.float32)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., 1.], jnp.float32),
                         (1, cube.nM, 1))
        Qr = jnp.asarray(np.stack([np.eye(nC)]), jnp.float32)
        cfg = DesignConfig(niter=5, lr=0.05, rfmax=0.25, smax=12e3,
                           dt=float(dt0), lam_sar=1.0, sar_limit=1e-6)
        p1, losses = design_pulse(cube, p, Mtgt_, sarQ_=Qr, cfg=cfg)
        assert bool(jnp.all(jnp.isfinite(losses)))
