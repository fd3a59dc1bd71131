r"""Receive-array utility tests: SVD coil compression (commutes with
the acquisition operator exactly), noise whitening (covariance → I,
statistically), and colored-noise synthesis (covariance → Psi)."""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.utils.coils import (add_noise, apply_ccmat,
                                   coil_compress, noise_whiten_mat)
from mrphy_tpu.ops import signal as sig
from mrphy_tpu.utils import g2k

DT = 4e-5


def _cplx(x, pair_axis=-2):
    x = np.moveaxis(np.asarray(x), pair_axis, 0)
    return x[0] + 1j * x[1]


class TestCoilCompress:

    def _lowrank_sens(self, rng, nM, nC, rank):
        base = rng.standard_normal((nM, rank)) \
            + 1j * rng.standard_normal((nM, rank))
        mix = rng.standard_normal((rank, nC)) \
            + 1j * rng.standard_normal((rank, nC))
        z = base @ mix                               # (nM, nC), rank-r
        return np.stack([z.real, z.imag], -2)[None]  # (1, nM, 2, nC)

    def test_lowrank_sens_compress_exactly(self):
        rng = np.random.default_rng(0)
        nM, nC, rank = 64, 8, 3
        sens = self._lowrank_sens(rng, nM, nC, rank)
        W, energy = coil_compress(sens, rank)
        assert energy[:rank].sum() > 1 - 1e-12       # rank-3 exactly
        sens_cc = apply_ccmat(sens, W)               # (1, nM, 2, rank)
        # the compressed maps retain ALL the energy of the originals
        assert np.isclose((np.abs(_cplx(sens_cc)) ** 2).sum(),
                          (np.abs(_cplx(sens)) ** 2).sum())

    def test_compression_commutes_with_acquisition(self):
        rng = np.random.default_rng(1)
        nM, nT, nC, ncc = 48, 40, 6, 4
        sens = jnp.asarray(rng.standard_normal((1, nM, 2, nC)))
        M = jnp.asarray(rng.standard_normal((1, nM, 3)))
        loc_ = jnp.asarray(rng.uniform(-2, 2, (1, nM, 3)))
        gr = jnp.asarray(rng.uniform(-2, 2, (1, 3, nT)))
        k = g2k(gr, False, dt=DT)
        W, _ = coil_compress(np.asarray(sens), ncc)
        kw = dict(df=jnp.asarray(rng.uniform(-50, 50, (1, nM))), dt=DT)
        s_then_cc = apply_ccmat(sig.signal(M, loc_, k, sens=sens, **kw),
                                W, axis=1)
        cc_then_s = sig.signal(M, loc_, k, sens=apply_ccmat(sens, W),
                               **kw)
        np.testing.assert_allclose(s_then_cc, cc_then_s, atol=1e-12)

    def test_apply_ccmat_is_complex_matmul(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((5, 2, 4))
        W = rng.standard_normal((2, 4, 3))
        y = apply_ccmat(x, W)
        yc = _cplx(x) @ _cplx(W, pair_axis=0)
        np.testing.assert_allclose(_cplx(y), yc, atol=1e-12)


class TestNoise:

    def _psi(self, rng, nC):
        A = rng.standard_normal((nC, nC)) + 1j * rng.standard_normal(
            (nC, nC))
        P = A @ A.conj().T + nC * np.eye(nC)
        return np.stack([P.real, P.imag], 0)

    def test_whitening_makes_identity_covariance(self):
        rng = np.random.default_rng(3)
        nC, nS = 4, 200_000
        Psi = self._psi(rng, nC)
        W = noise_whiten_mat(Psi)
        # colored noise via add_noise on a zero "signal"
        z = jnp.zeros((1, nC, nS, 2))
        n = np.asarray(add_noise(jax.random.key(0), z, 1.0, Psi=Psi))
        nc = _cplx(n[0], pair_axis=-1).T             # (nS, nC) complex
        emp = (nc.T @ nc.conj()) / nS
        Pc = Psi[0] + 1j * Psi[1]
        # colored: empirical covariance ~ 2*Psi (unit re+im variance)
        np.testing.assert_allclose(emp, 2 * Pc, atol=0.15 * np.abs(
            Pc).max())
        # whitened: covariance ~ 2*I
        nw = _cplx(np.asarray(apply_ccmat(jnp.asarray(n), W, axis=1))[0],
                   pair_axis=-1).T
        empw = (nw.T @ nw.conj()) / nS
        np.testing.assert_allclose(empw, 2 * np.eye(nC), atol=0.05)

    def test_add_noise_white_and_jittable(self):
        s = jnp.zeros((2, 3, 100, 2))
        out = jax.jit(lambda k: add_noise(k, s, 0.5))(jax.random.key(1))
        assert out.shape == s.shape
        assert np.isclose(np.asarray(out).std(), 0.5, rtol=0.1)


class TestEspiritMaps:
    r"""ESPIRiT calibration: on noisy multi-coil Cartesian data with
    known smooth sensitivities, the per-voxel top eigenvector must
    align with the truth inside the object, the eigenvalue map must be
    ≈1 there and clearly smaller outside, and cropping must zero the
    background. The centered-DFT convention matches ops.signal's
    e^{−i2πk·x} sign (checked by building calib both ways)."""

    def _problem(self, n=48, nc=5, noise=2e-3):
        rng = np.random.default_rng(3)
        y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
        mag = (x ** 2 / 0.5 + y ** 2 / 0.3 < 1).astype(float)
        obj = mag * np.exp(1j * (0.7 * x + 1.3 * y * y))
        S = []
        for c in range(nc):
            a = 2 * np.pi * c / nc
            m = np.exp(-((x - 1.3 * np.cos(a)) ** 2
                         + (y - 1.3 * np.sin(a)) ** 2) / 2.5)
            S.append(m * np.exp(1j * 0.6 * (x * np.sin(a)
                                            - y * np.cos(a)
                                            + 0.3 * x * y)))
        S = np.stack(S)
        imgs = S * obj[None]
        ksp = np.fft.fftshift(np.fft.fftn(
            np.fft.ifftshift(imgs, axes=(1, 2)), axes=(1, 2)),
            axes=(1, 2))
        ksp = ksp + noise * (rng.standard_normal(ksp.shape)
                             + 1j * rng.standard_normal(ksp.shape))
        cs = 24
        sl = (slice(None), slice(n // 2 - cs // 2, n // 2 + cs // 2),
              slice(n // 2 - cs // 2, n // 2 + cs // 2))
        calib = np.stack([ksp[sl].real, ksp[sl].imag], -1)
        return calib, S, mag

    def test_recovers_true_maps_and_eigenvalue_support(self):
        from mrphy_tpu.utils.coils import espirit_maps
        calib, S, mag = self._problem()
        n = S.shape[1]
        maps, lam = espirit_maps(calib, (n, n), kernel=6,
                                 thresh_sv=0.02)
        assert maps.shape == (n, n, 2, S.shape[0])
        ec = maps[..., 0, :] + 1j * maps[..., 1, :]
        tc = np.moveaxis(S, 0, -1)
        lit = mag > 0.5
        align = np.abs((np.conj(ec) * tc).sum(-1)) / (
            np.linalg.norm(ec, axis=-1)
            * np.linalg.norm(tc, axis=-1) + 1e-30)
        assert np.median(align[lit]) > 0.999, np.median(align[lit])
        assert align[lit].min() > 0.99, align[lit].min()
        # eigenvalue ≈ 1 in support, separated from background
        assert np.median(lam[lit]) > 0.98, np.median(lam[lit])
        assert np.median(lam[~lit]) < 0.9, np.median(lam[~lit])

    def test_crop_zeroes_background(self):
        from mrphy_tpu.utils.coils import espirit_maps
        calib, S, mag = self._problem()
        n = S.shape[1]
        maps, lam = espirit_maps(calib, (n, n), kernel=6, crop=0.95)
        nrm = np.linalg.norm(maps, axis=(-2, -1))
        assert float(nrm[lam < 0.95].max(initial=0.0)) == 0.0
        lit = mag > 0.5
        assert np.median(nrm[lit]) > 0.99   # unit-norm where kept

    def test_matches_signal_operator_convention(self):
        r"""Calib built by the exact acquisition operator on a
        Cartesian readout must give the same maps as the FFT-built
        calib: pins the e^{−i2πk·x} sign convention."""
        from mrphy_tpu.utils.coils import espirit_maps
        calib, S, mag = self._problem(noise=0.0)
        n, cs = S.shape[1], 24
        # Cartesian ACS via ops.signal: k = m/fov on the ACS block
        fov = 24.0
        ax = (np.arange(n) - n // 2) / n * fov
        yy, xx = np.meshgrid(ax, ax, indexing='ij')
        loc_ = jnp.asarray(np.stack([yy, xx, 0 * xx], -1).reshape(
            1, n * n, 3), jnp.float64)
        ms = np.arange(cs) - cs // 2
        kyy, kxx = np.meshgrid(ms / fov, ms / fov, indexing='ij')
        k3 = jnp.asarray(np.stack(
            [kyy, kxx, 0 * kxx], 0).reshape(3, cs * cs), jnp.float64)
        imgs = S * (mag * np.exp(1j * (0.7 * yy / 12 + 0.1)))[None]
        sens_ = jnp.asarray(np.stack(
            [imgs.real, imgs.imag], -1).reshape(
                len(S), 1, n * n, 2).transpose(1, 2, 3, 0), jnp.float64)
        M = jnp.asarray(np.tile([1.0, 0.0, 0.0], (1, n * n, 1)),
                        jnp.float64)
        s = sig.signal(M, loc_, k3[None], sens=sens_)   # (1, nC, nT, 2)
        calib2 = np.asarray(s)[0].reshape(len(S), cs, cs, 2)
        m1, _ = espirit_maps(calib2, (n, n), kernel=6)
        ec = m1[..., 0, :] + 1j * m1[..., 1, :]
        tc = np.moveaxis(imgs, 0, -1)
        lit = mag > 0.5
        align = np.abs((np.conj(ec) * tc).sum(-1)) / (
            np.linalg.norm(ec, axis=-1)
            * np.linalg.norm(tc, axis=-1) + 1e-30)
        assert np.median(align[lit]) > 0.999, np.median(align[lit])


class TestAdaptiveMaps:
    r"""Walsh adaptive coil-map estimation: on a synthetic multi-coil
    image the estimated per-voxel sensitivity vectors must align with
    the truth (same 1-D subspace) wherever there is signal, and the
    matched-filter combination must recover the object magnitude."""

    def test_recovers_true_subspace(self):
        import jax.numpy as jnp
        from mrphy_tpu.utils.coils import adaptive_maps
        rng = np.random.default_rng(7)
        n, nc = 32, 4
        y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
        mag = np.exp(-(x ** 2 + y ** 2) / 0.35)
        obj = mag * np.exp(1j * (0.7 * x + 0.4 * y * y))
        maps = []
        for c in range(nc):
            a = 2 * np.pi * c / nc
            m = np.exp(-((x - 1.2 * np.cos(a)) ** 2
                         + (y - 1.2 * np.sin(a)) ** 2) / 2.0)
            maps.append(m * np.exp(1j * 0.5 * (x * np.sin(a)
                                               - y * np.cos(a))))
        S = np.stack(maps)                            # (nc, n, n)
        imgs_c = S * obj[None]
        imgs_c = imgs_c + 0.003 * (
            rng.standard_normal(imgs_c.shape)
            + 1j * rng.standard_normal(imgs_c.shape))
        imgs = jnp.asarray(np.stack([imgs_c.real, imgs_c.imag], -1),
                           jnp.float64)
        est = np.asarray(adaptive_maps(imgs, block=5))
        ec = est[..., 0, :] + 1j * est[..., 1, :]     # (n, n, nc)
        tc = np.moveaxis(S, 0, -1)
        lit = mag > 0.15
        align = np.abs((np.conj(ec) * tc).sum(-1)) / (
            np.linalg.norm(ec, axis=-1) * np.linalg.norm(tc, axis=-1))
        assert align[lit].min() > 0.995, align[lit].min()

        # matched-filter combine recovers |obj|·||S|| where lit
        comb = (np.conj(ec) * np.moveaxis(imgs_c, 0, -1)).sum(-1)
        expect = np.abs(obj) * np.linalg.norm(tc, axis=-1)
        rel = np.abs(np.abs(comb) - expect)[lit] / expect[lit]
        assert np.median(rel) < 0.01, np.median(rel)


class TestGfactor:
    r"""SENSE g-factor: complex-numpy oracle of Pruessmann eq. 23,
    whitening equivalence, and pseudo-replica cross-validation on an
    explicit least-squares SENSE solve."""

    @staticmethod
    def _g_oracle(maps_c, R, axis=0):
        m = np.moveaxis(maps_c, axis, 0)
        n = m.shape[0]
        rest = m.shape[1:-1]
        sets = m.reshape(R, n // R, *m.shape[1:])
        g = np.zeros((R, n // R) + rest)
        for j in range(n // R):
            for idx in np.ndindex(*rest):
                S = sets[(slice(None), j) + idx]          # (R, nC)
                H = S.conj() @ S.T
                Hinv = np.linalg.inv(H)
                g[(slice(None), j) + idx] = np.sqrt(
                    np.real(np.diag(Hinv) * np.diag(H)))
        return np.moveaxis(g.reshape((n,) + rest), 0, axis)

    @staticmethod
    def _rand_maps(rng, shape, nC):
        z = rng.standard_normal(shape + (nC,)) \
            + 1j * rng.standard_normal(shape + (nC,))
        return z

    def test_r1_is_unity_and_support_mask(self):
        from mrphy_tpu.utils.coils import gfactor_sense
        rng = np.random.default_rng(0)
        z = self._rand_maps(rng, (8, 6), 4)
        z[2, 3] = 0                                  # no support
        maps = np.stack([z.real, z.imag], -2)
        g = np.asarray(gfactor_sense(maps, 1))
        assert g.shape == (8, 6)
        assert np.allclose(np.delete(g.ravel(), 2 * 6 + 3), 1, atol=1e-6)
        assert g[2, 3] == 0

    def test_matches_complex_oracle(self):
        from mrphy_tpu.utils.coils import gfactor_sense
        rng = np.random.default_rng(1)
        for R, axis in [(2, 0), (3, 0), (2, 1)]:
            z = self._rand_maps(rng, (12, 6), 4)
            maps = np.stack([z.real, z.imag], -2)
            g = np.asarray(gfactor_sense(maps, R, axis=axis))
            ref = self._g_oracle(z, R, axis=axis)
            assert np.allclose(g, ref, rtol=1e-6), (R, axis)

    def test_partial_support_set(self):
        # a zeroed pixel decouples: the rest of its aliasing set must
        # match the oracle computed on the reduced set
        from mrphy_tpu.utils.coils import gfactor_sense
        rng = np.random.default_rng(2)
        z = self._rand_maps(rng, (8,), 4)
        z[2] = 0                                      # set {2, 6}, R=2
        maps = np.stack([z.real, z.imag], -2)
        g = np.asarray(gfactor_sense(maps, 2))
        assert g[2] == 0
        assert np.isclose(g[6], 1, atol=1e-6)        # alone in its set
        # untouched sets match the oracle (patch the singular set so
        # the oracle's inv doesn't raise; patched pixels are excluded)
        z2 = z.copy()
        z2[2] = z2[6]
        ref = self._g_oracle(z2, 2)
        keep = [0, 1, 3, 4, 5, 7]
        assert np.allclose(g[keep], ref[keep], rtol=1e-6)

    def test_psi_whitening_equivalence(self):
        from mrphy_tpu.utils.coils import (gfactor_sense, apply_ccmat,
                                           noise_whiten_mat)
        rng = np.random.default_rng(3)
        nC = 4
        z = self._rand_maps(rng, (6, 4), nC)
        maps = np.stack([z.real, z.imag], -2)
        A = rng.standard_normal((nC, nC)) + 1j * rng.standard_normal(
            (nC, nC))
        P = A @ A.conj().T + nC * np.eye(nC)
        Psi = np.stack([P.real, P.imag], 0)
        g1 = np.asarray(gfactor_sense(maps, 2, Psi=Psi))
        W = noise_whiten_mat(Psi)
        g2 = np.asarray(gfactor_sense(
            np.asarray(apply_ccmat(maps, W)), 2))
        assert np.allclose(g1, g2, rtol=1e-6)

    def test_replica_matches_analytic(self):
        from mrphy_tpu.utils.coils import gfactor_sense, gfactor_replica
        rng = np.random.default_rng(4)
        L, nC, R = 8, 3, 2
        z = self._rand_maps(rng, (L,), nC)
        maps = np.stack([z.real, z.imag], -2)
        F = np.exp(-2j * np.pi * np.outer(np.arange(L), np.arange(L))
                   / L)
        A_full = np.concatenate([F * z[:, c][None, :]
                                 for c in range(nC)], 0)
        keep = np.concatenate([c * L + np.arange(0, L, R)
                               for c in range(nC)])
        P_full = np.linalg.pinv(A_full)
        P_acc = np.linalg.pinv(A_full[keep])

        def mk(P, rows=None):
            def recon(noise):
                zn = np.asarray(noise)
                zc = zn[..., 0] + 1j * zn[..., 1]
                if rows is not None:
                    zc = zc[rows]
                x = P @ zc
                return np.stack([x.real, x.imag], -1)
            return recon

        g_mc = gfactor_replica(mk(P_acc, keep), mk(P_full),
                               (nC * L, 2), R, n=800,
                               key=jax.random.PRNGKey(7))
        g_mc = g_mc.mean(-1)                          # re/im agree
        g_an = np.asarray(gfactor_sense(maps, R))
        assert np.allclose(g_mc, g_an, rtol=0.15), (g_mc, g_an)
