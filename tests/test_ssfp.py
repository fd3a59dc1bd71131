r"""Balanced-SSFP model tests (:mod:`mrphy_tpu.ops.ssfp`).

Oracles:
- the Freeman–Hill/Scheffler mid-band closed form (analytic, exact),
- per-TR composition through the package's own oracle ops
  (:func:`mrphy_tpu.ops.slowsims.freeprec` + :func:`uphirot` in a plain
  Python loop — independent code path with the same sign conventions),
- train↔steady-state agreement across the full banding profile (scan of
  rotations vs one 3×3 linear solve — structurally disjoint code).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import pi
from mrphy_tpu.ops import slowsims
from mrphy_tpu.ops.ssfp import bssfp_train, bssfp_steady
from mrphy_tpu.utils import uphirot


class TestBSSFPSteady:
    T1, T2, tr = 1.0, 0.08, 4e-3
    alpha = float(np.deg2rad(35.0))

    def test_midband_analytic(self):
        r"""On resonance, dphi=π, te=0: the textbook amplitude
        ``M0·sinα(1−E1)/(1−(E1−E2)cosα−E1E2)``."""
        s = bssfp_steady(jnp.float64(self.alpha), T1=self.T1,
                         T2=self.T2, tr=self.tr, te=0.0)
        E1, E2 = np.exp(-self.tr / self.T1), np.exp(-self.tr / self.T2)
        ana = (np.sin(self.alpha) * (1 - E1)
               / (1 - (E1 - E2) * np.cos(self.alpha) - E1 * E2))
        assert abs(float(jnp.linalg.norm(s)) - ana) < 1e-12 * ana

    def test_te_decay(self):
        r"""On resonance the TE split only multiplies |s| by
        ``exp(-te/T2)`` (the steady state itself is TE-independent)."""
        s0 = bssfp_steady(jnp.float64(self.alpha), T1=self.T1,
                          T2=self.T2, tr=self.tr, te=0.0)
        s = bssfp_steady(jnp.float64(self.alpha), T1=self.T1,
                         T2=self.T2, tr=self.tr)          # te=tr/2
        ratio = float(jnp.linalg.norm(s) / jnp.linalg.norm(s0))
        assert abs(ratio - np.exp(-self.tr / 2 / self.T2)) < 1e-12

    def test_banding_profile(self):
        r"""Banding structure: 1/tr-periodic in df, deep nulls at
        ``df = ±1/(2·tr)``, maximum on resonance."""
        df = jnp.asarray([-1 / self.tr, -1 / (2 * self.tr), 0.0,
                          1 / (2 * self.tr), 1 / self.tr], jnp.float64)
        prof = jnp.linalg.norm(bssfp_steady(
            jnp.float64(self.alpha), T1=self.T1, T2=self.T2,
            tr=self.tr, df=df), axis=-1)
        prof = np.asarray(prof)
        assert abs(prof[0] - prof[2]) < 1e-12      # 1/tr-periodic
        assert abs(prof[4] - prof[2]) < 1e-12
        assert prof[1] < 0.06 * prof[2]            # band nulls
        assert prof[3] < 0.06 * prof[2]

    def test_batched_b1_map(self):
        r"""Batched flip (a B1-scaled map) broadcasts against batched
        T1/T2/df."""
        al = jnp.asarray(self.alpha) * jnp.linspace(0.8, 1.2, 5)
        s = bssfp_steady(al, T1=jnp.full((5,), self.T1),
                         T2=self.T2, tr=self.tr,
                         df=jnp.linspace(-20, 20, 5))
        assert s.shape == (5, 2)
        assert bool(jnp.all(jnp.isfinite(s)))


class TestBSSFPTrain:
    T1, T2, tr = 1.0, 0.08, 4e-3
    alpha = float(np.deg2rad(35.0))

    def test_converges_to_steady(self):
        r"""A long constant-flip train lands on the 3×3-solve fixed
        point across the whole banding profile (two structurally
        disjoint implementations)."""
        df = jnp.asarray(np.linspace(-1 / self.tr, 1 / self.tr, 41))
        flips = jnp.full((4096,), self.alpha, jnp.float64)
        sig = bssfp_train(flips, T1=self.T1, T2=self.T2, tr=self.tr,
                          df=df)[..., -1, :]
        ss = bssfp_steady(jnp.float64(self.alpha), T1=self.T1,
                          T2=self.T2, tr=self.tr, df=df)
        assert float(jnp.max(jnp.abs(sig - ss))) < 1e-11

    def test_vs_oracle_composition(self):
        r"""A short random train (variable flips/phases, off-resonance)
        matches per-TR composition through ``slowsims.freeprec`` +
        ``uphirot`` — the package's oracle ops, driven by a plain
        Python loop."""
        rng = np.random.default_rng(7)
        nTR = 24
        flips = jnp.asarray(rng.uniform(0.1, 1.2, nTR))
        phis = jnp.asarray(rng.uniform(0, 2 * np.pi, nTR))
        trs = jnp.asarray(rng.uniform(3e-3, 8e-3, nTR))
        df = 37.0

        sig = bssfp_train(flips, T1=self.T1, T2=self.T2, tr=trs,
                          df=df, phis=phis)

        M = jnp.asarray([[0.0, 0.0, 1.0]])          # (N=1, xyz)
        ref = []
        for n in range(nTR):
            a, ph, trn = float(flips[n]), float(phis[n]), float(trs[n])
            u = jnp.asarray([[np.cos(ph), np.sin(ph), 0.0]])
            M = uphirot(u, jnp.asarray([-a]), M)
            M = slowsims.freeprec(M, trn / 2, T1=self.T1, T2=self.T2,
                                  df=jnp.asarray([df]))
            c, s = np.cos(ph), np.sin(ph)
            ref.append([c * float(M[0, 0]) + s * float(M[0, 1]),
                        c * float(M[0, 1]) - s * float(M[0, 0])])
            M = slowsims.freeprec(M, trn / 2, T1=self.T1, T2=self.T2,
                                  df=jnp.asarray([df]))
        assert np.max(np.abs(np.asarray(sig) - np.asarray(ref))) < 1e-12

    def test_mrf_catalyzed_train_grads(self):
        r"""MRF-style usage: α/2−TR/2 catalyzation expressed in the
        train itself; gradients w.r.t. T1/T2/df are finite, nonzero,
        and match central differences."""
        rng = np.random.default_rng(3)
        nTR = 48
        body = rng.uniform(0.15, 1.0, nTR - 1)
        flips = jnp.asarray(np.concatenate([[body[0] / 2], body]))
        trs = jnp.asarray(np.concatenate(
            [[2e-3], rng.uniform(4e-3, 7e-3, nTR - 1)]))
        phis = jnp.asarray(pi) * jnp.arange(nTR)   # alternating

        def loss(T1, T2, df):
            s = bssfp_train(flips, T1=T1, T2=T2, tr=trs, df=df,
                            phis=phis + pi)  # catalyzation: -α/2 pulse
            return jnp.sum(s ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(1.0, 0.08, 25.0)
        eps = 1e-6
        for i, args in enumerate([(1.0 + eps, 0.08, 25.0),
                                  (1.0, 0.08 + eps, 25.0),
                                  (1.0, 0.08, 25.0 + eps)]):
            lo = [1.0, 0.08, 25.0]
            lo[i] -= eps
            fd = (loss(*args) - loss(*lo)) / (2 * eps)
            assert np.isfinite(float(g[i])) and float(g[i]) != 0.0
            assert abs(float(g[i]) - float(fd)) < 1e-5 * max(
                1.0, abs(float(fd)))

    def test_df_sensitivity_vs_spgr(self):
        r"""The physics MRF-bSSFP exists for: the bSSFP train separates
        off-resonance (signals differ across df), unlike the spoiled
        train whose echoes are df-independent."""
        flips = jnp.full((64,), self.alpha, jnp.float64)
        s0 = bssfp_train(flips, T1=self.T1, T2=self.T2, tr=self.tr,
                         df=0.0)
        s1 = bssfp_train(flips, T1=self.T1, T2=self.T2, tr=self.tr,
                         df=30.0)
        assert float(jnp.max(jnp.abs(s0 - s1))) > 1e-3


class TestBSSFPMesh:
    def test_sharded_parity(self):
        r"""Voxel-sharded dispatch on the 8-virtual-device mesh matches
        the unsharded train bit-for-bit-ish."""
        from mrphy_tpu.parallel import make_mesh

        rng = np.random.default_rng(11)
        nV, nTR = 16, 40
        flips = jnp.asarray(np.tile(rng.uniform(0.1, 1.1, nTR),
                                    (nV, 1)))
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, nV))
        T2 = jnp.asarray(rng.uniform(0.03, 0.2, nV))
        df = jnp.asarray(rng.uniform(-60, 60, nV))
        trs = jnp.asarray(rng.uniform(4e-3, 7e-3, nTR))

        ref = bssfp_train(flips, T1=T1, T2=T2, tr=trs, df=df)
        mesh = make_mesh()
        out = bssfp_train(flips, T1=T1, T2=T2, tr=trs, df=df,
                          mesh=mesh)
        assert out.shape == (nV, nTR, 2)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-12


class TestBSSFPPallas:
    r"""Fused dictionary kernel (interpret mode on CPU) vs the XLA
    train — same f32 inputs both sides; on-chip compiled parity is
    pinned by ``benchmarks/tpu_checks.py::bssfp_dict_kernel``."""

    def _atoms(self, nA, seed=5):
        rng = np.random.default_rng(seed)
        return (jnp.asarray(rng.uniform(0.3, 3.0, nA), jnp.float32),
                jnp.asarray(rng.uniform(0.02, 0.3, nA), jnp.float32),
                jnp.asarray(rng.uniform(-120, 120, nA), jnp.float32))

    def _rel(self, a, b):
        return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))

    def test_const_tr_parity(self):
        r"""Scalar tr/te (precomputed-factor path), default alternating
        phase cycle, atom count NOT a multiple of the 8·128 block."""
        rng = np.random.default_rng(1)
        nA, nTR = 1100, 96
        T1, T2, df = self._atoms(nA)
        flips = jnp.asarray(rng.uniform(0.1, 1.2, nTR), jnp.float32)
        ref = bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df)
        out = bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                          backend='pallas')
        assert out.shape == (nA, nTR, 2)
        assert self._rel(out, ref) < 2e-5

    def test_vartr_parity(self):
        r"""Variable (nTR,) tr train (in-kernel transcendental path),
        te defaulting to tr/2 per TR."""
        rng = np.random.default_rng(2)
        nA, nTR = 257, 80
        T1, T2, df = self._atoms(nA, seed=9)
        flips = jnp.asarray(rng.uniform(0.1, 1.2, nTR), jnp.float32)
        trs = jnp.asarray(rng.uniform(4e-3, 9e-3, nTR), jnp.float32)
        ref = bssfp_train(flips, T1=T1, T2=T2, tr=trs, df=df)
        out = bssfp_train(flips, T1=T1, T2=T2, tr=trs, df=df,
                          backend='pallas')
        assert self._rel(out, ref) < 2e-5

    def test_explicit_phis_and_te(self):
        r"""Quadratic phase schedule + scalar te ≠ tr/2."""
        rng = np.random.default_rng(3)
        nA, nTR = 130, 64
        T1, T2, df = self._atoms(nA, seed=13)
        flips = jnp.asarray(rng.uniform(0.1, 1.0, nTR), jnp.float32)
        phis = jnp.asarray(rng.uniform(0, 2 * np.pi, nTR), jnp.float32)
        ref = bssfp_train(flips, T1=T1, T2=T2, tr=6e-3, te=2e-3,
                          df=df, phis=phis)
        out = bssfp_train(flips, T1=T1, T2=T2, tr=6e-3, te=2e-3,
                          df=df, phis=phis, backend='pallas')
        assert self._rel(out, ref) < 2e-5

    def test_b1_dimension(self):
        r"""Per-atom b1 flip scaling equals the XLA path's batched
        ``b1[:, None] * flips``."""
        from mrphy_tpu.ops.ssfp_pallas import bssfp_train_pallas

        rng = np.random.default_rng(4)
        nA, nTR = 90, 48
        T1, T2, df = self._atoms(nA, seed=17)
        b1 = jnp.asarray(rng.uniform(0.6, 1.4, nA), jnp.float32)
        flips = jnp.asarray(rng.uniform(0.1, 1.0, nTR), jnp.float32)
        ref = bssfp_train(b1[:, None] * flips[None, :], T1=T1, T2=T2,
                          tr=5e-3, df=df)
        out = bssfp_train_pallas(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                                 b1=b1)
        assert self._rel(out, ref) < 2e-5

    def test_f64_oracle_accuracy(self):
        r"""The f32 kernel against the f64 XLA train: the echo error
        stays at the f32 noise floor over a long phase-cycled train."""
        rng = np.random.default_rng(6)
        nA, nTR = 64, 400
        T1, T2, df = self._atoms(nA, seed=21)
        flips = jnp.asarray(rng.uniform(0.1, 1.2, nTR))
        ref = bssfp_train(flips, T1=T1.astype(jnp.float64),
                          T2=T2.astype(jnp.float64),
                          tr=5e-3, df=df.astype(jnp.float64))
        out = bssfp_train(flips.astype(jnp.float32), T1=T1, T2=T2,
                          tr=5e-3, df=df, backend='pallas')
        assert self._rel(out, ref) < 2e-4


class TestFusedBssfpGrads:
    r"""``backend='pallas'`` bSSFP trains run the in-kernel
    hand-transposed adjoint (``ssfp_pallas._bssfp_bwd_kernel``,
    round 4) — the last train family to leave the recompute-through-
    XLA VJP. Tolerance is the f32 bar of the native path (state
    recompute + transposed recursion entirely in f32, vs the XLA
    reverse in f64 under x64); a transposition error would show at
    1e-3+. Chunk restarts are EXACT: forcing ``tc = nTR`` gives
    bit-identical gradients (verified; see also the multi-chunk
    case below)."""

    def _check(self, ntr, nA, seed=1, b1=False, vartr=True, phis=None,
               tol=2e-5):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import ssfp
        from mrphy_tpu.ops.ssfp_pallas import bssfp_bwd_is_available
        assert bssfp_bwd_is_available(nTR=ntr, nA=nA)
        rng = np.random.default_rng(seed)
        F = jnp.float64
        flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F)
        if vartr:
            trs = jnp.asarray(10e-3 + 3e-3 * rng.random(ntr), F)
        else:
            trs = jnp.asarray(12e-3, F)
        T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), F)
        T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), F)
        df = jnp.asarray(rng.uniform(-60, 60, nA), F)
        M0 = jnp.asarray(rng.uniform(0.8, 1.2, nA), F)
        w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), F)
        args = [flips, trs, T1, T2, df, M0]
        names = ['flips', 'tr', 'T1', 'T2', 'df', 'M0']
        if b1:
            args.append(jnp.asarray(rng.uniform(0.7, 1.3, nA), F))
            names.append('b1')
        if phis is not None:
            args.append(jnp.asarray(phis, F))
            names.append('phis')

        def loss(be, *a):
            kw = dict(T1=a[2], T2=a[3], tr=a[1], df=a[4], M0=a[5],
                      backend=be)
            if b1:
                kw['b1'] = a[6]
            if phis is not None:
                kw['phis'] = a[6 + b1]
            return jnp.sum(w * ssfp.bssfp_train(a[0], **kw))

        an = tuple(range(len(args)))
        gx = jax.grad(lambda *a: loss('xla', *a), argnums=an)(*args)
        gp = jax.grad(lambda *a: loss('pallas', *a), argnums=an)(*args)
        for name, x, p in zip(names, gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < tol, (name, rel)

    def test_vartr(self):
        self._check(24, 5)

    def test_const_tr(self):
        self._check(24, 5, vartr=False)

    def test_b1_dimension(self):
        self._check(24, 4, b1=True)

    def test_b1_const_tr(self):
        # the scalar-tr cotangent sums nTR*nA f32 factor grads with
        # cancellation — measured 3.5e-5 here, same sign-noise scale
        # as the other cases' passing margins
        self._check(24, 4, b1=True, vartr=False, tol=1e-4)

    def test_explicit_phis(self):
        rng = np.random.default_rng(7)
        self._check(20, 4, phis=rng.uniform(0, 2 * np.pi, 20))

    def test_odd_ntr_tpad(self):
        # 37 TRs exercises the _UNROLL padding: appended zero-flip TRs
        # get zero cotangents, so gradients are unperturbed
        self._check(37, 4)

    @pytest.mark.slow
    def test_multi_chunk(self):
        # 1040 TRs -> tc=208, ntc=5 checkpoint restarts. The larger
        # f32 accumulation over 1000+ steps is the honest bar (the
        # SPGR multi-chunk case measures the same scale); chunked vs
        # single-chunk gradients are bit-identical.
        self._check(1040, 4, tol=1e-3)
