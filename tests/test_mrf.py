r"""MRF dictionary compression / matching / refinement tests.

Oracles: exact-atom recovery under random complex scales (the matched
filter must be phase/scale-invariant and return the scale in ``m0``),
algebraic identities of the pair-rotation operator J, compressed-vs-full
match identity at full rank, and refinement below grid quantization
(the example's assertion promoted to a test).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.ops import epg, mrf


def _spgr_dict(nTR=60, nt1=10, nt2=8, tr=0.012):
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 40))))
    phis = epg.rf_spoil_phases(nTR)
    T1s = np.geomspace(0.3, 2.5, nt1)
    T2s = np.geomspace(0.03, 0.3, nt2)
    T1g, T2g = np.meshgrid(T1s, T2s, indexing='ij')
    keep = T2g < T1g
    T1a, T2a = jnp.asarray(T1g[keep]), jnp.asarray(T2g[keep])
    D = epg.epg_spgr(flips, phis, T1=T1a, T2=T2a, tr=tr, te=tr / 2,
                     K=48)
    return D, T1a, T2a, (flips, phis, tr)


def _scale_pair(d, c, phi):
    r"""x = c·e^{iφ}·d in re/im pairs."""
    re = c * (np.cos(phi) * d[..., 0] - np.sin(phi) * d[..., 1])
    im = c * (np.sin(phi) * d[..., 0] + np.cos(phi) * d[..., 1])
    return jnp.stack([re, im], -1)


def test_pair_rotate_algebra():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 7, 2)))
    d = jnp.asarray(rng.standard_normal((5, 7, 2)))
    assert jnp.allclose(mrf.pair_rotate(mrf.pair_rotate(x)), -x)
    # J antisymmetric under the flattened real dot
    dot = lambda a, b: jnp.sum(a * b)
    assert jnp.allclose(dot(d, mrf.pair_rotate(x)),
                        -dot(mrf.pair_rotate(d), x))


def test_match_exact_atoms_complex_scale():
    D, T1a, T2a, _ = _spgr_dict()
    nA = D.shape[0]
    rng = np.random.default_rng(1)
    ks = rng.integers(0, nA, size=6)
    cs = rng.uniform(0.5, 2.0, size=6)
    phs = rng.uniform(-np.pi, np.pi, size=6)
    probes = jnp.stack([_scale_pair(D[k], c, p)
                        for k, c, p in zip(ks, cs, phs)]).reshape(
                            2, 3, -1, 2)
    res = mrf.dict_match(D, probes)
    assert res.idx.shape == (2, 3) and res.m0.shape == (2, 3, 2)
    assert np.array_equal(np.asarray(res.idx).ravel(), ks)
    nrm = np.linalg.norm(np.asarray(D).reshape(nA, -1), axis=1)
    # score = |⟨d̂, x⟩| = c·‖d‖ ; m0 = c·e^{iφ}
    assert np.allclose(np.asarray(res.score).ravel(), cs * nrm[ks],
                       rtol=1e-6)
    m0 = np.asarray(res.m0).reshape(-1, 2)
    assert np.allclose(m0[:, 0], cs * np.cos(phs), rtol=1e-5,
                       atol=1e-8)
    assert np.allclose(m0[:, 1], cs * np.sin(phs), rtol=1e-5,
                       atol=1e-8)


def test_match_real_signals_m0():
    rng = np.random.default_rng(2)
    D = jnp.asarray(rng.standard_normal((37, 50)))
    ks = np.array([3, 19, 36, 0])
    cs = np.array([0.7, 1.3, 2.2, 1.0])
    probes = jnp.asarray(cs[:, None] * np.asarray(D)[ks])
    res = mrf.dict_match(D, probes)
    assert np.array_equal(np.asarray(res.idx), ks)
    nrm2 = np.sum(np.asarray(D)[ks] ** 2, axis=1)
    # m0 = ⟨d, x⟩/‖d‖² = c ; imaginary half identically zero
    assert np.allclose(np.asarray(res.m0)[:, 0], cs, rtol=1e-9)
    assert np.all(np.asarray(res.m0)[:, 1] == 0)
    assert np.allclose(np.asarray(res.score),
                       cs * np.sqrt(nrm2), rtol=1e-9)


def test_pallas_matcher_parity():
    # fused-kernel search (interpret mode on CPU; compiled parity is
    # pinned on-chip by benchmarks/tpu_checks.py::mrf_match_kernel)
    D, T1a, T2a, _ = _spgr_dict(nt1=9, nt2=7)
    rng = np.random.default_rng(7)
    nV = 150                                   # non-multiple of 128
    ks = rng.integers(0, D.shape[0], nV)
    probes = jnp.stack([_scale_pair(D[k], 0.8, p) for k, p in
                        zip(ks, rng.uniform(-np.pi, np.pi, nV))]
                       ).astype(jnp.float32)
    ref = mrf.dict_match(D.astype(jnp.float32), probes, backend='xla')
    pk = mrf.dict_match(D.astype(jnp.float32), probes,
                        _pallas_interpret=True)
    assert np.array_equal(np.asarray(ref.idx), np.asarray(pk.idx))
    # default precision='highest' (bf16x6) matches the XLA/HIGHEST
    # scores to f32 rounding
    assert np.allclose(np.asarray(ref.score), np.asarray(pk.score),
                       rtol=1e-5)
    assert np.allclose(np.asarray(ref.m0), np.asarray(pk.m0),
                       rtol=1e-5, atol=1e-7)
    # real (non-pair) path too
    Dr = D.reshape(D.shape[0], -1).astype(jnp.float32)
    Xr = Dr[jnp.asarray(ks)] * 1.3
    rr = mrf.dict_match(Dr, Xr, backend='xla')
    rp = mrf.dict_match(Dr, Xr, _pallas_interpret=True)
    assert np.array_equal(np.asarray(rr.idx), np.asarray(rp.idx))
    assert np.allclose(np.asarray(rr.m0), np.asarray(rp.m0),
                       rtol=1e-5, atol=1e-7)


def test_chunk_invariance():
    D, *_ = _spgr_dict(nt1=8, nt2=6)
    rng = np.random.default_rng(3)
    probes = jnp.asarray(rng.standard_normal((11, D.shape[1], 2)))
    full = mrf.dict_match(D, probes, chunk_probes=11)
    blk = mrf.dict_match(D, probes, chunk_probes=4)   # non-divisor
    assert np.array_equal(np.asarray(full.idx), np.asarray(blk.idx))
    assert np.allclose(np.asarray(full.score), np.asarray(blk.score))
    assert np.allclose(np.asarray(full.m0), np.asarray(blk.m0))


def test_svd_basis_invariants():
    D, *_ = _spgr_dict()
    basis = mrf.svd_basis(D, energy=0.99999)
    B, jc = basis.B, basis.jc
    r = B.shape[1]
    assert r % 2 == 0 and jc is not None and jc.shape == (r, r)
    assert jnp.allclose(B.T @ B, jnp.eye(r), atol=1e-10)
    # J-invariant subspace: jc is the restriction of J — antisymmetric
    # with jc² = −I (holds exactly only if span(B) is J-closed)
    assert jnp.allclose(jc.T, -jc, atol=1e-8)
    assert jnp.allclose(jc @ jc, -jnp.eye(r), atol=1e-6)
    assert np.all(np.diff(np.asarray(basis.s)) <= 1e-9)


def test_compress_preserves_complex_scores():
    D, *_ = _spgr_dict()
    basis = mrf.svd_basis(D, energy=1.0 - 1e-12)   # (near-)full rank
    Dc = mrf.compress(D, basis)
    rng = np.random.default_rng(4)
    ks = rng.integers(0, D.shape[0], size=5)
    phs = rng.uniform(-np.pi, np.pi, size=5)
    probes = jnp.stack([_scale_pair(D[k], 1.0, p)
                        for k, p in zip(ks, phs)])
    full = mrf.dict_match(D, probes)
    comp = mrf.dict_match_compressed(Dc, probes, basis)
    assert np.array_equal(np.asarray(full.idx), np.asarray(comp.idx))
    assert np.allclose(np.asarray(full.score), np.asarray(comp.score),
                       rtol=1e-8)
    assert np.allclose(np.asarray(full.m0), np.asarray(comp.m0),
                       rtol=1e-6, atol=1e-9)


def test_compressed_lowrank_match():
    D, T1a, T2a, _ = _spgr_dict(nt1=14, nt2=12)
    basis = mrf.svd_basis(D, rank=8)
    assert basis.B.shape[1] == 8
    # smooth SPGR manifold: rank-8 keeps ≫99.9% of the energy
    s2 = np.asarray(basis.s) ** 2
    assert s2[:8].sum() / s2.sum() > 0.999
    Dc = mrf.compress(D, basis)
    rng = np.random.default_rng(5)
    ks = rng.integers(0, D.shape[0], size=8)
    phs = rng.uniform(-np.pi, np.pi, size=8)
    probes = jnp.stack([_scale_pair(D[k], 1.3, p)
                        for k, p in zip(ks, phs)])
    # compressed probes accepted directly too
    comp = mrf.dict_match_compressed(Dc, mrf.compress(probes, basis),
                                     basis)
    assert np.array_equal(np.asarray(comp.idx), ks)
    m0 = np.asarray(comp.m0)
    assert np.allclose(np.hypot(m0[:, 0], m0[:, 1]), 1.3, rtol=1e-3)


def test_sharded_match_parity():
    from mrphy_tpu.parallel import make_mesh
    D, *_ = _spgr_dict(nt1=8, nt2=6)
    rng = np.random.default_rng(6)
    ks = rng.integers(0, D.shape[0], size=16)
    phs = rng.uniform(-np.pi, np.pi, size=16)
    probes = jnp.stack([_scale_pair(D[k], 1.1, p)
                        for k, p in zip(ks, phs)])
    mesh = make_mesh()                                # 1 x 8
    ref = mrf.dict_match(D, probes)
    sh = mrf.dict_match(D, probes, mesh=mesh, chunk_probes=4)
    assert np.array_equal(np.asarray(ref.idx), np.asarray(sh.idx))
    assert np.allclose(np.asarray(ref.score), np.asarray(sh.score))
    assert np.allclose(np.asarray(ref.m0), np.asarray(sh.m0))
    # compressed path under the mesh, raw and pre-compressed probes
    basis = mrf.svd_basis(D, rank=10)
    Dc = mrf.compress(D, basis)
    cref = mrf.dict_match_compressed(Dc, probes, basis)
    csh = mrf.dict_match_compressed(Dc, probes, basis, mesh=mesh)
    csh2 = mrf.dict_match_compressed(Dc, mrf.compress(probes, basis),
                                     basis, mesh=mesh)
    for c in (csh, csh2):
        assert np.array_equal(np.asarray(cref.idx), np.asarray(c.idx))
        assert np.allclose(np.asarray(cref.score), np.asarray(c.score))
        assert np.allclose(np.asarray(cref.m0), np.asarray(c.m0))


def test_match_refine_below_grid():
    D, T1a, T2a, (flips, phis, tr) = _spgr_dict(nTR=50, nt1=8, nt2=6)
    T1_true, T2_true = 0.83, 0.067     # intentionally off-grid
    truth = epg.epg_spgr(flips, phis, T1=jnp.asarray([T1_true, 1.4]),
                         T2=jnp.asarray([T2_true, 0.11]), tr=tr,
                         te=tr / 2, K=48)
    probes = _scale_pair(truth, 1.0, 0.7)          # receive phase
    res = mrf.dict_match(D, probes)
    p0 = jnp.log(jnp.stack([T1a[res.idx], T2a[res.idx]], -1))

    def sig(p):
        return epg.epg_spgr(flips, phis, T1=jnp.exp(p[0]),
                            T2=jnp.exp(p[1]), tr=tr, te=tr / 2, K=48)

    p, score = mrf.match_refine(sig, p0, probes, iters=300, lr=0.02)
    T1f, T2f = np.exp(np.asarray(p[..., 0])), np.exp(
        np.asarray(p[..., 1]))
    for i, (t1t, t2t) in enumerate([(T1_true, 0.067), (1.4, 0.11)]):
        e1 = abs(T1f[i] - t1t) / t1t
        e2 = abs(T2f[i] - t2t) / t2t
        assert e1 < 0.01 and e2 < 0.01, (i, T1f[i], T2f[i])
        # beats the matched atom's quantization
        assert e1 <= abs(float(T1a[res.idx[i]]) - t1t) / t1t + 1e-9
    assert np.all(np.asarray(score) > 0.99999)


def test_match_refine_batched_matches_vmapped():
    r"""``batched=True`` (one train per iteration; the volume-scale
    mode that routes through the fused kernels) must match the
    vmapped per-voxel mode — the per-voxel losses are independent, so
    the sum's gradient is the per-voxel gradients."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg, mrf
    rng = np.random.default_rng(3)
    ntr, nV = 40, 12
    flips = jnp.asarray(np.deg2rad(10 + 40 * np.abs(
        np.sin(np.arange(ntr) / 8))), jnp.float64)
    T1t = rng.uniform(0.4, 2.0, nV)
    T2t = rng.uniform(0.04, 0.3, nV)
    X = epg.epg_spgr(flips, None, T1=jnp.asarray(T1t),
                     T2=jnp.asarray(T2t), tr=0.012, K=10)
    p0 = jnp.log(jnp.asarray(np.stack(
        [T1t * rng.uniform(0.9, 1.1, nV),
         T2t * rng.uniform(0.9, 1.1, nV)], -1)))

    def sig1(p):
        return epg.epg_spgr(flips, None, T1=jnp.exp(p[0]),
                            T2=jnp.exp(p[1]), tr=0.012, K=10)

    def sigB(P):
        return epg.epg_spgr(flips, None, T1=jnp.exp(P[:, 0]),
                            T2=jnp.exp(P[:, 1]), tr=0.012, K=10)

    Pv, sv = mrf.match_refine(sig1, p0, X, iters=60, lr=0.03)
    Pb, sb = mrf.match_refine(sigB, p0, X, iters=60, lr=0.03,
                              batched=True)
    np.testing.assert_allclose(Pb, Pv, atol=1e-9)
    np.testing.assert_allclose(sb, sv, atol=1e-10)
    # and it actually refines toward the truth
    rel = np.abs(np.exp(np.asarray(Pb[:, 0])) - T1t) / T1t
    assert np.median(rel) < 0.02, np.median(rel)


# ------------------------------------------------------------------
# k-space MRF (round 5): subspace-constrained non-Cartesian recon
# ------------------------------------------------------------------

def _kspace_setup(N=24, nTR=48, nRO=None, rank=6):
    from mrphy_tpu.ops.nufft import nufft_plan
    rng = np.random.default_rng(3)
    nRO = nRO or 2 * N
    fov = 20.0
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 40))), jnp.float64)
    trs = jnp.asarray(
        0.012 + 0.004 * np.sin(2 * np.pi * t / 31) ** 2, jnp.float64)

    def gen(T1v, T2v):
        return epg.epg_spgr(flips, None, T1=T1v, T2=T2v, tr=trs,
                            te=0.002, K=16,
                            zinit=epg.ir_prep(0.02, T1v))

    t1g = np.geomspace(0.3, 3.0, 12)
    t2g = np.geomspace(0.03, 0.4, 8)
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = T2g < T1g
    T1a = jnp.asarray(T1g[keep])
    T2a = jnp.asarray(T2g[keep])
    D = gen(T1a, T2a)
    basis = mrf.svd_basis(D, rank=rank)
    kmax = N / (2 * fov)
    # half-sample-offset spokes: sampling AT -kmax (the Nyquist
    # bin) is ambiguous between the exact operator and the wrapped
    # gridded one; interior samples keep every operator consistent
    rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
    ga = np.pi * (np.sqrt(5) - 1) / 2
    phi = ga * np.arange(nTR)
    ktrajs = jnp.asarray(np.stack([np.cos(phi)[:, None] * rad,
                                   np.sin(phi)[:, None] * rad], 1))
    plan = nufft_plan((N, N), (fov, fov), dtype=jnp.float64)
    return gen, (T1a, T2a, D, basis), plan, ktrajs, rng


def test_subspace_encode_adjoint_exact():
    r"""<A x, y> == <x, A^H y> at f64 — the CG normal operator is
    exactly PSD (each frame's NUFFT pair is exactly adjoint; the
    basis contraction is its own transpose)."""
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    r = basis.B.shape[1]
    N = plan.im_size[0]
    x = jnp.asarray(rng.standard_normal((r, N, N)))
    y = jnp.asarray(rng.standard_normal(
        (ktrajs.shape[0], ktrajs.shape[2], 2)))
    Ax = mrf.subspace_encode(plan, ktrajs, basis, x)
    AHy = mrf.subspace_adjoint(plan, ktrajs, basis, y)
    lhs = float(jnp.sum(Ax * y))
    rhs = float(jnp.sum(x * AHy))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs)), (lhs, rhs)


def test_kspace_pipeline_recovers_maps():
    r"""The full composition (spoke-per-TR acquisition -> subspace CG
    -> compressed match) recovers the phantom's (T1, T2) within ~one
    dictionary cell from 12x-undersampled frames."""
    from mrphy_tpu.ops.nufft import nufft
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    N = plan.im_size[0]
    nTR = ktrajs.shape[0]
    # blocky phantom inside a disk mask
    yy, xx = np.mgrid[:N, :N]
    c = (N - 1) / 2
    mask = np.hypot(yy - c, xx - c) < 0.45 * N
    T1m = np.where(xx < c, 0.8, 1.5)
    T2m = np.where(yy < c, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask])
    T2v = jnp.asarray(T2m[mask])
    X = gen(T1v, T2v)
    imgs = jnp.zeros((nTR, N, N, 2)).at[:, iy, ix, :].set(
        jnp.moveaxis(X, 0, 1))

    def step(_, tx):
        img, k = tx
        return None, nufft(plan, img, k)

    s = jax.lax.scan(step, None, (imgs, ktrajs))[1]
    alpha = mrf.kspace_subspace_recon(plan, ktrajs, basis, s,
                                      iters=8)
    probes = jnp.moveaxis(alpha, 0, -1)[iy, ix]
    Dc = mrf.compress(D, basis)
    res = mrf.dict_match_compressed(Dc, probes, basis)
    e1 = np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1))
    e2 = np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1))
    # grid steps are 23%/45% (geomspace ratios); within ~one cell
    # despite the 12x per-frame undersampling
    assert e1 < 0.20 and e2 < 0.35, (e1, e2)


def test_slice_profile_integrate_identities():
    r"""Round 5: the profile-integration helper. A flat unit profile
    reproduces the naive dictionary exactly; a general profile equals
    the hand-built weighted sum of per-scale trains; scalar pars pass
    through untiled."""
    rng = np.random.default_rng(4)
    nTR, nA = 24, 7
    flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, nTR)),
                        jnp.float64)
    T1 = jnp.asarray(rng.uniform(0.5, 2.0, nA), jnp.float64)
    T2 = jnp.asarray(rng.uniform(0.04, 0.2, nA), jnp.float64)

    def gen(b1, T1v, T2v):
        return epg.epg_spgr(flips, None, T1=T1v, T2=T2v, tr=0.012,
                            te=0.002, K=12, b1=b1)

    pars = dict(T1v=T1, T2v=T2)
    flat = mrf.slice_profile_integrate(gen, pars,
                                       jnp.ones(3, jnp.float64))
    naive = gen(jnp.ones(nA, jnp.float64), T1, T2)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(naive),
                               atol=1e-12)

    prof = jnp.asarray([0.4, 0.9, 1.0, 0.7], jnp.float64)
    w = jnp.asarray([1.0, 2.0, 2.0, 1.0], jnp.float64)
    got = mrf.slice_profile_integrate(gen, pars, prof, weights=w)
    want = sum(float(wj) * gen(pj * jnp.ones(nA, jnp.float64), T1, T2)
               for pj, wj in zip(prof, w)) / float(w.sum())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-12)

    # b1 axis composes multiplicatively with the profile
    b1 = jnp.asarray(rng.uniform(0.8, 1.2, nA), jnp.float64)
    got = mrf.slice_profile_integrate(gen, pars, prof, b1=b1,
                                      weights=w)
    want = sum(float(wj) * gen(pj * b1, T1, T2)
               for pj, wj in zip(prof, w)) / float(w.sum())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-12)


def test_subspace_toeplitz_matches_frames():
    r"""Round 5: the Toeplitz-factored subspace normal operator
    (frame-count-independent CG iterations) equals the
    encode∘adjoint frame sweep at the plan's interpolation accuracy
    (width-6 KB: ~1e-5; the Toeplitz side is the EXACT encoding)."""
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    r = basis.B.shape[1]
    N = plan.im_size[0]
    alpha = jnp.asarray(rng.standard_normal((r, N, N)))
    out_f = mrf.subspace_adjoint(
        plan, ktrajs, basis,
        mrf.subspace_encode(plan, ktrajs, basis, alpha))
    G = mrf.subspace_toeplitz_kernels(plan, ktrajs, basis)
    out_t = mrf.subspace_toeplitz_apply(plan, G, alpha)
    rel = float(jnp.max(jnp.abs(out_t - out_f))
                / jnp.max(jnp.abs(out_f)))
    assert rel < 1e-3, rel
    # and the full CG recon agrees between methods at the same order
    nE = ktrajs.shape[0]
    s = jnp.asarray(rng.standard_normal((nE, ktrajs.shape[2], 2)))
    a1 = mrf.kspace_subspace_recon(plan, ktrajs, basis, s, iters=5,
                                   method='frames')
    a2 = mrf.kspace_subspace_recon(plan, ktrajs, basis, s, iters=5,
                                   method='toeplitz')
    rel2 = float(jnp.max(jnp.abs(a1 - a2)) / jnp.max(jnp.abs(a1)))
    assert rel2 < 5e-3, rel2


# ------------------------------------------------------------------
# Multi-coil SENSE subspace recon (round 5)
# ------------------------------------------------------------------

def _sens_maps(N, nC):
    r"""Smooth birdcage-ish complex maps, `(nC, N, N, 2)` — gain
    falls off away from each port, with a smooth spatial phase (the
    pattern of ``examples/recon_sense.py``)."""
    yy, xx = (np.mgrid[:N, :N] / (N - 1)) - 0.5
    maps = []
    for c in range(nC):
        th = 2 * np.pi * c / nC
        cx, cy = 0.6 * np.cos(th), 0.6 * np.sin(th)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        mag = np.exp(-d2 / 0.8)
        ph = 2 * np.pi * 0.3 * (xx * np.cos(th) + yy * np.sin(th))
        maps.append(np.stack([mag * np.cos(ph), mag * np.sin(ph)],
                             -1))
    return jnp.asarray(np.stack(maps))


def test_subspace_sense_adjoint_exact():
    r"""SENSE path: <A x, y> == <x, A^H y> at f64 over complex pair
    coefficient images and multi-coil samples."""
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    r = basis.B.shape[1]
    N = plan.im_size[0]
    nC = 4
    sens = _sens_maps(N, nC)
    x = jnp.asarray(rng.standard_normal((r, N, N, 2)))
    y = jnp.asarray(rng.standard_normal(
        (nC, ktrajs.shape[0], ktrajs.shape[2], 2)))
    Ax = mrf.subspace_encode(plan, ktrajs, basis, x, sens=sens)
    AHy = mrf.subspace_adjoint(plan, ktrajs, basis, y, sens=sens)
    assert Ax.shape == y.shape and AHy.shape == x.shape
    lhs = float(jnp.sum(Ax * y))
    rhs = float(jnp.sum(x * AHy))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs)), (lhs, rhs)


def test_subspace_sense_toeplitz_matches_frames():
    r"""The per-coil sensitivity sandwich around the SHARED Toeplitz
    kernels equals the multi-coil encode∘adjoint frame sweep (at the
    plan's interpolation accuracy), and both CG methods agree."""
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    r = basis.B.shape[1]
    N = plan.im_size[0]
    sens = _sens_maps(N, 3)
    alpha = jnp.asarray(rng.standard_normal((r, N, N, 2)))
    out_f = mrf.subspace_adjoint(
        plan, ktrajs, basis,
        mrf.subspace_encode(plan, ktrajs, basis, alpha, sens=sens),
        sens=sens)
    G = mrf.subspace_toeplitz_kernels(plan, ktrajs, basis)
    from mrphy_tpu.ops.nufft import _cmul
    out_t = jnp.zeros_like(alpha)
    for c in range(sens.shape[0]):
        sr, si = sens[c, ..., 0], sens[c, ..., 1]
        xr, xi = _cmul(alpha[..., 0], alpha[..., 1], sr, si)
        yv = mrf.subspace_toeplitz_apply(plan, G,
                                         jnp.stack([xr, xi], -1))
        zr, zi = _cmul(yv[..., 0], yv[..., 1], sr, -si)
        out_t = out_t + jnp.stack([zr, zi], -1)
    rel = float(jnp.max(jnp.abs(out_t - out_f))
                / jnp.max(jnp.abs(out_f)))
    assert rel < 1e-3, rel
    nE = ktrajs.shape[0]
    s = jnp.asarray(rng.standard_normal((3, nE, ktrajs.shape[2], 2)))
    a1 = mrf.kspace_subspace_recon(plan, ktrajs, basis, s, iters=5,
                                   method='frames', sens=sens)
    a2 = mrf.kspace_subspace_recon(plan, ktrajs, basis, s, iters=5,
                                   method='toeplitz', sens=sens,
                                   G=G)
    rel2 = float(jnp.max(jnp.abs(a1 - a2)) / jnp.max(jnp.abs(a1)))
    assert rel2 < 5e-3, rel2


def test_kspace_sense_pipeline_recovers_maps():
    r"""Multi-coil pipeline: coil-weighted spoke-per-TR acquisition
    of a phantom WITH per-voxel receive phase -> SENSE subspace CG ->
    compressed match on ``α_re + jc·α_im`` recovers (T1, T2) AND the
    voxel phase in ``m0``."""
    from mrphy_tpu.ops.nufft import _cmul, nufft
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    N = plan.im_size[0]
    nTR = ktrajs.shape[0]
    nC = 4
    sens = _sens_maps(N, nC)
    yy, xx = np.mgrid[:N, :N]
    c = (N - 1) / 2
    mask = np.hypot(yy - c, xx - c) < 0.45 * N
    T1m = np.where(xx < c, 0.8, 1.5)
    T2m = np.where(yy < c, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask])
    T2v = jnp.asarray(T2m[mask])
    X = gen(T1v, T2v)                               # (nV, nTR, 2)
    # per-voxel object phase (B0/receive chain): X_v <- e^{i φ_v} X_v
    phv = jnp.asarray(0.8 * np.sin(2 * np.pi * xx[mask] / N)
                      + 0.3)
    xr, xi = _cmul(X[..., 0], X[..., 1],
                   jnp.cos(phv)[:, None], jnp.sin(phv)[:, None])
    X = jnp.stack([xr, xi], -1)
    imgs = jnp.zeros((nTR, N, N, 2)).at[:, iy, ix, :].set(
        jnp.moveaxis(X, 0, 1))

    def step(_, tx):
        img, k = tx
        outs = []
        for cc in range(nC):
            wr, wi = _cmul(img[..., 0], img[..., 1],
                           sens[cc, ..., 0], sens[cc, ..., 1])
            outs.append(nufft(plan, jnp.stack([wr, wi], -1), k))
        return None, jnp.stack(outs)

    s = jnp.moveaxis(jax.lax.scan(step, None, (imgs, ktrajs))[1],
                     0, 1)                          # (nC, nF, nRO, 2)
    alpha = mrf.kspace_subspace_recon(plan, ktrajs, basis, s,
                                      iters=8, sens=sens)
    al = jnp.moveaxis(alpha, 0, -2)[iy, ix]         # (nV, r, 2)
    probes = al[..., 0] + jnp.einsum('lk,vk->vl', basis.jc,
                                     al[..., 1])
    Dc = mrf.compress(D, basis)
    res = mrf.dict_match_compressed(Dc, probes, basis)
    e1 = np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1))
    e2 = np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1))
    assert e1 < 0.20 and e2 < 0.35, (e1, e2)
    # recovered complex scale carries the object phase
    ph_est = np.arctan2(np.asarray(res.m0[..., 1]),
                        np.asarray(res.m0[..., 0]))
    dph = np.angle(np.exp(1j * (ph_est - np.asarray(phv))))
    assert np.median(np.abs(dph)) < 0.2, np.median(np.abs(dph))


def test_subspace_b0_informed_recon():
    r"""df= threads the NUFFT's time segmentation through the
    subspace stack: the adjoint stays exact w.r.t. the segmented
    encode, and CG with the df model recovers a B0-blurred
    acquisition substantially better than the uninformed recon."""
    from mrphy_tpu.ops.nufft import nufft
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    r = basis.B.shape[1]
    N = plan.im_size[0]
    nTR = ktrajs.shape[0]
    yy, xx = np.mgrid[:N, :N]
    cen = (N - 1) / 2
    df = jnp.asarray(150.0 * np.sin(2 * np.pi * xx / N)
                     * np.cos(np.pi * yy / N))      # ±150 Hz
    dt = 4e-5                                       # ~1.9 ms readout
    kw = dict(df=df, dt=dt, nseg=8)

    # exact adjointness under segmentation
    x = jnp.asarray(rng.standard_normal((r, N, N)))
    y = jnp.asarray(rng.standard_normal(
        (nTR, ktrajs.shape[2], 2)))
    Ax = mrf.subspace_encode(plan, ktrajs, basis, x, **kw)
    AHy = mrf.subspace_adjoint(plan, ktrajs, basis, y, **kw)
    lhs = float(jnp.sum(Ax * y))
    rhs = float(jnp.sum(x * AHy))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs)), (lhs, rhs)

    # B0-informed CG beats the uninformed recon on df-encoded data
    mask = np.hypot(yy - cen, xx - cen) < 0.45 * N
    iy, ix = np.nonzero(mask)
    T1m = np.where(xx < cen, 0.8, 1.5)
    T2m = np.where(yy < cen, 0.06, 0.12)
    X = gen(jnp.asarray(T1m[mask]), jnp.asarray(T2m[mask]))
    imgs = jnp.zeros((nTR, N, N, 2)).at[:, iy, ix, :].set(
        jnp.moveaxis(X, 0, 1))

    def step(_, tx):
        img, k = tx
        return None, nufft(plan, img, k, df=df, dt=dt, nseg=16)

    s = jax.lax.scan(step, None, (imgs, ktrajs))[1]
    a_ref = mrf.kspace_subspace_recon(plan, jnp.asarray(ktrajs),
                                      basis, s, iters=8,
                                      method='frames', **kw)
    a_bad = mrf.kspace_subspace_recon(plan, jnp.asarray(ktrajs),
                                      basis, s, iters=8,
                                      method='frames')
    # truth coefficients of the clean series
    Xc = mrf.compress(X, basis)
    a_true = jnp.zeros((N, N, r)).at[iy, ix].set(Xc)
    a_true = jnp.moveaxis(a_true, -1, 0)
    e_ref = float(jnp.linalg.norm(a_ref - a_true)
                  / jnp.linalg.norm(a_true))
    e_bad = float(jnp.linalg.norm(a_bad - a_true)
                  / jnp.linalg.norm(a_true))
    assert e_ref < 0.7 * e_bad, (e_ref, e_bad)


def test_kspace_sense_espirit_calibrated():
    r"""Data-driven SENSE MRF: coil maps ESTIMATED by ESPIRiT from a
    Cartesian calibration prescan (not the oracle maps) drive
    ``kspace_subspace_recon(sens=)`` to the same map accuracy as the
    oracle-map recon — the composition a real scan uses."""
    from mrphy_tpu.ops.nufft import _cmul, nufft
    from mrphy_tpu.utils.coils import espirit_maps
    gen, (T1a, T2a, D, basis), plan, ktrajs, rng = _kspace_setup()
    N = plan.im_size[0]
    nTR = ktrajs.shape[0]
    nC = 4
    sens = _sens_maps(N, nC)
    yy, xx = np.mgrid[:N, :N]
    cen = (N - 1) / 2
    mask = np.hypot(yy - cen, xx - cen) < 0.45 * N
    T1m = np.where(xx < cen, 0.8, 1.5)
    T2m = np.where(yy < cen, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask])
    T2v = jnp.asarray(T2m[mask])
    X = gen(T1v, T2v)
    imgs = jnp.zeros((nTR, N, N, 2)).at[:, iy, ix, :].set(
        jnp.moveaxis(X, 0, 1))

    # calibration prescan: Cartesian ACS of the coil-weighted PD image
    Sc = np.asarray(sens[..., 0] + 1j * sens[..., 1])
    obj = mask.astype(float)
    ksp = np.fft.fftshift(np.fft.fftn(
        np.fft.ifftshift(Sc * obj[None], axes=(1, 2)), axes=(1, 2)),
        axes=(1, 2))
    cs = 16
    sl = (slice(None), slice(N // 2 - cs // 2, N // 2 + cs // 2),
          slice(N // 2 - cs // 2, N // 2 + cs // 2))
    calib = np.stack([ksp[sl].real, ksp[sl].imag], -1)
    maps, lam = espirit_maps(calib, (N, N), kernel=6, crop=0.8)
    sens_est = jnp.asarray(np.moveaxis(maps, (2, 3), (3, 0)))

    # multi-coil acquisition with the TRUE maps
    def step(_, tx):
        img, k = tx
        outs = []
        for cc in range(nC):
            wr, wi = _cmul(img[..., 0], img[..., 1],
                           sens[cc, ..., 0], sens[cc, ..., 1])
            outs.append(nufft(plan, jnp.stack([wr, wi], -1), k))
        return None, jnp.stack(outs)

    s = jnp.moveaxis(jax.lax.scan(step, None, (imgs, ktrajs))[1],
                     0, 1)

    def match_errs(sv):
        alpha = mrf.kspace_subspace_recon(plan, ktrajs, basis, s,
                                          iters=8, sens=sv)
        al = jnp.moveaxis(alpha, 0, -2)[iy, ix]
        probes = al[..., 0] + jnp.einsum('lk,vk->vl', basis.jc,
                                         al[..., 1])
        res = mrf.dict_match_compressed(mrf.compress(D, basis),
                                        probes, basis)
        return (np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1)),
                np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1)))

    e1o, e2o = match_errs(sens)
    e1e, e2e = match_errs(sens_est)
    # espirit-calibrated recon within 1.3x the oracle-map errors
    # (and inside the absolute budget of the oracle pipeline test)
    assert e1e < max(1.3 * e1o, 0.20) and \
        e2e < max(1.3 * e2o, 0.35), (e1e, e2e, e1o, e2o)
