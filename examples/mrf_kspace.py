r"""k-space MRF end to end: golden-angle radial acquisition →
subspace reconstruction → fused matching → continuous refinement.

Real fingerprinting does not hand you clean per-voxel time series: it
hands you ONE radial spoke (or spiral interleaf) of k-space per TR,
~100× below Nyquist per frame. This example composes the package's
whole acquisition/recon/dictionary stack into that pipeline
(VERDICT round 4 item 3):

1. **Schedule** — the canonical MRF-FISP acquisition (Jiang 2015):
   adiabatic inversion (``ir_prep``), variable flips, variable TRs.
2. **Dictionary** — ``epg_spgr`` over a log (T1, T2) grid (the fused
   Pallas kernel on TPU), SVD subspace (``svd_basis``, rank 8).
3. **Truth** — a disk phantom's per-voxel evolutions through the SAME
   physics, embedded as frame images.
4. **Acquisition** — one golden-angle spoke per TR through the exact
   NUFFT (``subspace_encode``'s per-frame model; `utils.traj.radial`
   gives the gradient-true version of the same spokes), plus noise.
5. **Reconstruction** — subspace-constrained least squares by CG on
   the normal equations (``kspace_subspace_recon``; McGivney SVD-MRF
   / low-rank MRF): the recovered coefficient images ARE the
   compressed probes — no decompression anywhere.
6. **Matching + refinement** — ``dict_match_compressed`` on the α
   maps, then ``match_refine`` THROUGH the compressed signal model
   (one fused train per Adam iteration, ``batched=True``).

Asserts median in-mask T1/T2 accuracy from 8×-undersampled data.

``--coils NC`` switches to the multi-coil SENSE pipeline: birdcage-ish
complex receive maps weight the acquisition, the phantom carries a
per-voxel object phase, ``kspace_subspace_recon(..., sens=)`` solves
the coil-combined normal equations (one shared Toeplitz kernel set,
per-coil sensitivity sandwich), matching runs on ``α_re + jc·α_im``,
and refinement on the m0-dephased probes. The recovered ``m0`` phase
is checked against the object phase.

``--traj spiral`` swaps the spoke for a golden-angle-rotated spiral
interleaf (`utils.traj.spiral2d`, slew/amplitude-true) — the original
Ma 2013 MRF acquisition — through the unchanged subspace pipeline.

Usage::

    python examples/mrf_kspace.py [--n 64] [--ntr 300] [--iters 8]
                                  [--coils 8] [--traj spiral]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def phantom_maps(N):
    r"""Disk phantom: (T1, T2, mask) with brain-ish tissue classes."""
    yy, xx = np.mgrid[:N, :N]
    cy = cx = (N - 1) / 2
    rr = np.hypot(yy - cy, xx - cx)
    mask = rr < 0.45 * N
    T1 = np.full((N, N), 1.1)                  # GM-ish background
    T2 = np.full((N, N), 0.085)

    def disk(y, x, r, t1, t2):
        d = np.hypot(yy - cy - y * N, xx - cx - x * N) < r * N
        T1[d], T2[d] = t1, t2

    disk(-0.18, -0.15, 0.10, 0.75, 0.055)      # WM-ish
    disk(-0.18, 0.17, 0.08, 1.60, 0.110)       # lesion-ish
    disk(0.16, -0.12, 0.07, 3.00, 0.45)        # CSF-ish
    disk(0.18, 0.16, 0.05, 0.45, 0.035)        # fat/muscle-ish
    return T1, T2, mask


def sens_maps(N, nC):
    r"""Smooth birdcage-ish complex receive maps, `(nC, N, N, 2)`:
    gain falls off away from each port, smooth spatial phase (the
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
    return np.stack(maps).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=64)
    ap.add_argument('--ntr', type=int, default=300)
    ap.add_argument('--nro', type=int, default=0,
                    help='samples per spoke (default 2N)')
    ap.add_argument('--iters', type=int, default=8, help='CG iters')
    ap.add_argument('--rank', type=int, default=8)
    ap.add_argument('--noise', type=float, default=2e-3,
                    help='k-space noise std relative to DC')
    ap.add_argument('--refine-iters', type=int, default=60)
    ap.add_argument('--coils', type=int, default=0,
                    help='receive coils (0 = single-coil pipeline)')
    ap.add_argument('--traj', default='radial',
                    choices=['radial', 'spiral'],
                    help='per-TR readout: golden-angle radial spoke '
                         'or golden-angle-rotated spiral interleaf '
                         '(the original Ma 2013 MRF acquisition)')
    ap.add_argument('--interleaves', type=int, default=32,
                    help='spiral design interleaves (sets the pitch; '
                         'one interleaf is played per TR)')
    ap.add_argument('--backend', default='auto',
                    choices=['auto', 'xla', 'pallas'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg, mrf
    from mrphy_tpu.ops.nufft import nufft_plan

    if args.backend == 'auto':
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        backend = 'pallas' if _on_tpu() else 'xla'
    else:
        backend = args.backend

    N, nTR = args.n, args.ntr
    nRO = args.nro or 2 * N
    fov = 24.0
    rng = np.random.default_rng(0)
    t = np.arange(nTR)

    # 1. schedule (MRF-FISP: IR prep + variable flips/TRs)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 75))), jnp.float32)
    trs = jnp.asarray(0.012 + 0.004 * np.sin(2 * np.pi * t / 57) ** 2,
                      jnp.float32)
    ti = 0.02

    def gen(T1v, T2v):
        return epg.epg_spgr(
            flips, None, T1=T1v, T2=T2v, tr=trs, te=0.002, K=24,
            zinit=epg.ir_prep(ti, T1v), backend=backend)

    # 2. dictionary + subspace
    t1g = np.geomspace(0.3, 4.0, 40)
    t2g = np.geomspace(0.02, 0.6, 24)
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = T2g < T1g                       # physical atoms only
    T1a = jnp.asarray(T1g[keep], jnp.float32)
    T2a = jnp.asarray(T2g[keep], jnp.float32)
    t0 = time.time()
    D = jax.jit(gen)(T1a, T2a)
    basis = mrf.svd_basis(D, rank=args.rank)
    Dc = mrf.compress(D, basis)
    print(f'dictionary {D.shape[0]} atoms x {nTR} TR, subspace rank '
          f'{basis.B.shape[1]} ({time.time() - t0:.1f} s)')

    # 3. phantom truth series -> frame images
    T1m, T2m, mask = phantom_maps(N)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask], jnp.float32)
    T2v = jnp.asarray(T2m[mask], jnp.float32)
    X = jax.jit(gen)(T1v, T2v)                       # (nV, nTR, 2)
    sens = phv = None
    if args.coils:
        from mrphy_tpu.ops.nufft import _cmul
        sens = jnp.asarray(sens_maps(N, args.coils))
        # per-voxel object phase (B0/receive chain) — the SENSE
        # recon must carry it through the complex coefficient maps
        xxn = np.nonzero(mask)[1]
        phv = jnp.asarray(0.8 * np.sin(2 * np.pi * xxn / N) + 0.3,
                          jnp.float32)
        xr, xi = _cmul(X[..., 0], X[..., 1],
                       jnp.cos(phv)[:, None], jnp.sin(phv)[:, None])
        X = jnp.stack([xr, xi], -1)
    imgs = jnp.zeros((nTR, N, N, 2), jnp.float32)
    imgs = imgs.at[:, iy, ix, :].set(jnp.moveaxis(X, 0, 1))

    # 4. one readout per TR: golden-angle radial spoke, or a
    # golden-angle-rotated spiral interleaf (Ma et al., Nature 2013)
    kmax = N / (2 * fov)
    if args.traj == 'radial':
        # half-sample-offset spokes: sampling AT -kmax (the Nyquist
        # bin) is ambiguous between the exact operator and the
        # wrapped gridded one; interior samples keep every operator
        # consistent
        rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
        ga = np.pi * (np.sqrt(5) - 1) / 2
        phi = ga * np.arange(nTR)
        ks = np.stack([np.cos(phi)[:, None] * rad,
                       np.sin(phi)[:, None] * rad], 1)  # (nTR, 2, nRO)
    else:
        from mrphy_tpu.utils.traj import spiral2d
        _, kone = spiral2d(fov, N, nshots=args.interleaves,
                           direction='out', rewind=False)
        kxy = np.asarray(kone)[0, :2]                # (2, nS)
        # stay strictly inside the Nyquist bin (cf. the radial
        # half-sample offset): the gridded and exact operators
        # disagree exactly AT +-kmax
        kxy = kxy * (1 - 0.5 / N)
        nRO = kxy.shape[1]
        # golden-angle interleaf rotation per TR
        ga = 2 * np.pi * (1 - 2 / (1 + np.sqrt(5)))  # ~222.5 deg
        phi = ga * np.arange(nTR)
        c, sn = np.cos(phi), np.sin(phi)
        ks = np.stack([c[:, None] * kxy[0] - sn[:, None] * kxy[1],
                       sn[:, None] * kxy[0] + c[:, None] * kxy[1]],
                      1)                              # (nTR, 2, nRO)
    ktrajs = jnp.asarray(ks, jnp.float32)
    plan = nufft_plan((N, N), (fov, fov))

    @jax.jit
    def acquire(imgs):
        from mrphy_tpu.ops.nufft import _cmul, nufft

        def step(_, tx):
            img, k = tx
            if sens is None:
                return None, nufft(plan, img, k)
            outs = []
            for c in range(args.coils):
                wr, wi = _cmul(img[..., 0], img[..., 1],
                               sens[c, ..., 0], sens[c, ..., 1])
                outs.append(nufft(plan, jnp.stack([wr, wi], -1), k))
            return None, jnp.stack(outs)

        out = jax.lax.scan(step, None, (imgs, ktrajs))[1]
        return out if sens is None else jnp.moveaxis(out, 0, 1)

    s = acquire(imgs)                  # (nTR, nRO, 2) | (nC, ...)
    dc = float(jnp.abs(s).max())
    s = s + args.noise * dc * jnp.asarray(
        rng.standard_normal(s.shape), jnp.float32)
    under = N * N / nRO
    print(f'acquired {nTR} spokes x {nRO} samples '
          f'({under:.0f}x undersampled per frame'
          + (f', {args.coils} coils)' if args.coils else ')'))

    # 5. subspace CG recon -> coefficient images = compressed probes
    t0 = time.time()
    alpha = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=args.iters, sens=sens))(s)
    alpha.block_until_ready()
    print(f'subspace CG ({args.iters} iters): {time.time() - t0:.1f} s '
          f'-> alpha {alpha.shape}')

    # 6. match + continuous refinement (all in compressed space)
    if sens is None:
        probes = jnp.moveaxis(alpha, 0, -1)[iy, ix]  # (nV, r)
    else:
        # complex pair α: the compressed probe of a complex voxel
        # series is α_re + jc·α_im (the retained subspace is
        # J-invariant, so the rotation restricts to jc)
        al = jnp.moveaxis(alpha, 0, -2)[iy, ix]      # (nV, r, 2)
        probes = al[..., 0] + jnp.einsum('lk,vk->vl', basis.jc,
                                         al[..., 1])
    res = mrf.dict_match_compressed(Dc, probes, basis)
    T1hat = T1a[res.idx]
    T2hat = T2a[res.idx]

    def err(est, tru):
        return float(jnp.median(jnp.abs(est / tru - 1)))

    e1, e2 = err(T1hat, T1v), err(T2hat, T2v)
    print(f'grid match:  median |dT1|/T1 {e1 * 100:.2f}%, '
          f'|dT2|/T2 {e2 * 100:.2f}%')
    # grid spacing is ~6.9%/15% per step; matching should land within
    # about one cell despite the undersampling (the default config
    # measures 3.7%/11.0% on-chip; the N=24/nTR=60 smoke config sits
    # near one cell at 9.9%/18.7%)
    assert e1 < 0.12 and e2 < 0.22, (e1, e2)

    if args.coils:
        # the matched filter's complex scale recovers the object phase
        ph_est = jnp.arctan2(res.m0[..., 1], res.m0[..., 0])
        dph = np.angle(np.exp(1j * np.asarray(ph_est - phv)))
        mph = float(np.median(np.abs(dph)))
        print(f'object phase: median |dphi| {mph:.3f} rad')
        assert mph < 0.2, mph
        # de-phase the probes (rotate by -phi in compressed space:
        # x <- cos phi x - sin phi jc x) so refinement runs on the
        # real-signal correlation like the single-coil path
        jx = jnp.einsum('lk,vk->vl', basis.jc, probes)
        probes = (jnp.cos(ph_est)[:, None] * probes
                  + jnp.sin(ph_est)[:, None] * jx * -1.0)

    p0 = jnp.stack([jnp.log(T1hat), jnp.log(T2hat)], -1)

    def sig_c(P):
        return mrf.compress(gen(jnp.exp(P[:, 0]), jnp.exp(P[:, 1])),
                            basis)

    p, score = mrf.match_refine(sig_c, p0, probes,
                                iters=args.refine_iters, lr=0.03,
                                batched=True)
    T1r, T2r = jnp.exp(p[:, 0]), jnp.exp(p[:, 1])
    e1r, e2r = err(T1r, T1v), err(T2r, T2v)
    print(f'refined:     median |dT1|/T1 {e1r * 100:.2f}%, '
          f'|dT2|/T2 {e2r * 100:.2f}% '
          f'(mean corr {float(score.mean()):.4f})')
    # refinement must not leave the grid-match neighborhood: within
    # tolerance of the grid match, or inside ~one dictionary cell
    # (6.9%/15% spacing) — the multi-coil smoke config's grid match
    # is good enough that refinement sits at its noise floor rather
    # than strictly improving
    assert e1r < max(e1 + 0.01, 0.055) and \
        e2r < max(e2 + 0.02, 0.12), (e1r, e2r)
    print('OK')


if __name__ == '__main__':
    main()
