r"""Subspace-constrained echo-train reconstruction (T2 shuffling).

A fast-spin-echo acquisition fills k-space along the echo train, so
every ky line carries a DIFFERENT T2 contrast: reconstructing as if the
signal were static blurs/ghosts the image, and the echo-time dimension
is lost. T2 shuffling (Tamir et al., MRM 77:180, 2017) reconstructs the
whole temporal evolution by constraining it to a low-rank subspace
learned from physics:

1. **Subspace**: an EPG dictionary of echo-train evolutions over the
   physiological T2 range (:func:`mrphy_tpu.ops.epg.epg_cpmg` — exact
   stimulated-echo behavior at reduced refocusing flips) is SVD'd; its
   top ``L`` left singular vectors ``Φ (nE, L)`` capture every
   evolution to ~1%.
2. **Forward model**: per-voxel coefficients ``α (L,)`` synthesize the
   evolution ``x(e) = Φ α``; each echo's image is Fourier-encoded
   (centered real-pair MXU DFT) and sampled on ITS OWN shuffled subset
   of ky lines, re-randomized across shots.
3. **Recon**: because sampling is row-wise, the normal equations are
   EXACTLY block-diagonal in k-space — per ky line,
   ``G(ky) = Σ_{e∈S(ky)} Φ_e Φ_eᵀ`` is an L×L system — so the whole
   recon is one batched ``jnp.linalg.solve`` + an inverse DFT: ALL nE
   echo images from shots ≪ nE acquisitions per line, no iterations.
   (The sampler stratifies each line's echoes across the train: a
   line whose few samples cluster at adjacent echoes has nearly
   parallel ``Φ_e`` rows — measured cond(G) up to 1e8 for naive
   per-shot permutations vs ~30 stratified.) Matching ``α`` against
   the subspace-projected dictionary then gives a quantitative T2 map.

Everything is the package's own machinery: EPG for the physics,
``utils.pf``'s DFT factors for encoding — and the whole recon jits
end to end.

Usage::

    python examples/t2shuffling.py [--n 96] [--ne 32] [--L 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=96)
    ap.add_argument('--ne', type=int, default=32, help='echo train len')
    ap.add_argument('--esp', type=float, default=8e-3)
    ap.add_argument('--flip', type=float, default=150.0,
                    help='refocusing flip, deg (non-180: stimulated '
                         'echoes are in the dictionary, not an error)')
    ap.add_argument('--L', type=int, default=4, help='subspace rank')
    ap.add_argument('--shots', type=int, default=6,
                    help='acquisitions per ky line at distinct echoes '
                         '(> L for a well-posed unregularized recon; '
                         'still nE/shots-fold faster than imaging '
                         'each echo fully)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg
    from mrphy_tpu.utils.pf import _dftmat, _apply2

    n, nE, L = args.n, args.ne, args.L
    assert n % nE == 0, 'ny must divide into the echo train'
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    # ---- phantom: piecewise (PD, T2) regions + smooth phase --------
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing='ij')
    PD = np.zeros((n, n), np.float32)
    T2 = np.full((n, n), 0.05, np.float32)
    disk = yy ** 2 + xx ** 2 < 0.8 ** 2
    PD[disk], T2[disk] = 1.0, 0.08                    # parenchyma
    r1 = (np.abs(yy + 0.35) < 0.2) & (np.abs(xx + 0.3) < 0.25)
    PD[r1], T2[r1] = 0.9, 0.04                        # short-T2 lesion
    r2 = ((yy - 0.3) ** 2 + (xx + 0.25) ** 2) < 0.04
    PD[r2], T2[r2] = 1.1, 0.2                         # cyst-like
    r3 = (np.abs(yy - 0.05) < 0.12) & (np.abs(xx - 0.35) < 0.12)
    PD[r3], T2[r3] = 0.8, 0.3                         # fluid
    mask = PD > 0
    phase = 0.7 * yy + 1.1 * xx ** 2                  # smooth B0-ish
    T1 = 1.0
    flips = jnp.full((nE,), np.deg2rad(args.flip), f32)

    # ---- EPG dictionary -> SVD subspace ----------------------------
    T2d = np.geomspace(0.02, 0.5, 256).astype(np.float32)
    d = epg.epg_cpmg(flips, T1=T1, T2=jnp.asarray(T2d), esp=args.esp)
    d = np.asarray(d)                                 # (nd, nE, 2)
    dc = d[..., 0] + 1j * d[..., 1]
    # CPMG echoes are real up to one global phase: rotate it off
    ph = dc.flat[np.argmax(np.abs(dc))]
    m = np.real(dc * np.conj(ph / np.abs(ph)))        # (nd, nE)
    assert np.abs(np.imag(dc * np.conj(ph / np.abs(ph)))).max() < 1e-5
    U, S, _ = np.linalg.svd(m.T @ m)
    Phi = U[:, :L].astype(np.float32)                 # (nE, L)
    sub_err = np.linalg.norm(m - m @ Phi @ Phi.T) / np.linalg.norm(m)
    print(f'dictionary {len(T2d)} atoms x {nE} echoes; rank-{L} '
          f'subspace error {sub_err:.1e}')

    # ---- ground-truth echo images ----------------------------------
    sig = epg.epg_cpmg(flips, T1=T1,
                       T2=jnp.asarray(T2[mask]), esp=args.esp)
    sc = np.asarray(sig)[..., 0] + 1j * np.asarray(sig)[..., 1]
    sc = np.real(sc * np.conj(ph / np.abs(ph)))       # (nvox, nE)
    X = np.zeros((nE, n, n), np.complex64)
    X[:, mask] = (PD[mask] * sc.T) * np.exp(1j * phase[mask])
    Xr = jnp.asarray(np.stack([X.real, X.imag], -1), f32)

    # ---- shuffled view ordering + acquisition ----------------------
    # each ky line is acquired at `shots` DISTINCT echoes, stratified
    # across the train (one per nE/shots stratum + jitter): every
    # per-line L×L normal block stays well-conditioned (see module
    # docstring), while the line->echo map is still randomized
    stride = nE // args.shots
    emask = np.zeros((nE, n, 1, 1), np.float32)
    offs = rng.integers(0, nE, n)
    jit_ = rng.integers(0, stride, (n, args.shots))
    for ky in range(n):
        es = (offs[ky] + np.arange(args.shots) * stride
              + jit_[ky]) % nE
        emask[es, ky] = 1.0
    emask = jnp.asarray(emask)
    em2 = emask[..., 0, 0]                            # (nE, n)
    fwd_m = [_dftmat(n, f32, -1.0)] * 2
    adj_m = [_dftmat(n, f32, +1.0)] * 2
    Phi_j = jnp.asarray(Phi)
    hi = jax.lax.Precision.HIGHEST

    def F(img):                                 # unitary 2-D DFT pair
        kr, ki = _apply2(img[..., 0], img[..., 1], fwd_m)
        return jnp.stack([kr, ki], -1) / n

    def FH(ksp):
        ir, ii = _apply2(ksp[..., 0], ksp[..., 1], adj_m)
        return jnp.stack([ir, ii], -1) / n

    y = emask * jax.vmap(F)(Xr)                       # acquired data

    # naive "static" recon: pool all lines as one k-space (average
    # lines reacquired at several echoes)
    cnt = jnp.maximum(jnp.sum(emask, 0), 1.0)
    x_static = FH(jnp.sum(y, 0) / cnt)

    G = jnp.einsum('ey,el,em->ylm', em2, Phi_j, Phi_j,
                   precision=hi)                      # (n, L, L)
    conds = np.linalg.cond(np.asarray(G))
    print(f'per-line normal blocks: cond(G) median '
          f'{np.median(conds):.1f}, max {conds.max():.1f}')

    @jax.jit
    def recon(y):
        r"""Exact subspace recon: per-ky L×L solve in k-space, then
        one inverse DFT per coefficient image."""
        B = jnp.einsum('ey,el,eyxc->ylxc', em2, Phi_j, y,
                       precision=hi)                  # (n, L, nx, 2)
        beta = jnp.linalg.solve(
            G + 1e-6 * jnp.eye(L, dtype=f32), B.reshape(n, L, -1))
        beta = jnp.moveaxis(beta.reshape(n, L, n, 2), 1, 0)
        return jax.vmap(FH)(beta)                     # (L, n, n, 2)

    alpha = recon(y)
    Xh = jnp.einsum('el,lyxc->eyxc', Phi_j, alpha, precision=hi)

    def nrmse(a, b):
        return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))

    e_sub = nrmse(Xh[0], Xr[0])
    e_naive = nrmse(x_static, Xr[0])
    print(f'echo-1 image NRMSE: subspace {e_sub:.4f} vs static '
          f'zero-filled {e_naive:.4f}')

    # ---- quantitative T2 from the coefficients ---------------------
    Dc = (m @ Phi).astype(np.float32)                 # (nd, L)
    Dn = Dc / np.linalg.norm(Dc, axis=1, keepdims=True)
    av = np.asarray(alpha)                            # (L, n, n, 2)
    avox = (av[..., 0] + 1j * av[..., 1])[:, mask].T  # (nvox, L)
    score = np.abs(avox @ Dn.T)                       # magnitude match
    T2_hat = T2d[np.argmax(score, 1)]
    relerr = np.abs(T2_hat - T2[mask]) / T2[mask]
    print(f'T2 map: median |rel err| {np.median(relerr):.2%}, '
          f'90th pct {np.quantile(relerr, 0.9):.2%}')

    assert e_sub < 0.05 and e_sub < 0.35 * e_naive, (e_sub, e_naive)
    assert np.median(relerr) < 0.05, np.median(relerr)
    print('OK')


if __name__ == '__main__':
    main()
