r"""Gradient-nonlinearity distortion and gradwarp correction, end to end.

The scanner chain with imperfect gradient coils
(:mod:`mrphy_tpu.utils.gnl`):

1. **Phantom**: Gaussian blobs on a 2-D slice (one near the FOV edge,
   where 3rd-order coil terms bite hardest).
2. **Acquisition**: full Cartesian k-space through the EXACT encoding
   operator (:func:`mrphy_tpu.ops.signal.signal`) with the spins at
   their *gradient-effective* locations ``f(r) = gnl_loc(r, coeffs)``
   — which is exactly how GNL enters physics (the encoding phase is
   ``k·f(r)``). No engine change.
3. **Naive recon**: conjugate-phase adjoint on the ideal grid — the
   standard recon, which believes the gradients are linear. Blobs
   land displaced (several voxels at the edge) and their intensity is
   modulated by ``1/det J``.
4. **Gradwarp**: resample the distorted image at ``f(r)`` (bilinear)
   and multiply by :func:`mrphy_tpu.utils.gnl.gnl_jacdet` — the
   image-domain correction every scanner applies.

Asserts: the edge blob's centroid error drops from > 1 voxel to
< 0.3; whole-image RMSE improves ≥ 3× (measured 6.4×); and the
Jacobian factor's direction is verified (multiplying is right —
intensity dilutes by ``1/det J``).

Run:
    python examples/gnl_gradwarp.py [--n 64]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _bilinear(img, pts):
    r"""Sample ``img`` (n, n) at float index coords ``pts`` (..., 2)."""
    n = img.shape[0]
    p = np.clip(pts, 0.0, n - 1.0 - 1e-6)
    i0 = np.floor(p).astype(int)
    t = p - i0
    i1 = np.minimum(i0 + 1, n - 1)
    v00 = img[i0[..., 0], i0[..., 1]]
    v01 = img[i0[..., 0], i1[..., 1]]
    v10 = img[i1[..., 0], i0[..., 1]]
    v11 = img[i1[..., 0], i1[..., 1]]
    return ((1 - t[..., 0]) * (1 - t[..., 1]) * v00
            + (1 - t[..., 0]) * t[..., 1] * v01
            + t[..., 0] * (1 - t[..., 1]) * v10
            + t[..., 0] * t[..., 1] * v11)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=64, help='grid side')
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu.ops.signal import signal, signal_adjoint
    from mrphy_tpu.utils.gnl import gnl_loc, gnl_jacdet

    n = args.n
    fov = 24.0                                     # cm
    dx = fov / n
    ax = (np.arange(n) - n // 2) * dx
    X, Y = np.meshgrid(ax, ax, indexing='ij')

    def blob(cx, cy, s, a=1.0):
        return a * np.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / (2 * s * s))

    edge = 0.38 * fov
    img = (blob(0.0, 0.0, 1.6) + blob(-edge, 0.0, 0.9)
           + blob(0.0, edge, 0.9) + blob(edge * 0.7, -edge * 0.7, 0.9))

    # 3rd-order in-plane coil deviations (x3 / y3 / x2y-type terms):
    # ~6% of FOV displacement at the edge — typical for a short-bore
    coeffs = np.zeros((3, 16))
    r3 = (fov / 2) ** 2
    coeffs[0, 14] = 0.10 / r3     # x-coil: x(x^2 - 3y^2)
    coeffs[1, 15] = -0.08 / r3    # y-coil: y(3x^2 - y^2)
    coeffs[0, 4] = 0.05 / (fov / 2)   # x-coil: xy
    coeffs = jnp.asarray(coeffs, jnp.float32)

    loc = np.stack([X, Y, np.zeros_like(X)], -1).reshape(1, -1, 3)
    loc = jnp.asarray(loc, jnp.float32)
    loc_eff = gnl_loc(loc, coeffs)
    disp = np.abs(np.asarray(loc_eff - loc))[0]
    print(f'  max displacement: {disp.max():.2f} cm '
          f'({disp.max() / dx:.1f} voxels)')

    # full Cartesian readout of the *displaced* spins
    ks = (np.arange(n) - n // 2) / fov             # cycle/cm
    KX, KY = np.meshgrid(ks, ks, indexing='ij')
    ktraj = np.stack([KX.ravel(), KY.ravel(),
                      np.zeros(n * n)])[None]       # (1, 3, nT)
    ktraj = jnp.asarray(ktraj, jnp.float32)
    M = jnp.asarray(
        np.stack([img.reshape(-1), np.zeros(n * n),
                  np.zeros(n * n)], -1)[None], jnp.float32)
    s = signal(M, loc_eff, ktraj, dt=1e-6)          # df/T2s off

    # naive recon: conjugate phase on the IDEAL grid
    mxy = signal_adjoint(s, loc, ktraj, dt=1e-6) / (n * n)
    img_dist = np.hypot(np.asarray(mxy[0, :, 0]),
                        np.asarray(mxy[0, :, 1])).reshape(n, n)

    # gradwarp: resample at f(r), multiply by det J
    le = np.asarray(loc_eff)[0, :, :2].reshape(n, n, 2)
    idx = np.stack([(le[..., 0] / dx) + n // 2,
                    (le[..., 1] / dx) + n // 2], -1)
    det = np.asarray(gnl_jacdet(loc, coeffs))[0].reshape(n, n)
    img_warp = _bilinear(img_dist, idx)
    img_corr = img_warp * det
    img_wrong = img_warp / det                     # direction check

    def centroid_err(im, cx, cy, rad=8.0):
        m = (X - cx) ** 2 + (Y - cy) ** 2 <= (rad * dx) ** 2
        w = im * m
        gx = (w * X).sum() / w.sum()
        gy = (w * Y).sum() / w.sum()
        return np.hypot(gx - cx, gy - cy) / dx     # voxels

    ce_d = centroid_err(img_dist, -edge, 0.0)
    ce_c = centroid_err(img_corr, -edge, 0.0)
    r_d = float(np.sqrt(np.mean((img_dist - img) ** 2)))
    r_c = float(np.sqrt(np.mean((img_corr - img) ** 2)))
    r_w = float(np.sqrt(np.mean((img_wrong - img) ** 2)))
    print(f'  edge-blob centroid error: distorted {ce_d:.2f} -> '
          f'corrected {ce_c:.2f} voxels')
    print(f'  image RMSE: distorted {r_d:.4f} -> corrected {r_c:.4f} '
          f'(wrong-direction Jacobian: {r_w:.4f})')

    assert ce_d > 1.0, ce_d           # the distortion is material...
    assert ce_c < 0.3, ce_c           # ...and gradwarp removes it
    assert r_c < r_d / 3, (r_c, r_d)
    assert r_c < r_w, (r_c, r_w)      # multiply-by-detJ is the right way
    print('gnl_gradwarp: OK')


if __name__ == '__main__':
    main()
