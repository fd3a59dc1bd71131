r"""GRAPPA parallel-imaging reconstruction — k-space domain, no maps.

Pipeline (no inverse crime: data comes from the EXACT acquisition
operator :mod:`mrphy_tpu.ops.signal`, not from the FFT model GRAPPA
assumes):

1. acquire a uniformly R-undersampled Cartesian multi-coil k-space of
   a phantom (rows ``ky ≡ 0 mod R``) plus a small fully-sampled
   central ACS block, through :func:`mrphy_tpu.ops.signal.signal` with
   smooth ground-truth coil sensitivities;
2. fit GRAPPA kernels from the ACS (:func:`mrphy_tpu.utils.grappa.
   grappa_weights`, host least squares) and synthesize the missing
   rows (:func:`~mrphy_tpu.utils.grappa.grappa_apply`, jitted — the
   per-line synthesis is MXU matmuls);
3. compare the root-sum-of-squares image against the fully-sampled
   acquisition's RSS, and against zero-filling (must beat it ~10×).

This is the k-space counterpart of ``recon_sense.py --maps espirit``
(image-domain self-calibrated SENSE): same calibration data, no
sensitivity maps, no iterations.

Run:
    python examples/grappa_recon.py [--n 48] [--nc 8] [--R 2]
                                    [--acs 16] [--noise 1e-4]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=48, help='matrix size')
    ap.add_argument('--nc', type=int, default=8, help='coils')
    ap.add_argument('--R', type=int, default=2, help='undersampling')
    ap.add_argument('--acs', type=int, default=16,
                    help='fully-sampled central rows')
    ap.add_argument('--fov', type=float, default=24.0, help='cm')
    ap.add_argument('--noise', type=float, default=1e-4,
                    help='white receiver noise std')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.utils.grappa import grappa_weights, grappa_apply
    from mrphy_tpu.utils.coils import add_noise

    n, nc, R, fov = args.n, args.nc, args.R, args.fov
    nM = n * n

    # phantom + smooth coils on the SpinCube grid rule
    ax = (np.arange(n) - n // 2) / n * fov
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    u, v = yy / (fov / 2), xx / (fov / 2)
    mag = ((v / 0.8) ** 2 + (u / 0.9) ** 2 < 1).astype(float)
    mag += 0.4 * (((v - 0.2) / 0.3) ** 2 + (u / 0.4) ** 2 < 1)
    obj = mag * np.exp(1j * (0.8 * v + 0.5 * u * u))
    S = []
    for c in range(nc):
        a = 2 * np.pi * c / nc
        m = np.exp(-((v - 1.3 * np.cos(a)) ** 2
                     + (u - 1.3 * np.sin(a)) ** 2) / 2.2)
        S.append(m * np.exp(1j * 0.5 * (v * np.sin(a)
                                        - u * np.cos(a))))
    S = np.stack(S)

    loc_ = jnp.asarray(np.stack([xx, yy, 0 * xx], -1).reshape(
        1, nM, 3), jnp.float32)
    M = jnp.asarray(np.stack([obj.real, obj.imag, 0 * mag],
                             -1).reshape(1, nM, 3), jnp.float32)
    sens = jnp.asarray(np.stack([S.real, S.imag], -1).reshape(
        nc, 1, nM, 2).transpose(1, 2, 3, 0), jnp.float32)

    # Cartesian k-grid: row m1 (ky, paired with grid axis 0 = y),
    # column m2 (kx) — sampled rows = acquired ∪ ACS vs all rows
    ms = np.arange(n) - n // 2
    acs_rows = set(range(n // 2 - args.acs // 2,
                         n // 2 + args.acs // 2))
    samp_rows = sorted(set(range(0, n, R)) | acs_rows)

    def acquire(rows):
        kyy = np.repeat(ms[rows] / fov, n)
        kxx = np.tile(ms / fov, len(rows))
        k3 = jnp.asarray(np.stack([kxx, kyy, 0 * kxx], 0),
                         jnp.float32)   # pairs loc_'s (x, y, z)
        s = sig.signal(M, loc_, k3[None], sens=sens, dt=dt0)
        if args.noise > 0:
            s = add_noise(jax.random.key(7), s, args.noise)
        return np.asarray(s)[0].reshape(nc, len(rows), n, 2)

    full = acquire(list(range(n)))                  # reference
    sampled = acquire(samp_rows)
    ksp = np.zeros((nc, n, n, 2), np.float32)
    ksp[:, samp_rows] = sampled
    frac = len(samp_rows) / n
    print(f'{n}x{n}, {nc} coils, R={R}, ACS={args.acs} rows: '
          f'{100 * frac:.0f}% of lines acquired')

    calib = ksp[:, min(acs_rows):max(acs_rows) + 1]
    W = grappa_weights(calib, R)
    rec = np.array(jax.jit(grappa_apply, static_argnums=2)(
        jnp.asarray(ksp), jnp.asarray(W), R))
    rec[:, samp_rows] = sampled                     # data consistency

    def rss(kr):
        kc = kr[..., 0] + 1j * kr[..., 1]
        img = np.fft.fftshift(np.fft.ifftn(np.fft.ifftshift(
            kc, axes=(1, 2)), axes=(1, 2)), axes=(1, 2))
        return np.sqrt((np.abs(img) ** 2).sum(0))

    ref = rss(full)
    err = np.linalg.norm(rss(rec) - ref) / np.linalg.norm(ref)
    err0 = np.linalg.norm(rss(ksp) - ref) / np.linalg.norm(ref)
    print(f'GRAPPA RSS error {100 * err:.2f}% '
          f'(zero-filled: {100 * err0:.2f}%)')
    assert err < 0.03, f'GRAPPA error {err} too large'
    # zero-filling keeps the ACS rows too, so its error is mild at
    # small n/R — still, GRAPPA must clearly beat it
    assert err < err0 / 4, (err, err0)
    print('recon OK (k-space parallel imaging, no maps)')


if __name__ == '__main__':
    main()
