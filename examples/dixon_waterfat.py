r"""Water–fat separation and fat-fraction mapping (Dixon / IDEAL).

A grid of voxels with spatially varying proton-density fat fraction
(PDFF), a smooth B0 field map, and a 6-peak liver fat spectrum is
sampled at ``L`` echo times; :func:`mrphy_tpu.ops.dixon.dixon_ideal`
jointly estimates water, fat, and the field map per voxel (batched
Gauss–Newton, one jit over the whole grid), and the example asserts
the clinical metric — PDFF = |F|/(|W|+|F|) — against the ground truth
along with the field map RMSE.

Run:
    python examples/dixon_waterfat.py [--n 48] [--ne 6] [--noise 0.005]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=48, help='grid side')
    ap.add_argument('--ne', type=int, default=6, help='echoes')
    ap.add_argument('--noise', type=float, default=0.005)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops.dixon import (dixon_cl, dixon_ideal,
                                     FAT_HZ_3T, FAT_AMPS)

    rng = np.random.default_rng(0)
    n, L = args.n, args.ne
    TE = 1.2e-3 + 1.6e-3 * np.arange(L)               # in/out-ish at 3T

    # ground truth: PDFF ramp 0→60% across x, smooth ψ, smooth phase
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    ff = np.clip(0.3 * (x + 1), 0.0, 0.6)             # fat fraction
    rho = 1.0 + 0.2 * np.exp(-(x ** 2 + y ** 2) / 0.5)
    phase = 0.6 * x - 0.4 * y
    psi = 40.0 * x + 25.0 * y * y - 10.0              # Hz
    W = rho * (1 - ff) * np.exp(1j * phase)
    F = rho * ff * np.exp(1j * (phase + 0.2))

    c = np.asarray(dixon_cl(jnp.asarray(TE), FAT_HZ_3T, FAT_AMPS))
    cc = c[:, 0] + 1j * c[:, 1]
    e = np.exp(-2j * np.pi * psi[..., None] * TE[None, None])
    s = (W[..., None] + F[..., None] * cc) * e        # (n, n, L)
    s = np.stack([s.real, s.imag], -1)
    s += args.noise * rng.standard_normal(s.shape)

    fit = jax.jit(lambda s: dixon_ideal(
        s, jnp.asarray(TE, jnp.float32), fat_df=FAT_HZ_3T,
        fat_amp=FAT_AMPS))
    out = fit(jnp.asarray(s, jnp.float32))

    Wm = np.linalg.norm(np.asarray(out['W']), axis=-1)
    Fm = np.linalg.norm(np.asarray(out['F']), axis=-1)
    ff_est = Fm / np.maximum(Wm + Fm, 1e-9)
    ff_err = np.abs(ff_est - ff).mean()
    psi_rmse = float(np.sqrt(((np.asarray(out['psi'])
                               - psi) ** 2).mean()))
    res = float(np.asarray(out['res']).mean())
    print(f'{n}x{n} voxels, {L} echoes, noise {args.noise}: '
          f'PDFF MAE {100 * ff_err:.2f} pp, psi RMSE {psi_rmse:.2f} Hz'
          f', residual {res:.4f}')
    assert ff_err < 0.01, ff_err                      # < 1 pp PDFF
    assert psi_rmse < 1.5, psi_rmse
    print('water-fat separation OK (IDEAL, 6-peak fat)')


if __name__ == '__main__':
    main()
