r"""CEST Z-spectrum via the two-pool Bloch–McConnell simulator.

Chemical-exchange saturation transfer: irradiate off-resonance at offset
Δ, let exchange carry the saturation from the (dilute, shifted) solute
pool b to water, and read the water signal — the Z-spectrum Z(Δ) shows a
direct-saturation dip at Δ=0 and the CEST dip at Δ=δ_b; the asymmetry
MTR_asym(Δ) = Z(−Δ) − Z(+Δ) isolates the exchange effect.

TPU-shaped: the entire offset sweep is ONE simulator call — offsets live
on the spin axis (each "spin" is one Z-spectrum point, with its own
``Bz = −Δ/γ``), so the sweep vectorizes over the vector lanes and the
time loop is a single ``lax.scan``.

Usage::

    python examples/cest_zspectrum.py [--b1 0.005] [--tsat 2.0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b1', type=float, default=0.005,
                    help='saturation amplitude, Gauss')
    ap.add_argument('--tsat', type=float, default=2.0,
                    help='saturation duration, Sec')
    ap.add_argument('--dfb', type=float, default=750.0,
                    help='solute chemical shift, Hz (~3.5 ppm at 5 T)')
    ap.add_argument('--kab', type=float, default=1.0)
    ap.add_argument('--noffsets', type=int, default=41)
    ap.add_argument('--mesh', action='store_true',
                    help='shard the offset axis over all devices '
                         '(shard_map; offsets pad to the device count)')
    ap.add_argument('--fused', action='store_true',
                    help='cross-check via the fused waveform engine '
                         '(blochsim_mc_rfgr): no materialized Beff — '
                         'the volume-scale path (1M voxels x 10k steps '
                         'needs a 120 GB Beff in streaming form)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import gamH
    from mrphy_tpu.ops import slowsims

    mesh = None
    if args.mesh:
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        print(f'offset-sharded over {len(jax.devices())} devices '
              f'({mesh.shape})')

    # pools: a = water, b = dilute exchanging solute (e.g. amide)
    T1a, T2a = 1.2, 0.06
    T1b, T2b = 1.0, 0.01
    Ma0, Mb0 = 1.0, 0.02
    kab = args.kab                       # a→b; detailed balance:
    kba = kab * Ma0 / Mb0                # b→a = kab·Ma0/Mb0
    dfb = args.dfb

    nF0 = nF = args.noffsets
    offsets = np.linspace(-1.6 * dfb, 1.6 * dfb, nF)
    if mesh is not None:   # pad the sharded axis to the device count
        from mrphy_tpu.parallel.mesh import SPIN_AXIS
        sp = mesh.shape[SPIN_AXIS]
        nF = -(-nF0 // sp) * sp
        offsets = np.concatenate(
            [offsets, np.full(nF - nF0, offsets[-1])])  # dummy tail

    # frame rotating at the RF: pool a sits at −Δ, pool b at δb − Δ
    # (the engine adds δb internally via dfb). One "spin" per offset.
    dt = 2e-4
    nT = int(round(args.tsat / dt))
    beff = np.zeros((1, nF, nT, 3), np.float32)
    beff[0, :, :, 0] = args.b1
    beff[0, :, :, 2] = (-offsets / gamH)[:, None]

    Ma = jnp.broadcast_to(jnp.asarray([0., 0., Ma0], jnp.float32),
                          (1, nF, 3))
    Mb = jnp.broadcast_to(jnp.asarray([0., 0., Mb0], jnp.float32),
                          (1, nF, 3))
    Mao, _ = slowsims.blochsim_mc(
        Ma, Mb, jnp.asarray(beff), T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
        kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb, gam=gamH, dt=dt,
        mesh=mesh)
    Z = np.asarray(Mao)[0, :nF0, 2] / Ma0

    if args.fused:
        # same physics through the fused waveform engine: offsets enter
        # as per-"voxel" B0 off-resonance (df = −Δ), the CW saturation
        # as a constant rf waveform — Beff is never materialized, so
        # this path scales to whole-brain voxel counts.
        from mrphy_tpu.ops import mc
        rf = jnp.broadcast_to(jnp.asarray([args.b1, 0.0], jnp.float32)
                              [None, :, None], (1, 2, nT))
        gr = jnp.zeros((1, 3, nT), jnp.float32)
        locz = jnp.zeros((1, nF, 3), jnp.float32)
        Maf, _ = mc.blochsim_mc_rfgr(
            Ma, Mb, rf, gr, locz, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
            kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb,
            df=jnp.asarray(-offsets, jnp.float32)[None], gam=gamH,
            dt=dt, mesh=mesh)
        Zf = np.asarray(Maf)[0, :nF0, 2] / Ma0
        dmax = float(np.abs(Zf - Z).max())
        # identical math (f64 parity 4e-13, pinned in tests/test_mc.py);
        # what remains is f32 per-step rounding between the two
        # formulations, ~1e-7/step worst-case linear accumulation
        tol = max(1e-5, 2e-7 * nT)
        print(f'fused blochsim_mc_rfgr vs streaming: max |dZ| = '
              f'{dmax:.2e} (f32 rounding tol {tol:.0e})')
        assert dmax < tol, (dmax, tol)

    offsets, nF = offsets[:nF0], nF0

    print(f'CEST Z-spectrum (B1={args.b1*1e3:.1f} mG, '
          f'tsat={args.tsat:.1f} s, δb={dfb:.0f} Hz, kab={kab:.1f}/s):')
    for k in range(0, nF, max(1, nF // 20)):
        bar = '#' * int(40 * Z[k])
        print(f'  Δ={offsets[k]:+7.0f} Hz  Z={Z[k]:.3f}  {bar}')

    # MTR asymmetry at the solute shift isolates the exchange effect
    ip = int(np.argmin(np.abs(offsets - dfb)))
    im = int(np.argmin(np.abs(offsets + dfb)))
    mtr = Z[im] - Z[ip]
    print(f'\nMTR_asym(δb) = Z(−δb) − Z(+δb) = {mtr:.4f}')
    assert mtr > 0.02, 'expected a CEST effect at +δb'
    assert Z[int(np.argmin(np.abs(offsets)))] < 0.5, \
        'expected direct water saturation at Δ=0'
    print('OK')


if __name__ == '__main__':
    main()
