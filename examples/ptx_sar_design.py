r"""SAR-constrained parallel-transmit (pTx) excitation design.

An 8-channel transmit array can shape a uniform flip across a disc, but
the unconstrained solution concentrates RF power and busts the *local
SAR* limit — the regulated quantity, a quadratic form ``z^H Q_r z`` of
the per-coil drive at every tissue position. This demo:

1. synthesizes coil B1+ maps and local E-field SAR matrices for a ring
   array (hotspots near the coils),
2. compresses the position matrices to virtual observation points
   (:func:`mrphy_tpu.utils.vop_compress` — greedy Eichfelder–Gebhardt),
3. designs the pTx pulse unconstrained, measures its peak VOP SAR,
4. re-designs under a 40% SAR budget via ``design_pulse(sarQ_=...)``
   with the hinge² penalty (``cfg.lam_sar``/``cfg.sar_limit``),

and verifies the budget holds while the excitation error stays close.

Usage::

    python examples/ptx_sar_design.py [--iters 150] [--n 12]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def synth_array(rng, nM, loc, nC=8, R=12.0, maps='synthetic'):
    r"""Ring-array B1+ maps (nM, 2, nC) and per-position E-field SAR
    matrices (nPos, nC, nC): sensitivities decaying from each coil;
    E-fields strongest NEAR coils so local SAR peaks at the rim — the
    classic pTx hazard geometry. ``maps='loops'`` replaces the
    synthetic B1+ with the PHYSICAL field of a ring of circular loop
    coils (:func:`mrphy_tpu.utils.loop_b1`, exact Biot–Savart): real
    Maxwell falloff and the loop's rotating-frame phase structure."""
    ang = 2 * np.pi * np.arange(nC) / nC
    pc = R * np.stack([np.cos(ang), np.sin(ang)], -1)   # coil centers
    d = np.linalg.norm(loc[:, None, :2] - pc[None], axis=-1)  # (nM, nC)
    amp = 1.0 / (1.0 + (d / R) ** 2)   # near-coil weighting (E-fields)
    if maps == 'loops':
        from mrphy_tpu.utils import loop_b1, loop_ring
        centers, normals, radii = loop_ring(nC, R, 6.0, axis='z')
        tx = np.asarray(loop_b1(loc, center=centers, normal=normals,
                                radius=radii, mode='tx'))  # (nM, 2, nC)
        b1 = tx[:, 0] + 1j * tx[:, 1]
    else:
        pha = -0.15 * d + ang[None]                      # propagation-ish
        b1 = amp * np.exp(1j * pha)                      # (nM, nC)
    b1 /= np.abs(b1).sum(-1, keepdims=True).mean()       # ~unit CP sum

    # E-fields: 3 components per coil, amplitude ~ 1/d (near-coil
    # hotspots), smooth random polarization
    pol = rng.normal(size=(3, nC)) + 1j * rng.normal(size=(3, nC))
    E = pol[None] * (np.exp(1j * 0.3 * d) * amp * (1 + R / (1 + d))
                     )[:, None, :]                       # (nM, 3, nC)
    Q = np.einsum('mxc,mxd->mcd', E.conj(), E)           # E^H E, PSD
    return b1, Q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=12, help='grid half-size')
    ap.add_argument('--nt', type=int, default=128)
    ap.add_argument('--iters', type=int, default=150)
    ap.add_argument('--flip', type=float, default=10., help='deg')
    ap.add_argument('--maps', choices=('synthetic', 'loops'),
                    default='synthetic',
                    help='B1+ maps: synthetic phantom or physical '
                         'Biot-Savart loop ring (utils.loop_b1)')
    ap.add_argument('--budget', type=float, default=0.4,
                    help='SAR limit as a fraction of the free design')
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.models import mobjs
    from mrphy_tpu.design import design_pulse, DesignConfig
    from mrphy_tpu.utils import sar_vops, vop_compress

    rng = np.random.default_rng(0)
    # disc of spins in the z=0 plane
    g = np.linspace(-10, 10, 2 * args.n + 1)
    X, Y = np.meshgrid(g, g, indexing='ij')
    keep = X ** 2 + Y ** 2 <= 10.0 ** 2
    loc = np.stack([X[keep], Y[keep], np.zeros(keep.sum())], -1)
    nM = loc.shape[0]
    loc_ = jnp.asarray(loc[None], jnp.float32)

    b1c, Q = synth_array(rng, nM, loc, maps=args.maps)
    b1Map_ = jnp.asarray(np.stack([b1c.real, b1c.imag], -2)[None],
                         jnp.float32)                    # (1,nM,2,nC)
    Qr, Qi, idx = vop_compress(Q, eps=0.05)
    print(f'{nM} spins, {Q.shape[0]} SAR positions -> {Qr.shape[0]} VOPs')

    nC, nT = b1c.shape[1], args.nt
    flip = np.deg2rad(args.flip)
    Mtgt_ = jnp.tile(jnp.asarray([0., np.sin(flip), np.cos(flip)],
                                 jnp.float32), (1, nM, 1))
    arr = mobjs.SpinArray((1, nM), T1_=jnp.asarray([[1e6]], jnp.float32),
                          T2_=jnp.asarray([[1e6]], jnp.float32))
    rf0 = jnp.asarray(2e-3 * rng.normal(size=(1, 2, nT, nC)), jnp.float32)
    gr0 = jnp.asarray(np.zeros((1, 3, nT)), jnp.float32)
    p0 = mobjs.Pulse(rf=rf0, gr=gr0, dt=dt0)

    cfg = DesignConfig(niter=args.iters, lr=0.03, rfmax=0.25, smax=12e3,
                       dt=float(dt0))

    def rms_err(p):
        M = np.asarray(arr.applypulse(p, loc_=loc_, b1Map_=b1Map_,
                                      doRelax=False))
        return float(np.sqrt(((M - np.asarray(Mtgt_)) ** 2)
                             .sum(-1).mean()))

    pf, lf = design_pulse(arr, p0, Mtgt_, loc_=loc_, b1Map_=b1Map_,
                          cfg=cfg, doRelax=False)
    sar_f = float(jnp.max(sar_vops(pf.rf, jnp.asarray(Qr, jnp.float32),
                                   jnp.asarray(Qi, jnp.float32))))
    err_f = rms_err(pf)
    print(f'free design : rms err {err_f:.4f}, peak VOP SAR '
          f'{sar_f:.3e} (a.u.)')

    limit = args.budget * sar_f
    cfg_s = dataclasses.replace(cfg, lam_sar=30.0 / limit ** 2,
                                sar_limit=limit)
    ps, ls = design_pulse(arr, p0, Mtgt_, loc_=loc_, b1Map_=b1Map_,
                          sarQ_=(jnp.asarray(Qr, jnp.float32),
                                 jnp.asarray(Qi, jnp.float32)),
                          cfg=cfg_s, doRelax=False)
    sar_s = float(jnp.max(sar_vops(ps.rf, jnp.asarray(Qr, jnp.float32),
                                   jnp.asarray(Qi, jnp.float32))))
    err_s = rms_err(ps)
    print(f'SAR-limited : rms err {err_s:.4f}, peak VOP SAR '
          f'{sar_s:.3e} (limit {limit:.3e})')

    # success: budget holds (soft constraint -> small tolerance), the
    # excitation stays usable, and both optimizations made progress
    ok = (sar_s <= limit * 1.10
          and err_s <= max(2.0 * err_f, 0.1)
          and float(lf[-1]) < float(lf[0])
          and float(ls[-1]) < float(ls[0]))
    print('PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
