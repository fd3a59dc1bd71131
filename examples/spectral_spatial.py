r"""Spectral-spatial pulse design: excite a water slab, null fat.

A spectral-spatial (SPSP) pulse is selective in BOTH space and
frequency: sub-pulses played under an oscillating slice gradient
replicate the slice profile in frequency, and choosing the sub-pulse
spacing ``τ = 1/(2·|Δf_fat|)`` puts fat (−440 Hz at 3 T) on a
replication null — water-only excitation without a separate fat-sat
module (the standard binomial/SPSP recipe).

In this framework the whole thing is just a *target pattern over a
(z, df) spin grid* fed to the same joint design loop: binomial-weighted
sub-pulses on a slew-feasible sinusoidal gradient as the warm start,
then :func:`mrphy_tpu.design.design_pulse` sharpens both profiles at
once (the simulator IS the forward model — no SPSP-specific machinery
exists or is needed).

Usage::

    python examples/spectral_spatial.py [--nz 32] [--ndf 11]
                                        [--iters 500]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--flip', type=float, default=30., help='deg')
    ap.add_argument('--thk', type=float, default=1.0, help='cm')
    ap.add_argument('--fat', type=float, default=-440., help='Hz')
    ap.add_argument('--nsub', type=int, default=5)
    ap.add_argument('--nz', type=int, default=32)
    ap.add_argument('--ndf', type=int, default=11)
    ap.add_argument('--iters', type=int, default=500)
    ap.add_argument('--lr', type=float, default=3e-3)
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0
    from mrphy_tpu.models import mobjs
    from mrphy_tpu.design import design_pulse, DesignConfig

    dt, smax = float(dt0), 12e3
    flip = np.deg2rad(args.flip)
    tau = 1.0 / (2.0 * abs(args.fat))          # binomial spacing, s
    nsub = args.nsub
    nTau = int(round(tau / dt))
    nT = nsub * nTau

    # slew-feasible sinusoidal slice gradient, one period per 2 subpulses
    t = (np.arange(nT) + 0.5) * dt
    g0 = min(3.0, smax * tau / np.pi * 0.9)
    gz = g0 * np.sin(np.pi * t / tau)          # alternates per sub-pulse

    # binomial sub-pulse weights (Pascal row) -> deep fat null
    import math
    wts = np.array([math.comb(nsub - 1, j) for j in range(nsub)], float)
    wts /= wts.sum()
    # each sub-pulse: sinc-weighted by |gz| (plays k-space at rate gz)
    rf0 = np.zeros(nT)
    tb = 2.0
    for j in range(nsub):
        seg = slice(j * nTau, (j + 1) * nTau)
        kz = gamH * np.cumsum(gz[seg]) * dt    # intra-subpulse k
        kz -= kz[-1]
        env = np.sinc(tb / (tau * g0 * gamH * 2 / np.pi) * kz) \
            * np.hamming(nTau)
        sgn = 1.0 if j % 2 == 0 else -1.0      # alternating gz polarity
        rf0[seg] = sgn * wts[j] * env * np.abs(gz[seg]) / g0
    rf0 *= flip / (gamH * 2 * np.pi * np.abs(rf0).sum() * dt)

    # rewind gz to zero net area (slew-feasible ramp + blip)
    from mrphy_tpu.utils import trapezoid, rewinder
    tail = rewinder(gz[-1], smax=smax, dt=dt)
    blip = trapezoid(-(gz.sum() + tail.sum()) * dt, gmax=4.,
                     smax=smax, dt=dt)
    gz_full = np.concatenate([gz, tail, np.zeros(1), blip])
    nTot = gz_full.size
    rf_full = np.zeros((1, 2, nTot))
    rf_full[0, 0, :nT] = rf0
    gr_full = np.zeros((1, 3, nTot))
    gr_full[0, 2] = gz_full
    p0 = mobjs.Pulse(rf=jnp.asarray(rf_full, jnp.float32),
                     gr=jnp.asarray(gr_full, jnp.float32), dt=dt)

    # (z, df) spin grid: water band around 0 Hz, fat band around args.fat
    zs = np.linspace(-2 * args.thk, 2 * args.thk, args.nz)
    dfs = np.concatenate([np.linspace(-80, 80, args.ndf) * 0.5,
                          args.fat + np.linspace(-60, 60, args.ndf)])
    Z, D = np.meshgrid(zs, dfs, indexing='ij')
    nM = Z.size
    loc_ = jnp.asarray(np.stack([np.zeros(nM), np.zeros(nM),
                                 Z.ravel()], -1)[None], jnp.float32)
    df_ = jnp.asarray(D.ravel()[None], jnp.float32)
    arr = mobjs.SpinArray((1, nM),
                          T1_=jnp.asarray([[1e6]], jnp.float32),
                          T2_=jnp.asarray([[1e6]], jnp.float32))

    water = np.abs(D.ravel()) <= 45.0
    fat = np.abs(D.ravel() - args.fat) <= 65.0
    insl = np.abs(Z.ravel()) < args.thk * 0.35
    outsl = np.abs(Z.ravel()) > args.thk * 0.6
    Mtgt = np.tile([0., 0., 1.], (1, nM, 1))
    Mtgt[0, water & insl] = [0., np.sin(flip), np.cos(flip)]
    w = np.zeros(nM)
    w[water & insl] = 3.0                      # excite water slab
    w[water & outsl] = 1.0                     # keep water slab edges
    w[fat] = 2.0                               # null fat at EVERY z
    w_ = jnp.asarray(w[None], jnp.float32)

    def report(pulse, tag):
        M = np.asarray(arr.applypulse(pulse, loc_=loc_, df_=df_,
                                      doRelax=False))
        mxy = np.abs(M[0, :, 0] + 1j * M[0, :, 1])
        exc = mxy[water & insl].min() / np.sin(flip)
        fat_max = mxy[fat].max() / np.sin(flip)
        out_max = mxy[water & outsl].max() / np.sin(flip)
        print(f'{tag}: water in-slice >= {exc:.3f} of target, '
              f'fat <= {fat_max:.3f}, out-of-slice <= {out_max:.3f}')
        return exc, fat_max, out_max

    report(p0, 'binomial init ')
    cfg = DesignConfig(niter=args.iters, lr=args.lr, rfmax=0.25,
                       smax=smax, dt=dt)
    p1, losses = design_pulse(arr, p0, jnp.asarray(Mtgt, jnp.float32),
                              loc_=loc_, df_=df_, w_=w_, cfg=cfg,
                              doRelax=False)
    exc, fat_max, out_max = report(p1, 'SPSP design   ')
    print(f'loss {float(losses[0]):.3e} -> {float(losses[-1]):.3e}')
    assert exc > 0.85, exc                 # water slab excited
    assert fat_max < 0.12, fat_max         # fat suppressed at all z
    assert out_max < 0.25, out_max         # spatial selectivity holds
    print('spectral-spatial design OK')


if __name__ == '__main__':
    main()
