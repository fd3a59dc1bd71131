r"""Bloch–Siegert shift B1+ mapping — phase-based transmit calibration.

An off-resonant RF pulse (carrier at ±Δω, far from any spin) does not
excite, but SHIFTS the precession frequency of transverse magnetization
by the Bloch–Siegert effect; the accrued phase is

.. math::
   \varphi_{BS} = \pm\int \frac{(2\pi\gamma B_1(t))^2}{2\,\Delta\omega}
   \,dt \;\propto\; B_1^2

so two acquisitions at ±Δω give a phase DIFFERENCE that is immune to
B0/frame terms and directly encodes the transmit field (Sacolick 2010
— the standard fast B1+ mapping method). This demo:

1. excites spins (a range of true B1+ scales) with a hard 90°;
2. plays a Fermi-envelope pulse at carrier offset ±Δω through the
   Bloch simulator (no Bloch–Siegert-specific code: the effect simply
   EMERGES from the simulation);
3. recovers the B1 map from the phase difference and compares with
   both the analytic K_BS·B1² phase and the ground truth.

Usage::

    python examples/bloch_siegert_b1map.py [--nb1 48] [--offhz 4000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nb1', type=int, default=48,
                    help='number of B1 scales to map')
    ap.add_argument('--offhz', type=float, default=4000.0,
                    help='carrier offset of the BS pulse, Hz')
    ap.add_argument('--b1peak', type=float, default=0.05,
                    help='Gauss, nominal peak of the BS pulse')
    ap.add_argument('--dur', type=float, default=8e-3, help='Sec')
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0
    from mrphy_tpu.ops import slowsims

    dt = float(dt0) * 4                        # 16 us: long, soft pulse
    nT = int(round(args.dur / dt))
    nM = args.nb1
    scales = np.linspace(0.6, 1.4, nM)         # true B1+ map

    # Fermi envelope (flat top, smooth edges — keeps adiabaticity at
    # the edges so no on-resonance excitation leaks in)
    t = (np.arange(nT) + 0.5) * dt
    t0, a = 0.1 * args.dur, 0.01 * args.dur
    env = 1.0 / (1 + np.exp((np.abs(t - args.dur / 2)
                             - (args.dur / 2 - t0)) / a))
    b1 = args.b1peak * env                     # Gauss

    # analytic Bloch–Siegert constant: phi = K * scale^2
    wrf = 2 * np.pi * gamH * b1                # rad/s
    K = float(np.sum(wrf ** 2 * dt) / (2 * 2 * np.pi * args.offhz))
    print(f'BS pulse: {args.dur * 1e3:.1f} ms Fermi at ±{args.offhz:.0f}'
          f' Hz, K_BS = {K:.4f} rad (nominal)')

    def acquire(sign):
        # RF-carrier rotating frame: spins sit at -offhz; the BS pulse
        # is a static x-field. Start from Mxy (post-90°) and simulate.
        M0 = jnp.tile(jnp.asarray([1., 0., 0.]), (1, nM, 1))
        beff = np.zeros((1, nM, nT, 3))
        beff[0, :, :, 0] = scales[:, None] * b1[None, :]
        beff[0, :, :, 2] = -sign * args.offhz / gamH
        M = slowsims.blochsim(M0, jnp.asarray(beff, jnp.float32),
                              T1=None, T2=None,
                              gam=jnp.asarray(float(gamH)),
                              dt=jnp.asarray(dt))
        m = np.asarray(M)[0]
        return np.angle(m[:, 0] + 1j * m[:, 1])

    ph_p, ph_m = acquire(+1), acquire(-1)
    dphi = np.angle(np.exp(1j * (ph_p - ph_m))) / 2  # frame terms cancel
    # fit: dphi = K * scale^2  (sign: shift direction follows carrier)
    scale_fit = np.sqrt(np.abs(dphi) / K)
    err_an = np.abs(np.abs(dphi) - K * scales ** 2).max() / K
    err_b1 = np.abs(scale_fit - scales).max()
    print(f'phase vs analytic K·B1²: max dev {100 * err_an:.2f}% of K')
    print(f'recovered B1 map: max |error| {100 * err_b1:.3f}% of '
          f'nominal')
    # the analytic formula is 2nd-order perturbation theory — a ~1%
    # systematic at (gam*B1/offhz)~0.05 is expected; recovery via the
    # SAME K keeps the map accurate
    assert err_an < 0.05, err_an
    assert err_b1 < 0.02, err_b1
    print('Bloch-Siegert B1 mapping OK')


if __name__ == '__main__':
    main()
