r"""Flow (bolus) simulation demo: gradient-moment phase encoding.

Simulates a plug of spins flowing through a bipolar gradient — stationary
spins rephase completely while moving spins accrue a velocity-
proportional phase (the basis of phase-contrast flow imaging). Runs the
fused flow engine on TPU.

Usage::

    python examples/bolus_flow.py [--nspins 4096] [--vmax 100]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nspins', type=int, default=4096)
    ap.add_argument('--vmax', type=float, default=100.0, help='cm/s')
    ap.add_argument('--nt', type=int, default=400)
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu import dt0, gamH
    from mrphy_tpu.models import mobjs

    nM, nT = args.nspins, args.nt
    dt = float(dt0)

    # bipolar z-gradient: +g for nT/2, -g for nT/2 → zero net area
    # (stationary spins rephase), nonzero first moment (flow encodes)
    g = 1.0  # Gauss/cm
    gr = np.zeros((1, 3, nT), np.float32)
    gr[0, 2, :nT // 2] = g
    gr[0, 2, nT // 2:] = -g
    p = mobjs.Pulse(rf=np.zeros((1, 2, nT), np.float32), gr=gr, dt=dt)

    # spins at the same position, velocities spanning ±vmax
    vels = np.linspace(-args.vmax, args.vmax, nM).astype(np.float32)
    vel = np.zeros((1, nM, 3), np.float32)
    vel[0, :, 2] = vels
    bol = mobjs.SpinBolus((1, nM), vel_=jnp.asarray(vel),
                          M_=jnp.asarray([1., 0., 0.]))  # transverse start

    loc_ = jnp.zeros((1, nM, 3), jnp.float32)
    M = np.asarray(bol.applypulse(p, loc_=loc_, doRelax=False))

    phase = np.arctan2(-M[0, :, 1], M[0, :, 0])  # rotation by −φ
    # analytic: φ = γ2π · m1 · v, with first moment m1 = Σ g(t)·t·dt
    ts = np.arange(nT) * dt
    m1 = float(np.sum(gr[0, 2] * ts * dt))
    phase_pred = 2 * np.pi * gamH * m1 * vels

    err = np.max(np.abs(np.angle(np.exp(1j * (phase - phase_pred)))))
    print(f'bipolar first moment m1 = {m1:.3e} Gauss·s²/cm')
    print(f'phase/velocity slope: {np.polyfit(vels, np.unwrap(phase), 1)[0]:.6e} '
          f'rad/(cm/s); analytic {2 * np.pi * gamH * m1:.6e}')
    print(f'max |phase error| vs analytic: {err:.2e} rad')
    v0 = M[0, nM // 2]
    print(f'stationary spin rephased to {v0} (expect [1, 0, 0])')


if __name__ == '__main__':
    main()
