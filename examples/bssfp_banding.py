r"""bSSFP steady state and banding, via the A/B propagator fixed point.

A balanced SSFP sequence repeats an identical (pulse + free precession)
block, so one period is an affine map ``M → A·M + B``
(:func:`mrphy_tpu.ops.beffective.beff2ab` — the Hargreaves propagator the
reference also ships). Its steady state is therefore **one batched 3×3
linear solve**, ``M* = (I − A)⁻¹ B``, instead of simulating hundreds of
TRs to convergence — and the solve is differentiable, so steady-state
signal models can sit inside design/fitting losses.

This demo sweeps off-resonance across ±1.5/TR, solves the steady state
per spin in one shot, verifies it against 2^16 brute-force composed
periods (doubling — the same associativity), and prints the
characteristic bSSFP banding profile (signal nulls at df = ±1/(2·TR)
for the alternating-phase scheme).

Usage::

    python examples/bssfp_banding.py [--TR 5e-3] [--alpha 35] [--nf 33]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--TR', type=float, default=5e-3)
    ap.add_argument('--alpha', type=float, default=35.0, help='deg')
    ap.add_argument('--T1', type=float, default=1.0)
    ap.add_argument('--T2', type=float, default=0.08)
    ap.add_argument('--nf', type=int, default=25,
                    help='sweep points; rounded to 6k+1 so the grid '
                         'contains the ±1/(2TR) band nulls exactly')
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu import gamH
    from mrphy_tpu.ops import beffective, sims, slowsims

    dt, nTp = 4e-6, 10
    TR, T1, T2 = args.TR, args.T1, args.T2
    alpha = np.deg2rad(args.alpha)
    ngap = int(round(TR / dt)) - nTp
    b1 = alpha / (gamH * 2 * np.pi * nTp * dt)
    nf = 6 * max(1, round((args.nf - 1) / 6)) + 1
    dtype = jnp.float32

    df = jnp.asarray(np.linspace(-1.5 / TR, 1.5 / TR, nf), dtype)[None]
    bz = (df / gamH)[..., None, None]

    def tr_beff(sign):
        bx = np.zeros(nTp + ngap, np.float32)
        bx[:nTp] = sign * b1
        bxy = jnp.asarray(np.stack([bx, np.zeros_like(bx)], -1))
        bxy = jnp.broadcast_to(bxy, (1, nf, nTp + ngap, 2))
        return jnp.concatenate(
            [bxy, jnp.broadcast_to(bz, (1, nf, nTp + ngap, 1))], -1)

    # one period = 2 TRs (alternating ±α), phase-cycled bSSFP
    beff2 = jnp.concatenate([tr_beff(+1), tr_beff(-1)], axis=2)
    E1 = jnp.asarray(np.exp(-dt / T1), dtype)
    E2 = jnp.asarray(np.exp(-dt / T2), dtype)
    A, B = beffective.beff2ab(beff2, E1=E1, E2=E2, gam=gamH, dt=dt)
    I3 = jnp.eye(3, dtype=A.dtype)
    Mss = jnp.linalg.solve(I3 - A, B[..., None])[..., 0]   # (1, nf, 3)

    # brute force: compose the period map with itself by doubling —
    # 16 squarings = 2^16 periods (~11 min of scan time, enough for T1=1s
    # to converge), exploiting the same associativity the solve does
    import jax
    hi = jax.lax.Precision.HIGHEST   # TPU default einsum is bf16-input
    Ak, Bk = A, B
    for _ in range(16):
        Bk = jnp.einsum('...ij,...j->...i', Ak, Bk, precision=hi) + Bk
        Ak = jnp.einsum('...ij,...jk->...ik', Ak, Ak, precision=hi)
    M = jnp.broadcast_to(jnp.asarray([0., 0., 1.], dtype), (1, nf, 3))
    M = slowsims.blochsim_ab(M, Ak, Bk)
    drift = float(jnp.max(jnp.abs(M - Mss)))
    print(f'fixed-point solve vs 2^16 composed periods: max |diff| = '
          f'{drift:.2e}')

    # echo-time signal: propagate M* through the +α pulse + TR/2
    nhalf = nTp + ngap // 2
    Ah, Bh = beffective.beff2ab(beff2[:, :, :nhalf], E1=E1, E2=E2,
                                gam=gamH, dt=dt)
    Mte = slowsims.blochsim_ab(Mss, Ah, Bh)
    sig = np.hypot(np.asarray(Mte)[0, :, 0], np.asarray(Mte)[0, :, 1])

    # third, closed-form family member: ssfp.bssfp_steady solves the
    # instantaneous-pulse fixed point directly — it must agree with the
    # full finite-pulse Bloch propagator up to relaxation/precession
    # DURING the nTp·dt of RF (here 40 us vs T2 = 80 ms)
    from mrphy_tpu.ops import ssfp
    s3 = ssfp.bssfp_steady(jnp.asarray(alpha, dtype), T1=T1, T2=T2,
                           tr=TR, df=df[0], te=TR / 2)
    sig3 = np.asarray(jnp.linalg.norm(s3, axis=-1))
    dev3 = float(np.max(np.abs(sig3 - sig)))
    print(f'closed-form bssfp_steady vs finite-pulse propagator: '
          f'max |diff| = {dev3:.2e}')
    assert dev3 < 2e-3, dev3

    dfn = np.asarray(df)[0]
    print(f'\nbSSFP banding profile (TR={TR*1e3:.1f} ms, '
          f'alpha={args.alpha:.0f} deg, TE=TR/2):')
    peak = sig.max()
    for k in range(nf):
        bar = '#' * int(40 * sig[k] / peak)
        print(f'  df={dfn[k]*TR:+5.2f}/TR  |S|={sig[k]:.4f}  {bar}')
    # nulls at df = ±1/(2TR) for the alternating-phase scheme
    inull = int(np.argmin(np.abs(dfn - 1 / (2 * TR))))
    print(f'\nsignal at df=+1/(2TR): {sig[inull]:.4f} '
          f'(banding null; peak {peak:.4f})')
    assert sig[inull] < 0.15 * peak, 'expected a banding null'
    assert drift < 1e-4, 'fixed point disagrees with composed periods'
    print('OK')


if __name__ == '__main__':
    main()
