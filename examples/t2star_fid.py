r"""Effective transverse relaxation (T2*) via intra-voxel dephasing.

A voxel is not one spin: microscopic field inhomogeneity spreads the
off-resonance of its sub-spins, and the voxel FID decays faster than T2.
For a Lorentzian (Cauchy) intra-voxel field distribution of HWHM Γ the
ensemble average is exact,

    E[exp(i·2π·df·t)] = exp(-2πΓ|t|)  ⇒  1/T2* = 1/T2 + 1/T2',  T2' = 1/(2πΓ),

so T2* simulation needs **no new feature** in this framework: the
per-spin ``df`` array IS the intra-voxel distribution (the reference has
the same per-spin Δf field; this demo is the ensemble recipe, cf. the
"MR simulation of effective transverse relaxation" literature). This
demo:

1. builds one voxel as ``K`` sub-spins with quantile-sampled Cauchy
   off-resonances (deterministic — no Monte-Carlo noise floor);
2. excites with a hard 90° pulse through the Bloch engine, then samples
   the FID with :func:`mrphy_tpu.ops.sims.freeprec`;
3. fits the decay rate and compares against the analytic T2*.

Usage::

    python examples/t2star_fid.py [--K 65536] [--T2 0.05] [--T2p 0.02]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--K', type=int, default=65536,
                    help='sub-spins per voxel')
    ap.add_argument('--T1', type=float, default=1.0)
    ap.add_argument('--T2', type=float, default=0.05)
    ap.add_argument('--T2p', type=float, default=0.02,
                    help="T2' = 1/(2 pi Gamma), the inhomogeneity term")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0
    from mrphy_tpu.ops import sims

    K, T1, T2, T2p = args.K, args.T1, args.T2, args.T2p
    Gam = 1 / (2 * np.pi * T2p)                      # Hz, Lorentzian HWHM
    t2star = 1 / (1 / T2 + 1 / T2p)
    print(f'voxel: K={K} sub-spins, T2={T2*1e3:.1f} ms, '
          f"T2'={T2p*1e3:.1f} ms  ->  analytic T2*={t2star*1e3:.2f} ms")

    # deterministic Cauchy ensemble via inverse-CDF (quantile) sampling
    u = (np.arange(K) + 0.5) / K
    df = jnp.asarray(Gam * np.tan(np.pi * (u - 0.5)), jnp.float32)[None]

    # hard 90° about +x: gamma*2pi*B1*T = pi/2, simulated (not assumed)
    nT = 64
    b1 = (0.25 / (gamH * 2 * np.pi * nT * dt0)) * np.pi * 2  # pi/2 total
    rf = jnp.broadcast_to(jnp.asarray([b1, 0.], jnp.float32)[None, :, None],
                          (1, 2, nT))
    gr = jnp.zeros((1, 3, nT), jnp.float32)
    loc = jnp.zeros((1, K, 3), jnp.float32)
    Mi = jnp.broadcast_to(jnp.asarray([0., 0., 1.], jnp.float32), (1, K, 3))
    # excitation is fast vs 1/Gamma: keep df off during the hard pulse
    M90 = sims.blochsim_rfgr(Mi, rf, gr, loc)

    T1a = jnp.asarray([[T1]], jnp.float32)
    T2a = jnp.asarray([[T2]], jnp.float32)
    ts = np.linspace(1e-3, 3 * t2star, 24)

    @jax.jit
    def fid(t):
        Mo = sims.freeprec(M90, t, T1=T1a, T2=T2a, df=df)
        return jnp.hypot(jnp.mean(Mo[0, :, 0]), jnp.mean(Mo[0, :, 1]))

    sig = np.asarray(jax.vmap(fid)(jnp.asarray(ts, jnp.float32)))

    # log-linear fit of the envelope -> measured T2*
    keep = sig > 1e-3
    slope = np.polyfit(ts[keep], np.log(sig[keep]), 1)[0]
    t2star_meas = -1 / slope
    err = abs(t2star_meas - t2star) / t2star
    print(f'measured T2* = {t2star_meas*1e3:.2f} ms   '
          f'(rel err {err:.2%} vs analytic)')
    for t, s in list(zip(ts, sig))[::6]:
        print(f'  t={t*1e3:6.2f} ms  |S|={s:.4f}  '
              f'exp(-t/T2*)={np.exp(-t/t2star):.4f}')
    assert err < 0.02, 'T2* mismatch'
    print('OK')


if __name__ == '__main__':
    main()
