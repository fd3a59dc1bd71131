r"""Phase-cycled transient bSSFP direct parameter mapping: fit
per-voxel (T1, T2, df, M0) by gradient descent through the bSSFP train
simulator.

The inverse problem behind MR-fingerprinting-style bSSFP quantification
(Ma et al., Nature 495:187, 2013) done as a DIRECT fit instead of a
dictionary match: acquire a few phase-cycle increments of a transient
(non-steady) bSSFP train, then regress each voxel's relaxation times,
off-resonance, and proton density against the measured echo series.
The transient decay toward steady state encodes T1/T2, the phase-cycle
dependence encodes df (bSSFP's banding — the same information PLANET
extracts from the steady-state ellipse, but using the whole transient),
and the scale gives M0.

TPU-shaped: voxels ride the fused kernel's `(8, lane)` atom tile; the
whole fit is one jitted ``lax.scan`` of Adam steps, each stepping
through ``nC`` fused trains. On TPU, ``backend='pallas'`` runs the
round-4 in-kernel hand-transposed adjoint
(:mod:`mrphy_tpu.ops.ssfp_pallas`) — whole-brain direct bSSFP fitting
holds no scan residuals (the recompute-through-XLA reverse it replaces
kept O(nTR·nV) states in HBM). Data are simulated with the XLA engine
and fitted through the Pallas one, so recovery also cross-validates
the two backends end-to-end.

Beyond-reference workload (the reference has no bSSFP model family at
all — it would brute-force Bloch-integrate the full waveform).

Usage::

    python examples/bssfp_fit.py [--nvox 512] [--iters 400]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nvox', type=int, default=512)
    ap.add_argument('--ntr', type=int, default=200)
    ap.add_argument('--ncycles', type=int, default=4,
                    help='phase-cycle increments (2π·c/nC)')
    ap.add_argument('--tr', type=float, default=5e-3)
    ap.add_argument('--flip', type=float, default=35.0,
                    help='nominal flip, degrees (a/2 catalyzation '
                         'prepended automatically)')
    ap.add_argument('--iters', type=int, default=400)
    ap.add_argument('--lr', type=float, default=0.05)
    ap.add_argument('--noise', type=float, default=0.0)
    ap.add_argument('--backend', default='auto',
                    choices=['auto', 'xla', 'pallas'],
                    help='fit-path backend (auto = pallas on TPU)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import ssfp

    backend = args.backend
    if backend == 'auto':
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        backend = 'pallas' if _on_tpu() else 'xla'

    f32 = jnp.float32
    nV, nTR, nC = args.nvox, args.ntr, args.ncycles
    rng = np.random.default_rng(5)

    # ground truth: white/gray-matter-like spread; df within the
    # unaliased band ±1/(2·TR)
    T1t = jnp.asarray(rng.uniform(0.6, 1.8, nV), f32)
    T2t = jnp.asarray(rng.uniform(0.04, 0.25, nV), f32)
    dft = jnp.asarray(rng.uniform(-0.4, 0.4, nV) / args.tr, f32)
    M0t = jnp.asarray(rng.uniform(0.7, 1.2, nV), f32)

    # α/2–TR/2 catalyzed constant-flip train (variable-TR mode: the
    # half-TR head makes the tr train non-constant)
    a = np.deg2rad(args.flip)
    flips = jnp.asarray(np.r_[a / 2, np.full(nTR, a)], f32)
    trs = jnp.asarray(np.r_[args.tr / 2, np.full(nTR, args.tr)], f32)
    dphis = 2 * np.pi * np.arange(nC) / nC

    def echoes(t1, t2, df, m0, be):
        r"""(nV,)×4 → (nC, nV, nTR, 2) demodulated echo series."""
        out = [ssfp.bssfp_train(flips, T1=t1, T2=t2, tr=trs, df=df,
                                M0=m0, dphi=float(dp), backend=be)
               for dp in dphis]
        # drop the catalyzation echo — acquisition starts at TR 1
        return jnp.stack(out)[:, :, 1:, :]

    data = echoes(T1t, T2t, dft, M0t, 'xla')
    if args.noise:
        data = data + args.noise * jnp.asarray(
            rng.standard_normal(data.shape), f32)

    # fit log-relaxation times (positivity) + scaled df + M0. DF_SCALE
    # makes one Adam step move df by O(lr·DF_SCALE) Hz.
    DF_SCALE = 30.0
    p0 = {'logT1': jnp.full(nV, np.log(1.0), f32),
          'logT2': jnp.full(nV, np.log(0.1), f32),
          'dfs': jnp.zeros(nV, f32),
          'M0': jnp.ones(nV, f32)}

    def loss_fn(p):
        s = echoes(jnp.exp(p['logT1']), jnp.exp(p['logT2']),
                   DF_SCALE * p['dfs'], p['M0'], backend)
        return jnp.mean((s - data) ** 2)

    opt = optax.adam(args.lr)

    @jax.jit
    def fit(p):
        st = opt.init(p)

        def step(carry, _):
            p, st = carry
            ll, g = jax.value_and_grad(loss_fn)(p)
            up, st = opt.update(g, st)
            return (optax.apply_updates(p, up), st), ll

        (p, _), ls = jax.lax.scan(step, (p, st), None,
                                  length=args.iters)
        return p, ls

    p, losses = fit(p0)
    T1f = np.asarray(jnp.exp(p['logT1']))
    T2f = np.asarray(jnp.exp(p['logT2']))
    dff = np.asarray(DF_SCALE * p['dfs'])
    M0f = np.asarray(p['M0'])
    l0, l1 = float(losses[0]), float(losses[-1])
    e1 = float(np.median(np.abs(T1f / np.asarray(T1t) - 1)))
    e2 = float(np.median(np.abs(T2f / np.asarray(T2t) - 1)))
    ef = float(np.median(np.abs(dff - np.asarray(dft))))
    em = float(np.median(np.abs(M0f / np.asarray(M0t) - 1)))

    print(f'fit {nV} voxels x {nC} cycles x {nTR} TR '
          f'({args.iters} Adam iters, backend={backend})')
    print(f'loss: {l0:.2e} -> {l1:.2e}')
    print(f'T1: median rel err {e1 * 100:.2f}%')
    print(f'T2: median rel err {e2 * 100:.2f}%')
    print(f'df: median abs err {ef:.3f} Hz')
    print(f'M0: median rel err {em * 100:.2f}%')

    assert l1 < l0 * 1e-2, (l0, l1)
    assert e1 < 0.05 and e2 < 0.05, (e1, e2)
    assert ef < 1.0, ef
    assert em < 0.05, em
    print('OK')


if __name__ == '__main__':
    main()
