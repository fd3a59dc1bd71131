r"""MR fingerprinting: dictionary generation + matching + fit refinement.

MRF quantifies tissue by driving the spins with a deliberately
non-repeating (variable-flip) gradient-spoiled train and matching the
measured signal evolution against a precomputed dictionary of simulated
evolutions. This demo exercises the TPU-shaped EPG machinery end to end:

1. **Dictionary**: one :func:`mrphy_tpu.ops.epg.epg_spgr` call simulates
   ALL (T1, T2) atoms at once — the atom grid rides the voxel batch
   axis, so generation vectorizes over lanes and the echo train is one
   ``lax.scan``.
2. **Compression + matching** (:mod:`mrphy_tpu.ops.mrf`): an SVD
   temporal subspace shrinks the time axis ~20×
   (:func:`~mrphy_tpu.ops.mrf.svd_basis`), then
   :func:`~mrphy_tpu.ops.mrf.dict_match` streams blockwise MXU matmuls
   with a running argmax — phase-invariant complex-modulus scores, the
   complex scale (proton density × receive phase) returned in ``m0``.
3. **Refinement** (:func:`~mrphy_tpu.ops.mrf.match_refine`): the
   dictionary quantizes (T1, T2) to its grid; gradient descent THROUGH
   the simulator (Adam on log-params, started from the matched atom)
   recovers continuous values below grid resolution — the capability a
   lookup table alone cannot provide.

With ``--seq bssfp`` the train is the ORIGINAL MRF sequence (Ma et al.,
Nature 495:187, 2013): balanced SSFP with variable flips, whose signal
also encodes off-resonance — the dictionary gains a ``df`` axis
(:func:`mrphy_tpu.ops.ssfp.bssfp_train`), and matching + refinement
recover (T1, T2, df) jointly.

Usage::

    python examples/mrf_dictionary.py [--ntr 150] [--nt1 24] [--nt2 24]
    python examples/mrf_dictionary.py --seq bssfp [--ndf 15]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ntr', type=int, default=150)
    ap.add_argument('--nt1', type=int, default=24)
    ap.add_argument('--nt2', type=int, default=24)
    ap.add_argument('--tr', type=float, default=0.012)
    ap.add_argument('--iters', type=int, default=250)
    ap.add_argument('--noise', type=float, default=0.0)
    ap.add_argument('--seq', choices=('spgr', 'bssfp'), default='spgr')
    ap.add_argument('--ndf', type=int, default=15,
                    help='bssfp: off-resonance grid points (+-40 Hz)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg, mrf, ssfp

    nTR, tr = args.ntr, args.tr
    # classic MRF flip schedule: smooth sinusoidal lobes, 10–70 deg
    t = np.arange(nTR)
    flips_deg = 10 + 60 * np.abs(np.sin(np.pi * t / 75)) * \
        (0.6 + 0.4 * np.cos(np.pi * t / nTR))
    flips = jnp.asarray(np.deg2rad(flips_deg), jnp.float32)
    phis = epg.rf_spoil_phases(nTR).astype(jnp.float32)

    # dictionary grid (log-spaced, physiological range)
    T1s = np.geomspace(0.2, 3.0, args.nt1)
    T2s = np.geomspace(0.02, 0.4, args.nt2)
    T1g, T2g = np.meshgrid(T1s, T2s, indexing='ij')
    keep = T2g < T1g                      # physical constraint T2 < T1
    atoms_T1 = jnp.asarray(T1g[keep], jnp.float32)   # (nAtoms,)
    atoms_T2 = jnp.asarray(T2g[keep], jnp.float32)

    if args.seq == 'bssfp':
        # the original MRF sequence: the signal also encodes df, so the
        # dictionary gains an off-resonance axis
        dfs = np.linspace(-40.0, 40.0, args.ndf)
        nK = atoms_T1.shape[0]
        atoms_T1 = jnp.tile(atoms_T1, args.ndf)
        atoms_T2 = jnp.tile(atoms_T2, args.ndf)
        atoms_df = jnp.asarray(np.repeat(dfs, nK), jnp.float32)

        def signals(T1, T2, df, backend='xla'):
            r"""(..., nTR, 2) bSSFP evolutions (alternating ±x)."""
            return ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=tr, df=df,
                                    backend=backend)
    else:
        atoms_df = jnp.zeros_like(atoms_T1)
        # the canonical MRF-FISP schedule (Jiang et al. MRM 74:1621,
        # 2015): adiabatic inversion + TI delay, variable flips AND
        # variable TRs (smooth pseudo-random 11.5-14.5 ms) — both the
        # prep (epg.ir_prep) and the (nTR,) tr train are first-class,
        # differentiable inputs of epg_spgr (round 4)
        ti = 0.018
        trs = jnp.asarray(tr + 0.25 * tr * (
            0.5 + 0.5 * np.sin(2 * np.pi * t / 37)
            + 0.3 * np.sin(2 * np.pi * t / 101)), jnp.float32)

        def signals(T1, T2, df, backend='xla'):
            r"""(..., nTR, 2) inversion-prepped RF-spoiled evolutions
            (df-independent)."""
            return epg.epg_spgr(flips, phis, T1=T1, T2=T2, tr=trs,
                                te=tr / 2, zinit=epg.ir_prep(ti, T1),
                                backend=backend)
    nA = atoms_T1.shape[0]

    gen = jax.jit(signals)
    # dictionary generation: the fused TPU kernel (7.5x the XLA scan at
    # 64k-atom scale); probe + refinement stay on the differentiable
    # XLA path (the kernel is forward-only)
    from mrphy_tpu.ops.pallas_kernels import _on_tpu
    if _on_tpu():
        D = signals(atoms_T1, atoms_T2, atoms_df, backend='pallas')
    else:
        D = gen(atoms_T1, atoms_T2, atoms_df)        # (nA, nTR, 2)

    # SVD temporal compression (ops/mrf): the smooth signal manifold
    # collapses to a few dozen coefficients; complex (phase-invariant)
    # scores survive because the pair basis is J-invariant
    basis = mrf.svd_basis(D, energy=1 - 1e-8)
    Dc = mrf.compress(D, basis)

    # probe voxel: ground truth intentionally OFF-grid, with a receive
    # phase the matched filter must be invariant to
    T1_true, T2_true = 0.83, 0.067
    df_true = 13.0 if args.seq == 'bssfp' else 0.0
    probe = gen(jnp.asarray(T1_true), jnp.asarray(T2_true),
                jnp.asarray(df_true))                # (nTR, 2)
    ph = 0.6
    probe0 = probe
    probe = jnp.stack(
        [np.cos(ph) * probe[..., 0] - np.sin(ph) * probe[..., 1],
         np.sin(ph) * probe[..., 0] + np.cos(ph) * probe[..., 1]], -1)
    if args.noise > 0:
        probe = probe + args.noise * jax.random.normal(
            jax.random.PRNGKey(0), probe.shape)

    # matching: streamed MXU matmuls in the compressed subspace (the
    # unrotated copy rides along to demonstrate m0 phase recovery:
    # the matched atom itself sits a small phase off the off-grid
    # truth, but the m0 phase DIFFERENCE rotated-vs-unrotated is the
    # receive phase exactly)
    res = mrf.dict_match_compressed(
        Dc, jnp.stack([probe, probe0]), basis)
    best = int(res.idx[0])
    T1_m, T2_m = float(atoms_T1[best]), float(atoms_T2[best])
    df_m = float(atoms_df[best])
    print(f'{nA} atoms x {nTR} TRs ({args.seq}), compressed '
          f'{basis.B.shape[0]} -> {basis.B.shape[1]}; truth '
          f'T1={T1_true*1e3:.0f} ms T2={T2_true*1e3:.1f} ms'
          + (f' df={df_true:.1f} Hz' if args.seq == 'bssfp' else ''))
    m0 = np.asarray(res.m0)                           # (2, 2)
    rx = (np.arctan2(m0[0, 1], m0[0, 0])
          - np.arctan2(m0[1, 1], m0[1, 0]))
    print(f'match: T1={T1_m*1e3:.0f} ms, T2={T2_m*1e3:.1f} ms'
          + (f', df={df_m:.1f} Hz' if args.seq == 'bssfp' else '')
          + f' (rx phase {rx:.3f} rad)')
    if args.noise == 0:
        assert int(res.idx[1]) == best                # same atom wins
        assert abs(rx - ph) < 1e-4, rx                # exact recovery
    # the match lands on the nearest grid atoms (log-spacing ratios)
    rat1 = float(T1s[1] / T1s[0])
    rat2 = float(T2s[1] / T2s[0])
    assert abs(np.log(T1_m / T1_true)) < np.log(rat1), (T1_m, T1_true)
    assert abs(np.log(T2_m / T2_true)) < np.log(rat2), (T2_m, T2_true)
    if args.seq == 'bssfp':
        assert abs(df_m - df_true) < float(dfs[1] - dfs[0])

    # refinement: continuous fit through the simulator from the match
    # (df parametrized in units of 100 Hz so one Adam step is ~2 Hz)
    def sig(p):
        return signals(jnp.exp(p[0]), jnp.exp(p[1]), 100.0 * p[2])

    p0 = jnp.asarray([np.log(T1_m), np.log(T2_m), df_m / 100.0])
    p, _ = mrf.match_refine(sig, p0[None], probe[None],
                            iters=args.iters, lr=0.02)
    p = p[0]
    T1_f, T2_f = float(jnp.exp(p[0])), float(jnp.exp(p[1]))
    df_f = 100.0 * float(p[2])
    e1 = abs(T1_f - T1_true) / T1_true
    e2 = abs(T2_f - T2_true) / T2_true
    print(f'fit:   T1={T1_f*1e3:.0f} ms ({e1:.2%}), '
          f'T2={T2_f*1e3:.1f} ms ({e2:.2%})'
          + (f', df={df_f:.2f} Hz' if args.seq == 'bssfp' else ''))
    if args.noise == 0:
        assert e1 < 0.02 and e2 < 0.02, (T1_f, T2_f)
        # and the refinement beats the grid quantization
        assert e1 <= abs(T1_m - T1_true) / T1_true + 1e-9
        if args.seq == 'bssfp':
            assert abs(df_f - df_true) < 1.0, df_f
    print('OK')


if __name__ == '__main__':
    main()
