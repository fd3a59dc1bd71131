r"""Exchange-sensitive MRF (MRF-X) with the canonical variable-TR
schedule: (T1a, kab) as dictionary axes of a two-pool EPG-X train.

Chemical-exchange quantitation by fingerprinting [Hamilton et al.;
Malik et al. MRM 80(2):767, 2018 for the EPG-X signal model]: a
gradient-spoiled train over a two-pool exchanging system encodes the
exchange rate ``kab`` through saturation transfer — the b-pool, with
its short T2b, loses transverse coherence every TR, and exchange
drains the observable a-pool in a flip- and TR-history-dependent way
no single-pool model reproduces. A VARIABLE-TR schedule (round 4:
``epgx_spgr(tr=<(nTR,)>)``, exact per-step 2×2 expm propagators —
the reference has no two-pool machinery at all) varies the recovery
window per TR, and TWO flip-scale segments (0.5× and 1.6× — the
b-pool's short T2b filters the high-flip segment's coherences
differently) decorrelate the T1a and kab responses: within one
segment the exchange loss is nearly a T1a re-parametrization (probed:
wrong-kab atoms correlate at 0.99987), so the example concatenates
both regimes, the same degeneracy-breaking pattern as the two-crusher
diffusion-MRF design (``mrf_diffusion.py``).

Pipeline: (T1a, kab) dictionary through the variable-TR two-pool
train → SVD compression → match an off-grid probe → continuous
(T1a, kab) refinement by Adam THROUGH the exchange simulator.
Asserts grid-neighborhood match on both axes and sub-grid refinement
recovery, plus an exchange-sensitivity check (kab must move the
signal; the single-pool limit must NOT match the exchanging probe).

Usage::

    python examples/mrfx_exchange.py [--ntr 150] [--nk 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backend', default='auto',
                    choices=['auto', 'xla', 'pallas'])
    ap.add_argument('--ntr', type=int, default=150)
    ap.add_argument('--nt1', type=int, default=10)
    ap.add_argument('--nk', type=int, default=8)
    ap.add_argument('--K', type=int, default=16)
    ap.add_argument('--iters', type=int, default=250)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import epg, mrf

    nTR = args.ntr
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        8 + 55 * np.abs(np.sin(np.pi * t / 60))), jnp.float32)
    phis = epg.rf_spoil_phases(nTR).astype(jnp.float32)
    # variable-TR schedule: modulated recovery windows (the canonical
    # MRF ingredient the scalar-tr two-pool train could not express)
    trs = jnp.asarray(0.012 + 0.006 * (0.5 + 0.5 * np.sin(
        2 * np.pi * t / 41)), jnp.float32)

    # fixed (literature-style) bound-pool properties; (T1a, kab) free
    pool = dict(T1b=1.0, T2b=0.02, M0b=0.15, T2a=0.08)
    t1g = np.geomspace(0.4, 2.2, args.nt1)
    kg = np.linspace(1.0, 15.0, args.nk)
    T1g, Kg = np.meshgrid(t1g, kg, indexing='ij')
    T1 = jnp.asarray(T1g.ravel(), jnp.float32)
    Kab = jnp.asarray(Kg.ravel(), jnp.float32)
    nA = int(T1.shape[0])

    if args.backend == 'auto':
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        backend = 'pallas' if _on_tpu() else 'xla'
    else:
        backend = args.backend
    print(f'backend: {backend}'
          + (' (round 5: variable-TR two-pool trains run the fused'
             ' kernel with native adjoints)' if backend == 'pallas'
             else ''))

    def seg(t1a, kab, fscale, trv):
        # detailed balance: kba = kab * M0a / M0b
        return epg.epgx_spgr(flips * fscale, phis, T1a=t1a,
                             T2a=pool['T2a'], T1b=pool['T1b'],
                             T2b=pool['T2b'], kab=kab,
                             kba=kab * 1.0 / pool['M0b'], M0a=1.0,
                             M0b=pool['M0b'], tr=trv, K=args.K,
                             backend=backend)

    def gen(t1a, kab):
        return jnp.concatenate([seg(t1a, kab, 0.5, trs),
                                seg(t1a, kab, 1.6, trs[::-1])],
                               axis=-2)

    D = jax.jit(gen)(T1, Kab)                      # (nA, nTR, 2)

    # exchange sensitivity: kab must move the signal...
    s_lo = gen(jnp.asarray([1.0]), jnp.asarray([1.0]))
    s_hi = gen(jnp.asarray([1.0]), jnp.asarray([15.0]))
    dev = float(jnp.max(jnp.abs(s_lo - s_hi))
                / jnp.max(jnp.abs(s_lo)))
    print(f'{nA} atoms x 2x{nTR} TR; kab signal separation '
          f'{dev * 100:.1f}%')
    assert dev > 0.02, dev

    basis = mrf.svd_basis(D, energy=1 - 1e-8)
    Dc = mrf.compress(D, basis)

    T1t, Kt = 0.93, 11.3                          # off-grid truth
    probe = gen(jnp.asarray(T1t), jnp.asarray(Kt)).reshape(-1, 2)
    res = mrf.dict_match_compressed(Dc, probe[None], basis)
    i = int(res.idx[0])
    T1m, Km = float(T1[i]), float(Kab[i])
    print(f'match: T1a={T1m * 1e3:.0f} ms, kab={Km:.1f} /s '
          f'(truth {T1t * 1e3:.0f} ms, {Kt:.1f} /s)')
    assert abs(np.log(T1m / T1t)) < np.log(t1g[1] / t1g[0]) * 1.5
    assert abs(Km - Kt) < (kg[1] - kg[0]) * 1.5, (Km, Kt)

    # ...and the single-pool limit must NOT explain the probe (the
    # exchange signature is real, not a T1a re-parametrization)
    def score(sig):
        s = sig.reshape(-1, 2)
        return float(jnp.sum(s * probe) / jnp.sqrt(
            jnp.sum(s * s) * jnp.sum(probe * probe)))

    def gen1p(t1v):
        a = epg.epg_spgr(flips * 0.5, phis, T1=t1v, T2=pool['T2a'],
                         tr=trs, K=args.K)
        b = epg.epg_spgr(flips * 1.6, phis, T1=t1v, T2=pool['T2a'],
                         tr=trs[::-1], K=args.K)
        return jnp.concatenate([a, b], axis=-2)

    best1p = max(score(gen1p(t1v)) for t1v in t1g)
    two = score(gen(jnp.asarray(T1m), jnp.asarray(Km)))
    print(f'best single-pool corr {best1p:.6f} vs matched two-pool '
          f'{two:.6f}')
    assert best1p < two, (best1p, two)

    # continuous (T1a, kab) refinement through the simulator
    p0 = {'l1': jnp.log(jnp.asarray(T1m)),
          'lk': jnp.log(jnp.asarray(Km))}

    def loss(p):
        s = gen(jnp.exp(p['l1']), jnp.exp(p['lk']))
        num = jnp.sum(s * probe)
        den = jnp.sqrt(jnp.sum(s * s) * jnp.sum(probe * probe))
        return 1.0 - num / den

    opt = optax.adam(0.02)

    @jax.jit
    def fit(p):
        st = opt.init(p)

        def stp(c, _):
            p, st = c
            ll, g = jax.value_and_grad(loss)(p)
            up, st = opt.update(g, st)
            return (optax.apply_updates(p, up), st), ll

        (p, _), ls = jax.lax.scan(stp, (p, st), None,
                                  length=args.iters)
        return p, ls

    p, ls = fit(p0)
    T1f, Kf = float(jnp.exp(p['l1'])), float(jnp.exp(p['lk']))
    e1, ek = abs(T1f / T1t - 1), abs(Kf / Kt - 1)
    print(f'refined: T1a={T1f * 1e3:.0f} ms ({e1 * 100:.2f}%), '
          f'kab={Kf:.2f} /s ({ek * 100:.2f}%)')
    assert float(ls[-1]) < float(ls[0])
    assert e1 < 0.03 and ek < 0.15, (e1, ek)
    print('OK')


if __name__ == '__main__':
    main()
