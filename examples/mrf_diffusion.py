r"""Diffusion-sensitized MRF: ADC as a third dictionary axis.

An unbalanced (FISP-style) MRF train dephases stored magnetization by
one spoiler k-quantum per TR, so every configuration order k diffuses
under its exact b-factor ``b_T(k) = τ·dk²·(k² + kδ + δ²/3)`` /
``b_L(k) = τ·dk²·k²`` (:func:`mrphy_tpu.ops.epg.epg_diffusion`).
Within ONE train a fixed crusher's diffusion loss is nearly degenerate
with T2 decay, so the acquisition concatenates TWO segments with weak
and strong crushers (two b-value regimes — the standard diffusion-MRF
design): their ratio isolates D while the common decay pins T2.

Round 4: ``epg_spgr(backend='pallas')`` models the spoiler diffusion
IN-KERNEL (per-order attenuation planes computed once per atom tile
from the prescaled ``D·dk²·tr`` row) and its hand-transposed adjoint
carries the dD chain — so (T1, T2, D) dictionaries generate at fused
speed and continuous (T1, T2, D) refinement runs by gradient descent
through the kernel.

Pipeline: fused (T1, T2, D) dictionary → SVD compression → match →
continuous refinement through the simulator; asserts the matched atom
lands on the truth's grid neighborhood in ALL THREE axes and that
refinement recovers off-grid (T1, T2, D) below grid resolution.

Usage::

    python examples/mrf_diffusion.py [--ntr 200] [--nd 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ntr', type=int, default=200)
    ap.add_argument('--nt1', type=int, default=10)
    ap.add_argument('--nt2', type=int, default=10)
    ap.add_argument('--nd', type=int, default=8)
    ap.add_argument('--tr', type=float, default=0.013)
    ap.add_argument('--dk', type=float, nargs=2,
                    default=[120.0, 600.0],
                    help='spoiler k-quanta, Rad/cm: a weak and a '
                         'strong crusher segment — within ONE train '
                         'T2 and D are nearly degenerate (diffusion '
                         'under a fixed crusher mimics T2 decay); '
                         'two b-value segments separate them, the '
                         'standard diffusion-MRF design')
    ap.add_argument('--K', type=int, default=32)
    ap.add_argument('--iters', type=int, default=250)
    ap.add_argument('--vartr', action='store_true',
                    help='Perlin-ish variable-TR trains (the '
                         'canonical FISP schedule) — the kernel '
                         'recomputes the per-order diffusion planes '
                         'per TR from the D*dk^2 rate row')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import epg, mrf

    nTR = args.ntr
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 60 * np.abs(np.sin(np.pi * t / 75))), jnp.float32)
    phis = epg.rf_spoil_phases(nTR).astype(jnp.float32)

    # (T1, T2, D) grid — D in physiological range (pure water ~3e-5,
    # parenchyma ~0.7-1e-5 cm^2/s)
    t1g = np.geomspace(0.3, 2.5, args.nt1)
    t2g = np.geomspace(0.03, 0.3, args.nt2)
    dg = np.geomspace(0.4e-5, 3.2e-5, args.nd)
    T1g, T2g, Dg = np.meshgrid(t1g, t2g, dg, indexing='ij')
    keep = T2g < T1g
    T1 = jnp.asarray(T1g[keep], jnp.float32)
    T2 = jnp.asarray(T2g[keep], jnp.float32)
    Dd = jnp.asarray(Dg[keep], jnp.float32)
    nA = int(T1.shape[0])

    from mrphy_tpu.ops.pallas_kernels import _on_tpu
    backend = 'pallas' if _on_tpu() else 'xla'

    if args.vartr:   # variable-TR FISP schedule + diffusion (round 4)
        trs = jnp.asarray(args.tr * (1 + 0.25 * np.sin(
            2 * np.pi * t / 47)), jnp.float32)
    else:
        trs = args.tr

    def gen(t1, t2, d, be=backend):
        r"""Two crusher-strength segments concatenated on the echo
        axis — the fingerprint carries both b-value regimes."""
        segs = [epg.epg_spgr(flips, phis, T1=t1, T2=t2, tr=trs,
                             te=2e-3, zinit=epg.ir_prep(0.018, t1),
                             D=d, dk=dkv, K=args.K, backend=be)
                for dkv in args.dk]
        return jnp.concatenate(segs, axis=-2)

    D = jax.jit(gen)(T1, T2, Dd)                   # (nA, nTR, 2)
    # sanity: the D axis must actually move the signal (diffusion
    # sensitivity) — compare extreme-D twins at fixed (T1, T2)
    s_lo = gen(jnp.asarray([1.0]), jnp.asarray([0.08]),
               jnp.asarray([0.4e-5]))
    s_hi = gen(jnp.asarray([1.0]), jnp.asarray([0.08]),
               jnp.asarray([3.2e-5]))
    dev = float(jnp.max(jnp.abs(s_lo - s_hi))
                / jnp.max(jnp.abs(s_lo)))
    print(f'{nA} atoms x 2x{nTR} TR; D-axis signal separation '
          f'{dev * 100:.1f}%')
    assert dev > 0.02, dev                  # >2% — matchable

    basis = mrf.svd_basis(D, energy=1 - 1e-8)
    Dc = mrf.compress(D, basis)

    # off-grid truth probe (the pallas backend returns a leading
    # length-1 atom axis for scalar tissue inputs — drop it)
    T1t, T2t, Dt = 0.91, 0.072, 1.37e-5
    probe = gen(jnp.asarray(T1t), jnp.asarray(T2t), jnp.asarray(Dt))
    probe = probe.reshape(-1, 2)
    res = mrf.dict_match_compressed(Dc, probe[None], basis)
    i = int(res.idx[0])
    T1m, T2m, Dm = float(T1[i]), float(T2[i]), float(Dd[i])
    print(f'match: T1={T1m * 1e3:.0f} ms, T2={T2m * 1e3:.1f} ms, '
          f'D={Dm * 1e5:.2f}e-5 (truth {T1t * 1e3:.0f}/'
          f'{T2t * 1e3:.1f}/{Dt * 1e5:.2f}e-5)')
    for got, tru, grid in ((T1m, T1t, t1g), (T2m, T2t, t2g),
                           (Dm, Dt, dg)):
        rat = grid[1] / grid[0]
        assert abs(np.log(got / tru)) < np.log(rat) * 1.5, (got, tru)

    # continuous (T1, T2, D) refinement through the simulator
    p0 = {'l1': jnp.log(jnp.asarray(T1m)),
          'l2': jnp.log(jnp.asarray(T2m)),
          'ld': jnp.log(jnp.asarray(Dm))}

    def loss(p):
        s = gen(jnp.exp(p['l1']), jnp.exp(p['l2']), jnp.exp(p['ld']))
        num = jnp.sum(s * probe)
        den = jnp.sqrt(jnp.sum(s * s) * jnp.sum(probe * probe))
        return 1.0 - num / den            # scale-invariant mismatch

    opt = optax.adam(0.03)

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
    T1f = float(jnp.exp(p['l1']))
    T2f = float(jnp.exp(p['l2']))
    Df = float(jnp.exp(p['ld']))
    e1, e2, ed = (abs(T1f / T1t - 1), abs(T2f / T2t - 1),
                  abs(Df / Dt - 1))
    print(f'refined: T1={T1f * 1e3:.0f} ms ({e1 * 100:.2f}%), '
          f'T2={T2f * 1e3:.1f} ms ({e2 * 100:.2f}%), '
          f'D={Df * 1e5:.3f}e-5 ({ed * 100:.2f}%)')
    assert float(ls[-1]) < float(ls[0])
    assert e1 < 0.03 and e2 < 0.03 and ed < 0.10, (e1, e2, ed)
    print('OK')


if __name__ == '__main__':
    main()
