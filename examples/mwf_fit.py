r"""Myelin-water fraction (MWF) mapping through the EPG-X echo model.

Multi-component T2 relaxometry is the classic myelin measure: white
matter behaves as a short-T2 "myelin water" pool exchanging with a
long-T2 intra/extracellular pool. Two things bias naive
multi-exponential fits — **stimulated echoes** from imperfect (B1 < 1)
refocusing, and **exchange** between the pools. The EPG-X train
(:func:`mrphy_tpu.ops.epg.epgx_cpmg`) models both exactly, and is
differentiable in every tissue parameter, so the fit is plain gradient
descent through the forward model:

1. simulate a 32-echo CPMG per voxel with heterogeneous ground-truth
   (MWF, T2 of both pools) and a per-voxel B1 error scaling the
   refocusing train (0.82–1.0), plus receiver noise;
2. recover log-parametrized ``(M0a, M0b, T2a, T2b)`` per voxel by Adam
   through ``epgx_cpmg`` (exchange rate and B1 map known, the usual
   protocol assumption), one jitted ``lax.scan``;
3. report the MWF error — and the bias a single-pool/no-stimulated-echo
   exponential fit would have made on the same data.

Asserts: median |MWF error| < 0.01 absolute; EPG-X fit beats the
log-linear biexponential-free baseline by a wide margin.

Usage::

    python examples/mwf_fit.py [--nvox 24] [--iters 800]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nvox', type=int, default=24)
    ap.add_argument('--ne', type=int, default=32, help='echoes')
    ap.add_argument('--esp', type=float, default=0.01, help='s')
    ap.add_argument('--iters', type=int, default=800)
    ap.add_argument('--lr', type=float, default=0.03)
    ap.add_argument('--noise', type=float, default=0.2,
                    help='noise std, percent of the first echo')
    ap.add_argument('--mesh', action='store_true',
                    help='voxel-shard the EPG-X trains over all '
                         'devices (nvox must divide the device count)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import epg

    nv, ne = args.nvox, args.ne
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    # ---- ground truth: white-matter-ish two-pool parameters ----
    mwf = rng.uniform(0.05, 0.30, nv)                   # myelin fraction
    T2a = rng.uniform(0.060, 0.095, nv)                 # IE water
    T2b = rng.uniform(0.010, 0.022, nv)                 # myelin water
    T1a, T1b = 1.0, 0.4
    kba = 3.0                                           # myelin -> IE
    b1 = rng.uniform(0.82, 1.0, nv)                     # known B1 map
    M0b = mwf
    M0a = 1.0 - mwf
    kab = kba * M0b / M0a                               # detailed bal.

    flips = jnp.asarray(np.pi * b1[:, None]
                        * np.ones((nv, ne)), f32)       # B1-scaled 180s

    mesh = None
    if args.mesh:
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        assert nv % mesh.shape['spins'] == 0

    def train(p):
        return epg.epgx_cpmg(
            flips, T1a=T1a, T2a=p['T2a'], T1b=T1b, T2b=p['T2b'],
            kab=kba * p['M0b'] / p['M0a'], kba=kba, esp=args.esp,
            M0a=p['M0a'], M0b=p['M0b'], mesh=mesh)

    truth = dict(M0a=jnp.asarray(M0a, f32), M0b=jnp.asarray(M0b, f32),
                 T2a=jnp.asarray(T2a, f32), T2b=jnp.asarray(T2b, f32))
    ech = train(truth)                                  # (nv, ne, 2)
    sigma = args.noise / 100 * float(jnp.abs(ech[:, 0]).max())
    ech = ech + sigma * jnp.asarray(
        rng.standard_normal(ech.shape), f32)
    print(f'{nv} voxels, {ne} echoes @ {args.esp*1e3:.0f} ms, '
          f'MWF in [{mwf.min():.2f}, {mwf.max():.2f}], '
          f'B1 in [{b1.min():.2f}, {b1.max():.2f}], '
          f'noise {sigma:.1e}')

    # ---- EPG-X fit: Adam on log-parametrized pools ----
    p0 = dict(M0a=jnp.full(nv, 0.85, f32), M0b=jnp.full(nv, 0.15, f32),
              T2a=jnp.full(nv, 0.070, f32), T2b=jnp.full(nv, 0.018,
                                                         f32))
    logp0 = {k: jnp.log(v) for k, v in p0.items()}

    def loss_fn(logp):
        p = {k: jnp.exp(v) for k, v in logp.items()}
        return jnp.mean((train(p) - ech) ** 2)

    opt = optax.adam(args.lr)

    @jax.jit
    def fit(logp):
        state = opt.init(logp)

        def body(carry, _):
            logp, state = carry
            loss, g = jax.value_and_grad(loss_fn)(logp)
            upd, state = opt.update(g, state, logp)
            return (optax.apply_updates(logp, upd), state), loss

        (logp, _), losses = jax.lax.scan(body, (logp, state), None,
                                         length=args.iters)
        return logp, losses

    logp, losses = fit(logp0)
    p = {k: np.asarray(jnp.exp(v)) for k, v in logp.items()}
    mwf_fit = p['M0b'] / (p['M0a'] + p['M0b'])
    err = np.abs(mwf_fit - mwf)
    print(f'fit: loss {float(losses[0]):.2e} -> {float(losses[-1]):.2e}'
          f', MWF |err| median {np.median(err):.4f}, '
          f'max {err.max():.4f}')

    # ---- baseline: log-linear late-echo monoexponential carries the
    # stimulated-echo/exchange bias; its early-echo excess estimates
    # MWF the pre-EPG way ----
    mag = np.hypot(np.asarray(ech)[..., 0], np.asarray(ech)[..., 1])
    te = args.esp * (1 + np.arange(ne))
    late = slice(ne // 2, None)
    A = np.stack([np.ones(ne)[late], -te[late]], -1)
    coef = np.linalg.lstsq(A, np.log(np.maximum(mag[:, late], 1e-9)).T,
                           rcond=None)[0]
    long_amp = np.exp(coef[0])
    mwf_naive = 1 - long_amp / np.maximum(mag[:, 0] * np.exp(
        te[0] * coef[1]), 1e-9)
    err_naive = np.abs(np.clip(mwf_naive, 0, 1) - mwf)
    print(f'naive biexp-split baseline: MWF |err| median '
          f'{np.median(err_naive):.4f} (stimulated-echo + exchange '
          f'bias)')

    assert np.median(err) < 0.01, np.median(err)
    assert np.median(err) < 0.5 * np.median(err_naive), (
        np.median(err), np.median(err_naive))
    print('mwf fit OK: EPG-X gradient fit recovers the myelin-water '
          'fraction')


if __name__ == '__main__':
    main()
