r"""Quantitative magnetization transfer (qMT): fit the bound-pool
fraction, exchange rate, and bound-pool T2 from MT-SPGR steady states.

The clinical qMT protocol (Sled & Pike / Ramani): acquire RF-spoiled
GRE volumes while a shaped off-resonance pulse saturates the
macromolecular pool, over a grid of (offset Δ, saturation power ω₁rms)
— the Z-spectrum of the bound pool. Here the forward model is the
framework's :func:`mrphy_tpu.ops.epg.epgx_mt_spgr` steady state with
the saturation rate ``W = π·ω₁rms²·G(Δ; T2b)`` through the
super-Lorentzian lineshape — and since *everything* is differentiable
(including ``T2b`` through the lineshape quadrature), the fit is plain
Adam on log-parametrized ``(F, k_ba, T2b)`` per voxel:

1. simulate the protocol for voxels with heterogeneous ground truth
   (+ receiver noise);
2. jointly fit all voxels (one jitted ``lax.scan``);
3. assert the recovered maps.

Usage::

    python examples/qmt_fit.py [--nvox 12] [--iters 600]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nvox', type=int, default=12)
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--lr', type=float, default=0.05)
    ap.add_argument('--ntr', type=int, default=300,
                    help='TRs to steady state')
    ap.add_argument('--noise', type=float, default=0.1,
                    help='noise std, percent of the unsaturated signal')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import epg

    nv = args.nvox
    rng = np.random.default_rng(0)
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # ---- ground truth (white/gray-matter-ish) ----
    F = rng.uniform(0.06, 0.22, nv)           # bound-pool fraction
    kba = rng.uniform(8.0, 25.0, nv)          # bound -> free, 1/s
    T2b = rng.uniform(9e-6, 13e-6, nv)        # bound-pool T2
    T1a, T1b, T2a, tr = 1.1, 1.0, 0.06, 0.03
    flip = np.deg2rad(10.0)

    # ---- protocol: offsets x powers; tau_sat per TR ----
    offs = np.asarray([2e3, 4e3, 8e3, 16e3, 32e3])          # Hz
    w1rms = 2 * np.pi * np.asarray([350.0, 700.0])          # rad/s
    tau_sat = 0.015                                         # s per TR
    nm = len(offs) * len(w1rms)

    def model(logp):
        p = {k: jnp.exp(v) for k, v in logp.items()}
        Fv, kv, t2bv = p['F'], p['kba'], p['T2b']
        M0b = Fv                                            # (nv,)
        M0a = 1.0 - Fv
        kab = kv * M0b / M0a
        outs = []
        fl = jnp.full(args.ntr, flip, f64)
        ph = epg.rf_spoil_phases(args.ntr)
        for d in offs:
            G = epg.mt_lineshape(jnp.asarray(d, f64), t2bv)  # (nv,)
            for w1 in w1rms:
                wt = jnp.pi * w1 ** 2 * G * tau_sat          # (nv,)
                s = epg.epgx_mt_spgr(
                    fl, ph, T1a=T1a, T2a=T2a, T1b=T1b, kab=kab,
                    kba=kv, tr=tr, wt=wt[:, None], M0a=M0a, M0b=M0b,
                    K=48)             # truncated orders: E2^K ~ 0
                outs.append(jnp.hypot(s[..., -1, 0], s[..., -1, 1]))
        return jnp.stack(outs, -1)                           # (nv, nm)

    truth = dict(F=jnp.log(jnp.asarray(F, f64)),
                 kba=jnp.log(jnp.asarray(kba, f64)),
                 T2b=jnp.log(jnp.asarray(T2b, f64)))
    y = model(truth)
    sigma = args.noise / 100 * float(y.max())
    y = y + sigma * jnp.asarray(rng.standard_normal(y.shape), f64)
    print(f'{nv} voxels, {nm} (offset, power) measurements, '
          f'noise {sigma:.1e}')

    p0 = dict(F=jnp.log(jnp.full(nv, 0.12, f64)),
              kba=jnp.log(jnp.full(nv, 15.0, f64)),
              T2b=jnp.log(jnp.full(nv, 11e-6, f64)))

    def loss_fn(logp):
        return jnp.mean((model(logp) - y) ** 2)

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

    logp, losses = fit(p0)
    Ff = np.exp(np.asarray(logp['F']))
    kf = np.exp(np.asarray(logp['kba']))
    t2f = np.exp(np.asarray(logp['T2b']))
    eF = np.abs(Ff - F) / F
    ek = np.abs(kf - kba) / kba
    et = np.abs(t2f - T2b) / T2b
    print(f'fit: loss {float(losses[0]):.2e} -> {float(losses[-1]):.2e}')
    print(f'F    median rel err {100*np.median(eF):.2f}% '
          f'(max {100*eF.max():.1f}%)')
    print(f'kba  median rel err {100*np.median(ek):.2f}% '
          f'(max {100*ek.max():.1f}%)')
    print(f'T2b  median rel err {100*np.median(et):.2f}% '
          f'(max {100*et.max():.1f}%)')
    assert np.median(eF) < 0.03, np.median(eF)
    assert np.median(et) < 0.03, np.median(et)
    assert np.median(ek) < 0.15, np.median(ek)   # weakest parameter
    print('qmt fit OK: (F, kba, T2b) recovered through the EPG-X(MT) '
          'steady state')


if __name__ == '__main__':
    main()
