r"""Joint (T1, T2) recovery from a two-shot echo train, via EPG.

Fingerprinting-style quantitation: a single CPMG train barely encodes
T1, but firing a SECOND train after a short recovery delay makes the
second shot's amplitude depend on how much longitudinal magnetization
recovered — T1 — while both trains' decays encode T2 (with
stimulated-echo contributions at the reduced refocusing angles, which
bias naive exponential fits but are modeled exactly by EPG). Both
parameters are then recovered jointly by gradient descent *through* the
EPG simulator, composed from its primitives
(:func:`mrphy_tpu.ops.epg.epg_rf` / ``epg_grad`` / ``epg_relax``).

Usage::

    python examples/epg_multiparam_fit.py [--T1 0.9] [--T2 0.07]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--T1', type=float, default=0.9)
    ap.add_argument('--T2', type=float, default=0.07)
    ap.add_argument('--esp', type=float, default=0.012)
    ap.add_argument('--nE', type=int, default=10)
    ap.add_argument('--TD', type=float, default=0.3,
                    help='recovery delay between the two shots, Sec')
    ap.add_argument('--iters', type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu import pi
    from mrphy_tpu.ops import epg

    nE, esp, TD = args.nE, args.esp, args.TD
    rng = np.random.default_rng(0)
    flips = jnp.asarray(np.deg2rad(rng.uniform(110, 170, nE)))

    def two_shot(T1, T2):
        r"""Two CPMG shots separated by an incomplete-recovery delay;
        returns the 2*nE echo magnitudes."""
        K = 2 * nE + 2
        s = epg.epg_state(K, (), dtype=flips.dtype)

        def train(s):
            s = epg.epg_rf(s, pi / 2, pi / 2)
            echoes = []
            for a in flips:
                s = epg.epg_grad(epg.epg_relax(s, esp / 2, T1, T2))
                s = epg.epg_rf(s, a, 0.0)
                s = epg.epg_grad(epg.epg_relax(s, esp / 2, T1, T2))
                echoes.append(jnp.hypot(s[..., 0, 0, 0],
                                        s[..., 0, 0, 1]))
            return s, jnp.stack(echoes)

        s, e1 = train(s)
        s = epg.epg_relax(s, TD, T1, T2)       # incomplete T1 recovery
        _, e2 = train(s)
        return jnp.concatenate([e1, e2])

    T1t, T2t = args.T1, args.T2
    data = two_shot(T1t, T2t)
    print(f'truth: T1={T1t*1e3:.0f} ms, T2={T2t*1e3:.1f} ms; '
          f'shot-2/shot-1 first-echo ratio '
          f'{float(data[args.nE]/data[0]):.3f} (T1 encoding)')

    def loss(p):
        e = two_shot(jnp.exp(p[0]), jnp.exp(p[1]))
        return jnp.sum((e - data) ** 2)

    p0 = jnp.log(jnp.asarray([0.4, 0.03]))    # poor init
    opt = optax.adam(0.05)

    @jax.jit
    def fit(p, st):
        def body(carry, _):
            p, st = carry
            up, st = opt.update(jax.grad(loss)(p), st)
            return (optax.apply_updates(p, up), st), None
        (p, st), _ = jax.lax.scan(body, (p, st), None,
                                  length=args.iters)
        return p

    p = fit(p0, opt.init(p0))
    T1f, T2f = float(jnp.exp(p[0])), float(jnp.exp(p[1]))
    e1 = abs(T1f - T1t) / T1t
    e2 = abs(T2f - T2t) / T2t
    print(f'fit:   T1={T1f*1e3:.0f} ms ({e1:.2%}), '
          f'T2={T2f*1e3:.1f} ms ({e2:.2%})')
    assert e1 < 0.02 and e2 < 0.02, (T1f, T2f)
    print('OK')


if __name__ == '__main__':
    main()
