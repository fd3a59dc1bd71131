r"""Joint T2 + ADC mapping from diffusion-weighted echo trains.

CPMG echo trains acquired at several crusher strengths decay with BOTH
T2 and diffusion: stronger crushers dephase further between refocusing
pulses, so stored magnetization diffuses away faster. With the exact
per-order EPG diffusion operator (:func:`mrphy_tpu.ops.epg
.epg_diffusion`) the whole forward model is differentiable in (T2, D),
so the joint fit is plain gradient descent through the simulator —
the same qMRI recipe as ``examples/qmri_fit.py``, now with diffusion.

The refocusing train is deliberately imperfect (~150°): stimulated-echo
pathways then store magnetization longitudinally where it diffuses
under k² (not the transverse (k² + k + 1/3)) weighting — a regime where
mono-exponential b-value fits are biased but the EPG model is exact.

Usage::

    python examples/dwi_adc_fit.py [--nvox 64] [--iters 400]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nvox', type=int, default=64)
    ap.add_argument('--nechoes', type=int, default=16)
    ap.add_argument('--esp', type=float, default=0.012)
    ap.add_argument('--iters', type=int, default=400)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu import pi
    from mrphy_tpu.ops import epg

    rng = np.random.default_rng(args.seed)
    nV, nE, esp = args.nvox, args.nechoes, args.esp
    T2_true = jnp.asarray(rng.uniform(0.04, 0.15, nV))
    D_true = jnp.asarray(rng.uniform(0.8e-5, 3.0e-5, nV))  # cm^2/s
    T1 = 1.2
    # imperfect refocusing -> stimulated echoes -> D and T2 decouple
    flips = jnp.deg2rad(150.0) * jnp.ones(nE)
    dks = jnp.asarray([150.0, 450.0, 900.0])    # rad/cm per half-esp

    def model(T2, D):
        # (nDk, nV, nE) echo magnitudes
        def one(dk):
            e = epg.epg_cpmg(jnp.broadcast_to(flips, (nV, nE)),
                             T1=T1, T2=T2, esp=esp, D=D, dk=dk)
            return jnp.hypot(e[..., 0], e[..., 1])
        return jax.vmap(one)(dks)

    target = model(T2_true, D_true)
    b_eff = float(esp * dks[-1] ** 2 / 3)
    print(f'{nV} voxels, {nE} echoes x {len(dks)} crushers; '
          f'max per-echo bD ~ {b_eff * float(D_true.max()):.3f}')

    # fit in log-space (positivity + conditioning)
    p0 = {'lt2': jnp.log(0.08 * jnp.ones(nV)),
          'ld': jnp.log(1.5e-5 * jnp.ones(nV))}

    @jax.jit
    def loss(p):
        m = model(jnp.exp(p['lt2']), jnp.exp(p['ld']))
        return jnp.mean((m - target) ** 2)

    opt = optax.adam(0.03)
    state = opt.init(p0)

    @jax.jit
    def step(p, state):
        ls, g = jax.value_and_grad(loss)(p)
        up, state = opt.update(g, state)
        return optax.apply_updates(p, up), state, ls

    p = p0
    for i in range(args.iters):
        p, state, ls = step(p, state)
        if i % 100 == 0 or i == args.iters - 1:
            print(f'iter {i:4d}  loss {float(ls):.3e}')

    T2_fit, D_fit = jnp.exp(p['lt2']), jnp.exp(p['ld'])
    errT2 = float(jnp.abs(T2_fit - T2_true).max() / T2_true.min())
    errD = float(jnp.abs(D_fit - D_true).max() / D_true.min())
    print(f'max rel err: T2 {100 * errT2:.2f}%  ADC {100 * errD:.2f}%')
    assert errT2 < 0.02 and errD < 0.05, (errT2, errD)
    print('joint T2+ADC recovery OK')


if __name__ == '__main__':
    main()
