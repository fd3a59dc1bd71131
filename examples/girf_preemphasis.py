r"""Gradient pre-emphasis through the measured system response (GIRF).

A gradient chain with eddy currents plays a smoothed, lagging version
of the commanded waveform. This demo:

1. builds an eddy-current impulse response (`exp_decay_girf`),
2. solves the convex pre-emphasis problem — find the COMMANDED
   waveform whose PLAYED (convolved) version matches a desired
   trapezoid — by gradient descent through `apply_girf`,
3. designs a slab-inversion pulse THROUGH the response with
   ``design_pulse(girf_=...)`` and shows the girf-aware loss is fit on
   the *played* gradients (the deployable contract).

Usage::

    python examples/girf_preemphasis.py [--nt 256]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nt', type=int, default=256)
    ap.add_argument('--iters', type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu import dt0
    from mrphy_tpu.utils import apply_girf, exp_decay_girf

    dt = float(dt0)
    nT = args.nt

    # a realistic response: 2-sample delay + two eddy-current terms
    h = jnp.asarray(exp_decay_girf(64, dt, delay_samples=2,
                                   amps=(0.08, 0.02),
                                   taus=(8e-5, 8e-4)), jnp.float64)

    # desired PLAYED gradient: a trapezoid (ramp up, plateau, ramp
    # down), padded past the chain's group delay — samples inside the
    # delay are causally unreachable by ANY commanded waveform
    pad, ramp = 8, nT // 8
    plateau = nT - 2 * ramp - 2 * pad
    gstar = np.concatenate([np.zeros(pad),
                            np.linspace(0, 2.0, ramp),
                            np.full(plateau, 2.0),
                            np.linspace(2.0, 0, ramp),
                            np.zeros(pad)])
    gstar = jnp.asarray(np.tile(gstar, (1, 3, 1)), jnp.float64)

    naive_err = float(jnp.max(jnp.abs(apply_girf(gstar, h) - gstar)))

    def loss(g):
        return jnp.mean((apply_girf(g, h) - gstar) ** 2)

    opt = optax.adam(3e-2)
    g, state = gstar, opt.init(gstar)

    @jax.jit
    def step(g, state):
        grads = jax.grad(loss)(g)
        upd, state = opt.update(grads, state, g)
        return optax.apply_updates(g, upd), state

    for _ in range(args.iters):
        g, state = step(g, state)

    played = apply_girf(g, h)
    pre_err = float(jnp.max(jnp.abs(played - gstar)))
    preemph = float(jnp.max(jnp.abs(g - gstar)))
    print(f'uncompensated played error : {naive_err:.4f} Gauss/cm (peak)')
    print(f'pre-emphasized played error: {pre_err:.6f} Gauss/cm (peak)')
    print(f'pre-emphasis magnitude     : {preemph:.4f} Gauss/cm (peak)')
    assert pre_err < 0.02 * naive_err, (pre_err, naive_err)
    assert preemph > 10 * pre_err

    # girf-aware Bloch design: the loss simulates the played gradients
    from mrphy_tpu.design import design_pulse, DesignConfig
    from mrphy_tpu.models.mobjs import Examples
    cube, p = Examples.spincube(), Examples.pulse()
    Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                     (1, cube.nM, 1))
    cfg = DesignConfig(niter=20, lr=0.01, rfmax=12.0, smax=5e6, dt=dt)
    pg, losses = design_pulse(cube, p, Mtgt_, cfg=cfg,
                              girf_=jnp.asarray(h, jnp.float32))
    print(f'girf-aware design loss: {float(losses[0]):.4f} -> '
          f'{float(jnp.min(losses)):.4f} (over {cfg.niter} iters)')
    assert np.isfinite(np.asarray(losses)).all()
    print('OK')


if __name__ == '__main__':
    main()
