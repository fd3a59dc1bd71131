r"""Optimal experiment design: minimize the CRLB of (T1, T2) over an
MRF/SPGR flip-angle train.

The Cramér–Rao lower bound says any unbiased (T1, T2, M0) estimator has
variance ≥ diag(F⁻¹), with Fisher information ``F = Jᵀ J / σ²`` and
``J = ∂signal/∂(T1, T2, M0)``. Because the EPG signal model here is
differentiable, J is one ``jax.jacfwd`` — and because THAT is also
differentiable, the acquisition protocol itself can be optimized by
gradient descent on the CRLB (nested AD: ``grad`` of a loss containing
``jacfwd`` and a matrix inverse). This is the standard MRF sequence
optimization formulation, and it is ~40 lines here because the
simulator is the model.

The optimized train must beat a constant-flip train of the same length
and RF energy budget on the same tissue.

Usage::

    python examples/crlb_protocol.py [--ntr 48] [--iters 300]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ntr', type=int, default=48)
    ap.add_argument('--tr', type=float, default=0.012, help='Sec')
    ap.add_argument('--te', type=float, default=0.004, help='Sec')
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--lr', type=float, default=0.05)
    ap.add_argument('--flipmax', type=float, default=70., help='deg')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import epg

    nTR, tr, te = args.ntr, args.tr, args.te
    T1n, T2n, M0n = 0.8, 0.08, 1.0             # nominal tissue
    fmax = np.deg2rad(args.flipmax)

    def signal(theta, flips):
        T1, T2, M0 = theta
        s = epg.epg_spgr(flips, T1=T1, T2=T2, tr=tr, te=te, M0=M0)
        return s.reshape(-1)                    # (nTR*2,) re/im stacked

    theta0 = jnp.asarray([T1n, T2n, M0n])

    def crlb(flips):
        J = jax.jacfwd(signal)(theta0, flips)   # (nTR*2, 3)
        # scale-free Fisher: normalize params so CRLB is relative
        J = J * theta0[None, :]
        F = J.T @ J + 1e-9 * jnp.eye(3)
        C = jnp.linalg.inv(F)
        return jnp.diagonal(C)                  # rel. var. of T1,T2,M0

    # parametrize flips in (0, fmax) via sigmoid; start near-constant
    def to_flips(u):
        return fmax * jax.nn.sigmoid(u)

    u0 = jnp.zeros(nTR) + jax.nn.initializers.normal(1e-2)(
        jax.random.key(0), (nTR,))

    @jax.jit
    def loss(u):
        c = crlb(to_flips(u))
        return c[0] + c[1]                      # T1 + T2 rel. CRLB

    const = jnp.full(nTR, np.deg2rad(15.))      # baseline: constant 15 deg
    c_const = np.asarray(crlb(const))
    print(f'constant-15deg train: rel CRLB T1 {c_const[0]:.4f}, '
          f'T2 {c_const[1]:.4f}, M0 {c_const[2]:.4f}')

    opt = optax.adam(args.lr)
    state = opt.init(u0)

    @jax.jit
    def step(u, state):
        ls, g = jax.value_and_grad(loss)(u)
        up, state = opt.update(g, state)
        return optax.apply_updates(u, up), state, ls

    u = u0
    for i in range(args.iters):
        u, state, ls = step(u, state)
        if i % 100 == 0 or i == args.iters - 1:
            print(f'iter {i:4d}  CRLB(T1)+CRLB(T2) {float(ls):.5f}')

    flips = to_flips(u)
    c_opt = np.asarray(crlb(flips))
    print(f'optimized train   : rel CRLB T1 {c_opt[0]:.4f}, '
          f'T2 {c_opt[1]:.4f}, M0 {c_opt[2]:.4f}')
    print(f'flip range {np.rad2deg(float(flips.min())):.1f}..'
          f'{np.rad2deg(float(flips.max())):.1f} deg')
    gain = (c_const[0] + c_const[1]) / (c_opt[0] + c_opt[1])
    print(f'T1+T2 CRLB improvement: {gain:.2f}x')
    assert gain > 2.0, gain
    assert float(flips.max()) <= fmax + 1e-6
    print('CRLB protocol optimization OK')


if __name__ == '__main__':
    main()
