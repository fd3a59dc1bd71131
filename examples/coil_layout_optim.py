r"""Differentiable coil-array layout optimization through the g-factor.

The receive-array geometry sets the parallel-imaging noise penalty: the
SENSE g-factor [Pruessmann 1999] measures how well the coil
sensitivities separate aliasing pixels. Because this framework's coil
fields are *physical and differentiable* (:mod:`mrphy_tpu.utils.biot`:
exact Biot–Savart loops, differentiable in placement) and its g-factor
is an analytic jittable map (:func:`mrphy_tpu.utils.gfactor_sense`),
the array layout itself can be optimized by gradient descent — a
design loop over HARDWARE geometry rather than waveforms.

Setup: 8 loop coils on a ring around a disc ROI, deliberately
clustered into one third of the circle (a pathological layout: the
coils barely distinguish pixels aliasing along y). One jitted Adam
scan moves the loop azimuths to minimize the ROI-mean g² for R=2
SENSE, differentiating through: loop azimuth → loop center/normal →
Biot–Savart field → B1⁻ maps → R×R aliasing-set inversions → g map.

Asserts: the optimizer spreads the cluster (azimuth span grows), the
ROI max g-factor improves ≥ 1.5×, and the optimized layout lands near
the uniform-ring performance (within 10%).

Usage::

    python examples/coil_layout_optim.py [--n 32] [--iters 200]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32, help='grid size')
    ap.add_argument('--nc', type=int, default=8, help='coils')
    ap.add_argument('--R', type=int, default=2, help='acceleration')
    ap.add_argument('--iters', type=int, default=200)
    ap.add_argument('--fov', type=float, default=20.0, help='cm')
    ap.add_argument('--ring', type=float, default=12.0, help='cm')
    ap.add_argument('--loop', type=float, default=5.0, help='cm')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.utils import gfactor_sense
    from mrphy_tpu.utils.biot import loop_b1

    n, nC, R = args.n, args.nc, args.R
    g1d = (np.arange(n) - n / 2 + 0.5) * (args.fov / n)
    X, Y = np.meshgrid(g1d, g1d, indexing='ij')
    pts = jnp.asarray(np.stack([X, Y, np.zeros_like(X)], -1)
                      .reshape(-1, 3))
    roi = jnp.asarray((X ** 2 + Y ** 2 <= 7.0 ** 2))
    nroi = float(roi.sum())

    def maps_of(phis):
        c, s = jnp.cos(phis), jnp.sin(phis)
        centers = args.ring * jnp.stack([c, s, jnp.zeros_like(c)], -1)
        normals = -jnp.stack([c, s, jnp.zeros_like(c)], -1)
        b1 = loop_b1(pts, center=centers, normal=normals,
                     radius=args.loop)              # (n², 2, nC)
        # NO support masking: zeroed pixels would put sqrt(0) inside
        # gfactor_sense and its NaN gradient survives any outer
        # jnp.where (the where-grad trap); physical loop fields are
        # nonzero everywhere, so every aliasing set stays regular.
        return b1.reshape(n, n, 2, nC)

    def gmap_of(phis):
        return gfactor_sense(maps_of(phis), R, axis=1)

    def stats(phis):
        g = gmap_of(phis)
        gr = jnp.where(roi, g, 1.0)
        return float(gr.max()), float((jnp.where(roi, g, 0.0)).sum()
                                      / nroi)

    def loss(phis):
        g = gmap_of(phis)
        return jnp.sum(jnp.where(roi, g, 0.0) ** 2) / nroi

    # pathological start: all coils within 120° of arc
    phi0 = jnp.asarray(2 * np.pi / 3 * np.arange(nC) / (nC - 1))
    uniform = jnp.asarray(2 * np.pi * np.arange(nC) / nC)

    gmax0, gmean0 = stats(phi0)
    gmax_u, gmean_u = stats(uniform)
    print(f'clustered start: max g = {gmax0:.3f}, mean g = {gmean0:.3f}'
          f' | uniform ring: max g = {gmax_u:.3f}, '
          f'mean g = {gmean_u:.3f}')

    opt = optax.adam(0.03)

    @jax.jit
    def fit(phis):
        st = opt.init(phis)

        def body(carry, _):
            phis, st = carry
            val, gr = jax.value_and_grad(loss)(phis)
            up, st = opt.update(gr, st)
            return (optax.apply_updates(phis, up), st), val

        (phis, _), hist = jax.lax.scan(body, (phis, st), None,
                                       length=args.iters)
        return phis, hist

    phis, hist = fit(phi0)
    assert float(hist[-1]) < float(hist[0]), 'loss must decrease'
    gmax1, gmean1 = stats(phis)

    span0 = float(phi0.max() - phi0.min())
    ph = np.sort(np.mod(np.asarray(phis), 2 * np.pi))
    span1 = float(2 * np.pi - np.max(np.diff(np.concatenate(
        [ph, [ph[0] + 2 * np.pi]]))))
    print(f'optimized: max g = {gmax1:.3f}, mean g = {gmean1:.3f} | '
          f'azimuth span {np.degrees(span0):.0f}° → '
          f'{np.degrees(span1):.0f}°')

    assert span1 > span0 + 0.3, 'optimizer should spread the cluster'
    assert gmax0 / gmax1 >= 1.5, \
        f'max-g improvement only {gmax0 / gmax1:.2f}x'
    assert gmean1 <= gmean_u * 1.10, \
        'optimized layout should approach the uniform ring'
    print('OK')


if __name__ == '__main__':
    main()
