r"""3D tailored-excitation design demo.

Jointly optimizes RF + gradient waveforms so a spherical region inside an
n³ voxel cube is excited while the surroundings stay relaxed — the
workload of the reference's cited paper, end-to-end on TPU.

Usage::

    python examples/design_3d.py [--n 32] [--nt 256] [--iters 100]
                                 [--coarse]  # multi-scale (2x dt first)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32, help='cube side (voxels)')
    ap.add_argument('--nt', type=int, default=256, help='pulse length')
    ap.add_argument('--iters', type=int, default=100)
    ap.add_argument('--lr', type=float, default=0.02)
    ap.add_argument('--coarse', action='store_true',
                    help='multi-scale: design at 2x dt, refine, continue')
    ap.add_argument('--init', choices=['cos', 'sta'], default='cos',
                    help='RF init: fixed cos/sin, or small-tip-angle '
                         'linear design through the random gradients')
    ap.add_argument('--save', type=str, default='',
                    help='save designed waveforms to this .npz')
    ap.add_argument('--seq', type=str, default='',
                    help='export the designed pulse to this Pulseq .seq')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.models import mobjs
    from mrphy_tpu.design import DesignConfig, design_multiscale

    shape = (1, args.n, args.n, args.n)
    cube = mobjs.SpinCube(shape, jnp.asarray([[24., 24., 24.]]),
                          T1_=jnp.asarray([[1.47]]),
                          T2_=jnp.asarray([[0.07]]))

    # target: flip a central ball transverse, keep the rest longitudinal
    locn = np.asarray(cube.loc_)
    ball = np.linalg.norm(locn, axis=-1) < 6.0
    Mtgt = np.tile([0., 0., 1.], (1, cube.nM, 1))
    Mtgt[0, ball[0]] = [0., 1., 0.]
    Mtgt = jnp.asarray(Mtgt, jnp.float32)

    rng = np.random.default_rng(0)
    t = jnp.arange(args.nt, dtype=jnp.float32).reshape(1, 1, args.nt)
    gr = jnp.asarray(rng.normal(size=(1, 3, args.nt)) * 0.2, jnp.float32)
    if args.init == 'sta':
        # warm start: linear small-tip design through the (random)
        # gradient trajectory — convex, seconds — then let the joint
        # loop refine nonlinearly (the 90° target is far beyond small
        # tip, but the STA solution still seeds the right geometry)
        from mrphy_tpu.design import sta_design
        rf0, _ = sta_design(cube.loc_, gr, Mtgt[..., :2], niter=60)
        # rescale into the hardware limit (a uniform scale keeps the
        # excitation GEOMETRY — the thing the warm start contributes;
        # clipping would distort it)
        peak = float(jnp.abs(rf0).max())
        rf = jnp.asarray(rf0 * min(1.0, 0.24 / peak), jnp.float32)
        print(f'STA init: max|rf| {peak:.3f} G'
              + (' (rescaled to rfmax)' if peak > 0.24 else ''))
    else:
        rf = 0.05 * jnp.concatenate([jnp.cos(t / 40), jnp.sin(t / 40)], 1)
    p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)

    if args.coarse:   # multi-scale: coarse dt first, then refine
        dts = [2 * float(dt0), float(dt0)]
        niters = [args.iters // 2, args.iters]
    else:
        dts, niters = [float(dt0)], [args.iters]

    cfg = DesignConfig(lr=args.lr, rfmax=0.25, smax=12e3)
    t0 = time.perf_counter()
    pulse, stage_losses = design_multiscale(cube, p, Mtgt, dts=dts,
                                            niters=niters, cfg=cfg)
    jax.block_until_ready(stage_losses[-1])
    wall = time.perf_counter() - t0
    for dt, losses in zip(dts, stage_losses):
        print(f'dt={dt * 1e6:.0f}us  {losses.shape[0]} iters  loss '
              f'{float(losses[0]):.4f} -> {float(losses[-1]):.4f}')
    total = sum(n for n in niters)
    print(f'{total} iterations total in {wall:.1f}s '
          f'({total / wall:.1f} it/s incl. compile)')

    # evaluate the design
    M = cube.applypulse(pulse)
    err_in = float(jnp.mean(jnp.linalg.norm(
        M[0, ball[0]] - jnp.asarray([0., 1., 0.]), axis=-1)))
    err_out = float(jnp.mean(jnp.linalg.norm(
        M[0, ~ball[0]] - jnp.asarray([0., 0., 1.]), axis=-1)))
    print(f'mean |M - target|: in-ball {err_in:.4f}, '
          f'out-of-ball {err_out:.4f}')

    if args.save:
        np.savez(args.save, rf=np.asarray(pulse.rf),
                 gr=np.asarray(pulse.gr), dt=float(dt0))
        print(f'saved waveforms to {args.save}')

    if args.seq:
        from mrphy_tpu.utils import pulse_to_seq
        pulse_to_seq(pulse, args.seq)
        print(f'exported Pulseq file to {args.seq}')


if __name__ == '__main__':
    main()
