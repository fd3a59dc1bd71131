r"""Deployment lifecycle: design on a build host → AOT artifacts →
serve with no framework tracing.

A scanner-side deployment wants the pulse-evaluation service compiled
ONCE and then executed many times with bounded latency — no Python
retracing, no framework version skew between build and serving. This
example runs the whole lifecycle with :mod:`mrphy_tpu.utils.export`:

1. **Build host**: design a slice-selective pulse for a subject
   (:func:`mrphy_tpu.design.design_pulse`), then publish three
   artifacts to a directory:

   - ``applypulse.mrxp`` — the subject-baked ``(rf, gr) → M`` service
     (:func:`export_applypulse`);
   - ``loss_grad.mrxp`` — the design objective's value+grad program
     (online re-optimization at the scanner without the design stack);
   - ``oracle_m.mrxp`` — the scan oracle exported SHAPE-POLYMORPHIC
     (:func:`symbolic_dim`): ONE artifact that serves any spin count.

   A TPU-target artifact is also built from this (CPU) host
   (``platforms=('tpu',)``) to show cross-platform lowering; executing
   it belongs to a TPU worker.

2. **Serving host**: load the artifacts back (file → callable; nothing
   else from the design stack is touched) and

   - evaluate the designed pulse and a B1-drifted variant through the
     served ``applypulse`` — bit-exact against a live jit of the same
     program;
   - take one projected-gradient step through the served value+grad
     artifact and confirm the loss decreases;
   - drive the polymorphic oracle at two different spin counts from
     one artifact — bit-exact against live jits at each size.

The reference framework has no serving story (eager per-call Python);
this is part of the beyond-reference production surface.

Usage::

    python examples/serve_artifact.py [--n 12] [--nt 64] [--iters 60]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=12, help='cube edge')
    ap.add_argument('--nt', type=int, default=64, help='time steps')
    ap.add_argument('--iters', type=int, default=60)
    ap.add_argument('--outdir', default=None,
                    help='artifact directory (default: temp dir)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.models.mobjs import Pulse, SpinCube
    from mrphy_tpu.design import design_pulse, DesignConfig
    from mrphy_tpu.ops import slowsims
    from mrphy_tpu.utils import (export_compiled, load_compiled,
                                 symbolic_dim, export_applypulse)

    outdir = args.outdir or tempfile.mkdtemp(prefix='mrphy_artifacts_')
    rng = np.random.default_rng(0)

    # ---------------- build host ----------------
    n = args.n
    cube = SpinCube((1, n, n, n), fov=jnp.asarray([[0.2, 0.2, 0.2]]),
                    T1=jnp.asarray([[1.47]]), T2=jnp.asarray([[0.07]]))
    nT = args.nt
    t = np.arange(nT)
    rf0 = 0.05 * np.exp(-((t - nT / 2) / (nT / 6)) ** 2)[None, None, :]
    rf0 = np.concatenate([rf0, np.zeros_like(rf0)], 1)
    gr0 = np.concatenate([np.zeros((1, 2, nT)),
                          0.3 * np.ones((1, 1, nT))], 1)
    p0 = Pulse(jnp.asarray(rf0, jnp.float32), jnp.asarray(gr0,
               jnp.float32), dt=dt0)

    z = np.asarray(cube.loc_[0, :, 2])
    tgt = np.where(np.abs(z) < 0.05, 1.0, 0.0)     # central slab -> Mxy
    Mtgt_ = jnp.asarray(np.stack([tgt, np.zeros_like(tgt),
                                  np.sqrt(1 - tgt ** 2)], -1)[None],
                        jnp.float32)
    cfg = DesignConfig(niter=args.iters, lr=0.02, rfmax=12.0)
    p, losses = design_pulse(cube, p0, Mtgt_, cfg=cfg)
    assert float(losses[-1]) < float(losses[0]), 'design must improve'
    print(f'design: loss {float(losses[0]):.4f} -> '
          f'{float(losses[-1]):.4f} over {args.iters} iters')

    # artifact 1: the subject-baked applypulse service
    apath = os.path.join(outdir, 'applypulse.mrxp')
    export_applypulse(cube, p, doEmbed=False, path=apath)

    # artifact 2: objective value+grad for online re-optimization
    def loss_fn(rf):
        M = cube.applypulse(Pulse(rf, p.gr, dt=p.dt))
        return jnp.mean((M - Mtgt_) ** 2)

    gpath = os.path.join(outdir, 'loss_grad.mrxp')
    export_compiled(jax.jit(jax.value_and_grad(loss_fn)), (p.rf,),
                    path=gpath)

    # artifact 3: shape-polymorphic oracle (any spin count, one blob)
    m, = symbolic_dim('m')
    DT = jnp.float32
    opath = os.path.join(outdir, 'oracle_m.mrxp')
    export_compiled(
        lambda Mi, beff: slowsims.blochsim(
            Mi, beff, T1=jnp.asarray([[1.47]], DT),
            T2=jnp.asarray([[0.07]], DT)),
        (jax.ShapeDtypeStruct((1, m, 3), DT),
         jax.ShapeDtypeStruct((1, m, nT, 3), DT)), path=opath)

    # cross-platform: a TPU artifact built from this host
    tpath = os.path.join(outdir, 'applypulse_tpu.mrxp')
    try:
        export_applypulse(cube, p, doEmbed=False, path=tpath,
                          platforms=('tpu',))
        print(f'tpu artifact built on {jax.devices()[0].platform} host: '
              f'{os.path.getsize(tpath)} B (execute on a TPU worker)')
    except Exception as e:  # lowering support varies by runtime
        print(f'tpu cross-build unavailable here: {type(e).__name__}')

    sizes = {f: os.path.getsize(os.path.join(outdir, f))
             for f in sorted(os.listdir(outdir))}
    print('published:', {k: f'{v} B' for k, v in sizes.items()})

    # ---------------- serving host ----------------
    serve = load_compiled(apath)
    live = jax.jit(lambda rf, gr: cube.applypulse(
        Pulse(rf, gr, dt=p.dt, gmax=p.gmax, smax=p.smax,
              rfmax=p.rfmax)))
    for scale, name in ((1.0, 'designed'), (0.9, 'B1 -10% drift')):
        M_served = np.asarray(serve(scale * p.rf, p.gr))
        M_live = np.asarray(live(scale * p.rf, p.gr))
        np.testing.assert_array_equal(M_served, M_live)
        mxy = np.abs(M_served[..., 0] + 1j * M_served[..., 1])
        print(f'serve[{name}]: bit-exact vs live jit; '
              f'in-slab mean |Mxy| = {float(mxy[0, tgt > 0].mean()):.3f}')

    vg = load_compiled(gpath)
    v0, g0 = vg(p.rf)
    rf1 = p.rf - 0.5 * g0
    v1, _ = vg(rf1)
    print(f'served value+grad step: loss {float(v0):.5f} -> '
          f'{float(v1):.5f}')
    assert float(v1) <= float(v0), 'gradient artifact must descend'

    oracle = load_compiled(opath)
    for nM in (33, 257):
        Mi = jnp.asarray(rng.random((1, nM, 3)) - 0.5, DT)
        beff = jnp.asarray(rng.random((1, nM, nT, 3)) * 0.1, DT)
        ref = jax.jit(lambda Mi, beff: slowsims.blochsim(
            Mi, beff, T1=jnp.asarray([[1.47]], DT),
            T2=jnp.asarray([[0.07]], DT)))(Mi, beff)
        np.testing.assert_array_equal(np.asarray(oracle(Mi, beff)),
                                      np.asarray(ref))
        print(f'polymorphic oracle @ nM={nM}: bit-exact vs live jit')

    print('OK')


if __name__ == '__main__':
    main()
