r"""Headline-config cost breakdown: where do the milliseconds go?

Times the fused rf/gr engine on the headline shape (1M spins x 1000
steps, f32) in ablation variants — forward-only vs fwd+adjoint, and
with relaxation / off-resonance / B1 toggled — to attribute cost
between the forward kernel, the reconstruction adjoint, and each
physics feature. Pure measurement (chained timing, best-of-N passes);
informs whether a flop-reduction experiment on the backward can pay.

Run on the real TPU: ``python benchmarks/breakdown.py [--nm 1000000]``.
Prints one JSON line per variant.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_variant(nM, nT, *, grad, relax, df, b1, repeats=3, passes=4):
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import sims
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench

    a = bench._build(nM, nT, jnp.float32)
    kw = dict(gam=a['gam'], dt=a['dt'])
    if relax:
        kw.update(T1=a['T1'], T2=a['T2'])
    if df:
        kw.update(df=a['df'])
    if b1:
        kw.update(b1Map=a['b1Map'])

    def loss(rf, gr):
        Mo = sims.blochsim_rfgr(a['Mi'], rf, gr, a['loc'], **kw)
        return jnp.sum(Mo * Mo)

    if grad:
        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    else:
        step = jax.jit(loss)

    out = step(a['rf'], a['gr'])          # warm/compile
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    best = float('inf')
    for _ in range(passes):
        rf = a['rf']
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = step(rf, a['gr'])
            if grad:
                rf = rf + 1e-12 * out[1][0]
            else:
                rf = rf + 1e-12 * out * a['rf']
        float(jnp.sum(rf))
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nm', type=int, default=1_000_000)
    ap.add_argument('--nt', type=int, default=1000)
    args = ap.parse_args()

    try:
        from mrphy_tpu.utils.timing import enable_persistent_cache
        enable_persistent_cache()
    except Exception:
        pass

    variants = [
        ('fwd full (relax+df+b1)', dict(grad=False, relax=True, df=True,
                                        b1=True)),
        ('fwd+adjoint full', dict(grad=True, relax=True, df=True,
                                  b1=True)),
        ('fwd+adjoint no-b1', dict(grad=True, relax=True, df=True,
                                   b1=False)),
        ('fwd+adjoint no-df', dict(grad=True, relax=True, df=False,
                                   b1=True)),
        ('fwd+adjoint no-relax', dict(grad=True, relax=False, df=True,
                                      b1=True)),
        ('fwd+adjoint bare (loc only)', dict(grad=True, relax=False,
                                             df=False, b1=False)),
    ]
    for name, kw in variants:
        secs = time_variant(args.nm, args.nt, **kw)
        print(json.dumps({
            'variant': name, 'ms': round(secs * 1e3, 1),
            'gsps': round(args.nm * args.nt / secs / 1e9, 2)}),
            flush=True)


if __name__ == '__main__':
    main()
