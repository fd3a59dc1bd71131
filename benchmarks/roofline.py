r"""VPU roofline: how close are the Bloch kernels to this chip's
speed of light?

The fused Bloch step is elementwise VPU math on VMEM-resident tiles (no
MXU work, negligible HBM traffic per step), so the relevant roofline is
**VPU arithmetic throughput**, not HBM bandwidth or MXU flops. This
script measures, with the same Pallas setup as the real kernels
(f32 planes in VMEM, fori_loop over "time"):

1. peak sustainable mul-add throughput (the step math is dominated by
   multiply/adds);
2. sustained ``sin``/``cos``/``rsqrt`` transcendental throughput (the
   step has 3 of these, they cost multiple VPU slots each);
3. the measured spin-step rate of the production fwd / fwd+adjoint
   kernels, converted to effective flop/s with a hand count of the step
   math (63 flops + 3 transcendentals fwd; ~175 + 6 fwd+adjoint).

Prints a small report. Run on the real chip:
    nohup python benchmarks/roofline.py > /tmp/roofline.txt 2>&1 &

Timing uses chained data dependencies + a final host read
(`block_until_ready` does not dependably block on the remote
attachment).
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TS = 256          # sublanes per tile — same as the production kernel
NTILES = 32       # 32 x 256 x 128 = 1M lanes of f32 = 4 MB per plane
STEPS = 1000


def _timeit(fn, *args, passes=4, inner=3):
    out = fn(*args)
    jnp.sum(out).block_until_ready()
    float(jnp.sum(out))
    best = float('inf')
    for _ in range(passes):
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(inner):
            x = fn(x, *args[1:])
        float(jnp.sum(x))           # host read = reliable sync
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def _mk_kernel(body, nops, steps):
    r"""A kernel looping `steps` times over `nops` applications of `body`
    on 3 VMEM-resident planes (mimics the carry structure of the Bloch
    step)."""
    def kernel(x_ref, o_ref):
        a, b, c = x_ref[0], x_ref[1], x_ref[2]

        def step(t, carry):
            a, b, c = carry
            for _ in range(nops):
                a, b, c = body(a, b, c)
            return a, b, c

        a, b, c = jax.lax.fori_loop(0, steps, step, (a, b, c))
        o_ref[0], o_ref[1], o_ref[2] = a, b, c

    spec = pl.BlockSpec((3, TS, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(NTILES,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((3, NTILES * TS, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))


def fma_body(a, b, c):
    # 6 mul + 6 add per application, rotating the roles so nothing is
    # dead-code eliminated
    a2 = a * 1.000001 + b
    b2 = b * 0.999999 + c
    c2 = c * 1.000001 + a
    a3 = a2 * 0.999999 + c2
    b3 = b2 * 1.000001 + a2
    c3 = c2 * 0.999999 + b2
    return a3, b3, c3


def trig_body(a, b, c):
    # one sin, one cos, one rsqrt per application (plus 3 adds to chain)
    s = jnp.sin(a)
    co = jnp.cos(b)
    r = jax.lax.rsqrt(jnp.abs(c) + 1.0)
    return s + c * 1e-6, co + a * 1e-6, r + b * 1e-6


def main():
    print('devices:', jax.devices())
    nlanes = 3 * NTILES * TS * LANE
    x = jnp.ones((3, NTILES * TS, LANE), jnp.float32) * 0.5

    fma = _mk_kernel(fma_body, nops=4, steps=STEPS)
    t = _timeit(jax.jit(fma), x)
    fma_flops = nlanes / 3 * STEPS * 4 * 12  # per-lane-triple: 4 apps x 12
    print(f'FMA kernel:  {t*1e3:8.2f} ms  -> '
          f'{fma_flops / t / 1e12:6.2f} Tflop/s sustained mul-add')

    trig = _mk_kernel(trig_body, nops=2, steps=STEPS)
    t = _timeit(jax.jit(trig), x)
    n_trans = nlanes / 3 * STEPS * 2 * 3
    print(f'trig kernel: {t*1e3:8.2f} ms  -> '
          f'{n_trans / t / 1e12:6.2f} T transcendental/s '
          f'(sin+cos+rsqrt groups)')

    # production kernels, headline config
    import numpy as np
    from mrphy_tpu.ops import sims
    from mrphy_tpu import gamH, dt0
    nM, nT = 1_000_000, 1000
    rng = np.random.default_rng(0)
    Mi = jnp.asarray(rng.random((1, nM, 3)) - 0.5, jnp.float32)
    loc = jnp.asarray(rng.random((1, nM, 3)) * 2 - 1, jnp.float32)
    df = jnp.asarray(rng.random((1, nM)) * 200 - 100, jnp.float32)
    b1 = jnp.asarray(np.stack([np.ones((1, nM)), np.zeros((1, nM))], -1),
                     jnp.float32)
    T1 = jnp.asarray([[1.47]], jnp.float32)
    T2 = jnp.asarray([[0.07]], jnp.float32)
    tt = jnp.arange(nT, dtype=jnp.float32).reshape(1, 1, nT)
    rf = 0.25 * jnp.concatenate([jnp.cos(tt / nT * 6), jnp.sin(tt / nT * 6)],
                                1)
    gr = jnp.ones((1, 3, nT), jnp.float32)

    fwd = jax.jit(functools.partial(
        sims.blochsim_rfgr, T1=T1, T2=T2, gam=gamH, dt=dt0))
    t = _timeit(lambda m: fwd(m, rf, gr, loc, df=df, b1Map=b1), Mi)
    rate = nM * nT / t
    print(f'fwd kernel:  {t*1e3:8.2f} ms  -> {rate/1e9:6.2f} G spin*steps/s'
          f'  (~{rate*63/1e12:.2f} Tflop/s at 63 flops/step'
          f' + {rate*3/1e9:.1f} G transcendentals/s)')

    def loss(m):
        return jnp.sum(fwd(m, rf, gr, loc, df=df, b1Map=b1) ** 2)
    both = jax.jit(jax.grad(loss))
    t = _timeit(both, Mi)
    rate = nM * nT / t
    # careful static count of _rfgr_bwd_kernel.step (nC=1, dfg+b1+relax):
    # assemble 12 + norm/axis 10 + poly-sincos 25 + undo-relax 7 +
    # Rt m 32 + Rt h 32 + dL/db 54 + waveform reduces ~14 + per-spin
    # accumulators 15 ~= 200; fwd pass adds its own 84 -> ~284/step.
    print(f'fwd+adjoint: {t*1e3:8.2f} ms  -> {rate/1e9:6.2f} G spin*steps/s'
          f'  (~{rate*284/1e12:.2f} Tflop/s-equivalent at ~284 '
          f'flops/step fwd+bwd + {rate*2/1e9:.1f} G rsqrt/s)')


if __name__ == '__main__':
    main()
