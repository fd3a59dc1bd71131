r"""Benchmark suite covering the BASELINE.json scenario configs.

Run on real TPU: ``python benchmarks/suite.py [config ...]``.
Prints one JSON line per config (bench.py stays the single-line headline
benchmark the driver consumes).

Configs:
  tiny        blochsim forward, 3x3x3 SpinCube, 512-step pulse (config 1)
  freeprec32  multi-coil excitation + freeprec, 32^3 cube, off-resonance
              (config 3)
  design64    joint RF+gradient design iteration rate, 64^3 voxels,
              tan-clamped rf/gr (config 4)
  throughput  1M spins x 1000 steps fwd+adjoint, fused engine (config 5)
  deeptime    parallel-in-time tree-reduction propagator vs sequential
              scan, 128 spins x 65536 steps
  longpulse   1M spins x 16k steps fwd+adjoint, time-chunked Pallas
              backward
  beffstream  materialized-Beff streaming engine, bf16 vs f32 field
              storage (HBM-bandwidth scenario)
  signal      k-space encoding operator, 64^3 spins x 16k samples x 8
              coils (fused pallas vs XLA)
  recon       CG-SENSE iteration rate, 128x128, 8 coils
  nufft       gridding NUFFT vs the exact operator, 128x128 x 32k
              samples with df/T2s time segmentation; Toeplitz apply
  kspace      jitted k-space recon stages on-device: GRAPPA R=2 line
              synthesis, split-slice-GRAPPA SMS separation, POCS
              partial-Fourier (256x256, 16 coils)
  field       QSM/field stages on a 128^3 volume: dipole forward,
              Laplacian unwrapping, TV dipole-inversion per-iter cost
  mrf         MRF dictionary throughput: 64k atoms x 400 TR epg_spgr
              (K=48), atoms/s
  mrf_pipeline end-to-end MRF mapping: fused dict -> SVD16 compression
              -> fused volume match -> continuous refinement;
              voxels/s (device time) + map accuracy
  cest        volume-scale two-pool Bloch-McConnell: 512k voxels x 2k
              saturation steps through the fused waveform engine
              (blochsim_mc_rfgr), pallas vs XLA core
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read(out):
    r"""Force completion via a host read (block_until_ready does not
    dependably block on remote-attached runtimes). Read ONE element —
    transferring a whole multi-GB output over the tunneled attachment
    would dominate the timing (measured: a 1.5 GB gradient read took
    ~90 s vs ~60 ms of compute)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    # plain indexing, not reshape(-1)[0]: the remote compile helper
    # 500s on flatten kernels over multi-GB arrays
    np.asarray(leaf[(0,) * leaf.ndim] if getattr(leaf, 'ndim', 0)
               else leaf)


def _timeit(f, *args, repeats=8):
    out = f(*args)
    _read(out)  # warm / compile
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(repeats)]
    for o in outs:
        _read(o)
    return (time.perf_counter() - t0) / repeats


def _timeit_device(f, *args, repeats=8):
    r"""Amortized per-call DEVICE time: dispatch ``repeats`` calls
    back-to-back (a single TPU core executes programs in order, so the
    wall covers all executions) and host-read ONE element of the LAST
    output only. ``_timeit``'s read-per-rep convention adds the ~10 ms
    host round-trip of this tunneled attachment to every rep — honest
    for latency-sensitive callers, but it buries sub-50 ms kernels
    (RESULTS.md round-2 `mrf` note). Report both where it matters."""
    out = f(*args)
    _read(out)  # warm / compile
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(repeats)]
    _read(outs[-1])
    return (time.perf_counter() - t0) / repeats


def bench_tiny():
    import jax
    from mrphy_tpu.models.mobjs import Examples
    cube, p = Examples.spincube(), Examples.pulse()
    f = jax.jit(lambda c, pl: c.applypulse(pl))
    secs = _timeit(f, cube, p)
    return {'metric': 'tiny applypulse (3x3x3 cube, 512 steps) latency',
            'value': round(secs * 1e3, 3), 'unit': 'ms'}


def bench_freeprec32():
    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0, pi
    from mrphy_tpu.models import mobjs
    n, nT, nC = 32, 512, 8
    rng = np.random.default_rng(0)
    shape = (1, n, n, n)
    cube = mobjs.SpinCube(shape, jnp.asarray([[24., 24., 24.]]),
                          T1_=jnp.asarray([[1.47]]),
                          T2_=jnp.asarray([[0.07]]))
    cube.df = jnp.asarray(rng.normal(size=shape) * 50, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=shape + (2, nC)) * .3 + .5,
                     jnp.float32)
    t = jnp.arange(nT, dtype=jnp.float32).reshape(1, 1, nT)
    rf = 0.1 * jnp.concatenate([jnp.cos(t / 40), jnp.sin(t / 40)],
                               1)[..., None] * jnp.ones((1, 1, 1, nC))
    gr = jnp.asarray(rng.normal(size=(1, 3, nT)), jnp.float32)
    p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)

    def seq(cube, p, b1):
        M_ = cube.applypulse(p, b1Map=b1)
        from mrphy_tpu.ops import sims
        return sims.freeprec(M_, 5e-3, T1=cube.T1_, T2=cube.T2_,
                             df=cube.df_)

    f = jax.jit(seq)
    secs = _timeit(f, cube, p, b1)
    return {'metric': f'freeprec32: {nC}-coil excite + freeprec, 32^3 '
                      f'cube, {nT} steps',
            'value': round(secs * 1e3, 2), 'unit': 'ms',
            'spin_steps_per_sec': round(n ** 3 * nT / secs / 1e6, 1)}


def bench_design64():
    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.models import mobjs
    from mrphy_tpu.design import DesignConfig, design_pulse
    n, nT = 64, 256
    rng = np.random.default_rng(0)
    shape = (1, n, n, n)
    cube = mobjs.SpinCube(shape, jnp.asarray([[24., 24., 24.]]),
                          T1_=jnp.asarray([[1.47]]),
                          T2_=jnp.asarray([[0.07]]))
    t = jnp.arange(nT, dtype=jnp.float32).reshape(1, 1, nT)
    rf = 0.05 * jnp.concatenate([jnp.cos(t / 40), jnp.sin(t / 40)], 1)
    gr = jnp.asarray(rng.normal(size=(1, 3, nT)) * 0.2, jnp.float32)
    p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)

    # 3D tailored excitation: flip a central ball, keep the rest at +z
    locn = np.asarray(cube.loc_)
    ball = (np.linalg.norm(locn, axis=-1) < 6.0)
    Mtgt = np.tile([0., 0., 1.], (1, cube.nM, 1))
    Mtgt[0, ball[0]] = [0., 1., 0.]

    niter = 20
    cfg = DesignConfig(niter=niter, lr=0.02, rfmax=0.25, smax=12e3,
                       dt=float(dt0))
    # warm-up/compile
    design_pulse(cube, p, jnp.asarray(Mtgt, jnp.float32), cfg=cfg)
    t0 = time.perf_counter()
    _, losses = design_pulse(cube, p, jnp.asarray(Mtgt, jnp.float32),
                             cfg=cfg)
    jax.block_until_ready(losses)
    secs = time.perf_counter() - t0
    return {'metric': f'design64: joint rf+gr design, 64^3 voxels, '
                      f'{nT} steps',
            'value': round(niter / secs, 2), 'unit': 'iters/s',
            'loss_first_last': [round(float(losses[0]), 4),
                                round(float(losses[-1]), 4)]}


def bench_throughput():
    import bench
    secs = bench.bench_fwd_adjoint(1_000_000, 1000)
    return {'metric': '1M spins x 1000 steps fwd+adjoint (fused pallas)',
            'value': round(1_000_000 * 1000 / secs / 1e6, 1),
            'unit': 'M spin*steps/s/chip'}


def bench_deeptime():
    r"""Parallel-in-time vs sequential when nT, not nM, is the long
    axis (128 spins x 65536 steps, relax, f32)."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0
    from mrphy_tpu.ops import sims, slowsims
    rng = np.random.default_rng(0)
    nM, nT = 128, 65536
    Mi = jnp.asarray(rng.random((1, nM, 3)) - 0.5, jnp.float32)
    beff = jnp.asarray(rng.random((1, nM, nT, 3)) * 0.1, jnp.float32)
    T1 = jnp.asarray([[1.47]], jnp.float32)
    T2 = jnp.asarray([[0.07]], jnp.float32)
    seq = jax.jit(lambda m, b: sims.blochsim(m, b, T1=T1, T2=T2,
                                             gam=gamH, dt=dt0))
    par = jax.jit(lambda m, b: slowsims.blochsim_tparallel(
        m, b, T1=T1, T2=T2, gam=gamH, dt=dt0))
    ts = _timeit(seq, Mi, beff)
    tp = _timeit(par, Mi, beff)
    d = float(jnp.max(jnp.abs(seq(Mi, beff) - par(Mi, beff))))
    return {'metric': f'deeptime: {nM} spins x {nT} steps fwd, '
                      'tree-reduction propagator vs sequential scan',
            'value': round(tp * 1e3, 1), 'unit': 'ms',
            'sequential_ms': round(ts * 1e3, 1),
            'speedup': round(ts / tp, 1), 'maxdiff': f'{d:.1e}'}


def bench_longpulse():
    r"""Long-pulse fwd+adjoint on the fused engine: the time-chunked
    Pallas backward keeps 1M spins x 16k steps on the fast path (the
    former XLA fallback ran this at ~2.1 G spin*steps/s)."""
    import bench
    nM, nT = 1_000_000, 16_000
    secs = bench.bench_fwd_adjoint(nM, nT, repeats=1, passes=2)
    return {'metric': f'longpulse: {nM} spins x {nT} steps fwd+adjoint '
                      '(time-chunked pallas backward)',
            'value': round(nM * nT / secs / 1e6, 1),
            'unit': 'M spin*steps/s/chip',
            'ms': round(secs * 1e3, 1)}


def bench_beffstream():
    r"""Beff-streaming engine (materialized field tensor) fwd+adjoint:
    f32 vs bfloat16 Beff storage. The path is HBM-bound on the (nT, nM)
    field stream, so bf16 storage (upcast in-register, bf16 cotangent)
    targets ~2x; reports both and the bf16-vs-f32 gradient deviation.

    Sizing: ONE spin tile (32768 = 256x128) with a long time axis, so
    the stream is GBs while the backward compiles single-tile (the
    remote compile helper 500s on multi-tile streaming-backward grad
    compiles — RESULTS.md round 2); timing is chained through a data
    dependency (grad has Beff's shape/dtype) so repeats serialize with
    ONE host read instead of one ~20 ms round-trip per repeat.
    Overridable via MRPHY_BEFF_NM / MRPHY_BEFF_NT."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import sims
    from mrphy_tpu.utils.timing import chained_timeit

    nM = int(os.environ.get('MRPHY_BEFF_NM', 32768))
    nT = int(os.environ.get('MRPHY_BEFF_NT', 4096))
    rng = np.random.default_rng(0)
    Mi = jnp.asarray(rng.random((1, nM, 3)), jnp.float32)
    beff32 = jnp.asarray(rng.normal(size=(1, nM, nT, 3)) * 0.1,
                         jnp.float32)
    beff16 = beff32.astype(jnp.bfloat16)
    T1 = jnp.asarray([[1.47]], jnp.float32)
    T2 = jnp.asarray([[0.07]], jnp.float32)
    W = jnp.asarray(rng.normal(size=Mi.shape), jnp.float32)

    def mk(bb):
        return jax.jit(jax.grad(lambda b: jnp.sum(W * sims.blochsim(
            Mi, b, T1=T1, T2=T2, backend='pallas'))))

    g32f = mk(beff32)
    g16f = mk(beff16)
    t32 = chained_timeit(g32f, beff32, repeats=6)
    t16 = chained_timeit(g16f, beff16, repeats=6)
    g32 = g32f(beff32)
    g16 = g16f(beff16).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(g32)))
    rel = float(jnp.max(jnp.abs(g16 - g32))) / scale
    gb32 = nM * nT * 3 * 4 / 1e9   # one pass over the f32 field stream
    return {'metric': f'beffstream: {nM} spins x {nT} steps fwd+adjoint,'
                      ' bf16 Beff storage vs f32',
            'value': round(t16 * 1e3, 1), 'unit': 'ms',
            'f32_ms': round(t32 * 1e3, 1),
            'speedup': round(t32 / t16, 2),
            'stream_gb_f32': round(gb32, 2),
            'bf16_grad_rel_dev': f'{rel:.1e}'}


def bench_signal():
    r"""k-space encoding operator (`ops/signal.py`): 64^3 spins, 16 384
    readout samples, 8 coils, off-resonance + T2* — one readout of a
    3-D volume as phase + spin-reduction matmuls on the MXU."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0, gamH
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.utils import g2k
    rng = np.random.default_rng(0)
    nM, nT, nC = 64 ** 3, 16_384, 8
    loc_ = jnp.asarray(rng.uniform(-12, 12, (1, nM, 3)), jnp.float32)
    M = jnp.asarray(rng.standard_normal((1, nM, 3)), jnp.float32)
    gr = jnp.asarray(rng.uniform(-2, 2, (1, 3, nT)), jnp.float32)
    k = jnp.asarray(g2k(gr, False, dt=dt0, gam=gamH), jnp.float32)
    df = jnp.asarray(rng.uniform(-100, 100, (1, nM)), jnp.float32)
    T2s = jnp.asarray(rng.uniform(5e-3, 5e-2, (1, nM)), jnp.float32)
    sens = jnp.asarray(rng.standard_normal((1, nM, 2, nC)), jnp.float32)

    fwd = jax.jit(lambda M: sig.signal(M, loc_, k, sens=sens, df=df,
                                       T2s=T2s, dt=dt0))
    s = fwd(M)
    adj = jax.jit(lambda s: sig.signal_adjoint(s, loc_, k, sens=sens,
                                               df=df, T2s=T2s, dt=dt0))
    fwd_p = jax.jit(lambda M: sig.signal(M, loc_, k, sens=sens, df=df,
                                         T2s=T2s, dt=dt0,
                                         backend='pallas'))
    adj_p = jax.jit(lambda s: sig.signal_adjoint(
        s, loc_, k, sens=sens, df=df, T2s=T2s, dt=dt0,
        backend='pallas'))
    sp = fwd_p(M)
    dev = float(jnp.abs(sp - s).max() / jnp.abs(s).max())
    tf = _timeit(fwd, M, repeats=4)
    ta = _timeit(adj, s, repeats=4)
    tfp = _timeit(fwd_p, M, repeats=4)
    tap = _timeit(adj_p, s, repeats=4)

    # full gradient step (round 3): d/d(ktraj, M) of an l2 loss — the
    # trajectory-optimization inner loop; the fused VJP kernel vs the
    # XLA autodiff chain
    def mkgrad(backend):
        def loss(kk, M):
            return jnp.sum(sig.signal(M, loc_, kk, sens=sens, df=df,
                                      T2s=T2s, dt=dt0,
                                      backend=backend) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    tgp = _timeit_device(mkgrad('pallas'), k, M, repeats=4)
    out = {'metric': f'signal: {nM} spins x {nT} samples x {nC} coils '
                     'encode (fused pallas fwd / adjoint)',
           'value': round(nM * nT / tfp / 1e9, 2),
           'unit': 'G spin*samples/s/chip',
           'fwd_ms': round(tfp * 1e3, 1), 'adj_ms': round(tap * 1e3, 1),
           'xla_fwd_ms': round(tf * 1e3, 1),
           'xla_adj_ms': round(ta * 1e3, 1),
           'grad_kM_pallas_ms': round(tgp * 1e3, 1),
           'pallas_rel_dev': f'{dev:.1e}'}
    try:
        # the XLA autodiff chain at this scale rematerializes the
        # (chunk, nT) factor matrices in reverse — its compile can
        # exceed the remote helper's limits; report it when it builds
        tg = _timeit_device(mkgrad('xla'), k, M, repeats=2)
        out['grad_kM_xla_ms'] = round(tg * 1e3, 1)
        out['grad_speedup'] = round(tg / tgp, 2)
    except Exception as e:  # noqa: BLE001
        out['grad_kM_xla_ms'] = f'compile failed: {type(e).__name__}'
    return out


def bench_recon():
    r"""CG-SENSE iteration rate through the fused signal kernels:
    128x128 grid (16 384 spins), corner-covering spiral (~29k samples),
    8 coils; one CG iteration = fwd + adjoint on the normal equations."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.utils import spiral2d, g2k
    n, nc, fov, iters = 128, 8, 24.0, 10
    nM = n * n
    rng = np.random.default_rng(0)
    ax = np.linspace(-fov / 2, fov / 2, n, endpoint=False) + fov / (2 * n)
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    loc_ = jnp.asarray(np.stack([xx, yy, np.zeros_like(xx)],
                                -1).reshape(1, nM, 3), jnp.float32)
    sens = jnp.asarray(rng.standard_normal((1, nM, 2, nc)), jnp.float32)
    x_true = jnp.asarray(rng.standard_normal((nM, 2)), jnp.float32)
    gr, _ = spiral2d(fov, int(np.ceil(1.42 * n)), direction='out')
    k = jnp.asarray(g2k(np.asarray(gr), False, dt=dt0), jnp.float32)
    nT = k.shape[-1]

    def A(x, backend):
        M = jnp.concatenate([x, jnp.zeros((nM, 1), x.dtype)], -1)[None]
        return sig.signal(M, loc_, k, sens=sens, dt=dt0, backend=backend)

    def AH(s, backend):
        return sig.signal_adjoint(s, loc_, k, sens=sens, dt=dt0,
                                  backend=backend)[0]

    def mk(backend):
        @jax.jit
        def cg(s):
            b = AH(s, backend)
            x, r = jnp.zeros_like(b), b
            p, rs = r, jnp.vdot(r, r)

            def body(_, st):
                x, r, p, rs = st
                Ap = AH(A(p, backend), backend)
                al = rs / jnp.vdot(p, Ap)
                x, r = x + al * p, r - al * Ap
                rs2 = jnp.vdot(r, r)
                return x, r, r + (rs2 / rs) * p, rs2

            x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
            return x
        return cg

    s_acq = A(x_true, 'pallas')
    out = {}
    for backend in ('pallas', 'xla'):
        cg = mk(backend)
        err = float(jnp.linalg.norm(cg(s_acq) - x_true)
                    / jnp.linalg.norm(x_true))
        t = _timeit(cg, s_acq, repeats=2)
        out[backend] = (t, err)
    tp, ep = out['pallas']
    tx, _ = out['xla']
    return {'metric': f'recon: {n}x{n} CG-SENSE, {nc} coils, '
                      f'nT={nT}, {iters} CG iters (fused pallas ops)',
            'value': round(iters / tp, 2), 'unit': 'CG iters/s/chip',
            'ms': round(tp * 1e3, 1), 'xla_ms': round(tx * 1e3, 1),
            'rel_err': f'{ep:.1e}'}


def bench_nufft():
    r"""Gridding NUFFT vs the exact encoding operator on a grid-resident
    problem: 128x128 image, 32 768 samples, off-resonance + T2* (nseg=8
    time segmentation), single coil. Reports fwd/adjoint times for
    both, the Toeplitz normal-operator apply, and the honest model
    deviation of the gridding path. Overridable via MRPHY_NUFFT_N /
    MRPHY_NUFFT_NT (CPU smoke).

    Regime note: hat time segmentation errs as ~(2pi*df_max*T/nseg)^2/8
    (see ops/nufft._segments), so the scenario keeps the readout inside
    the valid regime - dt=1us (T=32.8 ms at 32k samples, a realistic
    single-shot spiral) and df in +-25 Hz, giving ~2-3% worst-voxel
    model deviation at nseg=8. The original +-60 Hz / 131 ms config sat
    ~7 rad of phase per segment outside the regime (dev 0.95 measured
    on-chip); timings are insensitive to df/dt, so the perf numbers are
    comparable."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as nf
    from mrphy_tpu.ops import signal as sig
    rng = np.random.default_rng(0)
    n = int(os.environ.get('MRPHY_NUFFT_N', 128))
    nT = int(os.environ.get('MRPHY_NUFFT_NT', 32_768))
    fov = n * 0.2
    nM = n * n
    ax = (np.arange(n) - n // 2) / n * fov
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    loc_ = jnp.asarray(np.stack([yy, xx, 0 * xx], -1).reshape(
        1, nM, 3), jnp.float32)
    img = jnp.asarray(rng.standard_normal((n, n, 2)), jnp.float32)
    kmax = 0.95 * n / (2 * fov)
    k2 = jnp.asarray(rng.uniform(-kmax, kmax, (2, nT)), jnp.float32)
    k3 = jnp.concatenate([k2, jnp.zeros((1, nT), jnp.float32)])
    dfg = jnp.asarray(rng.uniform(-25, 25, (n, n)), jnp.float32)
    t2g = jnp.asarray(rng.uniform(0.02, 0.08, (n, n)), jnp.float32)
    plan = nf.nufft_plan((n, n), (fov, fov), width=5)   # auto: matmul
    plan_g = nf.nufft_plan((n, n), (fov, fov), width=5,
                           interp='gather')
    nkw = dict(df=dfg, T2s=t2g, dt=1e-6, nseg=8)

    fwd = jax.jit(lambda i: nf.nufft(plan, i, k2, **nkw))
    s = fwd(img)
    adj = jax.jit(lambda y: nf.nufft_adjoint(plan, y, k2, **nkw))
    fwd_g = jax.jit(lambda i: nf.nufft(plan_g, i, k2, **nkw))
    adj_g = jax.jit(lambda y: nf.nufft_adjoint(plan_g, y, k2, **nkw))
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), jnp.float32)], -1)[None]
    fwd_x = jax.jit(lambda m: sig.signal(
        m, loc_, k3[None], df=dfg.reshape(1, nM),
        T2s=t2g.reshape(1, nM), dt=1e-6))
    s0 = fwd_x(M)
    adj_x = jax.jit(lambda y: sig.signal_adjoint(
        y, loc_, k3[None], df=dfg.reshape(1, nM),
        T2s=t2g.reshape(1, nM), dt=1e-6))
    that = nf.toeplitz_kernel(plan, k2, chunk=8192)
    toe = jax.jit(lambda i: nf.toeplitz_apply(plan, that, i))
    dev = float(jnp.linalg.norm(s - s0[0, 0])
                / jnp.linalg.norm(s0[0, 0]))
    tf = _timeit(fwd, img, repeats=4)
    ta = _timeit(adj, s, repeats=4)
    tfg = _timeit(fwd_g, img, repeats=4)
    tag = _timeit(adj_g, s, repeats=4)
    tt = _timeit(toe, img, repeats=4)
    tfx = _timeit(fwd_x, M, repeats=4)
    tax = _timeit(adj_x, s0, repeats=4)
    return {'metric': f'nufft: {n}x{n} grid x {nT} samples, df+T2s '
                      '(nseg=8) gridding fwd (interp=matmul)',
            'value': round(tfx / tf, 2), 'unit': 'x vs exact operator',
            'fwd_ms': round(tf * 1e3, 1), 'adj_ms': round(ta * 1e3, 1),
            'gather_fwd_ms': round(tfg * 1e3, 1),
            'gather_adj_ms': round(tag * 1e3, 1),
            'toeplitz_ms': round(tt * 1e3, 2),
            'exact_fwd_ms': round(tfx * 1e3, 1),
            'exact_adj_ms': round(tax * 1e3, 1),
            'model_rel_dev': f'{dev:.1e}'}


def bench_kspace():
    r"""On-device throughput of the jitted k-space recon stages on a
    256x256, 16-coil problem: GRAPPA R=2 missing-line synthesis,
    2-slice split-slice-GRAPPA separation, and 10-iteration POCS
    partial-Fourier (pf=9/16). Weights are fitted once on the host
    (calibration); the timed parts are the MXU-matmul applies."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.utils.grappa import (grappa_weights, grappa_apply,
                                        sg_weights, sg_apply)
    from mrphy_tpu.utils.pf import pocs_pf
    rng = np.random.default_rng(0)
    n = int(os.environ.get('MRPHY_KSPACE_N', 256))
    nc = int(os.environ.get('MRPHY_KSPACE_NC', 16))
    ksp = rng.standard_normal((nc, n, n, 2)).astype(np.float32)
    cs = 32
    calib = ksp[:, n // 2 - cs // 2:n // 2 + cs // 2,
                n // 2 - cs // 2:n // 2 + cs // 2]
    Wg = jnp.asarray(grappa_weights(calib, 2))
    und = ksp.copy()
    und[:, 1::2] = 0
    und_j = jnp.asarray(und)
    gra = jax.jit(grappa_apply, static_argnums=2)
    tg = _timeit(lambda: gra(und_j, Wg, 2))

    calibs = np.stack([calib, np.roll(calib, 3, axis=2)])
    Ws = jnp.asarray(sg_weights(calibs, shifts='auto'))
    coll = jnp.asarray(ksp)
    sga = jax.jit(lambda k: sg_apply(k, Ws, shifts='auto'))
    ts = _timeit(sga, coll)

    nacq = int(0.5625 * n)
    undp = ksp.copy()
    undp[:, nacq:] = 0
    tp = _timeit(lambda: pocs_pf(jnp.asarray(undp), nacq, 10))

    return {'metric': f'kspace recon stages ({n}x{n}, {nc} coils): '
                      'GRAPPA R=2 apply',
            'value': round(tg * 1e3, 2), 'unit': 'ms',
            'sg_sms2_ms': round(ts * 1e3, 2),
            'pocs10_ms': round(tp * 1e3, 2)}


def bench_field():
    r"""On-device throughput of the QSM/field stages on a 128^3 f32
    volume (2.1M voxels): the dipole forward (three axis-pair MXU-DFT
    sweeps), Laplacian unwrapping (niter=3: 4 DCT Poisson solves),
    and the TV dipole-inversion per-iteration cost (forward + adjoint
    + TV grad under one scan)."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops.field import (dipole_kernel, chi2field,
                                     unwrap_phase, field2chi_tv)
    rng = np.random.default_rng(0)
    n = int(os.environ.get('MRPHY_FIELD_N', 128))
    chi = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    D = dipole_kernel((n, n, n), dtype=jnp.float32)
    fwd = jax.jit(lambda c: chi2field(c, D=D))
    tf = _timeit(fwd, chi)

    f = fwd(chi)
    psi = jnp.asarray(np.angle(np.exp(
        1j * 30.0 * np.asarray(f))), jnp.float32)
    tu = _timeit(jax.jit(unwrap_phase), psi)

    it = 10
    tv = jax.jit(lambda x: field2chi_tv(x, iters=it, D=D))
    ttv = _timeit(tv, f, repeats=4)

    return {'metric': f'field/QSM stages ({n}^3 f32): dipole forward',
            'value': round(tf * 1e3, 2), 'unit': 'ms',
            'unwrap3_ms': round(tu * 1e3, 2),
            'tv_ms_per_iter': round(ttv * 1e3 / it, 2)}


def bench_mrf():
    r"""MRF dictionary generation throughput: epg_spgr over a
    (T1, T2) atom grid with a 400-TR variable-flip train at K=48
    configuration orders — atoms/s on-device (the dictionary is the
    compute wall of fingerprinting pipelines)."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(0)
    natoms = int(os.environ.get('MRPHY_MRF_ATOMS', 65536))
    ntr = int(os.environ.get('MRPHY_MRF_NTR', 400))
    flips = jnp.asarray(
        np.deg2rad(10 + 50 * np.abs(np.sin(np.arange(ntr) / 40.0)))
        + 0.01 * rng.standard_normal(ntr), jnp.float32)
    T1 = jnp.asarray(rng.uniform(0.2, 3.0, natoms), jnp.float32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.5, natoms), jnp.float32)

    gen = jax.jit(lambda t1, t2: epg.epg_spgr(
        flips, None, T1=t1, T2=t2, tr=12e-3, te=3e-3, K=48))
    genp = jax.jit(lambda t1, t2: epg.epg_spgr(
        flips, None, T1=t1, T2=t2, tr=12e-3, te=3e-3, K=48,
        backend='pallas'))
    dev = float(jnp.max(jnp.abs(gen(T1, T2) - genp(T1, T2))))
    t = _timeit(gen, T1, T2, repeats=4)
    tp = _timeit(genp, T1, T2, repeats=4)
    tp_dev = _timeit_device(genp, T1, T2, repeats=8)
    # two-pool (EPG-X) dictionary, fused kernel
    xkw = dict(T1a=T1, T2a=T2,
               T1b=jnp.asarray(rng.uniform(0.2, 0.6, natoms),
                               jnp.float32),
               T2b=jnp.asarray(rng.uniform(0.005, 0.03, natoms),
                               jnp.float32),
               kab=jnp.asarray(rng.uniform(1.0, 10.0, natoms),
                               jnp.float32),
               kba=jnp.asarray(rng.uniform(5.0, 40.0, natoms),
                               jnp.float32))
    genx = jax.jit(lambda d: epg.epgx_spgr(flips, None, tr=12e-3,
                                           K=48, backend='pallas',
                                           **d))
    tx = _timeit(genx, xkw, repeats=4)
    # VARIABLE-TR two-pool train (round 5: fused — streamed per-step
    # exact propagators; was XLA-routed, and its XLA reverse needs
    # 39 GB of scan residuals at this scale)
    xtrs = jnp.asarray(12e-3 + 6e-3 * rng.random(ntr), jnp.float32)
    genxv = jax.jit(lambda d: epg.epgx_spgr(flips, None, tr=xtrs,
                                            K=24, backend='pallas',
                                            **d))
    genxv_x = jax.jit(lambda d: epg.epgx_spgr(flips, None, tr=xtrs,
                                              K=24, backend='xla',
                                              **d))
    txv = _timeit(genxv, xkw, repeats=4)
    txv_x = _timeit(genxv_x, xkw, repeats=4)
    gxv = jax.jit(jax.grad(
        lambda t1a, k_: jnp.sum(epg.epgx_spgr(
            flips, None, tr=xtrs, K=24, backend='pallas',
            **{**xkw, 'T1a': t1a, 'kab': k_}) ** 2), argnums=(0, 1)))
    tgxv = _timeit_device(gxv, T1, xkw['kab'], repeats=6)
    # full dictionary GRADIENT through the in-kernel SPGR adjoint
    # (round 3): d/d(flips, T1, T2) — the recompute-through-XLA
    # reverse OOMs at this scale (58.6 GB of scan residuals)
    gsp = jax.jit(jax.grad(
        lambda fl, t1, t2: jnp.sum(epg.epg_spgr(
            fl, None, T1=t1, T2=t2, tr=12e-3, te=3e-3, K=48,
            backend='pallas') ** 2), argnums=(0, 1, 2)))
    tgs = _timeit_device(gsp, flips, T1, T2, repeats=6)
    # CPMG mapping kernels (32-echo trains; single- and two-pool)
    cflips = jnp.asarray(
        np.deg2rad(rng.uniform(120, 180, 32)), jnp.float32)
    genc = jax.jit(lambda t1, t2: epg.epg_cpmg(
        cflips, T1=t1, T2=t2, esp=0.01, backend='pallas'))
    tc = _timeit(genc, T1, T2, repeats=4)
    genxc = jax.jit(lambda d: epg.epgx_cpmg(cflips, esp=0.01,
                                            backend='pallas', **d))
    txc = _timeit(genxc, {k: v for k, v in xkw.items()}, repeats=4)
    # bSSFP-MRF dictionary (Ma 2013: variable flips AND TRs, the
    # dictionary carries df) — fused ssfp_pallas kernel vs the XLA scan
    from mrphy_tpu.ops import ssfp
    dfa = jnp.asarray(rng.uniform(-80, 80, natoms), jnp.float32)
    btrs = jnp.asarray(10e-3 + 3e-3 * rng.random(ntr), jnp.float32)
    genb = jax.jit(lambda t1, t2, d: ssfp.bssfp_train(
        flips, T1=t1, T2=t2, tr=btrs, df=d))
    genbp = jax.jit(lambda t1, t2, d: ssfp.bssfp_train(
        flips, T1=t1, T2=t2, tr=btrs, df=d, backend='pallas'))
    devb = float(jnp.max(jnp.abs(genb(T1, T2, dfa)
                                 - genbp(T1, T2, dfa))))
    tb = _timeit(genb, T1, T2, dfa, repeats=4)
    tbp = _timeit(genbp, T1, T2, dfa, repeats=4)
    # dictionary MATCHING (ops/mrf): rank-16 compressed matched filter
    # over a whole volume — phase rotation applied in the compressed
    # space (e^{iθ}d → cosθ·d_c + sinθ·J_c d_c, J-invariant basis)
    from mrphy_tpu.ops import mrf as _mrf
    nV = int(os.environ.get('MRPHY_MRF_VOX', 1 << 20))
    Dd = gen(T1, T2)
    basis = _mrf.svd_basis(Dd, rank=16)
    Dc = _mrf.compress(Dd, basis)
    ks = jnp.asarray(rng.integers(0, natoms, nV))
    ph = jnp.asarray(rng.uniform(-np.pi, np.pi, nV), jnp.float32)
    Xc = (jnp.cos(ph)[:, None] * Dc[ks]
          + jnp.sin(ph)[:, None] * (Dc[ks] @ basis.jc.T))
    matchc = jax.jit(lambda d, x: _mrf.dict_match_compressed(
        d, x, basis))
    res = matchc(Dc, Xc)
    acc = float(jnp.mean((res.idx == ks).astype(jnp.float32)))
    # degeneracy-aware accuracy: a random T1/T2 grid contains exact
    # signal duplicates (corr 1.000000 between distinct atoms), so
    # count a match correct when the winning atom is signal-equivalent
    # to the truth (full-space correlation > 1 - 1e-5)
    Dn = Dd.reshape(natoms, -1)
    Dn = Dn / jnp.linalg.norm(Dn, axis=1, keepdims=True)
    csub = jnp.sum(Dn[res.idx[:65536]] * Dn[ks[:65536]], -1)
    acc_eff = float(jnp.mean((csub > 1 - 1e-5).astype(jnp.float32)))
    tmatch = _timeit(matchc, Dc, Xc, repeats=4)
    return {'metric': f'MRF dictionary: {natoms} atoms x {ntr} TR '
                      '(K=48) epg_spgr (fused pallas)',
            'value': round(natoms / tp, 0), 'unit': 'atoms/s',
            'device_atoms_per_s': round(natoms / tp_dev, 0),
            'device_sec_per_dict': round(tp_dev, 4),
            'timing_note': 'value includes a ~10 ms host-read '
                           'round-trip per rep (read-per-rep '
                           'convention); device_* is amortized '
                           'device time (one final read)',
            'sec_per_dict': round(tp, 3), 'xla_atoms_per_s':
            round(natoms / t, 0), 'xla_sec_per_dict': round(t, 3),
            'grad_device_ms': round(tgs * 1e3, 1),
            'grad_note': 'in-kernel SPGR adjoint; the recompute-'
                         'through-XLA reverse OOMs at this scale',
            'pallas_abs_dev': f'{dev:.1e}',
            'epgx_pallas_atoms_per_s': round(natoms / tx, 0),
            'epgx_vartr_pallas_atoms_per_s': round(natoms / txv, 0),
            'epgx_vartr_xla_atoms_per_s': round(natoms / txv_x, 0),
            'epgx_vartr_grad_device_ms': round(tgxv * 1e3, 1),
            'cpmg32_pallas_Mvox_per_s': round(natoms / tc / 1e6, 2),
            'epgx_cpmg32_pallas_Mvox_per_s': round(
                natoms / txc / 1e6, 2),
            'bssfp_pallas_atoms_per_s': round(natoms / tbp, 0),
            'bssfp_xla_atoms_per_s': round(natoms / tb, 0),
            'bssfp_pallas_abs_dev': f'{devb:.1e}',
            'match_r16_Mvox_per_s': round(nV / tmatch / 1e6, 2),
            'match_acc': round(acc, 4),
            'match_acc_degeneracy_aware': round(acc_eff, 4)}


def bench_cest():
    r"""Volume-scale two-pool Bloch–McConnell (MT/CEST) through the
    fused waveform engine: 512k voxels × 2k saturation steps with
    per-voxel B0/B1/exchange maps — the whole-brain Z-spectrum point
    workload. The streaming oracle would need a 12.6 GB materialized
    Beff here; the fused engine needs the voxel maps plus one 2k-sample
    waveform. Reports the fused Pallas forward, the XLA-core forward,
    and one fit step (grad w.r.t. the exchange maps through the
    Pallas-forward custom_vjp, which recomputes through the XLA core).
    Timing chains iterations through a data dependency (Ma feeds the
    next call's Mia). Overridable via MRPHY_CEST_NM / MRPHY_CEST_NT."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import mc
    from mrphy_tpu.utils.timing import chained_timeit

    nM = int(os.environ.get('MRPHY_CEST_NM', 1 << 19))
    nT = int(os.environ.get('MRPHY_CEST_NT', 2000))
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    Mia = jnp.asarray(np.tile([0., 0., 1.], (1, nM, 1)), f32)
    Mib = 0.02 * Mia
    loc = jnp.zeros((1, nM, 3), f32)
    df = jnp.asarray(rng.uniform(-300, 300, (1, nM)), f32)
    b1 = jnp.asarray(np.stack([0.7 + rng.random((1, nM)) * .6,
                               rng.random((1, nM)) * .1 - .05], -1), f32)
    kab = jnp.asarray(rng.uniform(0.5, 5.0, (1, nM)), f32)
    rf = jnp.asarray(np.full((1, 2, nT), [[0.005], [0.0]]), f32)
    gr = jnp.zeros((1, 3, nT), f32)
    kw = dict(T1a=1.2, T2a=0.06, T1b=1.0, T2b=0.01, kba=kab * 50.0,
              Ma0=1.0, Mb0=0.02, dfb=750.0, df=df, b1Map=b1, dt=2e-4)

    def mk(backend):
        return jax.jit(lambda mia, k: mc.blochsim_mc_rfgr(
            mia, Mib, rf, gr, loc, kab=k, backend=backend, **kw)[0])

    fp, fx = mk('pallas'), mk('xla')
    dev = float(jnp.max(jnp.abs(fp(Mia, kab) - fx(Mia, kab))))
    tp = chained_timeit(fp, Mia, kab, repeats=4)
    tx = chained_timeit(fx, Mia, kab, repeats=2)
    # one fit step: dL/d(kab) via the fused two-phase chunk adjoint
    gk = jax.jit(jax.grad(lambda k: jnp.sum(
        mc.blochsim_mc_rfgr(Mia, Mib, rf, gr, loc, kab=k,
                            backend='pallas', **kw)[0])))
    # the first 1-2 post-compile executions pay a ~240 ms program-load
    # /allocator warmup on this attachment (measured, then settles);
    # warm past it so the number is the steady-state fit rate
    _read(gk(kab))
    _read(gk(kab))
    tg = chained_timeit(gk, kab, repeats=3,
                        feedback=lambda k, g: k - 1e-6 * g)
    vs = nM * nT
    return {'metric': f'CEST two-pool fused waveform engine: {nM} '
                      f'voxels x {nT} steps (per-voxel B0/B1/exchange)',
            'value': round(vs / tp / 1e9, 2),
            'unit': 'G voxel*steps/s (pallas fwd)',
            'pallas_fwd_ms': round(tp * 1e3, 1),
            'xla_fwd_ms': round(tx * 1e3, 1),
            'speedup': round(tx / tp, 2),
            'fit_step_ms': round(tg * 1e3, 1),
            'pallas_abs_dev': f'{dev:.1e}',
            'streaming_beff_gb': round(nM * nT * 3 * 4 / 1e9, 1)}


def bench_nufft3d():
    r"""True-3D NUFFT (koosh-ball-style random trajectory): the
    VMEM-resident Pallas slice kernel (``interp='pallas'``) vs the
    serialized XLA gather path, forward and adjoint, 96³ image x 32k
    samples (padded 124³ grid ≈ 2 x 7.6 MB resident)."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as nf
    n = int(os.environ.get('MRPHY_N3D', 96))
    nT = int(os.environ.get('MRPHY_NT3D', 32768))
    rng = np.random.default_rng(0)
    fov = (24.0, 24.0, 24.0)
    img = jnp.asarray(rng.standard_normal((n, n, n, 2)), jnp.float32)
    kmax = n / 2 / fov[0]
    kt = jnp.asarray(rng.uniform(-kmax, kmax, (3, nT)), jnp.float32)
    pg = nf.nufft_plan((n,) * 3, fov, width=4, osf=1.25,
                       interp='gather')
    pp = nf.nufft_plan((n,) * 3, fov, width=4, osf=1.25,
                       interp='pallas')
    fg = jax.jit(lambda im: nf.nufft(pg, im, kt))
    fp = jax.jit(lambda im: nf.nufft(pp, im, kt))
    sg, sp = fg(img), fp(img)
    dev = float(jnp.max(jnp.abs(sg - sp)) / jnp.max(jnp.abs(sg)))
    tg = _timeit_device(fg, img, repeats=4)
    tp = _timeit_device(fp, img, repeats=8)
    ag = jax.jit(lambda s: nf.nufft_adjoint(pg, s, kt))
    ap = jax.jit(lambda s: nf.nufft_adjoint(pp, s, kt))
    deva = float(jnp.max(jnp.abs(ag(sg) - ap(sg)))
                 / jnp.max(jnp.abs(ag(sg))))
    tga = _timeit_device(ag, sg, repeats=4)
    tpa = _timeit_device(ap, sg, repeats=8)
    # trajectory gradient (native dk3d VJP vs gather autodiff): the
    # 3-D trajectory-optimization step d/dk Σ|A(k)x|²
    gp = jax.jit(jax.grad(lambda kk: jnp.sum(nf.nufft(pp, img, kk)
                                             ** 2)))
    gg = jax.jit(jax.grad(lambda kk: jnp.sum(nf.nufft(pg, img, kk)
                                             ** 2)))
    devk = float(jnp.max(jnp.abs(gg(kt) - gp(kt)))
                 / jnp.max(jnp.abs(gg(kt))))
    tgk = _timeit_device(gg, kt, repeats=2)
    tpk = _timeit_device(gp, kt, repeats=4)
    return {'metric': f'nufft3d: {n}^3 x {nT} samples, pallas '
                      'VMEM-slice interp vs XLA gather',
            'value': round(tg / tp, 2), 'unit': 'x fwd speedup',
            'pallas_fwd_ms': round(tp * 1e3, 1),
            'gather_fwd_ms': round(tg * 1e3, 1),
            'pallas_adj_ms': round(tpa * 1e3, 1),
            'gather_adj_ms': round(tga * 1e3, 1),
            'adj_speedup': round(tga / tpa, 2),
            'pallas_kgrad_ms': round(tpk * 1e3, 1),
            'gather_kgrad_ms': round(tgk * 1e3, 1),
            'kgrad_speedup': round(tgk / tpk, 2),
            'fwd_rel_dev': f'{dev:.1e}', 'adj_rel_dev': f'{deva:.1e}',
            'kgrad_rel_dev': f'{devk:.1e}'}


def bench_mrf_pipeline():
    r"""End-to-end MRF mapping pipeline, the number a fingerprinting
    user cares about: fused dictionary (epg_spgr pallas) → SVD rank-16
    compression → fused compressed matcher over a whole volume →
    continuous refinement (match_refine) on a tile. Every stage is
    individually benchmarked elsewhere (`mrf` scenario); this reports
    the composed voxels/s in the device-time convention plus the
    matched-map accuracy against ground truth."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg
    from mrphy_tpu.ops import mrf as _mrf
    rng = np.random.default_rng(0)
    natoms = int(os.environ.get('MRPHY_MRF_ATOMS', 65536))
    ntr = int(os.environ.get('MRPHY_MRF_NTR', 400))
    nV = int(os.environ.get('MRPHY_MRF_VOX', 1 << 20))
    nref = int(os.environ.get('MRPHY_MRF_REFINE', 4096))
    flips = jnp.asarray(
        np.deg2rad(10 + 50 * np.abs(np.sin(np.arange(ntr) / 40.0))),
        jnp.float32)
    # log-spaced T1/T2 grid (the standard MRF dictionary layout)
    t1g = np.exp(np.linspace(np.log(0.2), np.log(3.0), 256))
    t2g = np.exp(np.linspace(np.log(0.02), np.log(0.5), 256))
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = (T2g < T1g)                 # physical atoms only
    T1 = jnp.asarray(T1g[keep][:natoms], jnp.float32)
    T2 = jnp.asarray(T2g[keep][:natoms], jnp.float32)
    natoms = T1.shape[0]
    seq = dict(tr=12e-3, te=3e-3, K=48)

    def pipeline(T1, T2, probes):
        D = epg.epg_spgr(flips, None, T1=T1, T2=T2, backend='pallas',
                         **seq)
        basis = _mrf.svd_basis(D, rank=16)
        Dc = _mrf.compress(D, basis)
        Xc = _mrf.compress(probes, basis)
        return _mrf.dict_match_compressed(Dc, Xc, basis)

    # synthetic volume: random atoms + receive phase + noise
    ks = rng.integers(0, natoms, nV)
    ph = rng.uniform(-np.pi, np.pi, nV).astype(np.float32)
    Dtrue = np.asarray(epg.epg_spgr(
        flips, None, T1=T1, T2=T2, backend='pallas', **seq))
    X = Dtrue[ks]
    X = (np.cos(ph)[:, None, None] * X
         + np.sin(ph)[:, None, None]
         * np.stack([-X[..., 1], X[..., 0]], -1))
    X += 0.002 * rng.standard_normal(X.shape).astype(np.float32)
    X = jnp.asarray(X, jnp.float32)

    run = jax.jit(pipeline)
    res = run(T1, T2, X)
    t = _timeit_device(run, T1, T2, X, repeats=4)
    t1_hat = np.asarray(T1)[np.asarray(res.idx)]
    t2_hat = np.asarray(T2)[np.asarray(res.idx)]
    e1 = np.median(np.abs(t1_hat - np.asarray(T1)[ks])
                   / np.asarray(T1)[ks])
    e2 = np.median(np.abs(t2_hat - np.asarray(T2)[ks])
                   / np.asarray(T2)[ks])

    # continuous refinement, batched volume mode: ONE fused train per
    # Adam iteration (round 3 — the vmapped per-voxel mode measured
    # 1.7 k voxels/s; batched + pallas forward is the volume path)
    p0 = jnp.log(jnp.stack([t1_hat[:nref], t2_hat[:nref]], -1))

    def sigB(P):
        return epg.epg_spgr(flips, None, T1=jnp.exp(P[:, 0]),
                            T2=jnp.exp(P[:, 1]), K=16, tr=12e-3,
                            te=3e-3, backend='pallas')

    _read(_mrf.match_refine(sigB, p0, X[:nref], iters=50, lr=0.02,
                            batched=True))     # warm (jit caches)
    t0 = time.perf_counter()
    P, score = _mrf.match_refine(sigB, p0, X[:nref], iters=50,
                                 lr=0.02, batched=True)
    _read((P, score))
    t_ref = time.perf_counter() - t0
    r1 = np.exp(np.asarray(P[:, 0]))
    er1 = np.median(np.abs(r1 - np.asarray(T1)[ks[:nref]])
                    / np.asarray(T1)[ks[:nref]])
    return {'metric': f'MRF pipeline: {natoms}-atom fused dict + SVD16 '
                      f'+ fused match over {nV} voxels',
            'value': round(nV / t, 0), 'unit': 'voxels/s (device time)',
            'pipeline_ms': round(t * 1e3, 1),
            'median_T1_relerr': round(float(e1), 4),
            'median_T2_relerr': round(float(e2), 4),
            'refine_voxels_per_s': round(nref / t_ref, 0),
            'refine_T1_relerr': round(float(er1), 4),
            'refine_iters': 50}


def bench_bssfp_fit():
    r"""Whole-volume direct bSSFP parameter mapping (round 4): one
    Adam-style gradient step — fused forward + the native in-kernel
    adjoint (``ssfp_pallas._bssfp_bwd_kernel``) — w.r.t. per-voxel
    (T1, T2, df, M0) at 1M voxels × 200 variable TRs. The
    recompute-through-XLA reverse this replaces held O(nTR·nV) scan
    residuals (~4.8 GB of saved relax/rotation factors per plane set
    at this shape) and paid an extra XLA forward."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import ssfp

    nV, nTR = 1_048_576, 200
    rng = np.random.default_rng(0)
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 60))), jnp.float32)
    trs = jnp.asarray(4e-3 + 2e-3 * rng.random(nTR), jnp.float32)
    T1t = jnp.asarray(rng.uniform(0.3, 2.0, nV), jnp.float32)
    T2t = jnp.asarray(rng.uniform(0.03, 0.3, nV), jnp.float32)
    dft = jnp.asarray(rng.uniform(-80, 80, nV), jnp.float32)
    M0t = jnp.asarray(rng.uniform(0.7, 1.2, nV), jnp.float32)

    fwd = jax.jit(lambda a, b, c, d: ssfp.bssfp_train(
        flips, T1=a, T2=b, tr=trs, df=c, M0=d, backend='pallas'))
    fwd_x = jax.jit(lambda a, b, c, d: ssfp.bssfp_train(
        flips, T1=a, T2=b, tr=trs, df=c, M0=d, backend='xla'))
    data = fwd(T1t, T2t, dft, M0t)

    # NB data rides as an ARGUMENT: closed over, the 1.6 GB echo array
    # embeds as a jaxpr constant and the serialized module overflows
    # the remote compile helper (HTTP 413 / broken pipe — measured)
    def loss(a, b, c, d, y):
        s = ssfp.bssfp_train(flips, T1=a, T2=b, tr=trs, df=c, M0=d,
                             backend='pallas')
        return jnp.mean((s - y) ** 2)

    gradf = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    T10 = jnp.full(nV, 1.0, jnp.float32)
    T20 = jnp.full(nV, 0.1, jnp.float32)
    df0 = jnp.zeros(nV, jnp.float32)
    M00 = jnp.ones(nV, jnp.float32)
    t_fwd = _timeit_device(fwd, T1t, T2t, dft, M0t, repeats=4)
    t_fwdx = _timeit_device(fwd_x, T1t, T2t, dft, M0t, repeats=2)
    t_grad = _timeit_device(gradf, T10, T20, df0, M00, data,
                            repeats=4)
    return {'metric': 'direct bSSFP volume fit (1M voxels x 200 '
                      'variable TR, native in-kernel adjoint)',
            'fused_fwd_ms': round(t_fwd * 1e3, 1),
            'xla_fwd_ms': round(t_fwdx * 1e3, 1),
            'fit_grad_step_ms': round(t_grad * 1e3, 1),
            'fit_Mvox_per_s': round(nV / t_grad / 1e6, 2),
            'unit': 'ms'}


def bench_mrf_fisp():
    r"""Canonical MRF-FISP dictionary (round 4): inversion prep
    (``ir_prep``) + variable-TR train through the fused SPGR kernel —
    forward and the full native-adjoint gradient (the in-kernel
    variable-TR factor chains), 65 536 atoms × 400 TR, K=48. Compare
    the const-TR round-3 record (fwd 30.5 ms / grad 89.5 ms): the
    variable-TR mode adds 3 in-kernel transcendentals per atom·TR."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg

    nA, nTR, K = 65_536, 400, 48
    rng = np.random.default_rng(0)
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 60 * np.abs(np.sin(np.pi * t / 75))), jnp.float32)
    phis = epg.rf_spoil_phases(nTR).astype(jnp.float32)
    trs = jnp.asarray(0.0115 + 0.003 * (0.5 + 0.5 * np.sin(
        2 * np.pi * t / 37)), jnp.float32)
    T1 = jnp.asarray(rng.uniform(0.2, 3.0, nA), jnp.float32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.4, nA), jnp.float32)
    w = jnp.asarray(rng.standard_normal((nA, nTR, 2)), jnp.float32)

    def gen(t1, t2, trv):
        return epg.epg_spgr(flips, phis, T1=t1, T2=t2, tr=trv,
                            te=2e-3, zinit=epg.ir_prep(0.018, t1),
                            K=K, backend='pallas')

    fwd = jax.jit(gen)
    gradf = jax.jit(jax.grad(
        lambda t1, t2, trv: jnp.sum(w * gen(t1, t2, trv)),
        argnums=(0, 1, 2)))
    t_fwd = _timeit_device(fwd, T1, T2, trs, repeats=4)
    t_grad = _timeit_device(gradf, T1, T2, trs, repeats=4)

    # + per-TR crusher diffusion (round 4 continued): the kernel
    # recomputes the per-order attenuation planes per step from the
    # D*dk^2 rate row (3 extra (K, TA) exps/step)
    Dv = jnp.asarray(rng.uniform(0.4e-5, 3.2e-5, nA), jnp.float32)

    def gend(t1, t2, trv, d):
        return epg.epg_spgr(flips, phis, T1=t1, T2=t2, tr=trv,
                            te=2e-3, zinit=epg.ir_prep(0.018, t1),
                            D=d, dk=500.0, K=K, backend='pallas')

    fwdd = jax.jit(gend)
    gradd = jax.jit(jax.grad(
        lambda t1, t2, trv, d: jnp.sum(w * gend(t1, t2, trv, d)),
        argnums=(0, 1, 2, 3)))
    t_fwdd = _timeit_device(fwdd, T1, T2, trs, Dv, repeats=4)
    t_gradd = _timeit_device(gradd, T1, T2, trs, Dv, repeats=4)
    return {'metric': 'canonical MRF-FISP dictionary (65k atoms x '
                      '400 TR, K=48, IR prep + variable TR)',
            'fused_fwd_ms': round(t_fwd * 1e3, 1),
            'fused_fwd_Matoms_per_s': round(nA / t_fwd / 1e6, 2),
            'full_grad_ms': round(t_grad * 1e3, 1),
            'diff_fwd_ms': round(t_fwdd * 1e3, 1),
            'diff_grad_ms': round(t_gradd * 1e3, 1),
            'unit': 'ms'}


def bench_mrf_kspace():
    r"""k-space MRF end to end (round 5): golden-angle spoke-per-TR
    acquisition → subspace CG reconstruction → fused compressed
    matching, all jitted, at clinical matrix size. Reports device
    time per stage, end-to-end voxels/s, and map accuracy vs the
    phantom truth (grid-cell-level errors expected from the
    8-iteration CG at ~100× per-frame undersampling)."""
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import epg, mrf
    from mrphy_tpu.ops.nufft import nufft_plan, nufft
    rng = np.random.default_rng(0)
    N = int(os.environ.get('MRPHY_KMRF_N', 128))
    nTR = int(os.environ.get('MRPHY_KMRF_NTR', 400))
    nRO, fov, rank, cg_iters = 2 * N, 24.0, 8, 8
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 75))), jnp.float32)
    trs = jnp.asarray(
        0.012 + 0.004 * np.sin(2 * np.pi * t / 57) ** 2, jnp.float32)

    def gen(T1v, T2v):
        return epg.epg_spgr(flips, None, T1=T1v, T2=T2v, tr=trs,
                            te=0.002, K=24,
                            zinit=epg.ir_prep(0.02, T1v),
                            backend='pallas')

    t1g = np.geomspace(0.3, 4.0, 48)
    t2g = np.geomspace(0.02, 0.6, 32)
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = T2g < T1g
    T1a = jnp.asarray(T1g[keep], jnp.float32)
    T2a = jnp.asarray(T2g[keep], jnp.float32)
    D = jax.jit(gen)(T1a, T2a)
    basis = mrf.svd_basis(D, rank=rank)
    Dc = mrf.compress(D, basis)

    yy, xx = np.mgrid[:N, :N]
    c = (N - 1) / 2
    mask = np.hypot(yy - c, xx - c) < 0.45 * N
    T1m = np.where(xx < c, 0.8, 1.5)
    T2m = np.where(yy < c, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask], jnp.float32)
    T2v = jnp.asarray(T2m[mask], jnp.float32)
    X = jax.jit(gen)(T1v, T2v)
    imgs = jnp.zeros((nTR, N, N, 2), jnp.float32
                     ).at[:, iy, ix, :].set(jnp.moveaxis(X, 0, 1))

    kmax = N / (2 * fov)
    # half-sample-offset spokes: sampling AT -kmax (the Nyquist
    # bin) is ambiguous between the exact operator and the wrapped
    # gridded one; interior samples keep every operator consistent
    rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
    ga = np.pi * (np.sqrt(5) - 1) / 2
    phi = ga * np.arange(nTR)
    ktrajs = jnp.asarray(np.stack([np.cos(phi)[:, None] * rad,
                                   np.sin(phi)[:, None] * rad], 1),
                         jnp.float32)
    plan = nufft_plan((N, N), (fov, fov))

    @jax.jit
    def acquire(im):
        return jax.lax.scan(
            lambda _, tx: (None, nufft(plan, tx[0], tx[1])),
            None, (im, ktrajs))[1]

    s = acquire(imgs)
    s = s + 2e-3 * float(jnp.abs(s).max()) * jnp.asarray(
        rng.standard_normal(s.shape), jnp.float32)
    recon = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=cg_iters))   # auto -> toeplitz
    recon_fr = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=cg_iters, method='frames'))
    alpha = recon(s)
    probes = jnp.moveaxis(alpha, 0, -1)[iy, ix]
    res = mrf.dict_match_compressed(Dc, probes, basis)
    e1 = float(np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1)))
    e2 = float(np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1)))
    t_acq = _timeit_device(acquire, imgs, repeats=3)
    t_rec = _timeit_device(recon, s, repeats=3)
    t_rec_fr = _timeit_device(recon_fr, s, repeats=2)

    # multi-coil SENSE recon (round 5): 8 birdcage-ish coils, complex
    # pair alpha, per-coil Toeplitz sandwich around ONE kernel set
    nC = 8
    yn, xn = (np.mgrid[:N, :N] / (N - 1)) - 0.5
    smaps = []
    for cc in range(nC):
        th = 2 * np.pi * cc / nC
        d2 = ((xn - 0.6 * np.cos(th)) ** 2
              + (yn - 0.6 * np.sin(th)) ** 2)
        mag = np.exp(-d2 / 0.8)
        ph = 2 * np.pi * 0.3 * (xn * np.cos(th) + yn * np.sin(th))
        smaps.append(np.stack([mag * np.cos(ph), mag * np.sin(ph)],
                              -1))
    sens = jnp.asarray(np.stack(smaps), jnp.float32)
    s8 = jnp.broadcast_to(s, (nC,) + s.shape)
    recon_sense = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=cg_iters, method='toeplitz',
        sens=sens))
    t_rec_sense = _timeit_device(recon_sense, s8, repeats=2)
    match = jax.jit(lambda p: mrf.dict_match_compressed(
        Dc, p, basis).idx)
    t_match = _timeit(match, probes, repeats=3)
    nV = int(mask.sum())
    total = t_acq + t_rec + t_match
    return {'metric': f'k-space MRF end-to-end: {N}x{N}, {nTR} '
                      f'spokes x {nRO} ro, rank {rank}, '
                      f'CG {cg_iters}',
            'value': round(nV / total, 0), 'unit': 'voxels/s',
            'acquire_dev_ms': round(t_acq * 1e3, 1),
            'recon_dev_ms': round(t_rec * 1e3, 1),
            'recon_frames_dev_ms': round(t_rec_fr * 1e3, 1),
            'recon_sense8_dev_ms': round(t_rec_sense * 1e3, 1),
            'match_ms': round(t_match * 1e3, 1),
            'atoms': int(D.shape[0]),
            'undersampling_per_frame': round(N * N / nRO, 1),
            'median_T1_err': round(e1, 4),
            'median_T2_err': round(e2, 4)}


ALL = {'tiny': bench_tiny, 'freeprec32': bench_freeprec32,
       'design64': bench_design64, 'throughput': bench_throughput,
       'deeptime': bench_deeptime, 'longpulse': bench_longpulse,
       'beffstream': bench_beffstream, 'signal': bench_signal,
       'recon': bench_recon, 'nufft': bench_nufft,
       'kspace': bench_kspace, 'field': bench_field, 'mrf': bench_mrf,
       'mrf_pipeline': bench_mrf_pipeline, 'cest': bench_cest,
       'nufft3d': bench_nufft3d, 'bssfp_fit': bench_bssfp_fit,
       'mrf_fisp': bench_mrf_fisp, 'mrf_kspace': bench_mrf_kspace}


def main():
    if not os.environ.get('MRPHY_NO_CACHE'):
        from mrphy_tpu.utils.timing import enable_persistent_cache
        enable_persistent_cache()    # remote compiles are minutes each
    names = sys.argv[1:] or list(ALL)
    for name in names:
        try:
            print(json.dumps({'config': name, **ALL[name]()}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({'config': name, 'error': f'{type(e).__name__}'
                              f': {e}'[:300]}))


if __name__ == '__main__':
    main()
