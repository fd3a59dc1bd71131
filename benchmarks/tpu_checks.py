r"""On-chip compiled-kernel regression tier.

Runs ON the real TPU (the default platform of this runtime) and asserts
the compiled Mosaic Pallas path — fast sincos, manual unroll, chunk
streaming, SMEM waveform layout — against the XLA engine, turning the
on-chip parity numbers of ``benchmarks/RESULTS.md`` (fwd 1.4e-5, grads
≤2e-4 rel) into a repeatable artifact. ``tests/test_pallas.py`` covers
the same kernels in ``interpret=True`` on CPU; one Mosaic regression
(layout, unroll interaction, compiler update) would ship silently
without this tier.

Usage::

    python benchmarks/tpu_checks.py              # on the real chip
    python benchmarks/tpu_checks.py --interpret  # CPU smoke (dev only)

Prints one ``PASS/FAIL`` line per check and writes one JSON summary to
``benchmarks/TPU_CHECKS.json`` (also echoed as the final stdout line).
Run via the verify skill each round; the JSON is checked into RESULTS.

Checks (mirroring the role of ``/root/reference/tests/test_sims.py:
24-143`` for the reference's fast engine):

1. fused rf/gr engine fwd+grad parity vs XLA for every CONFIG of
   ``tests/test_pallas.py`` (bare / relax / +df / +b1 / multi-coil);
2. Beff-streaming engine fwd/dbeff/dmi parity;
3. the time-chunked long-pulse backward (chunked grid engaged);
4. a batched (N>1) grid;
5. ``_fast_sincos`` max-error sweep over [0, 60] rad, compiled;
6. a 1×1-mesh ``mesh=`` run (shard_map dispatch on the chip);
7. the auto-gate actually routes the headline config to Pallas.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from mrphy_tpu.ops import sims, pallas_kernels        # noqa: E402

DT32 = jnp.float32
# f32 accumulation noise floor of two equally-rounded paths, with ~3x
# headroom over the measured numbers (RESULTS.md: fwd 1.4e-5 abs,
# grads 4e-5..1.7e-4 rel)
FWD_ATOL = 5e-5
GRAD_RTOL = 5e-4

_RESULTS = []


def _record(name: str, ok: bool, detail: str):
    _RESULTS.append({'check': name, 'ok': bool(ok), 'detail': detail})
    print(f'{"PASS" if ok else "FAIL"}  {name}: {detail}', flush=True)


def _max_abs(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))


def _rel(a, b):
    scale = float(jnp.max(jnp.abs(jnp.asarray(b)))) + 1e-30
    return _max_abs(a, b) / scale


def _mk(N, nM, nT, nC=1, seed=0):
    rng = np.random.default_rng(seed)
    Mi = jnp.asarray(rng.random((N, nM, 3)) - 0.5, DT32)
    loc = jnp.asarray(rng.random((N, nM, 3)) * 2 - 1, DT32)
    df = jnp.asarray(rng.random((N, nM)) * 50, DT32)
    b1 = jnp.asarray(rng.random((N, nM, 2, nC)), DT32)
    rf = jnp.asarray(rng.random((N, 2, nT, nC)), DT32)
    gr = jnp.asarray(rng.normal(size=(N, 3, nT)), DT32)
    T1 = jnp.asarray([[1.]], DT32)
    T2 = jnp.asarray([[4e-2]], DT32)
    return Mi, loc, df, b1, rf, gr, T1, T2


CONFIGS = [
    ('bare', dict()),
    ('relax', dict(relax=True)),
    ('relax_df', dict(relax=True, df=True)),
    ('relax_df_b1', dict(relax=True, df=True, b1=True)),
    ('multicoil3', dict(relax=True, df=True, b1=True, nC=3)),
]


def _rfgr_parity(name, cfg, *, nM, nT, interpret):
    nC = cfg.get('nC', 1)
    Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1, nM, nT, nC=nC, seed=1)
    kw = {}
    if cfg.get('relax'):
        kw.update(T1=T1, T2=T2)
    if cfg.get('df'):
        kw.update(df=df)
    if cfg.get('b1'):
        kw.update(b1Map=b1)
    if nC == 1 and not cfg.get('b1'):
        rf = rf[..., 0]           # exercise the missing-coil-dim path
    pkw = (dict(_pallas_interpret=True) if interpret
           else dict(backend='pallas'))

    fx = jax.jit(lambda m, r, g_: sims.blochsim_rfgr(
        m, r, g_, loc, backend='xla', **kw))
    fp = jax.jit(lambda m, r, g_: sims.blochsim_rfgr(
        m, r, g_, loc, **pkw, **kw))
    a = np.asarray(fx(Mi, rf, gr))
    b = np.asarray(fp(Mi, rf, gr))
    fwd_err = float(np.max(np.abs(a - b)))

    W = jnp.asarray(np.random.default_rng(9).normal(size=a.shape), DT32)
    gx = jax.jit(jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
        Mi, r, g_, loc, backend='xla', **kw)), argnums=(0, 1)))(rf, gr)
    gp = jax.jit(jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
        Mi, r, g_, loc, **pkw, **kw)), argnums=(0, 1)))(rf, gr)
    rf_rel, gr_rel = _rel(gp[0], gx[0]), _rel(gp[1], gx[1])

    ok = fwd_err < FWD_ATOL and rf_rel < GRAD_RTOL and gr_rel < GRAD_RTOL
    _record(f'rfgr/{name}', ok,
            f'fwd {fwd_err:.2e} (tol {FWD_ATOL:.0e}), drf rel '
            f'{rf_rel:.2e}, dgr rel {gr_rel:.2e} (tol {GRAD_RTOL:.0e})')
    return ok


def _beff_streaming(*, nM, nT, interpret):
    rng = np.random.default_rng(3)
    Mi = jnp.asarray(rng.random((1, nM, 3)), DT32)
    beff = jnp.asarray(rng.normal(size=(1, nM, nT, 3)), DT32)
    kw = dict(T1=jnp.asarray([[1.]], DT32), T2=jnp.asarray([[4e-2]], DT32))
    pkw = (dict(_pallas_interpret=True) if interpret
           else dict(backend='pallas'))

    a = np.asarray(jax.jit(lambda m, bb: sims.blochsim(
        m, bb, backend='xla', **kw))(Mi, beff))
    b = np.asarray(jax.jit(lambda m, bb: sims.blochsim(
        m, bb, **pkw, **kw))(Mi, beff))
    fwd_err = float(np.max(np.abs(a - b)))

    W = jnp.asarray(rng.normal(size=a.shape), DT32)
    gx = jax.jit(jax.grad(lambda m, bb: jnp.sum(W * sims.blochsim(
        m, bb, backend='xla', **kw)), argnums=(0, 1)))(Mi, beff)
    gp = jax.jit(jax.grad(lambda m, bb: jnp.sum(W * sims.blochsim(
        m, bb, **pkw, **kw)), argnums=(0, 1)))(Mi, beff)
    mi_rel, be_rel = _rel(gp[0], gx[0]), _rel(gp[1], gx[1])

    ok = fwd_err < FWD_ATOL and mi_rel < GRAD_RTOL and be_rel < GRAD_RTOL
    _record('beff_streaming', ok,
            f'fwd {fwd_err:.2e}, dMi rel {mi_rel:.2e}, dBeff rel '
            f'{be_rel:.2e}')
    return ok


def _longpulse_chunked(*, nM, nT, interpret):
    r"""The chunked backward grid must engage (tc < nT) and match XLA."""
    K = 5  # 3 + 2*nC at nC=1
    tc = pallas_kernels._pick_tc_wf(nT, K)
    engaged = tc < nT
    Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1, nM, nT, seed=2)
    kw = dict(T1=T1, T2=T2, df=df)
    pkw = (dict(_pallas_interpret=True) if interpret
           else dict(backend='pallas'))

    W_shape = (1, nM, 3)
    W = jnp.asarray(np.random.default_rng(8).normal(size=W_shape), DT32)
    gx = jax.jit(jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
        Mi, r, g_, loc, backend='xla', **kw)), argnums=(0, 1)))(rf, gr)
    gp = jax.jit(jax.grad(lambda r, g_: jnp.sum(W * sims.blochsim_rfgr(
        Mi, r, g_, loc, **pkw, **kw)), argnums=(0, 1)))(rf, gr)
    rf_rel, gr_rel = _rel(gp[0], gx[0]), _rel(gp[1], gx[1])

    # long-pulse reverse reconstruction compounds exp(nT·dt/T2) more
    # rounding than the short configs; widen accordingly (still ~1e-3)
    tol = 10 * GRAD_RTOL
    ok = engaged and rf_rel < tol and gr_rel < tol
    _record('longpulse_chunked', ok,
            f'tc={tc} (chunked={engaged}), drf rel {rf_rel:.2e}, '
            f'dgr rel {gr_rel:.2e} (tol {tol:.0e})')
    return ok


def _batched(*, nM, nT, interpret):
    N, nC = 2, 2
    Mi, loc, df, b1, rf, gr, T1, T2 = _mk(N, nM, nT, nC=nC, seed=6)
    kw = dict(T1=T1, T2=T2, df=df, b1Map=b1)
    pkw = (dict(_pallas_interpret=True) if interpret
           else dict(backend='pallas'))
    batched = np.asarray(jax.jit(lambda m, r, g_: sims.blochsim_rfgr(
        m, r, g_, loc, **pkw, **kw))(Mi, rf, gr))
    # jit the single-slice reference too: eager-vs-jit wrapper
    # preprocessing (exp/expm1 fusion) rounds E differently, which
    # compounds over nT and is NOT a kernel defect (see RESULTS.md r2)
    single_f = jax.jit(lambda m, r, g_, lo, d, b_: sims.blochsim_rfgr(
        m, r, g_, lo, T1=T1, T2=T2, df=d, b1Map=b_, backend='xla'))
    errs = []
    for n in range(N):
        single = np.asarray(single_f(
            Mi[n:n + 1], rf[n:n + 1], gr[n:n + 1], loc[n:n + 1],
            df[n:n + 1], b1[n:n + 1]))
        errs.append(float(np.max(np.abs(batched[n:n + 1] - single))))
    ok = max(errs) < FWD_ATOL
    _record('batched_grid', ok, f'per-batch fwd err {max(errs):.2e}')
    return ok


def _signal_parity(*, nM, nT, interpret):
    r"""Fused signal kernel (ops/signal_pallas.py) vs the XLA path:
    compiled fwd, adjoint, and M-gradient (the custom-VJP adjoint
    kernel). Catches Mosaic dot-precision regressions — the first run
    caught the bf16-default MXU dot (4–18% deviation). Runs twice:
    nC=4 (2nC = 8 sublane-aligned) and nC=3 (2nC = 6, Mosaic must mask
    the padded sublanes of the dot result)."""
    ok = True
    for nC in (4, 3):
        ok = _signal_parity_one(nM=nM, nT=nT, nC=nC,
                                interpret=interpret) and ok
    return ok


def _signal_parity_one(*, nM, nT, nC, interpret):
    from mrphy_tpu.ops import signal as sig_mod
    from mrphy_tpu.utils import g2k
    from mrphy_tpu import gamH, dt0
    rng = np.random.default_rng(3)
    loc = jnp.asarray(rng.uniform(-12, 12, (1, nM, 3)), DT32)
    M = jnp.asarray(rng.standard_normal((1, nM, 3)), DT32)
    gr = jnp.asarray(rng.uniform(-2, 2, (1, 3, nT)), DT32)
    k = jnp.asarray(g2k(gr, False, dt=dt0, gam=gamH), DT32)
    df = jnp.asarray(rng.uniform(-100, 100, (1, nM)), DT32)
    T2s = jnp.asarray(rng.uniform(5e-3, 5e-2, (1, nM)), DT32)
    sens = jnp.asarray(rng.standard_normal((1, nM, 2, nC)), DT32)
    kw = dict(sens=sens, df=df, T2s=T2s, dt=dt0)
    pkw = dict(backend='pallas', _pallas_interpret=interpret, **kw)

    s0 = jax.jit(lambda M: sig_mod.signal(M, loc, k, **kw))(M)
    s1 = jax.jit(lambda M: sig_mod.signal(M, loc, k, **pkw))(M)
    rel_f = _rel(s1, s0)
    m0 = jax.jit(lambda s: sig_mod.signal_adjoint(s, loc, k, **kw))(s0)
    m1 = jax.jit(lambda s: sig_mod.signal_adjoint(s, loc, k,
                                                  **pkw))(s0)
    rel_a = _rel(m1, m0)
    g0 = jax.jit(jax.grad(lambda M: jnp.sum(
        sig_mod.signal(M, loc, k, **kw) ** 2)))(M)
    g1 = jax.jit(jax.grad(lambda M: jnp.sum(
        sig_mod.signal(M, loc, k, **pkw) ** 2)))(M)
    rel_g = _rel(g1, g0)
    tol = 5e-4        # f32 phase roundoff at |psi| ~ 1e2 rad
    ok = rel_f < tol and rel_a < tol and rel_g < tol
    _record(f'signal_kernel_nc{nC}', ok,
            f'fwd rel {rel_f:.1e}, adj rel {rel_a:.1e}, '
            f'Mgrad rel {rel_g:.1e}')

    # round 3: the fused full VJP — trajectory/field cotangents
    def floss(lo, kk, se, dd, t2, backend):
        return jnp.sum(sig_mod.signal(
            M, lo, kk, sens=se, df=dd, T2s=t2, dt=dt0,
            backend=backend,
            _pallas_interpret=interpret and backend != 'xla') ** 2)

    args = (loc, k, sens, df, T2s)
    gx = jax.jit(jax.grad(lambda *a: floss(*a, 'xla'),
                          argnums=tuple(range(5))))(*args)
    gp = jax.jit(jax.grad(lambda *a: floss(*a, 'pallas'),
                          argnums=tuple(range(5))))(*args)
    rels = {n: _rel(p, x) for n, x, p in
            zip(('loc', 'k', 'sens', 'df', 'T2s'), gx, gp)}
    ftol = 2e-3       # dphi chains the f32 phase roundoff once more
    okf = all(r < ftol for r in rels.values())
    _record(f'signal_field_grads_nc{nC}', okf,
            'fused-VJP vs XLA: ' + ', '.join(
                f'd{n} {r:.1e}' for n, r in rels.items())
            + f' (tol {ftol:.0e})')
    return ok and okf


def _spgr_adjoint_parity(interpret: bool):
    r"""Round 3: the in-kernel hand-transposed SPGR adjoint
    (epg_pallas._spgr_bwd_kernel) vs the XLA backend's autodiff —
    flips/phis/T1/T2/M0/b1 gradients on compiled Mosaic (pins the
    shift transpose, the chunked checkpoint restarts, and the
    lane-partial coefficient reductions)."""
    from mrphy_tpu.ops import epg, epg_pallas
    rng = np.random.default_rng(29)
    ntr, nA, K = 120, 1024, 32
    assert epg_pallas.spgr_bwd_is_available(nTR=ntr, K=K, nA=nA)
    flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), DT32)
    phis = jnp.asarray(epg.rf_spoil_phases(ntr), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), DT32)
    b1 = jnp.asarray(rng.uniform(0.8, 1.2, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), DT32)

    def loss(be, fl, ph, t1, t2, b):
        return jnp.sum(w * epg.epg_spgr(fl, ph, T1=t1, T2=t2,
                                        tr=12e-3, te=3e-3, K=K, b1=b,
                                        backend=be))

    an = tuple(range(5))
    gx = jax.jit(jax.grad(lambda *a: loss('xla', *a), argnums=an))(
        flips, phis, T1, T2, b1)
    gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a), argnums=an))(
        flips, phis, T1, T2, b1)
    rels = {n: _rel(p, x) for n, x, p in
            zip(('flips', 'phis', 'T1', 'T2', 'b1'), gx, gp)}
    tol = 1e-3          # both paths f32 here; T1-grad conditioning
    ok = all(r < tol for r in rels.values())
    _record('spgr_adjoint', ok,
            'in-kernel adjoint vs XLA grads: ' + ', '.join(
                f'd{n} {r:.1e}' for n, r in rels.items())
            + f' (tol {tol:.0e})')


def _spgr_vartr_adjoint_parity(interpret: bool):
    r"""Round 4: the canonical MRF-FISP schedule — variable-TR/TE
    train + inversion prep (zinit/ir_prep) — through the fused SPGR
    kernel's in-kernel adjoint: pins the per-TR factor recompute
    (expm1 recovery), the dR1/dR2/dM0 chains, and the per-TR
    d(tr)/d(te) coefficient rows on compiled Mosaic."""
    from mrphy_tpu.ops import epg, epg_pallas
    rng = np.random.default_rng(41)
    ntr, nA, K = 120, 1024, 32
    assert epg_pallas.spgr_bwd_is_available(nTR=ntr, K=K, nA=nA)
    flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), DT32)
    phis = jnp.asarray(epg.rf_spoil_phases(ntr), DT32)
    trs = jnp.asarray(rng.uniform(10e-3, 15e-3, ntr), DT32)
    tes = jnp.asarray(rng.uniform(2e-3, 4e-3, ntr), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), DT32)
    M0 = jnp.asarray(rng.uniform(0.8, 1.2, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), DT32)

    def loss(be, fl, trv, tev, t1, t2, m0):
        zi = epg.ir_prep(0.018, t1, m0)
        return jnp.sum(w * epg.epg_spgr(fl, phis, T1=t1, T2=t2,
                                        tr=trv, te=tev, M0=m0,
                                        zinit=zi, K=K, backend=be))

    an = tuple(range(6))
    gx = jax.jit(jax.grad(lambda *a: loss('xla', *a), argnums=an))(
        flips, trs, tes, T1, T2, M0)
    gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a), argnums=an))(
        flips, trs, tes, T1, T2, M0)
    rels = {n: _rel(p, x) for n, x, p in
            zip(('flips', 'tr', 'te', 'T1', 'T2', 'M0'), gx, gp)}
    tol = 1e-3
    ok = all(r < tol for r in rels.values())
    _record('spgr_vartr_adjoint', ok,
            'MRF-FISP schedule adjoint vs XLA grads: ' + ', '.join(
                f'd{n} {r:.1e}' for n, r in rels.items())
            + f' (tol {tol:.0e})')


def _spgr_diffusion_parity(interpret: bool):
    r"""Round 4: in-kernel spoiler diffusion (per-order attenuation
    planes, exactly epg_diffusion with delta=kshift) — forward parity
    and the adjoint's dD chain on compiled Mosaic (diffusion-MRF)."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(43)
    ntr, nA, K = 120, 1024, 32
    flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), DT32)
    phis = jnp.asarray(epg.rf_spoil_phases(ntr), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), DT32)
    Dv = jnp.asarray(rng.uniform(0.5e-5, 3e-5, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), DT32)
    kw = dict(T1=T1, T2=T2, tr=12e-3, te=3e-3, K=K, dk=500.0)

    x = jax.jit(lambda d: epg.epg_spgr(flips, phis, D=d,
                                       backend='xla', **kw))(Dv)
    p = jax.jit(lambda d: epg.epg_spgr(flips, phis, D=d,
                                       backend='pallas', **kw))(Dv)
    rel = _rel(np.asarray(p), np.asarray(x))

    def loss(be, d, t2):
        return jnp.sum(w * epg.epg_spgr(flips, phis, T1=T1, T2=t2,
                                        tr=12e-3, te=3e-3, K=K, D=d,
                                        dk=500.0, backend=be))

    gx = jax.jit(jax.grad(lambda *a: loss('xla', *a),
                          argnums=(0, 1)))(Dv, T2)
    gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a),
                          argnums=(0, 1)))(Dv, T2)
    rd, rt2 = _rel(gp[0], gx[0]), _rel(gp[1], gx[1])
    tol = 1e-3
    ok = rel < 2e-4 and rd < tol and rt2 < tol
    _record('spgr_diffusion', ok,
            f'in-kernel spoiler diffusion: fwd rel {rel:.1e} '
            f'(tol 2e-4), dD {rd:.1e}, dT2 {rt2:.1e} (tol {tol:.0e})')

    # variable-TR crusher schedule (round 4 continued): per-step
    # attenuation planes from the rate row; dD + the tr train's
    # diffusion row chained by the in-kernel adjoint
    trs = jnp.asarray(rng.uniform(9e-3, 15e-3, ntr), DT32)

    def loss_v(be, d, trv):
        return jnp.sum(w * epg.epg_spgr(flips, phis, T1=T1, T2=T2,
                                        tr=trv, te=3e-3, K=K, D=d,
                                        dk=500.0, backend=be))

    xv = jax.jit(lambda d: epg.epg_spgr(flips, phis, D=d, T1=T1,
                                        T2=T2, tr=trs, te=3e-3, K=K,
                                        dk=500.0, backend='xla'))(Dv)
    pv = jax.jit(lambda d: epg.epg_spgr(flips, phis, D=d, T1=T1,
                                        T2=T2, tr=trs, te=3e-3, K=K,
                                        dk=500.0,
                                        backend='pallas'))(Dv)
    relv = _rel(np.asarray(pv), np.asarray(xv))
    gxv = jax.jit(jax.grad(lambda *a: loss_v('xla', *a),
                           argnums=(0, 1)))(Dv, trs)
    gpv = jax.jit(jax.grad(lambda *a: loss_v('pallas', *a),
                           argnums=(0, 1)))(Dv, trs)
    rdv, rtr = _rel(gpv[0], gxv[0]), _rel(gpv[1], gxv[1])
    okv = relv < 2e-4 and rdv < tol and rtr < tol
    _record('spgr_diffusion_vartr', okv,
            f'variable-TR crushers: fwd rel {relv:.1e} (tol 2e-4), '
            f'dD {rdv:.1e}, dtr {rtr:.1e} (tol {tol:.0e})')


def _cpmg_adjoint_parity(interpret: bool):
    r"""Round 3: the in-kernel CPMG adjoint vs XLA autodiff grads on
    compiled Mosaic (volume T2/MWF fitting path)."""
    from mrphy_tpu.ops import epg, epg_pallas
    rng = np.random.default_rng(31)
    nE, nA = 32, 1024
    assert epg_pallas.cpmg_bwd_is_available(nE=nE, nA=nA)
    flips = jnp.asarray(np.deg2rad(rng.uniform(120, 180, nE)), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), DT32)
    b1 = jnp.asarray(rng.uniform(0.8, 1.2, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, nE, 2)), DT32)

    def loss(be, fl, t1, t2, b):
        return jnp.sum(w * epg.epg_cpmg(fl, T1=t1, T2=t2, esp=0.01,
                                        b1=b, backend=be))

    an = tuple(range(4))
    gx = jax.jit(jax.grad(lambda *a: loss('xla', *a), argnums=an))(
        flips, T1, T2, b1)
    gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a), argnums=an))(
        flips, T1, T2, b1)
    rels = {n: _rel(p, x) for n, x, p in
            zip(('flips', 'T1', 'T2', 'b1'), gx, gp)}
    tol = 1e-3
    ok = all(r < tol for r in rels.values())
    _record('cpmg_adjoint', ok,
            'in-kernel adjoint vs XLA grads: ' + ', '.join(
                f'd{n} {r:.1e}' for n, r in rels.items())
            + f' (tol {tol:.0e})')


def _epgx_adjoint_parity(interpret: bool):
    r"""Round 3: the in-kernel two-pool (EPG-X) adjoints — SPGR and
    CPMG — vs XLA autodiff grads on compiled Mosaic (volume MWF /
    exchange-MRF fitting paths)."""
    from mrphy_tpu.ops import epg, epg_pallas
    rng = np.random.default_rng(37)
    n, nA = 32, 1024
    assert epg_pallas.xspgr_bwd_is_available(nTR=n, K=16, nA=nA)
    assert epg_pallas.xcpmg_bwd_is_available(nE=n, nA=nA)
    flips = jnp.asarray(np.deg2rad(rng.uniform(60, 180, n)), DT32)
    T1a = jnp.asarray(rng.uniform(0.5, 2.0, nA), DT32)
    kab = jnp.asarray(rng.uniform(2.0, 8.0, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, n, 2)), DT32)

    def loss_s(be, fl, t1a, k_):
        s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                          T2b=0.02, kab=k_, kba=20.0, tr=12e-3, K=16,
                          backend=be)
        return jnp.sum(w * s)

    def loss_c(be, fl, t1a, k_):
        s = epg.epgx_cpmg(fl, T1a=t1a, T2a=0.08, T1b=1.0, T2b=0.015,
                          kab=k_, kba=18.0, esp=0.01, dfb=30.0,
                          backend=be)
        return jnp.sum(w * s)

    wt = jnp.asarray(rng.uniform(0.0, 30.0, n), DT32)

    def loss_m(be, fl, t1a, k_):
        s = epg.epgx_mt_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                             kab=k_, kba=20.0, tr=0.03, wt=wt, K=16,
                             M0b=0.15, backend=be)
        return jnp.sum(w * s)

    assert epg_pallas.mt_bwd_is_available(nTR=n, K=16, nA=nA)
    an = (0, 1, 2)
    tol = 1e-3
    for nm, loss in (('xspgr', loss_s), ('xcpmg', loss_c),
                     ('mt', loss_m)):
        gx = jax.jit(jax.grad(lambda *a: loss('xla', *a),
                              argnums=an))(flips, T1a, kab)
        gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a),
                              argnums=an))(flips, T1a, kab)
        rels = {m: _rel(p, x) for m, x, p in
                zip(('flips', 'T1a', 'kab'), gx, gp)}
        ok = all(r < tol for r in rels.values())
        _record(f'{nm}_adjoint', ok,
                'in-kernel two-pool adjoint vs XLA grads: '
                + ', '.join(f'd{m} {r:.1e}' for m, r in rels.items())
                + f' (tol {tol:.0e})')


def _varint_adjoint_parity(interpret: bool):
    r"""Round 5: fused VARIABLE-INTERVAL trains with native adjoints
    for all four families — epgx_spgr `(nTR,)` TR trains,
    epgx_cpmg/epg_cpmg `(nEcho,)` spacing trains, epgx_mt_spgr TR
    trains — plus in-kernel CPMG spoiler diffusion. Per-step
    propagator planes are streamed; the adjoints emit per-step
    entry-cotangent rows chained outside by autodiff. Pins the
    Mosaic lowering of the dynamic leading-dim pkt reads."""
    from mrphy_tpu.ops import epg, epg_pallas
    rng = np.random.default_rng(41)
    n, nA = 32, 1024
    assert epg_pallas.xspgr_bwd_is_available(nTR=n, K=16, nA=nA,
                                             varint=True)
    assert epg_pallas.xcpmg_bwd_is_available(nE=n, nA=nA, varint=True)
    assert epg_pallas.mt_bwd_is_available(nTR=n, K=16, nA=nA,
                                          varint=True)
    assert epg_pallas.cpmg_bwd_is_available(nE=n, nA=nA, varint=True)
    flips = jnp.asarray(np.deg2rad(rng.uniform(60, 180, n)), DT32)
    T1a = jnp.asarray(rng.uniform(0.5, 2.0, nA), DT32)
    kab = jnp.asarray(rng.uniform(2.0, 8.0, nA), DT32)
    ivs = jnp.asarray(rng.uniform(0.008, 0.018, n), DT32)
    w = jnp.asarray(rng.standard_normal((nA, n, 2)), DT32)

    def loss_s(be, fl, t1a, k_, iv):
        s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                          T2b=0.02, kab=k_, kba=20.0, tr=iv, K=16,
                          backend=be)
        return jnp.sum(w * s)

    def loss_c(be, fl, t1a, k_, iv):
        s = epg.epgx_cpmg(fl, T1a=t1a, T2a=0.08, T1b=1.0, T2b=0.015,
                          kab=k_, kba=18.0, esp=iv, dfb=30.0,
                          backend=be)
        return jnp.sum(w * s)

    wt = jnp.asarray(rng.uniform(0.0, 30.0, n), DT32)

    def loss_m(be, fl, t1a, k_, iv):
        s = epg.epgx_mt_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                             kab=k_, kba=20.0, tr=iv, wt=wt, K=16,
                             M0b=0.15, backend=be)
        return jnp.sum(w * s)

    Dv = jnp.asarray(rng.uniform(0.5, 3.0, nA) * 1e-3, DT32)

    def loss_d(be, fl, t2, d, iv):
        s = epg.epg_cpmg(fl, T1=1.0, T2=t2, esp=iv, D=d, dk=25.0,
                         backend=be)
        return jnp.sum(w * s)

    T2v = jnp.asarray(rng.uniform(0.04, 0.2, nA), DT32)
    tol = 1e-3
    cases = (('xspgr_vartr', loss_s, (flips, T1a, kab, ivs),
              ('flips', 'T1a', 'kab', 'trs')),
             ('xcpmg_varesp', loss_c, (flips, T1a, kab, ivs),
              ('flips', 'T1a', 'kab', 'esps')),
             ('mt_vartr', loss_m, (flips, T1a, kab, ivs),
              ('flips', 'T1a', 'kab', 'trs')),
             ('cpmg_varesp_diff', loss_d, (flips, T2v, Dv, ivs),
              ('flips', 'T2', 'D', 'esps')))
    an = (0, 1, 2, 3)
    for nm, loss, args, names in cases:
        gx = jax.jit(jax.grad(lambda *a: loss('xla', *a),
                              argnums=an))(*args)
        gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a),
                              argnums=an))(*args)
        rels = {m: _rel(p, x) for m, x, p in zip(names, gx, gp)}
        ok = all(r < tol for r in rels.values())
        _record(f'{nm}_adjoint', ok,
                'fused variable-interval adjoint vs XLA grads: '
                + ', '.join(f'd{m} {r:.1e}' for m, r in rels.items())
                + f' (tol {tol:.0e})')


def _epg_kernel_parity(interpret: bool):
    r"""Fused EPG dictionary kernel (ops/epg_pallas.py) vs the XLA scan,
    f32: pins the Mosaic lowering of the sublane rolls, k=0 hemisphere
    selects, and SMEM per-TR coefficient reads (all invisible to the
    CPU interpreter)."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(9)
    nA, nTR, K = 1024, 120, 32
    flips = jnp.asarray(rng.uniform(0.15, 1.2, nTR), DT32)
    phis = epg.rf_spoil_phases(nTR).astype(DT32)
    T1 = jnp.asarray(rng.uniform(0.2, 3.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.4, nA), DT32)
    kw = dict(T1=T1, T2=T2, tr=12e-3, te=3e-3, K=K)
    ref = np.asarray(jax.jit(lambda t1, t2: epg.epg_spgr(
        flips, phis, **{**kw, 'T1': t1, 'T2': t2}))(T1, T2))
    from mrphy_tpu.ops.epg_pallas import epg_spgr_pallas
    out = np.asarray(epg_spgr_pallas(flips, phis, interpret=interpret,
                                     **kw))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    ok = rel < 2e-4
    _record('epg_dict_kernel', ok,
            f'pallas-vs-xla rel {rel:.1e} (tol 2e-4), '
            f'{nA} atoms x {nTR} TR, K={K}')


def _cpmg_kernel_parity(interpret: bool):
    r"""Fused CPMG mapping kernel vs the XLA train, f32: covers the
    double relax+shift per echo and the closed-form excitation init."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(17)
    nA, nE = 1024, 48
    flips = jnp.asarray(rng.uniform(1.5, np.pi, nE), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 3.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.3, nA), DT32)
    al = jnp.asarray(rng.uniform(0.3, np.pi / 2, nA), DT32)
    ref = np.asarray(epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01,
                                  alpha_ex=al))
    from mrphy_tpu.ops.epg_pallas import epg_cpmg_pallas
    out = np.asarray(epg_cpmg_pallas(flips, T1=T1, T2=T2, esp=0.01,
                                     alpha_ex=al,
                                     interpret=interpret))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    ok = rel < 2e-4
    _record('cpmg_map_kernel', ok,
            f'pallas-vs-xla rel {rel:.1e} (tol 2e-4), '
            f'{nA} voxels x {nE} echoes, slice-profile alpha_ex')


def _epgx_kernel_parity(interpret: bool):
    r"""Fused two-pool EPG-X kernel vs the XLA scan, f32: adds the
    complex exchange propagator lane-vector reads and the doubled
    state-plane carry to the Mosaic coverage."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(11)
    nA, nTR, K = 1024, 120, 32
    flips = jnp.asarray(rng.uniform(0.15, 1.2, nTR), DT32)
    phis = epg.rf_spoil_phases(nTR).astype(DT32)
    kw = dict(T1a=jnp.asarray(rng.uniform(0.5, 2.0, nA), DT32),
              T2a=jnp.asarray(rng.uniform(0.05, 0.3, nA), DT32),
              T1b=jnp.asarray(rng.uniform(0.2, 0.6, nA), DT32),
              T2b=jnp.asarray(rng.uniform(0.005, 0.03, nA), DT32),
              kab=jnp.asarray(rng.uniform(1.0, 10.0, nA), DT32),
              kba=jnp.asarray(rng.uniform(5.0, 40.0, nA), DT32),
              dfb=jnp.asarray(rng.uniform(-20, 20, nA), DT32),
              tr=12e-3, K=K)
    ref = np.asarray(epg.epgx_spgr(flips, phis, **kw))
    from mrphy_tpu.ops.epg_pallas import epgx_spgr_pallas
    out = np.asarray(epgx_spgr_pallas(flips, phis,
                                      interpret=interpret, **kw))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    ok = rel < 2e-4
    _record('epgx_dict_kernel', ok,
            f'pallas-vs-xla rel {rel:.1e} (tol 2e-4), '
            f'{nA} atoms x {nTR} TR, K={K}, two-pool')


def _epgx_cpmg_kernel_parity(interpret: bool):
    r"""Fused two-pool CPMG (MWF) kernel vs the XLA train, f32."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(19)
    nA, nE = 1024, 48
    flips = jnp.asarray(rng.uniform(1.5, np.pi, nE), DT32)
    kw = dict(T1a=jnp.asarray(rng.uniform(0.5, 2.0, nA), DT32),
              T2a=jnp.asarray(rng.uniform(0.05, 0.3, nA), DT32),
              T1b=jnp.asarray(rng.uniform(0.2, 0.6, nA), DT32),
              T2b=jnp.asarray(rng.uniform(0.005, 0.03, nA), DT32),
              kab=jnp.asarray(rng.uniform(1.0, 10.0, nA), DT32),
              kba=jnp.asarray(rng.uniform(5.0, 40.0, nA), DT32),
              M0b=jnp.asarray(rng.uniform(0.05, 0.3, nA), DT32),
              esp=0.01)
    ref = np.asarray(epg.epgx_cpmg(flips, **kw))
    from mrphy_tpu.ops.epg_pallas import epgx_cpmg_pallas
    out = np.asarray(epgx_cpmg_pallas(flips, interpret=interpret,
                                      **kw))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    ok = rel < 2e-4
    _record('epgx_cpmg_kernel', ok,
            f'pallas-vs-xla rel {rel:.1e} (tol 2e-4), '
            f'{nA} voxels x {nE} echoes, two-pool MWF')


def _epgx_mt_kernel_parity(interpret: bool):
    r"""Fused EPG-X(MT) qMT-train kernel vs the XLA scan, f32: adds the
    in-kernel rank-1 saturation exp to the Mosaic coverage."""
    from mrphy_tpu.ops import epg
    rng = np.random.default_rng(13)
    nA, nTR, K = 1024, 120, 32
    flips = jnp.asarray(rng.uniform(0.15, 1.2, nTR), DT32)
    phis = epg.rf_spoil_phases(nTR).astype(DT32)
    wt = jnp.asarray(rng.uniform(0.0, 0.5, nTR), DT32)
    kw = dict(T1a=jnp.asarray(rng.uniform(0.5, 2.0, nA), DT32),
              T2a=jnp.asarray(rng.uniform(0.05, 0.3, nA), DT32),
              T1b=jnp.asarray(rng.uniform(0.2, 0.6, nA), DT32),
              kab=jnp.asarray(rng.uniform(1.0, 10.0, nA), DT32),
              kba=jnp.asarray(rng.uniform(5.0, 40.0, nA), DT32),
              M0b=jnp.asarray(rng.uniform(0.05, 0.3, nA), DT32),
              tr=12e-3, K=K)
    ref = np.asarray(epg.epgx_mt_spgr(flips, phis, wt=wt, **kw))
    from mrphy_tpu.ops.epg_pallas import epgx_mt_spgr_pallas
    out = np.asarray(epgx_mt_spgr_pallas(flips, phis, wt=wt,
                                         interpret=interpret, **kw))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    ok = rel < 2e-4
    _record('epgx_mt_dict_kernel', ok,
            f'pallas-vs-xla rel {rel:.1e} (tol 2e-4), '
            f'{nA} atoms x {nTR} TR, K={K}, bound-pool MT')


def _bssfp_kernel_parity(interpret: bool):
    r"""Fused bSSFP-MRF dictionary kernel (ops/ssfp_pallas.py) vs the
    XLA train, f32: pins the Mosaic lowering of the full-tile (8, lane)
    atom layout, the precomputed-factor constant-TR path, and the
    in-kernel exp/expm1/sincos of the variable-TR path."""
    from mrphy_tpu.ops.ssfp import bssfp_train
    from mrphy_tpu.ops.ssfp_pallas import bssfp_train_pallas
    rng = np.random.default_rng(23)
    nA, nTR = 2048, 200
    flips = jnp.asarray(rng.uniform(0.1, 1.2, nTR), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 3.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.3, nA), DT32)
    df = jnp.asarray(rng.uniform(-120, 120, nA), DT32)
    b1 = jnp.asarray(rng.uniform(0.7, 1.3, nA), DT32)
    trs = jnp.asarray(rng.uniform(4e-3, 8e-3, nTR), DT32)

    ref_c = np.asarray(jax.jit(lambda *a: bssfp_train(
        flips, T1=a[0], T2=a[1], tr=5e-3, df=a[2]))(T1, T2, df))
    out_c = np.asarray(bssfp_train_pallas(flips, T1=T1, T2=T2, tr=5e-3,
                                          df=df, interpret=interpret))
    rel_c = np.abs(out_c - ref_c).max() / np.abs(ref_c).max()

    ref_v = np.asarray(jax.jit(lambda *a: bssfp_train(
        a[3][:, None] * flips[None], T1=a[0], T2=a[1], tr=trs,
        df=a[2]))(T1, T2, df, b1))
    out_v = np.asarray(bssfp_train_pallas(flips, T1=T1, T2=T2, tr=trs,
                                          df=df, b1=b1,
                                          interpret=interpret))
    rel_v = np.abs(out_v - ref_v).max() / np.abs(ref_v).max()

    ok = rel_c < 2e-4 and rel_v < 2e-4
    _record('bssfp_dict_kernel', ok,
            f'pallas-vs-xla rel const-TR {rel_c:.1e} / var-TR+b1 '
            f'{rel_v:.1e} (tol 2e-4), {nA} atoms x {nTR} TR')


def _bssfp_adjoint_parity(interpret: bool):
    r"""Round 4: the in-kernel hand-transposed bSSFP adjoint
    (ssfp_pallas._bssfp_bwd_kernel) vs the XLA backend's autodiff —
    the last train family off the recompute-through-XLA VJP. Pins the
    three-stage transpose (remainder/TE/RF), the variable-TR in-kernel
    factor chains (d/d om, R1, R2, te, rem), and the per-atom B1 flip
    chain on compiled Mosaic."""
    from mrphy_tpu.ops import ssfp
    from mrphy_tpu.ops.ssfp_pallas import bssfp_bwd_is_available
    rng = np.random.default_rng(37)
    ntr, nA = 200, 1024
    assert bssfp_bwd_is_available(nTR=ntr, nA=nA)
    flips = jnp.asarray(rng.uniform(0.1, 1.2, ntr), DT32)
    trs = jnp.asarray(rng.uniform(4e-3, 8e-3, ntr), DT32)
    T1 = jnp.asarray(rng.uniform(0.3, 3.0, nA), DT32)
    T2 = jnp.asarray(rng.uniform(0.02, 0.3, nA), DT32)
    df = jnp.asarray(rng.uniform(-120, 120, nA), DT32)
    b1 = jnp.asarray(rng.uniform(0.7, 1.3, nA), DT32)
    w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), DT32)

    def loss(be, fl, trv, t1, t2, dfv, b):
        return jnp.sum(w * ssfp.bssfp_train(fl, T1=t1, T2=t2, tr=trv,
                                            df=dfv, b1=b, backend=be))

    an = tuple(range(6))
    gx = jax.jit(jax.grad(lambda *a: loss('xla', *a), argnums=an))(
        flips, trs, T1, T2, df, b1)
    gp = jax.jit(jax.grad(lambda *a: loss('pallas', *a), argnums=an))(
        flips, trs, T1, T2, df, b1)
    rels = {n: _rel(p, x) for n, x, p in
            zip(('flips', 'tr', 'T1', 'T2', 'df', 'b1'), gx, gp)}
    tol = 1e-3          # both paths f32 here
    ok = all(r < tol for r in rels.values())
    _record('bssfp_adjoint', ok,
            'in-kernel adjoint vs XLA grads: ' + ', '.join(
                f'd{n} {r:.1e}' for n, r in rels.items())
            + f' (tol {tol:.0e})')


def _mc_kernel_parity(interpret: bool, nM: int, nT: int):
    r"""Fused two-pool Bloch–McConnell kernel (ops/mc_pallas.py) vs the
    XLA core, f32, CEST-MRF-style per-voxel tissue/exchange maps: pins
    the 6-plane state carry, the second (pool-b) sincos, and the
    in-kernel exchange mix on the compiled Mosaic path."""
    from mrphy_tpu import gamH
    from mrphy_tpu.ops import mc
    rng = np.random.default_rng(23)
    N = 1
    Mia = jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1)), DT32)
    Mib = 0.02 * Mia
    loc = jnp.asarray(rng.random((N, nM, 3)) * 2 - 1, DT32)
    df = jnp.asarray(rng.random((N, nM)) * 100 - 50, DT32)
    b1 = jnp.asarray(np.stack([0.7 + rng.random((N, nM)) * .6,
                               rng.random((N, nM)) * .1 - .05], -1), DT32)
    rf = jnp.asarray(np.full((N, 2, nT), [[0.005], [0.0]]), DT32)
    gr = jnp.asarray(rng.normal(size=(N, 3, nT)) * 0.1, DT32)
    kab = jnp.asarray(rng.uniform(0.5, 5.0, (N, nM)), DT32)
    kw = dict(T1a=1.2, T2a=0.06, T1b=1.0, T2b=0.01, kab=kab,
              kba=kab * 50.0, Ma0=1.0, Mb0=0.02, dfb=750.0, df=df,
              b1Map=b1, gam=gamH, dt=2e-4)

    fx = jax.jit(lambda *a: mc.blochsim_mc_rfgr(*a, backend='xla', **kw))
    ref = fx(Mia, Mib, rf, gr, loc)
    if interpret:
        out = mc.blochsim_mc_rfgr(Mia, Mib, rf, gr, loc,
                                  _pallas_interpret=True, **kw)
    else:
        fp = jax.jit(lambda *a: mc.blochsim_mc_rfgr(
            *a, backend='pallas', **kw))
        out = fp(Mia, Mib, rf, gr, loc)
    err = max(_max_abs(out[0], ref[0]), _max_abs(out[1], ref[1]))
    ok = err < FWD_ATOL
    _record('mc_rfgr_kernel', ok,
            f'pallas-vs-xla fwd max abs {err:.1e} (tol {FWD_ATOL:.0e}), '
            f'{nM} voxels x {nT} steps, two-pool')

    # round 3: the hand-derived fused two-phase chunk adjoint — grads
    # w.r.t. rf AND an exchange parameter vs the XLA backend's autodiff
    def loss(rf_, kab_, backend):
        Ma, Mb = mc.blochsim_mc_rfgr(
            Mia, Mib, rf_, gr, loc, backend=backend,
            _pallas_interpret=interpret and backend != 'xla',
            **{**kw, 'kab': kab_})
        return jnp.sum(Ma ** 2) + jnp.sum(Mb ** 2)

    be = 'auto' if interpret else 'pallas'
    gx = jax.jit(jax.grad(lambda r_, k_: loss(r_, k_, 'xla'),
                          argnums=(0, 1)))(rf, kab)
    gp = jax.jit(jax.grad(lambda r_, k_: loss(r_, k_, be),
                          argnums=(0, 1)))(rf, kab)
    rel_rf = _rel(gp[0], gx[0])
    rel_k = _rel(gp[1], gx[1])
    tol = 1e-3        # f32 poly-vs-exact sincos accumulated over nT
    okg = rel_rf < tol and rel_k < tol
    _record('mc_rfgr_adjoint', okg,
            f'fused-adjoint drf rel {rel_rf:.1e}, dkab rel '
            f'{rel_k:.1e} vs XLA grads (tol {tol:.0e})')


def _field_stack():
    r"""QSM/field stack (ops/field.py) compiled-f32 numerics: the
    exact ∥-cylinder oracle pins the DFT-diagonal matmul chain (a
    bf16-default dot would err at ~1e-2, 1000× the bound), and the
    congruent-unwrap exactness pins the DCT Poisson solves (binary:
    every voxel must round to the same 2πk)."""
    from mrphy_tpu.ops.field import chi2field, unwrap_phase
    rng = np.random.default_rng(7)
    n = 32
    chi2d = rng.standard_normal((n, n)).astype(np.float32)
    chi = jnp.asarray(np.broadcast_to(chi2d[..., None], (n, n, n)))
    d = jax.jit(chi2field)(chi)
    want = (chi2d - chi2d.mean()) / 3.0
    err = float(np.abs(np.asarray(d)
                       - want[..., None]).max())
    ok = err < 1e-5
    _record('field_dipole_cylinder', ok, f'pointwise chi/3 err {err:.2e}')

    ax = (np.arange(n) - n // 2) / (n / 2)
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    phi = (12.0 * np.exp(-(x ** 2 + y ** 2 + z ** 2) / 0.6)
           + 3.0 * x).astype(np.float32)
    psi = jnp.asarray(np.angle(np.exp(1j * phi)).astype(np.float32))
    u = np.asarray(jax.jit(unwrap_phase)(psi))
    dres = u - phi
    k = np.round(np.median(dres) / (2 * np.pi))
    resid = float(np.abs(dres - 2 * np.pi * k).max())
    ok2 = resid < 5e-4
    _record('field_unwrap_congruent', ok2,
            f'2pik residual {resid:.2e} (exactness is binary)')


def _sincos_sweep():
    r"""Compiled _fast_sincos over [0, 60] rad vs numpy f64 (the range
    covers ~560 Gauss at dt=4us — far beyond hardware)."""
    phi = jnp.asarray(
        np.concatenate([np.linspace(0, 60, 200001),
                        [0.0, 1e-12, 1e-6, np.pi / 2, np.pi]]), DT32)
    s, c = jax.jit(pallas_kernels._fast_sincos)(phi)
    phi64 = np.asarray(phi, np.float64)
    es = float(np.max(np.abs(np.asarray(s) - np.sin(phi64))))
    ec = float(np.max(np.abs(np.asarray(c) - np.cos(phi64))))
    ok = es < 2e-7 and ec < 2e-7
    _record('fast_sincos_sweep', ok, f'sin {es:.2e}, cos {ec:.2e} '
            f'(tol 2e-7) over [0, 60] rad')
    return ok


def _sincos_cycles_exp_sweep():
    r"""Compiled cycles-domain sincos (`ops/signal_pallas._sincos_m2pi`,
    phase in cycles — k·x reaches ~N/2, df·t a few hundred) and the
    base-e fast exp (`_fast_exp`, decay range) vs numpy f64."""
    from mrphy_tpu.ops import signal_pallas as sp
    phi = jnp.asarray(np.concatenate([
        np.random.default_rng(5).uniform(-1000, 1000, 200001),
        np.linspace(-0.5, 0.5, 4097),
        [0.0, 0.25, -0.25, 0.5, 511.75, -511.75]]), DT32)
    s, c = jax.jit(sp._sincos_m2pi)(phi)
    ref = np.exp(-2j * np.pi * np.asarray(phi, np.float64))
    es = float(np.max(np.abs(np.asarray(s) - ref.imag)))
    ec = float(np.max(np.abs(np.asarray(c) - ref.real)))
    y = jnp.asarray(-np.concatenate([np.linspace(0, 86.9, 100001),
                                     10**np.linspace(-8, 1.9, 10001)]),
                    DT32)
    e = np.asarray(jax.jit(sp._fast_exp)(y), np.float64)
    rexp = np.exp(np.asarray(y, np.float64))
    ee = float(np.max(np.abs(e - rexp) / rexp))
    ok = es < 4e-7 and ec < 4e-7 and ee < 4e-7
    _record('sincos_cycles_exp_sweep', ok,
            f'sin {es:.2e}, cos {ec:.2e} over ±1000 cycles; '
            f'exp rel {ee:.2e} over (-87, 0] (tol 4e-7)')
    return ok


def _nufft3d_kernel_parity(interpret: bool):
    r"""3-D Pallas interpolation kernel (ops/nufft_pallas.py) vs the
    XLA gather path on a true-3D random trajectory: fwd, adjoint, and
    the ⟨Ax, y⟩ = ⟨x, Aᴴy⟩ identity of the pallas pair (pins the
    VMEM-resident slice loads, the wrap-pad/fold transpose pair, and
    the scatter's read-modify-write accumulation on compiled Mosaic)."""
    from mrphy_tpu.ops import nufft as nf
    rng = np.random.default_rng(17)
    n, nT = 24, 4097                        # odd nT exercises padding
    fov = (24.0, 20.0, 28.0)
    img = jnp.asarray(rng.standard_normal((n, n, n, 2)), DT32)
    kmax = n / 2 / max(fov)
    kt = jnp.asarray(rng.uniform(-kmax, kmax, (3, nT)), DT32)
    pg = nf.nufft_plan((n,) * 3, fov, width=4, interp='gather')
    pp = nf.nufft_plan((n,) * 3, fov, width=4, interp='pallas')
    sg = jax.jit(lambda im: nf.nufft(pg, im, kt))(img)
    sp = jax.jit(lambda im: nf.nufft(pp, im, kt))(img)
    rel_f = _rel(sp, sg)
    y = jnp.asarray(rng.standard_normal((nT, 2)), DT32)
    ag = jax.jit(lambda s: nf.nufft_adjoint(pg, s, kt))(y)
    ap = jax.jit(lambda s: nf.nufft_adjoint(pp, s, kt))(y)
    rel_a = _rel(ap, ag)
    lhs = float(jnp.sum(sp * y))
    rhs = float(jnp.sum(img * ap))
    rel_d = abs(lhs - rhs) / (abs(lhs) + 1e-30)
    tol = 1e-5
    ok = rel_f < tol and rel_a < tol and rel_d < 1e-5
    _record('nufft3d_kernel', ok,
            f'pallas-vs-gather fwd rel {rel_f:.1e}, adj rel '
            f'{rel_a:.1e}, dot identity {rel_d:.1e} (tol {tol:.0e})')

    # native VJP (round 4): image + trajectory grads of BOTH stages
    # computed by the scatter/sample transposes + the dk3d kernel must
    # match the gather path's autodiff on compiled Mosaic
    def loss_f(plan):
        return lambda im, kk: jnp.sum(nf.nufft(plan, im, kk) ** 2)

    def loss_a(plan):
        return lambda s, kk: jnp.sum(
            nf.nufft_adjoint(plan, s, kk) ** 2)

    gi_g, gk_g = jax.jit(jax.grad(loss_f(pg), argnums=(0, 1)))(
        img, kt)
    gi_p, gk_p = jax.jit(jax.grad(loss_f(pp), argnums=(0, 1)))(
        img, kt)
    gs_g, hk_g = jax.jit(jax.grad(loss_a(pg), argnums=(0, 1)))(y, kt)
    gs_p, hk_p = jax.jit(jax.grad(loss_a(pp), argnums=(0, 1)))(y, kt)
    rels = [_rel(gi_p, gi_g), _rel(gk_p, gk_g),
            _rel(gs_p, gs_g), _rel(hk_p, hk_g)]
    gtol = 5e-4
    okg = max(rels) < gtol
    _record('nufft3d_native_vjp', okg,
            f'fwd dimg {rels[0]:.1e} dk {rels[1]:.1e}; adj ds '
            f'{rels[2]:.1e} dk {rels[3]:.1e} (tol {gtol:.0e})')
    ok = ok and okg


def _mrf_pipeline_check():
    r"""End-to-end MRF pipeline on the chip (round 3): fused SPGR
    dictionary → SVD-16 compression → fused compressed matcher, fed
    noisy random-phase probes from ground-truth atoms — the recovered
    T1/T2 maps must hit the truth (median rel err, not just backend
    parity; complements the per-stage checks)."""
    from mrphy_tpu.ops import epg, mrf
    rng = np.random.default_rng(13)
    nTR = 200
    flips = jnp.asarray(np.deg2rad(10 + 50 * np.abs(
        np.sin(np.arange(nTR) / 40.0))), DT32)
    T1g, T2g = np.meshgrid(np.geomspace(0.2, 3.0, 96),
                           np.geomspace(0.02, 0.5, 64), indexing='ij')
    keep = T2g < T1g
    T1 = jnp.asarray(T1g[keep], DT32)
    T2 = jnp.asarray(T2g[keep], DT32)
    nA = T1.shape[0]
    D = epg.epg_spgr(flips, None, T1=T1, T2=T2, tr=0.012, te=0.003,
                     K=48, backend='pallas')
    basis = mrf.svd_basis(D, rank=16)
    Dc = mrf.compress(D, basis)
    nV = 50000
    ks = rng.integers(0, nA, nV)
    ph = rng.uniform(-np.pi, np.pi, nV).astype(np.float32)
    X = np.asarray(D)[ks]
    X = (np.cos(ph)[:, None, None] * X
         + np.sin(ph)[:, None, None]
         * np.stack([-X[..., 1], X[..., 0]], -1))
    X += 0.002 * rng.standard_normal(X.shape).astype(np.float32)
    Xc = mrf.compress(jnp.asarray(X, DT32), basis)
    res = jax.jit(lambda d, x: mrf.dict_match_compressed(
        d, x, basis))(Dc, Xc)
    t1h = np.asarray(T1)[np.asarray(res.idx)]
    t2h = np.asarray(T2)[np.asarray(res.idx)]
    e1 = float(np.median(np.abs(t1h - np.asarray(T1)[ks])
                         / np.asarray(T1)[ks]))
    e2 = float(np.median(np.abs(t2h - np.asarray(T2)[ks])
                         / np.asarray(T2)[ks]))
    ok = e1 < 0.02 and e2 < 0.02
    _record('mrf_pipeline', ok,
            f'fused dict+SVD16+match: median T1 rel {e1:.4f}, '
            f'T2 rel {e2:.4f} over {nV} noisy voxels ({nA} atoms)')


def _mrf_match_parity():
    r"""Fused Pallas matcher (ops/mrf_pallas.py) vs the XLA matcher,
    compiled on the real chip: identical argmax indices, matching
    scores/m0. Uses a realistic SPGR dictionary (near-degenerate
    neighbors — exactly where dot-precision regressions would flip
    winners) plus random-phase probes."""
    from mrphy_tpu.ops import epg, mrf
    rng = np.random.default_rng(11)
    nTR = 200
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(10 + 60 * np.abs(
        np.sin(np.pi * t / 75))), DT32)
    phis = epg.rf_spoil_phases(nTR).astype(DT32)
    T1g, T2g = np.meshgrid(np.geomspace(0.2, 4.0, 96),
                           np.geomspace(0.015, 0.5, 64),
                           indexing='ij')
    D = epg.epg_spgr(flips, phis, T1=jnp.asarray(T1g.ravel(), DT32),
                     T2=jnp.asarray(T2g.ravel(), DT32), tr=0.012,
                     backend='pallas')
    basis = mrf.svd_basis(D, rank=16)
    Dc = mrf.compress(D, basis)
    nV = 40000                                  # non-multiples of 128
    ks = jnp.asarray(rng.integers(0, Dc.shape[0], nV))
    ph = jnp.asarray(rng.uniform(-np.pi, np.pi, nV), DT32)
    Xc = (jnp.cos(ph)[:, None] * Dc[ks]
          + jnp.sin(ph)[:, None] * (Dc[ks] @ basis.jc.T))
    r_x = jax.jit(lambda d, x: mrf.dict_match_compressed(
        d, x, basis, backend='xla'))(Dc, Xc)
    r_p = jax.jit(lambda d, x: mrf.dict_match_compressed(
        d, x, basis, backend='pallas'))(Dc, Xc)
    agree = float(np.mean(np.asarray(r_x.idx) == np.asarray(r_p.idx)))
    rel_s = _rel(r_p.score, r_x.score)
    rel_m = _rel(r_p.m0, r_x.m0)
    # near-ties may legitimately flip under a different summation
    # order; demand >=99.9% agreement and tight score parity
    ok = agree >= 0.999 and rel_s < 1e-5 and rel_m < 1e-3
    _record('mrf_match_kernel', ok,
            f'idx agree {agree:.5f}, score rel {rel_s:.1e}, '
            f'm0 rel {rel_m:.1e} ({Dc.shape[0]} atoms, {nV} voxels)')

    # opt-in precision='high' knob (bf16x3, half the MXU passes):
    # flips ARE expected between near-degenerate atoms, but every flip
    # must be a near-tie — the winner's score must still match the
    # true best — and scores stay within the bf16x3 error bound.
    from mrphy_tpu.ops.mrf import _match_flat_pallas
    nrm = jnp.linalg.norm(Dc, axis=1)
    Dn = Dc / jnp.maximum(nrm, 1e-30)[:, None]
    Dim = jnp.matmul(Dn, basis.jc.T,
                     precision=jax.lax.Precision.HIGHEST)
    idx_h, score_h, _ = jax.jit(lambda d, di, x, n: _match_flat_pallas(
        d, di, x, n, pairlike=True, precision='high'))(Dn, Dim, Xc, nrm)
    rel_sh = _rel(score_h, r_x.score)
    tie_ok = float(np.mean(
        (np.asarray(idx_h) == np.asarray(r_x.idx))
        | (np.abs(np.asarray(score_h) - np.asarray(r_x.score))
           <= 5e-5 * np.abs(np.asarray(r_x.score)))))
    ok_h = rel_sh < 5e-5 and tie_ok >= 0.9999
    _record('mrf_match_kernel_high', ok_h,
            f'score rel {rel_sh:.1e} (tol 5e-5), tie-aware agree '
            f'{tie_ok:.5f} (>=0.9999)')
    return ok and ok_h


def _mrf_kspace_check():
    r"""k-space MRF composition (round 5): spoke-per-TR acquisition →
    subspace CG → compressed match recovers a two-region phantom's
    (T1, T2) within ~one dictionary cell, AND the subspace encode/
    adjoint pair is numerically adjoint on-chip (the CG operator's
    positive-definiteness rests on it)."""
    from mrphy_tpu.ops import epg, mrf
    from mrphy_tpu.ops.nufft import nufft_plan, nufft
    rng = np.random.default_rng(5)
    N, nTR, rank = 48, 200, 6
    nRO, fov = 2 * N, 20.0
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 40))), DT32)
    trs = jnp.asarray(
        0.012 + 0.004 * np.sin(2 * np.pi * t / 31) ** 2, DT32)

    def gen(T1v, T2v):
        return epg.epg_spgr(flips, None, T1=T1v, T2=T2v, tr=trs,
                            te=0.002, K=16,
                            zinit=epg.ir_prep(0.02, T1v),
                            backend='pallas')

    t1g = np.geomspace(0.3, 3.0, 16)
    t2g = np.geomspace(0.03, 0.4, 10)
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = T2g < T1g
    T1a = jnp.asarray(T1g[keep], DT32)
    T2a = jnp.asarray(T2g[keep], DT32)
    D = jax.jit(gen)(T1a, T2a)
    basis = mrf.svd_basis(D, rank=rank)
    kmax = N / (2 * fov)
    # half-sample-offset spokes: sampling AT -kmax (the Nyquist
    # bin) is ambiguous between the exact operator and the wrapped
    # gridded one; interior samples keep every operator consistent
    rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
    ga = np.pi * (np.sqrt(5) - 1) / 2
    phi = ga * np.arange(nTR)
    ktrajs = jnp.asarray(np.stack([np.cos(phi)[:, None] * rad,
                                   np.sin(phi)[:, None] * rad], 1),
                         DT32)
    plan = nufft_plan((N, N), (fov, fov))

    # adjointness of the subspace system (f32 on-chip)
    x = jnp.asarray(rng.standard_normal((rank, N, N)), DT32)
    y = jnp.asarray(rng.standard_normal((nTR, nRO, 2)), DT32)
    Ax = jax.jit(lambda v: mrf.subspace_encode(
        plan, ktrajs, basis, v))(x)
    AHy = jax.jit(lambda v: mrf.subspace_adjoint(
        plan, ktrajs, basis, v))(y)
    lhs = float(jnp.sum(Ax * y))
    rhs = float(jnp.sum(x * AHy))
    adj_rel = abs(lhs - rhs) / max(1e-30, abs(lhs))

    yy, xx = np.mgrid[:N, :N]
    c = (N - 1) / 2
    mask = np.hypot(yy - c, xx - c) < 0.45 * N
    T1m = np.where(xx < c, 0.8, 1.5)
    T2m = np.where(yy < c, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask], DT32)
    T2v = jnp.asarray(T2m[mask], DT32)
    X = jax.jit(gen)(T1v, T2v)
    imgs = jnp.zeros((nTR, N, N, 2), DT32
                     ).at[:, iy, ix, :].set(jnp.moveaxis(X, 0, 1))
    s = jax.jit(lambda im: jax.lax.scan(
        lambda _, tx: (None, nufft(plan, tx[0], tx[1])),
        None, (im, ktrajs))[1])(imgs)
    alpha = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=8))(s)
    probes = jnp.moveaxis(alpha, 0, -1)[iy, ix]
    res = mrf.dict_match_compressed(mrf.compress(D, basis), probes,
                                    basis)
    e1 = float(np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1)))
    e2 = float(np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1)))
    ok = adj_rel < 1e-4 and e1 < 0.17 and e2 < 0.30
    _record('mrf_kspace_pipeline', ok,
            f'adjointness rel {adj_rel:.1e} (tol 1e-4); median map '
            f'errs T1 {e1 * 100:.1f}%, T2 {e2 * 100:.1f}% '
            f'(grid cells 16%/30%) from {N * N // nRO}x-undersampled '
            f'spokes')


def _nufft_parity():
    r"""Gridding NUFFT (ops/nufft.py) vs the exact signal operator, f32
    on the real chip: the DFT-stage tensordots and the Toeplitz
    contractions run on the MXU, so this pins their HIGHEST-precision
    dots (the same bf16-default trap signal_kernel caught) plus
    compiled scatter/gather interpolation."""
    from mrphy_tpu.ops import nufft as nf
    from mrphy_tpu.ops import signal as sig_mod
    rng = np.random.default_rng(5)
    im_size, fov = (24, 16), (24.0, 16.0)
    nM = im_size[0] * im_size[1]
    axes = [(np.arange(n) - n // 2) / n * f
            for n, f in zip(im_size, fov)]
    yy, xx = np.meshgrid(*axes, indexing='ij')
    loc = np.stack([yy, xx, np.zeros_like(xx)], -1).reshape(nM, 3)
    loc_ = jnp.asarray(loc, DT32)[None]
    img = jnp.asarray(rng.standard_normal(im_size + (2,)), DT32)
    nT = 333
    k = np.zeros((3, nT))
    for a in range(2):
        kmax = 0.95 * im_size[a] / (2 * fov[a])
        k[a] = rng.uniform(-kmax, kmax, nT)
    k3 = jnp.asarray(k, DT32)
    plan = nf.nufft_plan(im_size, fov, width=6, dtype=DT32)  # matmul
    plan_g = nf.nufft_plan(im_size, fov, width=6, dtype=DT32,
                           interp='gather')

    s = np.asarray(jax.jit(lambda i: nf.nufft(plan, i, k3[:2]))(img))
    s_g = np.asarray(jax.jit(
        lambda i: nf.nufft(plan_g, i, k3[:2]))(img))
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), DT32)], -1)[None]
    s0 = np.asarray(sig_mod.signal(M, loc_, k3[None])[0, 0])
    rel_f = _rel(s, s0)
    rel_gm = _rel(s_g, s)       # compiled gather vs compiled matmul

    that = nf.toeplitz_kernel(plan, k3[:2], chunk=128)
    out = np.asarray(jax.jit(
        lambda i: nf.toeplitz_apply(plan, that, i))(img))
    x0 = np.asarray(sig_mod.signal_adjoint(
        jnp.asarray(s0)[None, None], loc_, k3[None])[0]).reshape(
            im_size + (2,))
    rel_t = _rel(out, x0)

    # W=6 gridding floor is 2e-5; allow f32 phase/dot roundoff on top.
    # matmul-vs-gather is the SAME math in different sum orders: 1e-5.
    ok = rel_f < 2e-4 and rel_t < 2e-4 and rel_gm < 1e-5
    _record('nufft_parity', ok,
            f'fwd(matmul) rel {rel_f:.1e}, toeplitz-AHA rel '
            f'{rel_t:.1e} (tol 2e-4); gather-vs-matmul {rel_gm:.1e} '
            f'(tol 1e-5)')
    return ok


def _mesh_1x1(*, nM, nT):
    r"""mesh= dispatch (shard_map) on the real device(s)."""
    from mrphy_tpu.parallel import make_mesh
    mesh = make_mesh(jax.devices()[:1])
    Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1, nM, nT, seed=7)
    kw = dict(T1=T1, T2=T2, df=df)
    a = np.asarray(sims.blochsim_rfgr(Mi, rf, gr, loc, **kw))
    b = np.asarray(sims.blochsim_rfgr(Mi, rf, gr, loc, mesh=mesh, **kw))
    err = float(np.max(np.abs(a - b)))
    ok = err < FWD_ATOL
    _record('mesh_1x1', ok, f'sharded-vs-unsharded fwd err {err:.2e}')
    return ok


def _auto_gate():
    r"""The auto gate must route the headline config (1M x 1000) and the
    longpulse config (1M x 16k) to Pallas, and tiny configs to XLA."""
    on = pallas_kernels.rfgr_is_available(
        N=1, dtype=jnp.float32, nspins=2 ** 20, nT=1000, nC=1)
    on_long = pallas_kernels.rfgr_is_available(
        N=1, dtype=jnp.float32, nspins=2 ** 20, nT=16000, nC=1)
    off_small = not pallas_kernels.rfgr_is_available(
        N=1, dtype=jnp.float32, nspins=512, nT=1000, nC=1)
    ok = on and on_long and off_small
    _record('auto_gate', ok,
            f'headline={on}, longpulse={on_long}, small->xla={off_small}')
    return ok


def _export_artifact(*, nM, nT):
    r"""AOT serving artifact (utils/export.py) on the real chip: a
    deserialized engine must execute on-device and match the live jit
    bit-for-bit (same StableHLO → same executable). Tries the portable
    ``platforms=('tpu',)`` artifact first (the CPU-build-host story);
    falls back to the current platform's name if the axon runtime
    registers under a different one."""
    from mrphy_tpu.utils import export_compiled, load_compiled
    Mi, loc, df, b1, rf, gr, T1, T2 = _mk(1, nM, nT, seed=11)

    def fwd(Mi, rf, gr, loc, T1, T2, df):
        return sims.blochsim_rfgr(Mi, rf, gr, loc, T1=T1, T2=T2, df=df)

    args = (Mi, rf, gr, loc, T1, T2, df)
    how = "platforms=('tpu',)"
    try:
        blob = export_compiled(fwd, args, platforms=('tpu',))
        out_a = np.asarray(load_compiled(blob)(*args))
    except Exception:
        how = 'current platform'
        blob = export_compiled(fwd, args)
        out_a = np.asarray(load_compiled(blob)(*args))
    out_j = np.asarray(jax.jit(fwd)(*args))
    err = float(np.max(np.abs(out_a - out_j)))
    ok = err == 0.0
    _record('export_artifact', ok,
            f'{how}, {len(blob)} B, artifact-vs-jit err {err:.1e} '
            f'(must be 0)')
    return ok


def _mrf_sense_check():
    r"""Multi-coil SENSE subspace recon (round 5): on-chip adjointness
    of the coil-weighted encode/adjoint pair over complex pair
    coefficient images, the per-coil Toeplitz sandwich vs the frame
    sweep, the df-segmented pair's adjointness, and the full SENSE
    pipeline (coil acquisition + object phase → sens= CG → jc-composed
    probes → match) recovering maps AND phase."""
    from mrphy_tpu.ops import epg, mrf
    from mrphy_tpu.ops.nufft import _cmul, nufft_plan, nufft
    rng = np.random.default_rng(6)
    N, nTR, rank, nC = 48, 200, 6, 4
    nRO, fov = 2 * N, 20.0
    t = np.arange(nTR)
    flips = jnp.asarray(np.deg2rad(
        10 + 50 * np.abs(np.sin(np.pi * t / 40))), DT32)
    trs = jnp.asarray(
        0.012 + 0.004 * np.sin(2 * np.pi * t / 31) ** 2, DT32)

    def gen(T1v, T2v):
        return epg.epg_spgr(flips, None, T1=T1v, T2=T2v, tr=trs,
                            te=0.002, K=16,
                            zinit=epg.ir_prep(0.02, T1v),
                            backend='pallas')

    t1g = np.geomspace(0.3, 3.0, 16)
    t2g = np.geomspace(0.03, 0.4, 10)
    T1g, T2g = np.meshgrid(t1g, t2g, indexing='ij')
    keep = T2g < T1g
    T1a = jnp.asarray(T1g[keep], DT32)
    T2a = jnp.asarray(T2g[keep], DT32)
    D = jax.jit(gen)(T1a, T2a)
    basis = mrf.svd_basis(D, rank=rank)
    kmax = N / (2 * fov)
    rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
    ga = np.pi * (np.sqrt(5) - 1) / 2
    phi = ga * np.arange(nTR)
    ktrajs = jnp.asarray(np.stack([np.cos(phi)[:, None] * rad,
                                   np.sin(phi)[:, None] * rad], 1),
                         DT32)
    plan = nufft_plan((N, N), (fov, fov))

    # birdcage-ish maps with smooth phase
    yyn, xxn = (np.mgrid[:N, :N] / (N - 1)) - 0.5
    maps = []
    for c in range(nC):
        th = 2 * np.pi * c / nC
        d2 = ((xxn - 0.6 * np.cos(th)) ** 2
              + (yyn - 0.6 * np.sin(th)) ** 2)
        mag = np.exp(-d2 / 0.8)
        ph = 2 * np.pi * 0.3 * (xxn * np.cos(th) + yyn * np.sin(th))
        maps.append(np.stack([mag * np.cos(ph), mag * np.sin(ph)],
                             -1))
    sens = jnp.asarray(np.stack(maps), DT32)

    # 1. SENSE adjointness over complex pair alpha
    x = jnp.asarray(rng.standard_normal((rank, N, N, 2)), DT32)
    y = jnp.asarray(rng.standard_normal((nC, nTR, nRO, 2)), DT32)
    Ax = jax.jit(lambda v: mrf.subspace_encode(
        plan, ktrajs, basis, v, sens=sens))(x)
    AHy = jax.jit(lambda v: mrf.subspace_adjoint(
        plan, ktrajs, basis, v, sens=sens))(y)
    adj_rel = abs(float(jnp.sum(Ax * y)) - float(jnp.sum(x * AHy))) \
        / max(1e-30, abs(float(jnp.sum(Ax * y))))

    # 2. per-coil Toeplitz sandwich == multi-coil frame sweep
    a1 = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=5, method='frames',
        sens=sens))(y)
    a2 = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=5, method='toeplitz',
        sens=sens))(y)
    toep_rel = float(jnp.max(jnp.abs(a1 - a2))
                     / jnp.max(jnp.abs(a1)))

    # 3. df-segmented adjointness (B0-informed encode)
    df = jnp.asarray(150.0 * np.sin(2 * np.pi * np.mgrid[:N, :N][1]
                                    / N), DT32)
    x3 = jnp.asarray(rng.standard_normal((rank, N, N)), DT32)
    y3 = jnp.asarray(rng.standard_normal((nTR, nRO, 2)), DT32)
    Ax3 = jax.jit(lambda v: mrf.subspace_encode(
        plan, ktrajs, basis, v, df=df, dt=4e-5))(x3)
    AHy3 = jax.jit(lambda v: mrf.subspace_adjoint(
        plan, ktrajs, basis, v, df=df, dt=4e-5))(y3)
    adj_df = abs(float(jnp.sum(Ax3 * y3))
                 - float(jnp.sum(x3 * AHy3))) \
        / max(1e-30, abs(float(jnp.sum(Ax3 * y3))))

    # 4. full SENSE pipeline with object phase
    yy, xx = np.mgrid[:N, :N]
    cen = (N - 1) / 2
    mask = np.hypot(yy - cen, xx - cen) < 0.45 * N
    T1m = np.where(xx < cen, 0.8, 1.5)
    T2m = np.where(yy < cen, 0.06, 0.12)
    iy, ix = np.nonzero(mask)
    T1v = jnp.asarray(T1m[mask], DT32)
    T2v = jnp.asarray(T2m[mask], DT32)
    X = jax.jit(gen)(T1v, T2v)
    phv = jnp.asarray(0.8 * np.sin(2 * np.pi * xx[mask] / N) + 0.3,
                      DT32)
    xr, xi = _cmul(X[..., 0], X[..., 1],
                   jnp.cos(phv)[:, None], jnp.sin(phv)[:, None])
    imgs = jnp.zeros((nTR, N, N, 2), DT32).at[:, iy, ix, :].set(
        jnp.moveaxis(jnp.stack([xr, xi], -1), 0, 1))

    @jax.jit
    def acquire(im):
        def step(_, tx):
            img, k = tx
            outs = []
            for c in range(nC):
                wr, wi = _cmul(img[..., 0], img[..., 1],
                               sens[c, ..., 0], sens[c, ..., 1])
                outs.append(nufft(plan, jnp.stack([wr, wi], -1), k))
            return None, jnp.stack(outs)
        return jnp.moveaxis(
            jax.lax.scan(step, None, (im, ktrajs))[1], 0, 1)

    s = acquire(imgs)
    alpha = jax.jit(lambda sv: mrf.kspace_subspace_recon(
        plan, ktrajs, basis, sv, iters=8, sens=sens))(s)
    alpha.block_until_ready()
    al = jnp.moveaxis(alpha, 0, -2)[iy, ix]
    probes = al[..., 0] + jnp.einsum('lk,vk->vl', basis.jc,
                                     al[..., 1])
    res = mrf.dict_match_compressed(mrf.compress(D, basis), probes,
                                    basis)
    e1 = float(np.median(np.abs(np.asarray(T1a[res.idx] / T1v) - 1)))
    e2 = float(np.median(np.abs(np.asarray(T2a[res.idx] / T2v) - 1)))
    ph_est = np.arctan2(np.asarray(res.m0[..., 1]),
                        np.asarray(res.m0[..., 0]))
    dph = float(np.median(np.abs(np.angle(
        np.exp(1j * (ph_est - np.asarray(phv)))))))
    ok = (adj_rel < 1e-4 and toep_rel < 2e-2 and adj_df < 1e-4
          and e1 < 0.17 and e2 < 0.30 and dph < 0.1)
    _record('mrf_kspace_sense', ok,
            f'SENSE adjointness {adj_rel:.1e}, toeplitz-sandwich vs '
            f'frames {toep_rel:.1e}, df adjointness {adj_df:.1e}; '
            f'{nC}-coil pipeline map errs T1 {e1 * 100:.1f}%, T2 '
            f'{e2 * 100:.1f}%, phase {dph:.3f} rad')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--interpret', action='store_true',
                    help='CPU interpret-mode smoke run (dev only)')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'TPU_CHECKS.json'))
    args = ap.parse_args()

    if args.interpret:
        jax.config.update('jax_platforms', 'cpu')
        # nT_long=2048 still chunks (tc=1024) at half the interpret cost
        nM, nT, nT_long = 1024, 16, 2048
    else:
        from mrphy_tpu.utils.timing import enable_persistent_cache
        enable_persistent_cache()     # ~25 jits; reuse across rounds
        plat = jax.devices()[0].platform
        assert plat.startswith(('tpu', 'axon')), (
            f'tpu_checks must run on the real chip (got {plat}); '
            f'use --interpret for a CPU smoke run')
        # one full Pallas spin tile; nT_long big enough to chunk
        nM, nT, nT_long = 32768, 500, 8192

    for name, cfg in CONFIGS:
        _rfgr_parity(name, cfg, nM=nM, nT=nT, interpret=args.interpret)
    _beff_streaming(nM=nM, nT=nT, interpret=args.interpret)
    _longpulse_chunked(nM=nM, nT=nT_long, interpret=args.interpret)
    _batched(nM=nM, nT=nT, interpret=args.interpret)
    _signal_parity(nM=nM, nT=nT, interpret=args.interpret)
    _sincos_sweep()
    _sincos_cycles_exp_sweep()
    if not args.interpret:
        _mrf_match_parity()
        _mrf_pipeline_check()
        _mrf_kspace_check()
        _mrf_sense_check()
    _nufft_parity()
    _nufft3d_kernel_parity(interpret=args.interpret)
    _epg_kernel_parity(interpret=args.interpret)
    _spgr_adjoint_parity(interpret=args.interpret)
    _spgr_vartr_adjoint_parity(interpret=args.interpret)
    _spgr_diffusion_parity(interpret=args.interpret)
    _cpmg_adjoint_parity(interpret=args.interpret)
    _epgx_adjoint_parity(interpret=args.interpret)
    _varint_adjoint_parity(interpret=args.interpret)
    _cpmg_kernel_parity(interpret=args.interpret)
    _epgx_kernel_parity(interpret=args.interpret)
    _epgx_cpmg_kernel_parity(interpret=args.interpret)
    _epgx_mt_kernel_parity(interpret=args.interpret)
    _bssfp_kernel_parity(interpret=args.interpret)
    _bssfp_adjoint_parity(interpret=args.interpret)
    _mc_kernel_parity(args.interpret, nM=nM, nT=nT)
    _field_stack()
    if not args.interpret:
        _mesh_1x1(nM=nM, nT=nT)
        _auto_gate()          # gate predicates include the on-TPU probe
        _export_artifact(nM=nM, nT=nT)

    n_ok = sum(r['ok'] for r in _RESULTS)
    summary = {
        'suite': 'tpu_checks',
        'mode': 'interpret' if args.interpret else 'compiled',
        'platform': jax.devices()[0].platform,
        'passed': n_ok, 'total': len(_RESULTS),
        'ok': n_ok == len(_RESULTS),
        'checks': _RESULTS,
    }
    with open(args.out, 'w') as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ('suite', 'mode', 'platform', 'passed', 'total',
                       'ok')}))
    sys.exit(0 if summary['ok'] else 1)


if __name__ == '__main__':
    main()
