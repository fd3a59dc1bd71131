r"""Fused Pallas TPU kernel for gradient-spoiled EPG trains (MRF
dictionary generation).

Why a kernel: the XLA ``lax.scan`` of :func:`mrphy_tpu.ops.epg.epg_spgr`
round-trips the full EPG state — ``(nAtoms, 3, K, 2)`` f32, ~75 MB at
MRF dictionary scale — through HBM every TR (read + write ≈ 150 MB/TR,
~60 GB over a 400-TR train; the measured 282 ms at 64k atoms is that
HBM traffic, not the ~77 GFLOP of VPU math). This kernel holds each
atom tile's ENTIRE state in registers/VMEM across the whole train and
streams out only the echo rows, making the workload compute-bound.

Layout: atoms ride the 128 lanes (the embarrassingly parallel axis),
configuration orders ``k`` ride the sublanes — ``epg_grad``'s ±1 shift
is a sublane roll (``pltpu.roll``), the k=0 hemisphere crossing a
1-row select. Per-TR RF mixing coefficients are scalars from SMEM
(shared across the dictionary — flips/phases are the train, not the
atom); per-atom relaxation factors enter as `(1, TA)` lane vectors.

Scope (asserted by the dispatcher): shared 1-D ``flips``/``phis``
trains, 1-D atom batch, no diffusion — exactly the MRF dictionary
workload. Differentiability (round 3): ``epg_spgr``, ``epg_cpmg``,
``epgx_spgr``, ``epgx_cpmg`` and ``epgx_mt_spgr`` carry NATIVE
in-kernel adjoints —
hand-transposed two-phase chunk kernels (phase 1 recomputes each
chunk's pre-RF states from chunk-START checkpoints; phase 2 runs
shift-transpose →
relax-transpose → echo-cotangent injection → RF-mix transpose,
emitting per-TR coefficient grads as lane-partials and per-atom
E1/E2/E2te/rec/M0/b1 rows) — so its gradients run at kernel speed.
Only the bSSFP train keeps the recompute-through-XLA VJP of
``ops/_diffwrap.py`` (its per-atom state is 3 scalars — the XLA
reverse has no memory cliff there); the XLA paths (default backend)
remain fully differentiable everywhere.
Parity with the XLA engine is pinned at f32 tolerances in
``tests/test_epg_pallas.py`` and on-chip by ``benchmarks/tpu_checks.py``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['epg_spgr_pallas', 'epg_cpmg_pallas', 'epgx_spgr_pallas',
           'epgx_cpmg_pallas', 'epgx_mt_spgr_pallas']

_LANE = 128
_VMEM_LIMIT = 100 * 1024 * 1024
_UNROLL = 8      # Mosaic fori_loop can't unroll; do it manually


def _spgr_factors_t(vartr, coef_ref, t, p1, p2, p3, p4):
    r"""Per-TR relaxation factors ``(E1, E2, E2te, rec)``. Constant
    TR/TE: the precomputed per-atom plane rows pass through. Variable
    TR/TE trains (round 4 — the canonical MRF-FISP schedule): the
    plane slots hold ``(R1, R2, M0, ·)`` and the factors come from the
    SMEM tr/te rows (coef rows 9/10) at 3 transcendentals per atom·TR;
    the recovery uses expm1 (``1 − exp(−tr·R1)`` cancels at ms TRs —
    the package-wide trap, see ssfp_pallas)."""
    if not vartr:
        return p1, p2, p3, p4
    from mrphy_tpu.ops.ssfp_pallas import _nexpm1
    trn, ten = coef_ref[9, t], coef_ref[10, t]
    a1 = -_nexpm1(trn * p1)
    return 1 - a1, jnp.exp(-trn * p2), jnp.exp(-ten * p2), p3 * a1


def _spgr_diff_c(K: int, kshift: int, TA: int, dtype):
    r"""Static per-order b-factor coefficient planes: ``cT±(k) =
    k^2 ± k*delta + delta^2/3`` (F- carries -k) and ``cL(k) = k^2`` —
    exactly :func:`mrphy_tpu.ops.epg.epg_diffusion` with
    ``delta = kshift``. The iota must be INTEGER (Mosaic's
    ``tpu.iota`` rejects float results — an interpret-mode-invisible
    constraint) and is cast after."""
    k = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0).astype(dtype)
    d = float(kshift)
    return (k * k + k * d + d * d / 3, k * k - k * d + d * d / 3,
            k * k)


def _spgr_diff_att(K: int, kshift: int, dq, dtype):
    r"""Per-order diffusion attenuations (and their b-factor
    coefficient planes, for the adjoint's dD chain) from the prescaled
    per-atom row ``dq = D*dk^2*tr``: ``A = exp(-dq*c(k))``. Computed
    ONCE per atom tile (constant-TR mode): 3 (K, TA) exps outside the
    time loop."""
    TA = dq.shape[1]
    cTp, cTm, cL = _spgr_diff_c(K, kshift, TA, dtype)
    return (jnp.exp(-dq * cTp), jnp.exp(-dq * cTm), jnp.exp(-dq * cL),
            cTp, cTm, cL)


def _spgr_att_t(has_d: bool, vartr: bool, K: int, kshift: int,
                dq_ref, coef_ref, dtype):
    r"""Per-step attenuation closure: constant-TR mode returns the
    tile-constant planes; variable-TR mode (round 4) recomputes them
    per step from the per-atom RATE row ``dq = D*dk^2`` and the SMEM
    tr train (3 (K, TA) exps/step — the price of a per-TR crusher
    b-value schedule). Returns ``(att(t), cplanes)``."""
    if not has_d:
        return (lambda t: None), None
    TA = dq_ref.shape[1]
    cpl = _spgr_diff_c(K, kshift, TA, dtype)
    if not vartr:
        att = _spgr_diff_att(K, kshift, dq_ref[...], dtype)[:3]
        return (lambda t: att), cpl
    dq = dq_ref[...]

    def att(t):
        dqt = dq * coef_ref[9, t]
        return tuple(jnp.exp(-dqt * c) for c in cpl)

    return att, cpl


def _spgr_kernel(K: int, nTR: int, kshift: int, has_b1: bool,
                 vartr: bool, has_d: bool, coef_ref, e1_ref, e2_ref,
                 e2te_ref, rec_ref, m0_ref, b1_ref, dq_ref, outr_ref,
                 outi_ref):
    r"""One atom tile: scan the whole train with the `(K, TA)` state
    planes as loop carry (registers/VMEM — never HBM). With ``has_b1``
    the flip is scaled per atom (the MRF B1 dictionary dimension): the
    four flip trig factors become `(1, TA)` rows computed in-kernel
    from half-angle identities (2 transcendentals/TR). With ``vartr``
    the relaxation factors are per-TR (:func:`_spgr_factors_t`)."""
    TA = e1_ref.shape[1]
    E1, E2 = e1_ref[...], e2_ref[...]            # (1, TA)
    E2te, rec = e2te_ref[...], rec_ref[...]
    b1 = b1_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    is0, islast = row == 0, row == K - 1
    zero = jnp.zeros((K, TA), E1.dtype)
    att_f, _ = _spgr_att_t(has_d, vartr, K, kshift, dq_ref, coef_ref,
                           E1.dtype)

    def step(t, s):
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = s
        if has_b1:
            ah = (0.5 * coef_ref[8, t]) * b1      # (1, TA) α/2
            ch, sh = jnp.cos(ah), jnp.sin(ah)
            ca2, sa2 = ch * ch, sh * sh
            sa, ca = 2 * ch * sh, ca2 - sa2
        else:
            ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
            sa, ca = coef_ref[2, t], coef_ref[3, t]
        c1, s1 = coef_ref[4, t], coef_ref[5, t]
        c2, s2 = coef_ref[6, t], coef_ref[7, t]
        E1t, E2t, E2tet, rect = _spgr_factors_t(vartr, coef_ref, t,
                                                E1, E2, E2te, rec)

        # RF mixing (epg_rf rows, real-pair arithmetic)
        sc2, ss2 = sa2 * c2, sa2 * s2
        ss, sc = sa * s1, sa * c1
        Fp1r = ca2 * Fpr + (sc2 * Fmr - ss2 * Fmi) + (ss * Zr + sc * Zi)
        Fp1i = ca2 * Fpi + (sc2 * Fmi + ss2 * Fmr) + (ss * Zi - sc * Zr)
        Fm1r = (sc2 * Fpr + ss2 * Fpi) + ca2 * Fmr + (ss * Zr - sc * Zi)
        Fm1i = (sc2 * Fpi - ss2 * Fpr) + ca2 * Fmi + (ss * Zi + sc * Zr)
        hs, hc = 0.5 * ss, 0.5 * sc
        Z1r = (-hs * Fpr + hc * Fpi) + (-hs * Fmr - hc * Fmi) + ca * Zr
        Z1i = (-hs * Fpi - hc * Fpr) + (-hs * Fmi + hc * Fmr) + ca * Zi

        # echo at TE: F+(0) demodulated by the transmit phase
        fp0r, fp0i = Fp1r[0:1, :], Fp1i[0:1, :]
        outr_ref[pl.ds(t, 1), :] = E2tet * (c1 * fp0r + s1 * fp0i)
        outi_ref[pl.ds(t, 1), :] = E2tet * (c1 * fp0i - s1 * fp0r)

        # relaxation over TR (+ recovery into Z(0) re)
        Fp1r, Fp1i = E2t * Fp1r, E2t * Fp1i
        Fm1r, Fm1i = E2t * Fm1r, E2t * Fm1i
        Z1r = jnp.where(is0, E1t * Z1r + rect, E1t * Z1r)
        Z1i = E1t * Z1i

        # spoiler diffusion (before the shift, like epg_diffusion)
        if has_d:
            ATp, ATm, AL = att_f(t)
            Fp1r, Fp1i = ATp * Fp1r, ATp * Fp1i
            Fm1r, Fm1i = ATm * Fm1r, ATm * Fm1i
            Z1r, Z1i = AL * Z1r, AL * Z1i

        # spoiler: shift |kshift| unit k-quanta
        for _ in range(abs(kshift)):
            if kshift > 0:
                Fp1r = pltpu.roll(Fp1r, 1, axis=0)
                Fp1i = pltpu.roll(Fp1i, 1, axis=0)
                Fm1r = jnp.where(islast, zero,
                                 pltpu.roll(Fm1r, K - 1, axis=0))
                Fm1i = jnp.where(islast, zero,
                                 pltpu.roll(Fm1i, K - 1, axis=0))
                Fp1r = jnp.where(is0, Fm1r[0:1, :], Fp1r)
                Fp1i = jnp.where(is0, -Fm1i[0:1, :], Fp1i)
            else:
                Fm1r = pltpu.roll(Fm1r, 1, axis=0)
                Fm1i = pltpu.roll(Fm1i, 1, axis=0)
                Fp1r = jnp.where(islast, zero,
                                 pltpu.roll(Fp1r, K - 1, axis=0))
                Fp1i = jnp.where(islast, zero,
                                 pltpu.roll(Fp1i, K - 1, axis=0))
                Fm1r = jnp.where(is0, Fp1r[0:1, :], Fm1r)
                Fm1i = jnp.where(is0, -Fp1i[0:1, :], Fm1i)
        return (Fp1r, Fp1i, Fm1r, Fm1i, Z1r, Z1i)

    u = math.gcd(nTR, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    init = (zero, zero, zero, zero,
            jnp.where(is0, m0_ref[...], zero), zero)
    jax.lax.fori_loop(0, nTR // u, body, init)


@functools.partial(jax.jit, static_argnames=('K', 'kshift', 'tile',
                                             'interpret', 'has_b1',
                                             'vartr', 'has_d'))
def _spgr_dispatch(flips, phis, T1, T2, tr, te, M0, zinit, b1, D, dk,
                   *, K: int, kshift: int, tile: int, interpret: bool,
                   has_b1: bool, vartr: bool, has_d: bool):
    nTR = flips.shape[0]
    nA = T1.shape[0]
    f32 = jnp.float32
    flips, phis = flips.astype(f32), phis.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      jnp.cos(phis), jnp.sin(phis),
                      jnp.cos(2 * phis), jnp.sin(2 * phis),
                      flips])                                 # (9, nTR)
    M0a = jnp.broadcast_to(jnp.asarray(M0, f32), (1, nA))
    if vartr:
        # per-TR factors are computed in-kernel from rates + the SMEM
        # tr/te rows; the (E1, E2, E2te, rec) plane slots carry
        # (R1, R2, M0, 0) — their adjoint rows chain back to T1/T2/M0
        # through this construction by autodiff
        trs = jnp.broadcast_to(jnp.asarray(tr, f32), (nTR,))
        tes = jnp.broadcast_to(jnp.asarray(te, f32), (nTR,))
        coef = jnp.concatenate([coef, trs[None], tes[None]])  # (11,·)
        E1 = (1 / T1).astype(f32)[None]                       # R1
        E2 = (1 / T2).astype(f32)[None]                       # R2
        E2te = M0a                                            # M0
        rec = jnp.zeros_like(M0a)
    else:
        E1 = jnp.exp(-tr / T1).astype(f32)[None]              # (1, nA)
        E2 = jnp.exp(-tr / T2).astype(f32)[None]
        E2te = jnp.exp(-te / T2).astype(f32)[None]
        rec = -jnp.expm1(-tr / T1).astype(f32)[None] * M0a
    z0 = M0a if zinit is None else jnp.broadcast_to(
        jnp.asarray(zinit, f32), (1, nA))
    b1 = jnp.broadcast_to(jnp.asarray(b1, f32), (1, nA))
    if has_d:
        # prescaled per-atom diffusion row: A(k) = exp(-dq*c(k)) with
        # c(k) static (iota in-kernel); dD/ddk (and dtr in constant
        # mode) chain through this product by autodiff. Variable-TR
        # mode (round 4): the row carries the RATE D*dk^2 and the
        # kernel forms dq_t = rate*tr_t per step from the SMEM tr
        # train (its adjoint emits the per-TR diffusion tr row).
        dq = jnp.asarray(D, f32) * jnp.asarray(dk, f32) ** 2
        if not vartr:
            dq = dq * jnp.asarray(tr, f32)
        dq = jnp.broadcast_to(dq, (1, nA)).astype(f32)
    else:
        dq = jnp.zeros((1, nA), f32)

    del nA
    # the differentiable core: fast unchunked kernel as the primal,
    # the hand-transposed fused adjoint under jax.grad (atom padding
    # happens per-path inside)
    outr, outi = _spgr_core(K, kshift, interpret, has_b1, vartr,
                            has_d, coef, E1, E2, E2te, rec, z0, b1,
                            dq, None)
    return jnp.stack([outr, outi], -1)              # (nTR, nA, 2)


def _cpmg_factors_t(varesp, coef_ref, t, p1, p2, p3):
    r"""Per-echo half-interval factors ``(E1h, E2h, rech)``. Constant
    spacing: the precomputed per-atom rows pass through. Variable
    `(nEcho,)` spacing trains (round 5): the plane slots hold
    ``(R1, R2, M0)`` and the factors come from the SMEM esp row
    (coef row 5) at 2 transcendentals per atom·echo (expm1 recovery —
    the package-wide cancellation trap)."""
    if not varesp:
        return p1, p2, p3
    from mrphy_tpu.ops.ssfp_pallas import _nexpm1
    hn = 0.5 * coef_ref[5, t]
    a1 = -_nexpm1(hn * p1)
    return 1 - a1, jnp.exp(-hn * p2), p3 * a1


def _cpmg_att_t(has_d: bool, varesp: bool, K: int, dq_ref, coef_ref,
                dtype):
    r"""Per-half-interval diffusion attenuation closure (CPMG shifts
    one unit k-quantum per half, so ``delta = 1``): constant spacing
    returns tile-constant planes from the prescaled row ``dq =
    D·dk²·esp/2``; variable spacing recomputes per echo from the RATE
    row ``D·dk²`` and the SMEM esp row. Returns ``(att(t),
    cplanes)``."""
    if not has_d:
        return (lambda t: None), None
    TA = dq_ref.shape[1]
    cpl = _spgr_diff_c(K, 1, TA, dtype)
    if not varesp:
        att = tuple(jnp.exp(-dq_ref[...] * c) for c in cpl)
        return (lambda t: att), cpl
    dq = dq_ref[...]

    def att(t):
        dqt = dq * (0.5 * coef_ref[5, t])
        return tuple(jnp.exp(-dqt * c) for c in cpl)

    return att, cpl


def _cpmg_kernel(K: int, nE: int, has_b1: bool, varesp: bool,
                 has_d: bool, coef_ref, pk_ref, dq_ref, outr_ref,
                 outi_ref):
    r"""CPMG tile: the excitation collapses to a closed-form initial
    state (the pre-pulse state is pure ``Z(0)``), so the kernel runs
    only the echo loop — per echo: relax(esp/2)(+diffusion)+shift,
    refocusing RF about +x (the φ=0 mixing matrix loses its phase
    terms), relax(+diffusion)+shift, read ``F+(0)``. ``K = nE + 1``
    exactly. With ``varesp`` the half-interval factors are per-echo
    (:func:`_cpmg_factors_t`); with ``has_d`` spoiler diffusion
    attenuates per half (:func:`_cpmg_att_t`)."""
    TA = pk_ref.shape[1]
    p1, p2 = pk_ref[0:1, :], pk_ref[1:2, :]
    p3 = pk_ref[2:3, :]
    b1 = pk_ref[6:7, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    att_f, _ = _cpmg_att_t(has_d, varesp, K, dq_ref, coef_ref,
                           outr_ref.dtype)

    def step(t, s):
        E1h, E2h, rech = _cpmg_factors_t(varesp, coef_ref, t,
                                         p1, p2, p3)
        at = att_f(t)
        s = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        s = _spgr_mix(_cpmg_trig(coef_ref, t, b1, has_b1), s)
        s = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :]
        return s

    u = math.gcd(nE, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    # closed-form post-excitation state (equilibrium was pure Z(0)):
    # F± = sinα·(sinφ ∓ i·cosφ)·M0, Z = cosα·M0
    jax.lax.fori_loop(0, nE // u, body, _cpmg_init(masks, pk_ref))


@functools.partial(jax.jit, static_argnames=('tile', 'interpret',
                                             'has_b1', 'varesp',
                                             'has_d'))
def _cpmg_dispatch(flips, T1, T2, esp, M0, phi_ex, alpha_ex, b1, D,
                   dk, *, tile: int, interpret: bool, has_b1: bool,
                   varesp: bool, has_d: bool):
    nE = flips.shape[0]
    K = nE + 1
    nA = T1.shape[0]
    f32 = jnp.float32
    flips = flips.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      flips])                                 # (5, nE)
    M0a = jnp.broadcast_to(jnp.asarray(M0, f32), (nA,))
    if varesp:
        # per-echo factors come from rates + the SMEM esp row (coef
        # row 5); the (E1h, E2h, rech) slots carry (R1, R2, M0) —
        # their adjoint rows chain back to T1/T2/M0 by autodiff
        esps = jnp.broadcast_to(jnp.asarray(esp, f32), (nE,))
        coef = jnp.concatenate([coef, esps[None]])            # (6, ·)
        E1h = (1 / T1).astype(f32)[None]                      # R1
        E2h = (1 / T2).astype(f32)[None]                      # R2
        rech = M0a[None]                                      # M0
    else:
        E1h = jnp.exp(-esp / 2 / T1).astype(f32)[None]        # (1, nA)
        E2h = jnp.exp(-esp / 2 / T2).astype(f32)[None]
        rech = -jnp.expm1(-esp / 2 / T1).astype(f32)[None] * M0a[None]
    al = jnp.broadcast_to(jnp.asarray(alpha_ex, f32), (nA,))
    ph = jnp.broadcast_to(jnp.asarray(phi_ex, f32), (nA,))
    pk = jnp.stack([E1h[0], E2h[0], rech[0],
                    jnp.sin(al) * jnp.sin(ph) * M0a,
                    jnp.sin(al) * jnp.cos(ph) * M0a,
                    jnp.cos(al) * M0a,
                    jnp.broadcast_to(jnp.asarray(b1, f32),
                                     (nA,))]).astype(f32)
    if has_d:
        # prescaled per-atom diffusion row (delta = 1 per half-shift):
        # constant spacing carries D*dk^2*esp/2; variable spacing the
        # RATE D*dk^2 (the kernel forms dq_t = rate*esp_t/2 per echo)
        dq = jnp.asarray(D, f32) * jnp.asarray(dk, f32) ** 2
        if not varesp:
            dq = dq * (jnp.asarray(esp, f32) / 2)
        dq = jnp.broadcast_to(dq, (1, nA)).astype(f32)
    else:
        dq = jnp.zeros((1, nA), f32)

    del nA
    # differentiable core: fast unchunked primal; the hand-transposed
    # fused adjoint under jax.grad (atom padding happens per-path)
    outr, outi = _cpmg_core(K, interpret, has_b1, varesp, has_d,
                            coef, pk, dq)
    return jnp.stack([outr, outi], -1)               # (nE, nA, 2)


def epg_cpmg_pallas(flips, *, T1, T2, esp, M0=1.0, phi_ex=None,
                    alpha_ex=None, b1=None, D=None, dk=0.0,
                    tile: int = 512, interpret=None):
    r"""Fused-TPU CPMG echo train — voxel-wise T2 mapping / echo-train
    dictionaries at volume scale.

    Same semantics as :func:`mrphy_tpu.ops.epg.epg_cpmg` restricted to
    the mapping workload: 1-D shared refocusing ``flips`` `(nEcho,)`
    (``b1`` `(nVox,)` scales it per voxel), 1-D voxel batch
    ``T1``/``T2``/``M0``/``alpha_ex``/``phi_ex`` (scalars broadcast —
    per-voxel excitation supports slice-profile-resolved trains).
    ``esp`` scalar or `(nEcho,)` per-echo spacing train (round 5:
    factors computed in-kernel from the rate rows + the SMEM esp
    row). ``D``/``dk`` `(nVox,)`/scalar (round 5): per-half-interval
    spoiler-diffusion attenuation IN-KERNEL (``delta = 1`` per unit
    shift; exactly :func:`mrphy_tpu.ops.epg.epg_diffusion` at
    ``esp/2``), with the dD chain (and, variable-spacing, the
    per-echo diffusion esp row) carried by the adjoint —
    diffusion-weighted echo-train (T2, D) fitting at volume scale.
    Returns `(nVox, nEcho, 2)`. Differentiable: ``jax.grad``
    runs the in-kernel hand-transposed adjoint (``_cpmg_bwd_kernel``).
    """
    from mrphy_tpu import pi as _pi
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nE,) train'
    phi_ex = _pi / 2 if phi_ex is None else phi_ex
    alpha_ex = _pi / 2 if alpha_ex is None else alpha_ex
    pars = [jnp.atleast_1d(jnp.asarray(x, jnp.float32)) for x in
            (T1, T2, M0, alpha_ex, phi_ex,
             1.0 if b1 is None else b1,
             0.0 if D is None else D)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    esp_a = jnp.asarray(esp, jnp.float32)
    if esp_a.ndim == 1:
        assert esp_a.shape == (flips.shape[0],), esp_a.shape
    sig = _cpmg_dispatch(flips, pars[0], pars[1], esp_a, pars[2],
                         pars[4], pars[3], pars[5], pars[6],
                         jnp.asarray(dk, jnp.float32), tile=tile,
                         interpret=interpret, has_b1=b1 is not None,
                         varesp=esp_a.ndim == 1, has_d=D is not None)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nE, 2)


def _epgx_kernel(K: int, nTR: int, kshift: int, has_b1: bool,
                 coef_ref, pk_ref, outr_ref, outi_ref):
    r"""Two-pool (EPG-X full-BM) tile: 12 `(K, TA)` state planes as loop
    carry; the exchange-relaxation propagator entries (complex 2×2
    transverse, real 2×2 + affine recovery longitudinal) are per-atom
    lane vectors precomputed by the dispatcher with the SAME jax
    closed-form expm helpers the XLA path uses."""
    TA = pk_ref.shape[1]
    E00r, E00i = pk_ref[0:1, :], pk_ref[1:2, :]
    E01r, E01i = pk_ref[2:3, :], pk_ref[3:4, :]
    E10r, E10i = pk_ref[4:5, :], pk_ref[5:6, :]
    E11r, E11i = pk_ref[6:7, :], pk_ref[7:8, :]
    Z00, Z01 = pk_ref[8:9, :], pk_ref[9:10, :]
    Z10, Z11 = pk_ref[10:11, :], pk_ref[11:12, :]
    ra, rb = pk_ref[12:13, :], pk_ref[13:14, :]
    M0a, M0b = pk_ref[14:15, :], pk_ref[15:16, :]
    b1 = pk_ref[16:17, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    is0, islast = row == 0, row == K - 1
    zero = jnp.zeros((K, TA), outr_ref.dtype)

    def shift(Fpr, Fpi, Fmr, Fmi):
        for _ in range(abs(kshift)):
            if kshift > 0:
                Fpr = pltpu.roll(Fpr, 1, axis=0)
                Fpi = pltpu.roll(Fpi, 1, axis=0)
                Fmr = jnp.where(islast, zero,
                                pltpu.roll(Fmr, K - 1, axis=0))
                Fmi = jnp.where(islast, zero,
                                pltpu.roll(Fmi, K - 1, axis=0))
                Fpr = jnp.where(is0, Fmr[0:1, :], Fpr)
                Fpi = jnp.where(is0, -Fmi[0:1, :], Fpi)
            else:
                Fmr = pltpu.roll(Fmr, 1, axis=0)
                Fmi = pltpu.roll(Fmi, 1, axis=0)
                Fpr = jnp.where(islast, zero,
                                pltpu.roll(Fpr, K - 1, axis=0))
                Fpi = jnp.where(islast, zero,
                                pltpu.roll(Fpi, K - 1, axis=0))
                Fmr = jnp.where(is0, Fpr[0:1, :], Fmr)
                Fmi = jnp.where(is0, -Fpi[0:1, :], Fmi)
        return Fpr, Fpi, Fmr, Fmi

    def step(t, s):
        (Par, Pai, Mar, Mai, Zar, Zai,
         Pbr, Pbi, Mbr, Mbi, Zbr, Zbi) = s
        if has_b1:
            ah = (0.5 * coef_ref[8, t]) * b1      # (1, TA) α/2
            ch, sh = jnp.cos(ah), jnp.sin(ah)
            ca2, sa2 = ch * ch, sh * sh
            sa, ca = 2 * ch * sh, ca2 - sa2
        else:
            ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
            sa, ca = coef_ref[2, t], coef_ref[3, t]
        c1, s1 = coef_ref[4, t], coef_ref[5, t]
        c2, s2 = coef_ref[6, t], coef_ref[7, t]
        sc2, ss2 = sa2 * c2, sa2 * s2
        ss, sc = sa * s1, sa * c1
        hs, hc = 0.5 * ss, 0.5 * sc

        def rfmix(Fpr, Fpi, Fmr, Fmi, Zr, Zi):
            p1r = (ca2 * Fpr + (sc2 * Fmr - ss2 * Fmi)
                   + (ss * Zr + sc * Zi))
            p1i = (ca2 * Fpi + (sc2 * Fmi + ss2 * Fmr)
                   + (ss * Zi - sc * Zr))
            m1r = ((sc2 * Fpr + ss2 * Fpi) + ca2 * Fmr
                   + (ss * Zr - sc * Zi))
            m1i = ((sc2 * Fpi - ss2 * Fpr) + ca2 * Fmi
                   + (ss * Zi + sc * Zr))
            z1r = ((-hs * Fpr + hc * Fpi) + (-hs * Fmr - hc * Fmi)
                   + ca * Zr)
            z1i = ((-hs * Fpi - hc * Fpr) + (-hs * Fmi + hc * Fmr)
                   + ca * Zi)
            return p1r, p1i, m1r, m1i, z1r, z1i

        Par, Pai, Mar, Mai, Zar, Zai = rfmix(Par, Pai, Mar, Mai,
                                             Zar, Zai)
        Pbr, Pbi, Mbr, Mbi, Zbr, Zbi = rfmix(Pbr, Pbi, Mbr, Mbi,
                                             Zbr, Zbi)

        # demodulated TOTAL F+(0) over the pools
        fr = Par[0:1, :] + Pbr[0:1, :]
        fi = Pai[0:1, :] + Pbi[0:1, :]
        outr_ref[pl.ds(t, 1), :] = c1 * fr + s1 * fi
        outi_ref[pl.ds(t, 1), :] = c1 * fi - s1 * fr

        # exchange-relaxation: complex 2x2 on F+ (conjugate on F-),
        # real 2x2 + affine recovery on Z
        P2ar = (E00r * Par - E00i * Pai) + (E01r * Pbr - E01i * Pbi)
        P2ai = (E00r * Pai + E00i * Par) + (E01r * Pbi + E01i * Pbr)
        P2br = (E10r * Par - E10i * Pai) + (E11r * Pbr - E11i * Pbi)
        P2bi = (E10r * Pai + E10i * Par) + (E11r * Pbi + E11i * Pbr)
        M2ar = (E00r * Mar + E00i * Mai) + (E01r * Mbr + E01i * Mbi)
        M2ai = (E00r * Mai - E00i * Mar) + (E01r * Mbi - E01i * Mbr)
        M2br = (E10r * Mar + E10i * Mai) + (E11r * Mbr + E11i * Mbi)
        M2bi = (E10r * Mai - E10i * Mar) + (E11r * Mbi - E11i * Mbr)
        Z2ar = Z00 * Zar + Z01 * Zbr
        Z2ai = Z00 * Zai + Z01 * Zbi
        Z2br = Z10 * Zar + Z11 * Zbr
        Z2bi = Z10 * Zai + Z11 * Zbi
        Z2ar = jnp.where(is0, Z2ar + ra, Z2ar)
        Z2br = jnp.where(is0, Z2br + rb, Z2br)

        P2ar, P2ai, M2ar, M2ai = shift(P2ar, P2ai, M2ar, M2ai)
        P2br, P2bi, M2br, M2bi = shift(P2br, P2bi, M2br, M2bi)
        return (P2ar, P2ai, M2ar, M2ai, Z2ar, Z2ai,
                P2br, P2bi, M2br, M2bi, Z2br, Z2bi)

    u = math.gcd(nTR, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    init = (zero, zero, zero, zero, jnp.where(is0, M0a, zero), zero,
            zero, zero, zero, zero, jnp.where(is0, M0b, zero), zero)
    jax.lax.fori_loop(0, nTR // u, body, init)


@functools.partial(jax.jit, static_argnames=('K', 'kshift', 'tile',
                                             'interpret', 'has_b1'))
def _epgx_dispatch(flips, phis, T1a, T2a, T1b, T2b, kab, kba, tr,
                   M0a, M0b, dfb, b1, *, K: int, kshift: int,
                   tile: int, interpret: bool, has_b1: bool):
    from mrphy_tpu import pi
    from mrphy_tpu.ops.epg import _expm2c, _z_recovery
    from mrphy_tpu.ops.slowsims import _expm2

    nTR = flips.shape[0]
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips, phis = flips.astype(f32), phis.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      jnp.cos(phis), jnp.sin(phis),
                      jnp.cos(2 * phis), jnp.sin(2 * phis),
                      flips])                                 # (9, nTR)

    # propagator entries via the SAME closed forms as the XLA path
    w = 2 * pi * dfb
    E00, E01, E10, E11 = _expm2c(
        (-1 / T2a - kab) * tr, jnp.zeros_like(T2a),
        kba * tr, kab * tr, (-1 / T2b - kba) * tr, -w * tr)
    Z00, Z01, Z10, Z11 = _expm2((-1 / T1a - kab) * tr, kba * tr,
                                kab * tr, (-1 / T1b - kba) * tr)
    ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                         M0a, M0b)
    pk = jnp.stack([E00[0], E00[1], E01[0], E01[1], E10[0], E10[1],
                    E11[0], E11[1], Z00, Z01, Z10, Z11, ra, rb,
                    jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32),
                                     (nA,))]).astype(f32)

    del nA
    # differentiable core: fast unchunked primal; the hand-transposed
    # fused adjoint under jax.grad (atom padding happens per-path)
    outr, outi = _xspgr_core(K, kshift, interpret, has_b1, coef, pk)
    return jnp.stack([outr, outi], -1)              # (nTR, nA, 2)


def epgx_spgr_pallas(flips, phis=None, *, T1a, T2a, T1b, T2b, kab,
                     kba, tr, M0a=1.0, M0b=0.1, dfb=0.0, b1=None,
                     kshift: int = 1, K=None, tile: int = 512,
                     interpret=None):
    r"""Fused-TPU two-pool (EPG-X full-BM) gradient-spoiled train —
    exchange-sensitive MRF / MWF dictionaries.

    Same semantics as :func:`mrphy_tpu.ops.epg.epgx_spgr` restricted to
    the dictionary workload: 1-D shared trains, 1-D atom batch for the
    tissue/exchange parameters (scalars broadcast); ``tr`` scalar OR a
    `(nTR,)` variable train (round 5 — the canonical exchange-MRF
    schedule: per-step exact 2x2 expm propagator planes streamed into
    the kernel, grads in every rate AND the tr train);
    ``b1`` `(nAtoms,)` scales the flip train per atom (both pools — the
    dictionary's B1+ dimension). Returns `(nAtoms, nTR, 2)`.
    Differentiable: ``jax.grad`` runs the in-kernel hand-transposed
    two-pool adjoint (``_xspgr_bwd_kernel`` / ``_xv_bwd_kernel``).
    """
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nTR,) train'
    nTR = flips.shape[0]
    phis = jnp.zeros(nTR) if phis is None else jnp.asarray(phis)
    assert phis.shape == flips.shape, (phis.shape, flips.shape)
    pars = [jnp.atleast_1d(jnp.asarray(x, jnp.float32)) for x in
            (T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb,
             1.0 if b1 is None else b1)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert int(kshift) != 0, 'kshift must be a nonzero integer'
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    tr_a = jnp.asarray(tr, jnp.float32)
    if tr_a.ndim == 1:                 # variable-TR train (round 5)
        assert tr_a.shape == (nTR,), (tr_a.shape, nTR)
        sig = _epgx_v_dispatch(flips, phis, *pars[:6], tr_a,
                               *pars[6:], K=K, kshift=int(kshift),
                               interpret=interpret,
                               has_b1=b1 is not None)
    else:
        sig = _epgx_dispatch(flips, phis, *pars[:6], tr_a, *pars[6:],
                             K=K, kshift=int(kshift), tile=tile,
                             interpret=interpret,
                             has_b1=b1 is not None)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nTR, 2)


def _xcpmg_kernel(K: int, nE: int, has_b1: bool, coef_ref, pk_ref,
                  outr_ref, outi_ref):
    r"""Two-pool CPMG tile (EPG-X full-BM — myelin-water echo trains):
    per echo two exact exchange-relax halves (propagator entries at
    esp/2 as per-atom lane vectors) + shifts on both pools, a φ=0
    refocusing mix on both pools, echo = total ``F+(0)``. The π/2
    excitation on equilibrium is a closed-form init per pool."""
    TA = pk_ref.shape[1]
    E00r, E00i = pk_ref[0:1, :], pk_ref[1:2, :]
    E01r, E01i = pk_ref[2:3, :], pk_ref[3:4, :]
    E10r, E10i = pk_ref[4:5, :], pk_ref[5:6, :]
    E11r, E11i = pk_ref[6:7, :], pk_ref[7:8, :]
    Z00, Z01 = pk_ref[8:9, :], pk_ref[9:10, :]
    Z10, Z11 = pk_ref[10:11, :], pk_ref[11:12, :]
    ra, rb = pk_ref[12:13, :], pk_ref[13:14, :]
    exc, exs = pk_ref[14:15, :], pk_ref[15:16, :]   # cosφ_ex, sinφ_ex
    M0a, M0b = pk_ref[16:17, :], pk_ref[17:18, :]
    b1 = pk_ref[18:19, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    is0, islast = row == 0, row == K - 1
    zero = jnp.zeros((K, TA), outr_ref.dtype)

    def shift1(Fpr, Fpi, Fmr, Fmi):
        Fpr = pltpu.roll(Fpr, 1, axis=0)
        Fpi = pltpu.roll(Fpi, 1, axis=0)
        Fmr = jnp.where(islast, zero, pltpu.roll(Fmr, K - 1, axis=0))
        Fmi = jnp.where(islast, zero, pltpu.roll(Fmi, K - 1, axis=0))
        Fpr = jnp.where(is0, Fmr[0:1, :], Fpr)
        Fpi = jnp.where(is0, -Fmi[0:1, :], Fpi)
        return Fpr, Fpi, Fmr, Fmi

    def half(s):
        (Par, Pai, Mar, Mai, Zar, Zai,
         Pbr, Pbi, Mbr, Mbi, Zbr, Zbi) = s
        P2ar = (E00r * Par - E00i * Pai) + (E01r * Pbr - E01i * Pbi)
        P2ai = (E00r * Pai + E00i * Par) + (E01r * Pbi + E01i * Pbr)
        P2br = (E10r * Par - E10i * Pai) + (E11r * Pbr - E11i * Pbi)
        P2bi = (E10r * Pai + E10i * Par) + (E11r * Pbi + E11i * Pbr)
        M2ar = (E00r * Mar + E00i * Mai) + (E01r * Mbr + E01i * Mbi)
        M2ai = (E00r * Mai - E00i * Mar) + (E01r * Mbi - E01i * Mbr)
        M2br = (E10r * Mar + E10i * Mai) + (E11r * Mbr + E11i * Mbi)
        M2bi = (E10r * Mai - E10i * Mar) + (E11r * Mbi - E11i * Mbr)
        Z2ar = Z00 * Zar + Z01 * Zbr
        Z2ai = Z00 * Zai + Z01 * Zbi
        Z2br = Z10 * Zar + Z11 * Zbr
        Z2bi = Z10 * Zai + Z11 * Zbi
        Z2ar = jnp.where(is0, Z2ar + ra, Z2ar)
        Z2br = jnp.where(is0, Z2br + rb, Z2br)
        P2ar, P2ai, M2ar, M2ai = shift1(P2ar, P2ai, M2ar, M2ai)
        P2br, P2bi, M2br, M2bi = shift1(P2br, P2bi, M2br, M2bi)
        return (P2ar, P2ai, M2ar, M2ai, Z2ar, Z2ai,
                P2br, P2bi, M2br, M2bi, Z2br, Z2bi)

    def step(t, s):
        s = half(s)
        (Par, Pai, Mar, Mai, Zar, Zai,
         Pbr, Pbi, Mbr, Mbi, Zbr, Zbi) = s
        if has_b1:
            ah = (0.5 * coef_ref[4, t]) * b1
            ch, sh = jnp.cos(ah), jnp.sin(ah)
            ca2, sa2 = ch * ch, sh * sh
            sa, ca = 2 * ch * sh, ca2 - sa2
        else:
            ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
            sa, ca = coef_ref[2, t], coef_ref[3, t]
        hsa = 0.5 * sa

        def rfmix0(Fpr, Fpi, Fmr, Fmi, Zr, Zi):
            p1r = ca2 * Fpr + sa2 * Fmr + sa * Zi
            p1i = ca2 * Fpi + sa2 * Fmi - sa * Zr
            m1r = sa2 * Fpr + ca2 * Fmr - sa * Zi
            m1i = sa2 * Fpi + ca2 * Fmi + sa * Zr
            z1r = hsa * (Fpi - Fmi) + ca * Zr
            z1i = hsa * (Fmr - Fpr) + ca * Zi
            return p1r, p1i, m1r, m1i, z1r, z1i

        Par, Pai, Mar, Mai, Zar, Zai = rfmix0(Par, Pai, Mar, Mai,
                                              Zar, Zai)
        Pbr, Pbi, Mbr, Mbi, Zbr, Zbi = rfmix0(Pbr, Pbi, Mbr, Mbi,
                                              Zbr, Zbi)
        s = half((Par, Pai, Mar, Mai, Zar, Zai,
                  Pbr, Pbi, Mbr, Mbi, Zbr, Zbi))
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :] + s[6][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :] + s[7][0:1, :]
        return s

    u = math.gcd(nE, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    # π/2 excitation about φ_ex on equilibrium [Za(0)=M0a, Zb(0)=M0b]:
    # F± = (sinφ ∓ i·cosφ)·M0p, Z = 0 (per pool)
    init = (jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, -exc * M0a, zero),
            jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, exc * M0a, zero), zero, zero,
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, -exc * M0b, zero),
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, exc * M0b, zero), zero, zero)
    jax.lax.fori_loop(0, nE // u, body, init)


@functools.partial(jax.jit, static_argnames=('tile', 'interpret',
                                             'has_b1'))
def _xcpmg_dispatch(flips, T1a, T2a, T1b, T2b, kab, kba, esp,
                    M0a, M0b, dfb, phi_ex, b1, *, tile: int,
                    interpret: bool, has_b1: bool):
    from mrphy_tpu import pi
    from mrphy_tpu.ops.epg import _expm2c, _z_recovery
    from mrphy_tpu.ops.slowsims import _expm2

    nE = flips.shape[0]
    K = nE + 1
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips = flips.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      flips])                                 # (5, nE)

    tau = esp / 2
    w = 2 * pi * dfb
    E00, E01, E10, E11 = _expm2c(
        (-1 / T2a - kab) * tau, jnp.zeros_like(T2a),
        kba * tau, kab * tau, (-1 / T2b - kba) * tau, -w * tau)
    Z00, Z01, Z10, Z11 = _expm2((-1 / T1a - kab) * tau, kba * tau,
                                kab * tau, (-1 / T1b - kba) * tau)
    ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                         M0a, M0b)
    pk = jnp.stack([E00[0], E00[1], E01[0], E01[1], E10[0], E10[1],
                    E11[0], E11[1], Z00, Z01, Z10, Z11, ra, rb,
                    jnp.cos(jnp.broadcast_to(phi_ex, (nA,))),
                    jnp.sin(jnp.broadcast_to(phi_ex, (nA,))),
                    jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32),
                                     (nA,))]).astype(f32)

    del nA
    # differentiable core: fast unchunked primal; the hand-transposed
    # fused adjoint under jax.grad (atom padding happens per-path)
    outr, outi = _xcpmg_core(K, interpret, has_b1, coef, pk)
    return jnp.stack([outr, outi], -1)               # (nE, nA, 2)


def epgx_cpmg_pallas(flips, *, T1a, T2a, T1b, T2b, kab, kba, esp,
                     M0a=1.0, M0b=0.1, dfb=0.0, phi_ex=None, b1=None,
                     tile: int = 512, interpret=None):
    r"""Fused-TPU two-pool CPMG echo train — myelin-water-fraction /
    exchange-sensitive T2-relaxometry dictionaries at volume scale.

    Same semantics as :func:`mrphy_tpu.ops.epg.epgx_cpmg` restricted
    to the mapping workload: 1-D shared refocusing ``flips``
    `(nEcho,)` (``b1`` `(nVox,)` scales it per voxel), 1-D voxel batch
    for the tissue/exchange parameters; ``esp`` scalar OR a `(nEcho,)`
    per-echo spacing train (round 5 — per-step exact propagator planes
    streamed into the kernel, grads in every rate AND the esp train).
    Returns `(nVox, nEcho, 2)`.
    Differentiable: ``jax.grad`` runs the in-kernel hand-transposed
    two-pool adjoint (``_xcpmg_bwd_kernel`` / ``_xcv_bwd_kernel``).
    """
    from mrphy_tpu import pi as _pi
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nE,) train'
    phi_ex = _pi / 2 if phi_ex is None else phi_ex
    pars = [jnp.atleast_1d(jnp.asarray(x, jnp.float32)) for x in
            (T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb, phi_ex,
             1.0 if b1 is None else b1)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    esp_a = jnp.asarray(esp, jnp.float32)
    if esp_a.ndim == 1:            # per-echo spacing train (round 5)
        assert esp_a.shape == (flips.shape[0],), esp_a.shape
        sig = _xcpmg_v_dispatch(flips, *pars[:6], esp_a, *pars[6:],
                                interpret=interpret,
                                has_b1=b1 is not None)
    else:
        sig = _xcpmg_dispatch(flips, *pars[:6], esp_a, *pars[6:],
                              tile=tile, interpret=interpret,
                              has_b1=b1 is not None)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nE, 2)


def _mt_kernel(K: int, nTR: int, kshift: int, has_b1: bool,
               coef_ref, pk_ref, outr_ref, outi_ref):
    r"""EPG-X(MT) tile: the bound pool carries only Z states (8 state
    planes total); RF saturates ``Zb`` by ``exp(−wt_t · wscale_atom)``
    — the rank-1 structure of ``W = π∫ω₁² · G(Δ, T2b)`` over a qMT
    dictionary (per-TR power × per-atom lineshape), one row exp/TR."""
    TA = pk_ref.shape[1]
    Z00, Z01 = pk_ref[0:1, :], pk_ref[1:2, :]
    Z10, Z11 = pk_ref[2:3, :], pk_ref[3:4, :]
    ra, rb = pk_ref[4:5, :], pk_ref[5:6, :]
    E2a = pk_ref[6:7, :]
    M0a, M0b = pk_ref[7:8, :], pk_ref[8:9, :]
    b1, wsc = pk_ref[9:10, :], pk_ref[10:11, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    is0, islast = row == 0, row == K - 1
    zero = jnp.zeros((K, TA), outr_ref.dtype)

    def step(t, s):
        Fpr, Fpi, Fmr, Fmi, Zr, Zi, Zbr, Zbi = s
        if has_b1:
            ah = (0.5 * coef_ref[8, t]) * b1
            ch, sh = jnp.cos(ah), jnp.sin(ah)
            ca2, sa2 = ch * ch, sh * sh
            sa, ca = 2 * ch * sh, ca2 - sa2
        else:
            ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
            sa, ca = coef_ref[2, t], coef_ref[3, t]
        c1, s1 = coef_ref[4, t], coef_ref[5, t]
        c2, s2 = coef_ref[6, t], coef_ref[7, t]
        sc2, ss2 = sa2 * c2, sa2 * s2
        ss, sc = sa * s1, sa * c1
        hs, hc = 0.5 * ss, 0.5 * sc

        # RF: rotate pool a, saturate pool b's Z
        Fp1r = ca2 * Fpr + (sc2 * Fmr - ss2 * Fmi) + (ss * Zr + sc * Zi)
        Fp1i = ca2 * Fpi + (sc2 * Fmi + ss2 * Fmr) + (ss * Zi - sc * Zr)
        Fm1r = (sc2 * Fpr + ss2 * Fpi) + ca2 * Fmr + (ss * Zr - sc * Zi)
        Fm1i = (sc2 * Fpi - ss2 * Fpr) + ca2 * Fmi + (ss * Zi + sc * Zr)
        Z1r = (-hs * Fpr + hc * Fpi) + (-hs * Fmr - hc * Fmi) + ca * Zr
        Z1i = (-hs * Fpi - hc * Fpr) + (-hs * Fmi + hc * Fmr) + ca * Zi
        sat = jnp.exp(-coef_ref[9, t] * wsc)     # (1, TA)
        Zb1r, Zb1i = sat * Zbr, sat * Zbi

        outr_ref[pl.ds(t, 1), :] = c1 * Fp1r[0:1, :] + s1 * Fp1i[0:1, :]
        outi_ref[pl.ds(t, 1), :] = c1 * Fp1i[0:1, :] - s1 * Fp1r[0:1, :]

        # relax-exchange: pool a F decays with E2a; Z pair mixes
        Fp1r, Fp1i = E2a * Fp1r, E2a * Fp1i
        Fm1r, Fm1i = E2a * Fm1r, E2a * Fm1i
        Z2r = Z00 * Z1r + Z01 * Zb1r
        Z2i = Z00 * Z1i + Z01 * Zb1i
        Zb2r = Z10 * Z1r + Z11 * Zb1r
        Zb2i = Z10 * Z1i + Z11 * Zb1i
        Z2r = jnp.where(is0, Z2r + ra, Z2r)
        Zb2r = jnp.where(is0, Zb2r + rb, Zb2r)

        # spoiler shift (pool a transverse only)
        for _ in range(abs(kshift)):
            if kshift > 0:
                Fp1r = pltpu.roll(Fp1r, 1, axis=0)
                Fp1i = pltpu.roll(Fp1i, 1, axis=0)
                Fm1r = jnp.where(islast, zero,
                                 pltpu.roll(Fm1r, K - 1, axis=0))
                Fm1i = jnp.where(islast, zero,
                                 pltpu.roll(Fm1i, K - 1, axis=0))
                Fp1r = jnp.where(is0, Fm1r[0:1, :], Fp1r)
                Fp1i = jnp.where(is0, -Fm1i[0:1, :], Fp1i)
            else:
                Fm1r = pltpu.roll(Fm1r, 1, axis=0)
                Fm1i = pltpu.roll(Fm1i, 1, axis=0)
                Fp1r = jnp.where(islast, zero,
                                 pltpu.roll(Fp1r, K - 1, axis=0))
                Fp1i = jnp.where(islast, zero,
                                 pltpu.roll(Fp1i, K - 1, axis=0))
                Fm1r = jnp.where(is0, Fp1r[0:1, :], Fm1r)
                Fm1i = jnp.where(is0, -Fp1i[0:1, :], Fm1i)
        return (Fp1r, Fp1i, Fm1r, Fm1i, Z2r, Z2i, Zb2r, Zb2i)

    u = math.gcd(nTR, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    init = (zero, zero, zero, zero, jnp.where(is0, M0a, zero), zero,
            jnp.where(is0, M0b, zero), zero)
    jax.lax.fori_loop(0, nTR // u, body, init)


@functools.partial(jax.jit, static_argnames=('K', 'kshift', 'tile',
                                             'interpret', 'has_b1'))
def _mt_dispatch(flips, phis, wt, T1a, T2a, T1b, kab, kba, tr,
                 M0a, M0b, b1, wscale, *, K: int, kshift: int,
                 tile: int, interpret: bool, has_b1: bool):
    from mrphy_tpu.ops.epg import _z_recovery
    from mrphy_tpu.ops.slowsims import _expm2

    nTR = flips.shape[0]
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips, phis = flips.astype(f32), phis.astype(f32)
    wt = jnp.broadcast_to(jnp.asarray(wt, f32), (nTR,))
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      jnp.cos(phis), jnp.sin(phis),
                      jnp.cos(2 * phis), jnp.sin(2 * phis),
                      flips, wt])                             # (10, nTR)

    Z00, Z01, Z10, Z11 = _expm2((-1 / T1a - kab) * tr, kba * tr,
                                kab * tr, (-1 / T1b - kba) * tr)
    ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                         M0a, M0b)
    pk = jnp.stack([Z00, Z01, Z10, Z11, ra, rb,
                    jnp.exp(-tr / T2a),
                    jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32), (nA,)),
                    jnp.broadcast_to(jnp.asarray(wscale, f32),
                                     (nA,))]).astype(f32)

    del nA
    # differentiable core: fast unchunked primal; the hand-transposed
    # fused adjoint under jax.grad (atom padding happens per-path)
    outr, outi = _mt_core(K, kshift, interpret, has_b1, coef, pk)
    return jnp.stack([outr, outi], -1)              # (nTR, nA, 2)


def epgx_mt_spgr_pallas(flips, phis=None, *, T1a, T2a, T1b, kab, kba,
                        tr, wt=0.0, wscale=None, M0a=1.0, M0b=0.1,
                        b1=None, kshift: int = 1, K=None,
                        tile: int = 512, interpret=None):
    r"""Fused-TPU EPG-X(MT) gradient-spoiled train — qMT dictionaries.

    Same semantics as :func:`mrphy_tpu.ops.epg.epgx_mt_spgr` restricted
    to the dictionary workload: 1-D shared ``flips``/``phis``/``wt``
    trains, 1-D atom batch for the tissue/exchange parameters. The
    per-atom saturation scaling ``wscale`` `(nAtoms,)` (from the
    bound-pool lineshape ``G(Δ, T2b)``) multiplies the shared ``wt``
    train — the effective saturation equals the XLA path's batched
    ``wt[None] * wscale[:, None]``. ``b1`` as in
    :func:`epg_spgr_pallas`. Returns `(nAtoms, nTR, 2)`.
    Differentiable: ``jax.grad`` runs the in-kernel hand-transposed
    MT adjoint (``_mt_bwd_kernel``).
    """
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nTR,) train'
    nTR = flips.shape[0]
    phis = jnp.zeros(nTR) if phis is None else jnp.asarray(phis)
    assert phis.shape == flips.shape, (phis.shape, flips.shape)
    wt = jnp.asarray(wt)
    assert wt.ndim <= 1, 'pallas backend needs a shared wt train; ' \
        'express per-atom saturation via wscale'
    pars = [jnp.atleast_1d(jnp.asarray(x, jnp.float32)) for x in
            (T1a, T2a, T1b, kab, kba, M0a, M0b,
             1.0 if b1 is None else b1,
             1.0 if wscale is None else wscale)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert int(kshift) != 0, 'kshift must be a nonzero integer'
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    tr_a = jnp.asarray(tr, jnp.float32)
    if tr_a.ndim == 1:                 # variable-TR train (round 5)
        assert tr_a.shape == (nTR,), (tr_a.shape, nTR)
        sig = _mt_v_dispatch(flips, phis, wt, *pars[:5], tr_a,
                             *pars[5:], K=K, kshift=int(kshift),
                             interpret=interpret,
                             has_b1=b1 is not None)
    else:
        sig = _mt_dispatch(flips, phis, wt, *pars[:5], tr_a,
                           *pars[5:], K=K, kshift=int(kshift),
                           tile=tile, interpret=interpret,
                           has_b1=b1 is not None)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nTR, 2)


def epg_spgr_pallas(flips, phis=None, *, T1, T2, tr, te=0.0, M0=1.0,
                    zinit=None, b1=None, D=None, dk=0.0,
                    kshift: int = 1, K=None, tile: int = 512,
                    interpret=None):
    r"""Fused-TPU gradient-spoiled EPG train (MRF dictionaries).

    Same signature/semantics as :func:`mrphy_tpu.ops.epg.epg_spgr`
    restricted to the dictionary workload: 1-D shared ``flips``/``phis``
    `(nTR,)`, 1-D atom batch ``T1``/``T2``/``M0``/``zinit`` `(nAtoms,)`
    (scalars broadcast), integer ``kshift``, no diffusion. ``tr``/``te``
    may be scalars (zero in-kernel relaxation transcendentals) or
    `(nTR,)` variable trains (round 4 — the canonical MRF-FISP
    schedule; factors computed in-kernel from per-atom rates).
    ``zinit`` starts the train from a prepared longitudinal state
    (:func:`mrphy_tpu.ops.epg.ir_prep` for inversion recovery). ``b1``
    `(nAtoms,)` scales the whole flip train per atom — the MRF
    dictionary's B1+ dimension (equivalent to the XLA path's batched
    ``b1[:, None] * flips``; trig moves in-kernel at 2
    transcendentals/TR). Returns `(nAtoms, nTR, 2)`. Differentiable:
    ``jax.grad`` runs the in-kernel hand-transposed adjoint
    (``_spgr_bwd_kernel``; variable-TR/TE factor chains in-kernel).
    ``D``/``dk`` `(nAtoms,)`/scalar (round 4): spoiler-diffusion
    attenuation IN-KERNEL — per-order planes ``exp(-D·dk²·tr·c(k))``
    computed once per atom tile in constant-TR mode, per step from
    the rate row ``D·dk²`` under a variable `(nTR,)` ``tr`` train
    (3 extra (K, TA) exps/step — the per-TR crusher b-value schedule
    of diffusion-MRF; exactly
    :func:`mrphy_tpu.ops.epg.epg_diffusion` with ``delta=kshift``),
    with the dD chain (and, variable-TR, the per-TR diffusion tr row)
    carried by the adjoint — diffusion-MRF (T1, T2, D) dictionaries
    and continuous ADC refinement at kernel speed. ``tile`` atoms are
    processed per grid step (lane multiples; the atom batch is padded
    internally). ``interpret`` defaults to Mosaic on TPU, interpreter
    elsewhere.
    """
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nTR,) train'
    nTR = flips.shape[0]
    phis = jnp.zeros(nTR) if phis is None else jnp.asarray(phis)
    assert phis.shape == flips.shape, (phis.shape, flips.shape)
    T1 = jnp.atleast_1d(jnp.asarray(T1, jnp.float32))
    T2 = jnp.atleast_1d(jnp.asarray(T2, jnp.float32))
    nA = max(T1.shape[0], T2.shape[0],
             jnp.shape(M0)[0] if jnp.ndim(M0) >= 1 else 1,
             jnp.shape(zinit)[0] if (zinit is not None
                                     and jnp.ndim(zinit) >= 1) else 1,
             jnp.shape(D)[0] if (D is not None
                                 and jnp.ndim(D) >= 1) else 1,
             jnp.shape(b1)[0] if (b1 is not None
                                  and jnp.ndim(b1) >= 1) else 1)
    T1, T2 = jnp.broadcast_to(T1, (nA,)), jnp.broadcast_to(T2, (nA,))
    assert int(kshift) != 0, 'kshift must be a nonzero integer'
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    vartr = jnp.ndim(tr) == 1 or jnp.ndim(te) == 1
    sig = _spgr_dispatch(flips, phis, T1, T2,
                         jnp.asarray(tr, jnp.float32),
                         jnp.asarray(te, jnp.float32),
                         M0, zinit, 1.0 if b1 is None else b1,
                         0.0 if D is None else D, dk,
                         K=K, kshift=int(kshift), tile=tile,
                         interpret=interpret, has_b1=b1 is not None,
                         vartr=vartr, has_d=D is not None)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nTR, 2)


# ==========================================================================
# In-kernel SPGR adjoint (round 3): hand-transposed fused backward
# ==========================================================================

def _spgr_trig(coef_ref, t, b1, has_b1):
    r"""Per-TR RF trig (shared scalars, or per-atom rows under b1) —
    the same arithmetic as ``_spgr_kernel``'s step (kept in sync)."""
    if has_b1:
        ah = (0.5 * coef_ref[8, t]) * b1
        ch, sh = jnp.cos(ah), jnp.sin(ah)
        ca2, sa2 = ch * ch, sh * sh
        sa, ca = 2 * ch * sh, ca2 - sa2
    else:
        ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
        sa, ca = coef_ref[2, t], coef_ref[3, t]
    return (ca2, sa2, sa, ca, coef_ref[4, t], coef_ref[5, t],
            coef_ref[6, t], coef_ref[7, t])


def _spgr_mix(tg, s):
    r"""RF mixing (``epg_rf`` rows, real-pair arithmetic)."""
    ca2, sa2, sa, ca, c1, s1, c2, s2 = tg
    Fpr, Fpi, Fmr, Fmi, Zr, Zi = s
    sc2, ss2 = sa2 * c2, sa2 * s2
    ss, sc = sa * s1, sa * c1
    hs, hc = 0.5 * ss, 0.5 * sc
    return (ca2 * Fpr + (sc2 * Fmr - ss2 * Fmi) + (ss * Zr + sc * Zi),
            ca2 * Fpi + (sc2 * Fmi + ss2 * Fmr) + (ss * Zi - sc * Zr),
            (sc2 * Fpr + ss2 * Fpi) + ca2 * Fmr + (ss * Zr - sc * Zi),
            (sc2 * Fpi - ss2 * Fpr) + ca2 * Fmi + (ss * Zi + sc * Zr),
            (-hs * Fpr + hc * Fpi) + (-hs * Fmr - hc * Fmi) + ca * Zr,
            (-hs * Fpi - hc * Fpr) + (-hs * Fmi + hc * Fmr) + ca * Zi)


def _spgr_mix_T(tg, h):
    r"""Exact transpose of :func:`_spgr_mix` (coefficient-wise)."""
    ca2, sa2, sa, ca, c1, s1, c2, s2 = tg
    hFpr, hFpi, hFmr, hFmi, hZr, hZi = h
    sc2, ss2 = sa2 * c2, sa2 * s2
    ss, sc = sa * s1, sa * c1
    hs, hc = 0.5 * ss, 0.5 * sc
    return (ca2 * hFpr + sc2 * hFmr - ss2 * hFmi - hs * hZr - hc * hZi,
            ca2 * hFpi + ss2 * hFmr + sc2 * hFmi + hc * hZr - hs * hZi,
            sc2 * hFpr + ss2 * hFpi + ca2 * hFmr - hs * hZr + hc * hZi,
            -ss2 * hFpr + sc2 * hFpi + ca2 * hFmi - hc * hZr - hs * hZi,
            ss * hFpr - sc * hFpi + ss * hFmr + sc * hFmi + ca * hZr,
            sc * hFpr + ss * hFpi - sc * hFmr + ss * hFmi + ca * hZi)


def _spgr_relax_shift(kshift, masks, E1, E2, rec, s, att=None):
    r"""Relaxation over TR (+ optional per-order diffusion
    attenuation) + |kshift| unit spoiler shifts (the tail of
    ``_spgr_kernel``'s step, kept in sync)."""
    is0, islast, zero = masks
    K = zero.shape[0]
    Fpr, Fpi, Fmr, Fmi, Zr, Zi = s
    Fpr, Fpi = E2 * Fpr, E2 * Fpi
    Fmr, Fmi = E2 * Fmr, E2 * Fmi
    Zr = jnp.where(is0, E1 * Zr + rec, E1 * Zr)
    Zi = E1 * Zi
    if att is not None:
        ATp, ATm, AL = att
        Fpr, Fpi = ATp * Fpr, ATp * Fpi
        Fmr, Fmi = ATm * Fmr, ATm * Fmi
        Zr, Zi = AL * Zr, AL * Zi
    for _ in range(abs(kshift)):
        if kshift > 0:
            Fpr = pltpu.roll(Fpr, 1, axis=0)
            Fpi = pltpu.roll(Fpi, 1, axis=0)
            Fmr = jnp.where(islast, zero,
                            pltpu.roll(Fmr, K - 1, axis=0))
            Fmi = jnp.where(islast, zero,
                            pltpu.roll(Fmi, K - 1, axis=0))
            Fpr = jnp.where(is0, Fmr[0:1, :], Fpr)
            Fpi = jnp.where(is0, -Fmi[0:1, :], Fpi)
        else:
            Fmr = pltpu.roll(Fmr, 1, axis=0)
            Fmi = pltpu.roll(Fmi, 1, axis=0)
            Fpr = jnp.where(islast, zero,
                            pltpu.roll(Fpr, K - 1, axis=0))
            Fpi = jnp.where(islast, zero,
                            pltpu.roll(Fpi, K - 1, axis=0))
            Fmr = jnp.where(is0, Fpr[0:1, :], Fmr)
            Fmi = jnp.where(is0, -Fpi[0:1, :], Fmi)
    return Fpr, Fpi, Fmr, Fmi, Zr, Zi


def _spgr_shift_T(kshift, masks, h):
    r"""Transpose of ONE application of the spoiler shift. Forward
    (kshift > 0): ``Fp1[k] = Fp[k-1]`` (k >= 1), ``Fp1[0] =
    conj(Fm[1])``, ``Fm1[k] = Fm[k+1]`` (k <= K-2), ``Fm1[K-1] = 0``
    — so ``Fp[K-1]`` and ``Fm[0]`` feed nothing, and ``Fm[1]`` feeds
    both ``Fm1[0]`` and the conjugated ``Fp1[0]``."""
    is0, islast, zero = masks
    K = zero.shape[0]
    row1 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 1
    hFpr, hFpi, hFmr, hFmi, hZr, hZi = h
    if kshift > 0:
        nFpr = jnp.where(islast, zero,
                         pltpu.roll(hFpr, K - 1, axis=0))
        nFpi = jnp.where(islast, zero,
                         pltpu.roll(hFpi, K - 1, axis=0))
        nFmr = jnp.where(is0, zero, pltpu.roll(hFmr, 1, axis=0))
        nFmi = jnp.where(is0, zero, pltpu.roll(hFmi, 1, axis=0))
        nFmr = jnp.where(row1, nFmr + hFpr[0:1, :], nFmr)
        nFmi = jnp.where(row1, nFmi - hFpi[0:1, :], nFmi)
    else:
        nFmr = jnp.where(islast, zero,
                         pltpu.roll(hFmr, K - 1, axis=0))
        nFmi = jnp.where(islast, zero,
                         pltpu.roll(hFmi, K - 1, axis=0))
        nFpr = jnp.where(is0, zero, pltpu.roll(hFpr, 1, axis=0))
        nFpi = jnp.where(is0, zero, pltpu.roll(hFpi, 1, axis=0))
        nFpr = jnp.where(row1, nFpr + hFmr[0:1, :], nFpr)
        nFpi = jnp.where(row1, nFpi - hFmi[0:1, :], nFpi)
    return nFpr, nFpi, nFmr, nFmi, hZr, hZi


def _spgr_fwd_chk_kernel(K: int, tc: int, ntc: int, kshift: int,
                         has_b1: bool, vartr: bool, has_d: bool,
                         coef_ref, e1_ref, e2_ref, e2te_ref, rec_ref,
                         m0_ref, b1_ref, dq_ref, outr_ref, outi_ref,
                         chk_ref, s_scr):
    r"""Chunked forward for the VJP path: grid (atom tiles, time
    chunks); the state persists in scratch across chunks, each chunk's
    START (pre-RF) state streams to ``chk`` for the backward's
    per-chunk recompute. Echo math matches ``_spgr_kernel``."""
    TA = e1_ref.shape[1]
    E1, E2 = e1_ref[...], e2_ref[...]
    E2te, rec = e2te_ref[...], rec_ref[...]
    b1 = b1_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1, jnp.zeros((K, TA), E1.dtype))
    att_f, _ = _spgr_att_t(has_d, vartr, K, kshift, dq_ref, coef_ref,
                           E1.dtype)
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        z = masks[2]
        for p, v in enumerate((z, z, z, z,
                               jnp.where(masks[0], m0_ref[...], z), z)):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(6))
    for p in range(6):
        chk_ref[0, p] = s[p]

    def step(t, s):
        tg = _spgr_trig(coef_ref, t, b1, has_b1)
        E1t, E2t, E2tet, rect = _spgr_factors_t(vartr, coef_ref, t,
                                                E1, E2, E2te, rec)
        s1 = _spgr_mix(tg, s)
        c1, s1c = tg[4], tg[5]
        fp0r, fp0i = s1[0][0:1, :], s1[1][0:1, :]
        outr_ref[pl.ds(t, 1), :] = E2tet * (c1 * fp0r + s1c * fp0i)
        outi_ref[pl.ds(t, 1), :] = E2tet * (c1 * fp0i - s1c * fp0r)
        return _spgr_relax_shift(kshift, masks, E1t, E2t, rect, s1,
                                 att_f(t))

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            s = step(t0 + k * u + jj, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(6):
        s_scr[p] = s[p]


def _spgr_bwd_kernel(K: int, tc: int, ntc: int, kshift: int,
                     has_b1: bool, vartr: bool, has_d: bool, coef_ref,
                     e1_ref, e2_ref, e2te_ref, rec_ref, m0_ref,
                     b1_ref, dq_ref, chk_ref, gr_ref, gi_ref,
                     dpar_ref, dcf_ref, s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint, chunks visited newest-first. Phase 1
    re-runs the forward from the chunk-START checkpoint, storing every
    pre-RF state; phase 2 walks them backwards: spoiler-shift
    transpose -> relaxation transpose (dE1/dE2/drec rows) -> echo
    cotangent injection (dE2te + phase-coefficient terms) -> RF-mix
    transpose (per-TR coefficient grads as (TA,) lane-partials; under
    b1, the per-atom flip chain feeds db1 and the flips row).
    Outputs: ``dpar`` (7, TA) = [dE1, dE2, dE2te, drec, dM0, db1,
    dDq]; ``dcf`` (tc, nC, TA) lane-partial coefficient rows per
    chunk. Under ``has_d`` the diffusion transpose multiplies the
    cotangent by the same attenuation planes and accumulates the
    per-atom ``dDq`` row via the static b-factor coefficient planes
    (``dA/dDq = -c(k)*A(k)``).
    Variable-TR/TE mode (round 4): the plane slots hold (R1, R2, M0,
    ·), the per-step factor grads chain in-kernel to the rate/M0 rows
    and to per-TR d(tr)/d(te) coefficient rows (dcf rows 9/10), and
    ``dpar`` reads [dR1, dR2, dM0, 0, dzinit, db1]."""
    TA = e1_ref.shape[1]
    E1, E2 = e1_ref[...], e2_ref[...]
    E2te, rec = e2te_ref[...], rec_ref[...]
    b1 = b1_ref[...]
    nC = 11 if vartr else 9
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1, jnp.zeros((K, TA), E1.dtype))
    is0 = masks[0]
    att_f, cpl = _spgr_att_t(has_d, vartr, K, kshift, dq_ref,
                             coef_ref, E1.dtype)
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), E1.dtype)
        for a in range(7):
            acc_scr[a] = z1
        for p in range(6):
            h_scr[p] = masks[2]

    # ---- phase 1: forward recompute, storing pre-RF states ---------
    def fstep(t, s):
        tg = _spgr_trig(coef_ref, t, b1, has_b1)
        E1t, E2t, _, rect = _spgr_factors_t(vartr, coef_ref, t,
                                            E1, E2, E2te, rec)
        return _spgr_relax_shift(kshift, masks, E1t, E2t, rect,
                                 _spgr_mix(tg, s), att_f(t))

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(6):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(6)))

    # ---- phase 2: transposed recursion over the stored states ------
    def bstep(t, tl, carry):
        h = carry[:6]
        (aE1, aE2, aE2te, arec, aM0, ab1, aDq) = carry[6:]
        s = tuple(s_scr[tl, p] for p in range(6))
        tg = _spgr_trig(coef_ref, t, b1, has_b1)
        E1t, E2t, E2tet, rect = _spgr_factors_t(vartr, coef_ref, t,
                                                E1, E2, E2te, rec)
        s1 = _spgr_mix(tg, s)

        # shift transpose (reverse the |kshift| unit shifts)
        for _ in range(abs(kshift)):
            h = _spgr_shift_T(kshift, masks, h)

        d_tr_diff = None
        if has_d:
            # diffusion transpose: h *= A; the dq chain contracts
            # contr = -sum_k c*A*(h.s2) with s2 the post-relax state
            # (recomputed from s1). Constant TR: dq IS D*dk^2*tr, so
            # dDq += contr. Variable TR (round 4): dq holds the RATE
            # D*dk^2 and dq_t = dq*tr_t, so dDq += tr_t*contr and the
            # tr train gains a per-TR diffusion row dq*contr.
            ATp, ATm, AL = att_f(t)
            cTp, cTm, cL = cpl
            is0m = masks[0]
            s2F = (E2t * s1[0], E2t * s1[1], E2t * s1[2], E2t * s1[3])
            s2Zr = jnp.where(is0m, E1t * s1[4] + rect, E1t * s1[4])
            s2Zi = E1t * s1[5]
            contr = -jnp.sum(
                cTp * ATp * (h[0] * s2F[0] + h[1] * s2F[1])
                + cTm * ATm * (h[2] * s2F[2] + h[3] * s2F[3])
                + cL * AL * (h[4] * s2Zr + h[5] * s2Zi),
                axis=0, keepdims=True)
            if vartr:
                aDq = aDq + coef_ref[9, t] * contr
                d_tr_diff = dq_ref[...] * contr
            else:
                aDq = aDq + contr
            h = (ATp * h[0], ATp * h[1], ATm * h[2], ATm * h[3],
                 AL * h[4], AL * h[5])

        # relaxation transpose + per-step factor grads
        hFpr, hFpi, hFmr, hFmi, hZr, hZi = h
        d_E2_t = jnp.sum(hFpr * s1[0] + hFpi * s1[1]
                         + hFmr * s1[2] + hFmi * s1[3], axis=0,
                         keepdims=True)
        d_E1_t = jnp.sum(hZr * s1[4] + hZi * s1[5], axis=0,
                         keepdims=True)
        d_rec_t = hZr[0:1, :]
        h = (E2t * hFpr, E2t * hFpi, E2t * hFmr, E2t * hFmi,
             E1t * hZr, E1t * hZi)

        # echo cotangent injection (echo reads s1 BEFORE relaxation)
        c1, s1c = tg[4], tg[5]
        gyr, gyi = gr_ref[pl.ds(t, 1), :], gi_ref[pl.ds(t, 1), :]
        fp0r, fp0i = s1[0][0:1, :], s1[1][0:1, :]
        d_E2te_t = (gyr * (c1 * fp0r + s1c * fp0i)
                    + gyi * (c1 * fp0i - s1c * fp0r))
        er = E2tet * (c1 * gyr - s1c * gyi)
        ei = E2tet * (s1c * gyr + c1 * gyi)
        h = (jnp.where(is0, h[0] + er, h[0]),
             jnp.where(is0, h[1] + ei, h[1])) + h[2:]
        # echo's own phase-coefficient terms (c1, s1 rows)
        d_c1e = E2tet * (gyr * fp0r + gyi * fp0i)
        d_s1e = E2tet * (gyr * fp0i - gyi * fp0r)

        if vartr:
            # chain the per-step factors back to (R1, R2, M0) rows —
            # E1/E2/E2te slots hold R1/R2/M0 — and to the SMEM tr/te
            # trains (per-TR dcf rows 9/10). rect = M0·(1−E1t).
            trn, ten = coef_ref[9, t], coef_ref[10, t]
            d_E1tot = d_E1_t - E2te * d_rec_t
            aE2te = aE2te + (1 - E1t) * d_rec_t            # dM0
            aE1 = aE1 - trn * E1t * d_E1tot                # dR1
            aE2 = aE2 - trn * E2t * d_E2_t \
                - ten * E2tet * d_E2te_t                   # dR2
            d_tr_row = -E1 * E1t * d_E1tot - E2 * E2t * d_E2_t
            if d_tr_diff is not None:
                d_tr_row = d_tr_row + d_tr_diff
            d_te_row = -E2 * E2tet * d_E2te_t
        else:
            aE1 = aE1 + d_E1_t
            aE2 = aE2 + d_E2_t
            arec = arec + d_rec_t
            aE2te = aE2te + d_E2te_t

        # RF-mix transpose + coefficient grads
        ca2, sa2, sa, ca, c1, s1c, c2, s2 = tg
        h1Fpr, h1Fpi, h1Fmr, h1Fmi, h1Zr, h1Zi = h
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = s

        def ksum(x):
            return jnp.sum(x, axis=0, keepdims=True)     # (1, TA)

        d_ca2 = ksum(h1Fpr * Fpr + h1Fpi * Fpi
                     + h1Fmr * Fmr + h1Fmi * Fmi)
        d_sc2 = ksum(h1Fpr * Fmr + h1Fpi * Fmi
                     + h1Fmr * Fpr + h1Fmi * Fpi)
        d_ss2 = ksum(-h1Fpr * Fmi + h1Fpi * Fmr
                     + h1Fmr * Fpi - h1Fmi * Fpr)
        d_ss = ksum((h1Fpr + h1Fmr) * Zr + (h1Fpi + h1Fmi) * Zi)
        d_sc = ksum((h1Fpr - h1Fmr) * Zi - (h1Fpi - h1Fmi) * Zr)
        d_hs = ksum(-h1Zr * (Fpr + Fmr) - h1Zi * (Fpi + Fmi))
        d_hc = ksum(h1Zr * (Fpi - Fmi) + h1Zi * (Fmr - Fpr))
        d_ca = ksum(h1Zr * Zr + h1Zi * Zi)

        d_sa2 = c2 * d_sc2 + s2 * d_ss2
        d_c2 = sa2 * d_sc2
        d_s2 = sa2 * d_ss2
        d_sa = s1c * (d_ss + 0.5 * d_hs) + c1 * (d_sc + 0.5 * d_hc)
        d_s1 = sa * (d_ss + 0.5 * d_hs) + d_s1e
        d_c1 = sa * (d_sc + 0.5 * d_hc) + d_c1e

        zrow = jnp.zeros((1, TA), E1.dtype)
        if has_b1:
            # alpha = flips[t] * b1: chain the half-angle trig
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            ab1 = ab1 + d_al * coef_ref[8, t]
            rows = (zrow, zrow, zrow, zrow, d_c1, d_s1, d_c2, d_s2,
                    d_al * b1)
        else:
            rows = (d_ca2, d_sa2, d_sa, d_ca, d_c1, d_s1, d_c2, d_s2,
                    zrow)
        if vartr:
            rows = rows + (d_tr_row, d_te_row)
        for c in range(nC):
            dcf_ref[0, tl, c] = rows[c][0]

        h = _spgr_mix_T(tg, h)
        return h + (aE1, aE2, aE2te, arec, aM0, ab1, aDq)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(6))
        + tuple(acc_scr[a] for a in range(7)))
    for p in range(6):
        h_scr[p] = carry[p]
    for a in range(7):
        acc_scr[a] = carry[6 + a]

    @pl.when(j == ntc - 1)
    def _():
        # cotangent at the initial state: Z(0) = zinit on the k=0 row
        # (the m0 slot; = M0 when no preparation). In vartr mode the
        # slots read [dR1, dR2, dM0, 0, dzinit, db1, dDq].
        dM0 = carry[10] + carry[4][0:1, :]
        for a, v in enumerate((carry[6], carry[7], carry[8],
                               carry[9], dM0, carry[11], carry[12])):
            dpar_ref[pl.ds(a, 1), :] = v


_BWD_TILE = 128                    # lanes per backward atom tile


def _pick_tc_spgr(nTR: int, K: int) -> int:
    r"""Backward time-chunk: bound the per-chunk pre-RF state scratch
    (tc, 6, K, _BWD_TILE) to ~14 MB while dividing nTR (unroll-friendly
    divisors preferred — the 5x gcd cliff, RESULTS.md round 3)."""
    from mrphy_tpu.utils._shapes import largest_divisor_leq_pref
    bound = max(1, (14 << 20) // (6 * K * _BWD_TILE * 4))
    if nTR <= bound:
        return nTR
    return largest_divisor_leq_pref(nTR, bound, _UNROLL)


def spgr_bwd_is_available(*, nTR: int, K: int, nA: int) -> bool:
    r"""Whether the fused SPGR adjoint fits: per-chunk state scratch in
    VMEM and bounded HBM for the checkpoint/coefficient partials."""
    tc = _pick_tc_spgr(nTR, K)
    if nTR % tc:
        return False
    ntc = nTR // tc
    scr = tc * 6 * K * _BWD_TILE * 4
    ntiles = -(-nA // _BWD_TILE)
    chk = ntc * 6 * K * ntiles * _BWD_TILE * 4
    dcf = ntiles * nTR * 11 * _BWD_TILE * 4
    return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
            and dcf <= 2 * 1024 ** 3)


def _spgr_args_pad(E1, E2, E2te, rec, M0a, b1, dq, tile):
    nA = E1.shape[1]
    pad = (-nA) % tile
    if pad:
        pv = [(0, 0), (0, pad)]
        return tuple(jnp.pad(x, pv) for x in
                     (E1, E2, E2te, rec, M0a, b1, dq)), nA + pad
    return (E1, E2, E2te, rec, M0a, b1, dq), nA


def _spgr_fwd_chk(coef, E1, E2, E2te, rec, M0a, b1, dq, *, K, kshift,
                  interpret, has_b1, vartr, has_d):
    nTR = coef.shape[1]
    tile = _BWD_TILE
    (E1, E2, E2te, rec, M0a, b1, dq), nAp = _spgr_args_pad(
        E1, E2, E2te, rec, M0a, b1, dq, tile)
    tc = _pick_tc_spgr(nTR, K)
    ntc = nTR // tc
    atom = pl.BlockSpec((1, tile), lambda i, j: (0, i))
    out = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 6, K, tile), lambda i, j: (j, 0, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_spgr_fwd_chk_kernel, K, tc, ntc, kshift,
                          has_b1, vartr, has_d),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  atom, atom, atom, atom, atom, atom, atom],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 6, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((6, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, E1, E2, E2te, rec, M0a, b1, dq)
    return outr, outi, chka


def _spgr_bwd(coef, E1, E2, E2te, rec, M0a, b1, dq, chka, gr, gi, *,
              K, kshift, interpret, has_b1, vartr, has_d):
    r"""Returns ``(dcoef (nC, nTR), dE1, dE2, dE2te, drec, dM0, db1,
    dDq)`` with the per-atom rows `(1, nA)`-shaped (unpadded)."""
    nC, nTR = coef.shape
    nA = E1.shape[1]
    tile = _BWD_TILE
    (E1p, E2p, E2tep, recp, M0ap, b1p, dqp), nAp = _spgr_args_pad(
        E1, E2, E2te, rec, M0a, b1, dq, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)])
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)])
    tc = _pick_tc_spgr(nTR, K)
    ntc = nTR // tc
    ntiles = nAp // tile
    atom = pl.BlockSpec((1, tile), lambda i, j: (0, i))
    gsp = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 6, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    dpar, dcf = pl.pallas_call(
        functools.partial(_spgr_bwd_kernel, K, tc, ntc, kshift,
                          has_b1, vartr, has_d),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  atom, atom, atom, atom, atom, atom, atom, chk,
                  gsp, gsp],
        out_specs=[pl.BlockSpec((7, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, nC, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((7, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, nC, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 6, K, tile), jnp.float32),
                        pltpu.VMEM((6, K, tile), jnp.float32),
                        pltpu.VMEM((7, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, E1p, E2p, E2tep, recp, M0ap, b1p, dqp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=(0, 3)).T            # (nC, nTR)
    dpar = dpar[:, :nA]
    return (dcoef, dpar[0:1], dpar[1:2], dpar[2:3], dpar[3:4],
            dpar[4:5], dpar[5:6], dpar[6:7])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _spgr_core(K, kshift, interpret, has_b1, vartr, has_d, coef, E1,
               E2, E2te, rec, M0a, b1, dq, tile):
    r"""Differentiable fused SPGR train core. The primal runs the fast
    unchunked kernel; under differentiation the forward emits chunk
    checkpoints and the backward is the hand-transposed fused adjoint
    (``_spgr_bwd_kernel``) — gradients at kernel speed, no
    recompute-through-XLA reverse. ``tile`` rides as a traced-ignored
    arg so the primal keeps its wide default."""
    del tile
    return _spgr_fast(coef, E1, E2, E2te, rec, M0a, b1, dq, K=K,
                      kshift=kshift, interpret=interpret,
                      has_b1=has_b1, vartr=vartr, has_d=has_d)


def _spgr_fast(coef, E1, E2, E2te, rec, M0a, b1, dq, *, K, kshift,
               interpret, has_b1, vartr, has_d, tile=512):
    nTR = coef.shape[1]
    nA = E1.shape[1]
    tile = min(tile, -(-nA // _LANE) * _LANE)
    (E1, E2, E2te, rec, M0a, b1, dq), nAp = _spgr_args_pad(
        E1, E2, E2te, rec, M0a, b1, dq, tile)
    atom = pl.BlockSpec((1, tile), lambda i: (0, i))
    out = pl.BlockSpec((nTR, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_spgr_kernel, K, nTR, kshift, has_b1,
                          vartr, has_d),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  atom, atom, atom, atom, atom, atom, atom],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, E1, E2, E2te, rec, M0a, b1, dq)
    return outr[:, :nA], outi[:, :nA]


def _spgr_core_fwd(K, kshift, interpret, has_b1, vartr, has_d, coef,
                   E1, E2, E2te, rec, M0a, b1, dq, tile):
    outr, outi, chka = _spgr_fwd_chk(coef, E1, E2, E2te, rec, M0a, b1,
                                     dq, K=K, kshift=kshift,
                                     interpret=interpret,
                                     has_b1=has_b1, vartr=vartr,
                                     has_d=has_d)
    nA = E1.shape[1]
    return ((outr[:, :nA], outi[:, :nA]),
            (coef, E1, E2, E2te, rec, M0a, b1, dq, chka))


def _spgr_core_bwd(K, kshift, interpret, has_b1, vartr, has_d, res,
                   g):
    coef, E1, E2, E2te, rec, M0a, b1, dq, chka = res
    gr, gi = g
    (dcoef, dE1, dE2, dE2te, drec, dM0, db1, dDq) = _spgr_bwd(
        coef, E1, E2, E2te, rec, M0a, b1, dq, chka, gr, gi, K=K,
        kshift=kshift, interpret=interpret, has_b1=has_b1,
        vartr=vartr, has_d=has_d)
    if not has_b1:
        db1 = jnp.zeros_like(db1)
    if not has_d:
        dDq = jnp.zeros_like(dDq)
    return (dcoef, dE1, dE2, dE2te, drec, dM0, db1, dDq, None)


_spgr_core.defvjp(_spgr_core_fwd, _spgr_core_bwd)


# ==========================================================================
# In-kernel CPMG adjoint (round 3): composes the SPGR transposes —
# the refocusing mix is the general RF mix at phi = 0, and `half` is
# relax(esp/2) + unit shift, so the reverse is echo-cotangent inject →
# shift-T → relax-T → mix-T(+flip grads) → shift-T → relax-T per echo.
# Volume T2/MWF fitting needs this: the recompute-through-XLA reverse
# holds O(nE·nV·K) scan residuals (≈25 GB at 1M voxels × 32 echoes).
# ==========================================================================

def _cpmg_trig(coef_ref, t, b1, has_b1):
    if has_b1:
        ah = (0.5 * coef_ref[4, t]) * b1
        ch, sh = jnp.cos(ah), jnp.sin(ah)
        ca2, sa2 = ch * ch, sh * sh
        sa, ca = 2 * ch * sh, ca2 - sa2
    else:
        ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
        sa, ca = coef_ref[2, t], coef_ref[3, t]
    one = 1.0
    return (ca2, sa2, sa, ca, one, 0.0, one, 0.0)


def _cpmg_half(masks, E1h, E2h, rech, s):
    return _spgr_relax_shift(1, masks, E1h, E2h, rech, s)


def _cpmg_init(masks, pk_ref):
    is0, _, zero = masks
    e_ss, e_sc, e_ca = pk_ref[3:4, :], pk_ref[4:5, :], pk_ref[5:6, :]
    return (jnp.where(is0, e_ss, zero), jnp.where(is0, -e_sc, zero),
            jnp.where(is0, e_ss, zero), jnp.where(is0, e_sc, zero),
            jnp.where(is0, e_ca, zero), zero)


def _cpmg_fwd_chk_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                         varesp: bool, has_d: bool, coef_ref, pk_ref,
                         dq_ref, outr_ref, outi_ref, chk_ref, s_scr):
    r"""Chunked CPMG forward for the VJP path (echo math matches
    ``_cpmg_kernel``); chunk-START (pre-echo) states stream to chk."""
    TA = pk_ref.shape[1]
    p1, p2, p3 = pk_ref[0:1, :], pk_ref[1:2, :], pk_ref[2:3, :]
    b1 = pk_ref[6:7, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    att_f, _ = _cpmg_att_t(has_d, varesp, K, dq_ref, coef_ref,
                           outr_ref.dtype)
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        for p, v in enumerate(_cpmg_init(masks, pk_ref)):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(6))
    for p in range(6):
        chk_ref[0, p] = s[p]

    def step(t, s):
        E1h, E2h, rech = _cpmg_factors_t(varesp, coef_ref, t,
                                         p1, p2, p3)
        at = att_f(t)
        s = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        s = _spgr_mix(_cpmg_trig(coef_ref, t, b1, has_b1), s)
        s = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :]
        return s

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            s = step(t0 + k * u + jj, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(6):
        s_scr[p] = s[p]


def _cpmg_bwd_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                     varesp: bool, has_d: bool, coef_ref, pk_ref,
                     dq_ref, chk_ref, gr_ref, gi_ref, dpar_ref,
                     dcf_ref, s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the CPMG train. Accumulator rows:
    [dE1h, dE2h, drech, db1, dDq]; ``dcf`` `(tc, nC, TA)`
    lane-partials for the coef rows [ca2, sa2, sa, ca, flips] (+ the
    per-echo esp row under ``varesp``); init grads (excitation
    e_ss/e_sc/e_ca rows) emit with ``dpar``. Variable-spacing mode:
    the factor slots hold (R1, R2, M0) and the per-echo factor grads
    chain in-kernel to the rate/M0 rows and to the esp train (round
    5, the SPGR vartr recipe); ``has_d`` adds the diffusion transpose
    per half (dDq contraction via the static b-factor planes)."""
    TA = pk_ref.shape[1]
    p1, p2, p3 = pk_ref[0:1, :], pk_ref[1:2, :], pk_ref[2:3, :]
    b1 = pk_ref[6:7, :]
    nC = 6 if varesp else 5
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    att_f, cpl = _cpmg_att_t(has_d, varesp, K, dq_ref, coef_ref,
                             gr_ref.dtype)
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), gr_ref.dtype)
        for a in range(5):
            acc_scr[a] = z1
        for p in range(6):
            h_scr[p] = masks[2]

    # ---- phase 1: forward recompute, storing pre-echo states -------
    def fstep(t, s):
        E1h, E2h, rech = _cpmg_factors_t(varesp, coef_ref, t,
                                         p1, p2, p3)
        at = att_f(t)
        s = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        s = _spgr_mix(_cpmg_trig(coef_ref, t, b1, has_b1), s)
        return _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(6):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(6)))

    def ksum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    # ---- phase 2: transposed recursion ------------------------------
    def bstep(t, tl, carry):
        h = carry[:6]
        aE1, aE2, arec, ab1, aDq = carry[6:]
        s = tuple(s_scr[tl, p] for p in range(6))
        tg = _cpmg_trig(coef_ref, t, b1, has_b1)
        E1h, E2h, rech = _cpmg_factors_t(varesp, coef_ref, t,
                                         p1, p2, p3)
        at = att_f(t)
        sh1 = _spgr_relax_shift(1, masks, E1h, E2h, rech, s, at)
        s1 = _spgr_mix(tg, sh1)                       # after refocus
        d_esp_row = jnp.zeros((1, TA), gr_ref.dtype)

        def half_T(h, x, aE1, aE2, arec, aDq, d_esp_row):
            r"""Transpose of one half (relax(+att)+shift) at input
            ``x``, chaining per-step factor (and diffusion) grads."""
            h = _spgr_shift_T(1, masks, h)
            if has_d:
                ATp, ATm, AL = at
                cTp, cTm, cL = cpl
                s2F = (E2h * x[0], E2h * x[1], E2h * x[2], E2h * x[3])
                s2Zr = jnp.where(is0, E1h * x[4] + rech, E1h * x[4])
                s2Zi = E1h * x[5]
                contr = -jnp.sum(
                    cTp * ATp * (h[0] * s2F[0] + h[1] * s2F[1])
                    + cTm * ATm * (h[2] * s2F[2] + h[3] * s2F[3])
                    + cL * AL * (h[4] * s2Zr + h[5] * s2Zi),
                    axis=0, keepdims=True)
                if varesp:
                    aDq = aDq + (0.5 * coef_ref[5, t]) * contr
                    d_esp_row = d_esp_row + 0.5 * dq_ref[...] * contr
                else:
                    aDq = aDq + contr
                h = (ATp * h[0], ATp * h[1], ATm * h[2], ATm * h[3],
                     AL * h[4], AL * h[5])
            hFpr, hFpi, hFmr, hFmi, hZr, hZi = h
            d_E2h = ksum(hFpr * x[0] + hFpi * x[1]
                         + hFmr * x[2] + hFmi * x[3])
            d_E1h = ksum(hZr * x[4] + hZi * x[5])
            d_rech = hZr[0:1, :]
            if varesp:
                # slots (R1, R2, M0); rech = M0*(1 - E1h)
                hn = 0.5 * coef_ref[5, t]
                d_E1tot = d_E1h - p3 * d_rech
                arec = arec + (1 - E1h) * d_rech              # dM0
                aE1 = aE1 - hn * E1h * d_E1tot                # dR1
                aE2 = aE2 - hn * E2h * d_E2h                  # dR2
                d_esp_row = d_esp_row - 0.5 * (
                    p1 * E1h * d_E1tot + p2 * E2h * d_E2h)
            else:
                aE1 = aE1 + d_E1h
                aE2 = aE2 + d_E2h
                arec = arec + d_rech
            return ((E2h * hFpr, E2h * hFpi, E2h * hFmr, E2h * hFmi,
                     E1h * hZr, E1h * hZi),
                    aE1, aE2, arec, aDq, d_esp_row)

        # echo emission reads F+(0) of the POST-2nd-half state
        h = (jnp.where(is0, h[0] + gr_ref[pl.ds(t, 1), :], h[0]),
             jnp.where(is0, h[1] + gi_ref[pl.ds(t, 1), :], h[1])) \
            + h[2:]

        # 2nd half transpose (at input s1)
        h, aE1, aE2, arec, aDq, d_esp_row = half_T(
            h, s1, aE1, aE2, arec, aDq, d_esp_row)

        # refocusing-mix transpose + flip grads (general formulas at
        # c1=1, s1=0, c2=1, s2=0: d_sa2 = d_sc2, d_sa = d_sc + d_hc/2)
        ca2, sa2, sa, ca = tg[0], tg[1], tg[2], tg[3]
        h1Fpr, h1Fpi, h1Fmr, h1Fmi, h1Zr, h1Zi = h
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = sh1
        d_ca2 = ksum(h1Fpr * Fpr + h1Fpi * Fpi
                     + h1Fmr * Fmr + h1Fmi * Fmi)
        d_sc2 = ksum(h1Fpr * Fmr + h1Fpi * Fmi
                     + h1Fmr * Fpr + h1Fmi * Fpi)
        d_sc = ksum((h1Fpr - h1Fmr) * Zi - (h1Fpi - h1Fmi) * Zr)
        d_hc = ksum(h1Zr * (Fpi - Fmi) + h1Zi * (Fmr - Fpr))
        d_ca = ksum(h1Zr * Zr + h1Zi * Zi)
        d_sa2 = d_sc2
        d_sa = d_sc + 0.5 * d_hc

        zrow = jnp.zeros((1, TA), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            ab1 = ab1 + d_al * coef_ref[4, t]
            rows = (zrow, zrow, zrow, zrow, d_al * b1)
        else:
            rows = (d_ca2, d_sa2, d_sa, d_ca, zrow)

        h = _spgr_mix_T(tg, h)

        # 1st half transpose (input = the stored pre-echo state)
        h, aE1, aE2, arec, aDq, d_esp_row = half_T(
            h, s, aE1, aE2, arec, aDq, d_esp_row)

        if varesp:
            rows = rows + (d_esp_row,)
        for c in range(nC):
            dcf_ref[0, tl, c] = rows[c][0]
        return h + (aE1, aE2, arec, ab1, aDq)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(6))
        + tuple(acc_scr[a] for a in range(5)))
    for p in range(6):
        h_scr[p] = carry[p]
    for a in range(5):
        acc_scr[a] = carry[6 + a]

    @pl.when(j == ntc - 1)
    def _():
        # init transpose: Fp(0)=(e_ss, -e_sc), Fm(0)=(e_ss, e_sc),
        # Z(0)=e_ca (k=0 rows only)
        h = carry[:6]
        d_ss = h[0][0:1, :] + h[2][0:1, :]
        d_sc = -h[1][0:1, :] + h[3][0:1, :]
        d_ca = h[4][0:1, :]
        for a, v in enumerate((carry[6], carry[7], carry[8], d_ss,
                               d_sc, d_ca, carry[9], carry[10])):
            dpar_ref[pl.ds(a, 1), :] = v


def _pick_tc_cpmg(nE: int, K: int) -> int:
    from mrphy_tpu.utils._shapes import largest_divisor_leq_pref
    bound = max(1, (14 << 20) // (6 * K * _BWD_TILE * 4))
    if nE <= bound:
        return nE
    return largest_divisor_leq_pref(nE, bound, _UNROLL)


def cpmg_bwd_is_available(*, nE: int, nA: int,
                          varint: bool = False) -> bool:
    K = nE + 1
    tc = _pick_tc_cpmg(nE, K)
    if nE % tc:
        return False
    ntc = nE // tc
    scr = tc * 6 * K * _BWD_TILE * 4
    ntiles = -(-nA // _BWD_TILE)
    chk = ntc * 6 * K * ntiles * _BWD_TILE * 4
    dcf = ntiles * nE * (6 if varint else 5) * _BWD_TILE * 4
    return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
            and dcf <= 2 * 1024 ** 3)


def _cpmg_pad(coef, pk, dq, tile):
    nA = pk.shape[1]
    pad = (-nA) % tile
    if pad:
        pk = jnp.pad(pk, [(0, 0), (0, pad)])
        dq = jnp.pad(dq, [(0, 0), (0, pad)])
    return coef, pk, dq, nA + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _cpmg_core(K, interpret, has_b1, varesp, has_d, coef, pk, dq):
    r"""Differentiable fused CPMG core (fast unchunked primal; under
    differentiation the chunked forward + the hand-transposed fused
    adjoint)."""
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512, -(-nA // _LANE) * _LANE)
    coef, pkp, dqp, nAp = _cpmg_pad(coef, pk, dq, tile)
    out = pl.BlockSpec((nE, tile), lambda i: (0, i))
    atom1 = pl.BlockSpec((1, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_cpmg_kernel, K, nE, has_b1, varesp,
                          has_d),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((7, tile), lambda i: (0, i)), atom1],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, pkp, dqp)
    return outr[:, :nA], outi[:, :nA]


def _cpmg_core_fwd(K, interpret, has_b1, varesp, has_d, coef, pk, dq):
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, dqp, nAp = _cpmg_pad(coef, pk, dq, tile)
    tc = _pick_tc_cpmg(nE, K)
    ntc = nE // tc
    atom = pl.BlockSpec((7, tile), lambda i, j: (0, i))
    atom1 = pl.BlockSpec((1, tile), lambda i, j: (0, i))
    out = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 6, K, tile), lambda i, j: (j, 0, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_cpmg_fwd_chk_kernel, K, tc, ntc, has_b1,
                          varesp, has_d),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), atom, atom1],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 6, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((6, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, dqp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, dq, chka)


def _cpmg_core_bwd(K, interpret, has_b1, varesp, has_d, res, g):
    coef, pk, dq, chka = res
    gr, gi = g
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    nC = 6 if varesp else 5
    coefp, pkp, dqp, nAp = _cpmg_pad(coef, pk, dq, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_cpmg(nE, K)
    ntc = nE // tc
    ntiles = nAp // tile
    atom = pl.BlockSpec((7, tile), lambda i, j: (0, i))
    atom1 = pl.BlockSpec((1, tile), lambda i, j: (0, i))
    gsp = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 6, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    dpar, dcf = pl.pallas_call(
        functools.partial(_cpmg_bwd_kernel, K, tc, ntc, has_b1,
                          varesp, has_d),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), atom, atom1,
                  chk, gsp, gsp],
        out_specs=[pl.BlockSpec((8, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, nC, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nE, nC, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 6, K, tile), jnp.float32),
                        pltpu.VMEM((6, K, tile), jnp.float32),
                        pltpu.VMEM((5, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, dqp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=(0, 3)).T              # (nC, nE)
    # dpar rows [dE1h, dE2h, drech, d_ss, d_sc, d_ca, db1, dDq] map
    # onto the pk rows [E1h, E2h, rech, e_ss, e_sc, e_ca, b1] + dq
    dDq = dpar[7:8, :nA]
    if not has_d:
        dDq = jnp.zeros_like(dDq)
    return dcoef, dpar[:7, :nA], dDq


_cpmg_core.defvjp(_cpmg_core_fwd, _cpmg_core_bwd)


# ==========================================================================
# In-kernel EPG-X adjoints (round 3): volume MWF / exchange-MRF fitting.
# Per-pool RF-mix and shift transposes reuse the SPGR helpers; the
# exchange-relaxation transpose multiplies cotangents by the CONJUGATE
# complex 2x2 on F+ (plain E on F-, real Z-transpose on Z) and
# accumulates the 12 propagator-entry + 2 recovery gradients per atom.
# ==========================================================================

def _x_pk(pk_ref):
    r"""Unpack the exchange-relaxation planes shared by both trains."""
    return tuple(pk_ref[k:k + 1, :] for k in range(14))


def _x_relax(xk, masks, s):
    r"""Exchange-relaxation over one interval (NO shift) — the linear
    part of the fused `half`/post-RF stage of the fwd kernels (kept in
    sync with ``_epgx_kernel``/``_xcpmg_kernel``)."""
    (E00r, E00i, E01r, E01i, E10r, E10i, E11r, E11i,
     Z00, Z01, Z10, Z11, ra, rb) = xk
    is0 = masks[0]
    (Par, Pai, Mar, Mai, Zar, Zai,
     Pbr, Pbi, Mbr, Mbi, Zbr, Zbi) = s
    P2ar = (E00r * Par - E00i * Pai) + (E01r * Pbr - E01i * Pbi)
    P2ai = (E00r * Pai + E00i * Par) + (E01r * Pbi + E01i * Pbr)
    P2br = (E10r * Par - E10i * Pai) + (E11r * Pbr - E11i * Pbi)
    P2bi = (E10r * Pai + E10i * Par) + (E11r * Pbi + E11i * Pbr)
    M2ar = (E00r * Mar + E00i * Mai) + (E01r * Mbr + E01i * Mbi)
    M2ai = (E00r * Mai - E00i * Mar) + (E01r * Mbi - E01i * Mbr)
    M2br = (E10r * Mar + E10i * Mai) + (E11r * Mbr + E11i * Mbi)
    M2bi = (E10r * Mai - E10i * Mar) + (E11r * Mbi - E11i * Mbr)
    Z2ar = Z00 * Zar + Z01 * Zbr
    Z2ai = Z00 * Zai + Z01 * Zbi
    Z2br = Z10 * Zar + Z11 * Zbr
    Z2bi = Z10 * Zai + Z11 * Zbi
    Z2ar = jnp.where(is0, Z2ar + ra, Z2ar)
    Z2br = jnp.where(is0, Z2br + rb, Z2br)
    return (P2ar, P2ai, M2ar, M2ai, Z2ar, Z2ai,
            P2br, P2bi, M2br, M2bi, Z2br, Z2bi)


def _x_shift(kshift, masks, s):
    r"""Per-pool spoiler shift on the F states (Z untouched)."""
    return (_spgr_shift_like(kshift, masks, s[:6])
            + _spgr_shift_like(kshift, masks, s[6:]))


def _spgr_shift_like(kshift, masks, s6):
    r"""The |kshift| unit shifts of ``_spgr_relax_shift`` without the
    relaxation (kept in sync)."""
    is0, islast, zero = masks
    K = zero.shape[0]
    Fpr, Fpi, Fmr, Fmi, Zr, Zi = s6
    for _ in range(abs(kshift)):
        if kshift > 0:
            Fpr = pltpu.roll(Fpr, 1, axis=0)
            Fpi = pltpu.roll(Fpi, 1, axis=0)
            Fmr = jnp.where(islast, zero,
                            pltpu.roll(Fmr, K - 1, axis=0))
            Fmi = jnp.where(islast, zero,
                            pltpu.roll(Fmi, K - 1, axis=0))
            Fpr = jnp.where(is0, Fmr[0:1, :], Fpr)
            Fpi = jnp.where(is0, -Fmi[0:1, :], Fpi)
        else:
            Fmr = pltpu.roll(Fmr, 1, axis=0)
            Fmi = pltpu.roll(Fmi, 1, axis=0)
            Fpr = jnp.where(islast, zero,
                            pltpu.roll(Fpr, K - 1, axis=0))
            Fpi = jnp.where(islast, zero,
                            pltpu.roll(Fpi, K - 1, axis=0))
            Fmr = jnp.where(is0, Fpr[0:1, :], Fmr)
            Fmi = jnp.where(is0, -Fpi[0:1, :], Fmi)
    return Fpr, Fpi, Fmr, Fmi, Zr, Zi


def _x_shift_T(kshift, masks, h):
    ha = _spgr_shift_T(kshift, masks, h[:6])
    hb = _spgr_shift_T(kshift, masks, h[6:])
    return ha + hb


def _x_mix(tg, s):
    return _spgr_mix(tg, s[:6]) + _spgr_mix(tg, s[6:])


def _x_mix_T(tg, h):
    return _spgr_mix_T(tg, h[:6]) + _spgr_mix_T(tg, h[6:])


def _ksum1(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _x_relax_rows(h, x):
    r"""The 14 per-atom entry gradients of :func:`_x_relax` as `(1, TA)`
    rows (order = the pk rows [E00r..E11i, Z00..Z11, ra, rb]),
    contracting the output cotangent ``h`` with the input state ``x``.
    Constant-interval adjoints accumulate them across the train
    (:func:`_x_relax_T`); variable-interval adjoints (round 5) emit
    them PER STEP so the per-step propagator construction can be
    chained outside the kernel by autodiff."""
    (hP2ar, hP2ai, hM2ar, hM2ai, hZ2ar, hZ2ai,
     hP2br, hP2bi, hM2br, hM2bi, hZ2br, hZ2bi) = h
    (Par, Pai, Mar, Mai, Zar, Zai,
     Pbr, Pbi, Mbr, Mbi, Zbr, Zbi) = x
    return (
        _ksum1(hP2ar * Par + hP2ai * Pai + hM2ar * Mar + hM2ai * Mai),
        _ksum1(-hP2ar * Pai + hP2ai * Par + hM2ar * Mai - hM2ai * Mar),
        _ksum1(hP2ar * Pbr + hP2ai * Pbi + hM2ar * Mbr + hM2ai * Mbi),
        _ksum1(-hP2ar * Pbi + hP2ai * Pbr + hM2ar * Mbi - hM2ai * Mbr),
        _ksum1(hP2br * Par + hP2bi * Pai + hM2br * Mar + hM2bi * Mai),
        _ksum1(-hP2br * Pai + hP2bi * Par + hM2br * Mai - hM2bi * Mar),
        _ksum1(hP2br * Pbr + hP2bi * Pbi + hM2br * Mbr + hM2bi * Mbi),
        _ksum1(-hP2br * Pbi + hP2bi * Pbr + hM2br * Mbi - hM2bi * Mbr),
        _ksum1(hZ2ar * Zar + hZ2ai * Zai),
        _ksum1(hZ2ar * Zbr + hZ2ai * Zbi),
        _ksum1(hZ2br * Zar + hZ2bi * Zai),
        _ksum1(hZ2br * Zbr + hZ2bi * Zbi),
        hZ2ar[0:1, :],
        hZ2br[0:1, :])


def _x_relax_T(xk, masks, h, x, acc):
    r"""Transpose of :func:`_x_relax` evaluated at its input ``x``;
    accumulates the 14 per-atom entry grads into ``acc`` (list order =
    the pk rows [E00r..E11i, Z00..Z11, ra, rb])."""
    rows = _x_relax_rows(h, x)
    for i in range(14):
        acc[i] = acc[i] + rows[i]
    return _x_relax_cot(xk, h), acc


def _x_relax_cot(xk, h):
    r"""Input cotangents of :func:`_x_relax`: conj(E)^T on F+, E^T on
    F- (the forward conjugates there), Z^T on Z."""
    (E00r, E00i, E01r, E01i, E10r, E10i, E11r, E11i,
     Z00, Z01, Z10, Z11, ra, rb) = xk
    (hP2ar, hP2ai, hM2ar, hM2ai, hZ2ar, hZ2ai,
     hP2br, hP2bi, hM2br, hM2bi, hZ2br, hZ2bi) = h
    hPar = (E00r * hP2ar + E00i * hP2ai
            + E10r * hP2br + E10i * hP2bi)
    hPai = (-E00i * hP2ar + E00r * hP2ai
            - E10i * hP2br + E10r * hP2bi)
    hPbr = (E01r * hP2ar + E01i * hP2ai
            + E11r * hP2br + E11i * hP2bi)
    hPbi = (-E01i * hP2ar + E01r * hP2ai
            - E11i * hP2br + E11r * hP2bi)
    hMar = (E00r * hM2ar - E00i * hM2ai
            + E10r * hM2br - E10i * hM2bi)
    hMai = (E00i * hM2ar + E00r * hM2ai
            + E10i * hM2br + E10r * hM2bi)
    hMbr = (E01r * hM2ar - E01i * hM2ai
            + E11r * hM2br - E11i * hM2bi)
    hMbi = (E01i * hM2ar + E01r * hM2ai
            + E11i * hM2br + E11r * hM2bi)
    hZar = Z00 * hZ2ar + Z10 * hZ2br
    hZai = Z00 * hZ2ai + Z10 * hZ2bi
    hZbr = Z01 * hZ2ar + Z11 * hZ2br
    hZbi = Z01 * hZ2ai + Z11 * hZ2bi
    return (hPar, hPai, hMar, hMai, hZar, hZai,
            hPbr, hPbi, hMbr, hMbi, hZbr, hZbi)


def _x_mix_coef_grads(tg, h, x):
    r"""Per-TR coefficient gradients of the per-pool RF mix: the SPGR
    contraction formulas summed over both pools. Returns the 8
    composite grads (d_ca2, d_sc2, d_ss2, d_ss, d_sc, d_hs, d_hc,
    d_ca) as (1, TA) rows."""
    outs = []
    for h6, x6 in ((h[:6], x[:6]), (h[6:], x[6:])):
        h1Fpr, h1Fpi, h1Fmr, h1Fmi, h1Zr, h1Zi = h6
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = x6
        d = (_ksum1(h1Fpr * Fpr + h1Fpi * Fpi
                    + h1Fmr * Fmr + h1Fmi * Fmi),
             _ksum1(h1Fpr * Fmr + h1Fpi * Fmi
                    + h1Fmr * Fpr + h1Fmi * Fpi),
             _ksum1(-h1Fpr * Fmi + h1Fpi * Fmr
                    + h1Fmr * Fpi - h1Fmi * Fpr),
             _ksum1((h1Fpr + h1Fmr) * Zr + (h1Fpi + h1Fmi) * Zi),
             _ksum1((h1Fpr - h1Fmr) * Zi - (h1Fpi - h1Fmi) * Zr),
             _ksum1(-h1Zr * (Fpr + Fmr) - h1Zi * (Fpi + Fmi)),
             _ksum1(h1Zr * (Fpi - Fmi) + h1Zi * (Fmr - Fpr)),
             _ksum1(h1Zr * Zr + h1Zi * Zi))
        outs.append(d)
    return tuple(a + b for a, b in zip(*outs))


def _xspgr_trig(coef_ref, t, b1, has_b1):
    if has_b1:
        ah = (0.5 * coef_ref[8, t]) * b1
        ch, sh = jnp.cos(ah), jnp.sin(ah)
        ca2, sa2 = ch * ch, sh * sh
        sa, ca = 2 * ch * sh, ca2 - sa2
    else:
        ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
        sa, ca = coef_ref[2, t], coef_ref[3, t]
    return (ca2, sa2, sa, ca, coef_ref[4, t], coef_ref[5, t],
            coef_ref[6, t], coef_ref[7, t])


def _xspgr_fwd_chk_kernel(K: int, tc: int, ntc: int, kshift: int,
                          has_b1: bool, coef_ref, pk_ref, outr_ref,
                          outi_ref, chk_ref, s_scr):
    r"""Chunked EPG-X SPGR forward for the VJP path (echo math matches
    ``_epgx_kernel``: RF -> demodulated total F+(0) -> exchange-relax
    -> shift)."""
    TA = pk_ref.shape[1]
    xk = _x_pk(pk_ref)
    M0a, M0b = pk_ref[14:15, :], pk_ref[15:16, :]
    b1 = pk_ref[16:17, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        init = (zero, zero, zero, zero,
                jnp.where(is0, M0a, zero), zero,
                zero, zero, zero, zero,
                jnp.where(is0, M0b, zero), zero)
        for p, v in enumerate(init):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(12))
    for p in range(12):
        chk_ref[0, p] = s[p]

    def step(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        s1 = _x_mix(tg, s)
        c1, s1c = tg[4], tg[5]
        fr = s1[0][0:1, :] + s1[6][0:1, :]
        fi = s1[1][0:1, :] + s1[7][0:1, :]
        outr_ref[pl.ds(t, 1), :] = c1 * fr + s1c * fi
        outi_ref[pl.ds(t, 1), :] = c1 * fi - s1c * fr
        return _x_shift(kshift, masks, _x_relax(xk, masks, s1))

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            s = step(t0 + k * u + jj, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(12):
        s_scr[p] = s[p]


def _xspgr_bwd_kernel(K: int, tc: int, ntc: int, kshift: int,
                      has_b1: bool, coef_ref, pk_ref, chk_ref, gr_ref,
                      gi_ref, dpar_ref, dcf_ref, s_scr, h_scr,
                      acc_scr):
    r"""Two-phase chunk adjoint for the EPG-X SPGR train. ``dpar``
    rows map 1:1 onto the pk rows [E00r..E11i, Z00..Z11, ra, rb, M0a,
    M0b, b1]; ``dcf`` `(tc, 9, TA)` lane-partials as in SPGR."""
    TA = pk_ref.shape[1]
    xk = _x_pk(pk_ref)
    b1 = pk_ref[16:17, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc
    N_ACC = 15                # 14 relax entries + db1

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), gr_ref.dtype)
        for a in range(N_ACC):
            acc_scr[a] = z1
        for p in range(12):
            h_scr[p] = masks[2]

    def fstep(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        return _x_shift(kshift, masks,
                        _x_relax(xk, masks, _x_mix(tg, s)))

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(12):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(12)))

    def bstep(t, tl, carry):
        h = carry[:12]
        acc = list(carry[12:])
        s = tuple(s_scr[tl, p] for p in range(12))
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        s1 = _x_mix(tg, s)

        for _ in range(abs(kshift)):
            h = _x_shift_T(kshift, masks, h)
        h, acc14 = _x_relax_T(xk, masks, h, s1, acc[:14])
        acc = acc14 + acc[14:]

        # echo: demodulated TOTAL F+(0) of the post-RF state
        c1, s1c = tg[4], tg[5]
        gyr, gyi = gr_ref[pl.ds(t, 1), :], gi_ref[pl.ds(t, 1), :]
        er = c1 * gyr - s1c * gyi
        ei = s1c * gyr + c1 * gyi
        h = (jnp.where(is0, h[0] + er, h[0]),
             jnp.where(is0, h[1] + ei, h[1])) + h[2:6] \
            + (jnp.where(is0, h[6] + er, h[6]),
               jnp.where(is0, h[7] + ei, h[7])) + h[8:]
        fr = s1[0][0:1, :] + s1[6][0:1, :]
        fi = s1[1][0:1, :] + s1[7][0:1, :]
        d_c1e = gyr * fr + gyi * fi
        d_s1e = gyr * fi - gyi * fr

        ca2, sa2, sa, ca, c1, s1c, c2, s2 = tg
        (d_ca2, d_sc2, d_ss2, d_ss, d_sc, d_hs, d_hc,
         d_ca) = _x_mix_coef_grads(tg, h, s)
        d_sa2 = c2 * d_sc2 + s2 * d_ss2
        d_c2 = sa2 * d_sc2
        d_s2 = sa2 * d_ss2
        d_sa = s1c * (d_ss + 0.5 * d_hs) + c1 * (d_sc + 0.5 * d_hc)
        d_s1 = sa * (d_ss + 0.5 * d_hs) + d_s1e
        d_c1 = sa * (d_sc + 0.5 * d_hc) + d_c1e

        zrow = jnp.zeros((1, TA), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            acc[14] = acc[14] + d_al * coef_ref[8, t]
            rows = (zrow, zrow, zrow, zrow, d_c1, d_s1, d_c2, d_s2,
                    d_al * b1)
        else:
            rows = (d_ca2, d_sa2, d_sa, d_ca, d_c1, d_s1, d_c2, d_s2,
                    zrow)
        for c in range(9):
            dcf_ref[0, tl, c] = rows[c][0]

        h = _x_mix_T(tg, h)
        return h + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(12))
        + tuple(acc_scr[a] for a in range(N_ACC)))
    for p in range(12):
        h_scr[p] = carry[p]
    for a in range(N_ACC):
        acc_scr[a] = carry[12 + a]

    @pl.when(j == ntc - 1)
    def _():
        acc = carry[12:]
        dM0a = carry[4][0:1, :]            # init Za(0) = M0a
        dM0b = carry[10][0:1, :]           # init Zb(0) = M0b
        for a in range(14):
            dpar_ref[pl.ds(a, 1), :] = acc[a]
        dpar_ref[pl.ds(14, 1), :] = dM0a
        dpar_ref[pl.ds(15, 1), :] = dM0b
        dpar_ref[pl.ds(16, 1), :] = acc[14]


def _pick_tc_x(nT: int, K: int) -> int:
    from mrphy_tpu.utils._shapes import largest_divisor_leq_pref
    bound = max(1, (14 << 20) // (12 * K * _BWD_TILE * 4))
    if nT <= bound:
        return nT
    return largest_divisor_leq_pref(nT, bound, _UNROLL)


def xspgr_bwd_is_available(*, nTR: int, K: int, nA: int,
                           varint: bool = False) -> bool:
    tc = _pick_tc_x(nTR, K)
    if nTR % tc:
        return False
    ntc = nTR // tc
    scr = tc * 12 * K * _BWD_TILE * 4
    ntiles = -(-nA // _BWD_TILE)
    chk = ntc * 12 * K * ntiles * _BWD_TILE * 4
    dcf = ntiles * nTR * 9 * _BWD_TILE * 4
    if varint:
        # the per-step entry-cotangent planes (round 5); the varint
        # dcf is SMEM-scalar-reduced so dpkt is the only per-atom
        # time-resolved output (1.5 GB at the canonical 64k x 400)
        dcf = ntiles * nTR * 14 * _BWD_TILE * 4
        return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
                and dcf <= 4 * 1024 ** 3)
    return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
            and dcf <= 2 * 1024 ** 3)


def _xspgr_pad(coef, pk, tile):
    nA = pk.shape[1]
    pad = (-nA) % tile
    if pad:
        pk = jnp.pad(pk, [(0, 0), (0, pad)])
    return coef, pk, nA + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _xspgr_core(K, kshift, interpret, has_b1, coef, pk):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512, -(-nA // _LANE) * _LANE)
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    out = pl.BlockSpec((nTR, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_epgx_kernel, K, nTR, kshift, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((17, tile), lambda i: (0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return outr[:, :nA], outi[:, :nA]


def _xspgr_core_fwd(K, kshift, interpret, has_b1, coef, pk):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    tc = _pick_tc_x(nTR, K)
    ntc = nTR // tc
    out = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile), lambda i, j: (j, 0, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_xspgr_fwd_chk_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((17, tile), lambda i, j: (0, i))],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 12, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((12, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, chka)


def _xspgr_core_bwd(K, kshift, interpret, has_b1, res, g):
    coef, pk, chka = res
    gr, gi = g
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_x(nTR, K)
    ntc = nTR // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile),
                      lambda i, j: (ntc - 1 - j, 0, 0, i))
    dpar, dcf = pl.pallas_call(
        functools.partial(_xspgr_bwd_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((17, tile), lambda i, j: (0, i)),
                  chk, gsp, gsp],
        out_specs=[pl.BlockSpec((17, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 9, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((17, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 9, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 12, K, tile), jnp.float32),
                        pltpu.VMEM((12, K, tile), jnp.float32),
                        pltpu.VMEM((15, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=(0, 3)).T              # (9, nTR)
    return dcoef, dpar[:, :nA]


_xspgr_core.defvjp(_xspgr_core_fwd, _xspgr_core_bwd)


# ==========================================================================
# Variable-interval two-pool trains (round 5): the per-step exchange-
# relaxation propagators are precomputed by the dispatcher with the SAME
# closed-form 2x2 expm helpers the XLA scan uses, streamed into the
# kernel as a (nT, 14, tile) HBM plane stack (~5% of the state traffic
# the XLA scan round-trips), and the in-kernel adjoint emits the 14
# entry-cotangent rows PER STEP so plain autodiff chains them back to
# the tissue/exchange rates AND the interval train outside the kernel.
# This closes the round-4 gap where `(nTR,)` TR / `(nEcho,)` esp trains
# silently fell off the fused path (17-31x slower XLA scan) for the
# two-pool families. Ref anchor: the explicit-adjoint philosophy of
# /root/reference/mrphy/sims.py:195-261, extended to EPG-X.
# ==========================================================================

def _x_step_entries(T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb,
                    taus):
    r"""Per-step exchange-relaxation propagator planes `(nT, 14, nA)`
    (rows [E00r..E11i, Z00..Z11, ra, rb]) over the interval train
    ``taus`` `(nT,)` — vmapped closed forms shared with
    :func:`mrphy_tpu.ops.epg.epgx_relax` (exact for any interval)."""
    from mrphy_tpu import pi
    from mrphy_tpu.ops.epg import _expm2c, _z_recovery
    from mrphy_tpu.ops.slowsims import _expm2
    w = 2 * pi * dfb

    def mk(tau):
        E00, E01, E10, E11 = _expm2c(
            (-1 / T2a - kab) * tau, jnp.zeros_like(T2a * tau),
            kba * tau, kab * tau, (-1 / T2b - kba) * tau, -w * tau)
        Z00, Z01, Z10, Z11 = _expm2(
            (-1 / T1a - kab) * tau, kba * tau,
            kab * tau, (-1 / T1b - kba) * tau)
        ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                             M0a, M0b)
        return jnp.stack([E00[0], E00[1], E01[0], E01[1],
                          E10[0], E10[1], E11[0], E11[1],
                          Z00, Z01, Z10, Z11, ra, rb])   # (14, nA)

    return jax.vmap(mk)(taus)                            # (nT, 14, nA)


def _xv_pk3(pk_ref):
    r"""Unpack the 3 per-atom non-interval rows [M0a, M0b, b1]."""
    return pk_ref[0:1, :], pk_ref[1:2, :], pk_ref[2:3, :]


def _xv_xk(pkt_ref, tl):
    r"""This step's 14 propagator rows: ONE dynamic-sublane load of the
    `(14, tile)` slab, then static row slices (dynamic leading-dim
    indexing is the s_scr pattern Mosaic supports; per-row dynamic
    loads would be 14 of them)."""
    slab = pkt_ref[tl]
    return tuple(slab[i:i + 1, :] for i in range(14))


def _epgx_v_kernel(K: int, nTR: int, kshift: int, has_b1: bool,
                   coef_ref, pk_ref, pkt_ref, outr_ref, outi_ref):
    r"""Variable-interval two-pool SPGR tile: :func:`_epgx_kernel` with
    the propagator entries read per step from the streamed plane
    stack."""
    TA = pk_ref.shape[1]
    M0a, M0b, b1 = _xv_pk3(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks

    def step(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        s1 = _x_mix(tg, s)
        c1, s1c = tg[4], tg[5]
        fr = s1[0][0:1, :] + s1[6][0:1, :]
        fi = s1[1][0:1, :] + s1[7][0:1, :]
        outr_ref[pl.ds(t, 1), :] = c1 * fr + s1c * fi
        outi_ref[pl.ds(t, 1), :] = c1 * fi - s1c * fr
        xk = _xv_xk(pkt_ref, t)
        return _x_shift(kshift, masks, _x_relax(xk, masks, s1))

    u = math.gcd(nTR, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    init = (zero, zero, zero, zero, jnp.where(is0, M0a, zero), zero,
            zero, zero, zero, zero, jnp.where(is0, M0b, zero), zero)
    jax.lax.fori_loop(0, nTR // u, body, init)


def _xv_fwd_chk_kernel(K: int, tc: int, ntc: int, kshift: int,
                       has_b1: bool, coef_ref, pk_ref, pkt_ref,
                       outr_ref, outi_ref, chk_ref, s_scr):
    r"""Chunked variable-interval EPG-X SPGR forward for the VJP path
    (pkt blocked per time chunk — local index ``tl``)."""
    TA = pk_ref.shape[1]
    M0a, M0b, b1 = _xv_pk3(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        init = (zero, zero, zero, zero,
                jnp.where(is0, M0a, zero), zero,
                zero, zero, zero, zero,
                jnp.where(is0, M0b, zero), zero)
        for p, v in enumerate(init):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(12))
    for p in range(12):
        chk_ref[0, p] = s[p]

    def step(t, tl, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        s1 = _x_mix(tg, s)
        c1, s1c = tg[4], tg[5]
        fr = s1[0][0:1, :] + s1[6][0:1, :]
        fi = s1[1][0:1, :] + s1[7][0:1, :]
        outr_ref[pl.ds(t, 1), :] = c1 * fr + s1c * fi
        outi_ref[pl.ds(t, 1), :] = c1 * fi - s1c * fr
        xk = _xv_xk(pkt_ref, tl)
        return _x_shift(kshift, masks, _x_relax(xk, masks, s1))

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            tl = k * u + jj
            s = step(t0 + tl, tl, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(12):
        s_scr[p] = s[p]


def _xv_bwd_kernel(K: int, tc: int, ntc: int, kshift: int,
                   has_b1: bool, coef_ref, pk_ref, pkt_ref, chk_ref,
                   gr_ref, gi_ref, dpar_ref, dcf_ref, dpkt_ref,
                   s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the variable-interval EPG-X SPGR
    train. Identical recursion to :func:`_xspgr_bwd_kernel` except the
    14 propagator-entry grads are EMITTED per step (``dpkt``
    `(1, tc, 14, tile)` blocks) instead of accumulated — autodiff
    chains them to the rates/interval train outside. ``dpar`` `(3,
    TA)` = [dM0a(init), dM0b(init), db1]; ``dcf`` `(tc, 9)` is
    SMEM-scalar-reduced in-kernel (the coefficient rows are shared
    train quantities, reduced over atoms afterwards anyway — keeping
    them lane-resolved would double this path's HBM output on top of
    the unavoidable per-atom ``dpkt``)."""
    TA = pk_ref.shape[1]
    b1 = _xv_pk3(pk_ref)[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc

    @pl.when(j == 0)
    def _():
        acc_scr[0] = jnp.zeros((1, TA), gr_ref.dtype)
        for p in range(12):
            h_scr[p] = masks[2]

    def fstep(t, tl, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        xk = _xv_xk(pkt_ref, tl)
        return _x_shift(kshift, masks,
                        _x_relax(xk, masks, _x_mix(tg, s)))

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(12):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(12)))

    def bstep(t, tl, carry):
        h = carry[:12]
        ab1 = carry[12]
        s = tuple(s_scr[tl, p] for p in range(12))
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        s1 = _x_mix(tg, s)

        for _ in range(abs(kshift)):
            h = _x_shift_T(kshift, masks, h)
        rows14 = _x_relax_rows(h, s1)
        for i in range(14):
            dpkt_ref[0, tl, i] = rows14[i][0]
        xk = _xv_xk(pkt_ref, tl)
        h = _x_relax_cot(xk, h)

        # echo: demodulated TOTAL F+(0) of the post-RF state
        c1, s1c = tg[4], tg[5]
        gyr, gyi = gr_ref[pl.ds(t, 1), :], gi_ref[pl.ds(t, 1), :]
        er = c1 * gyr - s1c * gyi
        ei = s1c * gyr + c1 * gyi
        h = (jnp.where(is0, h[0] + er, h[0]),
             jnp.where(is0, h[1] + ei, h[1])) + h[2:6] \
            + (jnp.where(is0, h[6] + er, h[6]),
               jnp.where(is0, h[7] + ei, h[7])) + h[8:]
        fr = s1[0][0:1, :] + s1[6][0:1, :]
        fi = s1[1][0:1, :] + s1[7][0:1, :]
        d_c1e = gyr * fr + gyi * fi
        d_s1e = gyr * fi - gyi * fr

        ca2, sa2, sa, ca, c1, s1c, c2, s2 = tg
        (d_ca2, d_sc2, d_ss2, d_ss, d_sc, d_hs, d_hc,
         d_ca) = _x_mix_coef_grads(tg, h, s)
        d_sa2 = c2 * d_sc2 + s2 * d_ss2
        d_c2 = sa2 * d_sc2
        d_s2 = sa2 * d_ss2
        d_sa = s1c * (d_ss + 0.5 * d_hs) + c1 * (d_sc + 0.5 * d_hc)
        d_s1 = sa * (d_ss + 0.5 * d_hs) + d_s1e
        d_c1 = sa * (d_sc + 0.5 * d_hc) + d_c1e

        zs = jnp.zeros((), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            ab1 = ab1 + d_al * coef_ref[8, t]
            rows = (zs, zs, zs, zs, jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2), jnp.sum(d_al * b1))
        else:
            rows = (jnp.sum(d_ca2), jnp.sum(d_sa2), jnp.sum(d_sa),
                    jnp.sum(d_ca), jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2), zs)
        for c in range(9):
            dcf_ref[0, tl, c] = rows[c]

        h = _x_mix_T(tg, h)
        return h + (ab1,)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(12)) + (acc_scr[0],))
    for p in range(12):
        h_scr[p] = carry[p]
    acc_scr[0] = carry[12]

    @pl.when(j == ntc - 1)
    def _():
        # init-state cotangents: Za(0) = M0a, Zb(0) = M0b on k=0 (the
        # recovery-path dM0 chains through the ra/rb pkt rows outside)
        dpar_ref[pl.ds(0, 1), :] = carry[4][0:1, :]
        dpar_ref[pl.ds(1, 1), :] = carry[10][0:1, :]
        dpar_ref[pl.ds(2, 1), :] = carry[12]


def _xv_pad(coef, pk, pkt, tile):
    nA = pk.shape[1]
    pad = (-nA) % tile
    if pad:
        pk = jnp.pad(pk, [(0, 0), (0, pad)])
        pkt = jnp.pad(pkt, [(0, 0), (0, 0), (0, pad)])
    return coef, pk, pkt, nA + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _xspgr_core_v(K, kshift, interpret, has_b1, coef, pk, pkt):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512 if nTR <= 512 else 256, -(-nA // _LANE) * _LANE)
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    out = pl.BlockSpec((nTR, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_epgx_v_kernel, K, nTR, kshift, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, tile), lambda i: (0, i)),
                  pl.BlockSpec((nTR, 14, tile), lambda i: (0, 0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return outr[:, :nA], outi[:, :nA]


def _xspgr_core_v_fwd(K, kshift, interpret, has_b1, coef, pk, pkt):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    tc = _pick_tc_x(nTR, K)
    ntc = nTR // tc
    out = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile), lambda i, j: (j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 14, tile), lambda i, j: (j, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_xv_fwd_chk_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, tile), lambda i, j: (0, i)),
                  pkts],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 12, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((12, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, pkt, chka)


def _xspgr_core_v_bwd(K, kshift, interpret, has_b1, res, g):
    coef, pk, pkt, chka = res
    gr, gi = g
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_x(nTR, K)
    ntc = nTR // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 14, tile),
                        lambda i, j: (ntc - 1 - j, 0, i))
    dpar, dcf, dpkt = pl.pallas_call(
        functools.partial(_xv_bwd_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, tile), lambda i, j: (0, i)),
                  pkts, chk, gsp, gsp],
        out_specs=[pl.BlockSpec((3, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 9),
                                lambda i, j: (i, ntc - 1 - j, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, tc, 14, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((3, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 9),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 14, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 12, K, tile), jnp.float32),
                        pltpu.VMEM((12, K, tile), jnp.float32),
                        pltpu.VMEM((1, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=0).T                   # (9, nTR)
    dpkt = jnp.moveaxis(dpkt, 0, 2).reshape(nTR, 14, nAp)
    return dcoef, dpar[:, :nA], dpkt[:, :, :nA]


_xspgr_core_v.defvjp(_xspgr_core_v_fwd, _xspgr_core_v_bwd)


@functools.partial(jax.jit, static_argnames=('K', 'kshift',
                                             'interpret', 'has_b1'))
def _epgx_v_dispatch(flips, phis, T1a, T2a, T1b, T2b, kab, kba, trs,
                     M0a, M0b, dfb, b1, *, K: int, kshift: int,
                     interpret: bool, has_b1: bool):
    nTR = flips.shape[0]
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips, phis = flips.astype(f32), phis.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      jnp.cos(phis), jnp.sin(phis),
                      jnp.cos(2 * phis), jnp.sin(2 * phis),
                      flips])                                 # (9, nTR)
    # per-step propagator planes; jax.checkpoint keeps the autodiff
    # chain pkt -> (rates, trs) residual-free (recomputed in reverse)
    pkt = jax.checkpoint(_x_step_entries)(
        T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb,
        trs.astype(f32)).astype(f32)                  # (nTR, 14, nA)
    pk = jnp.stack([jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32),
                                     (nA,))]).astype(f32)
    outr, outi = _xspgr_core_v(K, kshift, interpret, has_b1, coef,
                               pk, pkt)
    return jnp.stack([outr, outi], -1)               # (nTR, nA, 2)


def _xcpmg_trig(coef_ref, t, b1, has_b1):
    if has_b1:
        ah = (0.5 * coef_ref[4, t]) * b1
        ch, sh = jnp.cos(ah), jnp.sin(ah)
        ca2, sa2 = ch * ch, sh * sh
        sa, ca = 2 * ch * sh, ca2 - sa2
    else:
        ca2, sa2 = coef_ref[0, t], coef_ref[1, t]
        sa, ca = coef_ref[2, t], coef_ref[3, t]
    return (ca2, sa2, sa, ca, 1.0, 0.0, 1.0, 0.0)


def _xcpmg_init(masks, pk_ref):
    r"""π/2 excitation about φ_ex on the two-pool equilibrium (matches
    ``_xcpmg_kernel``): F± = (sinφ ∓ i·cosφ)·M0p, Z = 0 per pool."""
    is0, _, zero = masks
    exc, exs = pk_ref[14:15, :], pk_ref[15:16, :]
    M0a, M0b = pk_ref[16:17, :], pk_ref[17:18, :]
    return (jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, -exc * M0a, zero),
            jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, exc * M0a, zero), zero, zero,
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, -exc * M0b, zero),
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, exc * M0b, zero), zero, zero)


def _xcpmg_fwd_chk_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                          coef_ref, pk_ref, outr_ref, outi_ref,
                          chk_ref, s_scr):
    r"""Chunked two-pool CPMG forward for the VJP path (echo math
    matches ``_xcpmg_kernel``)."""
    TA = pk_ref.shape[1]
    xk = _x_pk(pk_ref)
    b1 = pk_ref[18:19, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        for p, v in enumerate(_xcpmg_init(masks, pk_ref)):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(12))
    for p in range(12):
        chk_ref[0, p] = s[p]

    def half(s):
        return _x_shift(1, masks, _x_relax(xk, masks, s))

    def step(t, s):
        s = half(s)
        s = _x_mix(_xcpmg_trig(coef_ref, t, b1, has_b1), s)
        s = half(s)
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :] + s[6][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :] + s[7][0:1, :]
        return s

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            s = step(t0 + k * u + jj, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(12):
        s_scr[p] = s[p]


def _xcpmg_bwd_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                      coef_ref, pk_ref, chk_ref, gr_ref, gi_ref,
                      dpar_ref, dcf_ref, s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the two-pool CPMG train. ``dpar``
    rows map 1:1 onto the pk rows [E00r..E11i, Z00..Z11, ra, rb, exc,
    exs, M0a, M0b, b1]; ``dcf`` `(tc, 5, TA)` lane-partials."""
    TA = pk_ref.shape[1]
    xk = _x_pk(pk_ref)
    b1 = pk_ref[18:19, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc
    N_ACC = 15                 # 14 relax entries + db1

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), gr_ref.dtype)
        for a in range(N_ACC):
            acc_scr[a] = z1
        for p in range(12):
            h_scr[p] = masks[2]

    def half(s):
        return _x_shift(1, masks, _x_relax(xk, masks, s))

    def fstep(t, s):
        s = half(s)
        s = _x_mix(_xcpmg_trig(coef_ref, t, b1, has_b1), s)
        return half(s)

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(12):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(12)))

    def bstep(t, tl, carry):
        h = carry[:12]
        acc = list(carry[12:])
        s = tuple(s_scr[tl, p] for p in range(12))
        tg = _xcpmg_trig(coef_ref, t, b1, has_b1)
        sh1 = half(s)
        s1 = _x_mix(tg, sh1)

        # echo (total F+(0) after the 2nd half, no demod)
        h = (jnp.where(is0, h[0] + gr_ref[pl.ds(t, 1), :], h[0]),
             jnp.where(is0, h[1] + gi_ref[pl.ds(t, 1), :], h[1])) \
            + h[2:6] \
            + (jnp.where(is0, h[6] + gr_ref[pl.ds(t, 1), :], h[6]),
               jnp.where(is0, h[7] + gi_ref[pl.ds(t, 1), :],
                         h[7])) \
            + h[8:]

        # 2nd half transpose (shift-T then relax-T at input s1)
        h = _x_shift_T(1, masks, h)
        h, acc14 = _x_relax_T(xk, masks, h, s1, acc[:14])
        acc = acc14 + acc[14:]

        # refocusing mix transpose + flip grads (phi = 0 chain)
        ca2, sa2, sa, ca = tg[0], tg[1], tg[2], tg[3]
        (d_ca2, d_sc2, _, _, d_sc, _, d_hc,
         d_ca) = _x_mix_coef_grads(tg, h, sh1)
        d_sa2 = d_sc2
        d_sa = d_sc + 0.5 * d_hc

        zrow = jnp.zeros((1, TA), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            acc[14] = acc[14] + d_al * coef_ref[4, t]
            rows = (zrow, zrow, zrow, zrow, d_al * b1)
        else:
            rows = (d_ca2, d_sa2, d_sa, d_ca, zrow)
        for c in range(5):
            dcf_ref[0, tl, c] = rows[c][0]

        h = _x_mix_T(tg, h)

        # 1st half transpose (input = stored pre-echo state)
        h = _x_shift_T(1, masks, h)
        h, acc14 = _x_relax_T(xk, masks, h, s, acc[:14])
        acc = acc14 + acc[14:]
        return h + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(12))
        + tuple(acc_scr[a] for a in range(N_ACC)))
    for p in range(12):
        h_scr[p] = carry[p]
    for a in range(N_ACC):
        acc_scr[a] = carry[12 + a]

    @pl.when(j == ntc - 1)
    def _():
        acc = carry[12:]
        h = carry[:12]
        exc, exs = pk_ref[14:15, :], pk_ref[15:16, :]
        M0a, M0b = pk_ref[16:17, :], pk_ref[17:18, :]
        hPar0, hPai0 = h[0][0:1, :], h[1][0:1, :]
        hMar0, hMai0 = h[2][0:1, :], h[3][0:1, :]
        hPbr0, hPbi0 = h[6][0:1, :], h[7][0:1, :]
        hMbr0, hMbi0 = h[8][0:1, :], h[9][0:1, :]
        ra_ = hPar0 + hMar0
        ia_ = -hPai0 + hMai0
        rb_ = hPbr0 + hMbr0
        ib_ = -hPbi0 + hMbi0
        for a in range(14):
            dpar_ref[pl.ds(a, 1), :] = acc[a]
        dpar_ref[pl.ds(14, 1), :] = M0a * ia_ + M0b * ib_   # d exc
        dpar_ref[pl.ds(15, 1), :] = M0a * ra_ + M0b * rb_   # d exs
        dpar_ref[pl.ds(16, 1), :] = exs * ra_ + exc * ia_   # d M0a
        dpar_ref[pl.ds(17, 1), :] = exs * rb_ + exc * ib_   # d M0b
        dpar_ref[pl.ds(18, 1), :] = acc[14]                 # d b1


def xcpmg_bwd_is_available(*, nE: int, nA: int,
                           varint: bool = False) -> bool:
    K = nE + 1
    tc = _pick_tc_x(nE, K)
    if nE % tc:
        return False
    ntc = nE // tc
    scr = tc * 12 * K * _BWD_TILE * 4
    ntiles = -(-nA // _BWD_TILE)
    chk = ntc * 12 * K * ntiles * _BWD_TILE * 4
    dcf = ntiles * nE * 5 * _BWD_TILE * 4
    if varint:
        # per-echo entry-cotangent planes (round 5); the varesp dcf
        # is SMEM-scalar-reduced so dpkt is the only per-atom
        # time-resolved output
        dcf = ntiles * nE * 14 * _BWD_TILE * 4
        return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
                and dcf <= 4 * 1024 ** 3)
    return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
            and dcf <= 2 * 1024 ** 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _xcpmg_core(K, interpret, has_b1, coef, pk):
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512, -(-nA // _LANE) * _LANE)
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    out = pl.BlockSpec((nE, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_xcpmg_kernel, K, nE, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((19, tile), lambda i: (0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return outr[:, :nA], outi[:, :nA]


def _xcpmg_core_fwd(K, interpret, has_b1, coef, pk):
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    tc = _pick_tc_x(nE, K)
    ntc = nE // tc
    out = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile), lambda i, j: (j, 0, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_xcpmg_fwd_chk_kernel, K, tc, ntc, has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((19, tile), lambda i, j: (0, i))],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 12, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((12, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, chka)


def _xcpmg_core_bwd(K, interpret, has_b1, res, g):
    coef, pk, chka = res
    gr, gi = g
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_x(nE, K)
    ntc = nE // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    dpar, dcf = pl.pallas_call(
        functools.partial(_xcpmg_bwd_kernel, K, tc, ntc, has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((19, tile), lambda i, j: (0, i)),
                  chk, gsp, gsp],
        out_specs=[pl.BlockSpec((19, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 5, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((19, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nE, 5, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 12, K, tile), jnp.float32),
                        pltpu.VMEM((12, K, tile), jnp.float32),
                        pltpu.VMEM((15, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=(0, 3)).T              # (5, nE)
    return dcoef, dpar[:, :nA]


_xcpmg_core.defvjp(_xcpmg_core_fwd, _xcpmg_core_bwd)


# ==========================================================================
# Variable-echo-spacing two-pool CPMG (round 5): per-step propagator
# planes at esp_t/2 streamed per chunk (both halves of echo t share the
# same entries); the adjoint emits the SUMMED two-half entry-cotangent
# rows per step and autodiff chains them to rates + the esp train
# outside — same design as the variable-TR EPG-X SPGR above.
# ==========================================================================

def _xcv_pk5(pk_ref):
    r"""Unpack the 5 per-atom non-interval rows
    [exc, exs, M0a, M0b, b1]."""
    return tuple(pk_ref[k:k + 1, :] for k in range(5))


def _xcv_init(masks, pk_ref):
    r"""π/2 excitation about φ_ex on the two-pool equilibrium (the
    varesp-row layout of :func:`_xcpmg_init`)."""
    is0, _, zero = masks
    exc, exs, M0a, M0b, _ = _xcv_pk5(pk_ref)
    return (jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, -exc * M0a, zero),
            jnp.where(is0, exs * M0a, zero),
            jnp.where(is0, exc * M0a, zero), zero, zero,
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, -exc * M0b, zero),
            jnp.where(is0, exs * M0b, zero),
            jnp.where(is0, exc * M0b, zero), zero, zero)


def _xcpmg_v_kernel(K: int, nE: int, has_b1: bool, coef_ref, pk_ref,
                    pkt_ref, outr_ref, outi_ref):
    r"""Variable-spacing two-pool CPMG tile: :func:`_xcpmg_kernel`
    with per-echo propagator entries (at esp_t/2) read from the
    streamed plane stack."""
    TA = pk_ref.shape[1]
    b1 = _xcv_pk5(pk_ref)[4]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))

    def step(t, s):
        xk = _xv_xk(pkt_ref, t)

        def half(s):
            return _x_shift(1, masks, _x_relax(xk, masks, s))

        s = half(s)
        s = _x_mix(_xcpmg_trig(coef_ref, t, b1, has_b1), s)
        s = half(s)
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :] + s[6][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :] + s[7][0:1, :]
        return s

    u = math.gcd(nE, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    jax.lax.fori_loop(0, nE // u, body, _xcv_init(masks, pk_ref))


def _xcv_fwd_chk_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                        coef_ref, pk_ref, pkt_ref, outr_ref, outi_ref,
                        chk_ref, s_scr):
    r"""Chunked variable-spacing two-pool CPMG forward for the VJP
    path (pkt blocked per chunk — local index)."""
    TA = pk_ref.shape[1]
    b1 = _xcv_pk5(pk_ref)[4]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        for p, v in enumerate(_xcv_init(masks, pk_ref)):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(12))
    for p in range(12):
        chk_ref[0, p] = s[p]

    def step(t, tl, s):
        xk = _xv_xk(pkt_ref, tl)

        def half(s):
            return _x_shift(1, masks, _x_relax(xk, masks, s))

        s = half(s)
        s = _x_mix(_xcpmg_trig(coef_ref, t, b1, has_b1), s)
        s = half(s)
        outr_ref[pl.ds(t, 1), :] = s[0][0:1, :] + s[6][0:1, :]
        outi_ref[pl.ds(t, 1), :] = s[1][0:1, :] + s[7][0:1, :]
        return s

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            tl = k * u + jj
            s = step(t0 + tl, tl, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(12):
        s_scr[p] = s[p]


def _xcv_bwd_kernel(K: int, tc: int, ntc: int, has_b1: bool,
                    coef_ref, pk_ref, pkt_ref, chk_ref, gr_ref,
                    gi_ref, dpar_ref, dcf_ref, dpkt_ref, s_scr,
                    h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the variable-spacing two-pool CPMG
    train: the recursion of :func:`_xcpmg_bwd_kernel` with the 14
    entry grads EMITTED per echo (summed over the echo's two halves,
    which share the esp_t/2 propagator) into ``dpkt``. ``dpar``
    `(5, TA)` = [dexc, dexs, dM0a(init), dM0b(init), db1]."""
    TA = pk_ref.shape[1]
    exc, exs, M0a, M0b, b1 = _xcv_pk5(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc

    @pl.when(j == 0)
    def _():
        acc_scr[0] = jnp.zeros((1, TA), gr_ref.dtype)
        for p in range(12):
            h_scr[p] = masks[2]

    def fstep(t, tl, s):
        xk = _xv_xk(pkt_ref, tl)

        def half(s):
            return _x_shift(1, masks, _x_relax(xk, masks, s))

        s = half(s)
        s = _x_mix(_xcpmg_trig(coef_ref, t, b1, has_b1), s)
        return half(s)

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(12):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(12)))

    def bstep(t, tl, carry):
        h = carry[:12]
        ab1 = carry[12]
        s = tuple(s_scr[tl, p] for p in range(12))
        xk = _xv_xk(pkt_ref, tl)
        tg = _xcpmg_trig(coef_ref, t, b1, has_b1)
        sh1 = _x_shift(1, masks, _x_relax(xk, masks, s))
        s1 = _x_mix(tg, sh1)

        # echo (total F+(0) after the 2nd half, no demod)
        h = (jnp.where(is0, h[0] + gr_ref[pl.ds(t, 1), :], h[0]),
             jnp.where(is0, h[1] + gi_ref[pl.ds(t, 1), :], h[1])) \
            + h[2:6] \
            + (jnp.where(is0, h[6] + gr_ref[pl.ds(t, 1), :], h[6]),
               jnp.where(is0, h[7] + gi_ref[pl.ds(t, 1), :],
                         h[7])) \
            + h[8:]

        # 2nd half transpose (shift-T then relax rows at input s1)
        h = _x_shift_T(1, masks, h)
        rows2 = _x_relax_rows(h, s1)
        h = _x_relax_cot(xk, h)

        # refocusing mix transpose + flip grads (phi = 0 chain)
        ca2, sa2, sa, ca = tg[0], tg[1], tg[2], tg[3]
        (d_ca2, d_sc2, _, _, d_sc, _, d_hc,
         d_ca) = _x_mix_coef_grads(tg, h, sh1)
        d_sa2 = d_sc2
        d_sa = d_sc + 0.5 * d_hc

        zs = jnp.zeros((), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            ab1 = ab1 + d_al * coef_ref[4, t]
            rows = (zs, zs, zs, zs, jnp.sum(d_al * b1))
        else:
            rows = (jnp.sum(d_ca2), jnp.sum(d_sa2), jnp.sum(d_sa),
                    jnp.sum(d_ca), zs)
        for c in range(5):
            dcf_ref[0, tl, c] = rows[c]

        h = _x_mix_T(tg, h)

        # 1st half transpose (input = stored pre-echo state)
        h = _x_shift_T(1, masks, h)
        rows1 = _x_relax_rows(h, s)
        for i in range(14):
            dpkt_ref[0, tl, i] = (rows1[i] + rows2[i])[0]
        h = _x_relax_cot(xk, h)
        return h + (ab1,)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(12)) + (acc_scr[0],))
    for p in range(12):
        h_scr[p] = carry[p]
    acc_scr[0] = carry[12]

    @pl.when(j == ntc - 1)
    def _():
        h = carry[:12]
        hPar0, hPai0 = h[0][0:1, :], h[1][0:1, :]
        hMar0, hMai0 = h[2][0:1, :], h[3][0:1, :]
        hPbr0, hPbi0 = h[6][0:1, :], h[7][0:1, :]
        hMbr0, hMbi0 = h[8][0:1, :], h[9][0:1, :]
        ra_ = hPar0 + hMar0
        ia_ = -hPai0 + hMai0
        rb_ = hPbr0 + hMbr0
        ib_ = -hPbi0 + hMbi0
        dpar_ref[pl.ds(0, 1), :] = M0a * ia_ + M0b * ib_    # d exc
        dpar_ref[pl.ds(1, 1), :] = M0a * ra_ + M0b * rb_    # d exs
        dpar_ref[pl.ds(2, 1), :] = exs * ra_ + exc * ia_    # d M0a
        dpar_ref[pl.ds(3, 1), :] = exs * rb_ + exc * ib_    # d M0b
        dpar_ref[pl.ds(4, 1), :] = carry[12]                # d b1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _xcpmg_core_v(K, interpret, has_b1, coef, pk, pkt):
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512 if nE <= 512 else 256, -(-nA // _LANE) * _LANE)
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    out = pl.BlockSpec((nE, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_xcpmg_v_kernel, K, nE, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((5, tile), lambda i: (0, i)),
                  pl.BlockSpec((nE, 14, tile), lambda i: (0, 0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return outr[:, :nA], outi[:, :nA]


def _xcpmg_core_v_fwd(K, interpret, has_b1, coef, pk, pkt):
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    tc = _pick_tc_x(nE, K)
    ntc = nE // tc
    out = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile), lambda i, j: (j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 14, tile), lambda i, j: (j, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_xcv_fwd_chk_kernel, K, tc, ntc, has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((5, tile), lambda i, j: (0, i)),
                  pkts],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nE, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 12, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((12, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, pkt, chka)


def _xcpmg_core_v_bwd(K, interpret, has_b1, res, g):
    coef, pk, pkt, chka = res
    gr, gi = g
    nE = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_x(nE, K)
    ntc = nE // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nE, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 12, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 14, tile),
                        lambda i, j: (ntc - 1 - j, 0, i))
    dpar, dcf, dpkt = pl.pallas_call(
        functools.partial(_xcv_bwd_kernel, K, tc, ntc, has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((5, tile), lambda i, j: (0, i)),
                  pkts, chk, gsp, gsp],
        out_specs=[pl.BlockSpec((5, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 5),
                                lambda i, j: (i, ntc - 1 - j, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, tc, 14, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((5, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nE, 5),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nE, 14, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 12, K, tile), jnp.float32),
                        pltpu.VMEM((12, K, tile), jnp.float32),
                        pltpu.VMEM((1, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=0).T                   # (5, nE)
    dpkt = jnp.moveaxis(dpkt, 0, 2).reshape(nE, 14, nAp)
    return dcoef, dpar[:, :nA], dpkt[:, :, :nA]


_xcpmg_core_v.defvjp(_xcpmg_core_v_fwd, _xcpmg_core_v_bwd)


@functools.partial(jax.jit, static_argnames=('interpret', 'has_b1'))
def _xcpmg_v_dispatch(flips, T1a, T2a, T1b, T2b, kab, kba, esps,
                      M0a, M0b, dfb, phi_ex, b1, *, interpret: bool,
                      has_b1: bool):
    nE = flips.shape[0]
    K = nE + 1
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips = flips.astype(f32)
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      flips])                                 # (5, nE)
    pkt = jax.checkpoint(_x_step_entries)(
        T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb,
        esps.astype(f32) / 2).astype(f32)             # (nE, 14, nA)
    pk = jnp.stack([jnp.cos(jnp.broadcast_to(phi_ex, (nA,))),
                    jnp.sin(jnp.broadcast_to(phi_ex, (nA,))),
                    jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32),
                                     (nA,))]).astype(f32)
    outr, outi = _xcpmg_core_v(K, interpret, has_b1, coef, pk, pkt)
    return jnp.stack([outr, outi], -1)               # (nE, nA, 2)


# ==========================================================================
# In-kernel EPG-X(MT) adjoint (round 3): volume qMT fitting. Pool a is
# the SPGR algebra verbatim; the bound pool carries only Z, saturated
# per TR by exp(-wt_t * wscale_atom) — a rank-1 factor whose transpose
# feeds both the per-TR wt row and the per-atom wscale gradient.
# ==========================================================================

def _mt_pk(pk_ref):
    return tuple(pk_ref[k:k + 1, :] for k in range(11))


def _mt_relax(mk, masks, s):
    r"""F decay (E2a) + Z-pair exchange + recovery (kept in sync with
    ``_mt_kernel``)."""
    Z00, Z01, Z10, Z11, ra, rb, E2a = mk[:7]
    is0 = masks[0]
    Fpr, Fpi, Fmr, Fmi, Zr, Zi, Zbr, Zbi = s
    Fpr, Fpi = E2a * Fpr, E2a * Fpi
    Fmr, Fmi = E2a * Fmr, E2a * Fmi
    Z2r = Z00 * Zr + Z01 * Zbr
    Z2i = Z00 * Zi + Z01 * Zbi
    Zb2r = Z10 * Zr + Z11 * Zbr
    Zb2i = Z10 * Zi + Z11 * Zbi
    Z2r = jnp.where(is0, Z2r + ra, Z2r)
    Zb2r = jnp.where(is0, Zb2r + rb, Zb2r)
    return Fpr, Fpi, Fmr, Fmi, Z2r, Z2i, Zb2r, Zb2i


def _mt_relax_rows(h, x):
    r"""The 7 entry gradients [dZ00, dZ01, dZ10, dZ11, dra, drb,
    dE2a] of :func:`_mt_relax` as `(1, TA)` rows (contract cotangent
    ``h`` with input ``x``)."""
    hFpr, hFpi, hFmr, hFmi, hZr, hZi, hZbr, hZbi = h
    Fpr, Fpi, Fmr, Fmi, Zr, Zi, Zbr, Zbi = x
    return (_ksum1(hZr * Zr + hZi * Zi),
            _ksum1(hZr * Zbr + hZi * Zbi),
            _ksum1(hZbr * Zr + hZbi * Zi),
            _ksum1(hZbr * Zbr + hZbi * Zbi),
            hZr[0:1, :],
            hZbr[0:1, :],
            _ksum1(hFpr * Fpr + hFpi * Fpi
                   + hFmr * Fmr + hFmi * Fmi))


def _mt_relax_cot(mk, h):
    r"""Input cotangents of :func:`_mt_relax` (transpose of the
    linear part)."""
    Z00, Z01, Z10, Z11, ra, rb, E2a = mk[:7]
    hFpr, hFpi, hFmr, hFmi, hZr, hZi, hZbr, hZbi = h
    return (E2a * hFpr, E2a * hFpi, E2a * hFmr, E2a * hFmi,
            Z00 * hZr + Z10 * hZbr, Z00 * hZi + Z10 * hZbi,
            Z01 * hZr + Z11 * hZbr, Z01 * hZi + Z11 * hZbi)


def _mt_relax_T(mk, masks, h, x, acc):
    r"""Transpose of :func:`_mt_relax` at input ``x``; accumulates
    [dZ00, dZ01, dZ10, dZ11, dra, drb, dE2a] into ``acc[:7]``."""
    rows = _mt_relax_rows(h, x)
    for i in range(7):
        acc[i] = acc[i] + rows[i]
    return _mt_relax_cot(mk, h), acc


def _mt_fwd_chk_kernel(K: int, tc: int, ntc: int, kshift: int,
                       has_b1: bool, coef_ref, pk_ref, outr_ref,
                       outi_ref, chk_ref, s_scr):
    r"""Chunked EPG-X(MT) forward for the VJP path (echo math matches
    ``_mt_kernel``)."""
    TA = pk_ref.shape[1]
    mk = _mt_pk(pk_ref)
    M0a, M0b = mk[7], mk[8]
    b1, wsc = mk[9], mk[10]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        init = (zero, zero, zero, zero,
                jnp.where(is0, M0a, zero), zero,
                jnp.where(is0, M0b, zero), zero)
        for p, v in enumerate(init):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(8))
    for p in range(8):
        chk_ref[0, p] = s[p]

    def step(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sa6 = _spgr_mix(tg, s[:6])
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = sa6 + (sat * s[6], sat * s[7])
        c1, s1c = tg[4], tg[5]
        outr_ref[pl.ds(t, 1), :] = (c1 * s1[0][0:1, :]
                                    + s1c * s1[1][0:1, :])
        outi_ref[pl.ds(t, 1), :] = (c1 * s1[1][0:1, :]
                                    - s1c * s1[0][0:1, :])
        s2 = _mt_relax(mk, masks, s1)
        return _spgr_shift_like(kshift, masks, s2[:6]) + s2[6:]

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            s = step(t0 + k * u + jj, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(8):
        s_scr[p] = s[p]


def _mt_bwd_kernel(K: int, tc: int, ntc: int, kshift: int,
                   has_b1: bool, coef_ref, pk_ref, chk_ref, gr_ref,
                   gi_ref, dpar_ref, dcf_ref, s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the EPG-X(MT) train. ``dpar`` rows
    map 1:1 onto the pk rows [Z00..Z11, ra, rb, E2a, M0a, M0b, b1,
    wscale]; ``dcf`` `(tc, 10, TA)` lane-partials (coef rows incl. the
    per-TR saturation ``wt``)."""
    TA = pk_ref.shape[1]
    mk = _mt_pk(pk_ref)
    b1, wsc = mk[9], mk[10]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc
    N_ACC = 9                    # 7 relax entries + db1 + dwscale

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), gr_ref.dtype)
        for a in range(N_ACC):
            acc_scr[a] = z1
        for p in range(8):
            h_scr[p] = masks[2]

    def fstep(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = _spgr_mix(tg, s[:6]) + (sat * s[6], sat * s[7])
        s2 = _mt_relax(mk, masks, s1)
        return _spgr_shift_like(kshift, masks, s2[:6]) + s2[6:]

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(8):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(8)))

    def bstep(t, tl, carry):
        h = carry[:8]
        acc = list(carry[8:])
        s = tuple(s_scr[tl, p] for p in range(8))
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = _spgr_mix(tg, s[:6]) + (sat * s[6], sat * s[7])

        # shift transpose (pool-a F only)
        for _ in range(abs(kshift)):
            h = _spgr_shift_T(kshift, masks, h[:6]) + h[6:]
        # relax-exchange transpose (+ entry grads)
        h, acc7 = _mt_relax_T(mk, masks, h, s1, acc[:7])
        acc = acc7 + acc[7:]

        # echo inject (demodulated pool-a F+(0) of s1)
        c1, s1c = tg[4], tg[5]
        gyr, gyi = gr_ref[pl.ds(t, 1), :], gi_ref[pl.ds(t, 1), :]
        er = c1 * gyr - s1c * gyi
        ei = s1c * gyr + c1 * gyi
        h = (jnp.where(is0, h[0] + er, h[0]),
             jnp.where(is0, h[1] + ei, h[1])) + h[2:]
        fp0r, fp0i = s1[0][0:1, :], s1[1][0:1, :]
        d_c1e = gyr * fp0r + gyi * fp0i
        d_s1e = gyr * fp0i - gyi * fp0r

        # saturation transpose (pool-b Z): Zb1 = sat * Zb
        dsat = _ksum1(h[6] * s[6] + h[7] * s[7])
        d_wt_row = -wsc * sat * dsat
        acc[8] = acc[8] + (-coef_ref[9, t]) * sat * dsat
        h = h[:6] + (sat * h[6], sat * h[7])

        # pool-a RF transpose + coefficient grads (SPGR algebra)
        ca2, sa2, sa, ca, c1, s1c, c2, s2 = tg
        h1Fpr, h1Fpi, h1Fmr, h1Fmi, h1Zr, h1Zi = h[:6]
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = s[:6]
        d_ca2 = _ksum1(h1Fpr * Fpr + h1Fpi * Fpi
                       + h1Fmr * Fmr + h1Fmi * Fmi)
        d_sc2 = _ksum1(h1Fpr * Fmr + h1Fpi * Fmi
                       + h1Fmr * Fpr + h1Fmi * Fpi)
        d_ss2 = _ksum1(-h1Fpr * Fmi + h1Fpi * Fmr
                       + h1Fmr * Fpi - h1Fmi * Fpr)
        d_ss = _ksum1((h1Fpr + h1Fmr) * Zr + (h1Fpi + h1Fmi) * Zi)
        d_sc = _ksum1((h1Fpr - h1Fmr) * Zi - (h1Fpi - h1Fmi) * Zr)
        d_hs = _ksum1(-h1Zr * (Fpr + Fmr) - h1Zi * (Fpi + Fmi))
        d_hc = _ksum1(h1Zr * (Fpi - Fmi) + h1Zi * (Fmr - Fpr))
        d_ca = _ksum1(h1Zr * Zr + h1Zi * Zi)
        d_sa2 = c2 * d_sc2 + s2 * d_ss2
        d_c2 = sa2 * d_sc2
        d_s2 = sa2 * d_ss2
        d_sa = s1c * (d_ss + 0.5 * d_hs) + c1 * (d_sc + 0.5 * d_hc)
        d_s1 = sa * (d_ss + 0.5 * d_hs) + d_s1e
        d_c1 = sa * (d_sc + 0.5 * d_hc) + d_c1e

        # per-TR coefficient grads, fully reduced to SMEM scalars:
        # the lane-partial convention would cost nA*nT*10*4 bytes of
        # HBM (6 GB at 1M voxels x 150 TR) and gate volume qMT
        # fitting out; the extra in-kernel lane reductions are ~10
        # ops/TR
        zs = jnp.zeros((), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            acc[7] = acc[7] + d_al * coef_ref[8, t]
            rows = (zs, zs, zs, zs, jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2),
                    jnp.sum(d_al * b1), jnp.sum(d_wt_row))
        else:
            rows = (jnp.sum(d_ca2), jnp.sum(d_sa2), jnp.sum(d_sa),
                    jnp.sum(d_ca), jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2), zs,
                    jnp.sum(d_wt_row))
        for c in range(10):
            dcf_ref[0, tl, c] = rows[c]

        h = _spgr_mix_T(tg, h[:6]) + h[6:]
        return h + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(8))
        + tuple(acc_scr[a] for a in range(N_ACC)))
    for p in range(8):
        h_scr[p] = carry[p]
    for a in range(N_ACC):
        acc_scr[a] = carry[8 + a]

    @pl.when(j == ntc - 1)
    def _():
        acc = carry[8:]
        for a in range(7):
            dpar_ref[pl.ds(a, 1), :] = acc[a]
        dpar_ref[pl.ds(7, 1), :] = carry[4][0:1, :]    # dM0a (Z init)
        dpar_ref[pl.ds(8, 1), :] = carry[6][0:1, :]    # dM0b (Zb init)
        dpar_ref[pl.ds(9, 1), :] = acc[7]              # db1
        dpar_ref[pl.ds(10, 1), :] = acc[8]             # dwscale


def _pick_tc_mt(nT: int, K: int) -> int:
    from mrphy_tpu.utils._shapes import largest_divisor_leq_pref
    bound = max(1, (14 << 20) // (8 * K * _BWD_TILE * 4))
    if nT <= bound:
        return nT
    return largest_divisor_leq_pref(nT, bound, _UNROLL)


def mt_bwd_is_available(*, nTR: int, K: int, nA: int,
                        varint: bool = False) -> bool:
    tc = _pick_tc_mt(nTR, K)
    if nTR % tc:
        return False
    ntc = nTR // tc
    scr = tc * 8 * K * _BWD_TILE * 4
    ntiles = -(-nA // _BWD_TILE)
    chk = ntc * 8 * K * ntiles * _BWD_TILE * 4
    # dcf is SMEM-scalar-reduced in-kernel: ntiles*nTR*10*4 bytes of
    # HBM — never gates (47 MB even at 1M voxels x 150 TR)
    if varint:        # the per-TR entry-cotangent planes (round 5)
        dpkt = ntiles * nTR * 7 * _BWD_TILE * 4
        if dpkt > 4 * 1024 ** 3:
            return False
    return scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mt_core(K, kshift, interpret, has_b1, coef, pk):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512, -(-nA // _LANE) * _LANE)
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    out = pl.BlockSpec((nTR, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_mt_kernel, K, nTR, kshift, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((11, tile), lambda i: (0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return outr[:, :nA], outi[:, :nA]


def _mt_core_fwd(K, kshift, interpret, has_b1, coef, pk):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    tc = _pick_tc_mt(nTR, K)
    ntc = nTR // tc
    out = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 8, K, tile), lambda i, j: (j, 0, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_mt_fwd_chk_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((11, tile), lambda i, j: (0, i))],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 8, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, chka)


def _mt_core_bwd(K, kshift, interpret, has_b1, res, g):
    coef, pk, chka = res
    gr, gi = g
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, nAp = _xspgr_pad(coef, pk, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_mt(nTR, K)
    ntc = nTR // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 8, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    dpar, dcf = pl.pallas_call(
        functools.partial(_mt_bwd_kernel, K, tc, ntc, kshift, has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((11, tile), lambda i, j: (0, i)),
                  chk, gsp, gsp],
        out_specs=[pl.BlockSpec((11, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 10),
                                lambda i, j: (i, ntc - 1 - j, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((11, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 10),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 8, K, tile), jnp.float32),
                        pltpu.VMEM((8, K, tile), jnp.float32),
                        pltpu.VMEM((9, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=0).T                   # (10, nTR)
    return dcoef, dpar[:, :nA]


_mt_core.defvjp(_mt_core_fwd, _mt_core_bwd)


# ==========================================================================
# Variable-TR EPG-X(MT) trains (round 5): per-step [Z00..Z11, ra, rb,
# E2a] planes streamed per chunk; the adjoint emits the 7 entry-
# cotangent rows per TR (dpkt) — same design as the full-BM variant.
# ==========================================================================

def _mt_step_entries(T1a, T2a, T1b, kab, kba, M0a, M0b, trs):
    r"""Per-TR MT propagator planes `(nTR, 7, nA)` (rows [Z00, Z01,
    Z10, Z11, ra, rb, E2a]) — the closed forms of ``_mt_dispatch``
    vmapped over the tr train."""
    from mrphy_tpu.ops.epg import _z_recovery
    from mrphy_tpu.ops.slowsims import _expm2

    def mk(tau):
        Z00, Z01, Z10, Z11 = _expm2(
            (-1 / T1a - kab) * tau, kba * tau,
            kab * tau, (-1 / T1b - kba) * tau)
        ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                             M0a, M0b)
        return jnp.stack([Z00, Z01, Z10, Z11, ra, rb,
                          jnp.exp(-tau / T2a)
                          * jnp.ones_like(Z00)])     # (7, nA)

    return jax.vmap(mk)(trs)                         # (nTR, 7, nA)


def _mtv_pk4(pk_ref):
    r"""Unpack the per-atom non-interval rows [M0a, M0b, b1, wsc]."""
    return (pk_ref[0:1, :], pk_ref[1:2, :], pk_ref[2:3, :],
            pk_ref[3:4, :])


def _mtv_xk(pkt_ref, tl):
    slab = pkt_ref[tl]
    return tuple(slab[i:i + 1, :] for i in range(7))


def _mtv_kernel(K: int, nTR: int, kshift: int, has_b1: bool,
                coef_ref, pk_ref, pkt_ref, outr_ref, outi_ref):
    r"""Variable-TR EPG-X(MT) tile: :func:`_mt_kernel` with per-TR
    propagator planes read from the streamed stack."""
    TA = pk_ref.shape[1]
    M0a, M0b, b1, wsc = _mtv_pk4(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks

    def step(t, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sa6 = _spgr_mix(tg, s[:6])
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = sa6 + (sat * s[6], sat * s[7])
        c1, s1c = tg[4], tg[5]
        outr_ref[pl.ds(t, 1), :] = (c1 * s1[0][0:1, :]
                                    + s1c * s1[1][0:1, :])
        outi_ref[pl.ds(t, 1), :] = (c1 * s1[1][0:1, :]
                                    - s1c * s1[0][0:1, :])
        mk = _mtv_xk(pkt_ref, t)
        s2 = _mt_relax(mk, masks, s1)
        return _spgr_shift_like(kshift, masks, s2[:6]) + s2[6:]

    u = math.gcd(nTR, _UNROLL)

    def body(j, s):
        for jj in range(u):
            s = step(j * u + jj, s)
        return s

    init = (zero, zero, zero, zero, jnp.where(is0, M0a, zero), zero,
            jnp.where(is0, M0b, zero), zero)
    jax.lax.fori_loop(0, nTR // u, body, init)


def _mtv_fwd_chk_kernel(K: int, tc: int, ntc: int, kshift: int,
                        has_b1: bool, coef_ref, pk_ref, pkt_ref,
                        outr_ref, outi_ref, chk_ref, s_scr):
    r"""Chunked variable-TR EPG-X(MT) forward for the VJP path."""
    TA = pk_ref.shape[1]
    M0a, M0b, b1, wsc = _mtv_pk4(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), outr_ref.dtype))
    is0, _, zero = masks
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        init = (zero, zero, zero, zero,
                jnp.where(is0, M0a, zero), zero,
                jnp.where(is0, M0b, zero), zero)
        for p, v in enumerate(init):
            s_scr[p] = v

    s = tuple(s_scr[p] for p in range(8))
    for p in range(8):
        chk_ref[0, p] = s[p]

    def step(t, tl, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = _spgr_mix(tg, s[:6]) + (sat * s[6], sat * s[7])
        c1, s1c = tg[4], tg[5]
        outr_ref[pl.ds(t, 1), :] = (c1 * s1[0][0:1, :]
                                    + s1c * s1[1][0:1, :])
        outi_ref[pl.ds(t, 1), :] = (c1 * s1[1][0:1, :]
                                    - s1c * s1[0][0:1, :])
        mk = _mtv_xk(pkt_ref, tl)
        s2 = _mt_relax(mk, masks, s1)
        return _spgr_shift_like(kshift, masks, s2[:6]) + s2[6:]

    u = math.gcd(tc, _UNROLL)

    def body(k, s):
        for jj in range(u):
            tl = k * u + jj
            s = step(t0 + tl, tl, s)
        return s

    s = jax.lax.fori_loop(0, tc // u, body, s)
    for p in range(8):
        s_scr[p] = s[p]


def _mtv_bwd_kernel(K: int, tc: int, ntc: int, kshift: int,
                    has_b1: bool, coef_ref, pk_ref, pkt_ref, chk_ref,
                    gr_ref, gi_ref, dpar_ref, dcf_ref, dpkt_ref,
                    s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint for the variable-TR EPG-X(MT) train:
    the recursion of :func:`_mt_bwd_kernel` with the 7 entry grads
    emitted per TR into ``dpkt``. ``dpar`` `(4, TA)` = [dM0a(init),
    dM0b(init), db1, dwscale]; ``dcf`` stays SMEM-scalar-reduced
    `(tc, 10)`."""
    TA = pk_ref.shape[1]
    _, _, b1, wsc = _mtv_pk4(pk_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, TA), 0)
    masks = (row == 0, row == K - 1,
             jnp.zeros((K, TA), gr_ref.dtype))
    is0 = masks[0]
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc
    N_ACC = 2                    # db1 + dwscale

    @pl.when(j == 0)
    def _():
        z1 = jnp.zeros((1, TA), gr_ref.dtype)
        for a in range(N_ACC):
            acc_scr[a] = z1
        for p in range(8):
            h_scr[p] = masks[2]

    def fstep(t, tl, s):
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = _spgr_mix(tg, s[:6]) + (sat * s[6], sat * s[7])
        mk = _mtv_xk(pkt_ref, tl)
        s2 = _mt_relax(mk, masks, s1)
        return _spgr_shift_like(kshift, masks, s2[:6]) + s2[6:]

    u = math.gcd(tc, _UNROLL)

    def fbody(k, s):
        for jj in range(u):
            tl = k * u + jj
            for p in range(8):
                s_scr[tl, p] = s[p]
            s = fstep(t0 + tl, tl, s)
        return s

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, p] for p in range(8)))

    def bstep(t, tl, carry):
        h = carry[:8]
        acc = list(carry[8:])
        s = tuple(s_scr[tl, p] for p in range(8))
        tg = _xspgr_trig(coef_ref, t, b1, has_b1)
        sat = jnp.exp(-coef_ref[9, t] * wsc)
        s1 = _spgr_mix(tg, s[:6]) + (sat * s[6], sat * s[7])
        mk = _mtv_xk(pkt_ref, tl)

        # shift transpose (pool-a F only)
        for _ in range(abs(kshift)):
            h = _spgr_shift_T(kshift, masks, h[:6]) + h[6:]
        # relax-exchange transpose (+ per-TR entry rows)
        rows7 = _mt_relax_rows(h, s1)
        for i in range(7):
            dpkt_ref[0, tl, i] = rows7[i][0]
        h = _mt_relax_cot(mk, h)

        # echo inject (demodulated pool-a F+(0) of s1)
        c1, s1c = tg[4], tg[5]
        gyr, gyi = gr_ref[pl.ds(t, 1), :], gi_ref[pl.ds(t, 1), :]
        er = c1 * gyr - s1c * gyi
        ei = s1c * gyr + c1 * gyi
        h = (jnp.where(is0, h[0] + er, h[0]),
             jnp.where(is0, h[1] + ei, h[1])) + h[2:]
        fp0r, fp0i = s1[0][0:1, :], s1[1][0:1, :]
        d_c1e = gyr * fp0r + gyi * fp0i
        d_s1e = gyr * fp0i - gyi * fp0r

        # saturation transpose (pool-b Z): Zb1 = sat * Zb
        dsat = _ksum1(h[6] * s[6] + h[7] * s[7])
        d_wt_row = -wsc * sat * dsat
        acc[1] = acc[1] + (-coef_ref[9, t]) * sat * dsat
        h = h[:6] + (sat * h[6], sat * h[7])

        # pool-a RF transpose + coefficient grads (SPGR algebra)
        ca2, sa2, sa, ca, c1, s1c, c2, s2 = tg
        h1Fpr, h1Fpi, h1Fmr, h1Fmi, h1Zr, h1Zi = h[:6]
        Fpr, Fpi, Fmr, Fmi, Zr, Zi = s[:6]
        d_ca2 = _ksum1(h1Fpr * Fpr + h1Fpi * Fpi
                       + h1Fmr * Fmr + h1Fmi * Fmi)
        d_sc2 = _ksum1(h1Fpr * Fmr + h1Fpi * Fmi
                       + h1Fmr * Fpr + h1Fmi * Fpi)
        d_ss2 = _ksum1(-h1Fpr * Fmi + h1Fpi * Fmr
                       + h1Fmr * Fpi - h1Fmi * Fpr)
        d_ss = _ksum1((h1Fpr + h1Fmr) * Zr + (h1Fpi + h1Fmi) * Zi)
        d_sc = _ksum1((h1Fpr - h1Fmr) * Zi - (h1Fpi - h1Fmi) * Zr)
        d_hs = _ksum1(-h1Zr * (Fpr + Fmr) - h1Zi * (Fpi + Fmi))
        d_hc = _ksum1(h1Zr * (Fpi - Fmi) + h1Zi * (Fmr - Fpr))
        d_ca = _ksum1(h1Zr * Zr + h1Zi * Zi)
        d_sa2 = c2 * d_sc2 + s2 * d_ss2
        d_c2 = sa2 * d_sc2
        d_s2 = sa2 * d_ss2
        d_sa = s1c * (d_ss + 0.5 * d_hs) + c1 * (d_sc + 0.5 * d_hc)
        d_s1 = sa * (d_ss + 0.5 * d_hs) + d_s1e
        d_c1 = sa * (d_sc + 0.5 * d_hc) + d_c1e

        zs = jnp.zeros((), gr_ref.dtype)
        if has_b1:
            d_al = (0.5 * sa * (d_sa2 - d_ca2) + ca * d_sa
                    - sa * d_ca)
            acc[0] = acc[0] + d_al * coef_ref[8, t]
            rows = (zs, zs, zs, zs, jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2),
                    jnp.sum(d_al * b1), jnp.sum(d_wt_row))
        else:
            rows = (jnp.sum(d_ca2), jnp.sum(d_sa2), jnp.sum(d_sa),
                    jnp.sum(d_ca), jnp.sum(d_c1), jnp.sum(d_s1),
                    jnp.sum(d_c2), jnp.sum(d_s2), zs,
                    jnp.sum(d_wt_row))
        for c in range(10):
            dcf_ref[0, tl, c] = rows[c]

        h = _spgr_mix_T(tg, h[:6]) + h[6:]
        return h + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(8))
        + tuple(acc_scr[a] for a in range(N_ACC)))
    for p in range(8):
        h_scr[p] = carry[p]
    for a in range(N_ACC):
        acc_scr[a] = carry[8 + a]

    @pl.when(j == ntc - 1)
    def _():
        dpar_ref[pl.ds(0, 1), :] = carry[4][0:1, :]    # dM0a (Z init)
        dpar_ref[pl.ds(1, 1), :] = carry[6][0:1, :]    # dM0b (Zb init)
        dpar_ref[pl.ds(2, 1), :] = carry[8]            # db1
        dpar_ref[pl.ds(3, 1), :] = carry[9]            # dwscale


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mt_core_v(K, kshift, interpret, has_b1, coef, pk, pkt):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = min(512 if nTR <= 512 else 256, -(-nA // _LANE) * _LANE)
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    out = pl.BlockSpec((nTR, tile), lambda i: (0, i))
    outr, outi = pl.pallas_call(
        functools.partial(_mtv_kernel, K, nTR, kshift, has_b1),
        grid=(nAp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((4, tile), lambda i: (0, i)),
                  pl.BlockSpec((nTR, 7, tile), lambda i: (0, 0, i))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return outr[:, :nA], outi[:, :nA]


def _mt_core_v_fwd(K, kshift, interpret, has_b1, coef, pk, pkt):
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    tc = _pick_tc_mt(nTR, K)
    ntc = nTR // tc
    out = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 8, K, tile), lambda i, j: (j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 7, tile), lambda i, j: (j, 0, i))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_mtv_fwd_chk_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(nAp // tile, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((4, tile), lambda i, j: (0, i)),
                  pkts],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTR, nAp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 8, K, nAp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, K, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp)
    return (outr[:, :nA], outi[:, :nA]), (coef, pk, pkt, chka)


def _mt_core_v_bwd(K, kshift, interpret, has_b1, res, g):
    coef, pk, pkt, chka = res
    gr, gi = g
    nTR = coef.shape[1]
    nA = pk.shape[1]
    tile = _BWD_TILE
    coefp, pkp, pktp, nAp = _xv_pad(coef, pk, pkt, tile)
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).astype(jnp.float32)
    tc = _pick_tc_mt(nTR, K)
    ntc = nTR // tc
    ntiles = nAp // tile
    gsp = pl.BlockSpec((nTR, tile), lambda i, j: (0, i))
    chk = pl.BlockSpec((1, 8, K, tile),
                       lambda i, j: (ntc - 1 - j, 0, 0, i))
    pkts = pl.BlockSpec((tc, 7, tile),
                        lambda i, j: (ntc - 1 - j, 0, i))
    dpar, dcf, dpkt = pl.pallas_call(
        functools.partial(_mtv_bwd_kernel, K, tc, ntc, kshift,
                          has_b1),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((4, tile), lambda i, j: (0, i)),
                  pkts, chk, gsp, gsp],
        out_specs=[pl.BlockSpec((4, tile), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tc, 10),
                                lambda i, j: (i, ntc - 1 - j, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, tc, 7, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((4, nAp), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 10),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTR, 7, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 8, K, tile), jnp.float32),
                        pltpu.VMEM((8, K, tile), jnp.float32),
                        pltpu.VMEM((2, 1, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coefp, pkp, pktp, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=0).T                   # (10, nTR)
    dpkt = jnp.moveaxis(dpkt, 0, 2).reshape(nTR, 7, nAp)
    return dcoef, dpar[:, :nA], dpkt[:, :, :nA]


_mt_core_v.defvjp(_mt_core_v_fwd, _mt_core_v_bwd)


@functools.partial(jax.jit, static_argnames=('K', 'kshift',
                                             'interpret', 'has_b1'))
def _mt_v_dispatch(flips, phis, wt, T1a, T2a, T1b, kab, kba, trs,
                   M0a, M0b, b1, wscale, *, K: int, kshift: int,
                   interpret: bool, has_b1: bool):
    nTR = flips.shape[0]
    nA = T1a.shape[0]
    f32 = jnp.float32
    flips, phis = flips.astype(f32), phis.astype(f32)
    wt = jnp.broadcast_to(jnp.asarray(wt, f32), (nTR,))
    coef = jnp.stack([jnp.cos(flips / 2) ** 2, jnp.sin(flips / 2) ** 2,
                      jnp.sin(flips), jnp.cos(flips),
                      jnp.cos(phis), jnp.sin(phis),
                      jnp.cos(2 * phis), jnp.sin(2 * phis),
                      flips, wt])                             # (10, nTR)
    pkt = jax.checkpoint(_mt_step_entries)(
        T1a, T2a, T1b, kab, kba, M0a, M0b,
        trs.astype(f32)).astype(f32)                  # (nTR, 7, nA)
    pk = jnp.stack([jnp.broadcast_to(M0a, (nA,)),
                    jnp.broadcast_to(M0b, (nA,)),
                    jnp.broadcast_to(jnp.asarray(b1, f32), (nA,)),
                    jnp.broadcast_to(jnp.asarray(wscale, f32),
                                     (nA,))]).astype(f32)
    outr, outi = _mt_core_v(K, kshift, interpret, has_b1, coef, pk,
                            pkt)
    return jnp.stack([outr, outi], -1)               # (nTR, nA, 2)
