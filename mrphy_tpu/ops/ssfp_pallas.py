r"""Fused Pallas TPU kernel for transient balanced-SSFP trains
(bSSFP-MRF dictionary generation).

Why a kernel: :func:`mrphy_tpu.ops.ssfp.bssfp_train`'s XLA ``lax.scan``
round-trips the `(nAtoms, 3)` magnetization plus every per-TR
broadcast through HBM each TR. A bSSFP-MRF dictionary carries the
off-resonance dimension on top of (T1, T2) — Ma et al.'s original MRF
sequence (Nature 495:187, 2013) — so atom counts run LARGER than the
FISP dictionaries (``T1 × T2 × df (× B1)`` grids), and the per-TR math
is tiny (~30 flops): the scan is pure memory traffic. This kernel keeps
each tile's magnetization in registers across the whole train and
streams out only the echoes.

Layout: unlike the EPG kernels (:mod:`mrphy_tpu.ops.epg_pallas`, which
spend the sublane axis on configuration orders), a bSSFP voxel is ONE
isochromat — three state planes and no k-shift — so the atom batch
fills the full `(8, 128·k)` tile: atoms ride sublanes AND lanes
(8·tile atoms per grid step). Per-TR RF-rotation coefficients are
scalars from SMEM (flips/phases are the train, shared across the
dictionary); per-atom relaxation/precession factors enter as
`(8, tile)` planes.

Two precession modes, chosen statically from the input shapes:

- constant TR/TE (scalars): the 8 relax/precess factors per atom
  (cos/sin/E2/E1-recovery at TE and at TR−TE) are precomputed by the
  dispatcher — the kernel runs ZERO transcendentals per TR (B1-less).
- variable TR/TE trains (`(nTR,)` — variable-TR bSSFP-MRF): the kernel
  computes them from per-atom rates (R1, R2, −2π·df) and the SMEM
  te/rem durations — 8 transcendentals per atom·TR.

Scope (asserted by the dispatcher): shared 1-D ``flips``/``phis``
trains, 1-D atom batch, equilibrium start. ``jax.grad`` runs the
in-kernel hand-transposed adjoint (``_bssfp_bwd_kernel``, round 4 —
the last train family to leave the recompute-through-XLA VJP): a
two-phase chunk kernel whose phase 1 re-runs the forward from
chunk-START checkpoints and phase 2 walks the stored pre-RF states
backwards (TR-remainder transpose → echo-cotangent injection → TE
transpose → RF-rotation transpose), accumulating per-atom
relaxation/precession-factor grads and per-TR coefficient rows; the
dispatcher chains both to flips/phis/T1/T2/df/M0/b1/tr/te by
autodiff through its (differentiable) coefficient construction.
Parity with the XLA engine is pinned in ``tests/test_ssfp.py`` and
on-chip by ``benchmarks/tpu_checks.py::bssfp_dict_kernel`` /
``bssfp_adjoint``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['bssfp_train_pallas']

_LANE = 128
_SUB = 8
_VMEM_LIMIT = 100 * 1024 * 1024
_UNROLL = 8      # Mosaic fori_loop can't unroll; do it manually


def _nexpm1(x):
    r"""``expm1(-x)`` for ``x ≥ 0`` without the ``expm1`` primitive
    (Mosaic has no TPU lowering for it): 6-term Taylor below 0.17
    (series tail < 8e-9 — f32-exact where ``exp(-x) - 1`` cancels),
    plain ``exp(-x) - 1`` above (cancellation harmless there)."""
    t = -x * (1 + x * (-1 / 2 + x * (1 / 6 + x * (
        -1 / 24 + x * (1 / 120 - x * (1 / 720))))))
    return jnp.where(x < 0.17, t, jnp.exp(-x) - 1)


def _bssfp_kernel(nTR: int, has_b1: bool, vartr: bool,
                  coef_ref, pk_ref, outr_ref, outi_ref):
    r"""One `(8, tile)` atom tile: the whole train with (Mx, My, Mz)
    as loop carry (registers — never HBM). RF rotation about
    ``u = (cosφ, sinφ, 0)`` by ``−α`` is Rodrigues with shared scalar
    coefficients (per-atom trig only under ``has_b1``)."""
    if vartr:
        R1, R2 = pk_ref[0], pk_ref[1]
        om, M0 = pk_ref[2], pk_ref[3]
        b1 = pk_ref[4]
    else:
        cte, ste = pk_ref[0], pk_ref[1]
        E2te, a1te = pk_ref[2], pk_ref[3]
        crem, srem = pk_ref[4], pk_ref[5]
        E2rem, a1rem = pk_ref[6], pk_ref[7]
        M0, b1 = pk_ref[8], pk_ref[9]

    def step(t, M):
        Mx, My, Mz = M
        cphi, sphi = coef_ref[5, t], coef_ref[6, t]
        if has_b1:
            al = coef_ref[7, t] * b1             # (8, TA) per-atom flip
            ca, sa = jnp.cos(al), jnp.sin(al)
            A, B = sa * sphi, sa * cphi
            oc = 1 - ca
            vc, vs = oc * cphi, oc * sphi
        else:
            ca, A, B = coef_ref[0, t], coef_ref[1, t], coef_ref[2, t]
            vc, vs = coef_ref[3, t], coef_ref[4, t]

        # uϕrot(u_φ, −α): M' = ca·M − sa·(u×M) + (1−ca)·u·(u·M)
        dot = cphi * Mx + sphi * My
        Mx1 = ca * Mx - A * Mz + vc * dot
        My1 = ca * My + B * Mz + vs * dot
        Mz1 = ca * Mz + A * Mx - B * My

        if vartr:
            ten, remn = coef_ref[8, t], coef_ref[9, t]
            phi = om * ten
            cte_t, ste_t = jnp.cos(phi), jnp.sin(phi)
            E2te_t = jnp.exp(-ten * R2)
            a1te_t = -_nexpm1(ten * R1)
            phi = om * remn
            crem_t, srem_t = jnp.cos(phi), jnp.sin(phi)
            E2rem_t = jnp.exp(-remn * R2)
            a1rem_t = -_nexpm1(remn * R1)
        else:
            cte_t, ste_t, E2te_t, a1te_t = cte, ste, E2te, a1te
            crem_t, srem_t = crem, srem
            E2rem_t, a1rem_t = E2rem, a1rem

        # precess/relax to TE (freeprec semantics: φ = −2π·df·te)
        MxE = E2te_t * (cte_t * Mx1 - ste_t * My1)
        MyE = E2te_t * (ste_t * Mx1 + cte_t * My1)
        MzE = (1 - a1te_t) * Mz1 + a1te_t * M0

        # echo, demodulated by the transmit phase
        outr_ref[pl.ds(t, 1), :, :] = (cphi * MxE + sphi * MyE)[None]
        outi_ref[pl.ds(t, 1), :, :] = (cphi * MyE - sphi * MxE)[None]

        # precess/relax over the TR remainder
        Mx2 = E2rem_t * (crem_t * MxE - srem_t * MyE)
        My2 = E2rem_t * (srem_t * MxE + crem_t * MyE)
        Mz2 = (1 - a1rem_t) * MzE + a1rem_t * M0
        return (Mx2, My2, Mz2)

    u = math.gcd(nTR, _UNROLL)

    def body(j, M):
        for jj in range(u):
            M = step(j * u + jj, M)
        return M

    zero = jnp.zeros_like(M0)
    jax.lax.fori_loop(0, nTR // u, body, (zero, zero, M0))


@functools.partial(jax.jit, static_argnames=('tile', 'interpret',
                                             'has_b1', 'vartr'))
def _bssfp_dispatch(flips, phis, trs, tes, T1, T2, df, M0, b1, *,
                    tile: int, interpret: bool, has_b1: bool,
                    vartr: bool):
    from mrphy_tpu import pi

    nTR = flips.shape[0]
    nA = T1.shape[0]
    f32 = jnp.float32
    # pad the train to a multiple of _UNROLL so the manual unroll never
    # degrades to gcd(nTR, 8) = 1 on odd/prime train lengths: the train
    # is causal (echo t depends on flips[0..t] only), so appended
    # zero-flip TRs cannot perturb the first nTR echoes, which are all
    # we return.
    tpad = (-nTR) % _UNROLL
    if tpad:
        flips = jnp.pad(flips, (0, tpad))
        phis = jnp.pad(phis, (0, tpad))
        trs = jnp.pad(trs, (0, tpad), constant_values=1.0)
        tes = jnp.pad(tes, (0, tpad), constant_values=0.5)
    nTRp = nTR + tpad
    flips, phis = flips.astype(f32), phis.astype(f32)
    ca, sa = jnp.cos(flips), jnp.sin(flips)
    cphi, sphi = jnp.cos(phis), jnp.sin(phis)
    rows = [ca, sa * sphi, sa * cphi, (1 - ca) * cphi, (1 - ca) * sphi,
            cphi, sphi, flips]
    if vartr:
        rows += [tes.astype(f32), (trs - tes).astype(f32)]
    coef = jnp.stack(rows)                       # (8|10, nTR)

    T1, T2 = T1.astype(f32), T2.astype(f32)
    om = (-(2 * pi) * df).astype(f32)
    M0a = jnp.broadcast_to(jnp.asarray(M0, f32), (nA,))
    if vartr:
        planes = [1 / T1, 1 / T2, om, M0a,
                  jnp.broadcast_to(jnp.asarray(b1, f32), (nA,))]
    else:
        te, rem = tes[0], trs[0] - tes[0]
        planes = [jnp.cos(om * te), jnp.sin(om * te),
                  jnp.exp(-te / T2), -jnp.expm1(-te / T1),
                  jnp.cos(om * rem), jnp.sin(om * rem),
                  jnp.exp(-rem / T2), -jnp.expm1(-rem / T1),
                  M0a, jnp.broadcast_to(jnp.asarray(b1, f32), (nA,))]
    pk = jnp.stack([jnp.broadcast_to(p, (nA,)) for p in planes])
    pk = pk.astype(f32)

    outr, outi = _bssfp_core(has_b1, vartr, interpret, tile, coef, pk)
    return jnp.stack([outr[:nTR], outi[:nTR]], -1)   # (nTR, nA, 2)


def _bssfp_pad(coef, pk, tile):
    r"""Pad the atom axis to the `(8, tile)` block and reshape to the
    kernels' `(nP, nAp // tile, tile)` layout. Zero pads are inert
    (``a1 = 0``, ``M0 = 0`` keep padded columns at equilibrium-zero;
    their echo cotangents are zero-padded symmetrically)."""
    nA = pk.shape[1]
    blk = _SUB * tile
    pad = (-nA) % blk
    if pad:
        pk = jnp.pad(pk, [(0, 0), (0, pad)])
    nAp = nA + pad
    return pk.reshape(pk.shape[0], nAp // tile, tile), nAp


def _bssfp_fast(coef, pk, *, has_b1, vartr, interpret, tile):
    r"""Unchunked primal: the tuned forward-only kernel."""
    nTRp = coef.shape[1]
    nA = pk.shape[1]
    f32 = jnp.float32
    pkr, nAp = _bssfp_pad(coef, pk, tile)
    nP = pkr.shape[0]
    # NB both output blocks are full (nTRp, 8, tile) VMEM residents
    # (~8 KB per TR at tile=128 for the pair), so trains beyond ~6k TR
    # hit the VMEM cap at compile time — far above any MRF train.
    out = pl.BlockSpec((nTRp, _SUB, tile), lambda i: (0, i, 0))
    outr, outi = pl.pallas_call(
        functools.partial(_bssfp_kernel, nTRp, has_b1, vartr),
        grid=(nAp // (_SUB * tile),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((nP, _SUB, tile), lambda i: (0, i, 0))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTRp, nAp // tile, tile),
                                        f32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, pkr)
    return (outr.reshape(nTRp, nAp)[:, :nA],
            outi.reshape(nTRp, nAp)[:, :nA])


# ==========================================================================
# In-kernel bSSFP adjoint (round 4): hand-transposed fused backward —
# the last train family to leave the recompute-through-XLA VJP.
# Volume-scale direct bSSFP fitting (phase-cycled df/T1/T2 maps, the
# Ma-2013 bSSFP-MRF refinement) holds O(nTR·nV) XLA scan residuals
# otherwise; here the reverse recomputes per chunk in VMEM.
# ==========================================================================

def _bssfp_coef_t(coef_ref, t, b1, has_b1):
    r"""Per-TR RF-rotation coefficients (shared scalars, or per-atom
    planes under ``b1``) — the same arithmetic as ``_bssfp_kernel``'s
    step (kept in sync). Returns ``(ca, sa, A, B, vc, vs, cphi,
    sphi)`` (``sa`` only populated under ``has_b1`` — the no-b1 coef
    rows never need it in either direction)."""
    cphi, sphi = coef_ref[5, t], coef_ref[6, t]
    if has_b1:
        al = coef_ref[7, t] * b1                 # (8, TA)
        ca, sa = jnp.cos(al), jnp.sin(al)
        A, B = sa * sphi, sa * cphi
        oc = 1 - ca
        vc, vs = oc * cphi, oc * sphi
    else:
        ca, A, B = coef_ref[0, t], coef_ref[1, t], coef_ref[2, t]
        vc, vs = coef_ref[3, t], coef_ref[4, t]
        sa = None
    return ca, sa, A, B, vc, vs, cphi, sphi


def _bssfp_relax_t(vartr, pk_ref, coef_ref, t):
    r"""Per-TR relaxation/precession factors: static per-atom planes
    (constant TR/TE) or computed from per-atom rates and the SMEM
    te/rem durations (variable-TR trains) — in sync with
    ``_bssfp_kernel``."""
    if vartr:
        R1, R2, om = pk_ref[0], pk_ref[1], pk_ref[2]
        ten, remn = coef_ref[8, t], coef_ref[9, t]
        pte = om * ten
        cte, ste = jnp.cos(pte), jnp.sin(pte)
        E2te = jnp.exp(-ten * R2)
        a1te = -_nexpm1(ten * R1)
        prem = om * remn
        crem, srem = jnp.cos(prem), jnp.sin(prem)
        E2rem = jnp.exp(-remn * R2)
        a1rem = -_nexpm1(remn * R1)
    else:
        cte, ste = pk_ref[0], pk_ref[1]
        E2te, a1te = pk_ref[2], pk_ref[3]
        crem, srem = pk_ref[4], pk_ref[5]
        E2rem, a1rem = pk_ref[6], pk_ref[7]
    return cte, ste, E2te, a1te, crem, srem, E2rem, a1rem


def _bssfp_m0b1(vartr, pk_ref):
    if vartr:
        return pk_ref[3], pk_ref[4]
    return pk_ref[8], pk_ref[9]


def _bssfp_step(cf, rx, M0, M):
    r"""One full TR (RF → TE relax/precess → echo → remainder), shared
    by the checkpointing forward and the backward's recompute."""
    ca, _, A, B, vc, vs, cphi, sphi = cf
    cte, ste, E2te, a1te, crem, srem, E2rem, a1rem = rx
    Mx, My, Mz = M
    dot = cphi * Mx + sphi * My
    Mx1 = ca * Mx - A * Mz + vc * dot
    My1 = ca * My + B * Mz + vs * dot
    Mz1 = ca * Mz + A * Mx - B * My
    MxE = E2te * (cte * Mx1 - ste * My1)
    MyE = E2te * (ste * Mx1 + cte * My1)
    MzE = (1 - a1te) * Mz1 + a1te * M0
    er = cphi * MxE + sphi * MyE
    ei = cphi * MyE - sphi * MxE
    Mx2 = E2rem * (crem * MxE - srem * MyE)
    My2 = E2rem * (srem * MxE + crem * MyE)
    Mz2 = (1 - a1rem) * MzE + a1rem * M0
    return (Mx2, My2, Mz2), (er, ei)


def _bssfp_fwd_chk_kernel(nP: int, tc: int, ntc: int, has_b1: bool,
                          vartr: bool, coef_ref, pk_ref, outr_ref,
                          outi_ref, chk_ref, s_scr):
    r"""Chunked forward for the VJP path: grid (atom tiles, time
    chunks); the (Mx, My, Mz) state persists in scratch across chunks,
    each chunk's START state streams to ``chk`` for the backward's
    per-chunk recompute. Echo math matches ``_bssfp_kernel``."""
    b1 = pk_ref[nP - 1] if has_b1 else None
    M0, _ = _bssfp_m0b1(vartr, pk_ref)
    j = pl.program_id(1)
    t0 = j * tc

    @pl.when(j == 0)
    def _():
        z = jnp.zeros_like(M0)
        s_scr[0], s_scr[1], s_scr[2] = z, z, M0

    for p in range(3):
        chk_ref[0, p] = s_scr[p]

    def step(t, tl, M):
        cf = _bssfp_coef_t(coef_ref, t, b1, has_b1)
        rx = _bssfp_relax_t(vartr, pk_ref, coef_ref, t)
        M, (er, ei) = _bssfp_step(cf, rx, M0, M)
        outr_ref[pl.ds(tl, 1), :, :] = er[None]
        outi_ref[pl.ds(tl, 1), :, :] = ei[None]
        return M

    u = math.gcd(tc, _UNROLL)

    def body(k, M):
        for jj in range(u):
            tl = k * u + jj
            M = step(t0 + tl, tl, M)
        return M

    M = jax.lax.fori_loop(0, tc // u, body,
                          (s_scr[0], s_scr[1], s_scr[2]))
    s_scr[0], s_scr[1], s_scr[2] = M


def _bssfp_bwd_kernel(nP: int, nC: int, tc: int, ntc: int,
                      has_b1: bool, vartr: bool, coef_ref, pk_ref,
                      chk_ref, gr_ref, gi_ref, dpk_ref, dcf_ref,
                      s_scr, h_scr, acc_scr):
    r"""Two-phase chunk adjoint, chunks visited newest-first. Phase 1
    re-runs the forward from the chunk-START checkpoint, storing every
    pre-RF state; phase 2 walks them backwards — TR-remainder
    transpose → echo-cotangent injection → TE transpose → RF-rotation
    transpose — accumulating per-atom factor grads (``dpk``, matching
    the ``pk`` plane order) and per-TR coefficient rows (``dcf``,
    matching the ``coef`` row order; sublane-reduced lane partials).
    Under ``b1`` the in-kernel flip chain feeds ``db1`` and the flips
    row plus the cphi/sphi rows' A/B/vc/vs dependence (in the no-b1
    mode those chains live in the dispatcher's autodiff)."""
    b1 = pk_ref[nP - 1] if has_b1 else None
    M0, _ = _bssfp_m0b1(vartr, pk_ref)
    j = pl.program_id(1)
    t0 = (ntc - 1 - j) * tc

    @pl.when(j == 0)
    def _():
        z = jnp.zeros_like(M0)
        for p in range(3):
            h_scr[p] = z
        for a in range(nP):
            acc_scr[a] = z

    # ---- phase 1: forward recompute, storing pre-RF states ---------
    u = math.gcd(tc, _UNROLL)

    def fbody(k, M):
        for jj in range(u):
            tl = k * u + jj
            for p in range(3):
                s_scr[tl, p] = M[p]
            cf = _bssfp_coef_t(coef_ref, t0 + tl, b1, has_b1)
            rx = _bssfp_relax_t(vartr, pk_ref, coef_ref, t0 + tl)
            M, _ = _bssfp_step(cf, rx, M0, M)
        return M

    jax.lax.fori_loop(0, tc // u, fbody,
                      (chk_ref[0, 0], chk_ref[0, 1], chk_ref[0, 2]))

    def ksum(x):
        return jnp.sum(x, axis=0, keepdims=True)     # (1, TA)

    # ---- phase 2: transposed recursion over the stored states ------
    def bstep(t, tl, carry):
        hx2, hy2, hz2 = carry[:3]
        acc = list(carry[3:])
        Mx = s_scr[tl, 0]
        My = s_scr[tl, 1]
        Mz = s_scr[tl, 2]
        cf = _bssfp_coef_t(coef_ref, t, b1, has_b1)
        ca, sa, A, B, vc, vs, cphi, sphi = cf
        rx = _bssfp_relax_t(vartr, pk_ref, coef_ref, t)
        cte, ste, E2te, a1te, crem, srem, E2rem, a1rem = rx

        # recompute the step's intermediates
        dot = cphi * Mx + sphi * My
        Mx1 = ca * Mx - A * Mz + vc * dot
        My1 = ca * My + B * Mz + vs * dot
        Mz1 = ca * Mz + A * Mx - B * My
        MxE = E2te * (cte * Mx1 - ste * My1)
        MyE = E2te * (ste * Mx1 + cte * My1)
        MzE = (1 - a1te) * Mz1 + a1te * M0

        # TR-remainder transpose + factor grads
        d_E2rem = hx2 * (crem * MxE - srem * MyE) \
            + hy2 * (srem * MxE + crem * MyE)
        d_crem = E2rem * (hx2 * MxE + hy2 * MyE)
        d_srem = E2rem * (hy2 * MxE - hx2 * MyE)
        d_a1rem = hz2 * (M0 - MzE)
        d_M0 = a1rem * hz2
        hxE = E2rem * (crem * hx2 + srem * hy2)
        hyE = E2rem * (crem * hy2 - srem * hx2)
        hzE = (1 - a1rem) * hz2

        # echo-cotangent injection (echo reads the TE state)
        gyr = gr_ref[tl, :, :]
        gyi = gi_ref[tl, :, :]
        d_cphi = gyr * MxE + gyi * MyE
        d_sphi = gyr * MyE - gyi * MxE
        hxE = hxE + cphi * gyr - sphi * gyi
        hyE = hyE + sphi * gyr + cphi * gyi

        # TE transpose + factor grads
        d_E2te = hxE * (cte * Mx1 - ste * My1) \
            + hyE * (ste * Mx1 + cte * My1)
        d_cte = E2te * (hxE * Mx1 + hyE * My1)
        d_ste = E2te * (hyE * Mx1 - hxE * My1)
        d_a1te = hzE * (M0 - Mz1)
        d_M0 = d_M0 + a1te * hzE
        hx1 = E2te * (cte * hxE + ste * hyE)
        hy1 = E2te * (cte * hyE - ste * hxE)
        hz1 = (1 - a1te) * hzE

        # RF-rotation transpose + coefficient grads
        d_ca = hx1 * Mx + hy1 * My + hz1 * Mz
        d_A = hz1 * Mx - hx1 * Mz
        d_B = hy1 * Mz - hz1 * My
        d_vc = hx1 * dot
        d_vs = hy1 * dot
        hdot = vc * hx1 + vs * hy1
        d_cphi = d_cphi + hdot * Mx
        d_sphi = d_sphi + hdot * My
        hx = ca * hx1 + A * hz1 + cphi * hdot
        hy = ca * hy1 - B * hz1 + sphi * hdot
        hz = -A * hx1 + B * hy1 + ca * hz1

        zrow = jnp.zeros((1, d_ca.shape[1]), d_ca.dtype)
        if has_b1:
            # al = flips[t]·b1: chain A/B/vc/vs back to (al, φ) here —
            # the dispatcher's autodiff can't see in-kernel products
            d_sa = sphi * d_A + cphi * d_B
            d_catot = d_ca - cphi * d_vc - sphi * d_vs
            d_al = ca * d_sa - sa * d_catot
            acc[nP - 1] = acc[nP - 1] + d_al * coef_ref[7, t]
            d_cphi = d_cphi + sa * d_B + (1 - ca) * d_vc
            d_sphi = d_sphi + sa * d_A + (1 - ca) * d_vs
            rows = [zrow, zrow, zrow, zrow, zrow,
                    ksum(d_cphi), ksum(d_sphi), ksum(d_al * b1)]
        else:
            rows = [ksum(d_ca), ksum(d_A), ksum(d_B), ksum(d_vc),
                    ksum(d_vs), ksum(d_cphi), ksum(d_sphi), zrow]

        if vartr:
            R1, R2, om = pk_ref[0], pk_ref[1], pk_ref[2]
            ten, remn = coef_ref[8, t], coef_ref[9, t]
            d_pte = cte * d_ste - ste * d_cte
            d_prem = crem * d_srem - srem * d_crem
            acc[2] = acc[2] + d_pte * ten + d_prem * remn      # d_om
            acc[1] = acc[1] - ten * E2te * d_E2te \
                - remn * E2rem * d_E2rem                       # d_R2
            acc[0] = acc[0] + ten * (1 - a1te) * d_a1te \
                + remn * (1 - a1rem) * d_a1rem                 # d_R1
            acc[3] = acc[3] + d_M0
            rows.append(ksum(om * d_pte - R2 * E2te * d_E2te
                             + R1 * (1 - a1te) * d_a1te))      # d_te
            rows.append(ksum(om * d_prem - R2 * E2rem * d_E2rem
                             + R1 * (1 - a1rem) * d_a1rem))    # d_rem
        else:
            for a, v in enumerate((d_cte, d_ste, d_E2te, d_a1te,
                                   d_crem, d_srem, d_E2rem, d_a1rem,
                                   d_M0)):
                acc[a] = acc[a] + v

        for c in range(nC):
            dcf_ref[0, tl, c] = rows[c][0]
        return (hx, hy, hz) + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[p] for p in range(3))
        + tuple(acc_scr[a] for a in range(nP)))
    for p in range(3):
        h_scr[p] = carry[p]
    for a in range(nP):
        acc_scr[a] = carry[3 + a]

    @pl.when(j == ntc - 1)
    def _():
        # cotangent at the initial state (0, 0, M0)
        im0 = 3 if vartr else 8
        for a in range(nP):
            v = carry[3 + a]
            if a == im0:
                v = v + carry[2]
            dpk_ref[a] = v


_BSSFP_TILE = 128                  # lanes per backward atom tile


def _pick_tc_bssfp(nTR: int) -> int:
    r"""Backward time-chunk: bound the per-chunk pre-RF state scratch
    ``(tc, 3, 8, _BSSFP_TILE)`` to ~6 MB while dividing the (already
    _UNROLL-padded) train, preferring unroll-multiple divisors."""
    from mrphy_tpu.utils._shapes import largest_divisor_leq_pref
    bound = max(1, (6 << 20) // (3 * _SUB * _BSSFP_TILE * 4))
    if nTR <= bound:
        return nTR
    return largest_divisor_leq_pref(nTR, bound, _UNROLL)


def bssfp_bwd_is_available(*, nTR: int, nA: int) -> bool:
    r"""Whether the fused bSSFP adjoint fits (it essentially always
    does — the isochromat state is 3 planes): per-chunk scratch in
    VMEM, bounded HBM for the checkpoint/coefficient partials."""
    nTRp = nTR + (-nTR) % _UNROLL
    tc = _pick_tc_bssfp(nTRp)
    if nTRp % tc:
        return False
    ntc = nTRp // tc
    scr = tc * 3 * _SUB * _BSSFP_TILE * 4
    ntiles = -(-nA // (_SUB * _BSSFP_TILE))
    chk = ntc * 3 * ntiles * _SUB * _BSSFP_TILE * 4
    dcf = ntiles * nTRp * 10 * _BSSFP_TILE * 4
    return (scr <= 20 * 1024 * 1024 and chk <= 2 * 1024 ** 3
            and dcf <= 2 * 1024 ** 3)


def _bssfp_fwd_chk(coef, pk, *, has_b1, vartr, interpret):
    nTRp = coef.shape[1]
    nA = pk.shape[1]
    tile = _BSSFP_TILE
    pkr, nAp = _bssfp_pad(coef, pk, tile)
    nP = pkr.shape[0]
    tc = _pick_tc_bssfp(nTRp)
    ntc = nTRp // tc
    out = pl.BlockSpec((tc, _SUB, tile), lambda i, j: (j, i, 0))
    chk = pl.BlockSpec((1, 3, _SUB, tile), lambda i, j: (j, 0, i, 0))
    outr, outi, chka = pl.pallas_call(
        functools.partial(_bssfp_fwd_chk_kernel, nP, tc, ntc, has_b1,
                          vartr),
        grid=(nAp // (_SUB * tile), ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((nP, _SUB, tile), lambda i, j: (0, i, 0))],
        out_specs=[out, out, chk],
        out_shape=[jax.ShapeDtypeStruct((nTRp, nAp // tile, tile),
                                        jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((ntc, 3, nAp // tile, tile),
                                jnp.float32)],
        scratch_shapes=[pltpu.VMEM((3, _SUB, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, pkr)
    return (outr.reshape(nTRp, nAp)[:, :nA],
            outi.reshape(nTRp, nAp)[:, :nA], chka)


def _bssfp_bwd_call(coef, pk, chka, gr, gi, *, has_b1, vartr,
                    interpret):
    r"""Returns ``(dcoef (nC, nTRp), dpk (nP, nA))``."""
    nC, nTRp = coef.shape
    nA = pk.shape[1]
    tile = _BSSFP_TILE
    pkr, nAp = _bssfp_pad(coef, pk, tile)
    nP = pkr.shape[0]
    grp = jnp.pad(gr, [(0, 0), (0, nAp - nA)]).reshape(
        nTRp, nAp // tile, tile)
    gip = jnp.pad(gi, [(0, 0), (0, nAp - nA)]).reshape(
        nTRp, nAp // tile, tile)
    tc = _pick_tc_bssfp(nTRp)
    ntc = nTRp // tc
    ntiles = nAp // (_SUB * tile)
    gsp = pl.BlockSpec((tc, _SUB, tile), lambda i, j: (ntc - 1 - j, i, 0))
    chk = pl.BlockSpec((1, 3, _SUB, tile),
                       lambda i, j: (ntc - 1 - j, 0, i, 0))
    dpk, dcf = pl.pallas_call(
        functools.partial(_bssfp_bwd_kernel, nP, nC, tc, ntc, has_b1,
                          vartr),
        grid=(ntiles, ntc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((nP, _SUB, tile), lambda i, j: (0, i, 0)),
                  chk, gsp, gsp],
        out_specs=[pl.BlockSpec((nP, _SUB, tile),
                                lambda i, j: (0, i, 0)),
                   pl.BlockSpec((1, tc, nC, tile),
                                lambda i, j: (i, ntc - 1 - j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nP, nAp // tile, tile),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, nTRp, nC, tile),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tc, 3, _SUB, tile), jnp.float32),
                        pltpu.VMEM((3, _SUB, tile), jnp.float32),
                        pltpu.VMEM((nP, _SUB, tile), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, pkr, chka, grp, gip)
    dcoef = jnp.sum(dcf, axis=(0, 3)).T            # (nC, nTRp)
    dpk = dpk.reshape(nP, nAp)[:, :nA]
    return dcoef, dpk


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _bssfp_core(has_b1, vartr, interpret, tile, coef, pk):
    r"""Differentiable fused bSSFP train core. The primal runs the
    fast unchunked kernel; under differentiation the forward emits
    chunk checkpoints and the backward is the hand-transposed fused
    adjoint (``_bssfp_bwd_kernel``) — gradients at kernel speed, no
    recompute-through-XLA reverse."""
    return _bssfp_fast(coef, pk, has_b1=has_b1, vartr=vartr,
                       interpret=interpret, tile=tile)


def _bssfp_core_fwd(has_b1, vartr, interpret, tile, coef, pk):
    outr, outi, chka = _bssfp_fwd_chk(coef, pk, has_b1=has_b1,
                                      vartr=vartr, interpret=interpret)
    return (outr, outi), (coef, pk, chka)


def _bssfp_core_bwd(has_b1, vartr, interpret, tile, res, g):
    coef, pk, chka = res
    gr, gi = g
    dcoef, dpk = _bssfp_bwd_call(coef, pk, chka, gr, gi,
                                 has_b1=has_b1, vartr=vartr,
                                 interpret=interpret)
    if not has_b1:
        dpk = dpk.at[-1].set(0.0)
    return dcoef, dpk


_bssfp_core.defvjp(_bssfp_core_fwd, _bssfp_core_bwd)


def bssfp_train_pallas(flips, *, T1, T2, tr, df=0.0, te=None,
                       phis=None, dphi=None, M0=1.0, b1=None,
                       tile: int = 128, interpret=None):
    r"""Fused-TPU transient bSSFP train — off-resonance-sensitive
    (Ma 2013) MRF dictionaries at volume scale.

    Same semantics as :func:`mrphy_tpu.ops.ssfp.bssfp_train` restricted
    to the dictionary workload: shared 1-D ``flips``/``phis`` `(nTR,)`
    trains, 1-D atom batch ``T1``/``T2``/``df``/``M0`` `(nAtoms,)`
    (scalars broadcast), equilibrium start. ``tr``/``te`` may be
    scalars (zero in-kernel transcendentals) or `(nTR,)` variable
    trains (computed in-kernel). ``b1`` `(nAtoms,)` scales the whole
    flip train per atom — the dictionary's B1+ dimension (equivalent
    to the XLA path's batched ``b1[:, None] * flips``). Returns
    `(nAtoms, nTR, 2)`. Differentiable: ``jax.grad`` runs the
    in-kernel hand-transposed adjoint (``_bssfp_bwd_kernel``).
    ``tile`` lanes × 8 sublanes of atoms per grid step.
    """
    from mrphy_tpu import pi as _pi
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nTR,) train'
    nTR = flips.shape[0]
    f32 = jnp.float32
    if phis is None:
        # identical arithmetic to the XLA path's default schedule
        dphi = _pi if dphi is None else dphi
        phis = jnp.asarray(dphi, f32) * jnp.arange(nTR, dtype=f32)
    else:
        assert dphi is None, 'phis and dphi are mutually exclusive'
        phis = jnp.asarray(phis)
        assert phis.shape == flips.shape, (phis.shape, flips.shape)
    vartr = (jnp.ndim(tr) == 1) or (te is not None and jnp.ndim(te) == 1)
    trs = jnp.broadcast_to(jnp.asarray(tr, f32), (nTR,))
    tes = trs / 2 if te is None else jnp.broadcast_to(
        jnp.asarray(te, f32), (nTR,))
    pars = [jnp.atleast_1d(jnp.asarray(x, f32)) for x in
            (T1, T2, df, M0, 1.0 if b1 is None else b1)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    sig = _bssfp_dispatch(flips, phis, trs, tes, *pars, tile=tile,
                          interpret=interpret, has_b1=b1 is not None,
                          vartr=vartr)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nTR, 2)
