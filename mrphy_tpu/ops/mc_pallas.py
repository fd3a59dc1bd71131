r"""Fused two-pool Bloch–McConnell TPU kernels (MT/CEST at volume scale).

The oracle (:func:`mrphy_tpu.ops.slowsims.blochsim_mc`) streams a fully
materialized B-effective — at whole-brain CEST scale (1M voxels × 10k
saturation steps) that array alone is 120 GB and cannot exist. These
kernels mirror the fused single-pool engine
(:mod:`mrphy_tpu.ops.pallas_kernels`): the rf/gr *waveforms* live in
SMEM, the per-voxel fields (loc, Δf, B1) and the ten exact
exchange/relaxation propagator planes live in VMEM, and B-effective is
assembled per step inside the time loop — O(nM) memory for any nT.

Per step and per voxel: pool a rotates about the assembled field, pool b
about the same field plus its chemical-shift offset (one extra z term —
a second sincos), then the exact 2×2 exchange/relaxation propagators mix
the pools (12 mul + 8 add). Same structure-of-arrays ``(k, S1, 128)``
layout, polynomial sincos, and manual unroll as the single-pool kernels.

**The backward kernel is a two-phase chunk adjoint, NOT the single-pool
reverse reconstruction.** The single-pool adjoint inverts each step
(bounded-rounding via chunk checkpoints) — sound there because inverse
relaxation amplifies by only exp(tc·dt/T2). Here the exchange mix can
be strongly CONTRACTING: an MT bound pool has T2b of tens of µs, so the
transverse propagator ``X ≈ 0`` destroys information and its inverse
amplifies as exp(tc·dt/T2b) → overflow within one chunk. Instead, the
forward streams chunk-START states (`chk`), and the backward, per time
chunk (visited newest-first): phase 1 re-runs the forward over the
chunk, storing all ``tc`` per-step two-pool states in VMEM scratch;
phase 2 walks the stored states backwards, applying the hand-derived
cotangent recursion (mix-transpose → per-pool rotation adjoints → field
/ waveform / propagator-plane gradient accumulation). Numerically this
is autodiff-equivalent (no inversions anywhere), with O(nM·tc) VMEM and
O(nM·ntc) HBM residuals. Reference analog: the cached-trajectory
adjoint recursion at ``/root/reference/mrphy/sims.py:195-261`` (which
also never inverts — it caches the forward history).

Gradient surface: ``dmi`` (both pools), ``drf``/``dgr`` (waveform
reductions), ``dloc``/``ddfg``/``db1``/``dsb`` (per-voxel fields), and
``dX``/``dZ`` (the ten propagator planes — the caller chains these
through :func:`mrphy_tpu.ops.slowsims.mc_propagators` by autodiff, so
tissue/exchange-parameter gradients flow at kernel speed).

No counterpart exists in the reference (``/root/reference/mrphy``
simulates a single pool only); the two-pool family is a beyond-reference
extension cross-validated against exact 2×2 exchange solutions in
``tests/test_mc.py``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrphy_tpu.ops.pallas_kernels import (
    _LANE, _MIN_AUTO_SPINS, _PHI_EPS, _SMEM_BUDGET, _UNROLL, _VMEM_LIMIT,
    _assemble_b_tile, _fast_sincos, _on_tpu, _pick_ts)
from mrphy_tpu.utils._shapes import largest_divisor_leq_pref

__all__ = ['mc_is_available', 'mc_bwd_is_available', 'mc_fwd_planes',
           'mc_bwd_planes']


def mc_is_available(*, N: int, dtype, nspins: int = _MIN_AUTO_SPINS,
                    nT: int = 0, nC: int = 1) -> bool:
    r"""Whether the fused two-pool kernel supports this instance (f32,
    big-enough spin count to beat the XLA scan's compile/dispatch, and
    waveforms that fit the 1 MB SMEM — rows pad to 512 B). Forward-only:
    ``backend='auto'`` in :func:`mrphy_tpu.ops.mc.blochsim_mc_rfgr`
    routes here and keeps gradients correct via the XLA-recompute VJP."""
    nT = max(nT, 1)
    row = -(-nT * 4 // 512) * 512                  # padded bytes per row
    smem_bytes = N * (2 * nC + 3) * row
    return (jnp.dtype(dtype) == jnp.float32
            and nspins >= _MIN_AUTO_SPINS
            and smem_bytes <= _SMEM_BUDGET
            and _on_tpu())


def _mc_rot(bx, by, bz, mx, my, mz, small):
    r"""Rodrigues step rotation (the Bloch −φ sign is folded into the
    cross term): m₁ = m − s·(u×m) + (c−1)·(m − (uᵀm)·u)."""
    n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
    inv = jax.lax.rsqrt(n2)
    phi = n2 * inv
    ux, uy, uz = bx * inv, by * inv, bz * inv
    s, c = _fast_sincos(phi, small)
    c1 = c - 1.0
    utm = ux * mx + uy * my + uz * mz
    return (mx - s * (uy * mz - uz * my) + c1 * (mx - utm * ux),
            my - s * (uz * mx - ux * mz) + c1 * (my - utm * uy),
            mz - s * (ux * my - uy * mx) + c1 * (mz - utm * uz))


def _mc_fwd_kernel(tc: int, ntc: int, nC: int, has_dfg: bool,
                   has_b1: bool, small: bool, rf_ref, gr_ref, mi_ref,
                   loc_ref, g2pd_ref, sb_ref, x_ref, z_ref, *refs):
    r"""One (batch, spin tile, time chunk) grid cell: ``tc`` steps of
    the two-pool evolution with both pools' states persisted in VMEM
    scratch across chunks. Each chunk's START state streams to the
    ``chk`` output (the backward's per-chunk forward-recompute restarts
    from these); the final state streams to ``out`` on the last chunk.
    Positional refs after the fixed lead: [dfg], [b1], chk, out,
    m_scr."""
    i = 0
    dfg_ref = b1_ref = None
    if has_dfg:
        dfg_ref = refs[i]
        i += 1
    if has_b1:
        b1_ref = refs[i]
        i += 1
    chk_ref, out_ref, m_scr = refs[i], refs[i + 1], refs[i + 2]
    n = pl.program_id(0)
    j = pl.program_id(2)              # time chunk, oldest-first
    t0 = j * tc

    locx, locy, locz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    g2pd = g2pd_ref[0]
    sb = sb_ref[0]                       # pool-b z offset, rad/step
    dfg = dfg_ref[0] if has_dfg else None
    X00, X01, X10, X11 = x_ref[0, 0], x_ref[0, 1], x_ref[0, 2], x_ref[0, 3]
    Z00, Z01, Z10, Z11, ca, cb = (z_ref[0, k] for k in range(6))

    @pl.when(j == 0)
    def _():
        for k in range(6):
            m_scr[k] = mi_ref[0, k]

    def step(t, m):
        ax, ay, az, bx, by, bz = m
        fx, fy, fz = _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref,
                                      gr_ref, locx, locy, locz, dfg,
                                      b1_ref, g2pd)
        a1x, a1y, a1z = _mc_rot(fx, fy, fz, ax, ay, az, small)
        b1x, b1y, b1z = _mc_rot(fx, fy, fz + sb, bx, by, bz, small)
        return (X00 * a1x + X01 * b1x,
                X00 * a1y + X01 * b1y,
                Z00 * a1z + Z01 * b1z + ca,
                X10 * a1x + X11 * b1x,
                X10 * a1y + X11 * b1y,
                Z10 * a1z + Z11 * b1z + cb)

    # Mosaic fori_loop only supports unroll=1 or full; unroll manually
    u = math.gcd(tc, _UNROLL)

    def body(k, m):
        for jj in range(u):
            m = step(t0 + k * u + jj, m)
        return m

    m = tuple(m_scr[k] for k in range(6))
    for k in range(6):
        chk_ref[0, 0, k] = m[k]          # chunk-START state
    m = jax.lax.fori_loop(0, tc // u, body, m)
    for k in range(6):
        m_scr[k] = m[k]

    @pl.when(j == ntc - 1)
    def _():
        for k in range(6):
            out_ref[0, k] = m[k]


def _pick_ts_bwd(S1: int) -> int:
    r"""Backward sublane tile: small, so the per-chunk state scratch
    (tc, 6, ts, 128) stays within VMEM at a useful ``tc``."""
    return math.gcd(S1, 32)


def _pick_tc_mc(nT: int, S1: int) -> int:
    r"""Shared fwd/bwd time-chunk length: bound the backward's per-chunk
    two-pool state scratch (tc, 6, ts_bwd, 128) to ~16 MB while dividing
    ``nT``. Short pulses take a single chunk; divisor-poor ``nT`` (e.g.
    prime) falls back to a single chunk — ``mc_bwd_is_available`` then
    gates on that single chunk's scratch, routing such instances to the
    recompute-through-XLA adjoint instead."""
    ts = _pick_ts_bwd(S1)
    bound = max(1, (16 << 20) // (6 * ts * _LANE * 4))
    if nT <= bound:
        return nT
    tc = largest_divisor_leq_pref(nT, bound, _UNROLL)
    return tc if tc >= 32 else nT


def mc_bwd_is_available(*, nT: int, S1: int, nC: int = 1,
                        ntiles_hbm_n: int = 1) -> bool:
    r"""Whether the fused two-pool adjoint kernel fits this instance:
    the (single-chunk fallback included) state scratch must fit VMEM and
    the HBM waveform-grad partials stay bounded (cf.
    ``pallas_kernels.rfgr_is_available``)."""
    ts = _pick_ts_bwd(S1)
    tc = _pick_tc_mc(nT, S1)
    scr = tc * 6 * ts * _LANE * 4
    K = 3 + 2 * nC
    ntiles = S1 // ts
    dwf_hbm = ntiles_hbm_n * ntiles * nT * K * _LANE * 4
    return scr <= 24 * 1024 * 1024 and dwf_hbm <= 2 * 1024 ** 3


def mc_fwd_planes(mi6, rf2, gr2, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd, *,
                  ts=None, tc=None, small_phi: bool = False,
                  interpret: bool = False):
    r"""Pallas forward, batched planes layout. Returns ``(out, chk)``:
    the final two-pool state ``(N, 6, S1, L)`` (planes ``[ax, ay, az,
    bx, by, bz]``) and the chunk-START checkpoints `(N, ntc, 6, S1, L)`
    consumed by :func:`mc_bwd_planes` (``tc`` must match; the default
    shared rule is :func:`_pick_tc_mc`).

    ``mi6``: `(N, 6, S1, L)`; ``loc_p``: `(N, 3, S1, L)` (pre-scaled by
    γ2πdt); ``dfg``/``sb``/``g2pd``: `(N, S1, L)` (``dfg`` = 2πdt·df or
    None; ``sb`` = 2πdt·dfb); ``b1_p``: `(N, 2C, S1, L)` pre-scaled, or
    None; ``Xp``: `(N, 4, S1, L)`; ``Zp``: `(N, 6, S1, L)` (Z00, Z01,
    Z10, Z11, ca, cb); ``rf2``: `(N, 2C, nT)`; ``gr2``: `(N, 3, nT)`
    (waveforms in SMEM, (k, nT)-ordered because rows pad to 512 B).
    """
    N, _, S1, _ = mi6.shape
    nT = gr2.shape[-1]
    nC = rf2.shape[1] // 2
    ts = _pick_ts(S1) if ts is None else ts
    tc = _pick_tc_mc(nT, S1) if tc is None else tc
    assert S1 % ts == 0, (S1, ts)
    assert nT % tc == 0, (nT, tc)
    ntc = nT // tc
    grid = (N, S1 // ts, ntc)
    has_dfg, has_b1 = dfg is not None, b1_p is not None

    def tile(k):
        return pl.BlockSpec((1, k, ts, _LANE),
                            lambda n, i, *_: (n, 0, i, 0),
                            memory_space=pltpu.VMEM)

    tile1 = pl.BlockSpec((1, ts, _LANE), lambda n, i, *_: (n, i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [smem, smem, tile(6), tile(3), tile1, tile1, tile(4),
                tile(6)]
    args = [rf2, gr2, mi6, loc_p, g2pd, sb, Xp, Zp]
    if has_dfg:
        in_specs.append(tile1)
        args.append(dfg)
    if has_b1:
        in_specs.append(tile(2 * nC))
        args.append(b1_p)

    kernel = functools.partial(_mc_fwd_kernel, tc, ntc, nC, has_dfg,
                               has_b1, small_phi)
    chk, out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, 1, 6, ts, _LANE),
                                lambda n, i, j: (n, j, 0, i, 0),
                                memory_space=pltpu.VMEM),
                   tile(6)),
        out_shape=(jax.ShapeDtypeStruct((N, ntc, 6, S1, _LANE),
                                        mi6.dtype),
                   jax.ShapeDtypeStruct((N, 6, S1, _LANE), mi6.dtype)),
        scratch_shapes=[pltpu.VMEM((6, ts, _LANE), mi6.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return out, chk


def _mc_bwd_kernel(tc: int, ntc: int, nC: int, has_dfg: bool,
                   has_b1: bool, small: bool, rf_ref, gr_ref, *refs):
    r"""Two-phase chunk adjoint for one (batch, spin tile, time chunk)
    grid cell, chunks visited newest-first. Phase 1 re-runs the forward
    from this chunk's START checkpoint, storing every per-step two-pool
    state in VMEM scratch; phase 2 walks them backwards: accumulate the
    propagator-plane cotangents (dX/dZ/dca/dcb), transpose the exchange
    mix, run both pools' rotation adjoints (cotangent back-rotation +
    the ∂L/∂b field formula), reduce waveform gradients to SMEM-row
    shape, and accumulate per-voxel field gradients. No step inversion
    anywhere — sound for arbitrarily contracting exchange (µs-T2b MT
    pools), unlike the single-pool reverse reconstruction.

    Positional refs (after rf/gr): chk, g, loc, g2pd, sb, x, z, [dfg],
    [b1]; outs: dmi, dwf, dloc, dsb, dx, dz, [ddfg], [db1]; scratch:
    m_scr (tc, 6, ts, L), h_scr (6, ts, L), acc_scr (n_acc, ts, L).
    ``dwf`` rows: [dgx, dgy, dgz, drf_x coils..., drf_y coils...] as
    (LANE,) sublane-partials. Accumulator layout: [dloc×3, dsb, dX×4,
    dZ×6, (ddfg), (db1×2C)]."""
    i = 0
    (chk_ref, g_ref, loc_ref, g2pd_ref, sb_ref, x_ref,
     z_ref) = refs[i:i + 7]
    i += 7
    dfg_ref = b1_ref = None
    if has_dfg:
        dfg_ref = refs[i]
        i += 1
    if has_b1:
        b1_ref = refs[i]
        i += 1
    (dmi_ref, dwf_ref, dloc_ref, dsb_ref, dx_ref, dz_ref) = refs[i:i + 6]
    i += 6
    ddfg_ref = db1g_ref = None
    if has_dfg:
        ddfg_ref = refs[i]
        i += 1
    if has_b1:
        db1g_ref = refs[i]
        i += 1
    m_scr, h_scr, acc_scr = refs[i], refs[i + 1], refs[i + 2]

    n = pl.program_id(0)
    j = pl.program_id(2)              # time chunk, newest-first
    t0 = (ntc - 1 - j) * tc           # first absolute step of this chunk

    locx, locy, locz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    g2pd = g2pd_ref[0]
    sb = sb_ref[0]
    dfg = dfg_ref[0] if has_dfg else None
    X00, X01, X10, X11 = x_ref[0, 0], x_ref[0, 1], x_ref[0, 2], x_ref[0, 3]
    Z00, Z01, Z10, Z11 = (z_ref[0, k] for k in range(4))

    n_acc = 14 + int(has_dfg) + (2 * nC if has_b1 else 0)

    @pl.when(j == 0)
    def _():
        for k in range(6):
            h_scr[k] = g_ref[0, k]
        z = jnp.zeros_like(g2pd)
        for a in range(n_acc):
            acc_scr[a] = z

    def field(t):
        fx, fy, fz = _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref,
                                      gr_ref, locx, locy, locz, dfg,
                                      b1_ref, g2pd)
        return fx, fy, fz

    # ---- phase 1: forward recompute, storing per-step states --------
    def fstep(t, m):
        ax, ay, az, bx, by, bz = m
        fx, fy, fz = field(t)
        a1x, a1y, a1z = _mc_rot(fx, fy, fz, ax, ay, az, small)
        b1x, b1y, b1z = _mc_rot(fx, fy, fz + sb, bx, by, bz, small)
        ca, cb = z_ref[0, 4], z_ref[0, 5]
        return (X00 * a1x + X01 * b1x,
                X00 * a1y + X01 * b1y,
                Z00 * a1z + Z01 * b1z + ca,
                X10 * a1x + X11 * b1x,
                X10 * a1y + X11 * b1y,
                Z10 * a1z + Z11 * b1z + cb)

    u = math.gcd(tc, _UNROLL)

    def fbody(k, m):
        for jj in range(u):
            tl = k * u + jj
            for p in range(6):
                m_scr[tl, p] = m[p]
            m = fstep(t0 + tl, m)
        return m

    jax.lax.fori_loop(0, tc // u, fbody,
                      tuple(chk_ref[0, 0, k] for k in range(6)))

    # ---- phase 2: cotangent recursion over the stored states --------
    def rot_adj(fx, fy, fz, m0x, m0y, m0z, htx, hty, htz):
        r"""Given the rotation INPUT state m0 and the cotangent h̃ at
        the rotation OUTPUT: the rotation output m1, the cotangent h0
        at the input (h̃ rotated back), and ∂L/∂b — identical algebra
        to the single-pool ``_rfgr_bwd_kernel`` step."""
        n2 = jnp.maximum(fx * fx + fy * fy + fz * fz, _PHI_EPS ** 2)
        inv = jax.lax.rsqrt(n2)
        phi = n2 * inv
        ux, uy, uz = fx * inv, fy * inv, fz * inv
        s, c = _fast_sincos(phi, small)
        c1 = c - 1.0
        utm = ux * m0x + uy * m0y + uz * m0z
        m1x = m0x - s * (uy * m0z - uz * m0y) + c1 * (m0x - utm * ux)
        m1y = m0y - s * (uz * m0x - ux * m0z) + c1 * (m0y - utm * uy)
        m1z = m0z - s * (ux * m0y - uy * m0x) + c1 * (m0z - utm * uz)

        uth = ux * htx + uy * hty + uz * htz
        h0x = htx + s * (uy * htz - uz * hty) + c1 * (htx - uth * ux)
        h0y = hty + s * (uz * htx - ux * htz) + c1 * (hty - uth * uy)
        h0z = htz + s * (ux * hty - uy * htx) + c1 * (htz - uth * uz)

        sp, c1p = s * inv, c1 * inv
        mxhx, mxhy, mxhz = (m0y * htz - m0z * hty,
                            m0z * htx - m0x * htz,
                            m0x * hty - m0y * htx)
        T = ux * mxhx + uy * mxhy + uz * mxhz
        hm = htx * m0x + hty * m0y + htz * m0z
        K = (sp - c) * T + (2 * c1p + s) * utm * uth - s * hm
        dbx = -sp * mxhx - c1p * (uth * m0x + utm * htx) + K * ux
        dby = -sp * mxhy - c1p * (uth * m0y + utm * hty) + K * uy
        dbz = -sp * mxhz - c1p * (uth * m0z + utm * htz) + K * uz
        return (m1x, m1y, m1z), (h0x, h0y, h0z), (dbx, dby, dbz)

    def bstep(t, tl, carry):
        hax, hay, haz, hbx, hby, hbz = carry[:6]
        acc = list(carry[6:])
        ax, ay, az = m_scr[tl, 0], m_scr[tl, 1], m_scr[tl, 2]
        bx, by, bz = m_scr[tl, 3], m_scr[tl, 4], m_scr[tl, 5]
        fx, fy, fz = field(t)

        # mix transpose: cotangents at the two rotation outputs
        ha1x = X00 * hax + X10 * hbx
        ha1y = X00 * hay + X10 * hby
        ha1z = Z00 * haz + Z10 * hbz
        hb1x = X01 * hax + X11 * hbx
        hb1y = X01 * hay + X11 * hby
        hb1z = Z01 * haz + Z11 * hbz

        a1, h0a, dba = rot_adj(fx, fy, fz, ax, ay, az,
                               ha1x, ha1y, ha1z)
        b1, h0b, dbb = rot_adj(fx, fy, fz + sb, bx, by, bz,
                               hb1x, hb1y, hb1z)

        # propagator-plane cotangents (dX, dZ, dca, dcb)
        acc[4] = acc[4] + hax * a1[0] + hay * a1[1]          # dX00
        acc[5] = acc[5] + hax * b1[0] + hay * b1[1]          # dX01
        acc[6] = acc[6] + hbx * a1[0] + hby * a1[1]          # dX10
        acc[7] = acc[7] + hbx * b1[0] + hby * b1[1]          # dX11
        acc[8] = acc[8] + haz * a1[2]                        # dZ00
        acc[9] = acc[9] + haz * b1[2]                        # dZ01
        acc[10] = acc[10] + hbz * a1[2]                      # dZ10
        acc[11] = acc[11] + hbz * b1[2]                      # dZ11
        acc[12] = acc[12] + haz                              # dca
        acc[13] = acc[13] + hbz                              # dcb

        dbx = dba[0] + dbb[0]
        dby = dba[1] + dbb[1]
        dbz = dba[2] + dbb[2]
        acc[3] = acc[3] + dbb[2]                             # dsb

        # waveform-grad sublane reductions → (LANE,) rows
        dwf_ref[0, 0, tl, 0] = jnp.sum(dbz * locx, axis=0)
        dwf_ref[0, 0, tl, 1] = jnp.sum(dbz * locy, axis=0)
        dwf_ref[0, 0, tl, 2] = jnp.sum(dbz * locz, axis=0)
        if has_b1:
            for cc in range(nC):
                dwf_ref[0, 0, tl, 3 + cc] = jnp.sum(
                    b1_ref[0, cc] * dbx + b1_ref[0, nC + cc] * dby,
                    axis=0)
                dwf_ref[0, 0, tl, 3 + nC + cc] = jnp.sum(
                    b1_ref[0, cc] * dby - b1_ref[0, nC + cc] * dbx,
                    axis=0)
        else:
            sx = jnp.sum(g2pd * dbx, axis=0)
            sy = jnp.sum(g2pd * dby, axis=0)
            for cc in range(nC):
                dwf_ref[0, 0, tl, 3 + cc] = sx
                dwf_ref[0, 0, tl, 3 + nC + cc] = sy

        # per-voxel field-gradient accumulation
        grx, gry, grz = gr_ref[n, 0, t], gr_ref[n, 1, t], gr_ref[n, 2, t]
        acc[0] = acc[0] + dbz * grx
        acc[1] = acc[1] + dbz * gry
        acc[2] = acc[2] + dbz * grz
        a = 14
        if has_dfg:
            acc[a] = acc[a] + dbz
            a += 1
        if has_b1:
            for cc in range(nC):
                acc[a + cc] = (acc[a + cc] + dbx * rf_ref[n, cc, t]
                               + dby * rf_ref[n, nC + cc, t])
                acc[a + nC + cc] = (acc[a + nC + cc]
                                    + dby * rf_ref[n, cc, t]
                                    - dbx * rf_ref[n, nC + cc, t])

        return (h0a[0], h0a[1], h0a[2],
                h0b[0], h0b[1], h0b[2]) + tuple(acc)

    def bbody(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = bstep(t0 + tl, tl, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, tc // u, bbody,
        tuple(h_scr[k] for k in range(6))
        + tuple(acc_scr[a] for a in range(n_acc)))
    for k in range(6):
        h_scr[k] = carry[k]
    acc = carry[6:]
    for a in range(n_acc):
        acc_scr[a] = acc[a]

    @pl.when(j == ntc - 1)
    def _():
        for k in range(6):
            dmi_ref[0, k] = carry[k]
        dloc_ref[0, 0], dloc_ref[0, 1], dloc_ref[0, 2] = (acc[0], acc[1],
                                                          acc[2])
        dsb_ref[0] = acc[3]
        for k in range(4):
            dx_ref[0, k] = acc[4 + k]
        for k in range(6):
            dz_ref[0, k] = acc[8 + k]
        a = 14
        if has_dfg:
            ddfg_ref[0] = acc[a]
            a += 1
        if has_b1:
            for cc in range(2 * nC):
                db1g_ref[0, cc] = acc[a + cc]


def mc_bwd_planes(chk, g6, rf2, gr2, loc_p, dfg, b1_p, sb, Xp, Zp,
                  g2pd, *, ts=None, tc=None, small_phi: bool = False,
                  interpret: bool = False):
    r"""Fused two-pool adjoint, batched planes layout. ``chk``:
    `(N, ntc, 6, S1, L)` chunk-START checkpoints from
    :func:`mc_fwd_planes` (same ``tc``); ``g6``: `(N, 6, S1, L)`
    cotangent at the final state. Returns ``(dmi6, drf2 (N, 2C, nT),
    dgr2 (N, 3, nT), dloc, ddfg, db1g, dsb, dXp, dZp)`` (None where the
    corresponding input is None)."""
    N, ntc_chk, _, S1, _ = chk.shape
    nT = gr2.shape[-1]
    nC = rf2.shape[1] // 2
    K = 3 + 2 * nC
    ts = _pick_ts_bwd(S1) if ts is None else ts
    tc = _pick_tc_mc(nT, S1) if tc is None else tc
    assert S1 % ts == 0, (S1, ts)
    assert nT % tc == 0, (nT, tc)
    ntiles = S1 // ts
    ntc = nT // tc
    assert ntc == ntc_chk, (ntc, ntc_chk)
    grid = (N, ntiles, ntc)
    has_dfg, has_b1 = dfg is not None, b1_p is not None

    def tile(k):
        return pl.BlockSpec((1, k, ts, _LANE),
                            lambda n, i, *_: (n, 0, i, 0),
                            memory_space=pltpu.VMEM)

    tile1 = pl.BlockSpec((1, ts, _LANE), lambda n, i, *_: (n, i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    chkspec = pl.BlockSpec((1, 1, 6, ts, _LANE),
                           lambda n, i, j: (n, ntc - 1 - j, 0, i, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [smem, smem, chkspec, tile(6), tile(3), tile1, tile1,
                tile(4), tile(6)]
    args = [rf2, gr2, chk, g6, loc_p, g2pd, sb, Xp, Zp]
    if has_dfg:
        in_specs.append(tile1)
        args.append(dfg)
    if has_b1:
        in_specs.append(tile(2 * nC))
        args.append(b1_p)

    out_specs = [
        tile(6),                                         # dmi
        pl.BlockSpec((1, 1, tc, K, _LANE),
                     lambda n, i, j: (n, i, ntc - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),           # dwf
        tile(3),                                         # dloc
        tile1,                                           # dsb
        tile(4),                                         # dX
        tile(6),                                         # dZ
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, 6, S1, _LANE), chk.dtype),
        jax.ShapeDtypeStruct((N, ntiles, nT, K, _LANE), chk.dtype),
        jax.ShapeDtypeStruct(loc_p.shape, chk.dtype),
        jax.ShapeDtypeStruct(sb.shape, chk.dtype),
        jax.ShapeDtypeStruct(Xp.shape, chk.dtype),
        jax.ShapeDtypeStruct(Zp.shape, chk.dtype),
    ]
    if has_dfg:
        out_specs.append(tile1)
        out_shape.append(jax.ShapeDtypeStruct(dfg.shape, chk.dtype))
    if has_b1:
        out_specs.append(tile(2 * nC))
        out_shape.append(jax.ShapeDtypeStruct(b1_p.shape, chk.dtype))

    n_acc = 14 + int(has_dfg) + (2 * nC if has_b1 else 0)
    kernel = functools.partial(_mc_bwd_kernel, tc, ntc, nC, has_dfg,
                               has_b1, small_phi)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((tc, 6, ts, _LANE), chk.dtype),
                        pltpu.VMEM((6, ts, _LANE), chk.dtype),
                        pltpu.VMEM((n_acc, ts, _LANE), chk.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    dmi6, dwf_part, dloc, dsb_g, dXg, dZg = outs[:6]
    i = 6
    ddfg = db1g = None
    if has_dfg:
        ddfg = outs[i]
        i += 1
    if has_b1:
        db1g = outs[i]
    dwf = jnp.sum(dwf_part, axis=(1, 4))     # tiles + lanes → (N, nT, K)
    drf2 = dwf[..., 3:].transpose(0, 2, 1)   # (N, 2C, nT)
    dgr2 = dwf[..., :3].transpose(0, 2, 1)   # (N, 3, nT)
    return dmi6, drf2, dgr2, dloc, ddfg, db1g, dsb_g, dXg, dZg
