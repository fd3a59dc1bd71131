r"""Pallas TPU kernels for the fused Bloch rotation+relaxation loop.

The TPU-native equivalent of the reference's hand-tuned inner loops
(``/root/reference/mrphy/sims.py:91-126`` forward, ``:195-261`` adjoint).
Where the reference pre-allocates buffers and uses ``out=`` ops to avoid
allocator traffic on CUDA, this kernel attacks the actual TPU bottleneck:
**HBM traffic**. Under an XLA ``lax.scan``, the loop-invariant per-spin
fields (loc, Δf/γ, 2πγdt, E1/E2) and the magnetization carry are re-read
from / written to HBM on *every* time step (~60 MB/step for 1M spins).
Here:

- the grid runs over ``(batch, spin tiles)``;
- per tile, ALL loop-invariant fields are loaded into VMEM **once**, the
  magnetization stays in VMEM for the whole ``nT``-step time loop, and
  the tiny per-step waveforms (rf, gr) sit in SMEM — transposed to
  ``(k, nT)`` because SMEM rows pad to 512 B;
- per-tile HBM traffic is therefore O(nM) total, independent of nT: the
  kernel is compute-bound (the VPU trig/rotation math), sustaining
  ~7 G spin·steps/s fwd+adjoint on one v5e chip.

The backward kernel uses the same trick plus the reverse-reconstruction
adjoint of :mod:`mrphy_tpu.ops.sims`: it re-derives the trajectory
backwards in VMEM (no O(nM·nT) residual — only O(nM·nT/tc) chunk-end
checkpoints, from which each time chunk's reconstruction restarts so
inverse-relaxation rounding stays bounded at exp(tc·dt/T2) for any
pulse length), rotates the cotangent back, and
reduces the per-step field gradients to waveform-shaped outputs
``(nT, ...)`` inside the kernel (sublane reduction in-kernel, lane/tile
reduction outside). Its grid adds a time-chunk axis: the waveform-grad
rows stream out per chunk (newest-first) while the reconstruction state
persists in VMEM scratch, so the VMEM footprint is O(tc); long pulses
stay on the fast path up to the remaining gates — the 1 MB SMEM holding
the waveforms (~32k steps single-coil) and a 2 GB cap on the HBM
waveform-grad partials (~27k steps at 1M spins; see
``rfgr_is_available``).

Layout contract (shared with :mod:`mrphy_tpu.ops.sims`): planes
``(N, xyz, S1, 128)`` for the rf/gr engine (grid covers the batch), and
``(xyz, S1, 128)`` with batch folded into spins for the Beff-streaming
engine.

Scope: TPU backend, f32 (CPU tests run via ``interpret=True``). Flow
(``vel``) is supported: effective locations ``loc + vel·t`` are formed
per step from a VMEM velocity tile and an SMEM time row.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['is_available', 'blochsim_core', 'rfgr_core', 'rfgr_fwd_planes',
           'rfgr_bwd_planes', 'rfgr_is_available']

_PHI_EPS = 1e-12
_UNROLL = 4      # manual time-loop unroll (Mosaic fori_loop can't unroll)

# fast sincos: Mosaic's sin/cos are the kernel bottleneck (the fwd kernel
# measures at ~98% of the chip's transcendental roofline, see
# benchmarks/roofline.py). phi = gam*2pi*dt*|B| is nonnegative and small
# (tens of radians at most), so a Cody-Waite reduction + short minimax
# polynomials give f32-exact results (max err ~1e-7 on [0, 60 rad],
# validated in tests) for ~25 mul-adds — several times cheaper.
_PI_HI = 3.140625                      # exact in f32
_PI_LO = 3.1415926535897931 - _PI_HI
_SIN_C = (-1.6666658774e-01, 8.3330584764e-03, -1.9809573982e-04,
          2.6065399554e-06)
_COS_C = (-4.9999999647e-01, 4.1666645172e-02, -1.3888464769e-03,
          2.4765154176e-05, -2.6136419324e-07)


def _fast_sincos(phi, small: bool = False):
    r"""(sin(phi), cos(phi)) for phi >= 0 via range reduction + minimax
    polynomials; f32-exact (~1e-7) and far cheaper than two Mosaic
    transcendentals.

    ``small=True`` (static) skips the Cody–Waite reduction entirely:
    valid — and BIT-IDENTICAL to the reduced path, since phi < π/2 means
    k=0, r=phi, sgn=1 — whenever the caller guarantees phi ≤ π/2 (at
    physical dwell times phi = γ2πdt·|B| ≈ 0.107·|B| rad/Gauss, so |B|
    would have to exceed ~14.7 G; see ``sims.rfgr_phi_bound``). Saves
    the round/2-FMA/floor/sign tail, ~10 of the ~25 mul-adds."""
    if small:
        x = phi * phi
        s1, s2, s3, s4 = _SIN_C
        s = phi * (1.0 + x * (s1 + x * (s2 + x * (s3 + x * s4))))
        c1_, c2_, c3_, c4_, c5_ = _COS_C
        c = 1.0 + x * (c1_ + x * (c2_ + x * (c3_ + x * (c4_ + x * c5_))))
        return s, c
    k = jnp.round(phi * (1.0 / 3.1415926535897931))
    r = (phi - k * _PI_HI) - k * _PI_LO          # r in [-pi/2, pi/2]
    x = r * r
    s1, s2, s3, s4 = _SIN_C
    s = r * (1.0 + x * (s1 + x * (s2 + x * (s3 + x * s4))))
    c1_, c2_, c3_, c4_, c5_ = _COS_C
    c = 1.0 + x * (c1_ + x * (c2_ + x * (c3_ + x * (c4_ + x * c5_))))
    half = k * 0.5
    sgn = 1.0 - 4.0 * (half - jnp.floor(half))   # (-1)^k
    return sgn * s, sgn * c
_LANE = 128
_DEF_TS = 256            # sublane tile: 256x128 = 32768 spins per tile
# v5e has 128 MB physical VMEM; the default compiler cap is 16 MB
_VMEM_LIMIT = 64 * 1024 * 1024
_MIN_AUTO_SPINS = 32768  # below one full spin tile, the XLA scan is
#                          already fast and compiles far quicker


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(('tpu', 'axon'))
    except RuntimeError:
        return False


def is_available(*, nT: int, nspins: int, dtype) -> bool:
    r"""Whether the Beff-streaming Pallas engine supports this instance
    (and is worth its compile time — 'auto' prefers XLA when small)."""
    return (jnp.dtype(dtype) == jnp.float32
            and nspins >= _MIN_AUTO_SPINS and _on_tpu())


_SMEM_BUDGET = 768 * 1024  # of the 1 MB SMEM; rows pad to 512 B


def rfgr_is_available(*, N: int, dtype, nspins: int = _MIN_AUTO_SPINS,
                      nT: int = 0, nC: int = 1) -> bool:
    r"""Whether the fused rf/gr Pallas kernels support this instance (any
    batch size; 'auto' prefers XLA for small spin counts, and falls back
    when the waveforms would overflow the 1 MB SMEM or the backward's
    HBM waveform-gradient partials would exceed a bounded budget — the
    XLA scan handles those with O(nT) waveform grads instead). The
    backward's waveform-grad VMEM is time-chunked (grid over time
    chunks, carry in scratch) so it only gates for divisor-poor nT,
    where chunking degenerates to a single full-length block."""
    nT = max(nT, 1)
    row = -(-nT * 4 // 512) * 512                  # padded bytes per row
    smem_bytes = N * (2 * nC + 3) * row
    # backward HBM partial: (N, ntiles, nT, K, LANE) f32
    K = 3 + 2 * nC
    ntiles = max(1, -(-nspins // (_DEF_TS * _LANE)))
    dwf_hbm = N * ntiles * nT * K * _LANE * 4
    # divisor-poor nT falls back to a single chunk; gate on its VMEM block
    dwf_block = _pick_tc_wf(nT, K) * K * _LANE * 4
    return (jnp.dtype(dtype) == jnp.float32
            and nspins >= _MIN_AUTO_SPINS
            and smem_bytes <= _SMEM_BUDGET
            and dwf_block <= 16 * 1024 * 1024      # fits VMEM comfortably
            and dwf_hbm <= 2 * 1024 ** 3           # bounded HBM partials
            and _on_tpu())


def _pick_ts(S1: int) -> int:
    r"""Largest tile ≤ _DEF_TS sublanes dividing S1 (S1 is a multiple of
    8 by construction)."""
    return math.gcd(S1, _DEF_TS)


# ==========================================================================
# Fused rf/gr kernels, grid = (batch, spin tiles)
# ==========================================================================

def _unpack(refs, relax, has_dfg, has_b1, has_vel, n_lead):
    r"""Unpack the optional-argument tail shared by both kernels."""
    i = n_lead
    dfg_ref = b1_ref = E_ref = e1_ref = vel_ref = tarr_ref = None
    if has_dfg:
        dfg_ref = refs[i]
        i += 1
    if has_b1:
        b1_ref = refs[i]
        i += 1
    if relax:
        E_ref, e1_ref = refs[i], refs[i + 1]
        i += 2
    if has_vel:
        vel_ref, tarr_ref = refs[i], refs[i + 1]
        i += 2
    return (refs[:n_lead], dfg_ref, b1_ref, E_ref, e1_ref, vel_ref,
            tarr_ref, refs[i:])


def _loc_eff(t, n, locx, locy, locz, vel_ref, tarr_ref):
    r"""Effective (moved) locations at step ``t``: loc + vel·t."""
    if vel_ref is None:
        return locx, locy, locz
    tval = tarr_ref[n, t]
    return (locx + tval * vel_ref[0, 0], locy + tval * vel_ref[0, 1],
            locz + tval * vel_ref[0, 2])


def _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref, gr_ref,
                     locx, locy, locz, dfg, b1_ref, g2pd):
    r"""Per-step field for one tile (shared by fwd and bwd).

    The per-spin fields (loc, dfg, b1) arrive pre-scaled by γ2πdt, so no
    per-step scaling happens here except the no-B1 transverse case
    (per-step RF scalars must meet the per-spin ``g2pd`` somewhere)."""
    bz = (gr_ref[n, 0, t] * locx + gr_ref[n, 1, t] * locy
          + gr_ref[n, 2, t] * locz)
    if has_dfg:
        bz = bz + dfg
    if has_b1:
        bx = (b1_ref[0, 0] * rf_ref[n, 0, t]
              - b1_ref[0, nC] * rf_ref[n, nC, t])
        by = (b1_ref[0, 0] * rf_ref[n, nC, t]
              + b1_ref[0, nC] * rf_ref[n, 0, t])
        for c in range(1, nC):
            bx += (b1_ref[0, c] * rf_ref[n, c, t]
                   - b1_ref[0, nC + c] * rf_ref[n, nC + c, t])
            by += (b1_ref[0, c] * rf_ref[n, nC + c, t]
                   + b1_ref[0, nC + c] * rf_ref[n, c, t])
    else:
        rfx = rf_ref[n, 0, t]
        rfy = rf_ref[n, nC, t]
        for c in range(1, nC):
            rfx += rf_ref[n, c, t]
            rfy += rf_ref[n, nC + c, t]
        bx = g2pd * rfx
        by = g2pd * rfy
    return bx, by, bz


def _rfgr_fwd_kernel(tc: int, ntc: int, nC: int, relax: bool,
                     has_dfg: bool, has_b1: bool, has_vel: bool,
                     small: bool, rf_ref, gr_ref, *refs):
    r"""One (batch, spin tile, time chunk) grid cell. The magnetization
    persists in VMEM scratch across chunks; each chunk's END state is
    streamed to the ``chk`` output — the adjoint restarts its in-chunk
    reconstruction from these checkpoints, bounding the exp(tc·dt/T2)
    rounding amplification of inverse relaxation per chunk (instead of
    compounding over the whole pulse). Short pulses pick a single chunk
    (ntc=1: identical codepath + one (=final) checkpoint). Positional
    refs (after rf/gr): mi, loc, g2pd, [dfg], [b1], [E, e1_1],
    [vel, tarr], chk, m_scr."""
    ((mi_ref, loc_ref, g2pd_ref), dfg_ref, b1_ref, E_ref, e1_ref,
     vel_ref, tarr_ref, outs) = _unpack(refs, relax, has_dfg, has_b1,
                                        has_vel, 3)
    chk_ref, m_scr = outs[0], outs[1]
    n = pl.program_id(0)
    j = pl.program_id(2)              # time chunk, oldest-first
    t0 = j * tc

    locx, locy, locz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    g2pd = g2pd_ref[0]
    dfg = dfg_ref[0] if has_dfg else None
    if relax:
        E2, E1 = E_ref[0, 0], E_ref[0, 2]
        e1_1 = e1_ref[0]

    @pl.when(j == 0)
    def _():
        m_scr[0], m_scr[1], m_scr[2] = (mi_ref[0, 0], mi_ref[0, 1],
                                        mi_ref[0, 2])

    def step(t, m):
        mx, my, mz = m
        lx, ly, lz = _loc_eff(t, n, locx, locy, locz, vel_ref, tarr_ref)
        bx, by, bz = _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref,
                                      gr_ref, lx, ly, lz, dfg,
                                      b1_ref, g2pd)
        n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
        inv = jax.lax.rsqrt(n2)
        phi = n2 * inv
        ux, uy, uz = bx * inv, by * inv, bz * inv
        s, c = _fast_sincos(phi, small)
        c1 = c - 1.0
        utm = ux * mx + uy * my + uz * mz
        # m₁ = m − s·(u×m) + (c−1)·(m − (uᵀm)·u)
        m1x = mx - s * (uy * mz - uz * my) + c1 * (mx - utm * ux)
        m1y = my - s * (uz * mx - ux * mz) + c1 * (my - utm * uy)
        m1z = mz - s * (ux * my - uy * mx) + c1 * (mz - utm * uz)
        if relax:
            m1x, m1y, m1z = m1x * E2, m1y * E2, m1z * E1 - e1_1
        return m1x, m1y, m1z

    # Mosaic fori_loop only supports unroll=1 or full; unroll manually to
    # amortize the per-iteration loop overhead
    u = math.gcd(tc, _UNROLL)

    def body(k, m):
        for jj in range(u):
            m = step(t0 + k * u + jj, m)
        return m

    mx, my, mz = jax.lax.fori_loop(
        0, tc // u, body, (m_scr[0], m_scr[1], m_scr[2]))
    m_scr[0], m_scr[1], m_scr[2] = mx, my, mz
    chk_ref[0, 0, 0], chk_ref[0, 0, 1], chk_ref[0, 0, 2] = mx, my, mz


def _rfgr_bwd_kernel(tc: int, ntc: int, nC: int, relax: bool,
                     has_dfg: bool, has_b1: bool, has_vel: bool,
                     small: bool, rf_ref, gr_ref, *refs):
    r"""Reverse time loop for one (batch, spin tile, time chunk) cell:
    reconstruct m, rotate the cotangent back, reduce per-step waveform
    gradients, and accumulate per-spin field gradients (dloc/ddfg/db1/
    dvel) alongside. Time chunks are visited newest-first (the dwf out
    index map reverses the chunk axis); the loop state (m, h, per-spin
    grad accumulators) persists across chunks in VMEM scratch, so the
    per-chunk VMEM footprint is O(tc) and arbitrarily long pulses fit.

    The in-chunk trajectory reconstruction restarts from the forward's
    chunk-end checkpoint (``chk``) at EVERY chunk, so inverse-relaxation
    rounding amplification is bounded at exp(tc·dt/T2) regardless of
    pulse length (the cotangent/accumulator carries are contractions —
    they need no checkpointing and persist in scratch).

    Positional refs (after rf/gr): chk, g, loc, g2pd, [dfg], [b1],
    [E, e1_1], dmi, dwf, dloc, [ddfg], [db1], [dvel], h_scr,
    acc_scr. ``dwf`` rows: [dgx, dgy, dgz, drf_x coils..., drf_y
    coils...] as (LANE,) sublane-partials."""
    ((chk_ref, g_ref, loc_ref, g2pd_ref), dfg_ref, b1_ref, E_ref, e1_ref,
     vel_ref, tarr_ref, tail) = _unpack(refs, relax, has_dfg, has_b1,
                                        has_vel, 4)
    outs, (h_scr, acc_scr) = tail[:-2], tail[-2:]
    dmi_ref, dwf_ref, dloc_ref = outs[0], outs[1], outs[2]
    i = 3
    ddfg_ref = db1g_ref = dvel_ref = None
    if has_dfg:
        ddfg_ref = outs[i]
        i += 1
    if has_b1:
        db1g_ref = outs[i]
        i += 1
    if has_vel:
        dvel_ref = outs[i]
    n = pl.program_id(0)
    j = pl.program_id(2)              # time chunk, newest-first
    t0 = (ntc - 1 - j) * tc           # first absolute step of this chunk

    locx, locy, locz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    g2pd = g2pd_ref[0]
    dfg = dfg_ref[0] if has_dfg else None
    if relax:
        E2, E1 = E_ref[0, 0], E_ref[0, 2]
        e1_1 = e1_ref[0]
        iE2, iE1 = 1.0 / E2, 1.0 / E1  # hoisted: divides are VPU-costly

    n_acc = 3 + int(has_dfg) + (2 * nC if has_b1 else 0) \
        + (3 if has_vel else 0)

    @pl.when(j == 0)
    def _():
        h_scr[0], h_scr[1], h_scr[2] = g_ref[0, 0], g_ref[0, 1], g_ref[0, 2]
        z = jnp.zeros_like(g2pd)
        for a in range(n_acc):
            acc_scr[a] = z

    def step(t, tl, carry):
        mx, my, mz, hx, hy, hz = carry[:6]
        acc = list(carry[6:])
        lx, ly, lz = _loc_eff(t, n, locx, locy, locz, vel_ref, tarr_ref)
        bx, by, bz = _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref,
                                      gr_ref, lx, ly, lz, dfg,
                                      b1_ref, g2pd)

        n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
        inv = jax.lax.rsqrt(n2)
        phi = n2 * inv
        ux, uy, uz = bx * inv, by * inv, bz * inv
        s, c = _fast_sincos(phi, small)
        c1 = c - 1.0

        # undo relaxation: m̃ = (m₁ + e1z)/E, h̃ = E∘h₁
        if relax:
            mtx, mty, mtz = mx * iE2, my * iE2, (mz + e1_1) * iE1
            htx, hty, htz = hx * E2, hy * E2, hz * E1
        else:
            mtx, mty, mtz = mx, my, mz
            htx, hty, htz = hx, hy, hz

        # m₀ = Rᵀ m̃ (rotation by +ϕ);  uᵀm̃ == uᵀm₀
        utm = ux * mtx + uy * mty + uz * mtz
        m0x = mtx + s * (uy * mtz - uz * mty) + c1 * (mtx - utm * ux)
        m0y = mty + s * (uz * mtx - ux * mtz) + c1 * (mty - utm * uy)
        m0z = mtz + s * (ux * mty - uy * mtx) + c1 * (mtz - utm * uz)

        # h₀ = Rᵀ h̃
        uth = ux * htx + uy * hty + uz * htz
        uxhx, uxhy, uxhz = (uy * htz - uz * hty, uz * htx - ux * htz,
                            ux * hty - uy * htx)
        h0x = htx + s * uxhx + c1 * (htx - uth * ux)
        h0y = hty + s * uxhy + c1 * (hty - uth * uy)
        h0z = htz + s * uxhz + c1 * (htz - uth * uz)

        # ∂L/∂b = −s/ϕ·(m₀×h̃) − (c−1)/ϕ·((uᵀh̃)m₀ + (uᵀm₀)h̃) + K·u
        sp, c1p = s * inv, c1 * inv
        mxhx, mxhy, mxhz = (m0y * htz - m0z * hty, m0z * htx - m0x * htz,
                            m0x * hty - m0y * htx)
        T = ux * mxhx + uy * mxhy + uz * mxhz
        hm = htx * m0x + hty * m0y + htz * m0z
        K = (sp - c) * T + (2 * c1p + s) * utm * uth - s * hm
        dbx = -sp * mxhx - c1p * (uth * m0x + utm * htx) + K * ux
        dby = -sp * mxhy - c1p * (uth * m0y + utm * hty) + K * uy
        dbz = -sp * mxhz - c1p * (uth * m0z + utm * htz) + K * uz

        # waveform-grad reductions (operands pre-scaled by γ2πdt, so no
        # per-step rescale). Reduce over sublanes only (→ (LANE,) rows
        # stored to VMEM); the cross-lane reduction happens outside.
        dwf_ref[0, 0, tl, 0] = jnp.sum(dbz * lx, axis=0)
        dwf_ref[0, 0, tl, 1] = jnp.sum(dbz * ly, axis=0)
        dwf_ref[0, 0, tl, 2] = jnp.sum(dbz * lz, axis=0)
        if has_b1:
            for cc in range(nC):
                dwf_ref[0, 0, tl, 3 + cc] = jnp.sum(
                    b1_ref[0, cc] * dbx + b1_ref[0, nC + cc] * dby,
                    axis=0)
                dwf_ref[0, 0, tl, 3 + nC + cc] = jnp.sum(
                    b1_ref[0, cc] * dby - b1_ref[0, nC + cc] * dbx,
                    axis=0)
        else:
            # no-B1: b_xy = g2pd·rf, so drf needs the g2pd factor here
            sx = jnp.sum(g2pd * dbx, axis=0)
            sy = jnp.sum(g2pd * dby, axis=0)
            for cc in range(nC):
                dwf_ref[0, 0, tl, 3 + cc] = sx
                dwf_ref[0, 0, tl, 3 + nC + cc] = sy

        # per-spin field-gradient accumulation (dbx/dby/dbz are already
        # the unscaled-assembly cotangents): dloc += dbz·gr_t,
        # ddfg += dbz, db1_c += (dbx,dby)·rf_c, dvel += dbz·gr_t·t
        grx, gry, grz = gr_ref[n, 0, t], gr_ref[n, 1, t], gr_ref[n, 2, t]
        a = 0
        acc[0] = acc[0] + dbz * grx
        acc[1] = acc[1] + dbz * gry
        acc[2] = acc[2] + dbz * grz
        a = 3
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
            a += 2 * nC
        if has_vel:
            tval = tarr_ref[n, t]
            acc[a] = acc[a] + dbz * (grx * tval)
            acc[a + 1] = acc[a + 1] + dbz * (gry * tval)
            acc[a + 2] = acc[a + 2] + dbz * (grz * tval)

        return (m0x, m0y, m0z, h0x, h0y, h0z) + tuple(acc)

    u = math.gcd(tc, _UNROLL)

    def body(k, carry):
        for jj in range(u):
            tl = tc - 1 - (k * u + jj)
            carry = step(t0 + tl, tl, carry)
        return carry

    # m restarts from this chunk's saved end state; h/acc carry on
    carry = jax.lax.fori_loop(
        0, tc // u, body,
        (chk_ref[0, 0, 0], chk_ref[0, 0, 1], chk_ref[0, 0, 2],
         h_scr[0], h_scr[1], h_scr[2])
        + tuple(acc_scr[a] for a in range(n_acc)))
    hx, hy, hz = carry[3:6]           # carry[:3] is the reconstructed
    acc = carry[6:]                   # chunk-start m — superseded by chk
    h_scr[0], h_scr[1], h_scr[2] = hx, hy, hz
    for a in range(n_acc):
        acc_scr[a] = acc[a]

    @pl.when(j == ntc - 1)
    def _():
        dmi_ref[0, 0], dmi_ref[0, 1], dmi_ref[0, 2] = hx, hy, hz
        dloc_ref[0, 0], dloc_ref[0, 1], dloc_ref[0, 2] = (acc[0], acc[1],
                                                          acc[2])
        a = 3
        if has_dfg:
            ddfg_ref[0] = acc[a]
            a += 1
        if has_b1:
            for cc in range(2 * nC):
                db1g_ref[0, cc] = acc[a + cc]
            a += 2 * nC
        if has_vel:
            dvel_ref[0, 0], dvel_ref[0, 1], dvel_ref[0, 2] = \
                acc[a], acc[a + 1], acc[a + 2]


def _rfgr_specs(ts, nC):
    r"""Shared block specs; index maps take ``*_`` so they serve both the
    forward (batch, tiles) and backward (batch, tiles, chunks) grids —
    per-spin blocks never depend on the time-chunk axis."""
    tile3 = pl.BlockSpec((1, 3, ts, _LANE), lambda n, i, *_: (n, 0, i, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((1, ts, _LANE), lambda n, i, *_: (n, i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    b1spec = pl.BlockSpec((1, 2 * nC, ts, _LANE),
                          lambda n, i, *_: (n, 0, i, 0),
                          memory_space=pltpu.VMEM)
    return tile3, tile1, smem, b1spec


def rfgr_fwd_planes(mi, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd,
                    vel_p=None, tarr2=None, *, ts=None, tc=None,
                    small_phi: bool = False, interpret: bool = False):
    r"""Pallas forward, batched planes layout. Returns the chunk-end
    checkpoints ``chk``: `(N, ntc, 3, S1, L)` — the final state is
    ``chk[:, -1]``, the rest feed the adjoint's per-chunk reconstruction
    restarts (time chunking matches ``rfgr_bwd_planes``).

    ``mi``/``loc_p``/``E``: `(N, 3, S1, L)`; ``dfg``/``e1_1``/``g2pd``:
    `(N, S1, L)`; ``b1_p``: `(N, 2C, S1, L)` or None; ``rf2``:
    `(N, 2C, nT)`; ``gr2``: `(N, 3, nT)` (waveforms live in SMEM,
    (k, nT)-ordered because SMEM rows pad to 512 B).
    """
    N, _, S1, _ = mi.shape
    nT = gr2.shape[-1]
    nC = rf2.shape[1] // 2
    K = 3 + 2 * nC
    ts = _pick_ts(S1) if ts is None else ts
    tc = _pick_tc_wf(nT, K) if tc is None else tc
    assert S1 % ts == 0, (S1, ts)
    assert nT % tc == 0, (nT, tc)
    ntc = nT // tc
    grid = (N, S1 // ts, ntc)
    relax, has_dfg, has_b1 = E is not None, dfg is not None, b1_p is not None
    has_vel = vel_p is not None
    tile3, tile1, smem, b1spec = _rfgr_specs(ts, nC)

    in_specs = [smem, smem, tile3, tile3, tile1]
    args = [rf2, gr2, mi, loc_p, g2pd]
    if has_dfg:
        in_specs.append(tile1)
        args.append(dfg)
    if has_b1:
        in_specs.append(b1spec)
        args.append(b1_p)
    if relax:
        in_specs += [tile3, tile1]
        args += [E, e1_1]
    if has_vel:
        in_specs += [tile3, smem]
        args += [vel_p, tarr2]

    kernel = functools.partial(_rfgr_fwd_kernel, tc, ntc, nC, relax,
                               has_dfg, has_b1, has_vel, small_phi)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 3, ts, _LANE),
                               lambda n, i, j: (n, j, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, ntc) + mi.shape[1:], mi.dtype),
        scratch_shapes=[pltpu.VMEM((3, ts, _LANE), mi.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


from mrphy_tpu.utils._shapes import (     # noqa: E402  (shared helpers)
    largest_divisor_leq as _largest_divisor_leq,
    largest_divisor_leq_pref as _largest_divisor_leq_pref)


def _pick_tc_wf(nT: int, K: int) -> int:
    r"""Backward time-chunk length: bound the per-tile waveform-grad VMEM
    block (tc, K, LANE) to ~4 MB while dividing nT. Short pulses get a
    single chunk (identical codepath to the unchunked kernel). When nT
    is divisor-poor (e.g. prime) and has no usable chunk length ≥ 128,
    fall back to a single chunk rather than a degenerate 1-step grid —
    ``rfgr_is_available`` then gates on the single-chunk VMEM block, so
    such instances take the XLA engine instead of a slow micro-chunked
    kernel."""
    bound = max(1, (4 << 20) // (K * _LANE * 4))
    if nT <= bound:
        return nT
    tc = _largest_divisor_leq_pref(nT, bound, _UNROLL)
    return tc if tc >= 128 else nT


def rfgr_bwd_planes(chk, g, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd,
                    vel_p=None, tarr2=None, *, ts=None, tc=None,
                    small_phi: bool = False, interpret: bool = False):
    r"""Pallas backward (checkpointed reverse-reconstruction adjoint),
    batched planes. ``chk``: `(N, ntc, 3, S1, L)` chunk-end checkpoints
    from :func:`rfgr_fwd_planes` (same ``tc``). Returns ``(dmi, drf2
    (N, 2C, nT), dgr2 (N, 3, nT), dloc, ddfg, db1g, dvel)`` — the last
    four per-spin plane-shaped (None where the corresponding input is
    None).

    The grid extends over (batch, spin tiles, time chunks): per-step
    waveform-grad rows stream out chunk by chunk (newest-first), the
    in-chunk reconstruction restarts from each chunk's checkpoint
    (bounded rounding amplification), and the cotangent/accumulator
    state persists in VMEM scratch, so VMEM use is O(tc) and arbitrarily
    long pulses fit (the old single-chunk kernel's (nT, K, LANE) VMEM
    block forced an XLA fallback past nT ≈ 6.5k)."""
    N, ntc_chk, _, S1, _ = chk.shape
    nT = gr2.shape[-1]
    nC = rf2.shape[1] // 2
    K = 3 + 2 * nC
    ts = _pick_ts(S1) if ts is None else ts
    tc = _pick_tc_wf(nT, K) if tc is None else tc
    assert S1 % ts == 0, (S1, ts)
    assert nT % tc == 0, (nT, tc)
    ntiles = S1 // ts
    ntc = nT // tc
    assert ntc == ntc_chk, (ntc, ntc_chk)
    grid = (N, ntiles, ntc)
    relax, has_dfg, has_b1 = E is not None, dfg is not None, b1_p is not None
    has_vel = vel_p is not None
    tile3, tile1, smem, b1spec = _rfgr_specs(ts, nC)
    # chunk-end checkpoints, visited newest-first like dwf
    chkspec = pl.BlockSpec((1, 1, 3, ts, _LANE),
                           lambda n, i, j: (n, ntc - 1 - j, 0, i, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [smem, smem, chkspec, tile3, tile3, tile1]
    args = [rf2, gr2, chk, g, loc_p, g2pd]
    if has_dfg:
        in_specs.append(tile1)
        args.append(dfg)
    if has_b1:
        in_specs.append(b1spec)
        args.append(b1_p)
    if relax:
        in_specs += [tile3, tile1]
        args += [E, e1_1]
    if has_vel:
        in_specs += [tile3, smem]
        args += [vel_p, tarr2]

    kernel = functools.partial(_rfgr_bwd_kernel, tc, ntc, nC, relax,
                               has_dfg, has_b1, has_vel, small_phi)
    # per-tile lane-partial waveform grads, streamed per time chunk
    # (chunks visited newest-first); block dims equal to array dims are
    # exempt from the (8, 128) divisibility rule
    out_specs = [
        tile3,
        pl.BlockSpec((1, 1, tc, K, _LANE),
                     lambda n, i, j: (n, i, ntc - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),
        tile3,                                           # dloc
    ]
    mshape = (N,) + chk.shape[2:]
    out_shape = [
        jax.ShapeDtypeStruct(mshape, chk.dtype),
        jax.ShapeDtypeStruct((N, ntiles, nT, K, _LANE), chk.dtype),
        jax.ShapeDtypeStruct(loc_p.shape, chk.dtype),
    ]
    if has_dfg:
        out_specs.append(tile1)
        out_shape.append(jax.ShapeDtypeStruct(dfg.shape, chk.dtype))
    if has_b1:
        out_specs.append(b1spec)
        out_shape.append(jax.ShapeDtypeStruct(b1_p.shape, chk.dtype))
    if has_vel:
        out_specs.append(tile3)
        out_shape.append(jax.ShapeDtypeStruct(vel_p.shape, chk.dtype))

    n_acc = 3 + int(has_dfg) + (2 * nC if has_b1 else 0) \
        + (3 if has_vel else 0)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((3, ts, _LANE), chk.dtype),
                        pltpu.VMEM((n_acc, ts, _LANE), chk.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    dmi, dwf_part, dloc = outs[0], outs[1], outs[2]
    j = 3
    ddfg = db1g = dvel = None
    if has_dfg:
        ddfg = outs[j]
        j += 1
    if has_b1:
        db1g = outs[j]
        j += 1
    if has_vel:
        dvel = outs[j]
    dwf = jnp.sum(dwf_part, axis=(1, 4))     # tiles + lanes → (N, nT, K)
    drf2 = dwf[..., 3:].transpose(0, 2, 1)   # (N, 2C, nT)
    dgr2 = dwf[..., :3].transpose(0, 2, 1)   # (N, 3, nT)
    return dmi, drf2, dgr2, dloc, ddfg, db1g, dvel


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def rfgr_core(mi, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd, vel_p,
              tarr2, interpret=False, small_phi=False):
    return _rfgr_core_fwd(mi, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd,
                          vel_p, tarr2, interpret, small_phi)[0]


def _rfgr_core_fwd(mi, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd, vel_p,
                   tarr2, interpret, small_phi):
    chk = rfgr_fwd_planes(mi, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd,
                          vel_p, tarr2, small_phi=small_phi,
                          interpret=interpret)
    return chk[:, -1], (chk, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd,
                        vel_p, tarr2)


def _rfgr_core_bwd(interpret, small_phi, res, g):
    (chk, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd, vel_p, tarr2) = res
    dmi, drf2, dgr2, dloc, ddfg, db1g, dvel = rfgr_bwd_planes(
        chk, g, rf2, gr2, loc_p, dfg, b1_p, E, e1_1, g2pd, vel_p, tarr2,
        small_phi=small_phi, interpret=interpret)
    zl = lambda x: None if x is None else jnp.zeros_like(x)  # noqa: E731
    return (dmi, drf2, dgr2, dloc, ddfg, db1g, zl(E),
            zl(e1_1), jnp.zeros_like(g2pd), dvel, zl(tarr2))


rfgr_core.defvjp(_rfgr_core_fwd, _rfgr_core_bwd)


# ==========================================================================
# Beff-streaming engine: beff (nT, 3, S1, L) streamed through VMEM in time
# chunks; magnetization lives in VMEM scratch across the whole time loop.
# (Batch is folded into the spin axis by the caller.)
# ==========================================================================

def _rot_relax_planes(mx, my, mz, bx, by, bz, relax, E2, E1, e1_1,
                      small=False):
    n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
    inv = jax.lax.rsqrt(n2)
    phi = n2 * inv
    ux, uy, uz = bx * inv, by * inv, bz * inv
    s, c = _fast_sincos(phi, small)
    c1 = c - 1.0
    utm = ux * mx + uy * my + uz * mz
    m1x = mx - s * (uy * mz - uz * my) + c1 * (mx - utm * ux)
    m1y = my - s * (uz * mx - ux * mz) + c1 * (my - utm * uy)
    m1z = mz - s * (ux * my - uy * mx) + c1 * (mz - utm * uz)
    if relax:
        m1x, m1y, m1z = m1x * E2, m1y * E2, m1z * E1 - e1_1
    return m1x, m1y, m1z


def _beff_fwd_kernel(tc: int, ntc: int, relax: bool, small: bool,
                     *refs):
    r"""One (spin tile, time chunk) grid step; each chunk's end state is
    streamed to the ``chk`` output (the adjoint's reconstruction
    restarts — the final state is ``chk[-1]``). Positional refs:
    mi, beff, g2pd, [E, e1_1], chk, m_scr."""
    i = 0
    mi_ref, beff_ref, g2pd_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    if relax:
        E_ref, e1_ref = refs[i], refs[i + 1]
        i += 2
        E2, E1, e1_1 = E_ref[0], E_ref[2], e1_ref[:]
    else:
        E2 = E1 = e1_1 = None
    chk_ref, m_scr = refs[i], refs[i + 1]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[0], m_scr[1], m_scr[2] = mi_ref[0], mi_ref[1], mi_ref[2]

    g2pd = g2pd_ref[:]

    def body(k, m):
        mx, my, mz = m
        # beff may be bf16 storage: upcast at load, compute in f32
        bx = g2pd * beff_ref[k, 0].astype(g2pd.dtype)
        by = g2pd * beff_ref[k, 1].astype(g2pd.dtype)
        bz = g2pd * beff_ref[k, 2].astype(g2pd.dtype)
        return _rot_relax_planes(mx, my, mz, bx, by, bz, relax, E2, E1,
                                 e1_1, small)

    mx, my, mz = jax.lax.fori_loop(
        0, tc, body, (m_scr[0], m_scr[1], m_scr[2]))
    m_scr[0], m_scr[1], m_scr[2] = mx, my, mz
    chk_ref[0, 0], chk_ref[0, 1], chk_ref[0, 2] = mx, my, mz


def _beff_bwd_kernel(tc: int, ntc: int, relax: bool, small: bool,
                     *refs):
    r"""Checkpointed reverse-reconstruction adjoint, one (spin tile,
    time chunk) step; time chunks are visited in reverse via the index
    maps, and the in-chunk reconstruction restarts from the forward's
    chunk-end checkpoint (bounded exp(tc·dt/T2) rounding). Positional
    refs: chk, g, beff, g2pd, [E, e1_1], dmi, dbeff, h_scr."""
    i = 0
    chk_ref, g_ref, beff_ref, g2pd_ref = (refs[i], refs[i + 1],
                                          refs[i + 2], refs[i + 3])
    i += 4
    if relax:
        E_ref, e1_ref = refs[i], refs[i + 1]
        i += 2
        E2, E1, e1_1 = E_ref[0], E_ref[2], e1_ref[:]
        iE2 = 1.0 / E2
        iE1 = 1.0 / E1
    dmi_ref, dbeff_ref, h_scr = refs[i], refs[i + 1], refs[i + 2]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_scr[0], h_scr[1], h_scr[2] = g_ref[0], g_ref[1], g_ref[2]

    g2pd = g2pd_ref[:]

    def body(k, carry):
        t = tc - 1 - k
        mx, my, mz, hx, hy, hz = carry
        # beff may be bf16 storage: upcast at load, compute in f32
        bx = g2pd * beff_ref[t, 0].astype(g2pd.dtype)
        by = g2pd * beff_ref[t, 1].astype(g2pd.dtype)
        bz = g2pd * beff_ref[t, 2].astype(g2pd.dtype)

        n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
        inv = jax.lax.rsqrt(n2)
        phi = n2 * inv
        ux, uy, uz = bx * inv, by * inv, bz * inv
        s, c = _fast_sincos(phi, small)
        c1 = c - 1.0

        if relax:
            mtx, mty, mtz = mx * iE2, my * iE2, (mz + e1_1) * iE1
            htx, hty, htz = hx * E2, hy * E2, hz * E1
        else:
            mtx, mty, mtz = mx, my, mz
            htx, hty, htz = hx, hy, hz

        utm = ux * mtx + uy * mty + uz * mtz
        m0x = mtx + s * (uy * mtz - uz * mty) + c1 * (mtx - utm * ux)
        m0y = mty + s * (uz * mtx - ux * mtz) + c1 * (mty - utm * uy)
        m0z = mtz + s * (ux * mty - uy * mtx) + c1 * (mtz - utm * uz)

        uth = ux * htx + uy * hty + uz * htz
        uxhx, uxhy, uxhz = (uy * htz - uz * hty, uz * htx - ux * htz,
                            ux * hty - uy * htx)
        h0x = htx + s * uxhx + c1 * (htx - uth * ux)
        h0y = hty + s * uxhy + c1 * (hty - uth * uy)
        h0z = htz + s * uxhz + c1 * (htz - uth * uz)

        sp, c1p = s * inv, c1 * inv
        mxhx, mxhy, mxhz = (m0y * htz - m0z * hty, m0z * htx - m0x * htz,
                            m0x * hty - m0y * htx)
        T = ux * mxhx + uy * mxhy + uz * mxhz
        hm = htx * m0x + hty * m0y + htz * m0z
        K = (sp - c) * T + (2 * c1p + s) * utm * uth - s * hm
        # chain b = g2pd·beff; store in the beff storage dtype (the
        # cotangent mirrors the primal — bf16 streams at half bandwidth)
        odt = dbeff_ref.dtype
        dbeff_ref[t, 0] = (g2pd * (
            -sp * mxhx - c1p * (uth * m0x + utm * htx)
            + K * ux)).astype(odt)
        dbeff_ref[t, 1] = (g2pd * (
            -sp * mxhy - c1p * (uth * m0y + utm * hty)
            + K * uy)).astype(odt)
        dbeff_ref[t, 2] = (g2pd * (
            -sp * mxhz - c1p * (uth * m0z + utm * htz)
            + K * uz)).astype(odt)
        return m0x, m0y, m0z, h0x, h0y, h0z

    # m restarts from this chunk's saved end state; h carries on
    _, _, _, hx, hy, hz = jax.lax.fori_loop(
        0, tc, body, (chk_ref[0, 0], chk_ref[0, 1], chk_ref[0, 2],
                      h_scr[0], h_scr[1], h_scr[2]))
    h_scr[0], h_scr[1], h_scr[2] = hx, hy, hz

    @pl.when(j == ntc - 1)
    def _():
        dmi_ref[0], dmi_ref[1], dmi_ref[2] = h_scr[0], h_scr[1], h_scr[2]


def _pick_ts_stream(S1: int) -> int:
    r"""Streaming-engine sublane tile: small tiles + long time chunks
    won the round-3 on-chip sweep (ts=32/tc=256: 11.7 ms fwd+bwd at
    32k × 4096 = 11.5 G spin·steps/s, vs 17.7 ms at the old
    ts=256/tc=8 — whose real cost was the O(nM·ntc) checkpoint
    stream: 512 chunks × 400 KB of chk writes; see RESULTS.md)."""
    return math.gcd(S1, 32)


def _pick_tc(nT: int, ts: int) -> int:
    r"""Streaming-engine time-chunk length: as LARGE as divides nT
    within a ~12 MB beff block and tc ≤ 256 (conditioning bound for
    the inverse-relaxation restart, cf. ``_pick_tc_xla``). Large tc
    minimizes the adjoint's checkpoint stream (ntc chunk-end states),
    which dominated at the old ~2 MB/tc=8 rule."""
    bound = max(1, min(256, (12 << 20) // (3 * ts * _LANE * 4)))
    tc = _largest_divisor_leq_pref(nT, bound, _UNROLL)
    return max(tc, 1)


def blochsim_fwd_planes(mi, beff, E, e1_1, g2pd, *, ts=None, tc=None,
                        small_phi: bool = False,
                        interpret: bool = False):
    r"""Pallas Beff-streaming forward. ``mi``/``E``: `(3, S1, L)`;
    ``beff``: `(nT, 3, S1, L)`; ``e1_1``/``g2pd``: `(S1, L)`. Returns
    the chunk-end checkpoints ``chk``: `(ntc, 3, S1, L)` (final state
    = ``chk[-1]``; the rest feed the adjoint's per-chunk restarts)."""
    nT, S1 = beff.shape[0], mi.shape[1]
    ts = _pick_ts_stream(S1) if ts is None else ts
    tc = _pick_tc(nT, ts) if tc is None else tc
    assert S1 % ts == 0 and nT % tc == 0
    ntc = nT // tc
    grid = (S1 // ts, ntc)
    relax = E is not None

    tile3 = pl.BlockSpec((3, ts, _LANE), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((ts, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    beff_spec = pl.BlockSpec((tc, 3, ts, _LANE), lambda i, j: (j, 0, i, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [tile3, beff_spec, tile1]
    args = [mi, beff, g2pd]
    if relax:
        in_specs += [tile3, tile1]
        args += [E, e1_1]

    kernel = functools.partial(_beff_fwd_kernel, tc, ntc, relax,
                               small_phi)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, ts, _LANE),
                               lambda i, j: (j, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntc,) + mi.shape, mi.dtype),
        scratch_shapes=[pltpu.VMEM((3, ts, _LANE), mi.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def blochsim_bwd_planes(chk, g, beff, E, e1_1, g2pd, *, ts=None, tc=None,
                        small_phi: bool = False,
                        interpret: bool = False):
    r"""Pallas Beff-streaming backward (checkpointed reverse-
    reconstruction adjoint). ``chk``: `(ntc, 3, S1, L)` chunk-end
    checkpoints from :func:`blochsim_fwd_planes` (same ``tc``).
    Returns ``(dmi, dbeff)``."""
    nT, S1 = beff.shape[0], chk.shape[2]
    ts = _pick_ts_stream(S1) if ts is None else ts
    tc = _pick_tc(nT, ts) if tc is None else tc
    assert S1 % ts == 0 and nT % tc == 0
    ntc = nT // tc
    assert ntc == chk.shape[0], (ntc, chk.shape)
    grid = (S1 // ts, ntc)
    relax = E is not None

    tile3 = pl.BlockSpec((3, ts, _LANE), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((ts, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    # time chunks visited newest-first
    beff_spec = pl.BlockSpec((tc, 3, ts, _LANE),
                             lambda i, j: (ntc - 1 - j, 0, i, 0),
                             memory_space=pltpu.VMEM)
    chkspec = pl.BlockSpec((1, 3, ts, _LANE),
                           lambda i, j: (ntc - 1 - j, 0, i, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [chkspec, tile3, beff_spec, tile1]
    args = [chk, g, beff, g2pd]
    if relax:
        in_specs += [tile3, tile1]
        args += [E, e1_1]

    kernel = functools.partial(_beff_bwd_kernel, tc, ntc, relax,
                               small_phi)
    dmi, dbeff = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(tile3, beff_spec),
        out_shape=(jax.ShapeDtypeStruct(chk.shape[1:], chk.dtype),
                   jax.ShapeDtypeStruct(beff.shape, beff.dtype)),
        scratch_shapes=[pltpu.VMEM((3, ts, _LANE), chk.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return dmi, dbeff


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def blochsim_core(mi, beff, E, e1_1, g2pd, interpret=False,
                  small_phi=False):
    return _blochsim_core_fwd_p(mi, beff, E, e1_1, g2pd, interpret,
                                small_phi)[0]


def _blochsim_core_fwd_p(mi, beff, E, e1_1, g2pd, interpret, small_phi):
    chk = blochsim_fwd_planes(mi, beff, E, e1_1, g2pd,
                              small_phi=small_phi, interpret=interpret)
    return chk[-1], (chk, beff, E, e1_1, g2pd)


def _blochsim_core_bwd_p(interpret, small_phi, res, g):
    chk, beff, E, e1_1, g2pd = res
    dmi, dbeff = blochsim_bwd_planes(chk, g, beff, E, e1_1, g2pd,
                                     small_phi=small_phi,
                                     interpret=interpret)
    zl = lambda x: None if x is None else jnp.zeros_like(x)  # noqa: E731
    return dmi, dbeff, zl(E), zl(e1_1), jnp.zeros_like(g2pd)


blochsim_core.defvjp(_blochsim_core_fwd_p, _blochsim_core_bwd_p)
