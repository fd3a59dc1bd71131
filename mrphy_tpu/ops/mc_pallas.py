r"""Fused two-pool Bloch–McConnell TPU kernel (MT/CEST at volume scale).

The oracle (:func:`mrphy_tpu.ops.slowsims.blochsim_mc`) streams a fully
materialized B-effective — at whole-brain CEST scale (1M voxels × 10k
saturation steps) that array alone is 120 GB and cannot exist. This
kernel mirrors the fused single-pool engine
(:mod:`mrphy_tpu.ops.pallas_kernels`): the rf/gr *waveforms* live in
SMEM, the per-voxel fields (loc, Δf, B1) and the ten exact
exchange/relaxation propagator planes live in VMEM, and B-effective is
assembled per step inside the time loop — O(nM) memory for any nT.

Per step and per voxel: pool a rotates about the assembled field, pool b
about the same field plus its chemical-shift offset (one extra z term —
a second sincos), then the exact 2×2 exchange/relaxation propagators mix
the pools (12 mul + 8 add). Same structure-of-arrays ``(k, S1, 128)``
layout, polynomial sincos, and manual unroll as the single-pool kernels.

Forward-only by design: the differentiable path is the XLA core in
:mod:`mrphy_tpu.ops.mc`, which the public wrapper's ``jax.custom_vjp``
uses to compute gradients of this kernel's output (recompute-through-XLA
adjoint — exact same math, so the gradients are the XLA engine's).

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

__all__ = ['mc_is_available', 'mc_fwd_planes']


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


def _mc_fwd_kernel(nT: int, nC: int, has_dfg: bool, has_b1: bool,
                   small: bool, rf_ref, gr_ref, mi_ref, loc_ref,
                   g2pd_ref, sb_ref, x_ref, z_ref, *refs):
    r"""One (batch, spin tile) grid cell: the full nT-step two-pool
    evolution with both pools' states carried in registers/VMEM.
    Positional refs after the fixed lead: [dfg], [b1], out."""
    i = 0
    dfg_ref = b1_ref = None
    if has_dfg:
        dfg_ref = refs[i]
        i += 1
    if has_b1:
        b1_ref = refs[i]
        i += 1
    out_ref = refs[i]
    n = pl.program_id(0)

    locx, locy, locz = loc_ref[0, 0], loc_ref[0, 1], loc_ref[0, 2]
    g2pd = g2pd_ref[0]
    sb = sb_ref[0]                       # pool-b z offset, rad/step
    dfg = dfg_ref[0] if has_dfg else None
    X00, X01, X10, X11 = x_ref[0, 0], x_ref[0, 1], x_ref[0, 2], x_ref[0, 3]
    Z00, Z01, Z10, Z11, ca, cb = (z_ref[0, k] for k in range(6))

    def rot(bx, by, bz, mx, my, mz):
        n2 = jnp.maximum(bx * bx + by * by + bz * bz, _PHI_EPS ** 2)
        inv = jax.lax.rsqrt(n2)
        phi = n2 * inv
        ux, uy, uz = bx * inv, by * inv, bz * inv
        s, c = _fast_sincos(phi, small)
        c1 = c - 1.0
        utm = ux * mx + uy * my + uz * mz
        # m₁ = m − s·(u×m) + (c−1)·(m − (uᵀm)·u)
        return (mx - s * (uy * mz - uz * my) + c1 * (mx - utm * ux),
                my - s * (uz * mx - ux * mz) + c1 * (my - utm * uy),
                mz - s * (ux * my - uy * mx) + c1 * (mz - utm * uz))

    def step(t, m):
        ax, ay, az, bx, by, bz = m
        fx, fy, fz = _assemble_b_tile(n, t, nC, has_dfg, has_b1, rf_ref,
                                      gr_ref, locx, locy, locz, dfg,
                                      b1_ref, g2pd)
        a1x, a1y, a1z = rot(fx, fy, fz, ax, ay, az)
        b1x, b1y, b1z = rot(fx, fy, fz + sb, bx, by, bz)
        return (X00 * a1x + X01 * b1x,
                X00 * a1y + X01 * b1y,
                Z00 * a1z + Z01 * b1z + ca,
                X10 * a1x + X11 * b1x,
                X10 * a1y + X11 * b1y,
                Z10 * a1z + Z11 * b1z + cb)

    # Mosaic fori_loop only supports unroll=1 or full; unroll manually
    u = math.gcd(nT, _UNROLL)

    def body(k, m):
        for jj in range(u):
            m = step(k * u + jj, m)
        return m

    m = (mi_ref[0, 0], mi_ref[0, 1], mi_ref[0, 2],
         mi_ref[0, 3], mi_ref[0, 4], mi_ref[0, 5])
    m = jax.lax.fori_loop(0, nT // u, body, m)
    for k in range(6):
        out_ref[0, k] = m[k]


def mc_fwd_planes(mi6, rf2, gr2, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd, *,
                  ts=None, small_phi: bool = False,
                  interpret: bool = False):
    r"""Pallas forward, batched planes layout. Returns the final
    two-pool state ``(N, 6, S1, L)`` (planes ``[ax, ay, az, bx, by,
    bz]``).

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
    assert S1 % ts == 0, (S1, ts)
    grid = (N, S1 // ts)
    has_dfg, has_b1 = dfg is not None, b1_p is not None

    def tile(k):
        return pl.BlockSpec((1, k, ts, _LANE), lambda n, i: (n, 0, i, 0),
                            memory_space=pltpu.VMEM)

    tile1 = pl.BlockSpec((1, ts, _LANE), lambda n, i: (n, i, 0),
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

    kernel = functools.partial(_mc_fwd_kernel, nT, nC, has_dfg, has_b1,
                               small_phi)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile(6),
        out_shape=jax.ShapeDtypeStruct((N, 6, S1, _LANE), mi6.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
