r"""Fused Pallas TPU kernel for the k-space signal operator.

The XLA path (:mod:`mrphy_tpu.ops.signal`) materializes the `(chunk,
nT)` cos/sin factor matrices in HBM so the MXU can consume them —
measured HBM-bound at 515 ms for 262k spins × 16k samples × 8 coils
(~67 GB of factor traffic; `benchmarks/RESULTS.md`). This kernel fuses
the whole pipeline in VMEM:

- tiles are ``(S spins on sublanes) × (128 samples on lanes)``;
- the encoding phase ``ψ = −2π(k_t·x + Δf·t)`` is four broadcast FMAs
  (per-spin columns × per-sample rows) — no phase matmul needed;
- ``sin/cos`` and the ``exp(−t/T2*)`` decay happen in registers;
- the spin reduction is one MXU ``dot_general`` per tile,
  ``(2nC, S) @ (S, 128)``, accumulated across spin tiles in the output
  block (forward) — or ``(S, 128) @ (128, 2nC)`` accumulated across
  time tiles (adjoint).

Per-element HBM traffic is O(1/128) reads of the per-spin params — the
factor matrices never exist in memory.

Differentiability (round 3): the Pallas backend is FULLY differentiable
— its VJP is :func:`signal_vjp_planes`, one fused kernel that emits the
``M``/``sens`` cotangent factors (the linear-adjoint ``XR``/``XS``) AND
the phase-chain cotangents for ``loc_``/``ktraj``/``df``/``T2s`` in the
same tile pass. The phase algebra: with per-(spin, sample) coefficients
``P = Σ_c (w_re·ḡ_re + w_im·ḡ_im)`` and ``Q = Σ_c (w_re·ḡ_im −
w_im·ḡ_re)``, the loss is ``Σ C·P + S·Q``, so the cycles-phase
cotangent is ``dφ = 2π(P·S − Q·C)`` and

- ``∂L/∂x_m = Σ_t dφ·k_t``, ``∂L/∂k_t = Σ_m dφ·x_m`` (trajectory
  design at kernel speed), ``∂L/∂Δf_m = Σ_t dφ·t_t``,
- ``∂L/∂(1/T2*) = −Σ_t t_t·(C·P + S·Q)`` (chained to T2* outside).

Scope: TPU backend, f32 (CPU tests via ``interpret=True``), ``N = 1``
per kernel call (the wrapper loops the small static batch).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['is_available', 'signal_fwd_planes', 'signal_adj_planes',
           'signal_vjp_planes']

_LANE = 128
_DEF_SP = 512          # spins per tile (sublane extent)
_2PI = 2 * math.pi

# fast sincos of -2*pi*phi with phi in CYCLES. Mosaic's sin/cos pay a
# full Cody-Waite radian reduction per call; in cycles the reduction is
# exact arithmetic on half-integers (k = round(2*phi); phi - k/2 is an
# exact f32 subtraction at any magnitude), so the pair costs ~22 VPU
# mul-adds instead of two full transcendentals — and is MORE accurate
# at large |phi| than reducing after the 2*pi multiply. Polynomials are
# the minimax pair of ops/pallas_kernels (f32-exact, ~1e-7 on
# [-pi/2, pi/2]); on-chip parity is pinned by tpu_checks'
# signal_kernel check.
_SIN_C = (-1.6666658774e-01, 8.3330584764e-03, -1.9809573982e-04,
          2.6065399554e-06)
_COS_C = (-4.9999999647e-01, 4.1666645172e-02, -1.3888464769e-03,
          2.4765154176e-05, -2.6136419324e-07)


_LOG2E = 1.4426950408889634
_LN2_HI = 0.693145751953125          # exact in f32 (Cody–Waite split)
_LN2_LO = 1.42860677e-06


def _fast_exp(y):
    r"""``exp(y)`` for the decay range ``y ∈ (−87, 0]``: ``k =
    round(y·log2e)``, Cody–Waite residual ``r = y − k·ln2`` (exact —
    the naive base-2 split loses ~5e-6 relative at |y|≈80 to the
    rounding of ``y·log2e``), a 6-term ``e^r`` polynomial on
    [−ln2/2, ln2/2] (~2e-7 relative), and the exact ``2^k`` scale
    built in the exponent bits — ~16 VPU ops vs a full Mosaic
    transcendental. Below y≈−87.3 the result clamps to ~2.9e-38
    (true exp underflows f32 there anyway).

    MEASURED NEGATIVE in the signal kernels (RESULTS.md round 2):
    swapping it for ``jnp.exp`` there cost ~10% (150→164 ms fwd,
    3 runs) — the int bitcast/shift path beats Mosaic's exp on
    accuracy but not latency in this fusion. Kept (and f32-exactness
    swept on-chip by tpu_checks' sincos_cycles_exp_sweep) for reuse
    where exp dominates; the kernels use ``jnp.exp``."""
    y = jnp.maximum(y, -87.3)            # keeps k ≥ −126 AND r in range
    k = jnp.round(y * _LOG2E)
    r = (y - k * _LN2_HI) - k * _LN2_LO
    p = 1.0 + r * (1.0 + r * (0.5 + r * (
        1.0 / 6 + r * (1.0 / 24 + r * (1.0 / 120 + r * (1.0 / 720))))))
    ebits = (k.astype(jnp.int32) + 127) << 23
    return p * jax.lax.bitcast_convert_type(ebits, jnp.float32)


def _sincos_m2pi(phi):
    r"""``(sin(-2π·phi), cos(-2π·phi))`` for ``phi`` in cycles (any
    sign/magnitude below 2^22 cycles)."""
    k = jnp.round(phi + phi)                     # nearest half-cycle
    r = (phi - 0.5 * k) * (-_2PI)                # in [-pi/2, pi/2]
    x = r * r
    s1, s2, s3, s4 = _SIN_C
    s = r * (1.0 + x * (s1 + x * (s2 + x * (s3 + x * s4))))
    c1_, c2_, c3_, c4_, c5_ = _COS_C
    c = 1.0 + x * (c1_ + x * (c2_ + x * (c3_ + x * (c4_ + x * c5_))))
    half = k * 0.5
    sgn = 1.0 - 4.0 * (half - jnp.floor(half))   # (-1)^k
    return sgn * s, sgn * c


def is_available(*, dtype, nC: int) -> bool:
    r"""Pallas signal path gate: TPU platform, f32, coil rows fit the
    MXU result tile."""
    try:
        on_tpu = jax.devices()[0].platform.startswith(('tpu', 'axon'))
    except RuntimeError:
        on_tpu = False
    return on_tpu and dtype == jnp.float32 and 2 * nC <= _LANE


def _pick_sp(nSp: int) -> int:
    if nSp >= _DEF_SP:
        return _DEF_SP
    return max(8, -(-nSp // 8) * 8)


def _sig_fwd_kernel(has_df: bool, relax: bool, dt: float,
                    locx, locy, locz, dfr, it2, w, k, u_ref, v_ref):
    j = pl.program_id(1)                       # spin tile (accumulate)
    i = pl.program_id(0)                       # time tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE),
                                   1).astype(jnp.float32)
    tt = (i.astype(jnp.float32) * _LANE + lane + 1.0) * dt   # (1, 128)
    phi = (locx[...] * k[0:1, :] + locy[...] * k[1:2, :]
           + locz[...] * k[2:3, :])                          # (S, 128)
    if has_df:
        phi = phi + dfr[...] * tt
    S, C = _sincos_m2pi(phi)
    if relax:
        E = jnp.exp(-tt * it2[...])                          # (S, 128)
        C, S = C * E, S * E
    dims = (((1,), (0,)), ((), ()))
    # HIGHEST: Mosaic's default f32 dot multiplies in bf16 (the einsum
    # trap of CLAUDE.md) — measured 4-18% signal deviation without it
    U = jax.lax.dot_general(w[...], C, dims,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    V = jax.lax.dot_general(w[...], S, dims,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.zeros_like(u_ref)
        v_ref[...] = jnp.zeros_like(v_ref)

    u_ref[...] += U
    v_ref[...] += V


def _sig_adj_kernel(has_df: bool, relax: bool, dt: float,
                    locx, locy, locz, dfr, it2, s2, k, xr_ref, xs_ref):
    i = pl.program_id(1)                       # time tile (accumulate)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE),
                                   1).astype(jnp.float32)
    tt = (i.astype(jnp.float32) * _LANE + lane + 1.0) * dt
    phi = (locx[...] * k[0:1, :] + locy[...] * k[1:2, :]
           + locz[...] * k[2:3, :])
    if has_df:
        phi = phi + dfr[...] * tt
    S, C = _sincos_m2pi(phi)
    if relax:
        E = jnp.exp(-tt * it2[...])
        C, S = C * E, S * E
    dims = (((1,), (1,)), ((), ()))            # contract the lane axis
    XR = jax.lax.dot_general(C, s2[...], dims,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    XS = jax.lax.dot_general(S, s2[...], dims,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        xr_ref[...] = jnp.zeros_like(xr_ref)
        xs_ref[...] = jnp.zeros_like(xs_ref)

    xr_ref[...] += XR
    xs_ref[...] += XS


def _sig_vjp_kernel(has_df: bool, relax: bool, dt: float,
                    locx, locy, locz, dfr, it2, w2, g2p, g2q, k,
                    xr_ref, xs_ref, dlx_ref, dly_ref, dlz_ref, dk_ref,
                    *opt_refs):
    r"""Full-VJP tile pass: one (spin tile j, time tile i) cell, time
    minor. Spin-indexed outputs (xr/xs/dloc/ddf/di2) accumulate across
    the consecutive time-tile sweep; the trajectory cotangent streams
    per-(j, i) partials (summed over spin tiles outside). Optional
    trailing refs: [ddf], [di2]."""
    oi = 0
    ddf_ref = di2_ref = None
    if has_df:
        ddf_ref = opt_refs[oi]
        oi += 1
    if relax:
        di2_ref = opt_refs[oi]
    i = pl.program_id(1)                       # time tile (minor)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE),
                                    1).astype(jnp.float32)
    tt = (i.astype(jnp.float32) * _LANE + lane + 1.0) * dt   # (1, 128)
    phi = (locx[...] * k[0:1, :] + locy[...] * k[1:2, :]
           + locz[...] * k[2:3, :])                          # (S, 128)
    if has_df:
        phi = phi + dfr[...] * tt
    S, C = _sincos_m2pi(phi)
    if relax:
        E = jnp.exp(-tt * it2[...])
        C, S = C * E, S * E

    hp = jax.lax.Precision.HIGHEST
    cdim = (((1,), (1,)), ((), ()))            # contract the lane axis
    XR = jax.lax.dot_general(C, g2p[...], cdim, precision=hp,
                             preferred_element_type=jnp.float32)
    XS = jax.lax.dot_general(S, g2p[...], cdim, precision=hp,
                             preferred_element_type=jnp.float32)

    wdim = (((0,), (0,)), ((), ()))            # contract the coil rows
    P = jax.lax.dot_general(w2[...], g2p[...], wdim, precision=hp,
                            preferred_element_type=jnp.float32)
    Q = jax.lax.dot_general(w2[...], g2q[...], wdim, precision=hp,
                            preferred_element_type=jnp.float32)
    dphi = _2PI * (P * S - Q * C)              # cycles-phase cotangent

    @pl.when(i == 0)
    def _():
        xr_ref[...] = jnp.zeros_like(xr_ref)
        xs_ref[...] = jnp.zeros_like(xs_ref)
        dlx_ref[...] = jnp.zeros_like(dlx_ref)
        dly_ref[...] = jnp.zeros_like(dly_ref)
        dlz_ref[...] = jnp.zeros_like(dlz_ref)
        if has_df:
            ddf_ref[...] = jnp.zeros_like(ddf_ref)
        if relax:
            di2_ref[...] = jnp.zeros_like(di2_ref)

    xr_ref[...] += XR
    xs_ref[...] += XS
    dlx_ref[...] += jnp.sum(dphi * k[0:1, :], axis=1, keepdims=True)
    dly_ref[...] += jnp.sum(dphi * k[1:2, :], axis=1, keepdims=True)
    dlz_ref[...] += jnp.sum(dphi * k[2:3, :], axis=1, keepdims=True)
    if has_df:
        ddf_ref[...] += jnp.sum(dphi * tt, axis=1, keepdims=True)
    if relax:
        di2_ref[...] += jnp.sum((C * P + S * Q) * (-tt), axis=1,
                                keepdims=True)

    sdim = (((0,), (0,)), ((), ()))            # contract the spin axis
    dk_ref[0, 0:1] = jax.lax.dot_general(
        locx[...], dphi, sdim, precision=hp,
        preferred_element_type=jnp.float32)
    dk_ref[0, 1:2] = jax.lax.dot_general(
        locy[...], dphi, sdim, precision=hp,
        preferred_element_type=jnp.float32)
    dk_ref[0, 2:3] = jax.lax.dot_general(
        locz[...], dphi, sdim, precision=hp,
        preferred_element_type=jnp.float32)


def _pad_spin_inputs(loc1, df1, T2s1, nSp, sp):
    pad = (-nSp) % sp
    f32 = jnp.float32
    locx = jnp.pad(loc1[:, 0], (0, pad)).astype(f32)[:, None]
    locy = jnp.pad(loc1[:, 1], (0, pad)).astype(f32)[:, None]
    locz = jnp.pad(loc1[:, 2], (0, pad)).astype(f32)[:, None]
    dfr = (jnp.zeros((nSp + pad, 1), f32) if df1 is None
           else jnp.pad(jnp.broadcast_to(df1, (nSp,)),
                        (0, pad)).astype(f32)[:, None])
    it2 = (jnp.zeros((nSp + pad, 1), f32) if T2s1 is None
           else jnp.pad(1.0 / jnp.broadcast_to(T2s1, (nSp,)),
                        (0, pad)).astype(f32)[:, None])
    return locx, locy, locz, dfr, it2, pad


def _pad_time(k1, nT):
    padt = (-nT) % _LANE
    return (jnp.pad(k1, ((0, 0), (0, padt))).astype(jnp.float32),
            nT + padt)


def signal_fwd_planes(w2, loc1, k1, df1, T2s1, dt: float, *,
                      interpret: bool = False):
    r"""One-batch fused forward: coil-weighted spins ``w2`` `(2nC, nM)`
    (rows ``[w_re; w_im]``), ``loc1`` `(nM, 3)`, ``k1`` `(3, nT)` →
    ``(U, V)`` `(nC·2, nT)` with ``s_re = U[:nC] − V[nC:]``,
    ``s_im = V[:nC] + U[nC:]`` (the XLA path's identity)."""
    nC2, nSp = w2.shape
    nT = k1.shape[-1]
    sp = _pick_sp(nSp)
    locx, locy, locz, dfr, it2, pad = _pad_spin_inputs(
        loc1, df1, T2s1, nSp, sp)
    w2 = jnp.pad(w2, ((0, 0), (0, pad))).astype(jnp.float32)
    k1, nTp = _pad_time(k1, nT)
    nst, ntt = (nSp + pad) // sp, nTp // _LANE

    spin = pl.BlockSpec((sp, 1), lambda i, j: (j, 0))
    kern = functools.partial(_sig_fwd_kernel, df1 is not None,
                             T2s1 is not None, float(dt))
    u, v = pl.pallas_call(
        kern,
        grid=(ntt, nst),
        in_specs=[spin, spin, spin, spin, spin,
                  pl.BlockSpec((nC2, sp), lambda i, j: (0, j)),
                  pl.BlockSpec((3, _LANE), lambda i, j: (0, i))],
        out_specs=[pl.BlockSpec((nC2, _LANE), lambda i, j: (0, i)),
                   pl.BlockSpec((nC2, _LANE), lambda i, j: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((nC2, nTp), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(locx, locy, locz, dfr, it2, w2, k1)
    return u[:, :nT], v[:, :nT]


def signal_vjp_planes(g2, w2, loc1, k1, df1, T2s1, dt: float, *,
                      interpret: bool = False):
    r"""One-batch full VJP of the fused signal operator. ``g2``:
    `(2nC, nT)` cotangent rows ``[ḡ_re; ḡ_im]``; ``w2``: `(2nC, nM)`
    the forward's coil-weighted spins. Returns ``(XR, XS, dloc, dk,
    ddf, di2)``: the linear-adjoint factors `(nM, 2nC)` (combine to
    dM/dsens exactly as :func:`signal_adj_planes`'s), ``dloc``
    `(nM, 3)`, ``dk`` `(3, nT)`, ``ddf`` `(nM,)` (None if no df),
    ``di2`` `(nM,)` — the cotangent w.r.t. ``1/T2*`` (None if no T2s;
    chain ``dT2s = −di2/T2s²`` outside)."""
    nC2, nSp = w2.shape
    nT = k1.shape[-1]
    sp = _pick_sp(nSp)
    locx, locy, locz, dfr, it2, pad = _pad_spin_inputs(
        loc1, df1, T2s1, nSp, sp)
    w2 = jnp.pad(w2, ((0, 0), (0, pad))).astype(jnp.float32)
    k1, nTp = _pad_time(k1, nT)
    g2 = jnp.pad(g2, ((0, 0), (0, nTp - nT))).astype(jnp.float32)
    nC = nC2 // 2
    g2q = jnp.concatenate([g2[nC:], -g2[:nC]], 0)
    nst, ntt = (nSp + pad) // sp, nTp // _LANE
    has_df, relax = df1 is not None, T2s1 is not None

    spin = pl.BlockSpec((sp, 1), lambda j, i: (j, 0))
    lanes = pl.BlockSpec((nC2, _LANE), lambda j, i: (0, i))
    out_specs = [pl.BlockSpec((sp, nC2), lambda j, i: (j, 0))] * 2 \
        + [spin] * 3 \
        + [pl.BlockSpec((1, 3, _LANE), lambda j, i: (j, 0, i))]
    out_shape = [jax.ShapeDtypeStruct((nSp + pad, nC2),
                                      jnp.float32)] * 2 \
        + [jax.ShapeDtypeStruct((nSp + pad, 1), jnp.float32)] * 3 \
        + [jax.ShapeDtypeStruct((nst, 3, nTp), jnp.float32)]
    if has_df:
        out_specs.append(spin)
        out_shape.append(jax.ShapeDtypeStruct((nSp + pad, 1),
                                              jnp.float32))
    if relax:
        out_specs.append(spin)
        out_shape.append(jax.ShapeDtypeStruct((nSp + pad, 1),
                                              jnp.float32))

    kern = functools.partial(_sig_vjp_kernel, has_df, relax, float(dt))
    outs = pl.pallas_call(
        kern,
        grid=(nst, ntt),
        in_specs=[spin, spin, spin, spin, spin,
                  pl.BlockSpec((nC2, sp), lambda j, i: (0, j)),
                  lanes, lanes,
                  pl.BlockSpec((3, _LANE), lambda j, i: (0, i))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(locx, locy, locz, dfr, it2, w2, g2, g2q, k1)
    XR, XS = outs[0][:nSp], outs[1][:nSp]
    dloc = jnp.concatenate([outs[2], outs[3], outs[4]], -1)[:nSp]
    dk = jnp.sum(outs[5], axis=0)[:, :nT]
    oi = 6
    ddf = di2 = None
    if has_df:
        ddf = outs[oi][:nSp, 0]
        oi += 1
    if relax:
        di2 = outs[oi][:nSp, 0]
    return XR, XS, dloc, dk, ddf, di2


def signal_adj_planes(s2, loc1, k1, df1, T2s1, dt: float, *,
                      interpret: bool = False):
    r"""One-batch fused adjoint: ``s2`` `(2nC, nT)` (rows ``[s_re;
    s_im]``) → ``(XR, XS)`` `(nM, 2nC)` with ``XR = Σ_t C·E·s2``,
    ``XS = Σ_t S·E·s2`` — the XLA adjoint's pre-sensitivity factors
    (``x_re = XR[:, :nC] + XS[:, nC:]``, ``x_im = XR[:, nC:] −
    XS[:, :nC]``)."""
    nC2, nT = s2.shape
    nSp = loc1.shape[0]
    sp = _pick_sp(nSp)
    locx, locy, locz, dfr, it2, pad = _pad_spin_inputs(
        loc1, df1, T2s1, nSp, sp)
    k1, nTp = _pad_time(k1, nT)
    s2 = jnp.pad(s2, ((0, 0), (0, nTp - nT))).astype(jnp.float32)
    nst, ntt = (nSp + pad) // sp, nTp // _LANE

    spin = pl.BlockSpec((sp, 1), lambda j, i: (j, 0))
    kern = functools.partial(_sig_adj_kernel, df1 is not None,
                             T2s1 is not None, float(dt))
    xr, xs = pl.pallas_call(
        kern,
        grid=(nst, ntt),
        in_specs=[spin, spin, spin, spin, spin,
                  pl.BlockSpec((nC2, _LANE), lambda j, i: (0, i)),
                  pl.BlockSpec((3, _LANE), lambda j, i: (0, i))],
        out_specs=[pl.BlockSpec((sp, nC2), lambda j, i: (j, 0)),
                   pl.BlockSpec((sp, nC2), lambda j, i: (j, 0))],
        out_shape=[jax.ShapeDtypeStruct((nSp + pad, nC2),
                                        jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(locx, locy, locz, dfr, it2, s2, k1)
    return xr[:nSp], xs[:nSp]
