r"""Pallas TPU kernels for 3-D NUFFT interpolation (sample ⇄ grid).

XLA's TPU gather/scatter serializes per element, which is why the 2-D
NUFFT uses dense one-hot MXU matmuls (``interp='matmul'``,
:mod:`mrphy_tpu.ops.nufft`). In 3-D the dense factors would cost
O(nT·G³) flops — unaffordable — so true-3D trajectories (koosh-ball,
3-D cones…) were stuck on the serialized gather path. These kernels are
the 3-D answer:

- the **oversampled spectrum grid lives in VMEM whole** (re+im; gated
  by :func:`sample3d_is_available` — e.g. a 128³ image at osf 1.25 is a
  164³ padded grid ≈ 2 × 17 MB, comfortably inside the v5e's 128 MB);
- each axis is **wrap-padded by W** on the XLA side, so a sample's
  W taps per axis are CONTIGUOUS runs — no per-tap mod, and the
  in-plane rows of one z-tap are ONE dynamic-SUBLANE-slice load
  ``B[(z·Gyp + yb) : +W, :]`` of the row-flattened grid (full lane
  rows: TPUs have no dynamic LANE offsets — the x taps are instead
  selected by an in-kernel dense lane vector built as W
  compare-selects against a lane iota, the same one-hot trick as the
  2-D matmul mode but at vector- not matmul-scale);
- KB weights factor separably: per sample a `(W, 1)` ``w_y`` sublane
  column, the ``w_x``-weighted one-hot lane row, and W ``w_z``
  scalars — per-sample work is W row-loads + W·W·Gxp VPU FMAs, no
  gather primitive anywhere;
- the adjoint scatters with read-modify-write `(W, Gxp)` row updates
  into the VMEM-resident output grid (zero-initialized at the first
  sample chunk, emitted once — the revisited output block never
  round-trips HBM).

Per-sample work is scalar-sequenced (Mosaic has no vector gather), but
it runs entirely from VMEM: measured on-chip at 96³ × 32k samples —
fwd 11.7 ms vs 37.0 ms gather (3.2×), adjoint 7.1 ms vs 44.7 ms
(6.3×), parity ≤1e-6 (suite `nufft3d`, benchmarks/RESULTS.md round 3).

Differentiability (round 4 — NATIVE): ``interp='pallas'`` plans are
fully differentiable with every cotangent computed by these kernels —
the data cotangents are the exact kernel transposes
(:func:`sample3d` ⇄ :func:`scatter3d`; the wrap-fold is the pad's
transpose), and the trajectory cotangent is ONE extra kernel pass
(:func:`dk3d`) that reuses the same z-tap row loads for all three
axis-derivative weight combinations. Derivative weights chain
``i0'`` via ``jax.jvp`` of the same ``_i0`` polynomial the forward
uses, so gradients match the XLA gather path's autodiff to f32
roundoff (``tests/test_nufft.py``). Losses that never differentiate
w.r.t. the trajectory (CG/learned recon) pay nothing — the unused
``dk3d`` call is dead code XLA eliminates.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['sample3d_is_available', 'prep_taps3d', 'pad_grid3d',
           'fold_grid3d', 'sample3d', 'scatter3d', 'dk3d',
           'sample3d_vjp', 'scatter3d_vjp']

_VMEM_BUDGET = 44 * 1024 * 1024      # padded grid, re+im, f32
_VMEM_LIMIT = 110 * 1024 * 1024
_CHUNK = 2048                        # samples per grid step


def _padded(plan):
    return tuple(g + plan.width for g in plan.grid_size)


def sample3d_is_available(plan, interpret: bool = False) -> bool:
    r"""Gate: 3-D plan whose wrap-padded re+im grid fits the VMEM
    budget (and a TPU to run on, unless interpreting)."""
    if plan.ndim != 3:
        return False
    nGp = int(np.prod(_padded(plan)))
    if 2 * 4 * nGp > _VMEM_BUDGET:
        return False
    if interpret:
        return True
    try:
        return jax.devices()[0].platform.startswith(('tpu', 'axon'))
    except RuntimeError:
        return False


def prep_taps3d(plan, ktraj, deriv: bool = False):
    r"""XLA-side tap/weight preparation for `(3, nT)` ``ktraj``:
    returns ``(rows (nT, W) int32, xb (nT,) int32, wz (nT, W) f32,
    wy (nT, W, 1) f32, wx (nT, W) f32)`` — ``rows[c, wz]`` is the
    first flattened row of that z-tap's in-plane block in the
    wrap-padded ``(Gzp·Gyp, Gxp)`` grid; taps are contiguous because
    each axis base is wrapped into ``[0, G)`` and the pad covers the
    overhang. ``wy`` carries an explicit trailing 1 so its per-sample
    block loads as a natural `(W, 1)` sublane column.

    With ``deriv=True`` additionally returns ``(wzd (nT, W),
    wyd (nT, W, 1), wxd (nT, W))`` — the per-axis KB weight
    derivatives ``dφ/dk_a`` (chain factor ``fov·G/n`` included), the
    derivative-weight operands of the trajectory-gradient kernel
    (:func:`dk3d`)."""
    from mrphy_tpu.ops.nufft import _kb, _kb_d
    W = plan.width
    offs = jnp.arange(W, dtype=ktraj.dtype)
    bases, wts, dwts = [], [], []
    for a, (G, f) in enumerate(zip(plan.grid_size, plan.fov)):
        scale = G / plan.im_size[a]
        v = ktraj[a] * f * scale
        base = jnp.floor(v - W / 2.0) + 1.0
        delta = v[:, None] - (base[:, None] + offs[None])
        wts.append(_kb(delta, W, plan.beta))
        if deriv:                        # dφ/dk = φ'(δ)·dv/dk
            dwts.append(_kb_d(delta, W, plan.beta) * (f * scale))
        bases.append(jnp.mod(base, G).astype(jnp.int32))
    Gzp, Gyp, Gxp = _padded(plan)
    rows = ((bases[0][:, None] + jnp.arange(W, dtype=jnp.int32)[None])
            * Gyp + bases[1][:, None])                   # (nT, W)
    f32 = jnp.float32
    out = (rows, bases[2], wts[0].astype(f32),
           wts[1].astype(f32)[..., None], wts[2].astype(f32))
    if deriv:
        out = out + (dwts[0].astype(f32),
                     dwts[1].astype(f32)[..., None],
                     dwts[2].astype(f32))
    return out


def pad_grid3d(plan, g):
    r"""Wrap-pad a `(Gz, Gy, Gx)` array by W on each axis (the DFT
    grid is periodic, so the overhanging taps read wrapped values)."""
    W = plan.width
    for a in range(3):
        idx = [slice(None)] * 3
        idx[a] = slice(0, W)
        g = jnp.concatenate([g, g[tuple(idx)]], axis=a)
    return g


def fold_grid3d(plan, gp):
    r"""Exact transpose of :func:`pad_grid3d`: fold the pad margins
    back onto the wrapped rows (adjoint of the periodic read)."""
    W = plan.width
    for a in (2, 1, 0):
        G = plan.grid_size[a]
        main = [slice(None)] * 3
        main[a] = slice(0, G)
        margin = [slice(None)] * 3
        margin[a] = slice(G, G + W)
        head = [slice(None)] * 3
        head[a] = slice(0, W)
        gp = gp[tuple(main)].at[tuple(head)].add(gp[tuple(margin)])
    return gp


def _ohx(xb, wx_row, W: int, Gxp: int, dtype):
    r"""Dense ``w_x``-weighted one-hot lane row `(1, Gxp)`: W
    compare-selects against a lane iota (no dynamic lane offsets on
    TPU). ``wx_row`` indexes SMEM scalars."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, Gxp), 1)
    oh = jnp.zeros((1, Gxp), dtype)
    for w in range(W):
        oh = oh + jnp.where(iota == xb + w, wx_row(w), 0.0)
    return oh


def _fwd3d_kernel(C: int, W: int, Gxp: int, rows_ref, xb_ref, wz_ref,
                  wx_ref, wy_ref, br_ref, bi_ref, sr_ref, si_ref):
    r"""One sample-chunk grid step: grid blocks are the whole padded
    spectrum (resident across the sequential chunk sweep). Per-sample
    scalar operands are (W, C)-ordered in SMEM — SMEM rows pad to
    512 B, so a (C, W) layout would cost C·512 B and overflow the 1 MB
    SMEM beyond ~500 samples per chunk (found the hard way: the Mosaic
    compile helper crashes rather than erroring)."""
    def body(c, _):
        oh = _ohx(xb_ref[c], lambda w: wx_ref[w, c], W, Gxp,
                  br_ref.dtype)
        wy = wy_ref[c]                                 # (W, 1)
        sre = 0.0
        sim = 0.0
        for wz in range(W):                            # static unroll
            rb = rows_ref[wz, c]
            tr = br_ref[pl.ds(rb, W), :]               # (W, Gxp)
            ti = bi_ref[pl.ds(rb, W), :]
            wgt = wz_ref[wz, c]
            sre = sre + wgt * jnp.sum(tr * wy * oh)
            sim = sim + wgt * jnp.sum(ti * wy * oh)
        sr_ref[c] = sre
        si_ref[c] = sim
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def sample3d(plan, br, bi, ktraj, *, interpret: bool = False):
    r"""Type-2 sample stage: `(Gz, Gy, Gx)` re/im spectrum → `(nT, 2)`
    samples. Pure forward (the public wrapper supplies gradients via
    the recompute-through-XLA VJP)."""
    W = plan.width
    nT = ktraj.shape[-1]
    rows, xb, wz, wy, wx = prep_taps3d(plan, ktraj)
    Gzp, Gyp, Gxp = _padded(plan)
    brp = pad_grid3d(plan, br).reshape(Gzp * Gyp, Gxp).astype(
        jnp.float32)
    bip = pad_grid3d(plan, bi).reshape(Gzp * Gyp, Gxp).astype(
        jnp.float32)

    C = min(_CHUNK, nT)
    pad = (-nT) % C
    if pad:  # padded samples read tap 0 with ZERO weights — inert
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        xb = jnp.pad(xb, (0, pad))
        wz = jnp.pad(wz, ((0, pad), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0)))
    nc = (nT + pad) // C

    smem = pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((W, C), lambda i: (0, i),
                         memory_space=pltpu.SMEM)
    whole = pl.BlockSpec((Gzp * Gyp, Gxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd3d_kernel, C, W, Gxp)
    sr, si = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[smem2, smem, smem2, smem2,
                  pl.BlockSpec((C, W, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  whole, whole],
        out_specs=[pl.BlockSpec((C,), lambda i: (i,),
                                memory_space=pltpu.SMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nT + pad,), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rows.T, xb, wz.T, wx.T, wy, brp, bip)
    return jnp.stack([sr[:nT], si[:nT]], -1)


def _adj3d_kernel(C: int, W: int, Gxp: int, rows_ref, xb_ref, wz_ref,
                  wx_ref, wy_ref, sr_ref, si_ref, br_ref, bi_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        br_ref[...] = jnp.zeros_like(br_ref)
        bi_ref[...] = jnp.zeros_like(bi_ref)

    def body(c, _):
        oh = _ohx(xb_ref[c], lambda w: wx_ref[w, c], W, Gxp,
                  br_ref.dtype)
        wyoh = wy_ref[c] * oh                          # (W, Gxp)
        sre = sr_ref[c]
        sim = si_ref[c]
        for wz in range(W):                            # static unroll
            rb = rows_ref[wz, c]
            w = wz_ref[wz, c] * wyoh
            br_ref[pl.ds(rb, W), :] += sre * w
            bi_ref[pl.ds(rb, W), :] += sim * w
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def scatter3d(plan, s, ktraj, *, interpret: bool = False):
    r"""Type-1 scatter stage: `(nT, 2)` samples → wrap-FOLDED
    `(2, Gz·Gy·Gx)` grid (the :func:`_adj_scatter` contract)."""
    W = plan.width
    nT = ktraj.shape[-1]
    rows, xb, wz, wy, wx = prep_taps3d(plan, ktraj)
    Gzp, Gyp, Gxp = _padded(plan)

    C = min(_CHUNK, nT)
    pad = (-nT) % C
    s2 = jnp.asarray(s, jnp.float32)
    if pad:  # zero samples scatter nothing
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        xb = jnp.pad(xb, (0, pad))
        wz = jnp.pad(wz, ((0, pad), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0)))
        s2 = jnp.pad(s2, ((0, pad), (0, 0)))
    nc = (nT + pad) // C

    smem = pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((W, C), lambda i: (0, i),
                         memory_space=pltpu.SMEM)
    whole = pl.BlockSpec((Gzp * Gyp, Gxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_adj3d_kernel, C, W, Gxp)
    br, bi = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[smem2, smem, smem2, smem2,
                  pl.BlockSpec((C, W, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  smem, smem],
        out_specs=[whole, whole],
        out_shape=[jax.ShapeDtypeStruct((Gzp * Gyp, Gxp),
                                        jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rows.T, xb, wz.T, wx.T, wy, s2[:, 0], s2[:, 1])
    br = fold_grid3d(plan, br.reshape(Gzp, Gyp, Gxp)).reshape(-1)
    bi = fold_grid3d(plan, bi.reshape(Gzp, Gyp, Gxp)).reshape(-1)
    return jnp.stack([br, bi])


# ------------------------------------------------------------------
# Native VJP (round 4): trajectory-gradient kernel + custom_vjp pair
# ------------------------------------------------------------------

def _dk3d_kernel(C: int, W: int, Gxp: int, rows_ref, xb_ref, wz_ref,
                 wx_ref, wzd_ref, wxd_ref, wy_ref, wyd_ref, gr_ref,
                 gi_ref, br_ref, bi_ref, dkz_ref, dky_ref, dkx_ref):
    r"""Per-sample trajectory cotangent: with separable weights
    ``w = w_z·w_y·w_x`` and sample cotangent ``(g_r, g_i)``,
    ``dk_a[c] = Σ_taps (∂w/∂k_a)·(g_r·B_r + g_i·B_i)[tap]`` — one
    combined plane ``G = g_r·B_r + g_i·B_i`` per z-tap row load
    (shared across the three axis derivatives), then three reductions
    against ``(w_y·oh_x)`` / ``(w'_y·oh_x)`` / ``(w_y·oh'_x)``."""
    def body(c, _):
        oh = _ohx(xb_ref[c], lambda w: wx_ref[w, c], W, Gxp,
                  br_ref.dtype)
        ohd = _ohx(xb_ref[c], lambda w: wxd_ref[w, c], W, Gxp,
                   br_ref.dtype)
        wy = wy_ref[c]                                 # (W, 1)
        wyd = wyd_ref[c]
        mr = gr_ref[c]
        mi = gi_ref[c]
        p_s = wy * oh                                  # (W, Gxp)
        p_dy = wyd * oh
        p_dx = wy * ohd
        az = 0.0
        ay = 0.0
        ax = 0.0
        for wz in range(W):                            # static unroll
            rb = rows_ref[wz, c]
            g = (mr * br_ref[pl.ds(rb, W), :]
                 + mi * bi_ref[pl.ds(rb, W), :])       # (W, Gxp)
            az = az + wzd_ref[wz, c] * jnp.sum(g * p_s)
            ay = ay + wz_ref[wz, c] * jnp.sum(g * p_dy)
            ax = ax + wz_ref[wz, c] * jnp.sum(g * p_dx)
        dkz_ref[c] = az
        dky_ref[c] = ay
        dkx_ref[c] = ax
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def dk3d(plan, br, bi, ktraj, gs, *, interpret: bool = False):
    r"""Trajectory cotangent `(3, nT)` of the interpolation stage:
    ``dk_a[t] = Σ_g (∂w(k_t)/∂k_a)·(gs_r[t]·B_r[g] + gs_i[t]·B_i[g])``.
    By ``Σ_t w(k_t)·s_t`` ↔ ``Σ_g w·B`` symmetry this ONE kernel is
    the k-cotangent of BOTH stages: for :func:`sample3d` pass the
    spectrum and the sample cotangent; for :func:`scatter3d` pass the
    grid COTANGENT as ``(br, bi)`` and the scattered SAMPLES as
    ``gs``."""
    W = plan.width
    nT = ktraj.shape[-1]
    (rows, xb, wz, wy, wx,
     wzd, wyd, wxd) = prep_taps3d(plan, ktraj, deriv=True)
    Gzp, Gyp, Gxp = _padded(plan)
    brp = pad_grid3d(plan, br).reshape(Gzp * Gyp, Gxp).astype(
        jnp.float32)
    bip = pad_grid3d(plan, bi).reshape(Gzp * Gyp, Gxp).astype(
        jnp.float32)

    C = min(_CHUNK, nT)
    pad = (-nT) % C
    g2 = jnp.asarray(gs, jnp.float32)
    if pad:  # zero weights AND zero cotangents — contributions inert
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        xb = jnp.pad(xb, (0, pad))
        wz, wx, wzd, wxd = (jnp.pad(a, ((0, pad), (0, 0)))
                            for a in (wz, wx, wzd, wxd))
        wy, wyd = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                   for a in (wy, wyd))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    nc = (nT + pad) // C

    smem = pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((W, C), lambda i: (0, i),
                         memory_space=pltpu.SMEM)
    vwy = pl.BlockSpec((C, W, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((Gzp * Gyp, Gxp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_dk3d_kernel, C, W, Gxp)
    dkz, dky, dkx = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[smem2, smem, smem2, smem2, smem2, smem2, vwy, vwy,
                  smem, smem, whole, whole],
        out_specs=[pl.BlockSpec((C,), lambda i: (i,),
                                memory_space=pltpu.SMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nT + pad,), jnp.float32)] * 3,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rows.T, xb, wz.T, wx.T, wzd.T, wxd.T, wy, wyd,
      g2[:, 0], g2[:, 1], brp, bip)
    return jnp.stack([dkz[:nT], dky[:nT], dkx[:nT]])


def sample3d_vjp(plan, br, bi, ktraj, *, interpret: bool = False):
    r""":func:`sample3d` with a NATIVE VJP (round 4; replaces the
    recompute-through-XLA wrapper): the spectrum cotangent is exactly
    :func:`scatter3d` of the sample cotangent (the kernels are exact
    transposes — the fold is the pad's transpose), and the trajectory
    cotangent is one :func:`dk3d` pass. A loss that never
    differentiates w.r.t. ``ktraj`` (CG/learned recon) pays nothing:
    the unused ``dk3d`` call is dead code XLA eliminates."""
    @jax.custom_vjp
    def f(br_, bi_, k_):
        return sample3d(plan, br_, bi_, k_, interpret=interpret)

    def fwd(br_, bi_, k_):
        return f(br_, bi_, k_), (br_, bi_, k_)

    def bwd(res, g):
        br_, bi_, k_ = res
        gb = scatter3d(plan, g, k_, interpret=interpret)
        dk = dk3d(plan, br_, bi_, k_, g, interpret=interpret)
        return (gb[0].reshape(br_.shape).astype(br_.dtype),
                gb[1].reshape(bi_.shape).astype(bi_.dtype),
                dk.astype(k_.dtype))

    f.defvjp(fwd, bwd)
    return f(br, bi, ktraj)


def scatter3d_vjp(plan, s, ktraj, *, interpret: bool = False):
    r""":func:`scatter3d` with a NATIVE VJP: the sample cotangent is
    :func:`sample3d` of the (folded-)grid cotangent — ``⟨g, fold(P s)⟩
    = ⟨pad(g), P s⟩`` and :func:`sample3d` pads internally, so the
    pair is an exact transpose — and the trajectory cotangent is
    :func:`dk3d` with the grid cotangent on the spectrum slot and the
    scattered samples on the cotangent slot (the sum
    ``Σ_t s_t·(∂w/∂k)·g[taps]`` is symmetric in the two)."""
    @jax.custom_vjp
    def f(s_, k_):
        return scatter3d(plan, s_, k_, interpret=interpret)

    def fwd(s_, k_):
        return f(s_, k_), (s_, k_)

    def bwd(res, g):
        s_, k_ = res
        gbr = g[0].reshape(plan.grid_size)
        gbi = g[1].reshape(plan.grid_size)
        ds = sample3d(plan, gbr, gbi, k_, interpret=interpret)
        dk = dk3d(plan, gbr, gbi, k_, s_, interpret=interpret)
        return ds.astype(s_.dtype), dk.astype(k_.dtype)

    f.defvjp(fwd, bwd)
    return f(s, ktraj)
