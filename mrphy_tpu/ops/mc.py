r"""Fused two-pool Bloch–McConnell engine taking raw waveforms — MT/CEST
simulation at volume scale.

:func:`blochsim_mc_rfgr` is to :func:`mrphy_tpu.ops.slowsims.blochsim_mc`
what :func:`mrphy_tpu.ops.sims.blochsim_rfgr` is to the Beff-streaming
single-pool engines: B-effective is assembled per step *inside* the time
loop from the rf/gr waveforms and the per-voxel fields, so live memory is
O(nM) instead of O(nM·nT). A whole-brain CEST saturation (1M voxels ×
10k steps) needs a 120 GB Beff in the streaming form — here it needs the
voxel maps plus a 10k-sample waveform.

Two backends behind one function:

- ``'xla'``: a chunk-rematerialized ``lax.scan`` — fully differentiable
  by autodiff w.r.t. EVERYTHING the physics depends on (``Mia``/``Mib``,
  ``rf``/``gr``, ``loc``, ``df``, ``b1Map``, and — unlike the single-pool
  fast engine — the tissue/exchange parameters ``T1a``/``T2a``/``T1b``/
  ``T2b``/``kab``/``kba``/``Ma0``/``Mb0``/``dfb``, whose gradients flow
  through the exact 2×2 propagator precompute). ``gam``/``dt`` get zero
  gradients (engine contract, like ``blochsim_rfgr``).
- ``'pallas'`` (:mod:`mrphy_tpu.ops.mc_pallas`): fused TPU kernels for
  BOTH passes — the forward streams chunk-start checkpoints, and the
  backward is a hand-derived two-phase chunk adjoint (forward-recompute
  into VMEM, cotangent recursion over the stored states; no step
  inversion, so it is sound for arbitrarily contracting exchange).
  Fully differentiable w.r.t. everything the XLA path is — tissue/
  exchange parameters flow through in-kernel propagator-plane
  cotangents chained through ``mc_propagators``. Instances the bwd
  kernel cannot fit (divisor-poor nT, oversized waveform-grad
  partials) fall back to a recompute-through-XLA adjoint.

No counterpart in the reference (single-pool only); validated against
exact 2×2 exchange solutions and the oracle in ``tests/test_mc.py``.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu._kwalias import kwalias
from mrphy_tpu.ops.pallas_kernels import _PHI_EPS
from mrphy_tpu.ops.sims import (_LANE, _pad_axis, _padded_spins,
                                _pick_tc_xla, _assemble_b)
from mrphy_tpu.ops.slowsims import mc_propagators
from mrphy_tpu.utils._shapes import rshape

__all__ = ['blochsim_mc_rfgr']


def _rot_planes(b, m):
    r"""Rodrigues rotation in planes layout — the same formulation as the
    Pallas kernel (``mc_pallas._mc_fwd_kernel``), so the two backends
    agree to the sincos implementation difference (~1e-7/step).
    ``b``/``m``: `(N, 3, S1, L)`, ``b`` in radians."""
    n2 = jnp.maximum(jnp.sum(b * b, 1), _PHI_EPS ** 2)
    inv = jax.lax.rsqrt(n2)
    phi = n2 * inv
    u = b * inv[:, None]
    s, c = jnp.sin(phi), jnp.cos(phi)
    utm = jnp.sum(u * m, 1)
    ux, uy, uz = u[:, 0], u[:, 1], u[:, 2]
    mx, my, mz = m[:, 0], m[:, 1], m[:, 2]
    cross = jnp.stack([uy * mz - uz * my, uz * mx - ux * mz,
                       ux * my - uy * mx], 1)
    return (m - s[:, None] * cross
            + (c - 1.0)[:, None] * (m - utm[:, None] * u))


def _mc_xla_core(ma, mb, rf_t, gr_t, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd):
    r"""Differentiable XLA core, planes layout: chunk-rematerialized scan
    (O(nM·tc) residuals — the autodiff-through-scan default would hold
    O(nM·nT)). Argument order is the ``custom_vjp`` contract shared with
    the Pallas path's backward."""
    X00, X01, X10, X11 = (Xp[:, k] for k in range(4))
    Z00, Z01, Z10, Z11, ca, cb = (Zp[:, k] for k in range(6))

    def step(carry, xs):
        ma, mb = carry
        rf_1, gr_1 = xs
        b = _assemble_b(rf_1, gr_1, loc_p, dfg, b1_p, g2pd)
        a1 = _rot_planes(b, ma)
        b1 = _rot_planes(b.at[:, 2].add(sb), mb)
        ma2 = jnp.stack(
            [X00 * a1[:, 0] + X01 * b1[:, 0],
             X00 * a1[:, 1] + X01 * b1[:, 1],
             Z00 * a1[:, 2] + Z01 * b1[:, 2] + ca], 1)
        mb2 = jnp.stack(
            [X10 * a1[:, 0] + X11 * b1[:, 0],
             X10 * a1[:, 1] + X11 * b1[:, 1],
             Z10 * a1[:, 2] + Z11 * b1[:, 2] + cb], 1)
        return (ma2, mb2), None

    nT = gr_t.shape[0]
    tc = _pick_tc_xla(nT)
    if nT > tc:
        @jax.checkpoint
        def chunk(carry, xs):
            return jax.lax.scan(step, carry, xs)

        (ma, mb), _ = jax.lax.scan(
            chunk, (ma, mb),
            (rf_t.reshape((nT // tc, tc) + rf_t.shape[1:]),
             gr_t.reshape((nT // tc, tc) + gr_t.shape[1:])))
    else:
        (ma, mb), _ = jax.lax.scan(step, (ma, mb), (rf_t, gr_t))
    return ma, mb


def _pallas_fwd_impl(interpret, small, ma, mb, rf_t, gr_t, loc_p, dfg,
                     b1_p, sb, Xp, Zp, g2pd):
    from mrphy_tpu.ops import mc_pallas
    N = ma.shape[0]
    mi6 = jnp.concatenate([ma, mb], axis=1)            # (N, 6, S1, L)
    nT = rf_t.shape[0]
    nC = rf_t.shape[-1]
    rf2 = rf_t.transpose(1, 2, 3, 0).reshape(N, 2 * nC, nT)
    gr2 = gr_t.transpose(1, 2, 0)                      # (N, 3, nT)
    b1_4 = None if b1_p is None else b1_p.reshape(
        N, 2 * nC, *b1_p.shape[3:])
    out, chk = mc_pallas.mc_fwd_planes(mi6, rf2, gr2, loc_p, dfg, b1_4,
                                       sb, Xp, Zp, g2pd,
                                       small_phi=small,
                                       interpret=interpret)
    return (out[:, :3], out[:, 3:]), chk


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mc_core_pallas(interpret, small, ma, mb, rf_t, gr_t, loc_p, dfg,
                    b1_p, sb, Xp, Zp, g2pd):
    return _pallas_fwd_impl(interpret, small, ma, mb, rf_t, gr_t, loc_p,
                            dfg, b1_p, sb, Xp, Zp, g2pd)[0]


def _mc_core_pallas_fwd(interpret, small, *args):
    out, chk = _pallas_fwd_impl(interpret, small, *args)
    return out, (args, chk)


def _mc_core_pallas_bwd(interpret, small, res, g):
    r"""Fused two-pool adjoint (hand-derived two-phase chunk kernel in
    :mod:`mrphy_tpu.ops.mc_pallas`) when the instance fits it; otherwise
    the recompute-through-XLA adjoint (same math as the XLA backend's
    autodiff — used for divisor-poor nT or oversized waveform-grad
    partials). Tissue/exchange-parameter gradients flow through the
    propagator-plane cotangents (dX/dZ), which the wrapper chains through
    ``mc_propagators`` by autodiff."""
    from mrphy_tpu.ops import mc_pallas
    args, chk = res
    (ma, mb, rf_t, gr_t, loc_p, dfg, b1_p, sb, Xp, Zp, g2pd) = args
    N, _, S1, _ = ma.shape
    nT = rf_t.shape[0]
    nC = rf_t.shape[-1]
    if not mc_pallas.mc_bwd_is_available(nT=nT, S1=S1, nC=nC,
                                         ntiles_hbm_n=N):
        _, vjp = jax.vjp(_mc_xla_core, *args)
        return vjp(g)
    rf2 = rf_t.transpose(1, 2, 3, 0).reshape(N, 2 * nC, nT)
    gr2 = gr_t.transpose(1, 2, 0)
    b1_4 = None if b1_p is None else b1_p.reshape(
        N, 2 * nC, *b1_p.shape[3:])
    g6 = jnp.concatenate([g[0], g[1]], axis=1)
    (dmi6, drf2, dgr2, dloc, ddfg, db1g, dsb, dXg, dZg) = \
        mc_pallas.mc_bwd_planes(chk, g6, rf2, gr2, loc_p, dfg, b1_4, sb,
                                Xp, Zp, g2pd, small_phi=small,
                                interpret=interpret)
    drf_t = drf2.reshape(N, 2, nC, nT).transpose(3, 0, 1, 2)
    dgr_t = dgr2.transpose(2, 0, 1)
    db1_p = None if db1g is None else db1g.reshape(b1_p.shape)
    return (dmi6[:, :3], dmi6[:, 3:], drf_t, dgr_t, dloc, ddfg, db1_p,
            dsb, dXg, dZg, jnp.zeros_like(g2pd))


_mc_core_pallas.defvjp(_mc_core_pallas_fwd, _mc_core_pallas_bwd)


@kwalias(**{'γ': 'gam', 'Δf': 'df'})
def blochsim_mc_rfgr(Mia, Mib, rf, gr, loc, *, T1a, T2a, T1b, T2b,
                     kab, kba, Ma0=1.0, Mb0=0.1, dfb=0.0, df=None,
                     b1Map=None, gam=gamH, dt=dt0,
                     backend: str = 'auto', mesh=None,
                     max_phi: Optional[float] = None,
                     _pallas_interpret: bool = False):
    r"""Fused two-pool Bloch–McConnell simulator taking raw waveforms:
    volume-scale MT/CEST without materializing B-effective.

    Equivalent to ``slowsims.blochsim_mc(Mia, Mib, rfgr2beff(rf, gr,
    loc, Δf=df, b1Map=b1Map), ...)`` but B-effective is assembled per
    step inside the scan — O(nM) live memory for any ``nT``, with a
    fused Pallas fast path (``backend='auto'`` engages it from 32k
    voxels, f32, waveforms fitting SMEM).

    Inputs:
        - ``Mia``/``Mib``: `(N, *Nd, xyz)` pool states (absolute units —
          equilibria are ``Ma0``/``Mb0``);
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss";
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm"; ``loc``: `(N, *Nd, xyz)`,
          "cm".
    Optionals (each `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1)` where per-spin):
        - ``T1a``/``T2a``/``T1b``/``T2b``: "Sec"; ``kab``/``kba``:
          "1/Sec" exchange rates (detailed balance when
          ``kab·Ma0 == kba·Mb0``); ``Ma0``/``Mb0``: equilibria;
        - ``dfb``: "Hz", pool-b chemical shift; ``df``: "Hz", pool-a
          (B0) off-resonance — pool b sees ``df + dfb``;
        - ``b1Map``: `(N, *Nd, xy, (nCoils))` transmit sensitivities;
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` —
          shard_map over the voxel axis (compact `(N, nM, xyz)` layout);
        - ``max_phi``: caller-guaranteed bound on the per-step rotation
          angle (radians) of EITHER pool — pool b's field includes the
          extra ``2π·dt·(df+dfb)`` z term, so a sound bound is
          ``rfgr_phi_bound(...) + 2π·dt·max|dfb|``; when ≤ π/2 the
          Pallas kernel skips the sincos range reduction.
    Outputs: ``(Ma, Mb)``, `(N, *Nd, xyz)` each.

    Differentiable w.r.t. every physics input (including the tissue and
    exchange parameters, through the exact-propagator precompute) on
    both backends — the Pallas path's VJP is the fused two-phase chunk
    adjoint kernel (parity with the XLA grads pinned at 1e-5/f32 and
    against the kernel-math autodiff oracle at 1e-7/f64 in
    ``tests/test_mc.py``), with a recompute-through-XLA fallback for
    instances the kernel cannot fit. ``gam``/``dt`` get zero gradients
    (engine contract, matching ``blochsim_rfgr``).

    Beyond-reference family (``/root/reference/mrphy`` is single-pool);
    shares the rotate-then-exchange splitting and exact interval
    propagators of :func:`mrphy_tpu.ops.slowsims.blochsim_mc` — O(dt)
    splitting error, exchange/relaxation substep exact for any ``dt``.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import mc_rfgr_sharded_traceable
        Mia = jnp.asarray(Mia)
        assert Mia.ndim == 3, 'mesh= requires compact (N, nM, xyz) layout'
        return mc_rfgr_sharded_traceable(
            mesh, Mia, Mib, rf, gr, loc, T1a=T1a, T2a=T2a, T1b=T1b,
            T2b=T2b, kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb, df=df,
            b1Map=b1Map, gam=gam, dt=dt, backend=backend,
            max_phi=max_phi, _pallas_interpret=_pallas_interpret)

    Mia, Mib, rf, gr, loc = (jnp.asarray(x)
                             for x in (Mia, Mib, rf, gr, loc))
    assert Mia.shape == Mib.shape, (Mia.shape, Mib.shape)
    assert Mia.shape[:-1] == loc.shape[:-1], 'Mi/loc (N, *Nd) mismatch'
    small_phi = max_phi is not None and float(max_phi) <= pi / 2

    NNd = Mia.shape[:-1]
    N, Nd = NNd[0], NNd[1:]
    nS = math.prod(Nd) if Nd else 1
    Sp = _padded_spins(nS)
    S1 = Sp // _LANE
    nT = gr.shape[2]
    dtype = jnp.result_type(rf.dtype, gr.dtype, Mia.dtype)
    Mia, Mib, loc = (x.astype(dtype) for x in (Mia, Mib, loc))

    def planes(x, k):  # (N, nS, k) → (N, k, S1, L)
        x = _pad_axis(x.reshape(N, nS, k).transpose(0, 2, 1), 2, Sp)
        return x.reshape(N, k, S1, _LANE)

    ma, mb = planes(Mia, 3), planes(Mib, 3)
    loc_p = planes(loc, 3)
    if rf.ndim == 3:
        rf = rf[..., None]                               # add coil dim
    rf_t = rf.transpose(2, 0, 1, 3).astype(dtype)        # (nT, N, 2, C)
    gr_t = gr.transpose(2, 0, 1).astype(dtype)           # (nT, N, 3)

    def flat(x):  # `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1)` param → (N, nS)
        x = rshape(jnp.asarray(x, dtype=dtype), len(NNd))
        return jnp.broadcast_to(x, NNd).reshape(N, nS)

    def padf(x, fill=0.0):  # (N, nS) → (N, S1, L)
        return _pad_axis(x, 1, Sp, fill=fill).reshape(N, S1, _LANE)

    # γ/dt zero-gradient contract: stop_gradient the scales everywhere
    # they enter (a live scale would leak PARTIAL γ/dt gradients).
    dt_f = jax.lax.stop_gradient(flat(dt))
    g2pd = padf(2 * pi * jax.lax.stop_gradient(flat(gam)) * dt_f)
    loc_p = g2pd[:, None] * loc_p
    # dfg = γ2πdt·(df/γ) = 2πdt·df — γ cancels exactly
    dfg = None if df is None else padf(flat(df) * 2 * pi * dt_f)
    sb = padf(flat(dfb) * 2 * pi * dt_f)                 # pool-b z offset

    if b1Map is None:
        b1_p = None
        nC = rf_t.shape[-1]
    else:
        b1Map = jnp.asarray(b1Map, dtype)
        if b1Map.ndim == 2 + len(Nd):
            b1Map = b1Map[..., None]                     # add coil dim
        nC = b1Map.shape[-1]
        b1 = jnp.broadcast_to(b1Map.reshape(N, -1, 2, nC),
                              (N, nS, 2, nC))            # (N, nS, 2, C)
        b1 = _pad_axis(b1.transpose(0, 2, 3, 1), 3, Sp)  # (N, 2, C, Sp)
        b1_p = g2pd[:, None, None] * b1.reshape(N, 2, nC, S1, _LANE)

    # exact per-step exchange/relaxation propagators (per voxel);
    # autodiff chains tissue/exchange-parameter gradients through here
    props = mc_propagators(flat(T1a), flat(T2a), flat(T1b), flat(T2b),
                           flat(kab), flat(kba), flat(Ma0), flat(Mb0),
                           dt_f)
    Xp = jnp.stack([padf(p) for p in props[:4]], axis=1)   # (N,4,S1,L)
    Zp = jnp.stack([padf(p) for p in props[4:]], axis=1)   # (N,6,S1,L)

    if backend == 'auto':
        from mrphy_tpu.ops import mc_pallas
        backend = ('pallas' if (not _pallas_interpret and
                                mc_pallas.mc_is_available(
                                    N=N, dtype=dtype, nspins=nS, nT=nT,
                                    nC=nC))
                   else 'xla')

    if backend == 'pallas' or _pallas_interpret:
        ma_o, mb_o = _mc_core_pallas(_pallas_interpret, small_phi, ma,
                                     mb, rf_t, gr_t, loc_p, dfg, b1_p,
                                     sb, Xp, Zp, g2pd)
    elif backend == 'xla':
        ma_o, mb_o = _mc_xla_core(ma, mb, rf_t, gr_t, loc_p, dfg, b1_p,
                                  sb, Xp, Zp, g2pd)
    else:
        raise ValueError(f'unknown backend {backend!r}')

    def unplanes(x):
        x = x.reshape(N, 3, Sp).transpose(0, 2, 1)[:, :nS]
        return x.reshape(NNd + (3,))

    return unplanes(ma_o), unplanes(mb_o)
