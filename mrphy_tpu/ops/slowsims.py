r"""Bloch simulation with implicit (autodiff) Jacobians — the oracle engine.

Feature parity with ``/root/reference/mrphy/slowsims.py``: a pure
``lax.scan`` over the composed L1/L2 helpers (``beff2uphi`` + ``uphirot`` +
relaxation), differentiable by plain ``jax.grad``. This is the correctness
oracle the explicit-Jacobian engine (:mod:`mrphy_tpu.ops.sims`) is tested
against, mirroring the reference's test strategy
(``/root/reference/tests/test_sims.py:26-28``).

Unlike the reference's Python loop (``slowsims.py:101-113``), the scan is a
single compiled XLA loop; reverse-mode AD through ``lax.scan`` gives the
standard checkpoint-free reverse scan. For long pulses under memory
pressure, wrap calls in ``jax.checkpoint`` or use
:func:`blochsim_segmented` for time-segmented rematerialization.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu._kwalias import kwalias
from mrphy_tpu.ops import beffective
from mrphy_tpu.utils import uphirot
from mrphy_tpu.utils._shapes import rshape

__all__ = ['blochsim_1step', 'blochsim', 'blochsim_ab',
           'blochsim_segmented', 'blochsim_tparallel', 'blochsim_mc',
           'mc_propagators', 'freeprec']


@kwalias(**{'γ2πdt': 'gam2pidt'})
def blochsim_1step(M, M1, b, E1, E1_1, E2, gam2pidt):
    r"""Single Bloch step: rotation by B-effective + relaxation.

    Inputs:
        - ``M``: `(N, *Nd, xyz)`, spins.
        - ``M1``: ignored (the reference takes a pre-allocated output buffer,
          ``slowsims.py:15-31``; functional JAX needs none — kept for call
          compatibility).
        - ``b``: `(N, *Nd, xyz)`, "Gauss", B-effective of this step.
        - ``E1``, ``E1_1`` (=E1-1), ``E2``: `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`.
        - ``gam2pidt`` (alias ``γ2πdt``): `()` ⊻ broadcastable, "Rad/Gauss".
    Outputs:
        - ``(M, M1)``: stepped spins, and the previous spins (the reference
          returns its swapped double-buffer pair, ``slowsims.py:53-54``).

    Parity: ``/root/reference/mrphy/slowsims.py:15-54``.
    """
    M = jnp.asarray(M)
    u, phi = beffective.beff2uphi(b, gam2pidt)
    Mr = uphirot(u, phi, M)
    E1, E1_1, E2 = (jnp.asarray(x) for x in (E1, E1_1, E2))
    Mnew = jnp.concatenate([Mr[..., 0:2] * E2[..., None],
                            (Mr[..., 2] * E1 - E1_1)[..., None]], axis=-1)
    return Mnew, M


@kwalias(**{'γ': 'gam'})
def blochsim(M, Beff, *, T1: Optional[jax.Array] = None,
             T2: Optional[jax.Array] = None, gam=gamH, dt=dt0,
             mesh=None):
    r"""Bloch simulator with implicit (autodiff) Jacobians.

    Inputs:
        - ``M``: `(N, *Nd, xyz)`, spins (equilibrium ``[0, 0, 1]``).
        - ``Beff``: `(N, *Nd, nT, xyz)`, "Gauss".
    Optionals:
        - ``T1``/``T2``: `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Sec"; pass both
          ``None`` to ignore relaxation.
        - ``gam`` (alias ``γ``): `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Hz/Gauss".
        - ``dt``: `()` ⊻ `(N ⊻ 1,)`, "Sec".
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` to
          run multi-chip via shard_map (compact `(N, nM, xyz)` layout
          only; spins shard by shape, scalars replicate).
    Outputs:
        - ``M``: `(N, *Nd, xyz)`, spins after the pulse.

    Parity: ``/root/reference/mrphy/slowsims.py:57-114``; the hot loop is
    ``lax.scan`` over the time axis.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import oracle_sharded_traceable
        return oracle_sharded_traceable(mesh, M, Beff, T1=T1, T2=T2,
                                        gam=gam, dt=dt)
    M, Beff = jnp.asarray(M), jnp.asarray(Beff)
    assert M.shape[:-1] == Beff.shape[:-2], \
        f'M {M.shape} and Beff {Beff.shape} disagree on (N, *Nd)'
    ndim = M.ndim - 1

    assert (T1 is None) == (T2 is None), 'pass both T1 and T2, or neither'
    one = jnp.ones((), dtype=M.dtype)
    dt_r = rshape(dt, ndim)
    E1 = one if T1 is None else jnp.exp(-dt_r / rshape(T1, ndim))
    E2 = one if T2 is None else jnp.exp(-dt_r / rshape(T2, ndim))
    # expm1, not exp()-1: E1 ≈ 1-4e-6 at µs dwell times and the
    # subtraction cancels catastrophically in f32
    E1_1 = (jnp.zeros_like(one) if T1 is None
            else jnp.expm1(-dt_r / rshape(T1, ndim)))
    gam2pidt = 2 * pi * rshape(gam, ndim) * dt_r

    beff_t = jnp.moveaxis(Beff, -2, 0)  # (nT, N, *Nd, xyz)

    def step(m, b_t):
        m1, _ = blochsim_1step(m, None, b_t, E1, E1_1, E2, gam2pidt)
        return m1, None

    M, _ = jax.lax.scan(step, M, beff_t)
    return M


@kwalias(**{'γ': 'gam'})
def blochsim_segmented(M, Beff, *, T1=None, T2=None, gam=gamH, dt=dt0,
                       segments: int = 8):
    r"""Time-segmented, rematerialized Bloch simulation.

    Same result as :func:`blochsim`, but the time axis is split into
    ``segments`` chunks each wrapped in ``jax.checkpoint``: reverse-mode AD
    stores only segment-boundary states and recomputes within segments —
    O(nT/segments + segments) live memory instead of O(nT). This is the
    TPU-native answer to the reference's memory/compute trade discussion
    (``/root/reference/mrphy/sims.py:298-301``).

    ``nT`` must be divisible by ``segments``.
    """
    M, Beff = jnp.asarray(M), jnp.asarray(Beff)
    nT = Beff.shape[-2]
    assert nT % segments == 0, f'nT={nT} not divisible by segments={segments}'

    @jax.checkpoint
    def run_segment(m, beff_seg):
        return blochsim(m, beff_seg, T1=T1, T2=T2, gam=gam, dt=dt), None

    segs = jnp.moveaxis(Beff, -2, 0).reshape(
        (segments, nT // segments) + Beff.shape[:-2] + (3,))
    segs = jnp.moveaxis(segs, 1, -2)  # (segments, N, *Nd, nT/seg, xyz)
    M, _ = jax.lax.scan(run_segment, M, segs)
    return M


def blochsim_ab(M, A, B):
    r"""Apply a Hargreaves affine propagator: ``M → A·M + B``.

    Inputs:
        - ``M``: `(N, *Nd, xyz)`; ``A``: `(N, *Nd, xyz, 3)`;
          ``B``: `(N, *Nd, xyz)`.
    Outputs:
        - ``M``: `(N, *Nd, xyz)`.

    Parity: ``/root/reference/mrphy/slowsims.py:117-131``.
    """
    M, A, B = jnp.asarray(M), jnp.asarray(A), jnp.asarray(B)
    # HIGHEST: TPU's default bf16-input einsum drifts ~1e-3 (CLAUDE.md)
    return jnp.einsum('...ij,...j->...i', A, M,
                      precision=jax.lax.Precision.HIGHEST) + B


@kwalias(**{'Δf': 'df'})
def freeprec(M, dur, *, T1=None, T2=None, df=None, mesh=None):
    r"""Free precession with relaxation and off-resonance (closed form).

    Inputs:
        - ``M``: `(N, *Nd, xyz)`, spins.
        - ``dur``: `()` ⊻ `(N ⊻ 1,)`, "Sec", duration.
    Optionals:
        - ``T1``/``T2``: `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Sec" (both or neither).
        - ``df`` (alias ``Δf``): `(N ⊻ 1, *Nd ⊻ 1,)`, "Hz"; positive ``df``
          dephases clockwise (negative φ).
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` to
          run voxel-sharded via shard_map (compact `(N, nM, xyz)` only;
          the qMRI fitting workloads are embarrassingly voxel-parallel).
    Outputs:
        - ``M``: `(N, *Nd, xyz)`.

    Parity: ``/root/reference/mrphy/slowsims.py:134-174``.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import oracle_freeprec_traceable
        return oracle_freeprec_traceable(mesh, M, dur, T1=T1, T2=T2,
                                         df=df)
    M = jnp.asarray(M)
    ndim = M.ndim
    dur = rshape(dur, ndim)

    Mx, My, Mz = M[..., 0:1], M[..., 1:2], M[..., 2:3]

    if df is not None:
        df = rshape(df, ndim)
        phi = -(2 * pi) * df * dur
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        Mx, My = cphi * Mx - sphi * My, sphi * Mx + cphi * My

    assert (T1 is None) == (T2 is None), 'pass both T1 and T2, or neither'
    if T1 is not None:
        T1, T2 = rshape(T1, ndim), rshape(T2, ndim)
        E1, E2 = jnp.exp(-dur / T1), jnp.exp(-dur / T2)
        Mx, My, Mz = E2 * Mx, E2 * My, E1 * Mz + 1 - E1

    return jnp.concatenate((Mx, My, Mz), axis=-1)


@kwalias(**{'γ': 'gam'})
def blochsim_tparallel(M, Beff, *, T1=None, T2=None, gam=gamH, dt=dt0):
    r"""Parallel-in-time Bloch simulation.

    Composes the per-step affine maps by pairwise tree reduction
    (:func:`mrphy_tpu.ops.beffective.beff2ab_assoc`) and applies the
    resulting propagator — O(log nT) sequential depth instead of a scan.
    The TPU-idiomatic "sequence-axis" scaling path (SURVEY §2.9): use
    when nT, not nM, is the long axis (measured on one v5e: 8.3× faster
    than the sequential engine at 128 spins × 65536 steps). Memory: the
    first tree level holds 12 f32 planes of (nT, nSpins) — keep
    nT·nSpins ≲ 2.5e8 per 16 GB of HBM; at grid-scale nM the sequential
    engine is the right tool.

    Same signature/semantics as :func:`blochsim` (relaxation optional).
    """
    M, Beff = jnp.asarray(M), jnp.asarray(Beff)
    assert M.shape[:-1] == Beff.shape[:-2], \
        f'M {M.shape} and Beff {Beff.shape} disagree on (N, *Nd)'
    ndim = M.ndim - 1
    assert (T1 is None) == (T2 is None), 'pass both T1 and T2, or neither'
    one = jnp.ones((), dtype=M.dtype)
    dt_r = rshape(dt, ndim)
    E1 = one if T1 is None else jnp.exp(-dt_r / rshape(T1, ndim))
    E2 = one if T2 is None else jnp.exp(-dt_r / rshape(T2, ndim))
    A, B = beffective.beff2ab_assoc(Beff, E1=E1, E2=E2, gam=gam, dt=dt)
    return blochsim_ab(M, A, B)


def _expm2(a, b, c, d):
    r"""Closed-form matrix exponential of a 2×2 (batched elementwise):
    ``expm([[a, b], [c, d]])`` via the trace/deviator identity
    ``e^μ (cosh(q) I + sinh(q)/q (A − μI))``, ``μ = (a+d)/2``,
    ``q² = ((a−d)/2)² + bc``. For exchange matrices ``bc = kab·kba ≥ 0``
    so ``q`` is real; the ``q → 0`` limit uses the Taylor ``sinh(q)/q``.
    Returns the four entries ``(E00, E01, E10, E11)``."""
    mu = 0.5 * (a + d)
    dev = 0.5 * (a - d)
    q2 = dev * dev + b * c
    # double-where so grads stay finite at q2 -> 0 (d sqrt/dq2 is inf at
    # 0 and 0*inf = NaN otherwise — e.g. grad w.r.t. kab at zero
    # exchange with T2a == T2b, a natural fitting init)
    safe = q2 > 1e-16
    q = jnp.sqrt(jnp.where(safe, q2, 1.0))
    ch = jnp.where(safe, jnp.cosh(q), 1.0 + q2 / 2.0)
    shq = jnp.where(safe, jnp.sinh(q) / q, 1.0 + q2 / 6.0)
    em = jnp.exp(mu)
    return (em * (ch + shq * dev), em * (shq * b),
            em * (shq * c), em * (ch - shq * dev))


def mc_propagators(T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dt):
    r"""Exact per-step two-pool exchange/relaxation propagators
    (batched elementwise over any common broadcast shape).

    Returns the ten planes ``(X00, X01, X10, X11, Z00, Z01, Z10, Z11,
    ca, cb)``: the transverse 2×2 interval propagator ``X = expm(dt·
    [[−1/T2a−kab, kba], [kab, −1/T2b−kba]])``, the longitudinal ``Z``
    (same with R1), and the affine recovery ``c = A⁻¹(Z−I)·r`` with
    ``r = [R1a·Ma0, R1b·Mb0]·dt`` — so one step of free exchange+
    relaxation is ``[Ma⊥, Mb⊥] ← X·[Ma⊥, Mb⊥]`` and ``[Maz, Mbz] ←
    Z·[Maz, Mbz] + [ca, cb]``, exact for any ``dt``. Shared by the
    oracle (:func:`blochsim_mc`) and the fused engine
    (:func:`mrphy_tpu.ops.mc.blochsim_mc_rfgr`)."""
    t00 = (-1 / T2a - kab) * dt
    t11 = (-1 / T2b - kba) * dt
    tob, tba = kba * dt, kab * dt
    X00, X01, X10, X11 = _expm2(t00, tob, tba, t11)       # transverse
    z00 = (-1 / T1a - kab) * dt
    z11 = (-1 / T1b - kba) * dt
    Z00, Z01, Z10, Z11 = _expm2(z00, tob, tba, z11)       # longitudinal
    # affine recovery: c = A⁻¹ (E − I) r, with r = [R1a·Ma0, R1b·Mb0]·dt
    ra, rb = Ma0 * dt / T1a, Mb0 * dt / T1b
    det = z00 * z11 - tob * tba
    ia, ib_ = z11 / det, -tob / det
    ic, id_ = -tba / det, z00 / det
    e00, e01, e10, e11 = Z00 - 1.0, Z01, Z10, Z11 - 1.0
    ca = (ia * e00 + ib_ * e10) * ra + (ia * e01 + ib_ * e11) * rb
    cb = (ic * e00 + id_ * e10) * ra + (ic * e01 + id_ * e11) * rb
    return X00, X01, X10, X11, Z00, Z01, Z10, Z11, ca, cb


@kwalias(**{'γ': 'gam'})
def blochsim_mc(Ma, Mb, Beff, *, T1a, T2a, T1b, T2b, kab, kba,
                Ma0=1.0, Mb0=0.1, dfb=0.0, gam=gamH, dt=dt0, mesh=None):
    r"""Two-pool Bloch–McConnell simulator (magnetization transfer /
    CEST) — a model family beyond the reference, built from the same
    rotate-then-relax machinery.

    Each step: pool a rotates about ``Beff``, pool b about
    ``Beff + [0, 0, dfb/γ]`` (its chemical shift), then
    exchange+relaxation mix the pools with the EXACT interval propagator
    of the linear exchange system — per-component 2×2 matrix
    exponentials (transverse: ``[[-1/T2a-kab, kba], [kab, -1/T2b-kba]]``;
    longitudinal adds the ``R1·M0`` recovery as an affine term),
    precomputed once per call. The rotation/exchange splitting has
    O(dt) error (exact when ``kab·dt``, ``dt·Δω`` are small — the
    regime of MT/CEST with µs dwell times); the exchange/relaxation
    substep itself is exact for any ``dt``.

    Inputs:
        - ``Ma``/``Mb``: `(N, *Nd, xyz)`, pool magnetizations (absolute
          units — equilibria are ``Ma0``/``Mb0``, not 1).
        - ``Beff``: `(N, *Nd, nT, xyz)`, "Gauss" (shared RF/gradient
          field; pool b's shift enters via ``dfb``).
    Optionals (each `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1)`):
        - ``T1a``/``T2a``/``T1b``/``T2b``: "Sec".
        - ``kab``/``kba``: "1/Sec", exchange rates a→b / b→a (detailed
          balance holds when ``kab·Ma0 == kba·Mb0``).
        - ``Ma0``/``Mb0``: equilibrium longitudinal magnetizations.
        - ``dfb``: "Hz", pool-b chemical shift.
    Outputs:
        - ``(Ma, Mb)``: `(N, *Nd, xyz)` each, after all ``nT`` steps.

    Fully differentiable by autodiff (including w.r.t. the tissue and
    exchange parameters — like the other oracle-tier engines). Pass
    ``mesh`` (a ``(batch, spins)`` :class:`jax.sharding.Mesh`) to shard
    the voxel axis across chips via shard_map — Z-spectrum sweeps and
    CEST fitting are embarrassingly voxel-parallel (compact
    `(N, nM, xyz)` layout only).
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import mc_sharded_traceable
        return mc_sharded_traceable(
            mesh, Ma, Mb, Beff, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
            kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb, gam=gam, dt=dt)
    Ma, Mb, Beff = jnp.asarray(Ma), jnp.asarray(Mb), jnp.asarray(Beff)
    assert Ma.shape == Mb.shape, (Ma.shape, Mb.shape)
    assert Ma.shape[:-1] == Beff.shape[:-2], \
        f'Ma {Ma.shape} and Beff {Beff.shape} (N, *Nd) mismatch'
    ndim = Ma.ndim - 1
    dtype = Ma.dtype

    def par(x):
        return jnp.asarray(rshape(jnp.asarray(x, dtype), ndim))

    T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dfb, gam = (
        par(x) for x in (T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dfb,
                         gam))
    dt_ = jnp.asarray(rshape(jnp.asarray(dt, dtype), ndim))

    # exact per-step exchange/relaxation propagators (per spin)
    (X00, X01, X10, X11, Z00, Z01, Z10, Z11, ca, cb) = mc_propagators(
        T1a, T2a, T1b, T2b, kab, kba, Ma0, Mb0, dt_)

    gam2pidt = 2 * pi * gam * dt_
    shift = (dfb / gam)                                    # Gauss, pool b
    Beff_t = jnp.moveaxis(Beff, -2, 0)                     # (nT, N, *Nd, 3)

    def step(carry, bt):
        Ma, Mb = carry
        ua, pa = beffective.beff2uphi(bt, gam2pidt)
        Ma1 = uphirot(ua, pa, Ma)
        btb = bt.at[..., 2].add(shift)
        ub, pb = beffective.beff2uphi(btb, gam2pidt)
        Mb1 = uphirot(ub, pb, Mb)
        Ma2 = jnp.stack(
            [X00 * Ma1[..., 0] + X01 * Mb1[..., 0],
             X00 * Ma1[..., 1] + X01 * Mb1[..., 1],
             Z00 * Ma1[..., 2] + Z01 * Mb1[..., 2] + ca], -1)
        Mb2 = jnp.stack(
            [X10 * Ma1[..., 0] + X11 * Mb1[..., 0],
             X10 * Ma1[..., 1] + X11 * Mb1[..., 1],
             Z10 * Ma1[..., 2] + Z11 * Mb1[..., 2] + cb], -1)
        return (Ma2, Mb2), None

    (Ma, Mb), _ = jax.lax.scan(step, (Ma, Mb), Beff_t)
    return Ma, Mb
