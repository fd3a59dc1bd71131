r"""Balanced SSFP signal models — transient trains and steady states.

Balanced sequences rewind every gradient within the TR, so (unlike the
spoiled trains in :mod:`mrphy_tpu.ops.epg`) no configuration orders
develop: each voxel is ONE isochromat whose per-TR evolution is an
instantaneous RF rotation plus closed-form precession/relaxation. That
makes the two canonical bSSFP workloads exact and cheap:

- :func:`bssfp_train` — the transient (non-steady) response to a
  variable flip/phase/TR train. This is the original MR-fingerprinting
  sequence (Ma et al., Nature 495:187, 2013: bSSFP MRF with
  pseudo-random flips and TRs, signal dependent on T1, T2 AND
  off-resonance), complementing :func:`mrphy_tpu.ops.epg.epg_spgr`
  (the FISP-MRF workhorse, which is insensitive to ``df``).
- :func:`bssfp_steady` — the steady state as one batched 3×3 linear
  solve ``m* = (I − A)⁻¹ b`` of the per-TR affine map (the fixed point
  the banding example reaches by brute-force propagator doubling).

Conventions match the package's Bloch engines (NOT the EPG literature's
sign choices): an RF pulse of flip ``α`` about phase ``φ`` is the
physical rotation ``uϕrot(u_φ, −α)`` (Bloch is M×B, so Φ = −γ2πdt·|B|,
cf. ``ops/beffective.beff2uphi``), and free precession by ``df`` over
``dur`` rotates the transverse plane by ``−2π·df·dur`` exactly as
:func:`mrphy_tpu.ops.slowsims.freeprec`. Signals are demodulated by the
transmit phase (receiver tracks the phase cycle), returned as real
``[re, im]`` pairs — complex dtypes are unsupported on some TPU
runtimes.

Everything is jittable and differentiable (flips, phases, T1, T2, df,
M0); ``bssfp_train`` accepts ``mesh=`` for voxel-sharded dictionary
generation (:func:`mrphy_tpu.parallel.mesh.bssfp_train_sharded_traceable`).

Beyond-reference model family (the reference simulates bSSFP only by
brute-force Bloch integration of the full waveform); validated in
``tests/test_ssfp.py`` against the Freeman–Hill/Scheffler mid-band
closed form, the package's own oracle ops (``slowsims.freeprec`` +
``uphirot`` composition), and train↔steady-state convergence across the
banding profile.
"""

import jax
import jax.numpy as jnp

from mrphy_tpu import pi
from mrphy_tpu.utils import uphirot

__all__ = ['bssfp_train', 'bssfp_steady']


def _relax_precess(M, dur, df, T1, T2, M0):
    r"""Closed-form free precession + relaxation over ``dur`` (batch
    scalars broadcast; ``freeprec`` semantics with an ``M0 ≠ 1``
    equilibrium)."""
    phi = -(2 * pi) * df * dur
    c, s = jnp.cos(phi), jnp.sin(phi)
    E2 = jnp.exp(-dur / T2)
    # expm1: at ms TRs `1 - exp(-dur/T1)` cancels ~3 f32 digits
    e1_1 = -jnp.expm1(-dur / T1)
    Mx = E2 * (c * M[..., 0] - s * M[..., 1])
    My = E2 * (s * M[..., 0] + c * M[..., 1])
    Mz = (1 - e1_1) * M[..., 2] + e1_1 * M0
    return jnp.stack([Mx, My, Mz], -1)


def bssfp_train(flips, *, T1, T2, tr, df=0.0, te=None, phis=None,
                dphi=pi, M0=1.0, b1=None, Minit=None, mesh=None,
                backend: str = 'xla'):
    r"""Transient balanced-SSFP train — instantaneous RF pulses with
    exact inter-pulse precession/relaxation, one isochromat per voxel.

    Per TR ``n``: RF pulse (flip ``flips[n]`` about phase ``φₙ``),
    precess/relax to TE where the signal ``(Mx + iMy)·e^{−iφₙ}`` is
    read (receiver demodulates by the transmit phase), then
    precess/relax over the TR remainder. No spoiling: the magnetization
    carries coherently into the next TR, so the signal depends on
    off-resonance ``df`` — bSSFP's banding, and bSSFP-MRF's df
    dimension.

    Inputs:
        - ``flips``: `(nTR,)` or `(*batch, nTR)`, "Rad".
        - ``T1``/``T2``: `()` ⊻ `(*batch,)`, "Sec".
        - ``tr``: `()` or `(nTR,)`, "Sec" — variable-TR trains (MRF)
          supported; an ``α/2−TR/2`` catalyzation is expressed by
          prepending the half-flip and half-TR to the train.
        - ``df``: `()` ⊻ `(*batch,)`, "Hz", off-resonance.
        - ``te``: `()` or `(nTR,)`, "Sec"; None → ``tr/2`` (the
          standard echo-time choice where bSSFP refocuses).
        - ``phis``: `(nTR,)` or `(*batch, nTR)`, "Rad" — explicit RF
          phase schedule; None → the linear cycle ``φₙ = n·dphi``.
        - ``dphi``: phase-cycle increment, "Rad" (default π — the
          alternating ±x scheme whose pass band is centered on
          resonance; sweep it for band-shifted phase-cycled bSSFP).
        - ``M0``: `()` ⊻ `(*batch,)`, equilibrium magnetization.
        - ``b1``: `()` ⊻ `(*batch,)` transmit scale multiplying the
          flip train (the dictionary's B1+ dimension) — uniform across
          backends and ``mesh=``.
        - ``Minit``: `(*batch, xyz)` initial state; None → equilibrium
          ``[0, 0, M0]``.
        - ``mesh``: optional ``(batch, spins)`` :class:`jax.sharding.Mesh`
          — voxel-sharded dispatch. Accepts batched `(nV, nTR)` flips
          or a shared `(nTR,)` train (replicated across shards; ``nV``
          then inferred from the per-voxel parameter arrays).
    Outputs:
        - ``signals``: `(*batch, nTR, 2)` real ([re, im] of the
          demodulated echo at TE).

    Differentiable w.r.t. ``flips``/``phis``/``T1``/``T2``/``df``/``M0``
    — bSSFP-MRF dictionaries, sequence optimization, and direct
    parameter fitting run by gradient descent.

    ``backend='pallas'``: the fused TPU kernel
    (:func:`mrphy_tpu.ops.ssfp_pallas.bssfp_train_pallas` — the
    magnetization stays in registers across the whole train, echoes
    stream out). Dictionary workload only: shared 1-D trains, 1-D atom
    batch, equilibrium start; ``jax.grad`` runs the in-kernel
    hand-transposed adjoint (``ssfp_pallas._bssfp_bwd_kernel``) —
    volume-scale direct bSSFP fitting and sequence design at kernel
    speed. Scalar AND variable `(nTR,)` ``tr``/``te`` trains are
    supported (the adjoint also yields d/d(tr, te) per TR there).
    """
    if mesh is not None:        # composes with backend='pallas': each
        # device runs the fused kernel on its voxel shard
        from mrphy_tpu.parallel.mesh import bssfp_train_sharded_traceable
        return bssfp_train_sharded_traceable(
            mesh, flips, T1=T1, T2=T2, tr=tr, df=df, te=te, phis=phis,
            dphi=dphi, M0=M0, b1=b1, Minit=Minit, backend=backend)
    if backend == 'pallas':
        from mrphy_tpu.ops.routing import route
        r = route('bssfp_train', backend='pallas', flips=flips,
                  T1=T1, T2=T2, tr=tr, te=te, df=df, M0=M0, b1=b1,
                  Minit=Minit)
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            # (a prepared Minit or per-voxel trains): XLA carries it
            return bssfp_train(flips, T1=T1, T2=T2, tr=tr, df=df,
                               te=te, phis=phis, dphi=dphi, M0=M0,
                               b1=b1, Minit=Minit, backend='xla')
        from mrphy_tpu.ops.ssfp_pallas import bssfp_train_pallas
        # natively differentiable: the in-kernel hand-transposed bSSFP
        # adjoint (round 4, ``ssfp_pallas._bssfp_bwd_kernel``) — volume
        # direct-fit / sequence-design gradients at kernel speed (the
        # recompute-through-XLA reverse held O(nTR·nV) scan residuals)
        pkw = {'phis': phis} if phis is not None else {'dphi': dphi}
        out = bssfp_train_pallas(flips, T1=T1, T2=T2, tr=tr, df=df,
                                 te=te, M0=M0, b1=b1, **pkw)
        # all-scalar batch: the XLA path returns an unbatched
        # (nTR, 2) train — drop the kernel's promoted 1-atom axis so
        # backend= never changes the output shape
        if jnp.ndim(flips) == 1 and all(
                x is None or jnp.ndim(x) == 0
                for x in (T1, T2, df, M0, b1)):
            out = out[0]
        return out
    assert backend == 'xla', backend
    if b1 is not None:          # per-voxel transmit scale (B1+ dim)
        flips = jnp.asarray(b1)[..., None] * jnp.asarray(flips)

    flips = jnp.asarray(flips)
    nTR = flips.shape[-1]
    T1b, T2b = jnp.asarray(T1), jnp.asarray(T2)
    dfb = jnp.asarray(df)
    phis_a = None if phis is None else jnp.asarray(phis)
    dtype = jnp.result_type(flips.dtype, T1b.dtype, T2b.dtype,
                            dfb.dtype, *(() if phis_a is None
                                         else (phis_a.dtype,)))
    if phis_a is None:
        phis_a = jnp.asarray(dphi, dtype) * jnp.arange(nTR, dtype=dtype)
    phis = phis_a.astype(dtype)
    flips, T1b, T2b = (flips.astype(dtype), T1b.astype(dtype),
                       T2b.astype(dtype))
    dfb = dfb.astype(dtype)
    M0 = jnp.asarray(M0, dtype)
    trs = jnp.broadcast_to(jnp.asarray(tr, dtype), (nTR,))
    tes = trs / 2 if te is None else jnp.broadcast_to(
        jnp.asarray(te, dtype), (nTR,))

    batch = jnp.broadcast_shapes(flips.shape[:-1], phis.shape[:-1],
                                 T1b.shape, T2b.shape, dfb.shape,
                                 jnp.shape(M0))
    T1b, T2b = jnp.broadcast_to(T1b, batch), jnp.broadcast_to(T2b, batch)
    dfb, M0b = jnp.broadcast_to(dfb, batch), jnp.broadcast_to(M0, batch)
    if Minit is None:
        M = jnp.concatenate(
            [jnp.zeros(batch + (2,), dtype), M0b[..., None]], -1)
    else:
        M = jnp.broadcast_to(jnp.asarray(Minit, dtype), batch + (3,))
    flips_t = jnp.moveaxis(jnp.broadcast_to(flips, batch + (nTR,)),
                           -1, 0)
    phis_t = jnp.moveaxis(jnp.broadcast_to(phis, batch + (nTR,)), -1, 0)

    def step(M, x):
        a, phi, trn, ten = x
        u = jnp.stack([jnp.cos(phi), jnp.sin(phi),
                       jnp.zeros_like(phi)], -1)
        M = uphirot(u, -a, M)
        M = _relax_precess(M, ten, dfb, T1b, T2b, M0b)
        c, s = jnp.cos(phi), jnp.sin(phi)
        sig = jnp.stack([c * M[..., 0] + s * M[..., 1],
                         c * M[..., 1] - s * M[..., 0]], -1)
        M = _relax_precess(M, trn - ten, dfb, T1b, T2b, M0b)
        return M, sig

    _, sigs = jax.lax.scan(step, M, (flips_t, phis_t, trs, tes))
    return jnp.moveaxis(sigs, 0, -2)            # (*batch, nTR, 2)


def _rz(theta, dtype):
    r"""Right-handed z-rotation matrices, `(*batch, 3, 3)`."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2).astype(dtype)


def _rx(a, dtype):
    r"""Right-handed x-rotation matrices, `(*batch, 3, 3)`."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([o, z, z], -1),
                      jnp.stack([z, c, -s], -1),
                      jnp.stack([z, s, c], -1)], -2).astype(dtype)


def bssfp_steady(alpha, *, T1, T2, tr, df=0.0, te=None, dphi=pi,
                 M0=1.0):
    r"""Balanced-SSFP steady state — one batched 3×3 solve.

    With a constant flip ``α`` and the linear phase cycle
    ``φₙ = n·dphi``, the per-TR evolution in the demodulated frame is
    the affine map ``m → A·m + b`` with

        ``A = D(E2,E2,E1) · Rz(θ_tr − dphi) · Rx(−α)``,
        ``b = (1 − E1)·M0·ẑ``,   ``θ_tr = −2π·df·tr``

    (relaxation/precession diagonals commute with z-rotations, so the
    TE split does not enter ``A``). The steady state is the fixed point
    ``m* = (I − A)⁻¹ b`` — exact, differentiable, and ~10⁴× cheaper
    than iterating TRs to convergence (cf. the propagator-doubling
    check in ``examples/bssfp_banding.py``). The echo is read at TE
    with its own precession/decay, demodulated by the transmit phase.

    Inputs:
        - ``alpha``: `()` ⊻ `(*batch,)`, "Rad" (e.g. a B1-scaled map).
        - ``T1``/``T2``/``df``/``M0``: `()` ⊻ `(*batch,)` (broadcast).
        - ``tr``/``te``: scalars, "Sec"; ``te=None`` → ``tr/2``.
        - ``dphi``: phase-cycle increment, "Rad" (π = alternating ±x).
    Outputs:
        - ``signal``: `(*batch, 2)` real ([re, im] of the demodulated
          steady-state echo at TE).

    On resonance with ``dphi=π``, ``te=0`` this reduces to the textbook
    mid-band amplitude ``M0·sinα·(1−E1)/(1 − (E1−E2)cosα − E1·E2)``
    (pinned by a test); across ``df`` it traces the banding profile
    with nulls at ``df = ±1/(2·tr)``.
    """
    alpha = jnp.asarray(alpha)
    T1b, T2b = jnp.asarray(T1), jnp.asarray(T2)
    dfb = jnp.asarray(df)
    dtype = jnp.result_type(alpha.dtype, T1b.dtype, T2b.dtype,
                            dfb.dtype)
    alpha, dfb = alpha.astype(dtype), dfb.astype(dtype)
    T1b, T2b = T1b.astype(dtype), T2b.astype(dtype)
    M0 = jnp.asarray(M0, dtype)
    tr = jnp.asarray(tr, dtype)
    te = tr / 2 if te is None else jnp.asarray(te, dtype)
    batch = jnp.broadcast_shapes(alpha.shape, T1b.shape, T2b.shape,
                                 dfb.shape, jnp.shape(M0))
    alpha = jnp.broadcast_to(alpha, batch)
    T1b, T2b = jnp.broadcast_to(T1b, batch), jnp.broadcast_to(T2b, batch)
    dfb, M0b = jnp.broadcast_to(dfb, batch), jnp.broadcast_to(M0, batch)

    # expm1: the steady state divides the `(1 - E1)` recovery by the
    # similarly-small `I - A` — keep both ends of that quotient exact
    e1_1 = -jnp.expm1(-tr / T1b)
    E1, E2 = 1 - e1_1, jnp.exp(-tr / T2b)
    D = (jnp.stack([E2, E2, E1], -1)[..., :, None]
         * jnp.eye(3, dtype=dtype))

    def hp(x, y):                  # HIGHEST-precision 3×3 chain
        return jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)

    theta = -(2 * pi) * dfb * tr
    A = hp(D, hp(_rz(theta - dphi, dtype), _rx(-alpha, dtype)))
    b = jnp.concatenate([jnp.zeros(batch + (2,), dtype),
                         (e1_1 * M0b)[..., None]], -1)
    m = jnp.linalg.solve(jnp.eye(3, dtype=dtype) - A, b[..., None])

    # read out at TE: precess/decay te, demodulation already folded in
    M1 = hp(_rx(-alpha, dtype), m)[..., 0]
    M2 = _relax_precess(M1, te, dfb, T1b, T2b, M0b)
    return M2[..., :2]
