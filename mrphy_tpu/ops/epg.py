r"""Extended Phase Graphs (EPG) — differentiable echo-train simulation.

The second canonical MR simulation formalism (beyond the isochromat
Bloch integration the rest of this package does): magnetization is
tracked in the Fourier domain of the dephasing angle as configuration
states ``F+(k), F−(k), Z(k)``, so sequences built from ideal hard pulses
+ unit gradient dephasing (spin-echo trains, TSE/FSE, MRF-style loops)
simulate in O(nPulses·K) instead of averaging many isochromats. EPG is
*exactly* the Fourier transform of a uniformly dephased isochromat
ensemble — asserted against the Bloch engines in ``tests/test_epg.py``.

TPU-shaped: the state is a REAL ``(..., 3, K, 2)`` array (trailing axis
= [re, im] — complex dtypes are unsupported on some TPU runtimes and
would halve lane utilization anyway); the k-order axis rides the vector
lanes, every operator is elementwise/roll, and echo trains run as one
``lax.scan``. Everything is differentiable (T1/T2/flip angles/B1
scale), enabling echo-train T2 fitting and refocusing-train design by
gradient descent.

Conventions follow the standard EPG literature (Weigel's tutorial /
Hargreaves' reference implementation): RF mixing matrix about phase
``phi``, gradient shift ``F+(k)→F+(k+1)``, ``F−(k)→F−(k−1)``,
``F+(0) = conj(F−(0))`` after the shift.
"""

import jax
import jax.numpy as jnp

from mrphy_tpu import pi

__all__ = ['epg_state', 'epg_rf', 'epg_grad', 'epg_relax',
           'epg_diffusion', 'epg_cpmg', 'epg_spgr', 'ir_prep',
           'rf_spoil_phases',
           'epgx_state', 'epgx_rf', 'epgx_relax', 'epgx_cpmg',
           'epgx_spgr', 'mt_lineshape', 'epgx_mt_relax', 'epgx_mt_rf',
           'epgx_mt_spgr']


def epg_state(K: int, batch=(), M0=1.0, dtype=jnp.float32):
    r"""Equilibrium EPG state: `(*batch, 3, K, 2)` real ([re, im]),
    ``Z(0) = M0``."""
    s = jnp.zeros(tuple(batch) + (3, K, 2), dtype)
    return s.at[..., 2, 0, 0].set(M0)


def _cmul(cr, ci, xr, xi):
    r"""Complex multiply of coefficient (cr, ci) with state (xr, xi)."""
    return cr * xr - ci * xi, cr * xi + ci * xr


def epg_rf(FpFmZ, alpha, phi=0.0):
    r"""Apply an ideal RF pulse: flip ``alpha`` (rad) about phase ``phi``
    (rad, from +x). ``alpha``/``phi`` broadcast against the batch axes
    (e.g. a per-voxel B1-scaled flip map)."""
    alpha = jnp.asarray(alpha)[..., None]       # broadcast over k
    phi = jnp.asarray(phi)[..., None]
    ca2 = jnp.cos(alpha / 2) ** 2
    sa2 = jnp.sin(alpha / 2) ** 2
    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    c1, s1 = jnp.cos(phi), jnp.sin(phi)
    c2, s2 = jnp.cos(2 * phi), jnp.sin(2 * phi)

    Fpr, Fpi = FpFmZ[..., 0, :, 0], FpFmZ[..., 0, :, 1]
    Fmr, Fmi = FpFmZ[..., 1, :, 0], FpFmZ[..., 1, :, 1]
    Zr, Zi = FpFmZ[..., 2, :, 0], FpFmZ[..., 2, :, 1]

    # row 1: ca2·Fp + sa2·e^{2iφ}·Fm + sa·(sinφ − i·cosφ)·Z
    ar, ai = _cmul(sa2 * c2, sa2 * s2, Fmr, Fmi)
    br, bi = _cmul(sa * s1, -sa * c1, Zr, Zi)
    Fp1r, Fp1i = ca2 * Fpr + ar + br, ca2 * Fpi + ai + bi
    # row 2: sa2·e^{−2iφ}·Fp + ca2·Fm + sa·(sinφ + i·cosφ)·Z
    ar, ai = _cmul(sa2 * c2, -sa2 * s2, Fpr, Fpi)
    br, bi = _cmul(sa * s1, sa * c1, Zr, Zi)
    Fm1r, Fm1i = ar + ca2 * Fmr + br, ai + ca2 * Fmi + bi
    # row 3: (sa/2)·(−sinφ − i·cosφ)·Fp + (sa/2)·(−sinφ + i·cosφ)·Fm + ca·Z
    ar, ai = _cmul(-0.5 * sa * s1, -0.5 * sa * c1, Fpr, Fpi)
    br, bi = _cmul(-0.5 * sa * s1, 0.5 * sa * c1, Fmr, Fmi)
    Z1r, Z1i = ar + br + ca * Zr, ai + bi + ca * Zi

    return jnp.stack([jnp.stack([Fp1r, Fp1i], -1),
                      jnp.stack([Fm1r, Fm1i], -1),
                      jnp.stack([Z1r, Z1i], -1)], axis=-3)


def _grad_pos1(FpFmZ):
    r"""Unit positive dephasing (+1 k-quantum)."""
    Fp, Fm, Z = FpFmZ[..., 0, :, :], FpFmZ[..., 1, :, :], \
        FpFmZ[..., 2, :, :]
    Fp1 = jnp.roll(Fp, 1, axis=-2)      # F+(0) fully overwritten below
    Fm1 = jnp.roll(Fm, -1, axis=-2).at[..., -1, :].set(0)
    Fp1 = Fp1.at[..., 0, 0].set(Fm1[..., 0, 0])
    Fp1 = Fp1.at[..., 0, 1].set(-Fm1[..., 0, 1])       # conj
    return jnp.stack([Fp1, Fm1, Z], axis=-3)


def _grad_neg1(FpFmZ):
    r"""Unit negative dephasing (−1 k-quantum): the exact mirror —
    ``F+`` shifts down, ``F−`` up, and the new ``F−(0)`` is
    ``conj(F+(0))``."""
    Fp, Fm, Z = FpFmZ[..., 0, :, :], FpFmZ[..., 1, :, :], \
        FpFmZ[..., 2, :, :]
    Fm1 = jnp.roll(Fm, 1, axis=-2)      # F−(0) fully overwritten below
    Fp1 = jnp.roll(Fp, -1, axis=-2).at[..., -1, :].set(0)
    Fm1 = Fm1.at[..., 0, 0].set(Fp1[..., 0, 0])
    Fm1 = Fm1.at[..., 0, 1].set(-Fp1[..., 0, 1])       # conj
    return jnp.stack([Fp1, Fm1, Z], axis=-3)


def epg_grad(FpFmZ, k: int = 1):
    r"""Gradient dephasing by ``k`` k-quanta (nonzero static int; ``k<0``
    rewinds). ``k=+1``: ``F+(k)→F+(k+1)``, ``F−(k)→F−(k−1)``, new
    ``F+(0) = conj(F−(0))`` (transverse states crossing zero change
    hemisphere); ``k=−1`` is the exact mirror. Larger |k| compose unit
    shifts (gradient-spoiled/SSFP sequences whose per-TR areas are
    integer multiples of the smallest area; choose the k-quantum as the
    gcd of the per-interval gradient areas — the standard EPG treatment
    of non-unit spoilers). States shifted beyond the highest modeled
    order ``K-1`` are dropped (size the state accordingly)."""
    k = int(k)
    assert k != 0, 'k must be a nonzero integer (use no-op for k=0)'
    op = _grad_pos1 if k > 0 else _grad_neg1
    for _ in range(abs(k)):
        FpFmZ = op(FpFmZ)
    return FpFmZ


def epg_relax(FpFmZ, tau, T1, T2, M0=1.0):
    r"""Relaxation over ``tau`` seconds: ``F·E2``, ``Z·E1``, with
    ``(1−E1)·M0`` recovery into ``Z(0)``. ``T1``/``T2``/``M0`` broadcast
    against the batch axes (per-voxel maps)."""
    E1 = jnp.exp(-jnp.asarray(tau) / jnp.asarray(T1))[..., None, None]
    E2 = jnp.exp(-jnp.asarray(tau) / jnp.asarray(T2))[..., None, None]
    Fp = FpFmZ[..., 0, :, :] * E2
    Fm = FpFmZ[..., 1, :, :] * E2
    Z = FpFmZ[..., 2, :, :] * E1
    Z = Z.at[..., 0, 0].add((1 - E1[..., 0, 0]) * M0)
    return jnp.stack([Fp, Fm, Z], axis=-3)


def epg_diffusion(FpFmZ, D, dk, tau, delta: int = 0):
    r"""Diffusion attenuation over an interval of ``tau`` seconds during
    which the applied gradient shifts the configuration orders by
    ``delta`` k-quanta (apply BEFORE the matching :func:`epg_grad`).

    A state of order ``k`` is a spatial modulation at wavenumber
    ``k·dk``; over the interval it sweeps linearly to ``(k+δ)·dk``, so
    its exact diffusion b-factor is the textbook quadratic integral

    .. math::
       b_T(k) = \tau\,dk^2\,(k^2 + k\delta + \delta^2/3), \qquad
       b_L(k) = \tau\,dk^2\,k^2

    (``F−(k)`` carries ``−k``: its b uses ``k^2 − kδ + δ²/3``), and the
    attenuation is ``exp(−b·D)`` — the standard EPG-diffusion treatment
    (Weigel's tutorial formalism), exact for piecewise-constant
    gradients. ``δ=0`` covers gradient-free intervals (stored states
    still diffuse: ``b = τ(k·dk)²``).

    Inputs:
        - ``FpFmZ``: `(*batch, 3, K, 2)` state.
        - ``D``: `()` ⊻ `(*batch,)`, "cm²/Sec", diffusivity (per-voxel
          ADC maps broadcast).
        - ``dk``: `()`, "Rad/cm", dephasing of ONE k-quantum (γ·G·τ_G of
          the unit spoiler).
        - ``tau``: `()`, "Sec"; ``delta``: static int k-quanta shifted
          during THIS interval.
    """
    K = FpFmZ.shape[-2]
    dtype = FpFmZ.dtype
    k = jnp.arange(K, dtype=dtype)
    q2t = jnp.asarray(tau, dtype) * jnp.asarray(dk, dtype) ** 2
    d = float(delta)
    bTp = q2t * (k * k + k * d + d * d / 3)
    bTm = q2t * (k * k - k * d + d * d / 3)
    bL = q2t * (k * k)
    Db = jnp.asarray(D, dtype)[..., None]
    att = jnp.stack([jnp.exp(-Db * bTp), jnp.exp(-Db * bTm),
                     jnp.exp(-Db * bL)], axis=-2)       # (*batch, 3, K)
    return FpFmZ * att[..., None]


def _scalar_batch(*xs) -> bool:
    r"""True iff every batch-like argument is a scalar (or None) — the
    XLA paths then return an UNBATCHED `(nT, 2)` train, while the
    fused kernels promote scalars to a 1-atom batch. The dispatchers
    squeeze that promoted axis so ``backend=`` never changes the
    output shape (pinned by ``tests/test_epg.py``)."""
    return all(x is None or jnp.ndim(x) == 0 for x in xs)


def _unbatch(out, scalar: bool):
    r"""Drop the kernel's promoted 1-atom axis for all-scalar calls."""
    return out[0] if scalar else out


def _apply_b1(flips, b1):
    r"""Per-voxel transmit scale: ``b1`` `(*batch,)` multiplies the
    flip train — the dictionary's B1+ dimension, uniform across every
    train family/backend (the Pallas kernels take it natively; the XLA
    paths fold it into batched flips)."""
    if b1 is None:
        return flips
    return jnp.asarray(b1)[..., None] * jnp.asarray(flips)


def epg_cpmg(flips, *, T1, T2, esp, M0=1.0, phi_ex=pi / 2,
             alpha_ex=pi / 2, b1=None, mesh=None, D=None, dk=0.0,
             backend: str = 'xla'):
    r"""Echo amplitudes of a CPMG spin-echo train.

    Sequence: ``alpha_ex`` excitation about ``phi_ex`` (defaults 90°
    about +y, so the refocusing pulses about +x satisfy the CPMG
    condition), then for each entry of ``flips``: [τ=esp/2
    relax+dephase, refocusing pulse, τ=esp/2 relax+dephase, echo].

    Inputs:
        - ``flips``: `(nEcho,)` or `(*batch, nEcho)`, "Rad", refocusing
          flip angles (B1-scaled trains broadcast per voxel).
        - ``alpha_ex``: `()` ⊻ `(*batch,)`, "Rad" — excitation flip.
          Batch it alongside per-voxel ``flips`` for slice-profile-
          resolved echo trains (each slice position sees its own
          excitation AND refocusing angles).
        - ``T1``/``T2``: `()` ⊻ `(*batch,)`, "Sec"; ``esp``: echo
          spacing, "Sec" — scalar, or a `(nEcho,)` per-echo train
          (round 4; variable echo spacing runs the XLA scan — the
          fused kernel precomputes per-atom half-interval factors).
        - ``D``/``dk``: enable diffusion weighting
          (:func:`epg_diffusion`): diffusivity `()` ⊻ `(*batch,)`,
          "cm²/Sec", and the per-half-esp crusher dephasing, "Rad/cm".
          For 180° refocusing in a constant gradient this reproduces
          the Carr–Purcell ``exp(−γ²G²D·esp³·n/12)`` attenuation
          exactly (asserted in ``tests/test_epg.py``).
    Outputs:
        - ``echoes``: `(*batch, nEcho, 2)` real ([re, im] of ``F+(0)``
          at each echo; for perfect 180° refocusing the magnitude is
          ``exp(-(n+1)·esp/T2)·M0`` exactly).

    Differentiable w.r.t. ``flips``/``T1``/``T2`` — echo-train T2
    fitting and refocusing-train design run by gradient descent. Pass
    ``mesh`` (a ``(batch, spins)`` :class:`jax.sharding.Mesh`) to shard
    a 1-D voxel batch across chips via shard_map (``flips``
    `(nV, nEcho)` and/or per-voxel ``T1``/``T2`` `(nV,)`; voxel-wise T2
    mapping is embarrassingly parallel).

    ``backend='pallas'``: the fused TPU kernel
    (:func:`mrphy_tpu.ops.epg_pallas.epg_cpmg_pallas`; measured 25×
    the XLA scan at 1M voxels × 32 echoes — B1-scaled trains go
    through its ``b1``). Mapping workload only (shared 1-D flips, 1-D
    voxel batch); since round 5 ``esp`` may be a `(nEcho,)` spacing
    train and ``D``/``dk`` spoiler diffusion runs IN-KERNEL (both
    with native grads — volume (T2, D) echo-train fitting);
    differentiable NATIVELY via the in-kernel CPMG adjoint (round 3
    — whole-brain MWF fitting at ~3.3 Mvox/s per gradient step; the
    recompute VJP remains the fallback when the kernel budgets don't
    fit).
    """
    if mesh is not None:        # composes with backend='pallas': each
        # device runs the fused kernel on its voxel shard
        from mrphy_tpu.parallel.mesh import epg_cpmg_sharded_traceable
        dkw = {} if D is None else {'D': D, 'dk': dk}
        return epg_cpmg_sharded_traceable(
            mesh, flips, T1=T1, T2=T2, esp=esp, M0=M0, phi_ex=phi_ex,
            alpha_ex=alpha_ex, b1=b1, backend=backend, **dkw)
    if backend == 'pallas':
        from mrphy_tpu.ops.epg_pallas import epg_cpmg_pallas
        from mrphy_tpu.ops._diffwrap import pallas_with_xla_vjp
        from mrphy_tpu.ops.routing import route
        r = route('epg_cpmg', backend='pallas', flips=flips, T1=T1,
                  T2=T2, esp=esp, M0=M0, phi_ex=phi_ex,
                  alpha_ex=alpha_ex, b1=b1, D=D)
        dkw = {} if D is None else {'D': D, 'dk': dk}
        sq = (jnp.ndim(flips) == 1
              and _scalar_batch(T1, T2, M0, alpha_ex, phi_ex, b1, D))
        if r['path'] == 'pallas-native-adjoint':
            # natively differentiable: the in-kernel hand-transposed
            # CPMG adjoint (round 3; round 5 adds `(nEcho,)` spacing
            # trains + in-kernel diffusion) — volume T2/MWF/ADC
            # fitting gradients at kernel speed (the recompute-
            # through-XLA reverse holds O(nE*nV*K) scan residuals and
            # OOMs at volume scale)
            return _unbatch(
                epg_cpmg_pallas(flips, T1=T1, T2=T2, esp=esp,
                                M0=M0, phi_ex=phi_ex,
                                alpha_ex=alpha_ex, b1=b1, **dkw), sq)
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            return epg_cpmg(flips, T1=T1, T2=T2, esp=esp, M0=M0,
                            phi_ex=phi_ex, alpha_ex=alpha_ex, b1=b1,
                            D=D, dk=dk, backend='xla')
        return _unbatch(pallas_with_xla_vjp(
            lambda fl, t1, t2, es, m0, pex, aex, b, d:
                epg_cpmg_pallas(fl, T1=t1, T2=t2, esp=es, M0=m0,
                                phi_ex=pex, alpha_ex=aex, b1=b,
                                D=d, dk=dk),
            lambda fl, t1, t2, es, m0, pex, aex, b, d:
                epg_cpmg(fl, T1=t1, T2=t2, esp=es, M0=m0, phi_ex=pex,
                         alpha_ex=aex, b1=b, D=d, dk=dk,
                         backend='xla'),
            flips, T1, T2, esp, M0, phi_ex, alpha_ex, b1, D) \
            if D is not None else pallas_with_xla_vjp(
            lambda fl, t1, t2, es, m0, pex, aex, b:
                epg_cpmg_pallas(fl, T1=t1, T2=t2, esp=es, M0=m0,
                                phi_ex=pex, alpha_ex=aex, b1=b),
            lambda fl, t1, t2, es, m0, pex, aex, b:
                epg_cpmg(fl, T1=t1, T2=t2, esp=es, M0=m0, phi_ex=pex,
                         alpha_ex=aex, b1=b, backend='xla'),
            flips, T1, T2, esp, M0, phi_ex, alpha_ex, b1), sq)
    assert backend == 'xla', backend
    flips = _apply_b1(jnp.asarray(flips), b1)
    return _epg_cpmg_body(flips, T1, T2, esp, M0, phi_ex, D, dk,
                          alpha_ex)


def _epg_cpmg_body(flips, T1, T2, esp, M0, phi_ex, D=None, dk=0.0,
                   alpha_ex=pi / 2):
    nE = flips.shape[-1]
    T1b, T2b = jnp.asarray(T1), jnp.asarray(T2)
    # one common dtype: python-float esp/M0 would otherwise promote the
    # scan carry to f64 under x64 while the state stays f32
    dtype = jnp.result_type(flips.dtype, T1b.dtype, T2b.dtype)
    flips = flips.astype(dtype)
    T1b, T2b = T1b.astype(dtype), T2b.astype(dtype)
    esp = jnp.asarray(esp, dtype)
    M0 = jnp.asarray(M0, dtype)
    alpha_b = jnp.asarray(alpha_ex, dtype)
    batch = jnp.broadcast_shapes(flips.shape[:-1], T1b.shape, T2b.shape,
                                 jnp.shape(M0), alpha_b.shape)
    K = nE + 1
    s = epg_state(K, batch, M0=M0, dtype=flips.dtype)
    s = epg_rf(s, jnp.broadcast_to(alpha_b, batch).astype(flips.dtype),
               phi_ex)
    flips_b = jnp.broadcast_to(flips, batch + (nE,))
    flips_t = jnp.moveaxis(flips_b, -1, 0)      # (nE, *batch)

    Db = None if D is None else jnp.asarray(D, dtype)
    varesp = esp.ndim == 1                 # per-echo spacing train

    def half(s, espn):
        s = epg_relax(s, espn / 2, T1b, T2b, M0)
        if Db is not None:
            s = epg_diffusion(s, Db, dk, espn / 2, delta=1)
        return epg_grad(s)

    def step(s, x):
        a = x[0]
        espn = x[1] if varesp else esp
        s = half(s, espn)
        s = epg_rf(s, a, 0.0)
        s = half(s, espn)
        return s, s[..., 0, 0, :]

    xs = (flips_t,) + ((esp,) if varesp else ())
    _, echoes = jax.lax.scan(step, s, xs)
    return jnp.moveaxis(echoes, 0, -2)          # (*batch, nE, 2)


def rf_spoil_phases(n: int, phi0=117.0):
    r"""Quadratic RF-spoiling phase schedule ``φ_j = φ0·j(j+1)/2`` (the
    classic 117°/50° schedules), "Rad"; ``phi0`` in degrees."""
    j = jnp.arange(n)
    return jnp.deg2rad(jnp.asarray(phi0)) * (j * (j + 1) / 2)


def ir_prep(ti, T1, M0=1.0, inv_eff=1.0):
    r"""Longitudinal magnetization ``TI`` seconds after an inversion:
    ``M0·(1 − (1 + inv_eff)·exp(−TI/T1))`` — the closed-form
    inversion-recovery prep for :func:`epg_spgr`'s ``zinit`` (the
    canonical MRF-FISP acquisition, Jiang et al. MRM 74:1621, 2015:
    adiabatic inversion + TI delay, then the variable-flip/TR train).
    ``inv_eff ∈ [0, 1]`` models imperfect (e.g. B1-limited) inversion;
    differentiable in every argument — TI/efficiency can be fitted or
    design variables."""
    ti = jnp.asarray(ti)
    return jnp.asarray(M0) * (1 - (1 + jnp.asarray(inv_eff))
                              * jnp.exp(-ti / jnp.asarray(T1)))


def epg_spgr(flips, phis=None, *, T1, T2, tr, te=0.0, M0=1.0,
             zinit=None, b1=None, kshift: int = 1, D=None, dk=0.0,
             K=None, mesh=None, backend: str = 'xla'):
    r"""Gradient-spoiled GRE (SPGR / FISP) signal train — the MRF-style
    dictionary workhorse.

    Per TR ``n``: RF pulse (flip ``flips[n]`` about phase ``phis[n]``),
    signal read at TE (``F+(0)`` demodulated by the transmit phase —
    receiver tracks the RF-spoiling schedule — with ``exp(-te/T2)``
    decay), relaxation over TR, then the unbalanced spoiler gradient
    shifts ``kshift`` k-quanta. With quadratic ``phis``
    (:func:`rf_spoil_phases`) this is RF-spoiled SPGR approaching the
    Ernst steady state; with ``phis=None`` (zero phases) it is FISP.
    Variable ``flips`` trains (MRF) broadcast per voxel like
    :func:`epg_cpmg`.

    Inputs:
        - ``flips``: `(nTR,)` or `(*batch, nTR)`, "Rad".
        - ``phis``: `(nTR,)` or `(*batch, nTR)`, "Rad" (None → 0).
        - ``T1``/``T2``: `()` ⊻ `(*batch,)`, "Sec".
        - ``tr``/``te``: `()` or `(nTR,)`, "Sec" — variable-TR/TE
          trains (the canonical MRF-FISP schedule, round 4).
        - ``zinit``: `()` ⊻ `(*batch,)` initial longitudinal
          magnetization (None → equilibrium ``M0``). Magnetization
          preparation: :func:`ir_prep` gives the inversion-recovery
          value, so the Jiang-2015 MRF-FISP acquisition is
          ``epg_spgr(flips, tr=trs, zinit=ir_prep(ti, T1))`` —
          differentiable through the prep.
        - ``D``/``dk``: diffusion weighting by the spoiler
          (:func:`epg_diffusion` with ``δ=kshift`` per TR) —
          diffusion-weighted SSFP; "cm²/Sec" and "Rad/cm" per k-quantum.
        - ``K``: modeled configuration orders (default: the exact
          ``nTR·|kshift| + 1``; RF-spoiled steady-state work is
          standard at K ≈ 32–64 — truncation error decays as
          ``E2^K``, pinned by a test).
        - ``mesh``: optional ``(batch, spins)``
          :class:`jax.sharding.Mesh` — voxel-sharded dispatch
          (:func:`mrphy_tpu.parallel.mesh.epg_spgr_sharded_traceable`);
          composes with ``backend='pallas'``. ``tr``/``te`` trains
          replicate (shared time axes).
    Outputs:
        - ``signals``: `(*batch, nTR, 2)` real ([re, im] of the
          demodulated echo).

    Differentiable w.r.t. ``flips``/``phis``/``T1``/``T2``/``tr``/``te``
    /``zinit`` — MRF dictionary generation and sequence optimization
    run by gradient descent. Validated against a uniformly dephased
    isochromat ensemble (``tests/test_epg.py``).

    ``backend='pallas'``: the fused TPU kernel
    (:func:`mrphy_tpu.ops.epg_pallas.epg_spgr_pallas` — the whole
    train's state lives in VMEM; measured 7.5× the XLA scan at MRF
    dictionary scale). Dictionary workload only: shared 1-D trains,
    1-D atom batch, in-kernel spoiler diffusion (constant OR
    variable-TR crusher schedules); differentiable NATIVELY — the
    in-kernel hand-transposed adjoint (round 3,
    ``epg_pallas._spgr_bwd_kernel``; round 4 adds the variable-TR/TE
    in-kernel factor chains) runs gradients at kernel speed when it
    fits, with the recompute-through-XLA VJP (``ops/_diffwrap.py``)
    as the fallback.
    """
    if mesh is not None:        # composes with backend='pallas': each
        # device runs the fused kernel on its voxel shard
        from mrphy_tpu.parallel.mesh import epg_spgr_sharded_traceable
        dkw = {} if D is None else {'D': D, 'dk': dk}
        return epg_spgr_sharded_traceable(
            mesh, flips, phis, T1=T1, T2=T2, tr=tr, te=te, M0=M0,
            zinit=zinit, b1=b1, kshift=kshift, K=K, backend=backend,
            **dkw)
    if backend == 'pallas':
        from mrphy_tpu.ops import epg_pallas
        from mrphy_tpu.ops._diffwrap import pallas_with_xla_vjp
        from mrphy_tpu.ops.routing import route
        r = route('epg_spgr', backend='pallas', flips=flips, T1=T1,
                  T2=T2, tr=tr, te=te, M0=M0, zinit=zinit, b1=b1,
                  D=D, kshift=kshift, K=K)
        sq = (jnp.ndim(flips) == 1
              and _scalar_batch(T1, T2, M0, zinit, b1, D))
        if r['path'] == 'pallas-native-adjoint':
            # natively differentiable: the hand-transposed fused
            # adjoint kernel (round 3) — gradients at kernel speed
            return _unbatch(epg_pallas.epg_spgr_pallas(
                flips, phis, T1=T1, T2=T2, tr=tr, te=te, M0=M0,
                zinit=zinit, b1=b1, D=D, dk=dk, kshift=kshift, K=K),
                sq)
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            # (per-voxel 2-D trains): the XLA scan carries it
            return epg_spgr(flips, phis, T1=T1, T2=T2, tr=tr, te=te,
                            M0=M0, zinit=zinit, b1=b1, kshift=kshift,
                            D=D, dk=dk, K=K, backend='xla')
        return _unbatch(pallas_with_xla_vjp(
            lambda fl, ph, t1, t2, trv, tev, m0, zi, b, d:
                epg_pallas.epg_spgr_pallas(
                    fl, ph, T1=t1, T2=t2, tr=trv, te=tev,
                    M0=m0, zinit=zi, b1=b, D=d, dk=dk, kshift=kshift,
                    K=K),
            lambda fl, ph, t1, t2, trv, tev, m0, zi, b, d:
                epg_spgr(fl, ph, T1=t1, T2=t2, tr=trv, te=tev, M0=m0,
                         zinit=zi, b1=b, D=d, dk=dk, kshift=kshift,
                         K=K, backend='xla'),
            flips, phis, T1, T2, tr, te, M0, zinit, b1, D), sq)
    assert backend == 'xla', backend
    flips = _apply_b1(jnp.asarray(flips), b1)
    nTR = flips.shape[-1]
    if phis is None:
        phis = jnp.zeros(nTR, flips.dtype)
    phis = jnp.asarray(phis)
    T1b, T2b = jnp.asarray(T1), jnp.asarray(T2)
    # one common dtype: python-float tr/te/M0 would otherwise promote
    # the scan carry to f64 under x64 while the state stays f32
    dtype = jnp.result_type(flips.dtype, phis.dtype, T1b.dtype,
                            T2b.dtype)
    flips, phis = flips.astype(dtype), phis.astype(dtype)
    T1b, T2b = T1b.astype(dtype), T2b.astype(dtype)
    trs = jnp.broadcast_to(jnp.asarray(tr, dtype), (nTR,))
    tes = jnp.broadcast_to(jnp.asarray(te, dtype), (nTR,))
    M0 = jnp.asarray(M0, dtype)
    z0 = M0 if zinit is None else jnp.asarray(zinit, dtype)
    batch = jnp.broadcast_shapes(flips.shape[:-1], phis.shape[:-1],
                                 T1b.shape, T2b.shape, jnp.shape(M0),
                                 jnp.shape(z0))
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    s = epg_state(K, batch, M0=jnp.broadcast_to(z0, batch),
                  dtype=dtype)
    flips_t = jnp.moveaxis(jnp.broadcast_to(flips, batch + (nTR,)),
                           -1, 0)
    phis_t = jnp.moveaxis(jnp.broadcast_to(phis, batch + (nTR,)), -1, 0)

    def step(s, x):
        a, phi, trn, ten = x
        s = epg_rf(s, a, phi)
        # demodulate by the transmit phase: s·e^{−iφ}, with TE decay
        fr, fi = s[..., 0, 0, 0], s[..., 0, 0, 1]
        c, si = jnp.cos(phi), jnp.sin(phi)
        sig = jnp.exp(-ten / T2b)[..., None] * jnp.stack(
            [c * fr + si * fi, c * fi - si * fr], -1)
        s = epg_relax(s, trn, T1b, T2b, M0)
        if D is not None:
            s = epg_diffusion(s, jnp.asarray(D, dtype), dk, trn,
                              delta=kshift)
        s = epg_grad(s, kshift)
        return s, sig

    _, sigs = jax.lax.scan(step, s, (flips_t, phis_t, trs, tes))
    return jnp.moveaxis(sigs, 0, -2)            # (*batch, nTR, 2)


# ------------------------------------------------------------------
# EPG-X: two-pool exchange (Bloch–McConnell) extended phase graphs
# ------------------------------------------------------------------
# Malik, Teixeira & Hajnal, "Extended phase graph formalism for systems
# with magnetization transfer and exchange", MRM 80(2):767, 2018 — the
# "full BM" variant: both pools carry F states; inter-pulse intervals
# apply the EXACT propagator of the coupled relaxation-exchange system
# per configuration order (closed-form 2x2 matrix exponentials; the
# pool-b chemical shift makes the transverse system complex, handled
# with a complex-eigenvalue expm in re/im-pair arithmetic — no complex
# dtypes, no per-interval splitting error). Cross-validated in
# tests/test_epg.py against a scipy-expm isochromat two-pool ensemble
# and against the single-pool EPG in the decoupled limit.


def _csqrt(x, y):
    r"""Principal sqrt of ``x + iy`` in re/im pairs — DIFFERENTIABLE on
    the real axis: the naive ``v = sqrt((r−x)/2)`` has an infinite
    sqrt-derivative at ``y = 0, x > 0`` (NaN gradients for real
    exchange systems); instead the smaller component comes from the
    exact identity ``u·v = y/2`` against the larger one."""
    r = jnp.hypot(x, y)
    big = x >= 0
    a = jnp.maximum(jnp.where(big, r + x, r - x) / 2, 0.0)
    pos = a > 0
    s = jnp.where(pos, jnp.sqrt(jnp.where(pos, a, 1.0)), 0.0)
    inv2s = jnp.where(pos, 0.5 / jnp.where(pos, s, 1.0), 0.0)
    sgn = jnp.where(y < 0, -1.0, 1.0)
    u = jnp.where(big, s, jnp.abs(y) * inv2s)
    v = jnp.where(big, y * inv2s, sgn * s)
    return u, v


def _expm2c(ar, ai, b, c, dr, di):
    r"""``expm([[a, b], [c, d]])`` with complex diagonal (``a``, ``d``)
    and real off-diagonals — re/im pairs throughout. Same trace/deviator
    identity as :func:`mrphy_tpu.ops.slowsims._expm2`:
    ``e^mu (cosh(q) I + sinh(q)/q (A - mu I))`` with complex
    ``mu = (a+d)/2``, ``q = sqrt(((a-d)/2)^2 + bc)``; the ``q -> 0``
    limit takes the Taylor ``sinh(q)/q = 1 + q^2/6``. Returns the four
    entries as (re, im) tuples."""
    mur, mui = (ar + dr) / 2, (ai + di) / 2
    hr, hi = (ar - dr) / 2, (ai - di) / 2
    q2r = hr * hr - hi * hi + b * c
    q2i = 2 * hr * hi
    qr, qi = _csqrt(q2r, q2i)
    # cosh/sinh of q = qr + i qi
    chr_, chi = jnp.cosh(qr) * jnp.cos(qi), jnp.sinh(qr) * jnp.sin(qi)
    shr, shi = jnp.sinh(qr) * jnp.cos(qi), jnp.cosh(qr) * jnp.sin(qi)
    # sinh(q)/q with the small-|q| Taylor branch (complex division)
    qn2 = qr * qr + qi * qi
    safe = qn2 > 1e-12
    qn2s = jnp.where(safe, qn2, 1.0)
    sqr = jnp.where(safe, (shr * qr + shi * qi) / qn2s, 1.0 + q2r / 6)
    sqi = jnp.where(safe, (shi * qr - shr * qi) / qn2s, q2i / 6)
    # e^mu
    em = jnp.exp(mur)
    emr, emi = em * jnp.cos(mui), em * jnp.sin(mui)

    def cm(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    # E = cosh(q) I + sinh(q)/q (A - mu I); then scale by e^mu
    e00 = cm(*cm(sqr, sqi, hr, hi), emr, emi)
    ch = cm(chr_, chi, emr, emi)
    E00 = (ch[0] + e00[0], ch[1] + e00[1])
    E11 = (ch[0] - e00[0], ch[1] - e00[1])
    sb = cm(sqr, sqi, emr, emi)
    E01 = (b * sb[0], b * sb[1])
    E10 = (c * sb[0], c * sb[1])
    return E00, E01, E10, E11


def _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba, M0a, M0b):
    r"""Exact affine recovery of the coupled longitudinal system over
    one interval: ``rec = A⁻¹(E − I)·b`` with ``A`` the (1/s) rate
    matrix and ``b = [M0a/T1a, M0b/T1b]`` the recovery source — the
    same closed form :func:`mrphy_tpu.ops.slowsims.blochsim_mc` uses.
    Equals ``(I − E)[M0a, M0b]`` ONLY under detailed balance
    (``kab·M0a == kba·M0b``); arbitrary rates drive the steady state
    away from equilibrium and the shortcut is silently wrong."""
    a00, a01 = -1 / T1a - kab, kba
    a10, a11 = kab, -1 / T1b - kba
    det = a00 * a11 - a01 * a10
    ba, bb = M0a / T1a, M0b / T1b
    e00, e01, e10, e11 = Z00 - 1.0, Z01, Z10, Z11 - 1.0
    ra = (a11 * (e00 * ba + e01 * bb)
          - a01 * (e10 * ba + e11 * bb)) / det
    rb = (-a10 * (e00 * ba + e01 * bb)
          + a00 * (e10 * ba + e11 * bb)) / det
    return ra, rb


def epgx_state(K: int, batch=(), M0a=1.0, M0b=0.1,
               dtype=jnp.float32):
    r"""Equilibrium two-pool EPG-X state: `(*batch, 2, 3, K, 2)` real
    (pool axis leads the single-pool `(3, K, [re, im])` layout), with
    ``Za(0) = M0a``, ``Zb(0) = M0b``."""
    M0a = jnp.broadcast_to(jnp.asarray(M0a, dtype), batch)
    M0b = jnp.broadcast_to(jnp.asarray(M0b, dtype), batch)
    s = jnp.zeros(tuple(batch) + (2, 3, K, 2), dtype)
    s = s.at[..., 0, 2, 0, 0].set(M0a)
    return s.at[..., 1, 2, 0, 0].set(M0b)


def epgx_rf(s, alpha, phi=0.0, b1b=1.0):
    r"""Ideal RF on both pools (flip ``alpha`` about ``phi``, rad).
    ``b1b`` scales pool b's flip (1.0 for water-water exchange; an MT
    bound pool would instead need a saturation treatment — not this
    operator). ``alpha``/``phi`` broadcast against `*batch`."""
    alpha = jnp.asarray(alpha)
    phi = jnp.broadcast_to(jnp.asarray(phi, alpha.dtype), alpha.shape)
    ab = jnp.stack([alpha, b1b * alpha], -1)    # (*batch, 2)
    pb = jnp.stack([phi, phi], -1)
    return epg_rf(s, ab, pb)


def epgx_relax(s, tau, *, T1a, T2a, T1b, T2b, kab, kba, M0a=1.0,
               M0b=0.1, dfb=0.0):
    r"""Exact relaxation-exchange(-shift) propagation of every
    configuration order over ``tau`` seconds.

    Transverse: ``d/dt [Fa, Fb] = [[-R2a-kab, kba],
    [kab, -R2b-kba - i 2π dfb]] [Fa, Fb]`` — one complex 2x2 expm
    (``F-`` states use its conjugate: they are ``conj(F̃(-k))``).
    Longitudinal: the real 2x2 expm plus exact affine recovery into
    ``Z(0)`` (``Z ← E_L Z + (I - E_L)[M0a, M0b]`` — equilibrium IS the
    steady state under detailed balance). All parameters broadcast
    against `*batch` (per-voxel maps).

    Parity note: :func:`mrphy_tpu.ops.slowsims.blochsim_mc` splits the
    pool-b shift into a per-step rotation (fine at µs dwell); here the
    intervals are ms-scale, so the shift lives INSIDE the exponential —
    exact for any ``tau``.
    """
    dtype = s.dtype
    par = [jnp.asarray(x, dtype) for x in
           (tau, T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb)]
    (tau, T1a, T2a, T1b, T2b, kab, kba, M0a, M0b, dfb) = (
        jnp.broadcast_to(x, s.shape[:-4]) for x in par)
    w = 2 * pi * dfb
    # transverse propagator (complex; F- uses the conjugate)
    E00, E01, E10, E11 = _expm2c(
        (-1 / T2a - kab) * tau, jnp.zeros_like(tau),
        kba * tau, kab * tau,
        (-1 / T2b - kba) * tau, -w * tau)

    def capply(E, xr, xi):
        return E[0] * xr - E[1] * xi, E[0] * xi + E[1] * xr

    def tprop(Far, Fai, Fbr, Fbi, conj):
        sg = -1.0 if conj else 1.0

        def cc(E):
            return (E[0][..., None], sg * E[1][..., None])

        ar, ai = capply(cc(E00), Far, Fai)
        br, bi = capply(cc(E01), Fbr, Fbi)
        cr, ci = capply(cc(E10), Far, Fai)
        dr, di = capply(cc(E11), Fbr, Fbi)
        return ar + br, ai + bi, cr + dr, ci + di

    Fa, Fb = s[..., 0, :, :, :], s[..., 1, :, :, :]  # (*b, 3, K, 2)
    Fpa_r, Fpa_i = Fa[..., 0, :, 0], Fa[..., 0, :, 1]
    Fpb_r, Fpb_i = Fb[..., 0, :, 0], Fb[..., 0, :, 1]
    Fma_r, Fma_i = Fa[..., 1, :, 0], Fa[..., 1, :, 1]
    Fmb_r, Fmb_i = Fb[..., 1, :, 0], Fb[..., 1, :, 1]
    pa_r, pa_i, pb_r, pb_i = tprop(Fpa_r, Fpa_i, Fpb_r, Fpb_i, False)
    ma_r, ma_i, mb_r, mb_i = tprop(Fma_r, Fma_i, Fmb_r, Fmb_i, True)

    # longitudinal: real expm + exact affine recovery into Z(0)
    from mrphy_tpu.ops.slowsims import _expm2
    Z00, Z01, Z10, Z11 = _expm2((-1 / T1a - kab) * tau, kba * tau,
                                kab * tau, (-1 / T1b - kba) * tau)
    Za, Zb = Fa[..., 2, :, :], Fb[..., 2, :, :]      # (*b, K, 2)
    Za1 = Z00[..., None, None] * Za + Z01[..., None, None] * Zb
    Zb1 = Z10[..., None, None] * Za + Z11[..., None, None] * Zb
    ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                         M0a, M0b)
    Za1 = Za1.at[..., 0, 0].add(ra)
    Zb1 = Zb1.at[..., 0, 0].add(rb)

    pool_a = jnp.stack([jnp.stack([pa_r, pa_i], -1),
                        jnp.stack([ma_r, ma_i], -1), Za1], axis=-3)
    pool_b = jnp.stack([jnp.stack([pb_r, pb_i], -1),
                        jnp.stack([mb_r, mb_i], -1), Zb1], axis=-3)
    return jnp.stack([pool_a, pool_b], axis=-4)


def epgx_cpmg(flips, *, T1a, T2a, T1b, T2b, kab, kba, esp, M0a=1.0,
              M0b=0.1, dfb=0.0, phi_ex=pi / 2, b1=None, mesh=None,
              backend: str = 'xla'):
    r"""CPMG echo train of a two-pool exchanging system (myelin-water /
    MT-coupled T2 relaxometry). Same sequence as :func:`epg_cpmg`;
    every half-interval is one exact :func:`epgx_relax`. The receiver
    sees the TOTAL transverse magnetization, so each echo is
    ``Fa+(0) + Fb+(0)``.

    Outputs: ``echoes`` `(*batch, nEcho, 2)`.

    Differentiable w.r.t. every tissue/exchange parameter — multi-pool
    T2 fitting (``examples``-grade) runs by gradient descent.

    ``backend='pallas'``: the fused TPU kernel
    (:func:`mrphy_tpu.ops.epg_pallas.epgx_cpmg_pallas`) for
    volume-scale MWF dictionaries/forwards (shared 1-D flips, 1-D
    voxel batch; since round 5 also `(nEcho,)` per-echo spacing
    trains); differentiable NATIVELY via the in-kernel two-pool
    adjoint (recompute-through-XLA VJP as the fallback when the
    kernel budgets don't fit).
    """
    if mesh is not None:        # composes with backend='pallas'
        from mrphy_tpu.parallel.mesh import (
            epgx_train_sharded_traceable)
        return epgx_train_sharded_traceable(
            mesh, 'cpmg', flips, T1a=T1a, T2a=T2a, T1b=T1b,
            T2b=T2b, kab=kab, kba=kba, esp=esp, M0a=M0a,
            M0b=M0b, dfb=dfb, phi_ex=phi_ex, b1=b1, backend=backend)
    if backend == 'pallas':
        from mrphy_tpu.ops.epg_pallas import epgx_cpmg_pallas
        from mrphy_tpu.ops._diffwrap import pallas_with_xla_vjp
        from mrphy_tpu.ops.routing import route
        r = route('epgx_cpmg', backend='pallas', flips=flips,
                  T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab,
                  kba=kba, esp=esp, M0a=M0a, M0b=M0b, dfb=dfb,
                  phi_ex=phi_ex, b1=b1)
        sq = (jnp.ndim(flips) == 1
              and _scalar_batch(T1a, T2a, T1b, T2b, kab, kba, M0a,
                                M0b, dfb, phi_ex, b1))
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            return epgx_cpmg(flips, T1a=T1a, T2a=T2a, T1b=T1b,
                             T2b=T2b, kab=kab, kba=kba, esp=esp,
                             M0a=M0a, M0b=M0b, dfb=dfb,
                             phi_ex=phi_ex, b1=b1, backend='xla')
        if r['path'] == 'pallas-native-adjoint':
            # natively differentiable: in-kernel two-pool CPMG
            # adjoint (round 3) — volume MWF fitting at kernel speed
            return _unbatch(epgx_cpmg_pallas(
                flips, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab,
                kba=kba, esp=esp, M0a=M0a, M0b=M0b, dfb=dfb,
                phi_ex=phi_ex, b1=b1), sq)
        return _unbatch(pallas_with_xla_vjp(
            lambda fl, *p: epgx_cpmg_pallas(
                fl, **dict(zip(('T1a', 'T2a', 'T1b', 'T2b', 'kab',
                                'kba', 'esp', 'M0a', 'M0b', 'dfb',
                                'phi_ex', 'b1'), p))),
            lambda fl, *p: epgx_cpmg(
                fl, backend='xla',
                **dict(zip(('T1a', 'T2a', 'T1b', 'T2b', 'kab', 'kba',
                            'esp', 'M0a', 'M0b', 'dfb', 'phi_ex',
                            'b1'), p))),
            flips, T1a, T2a, T1b, T2b, kab, kba, esp, M0a, M0b, dfb,
            phi_ex, b1), sq)
    assert backend == 'xla', backend
    flips = _apply_b1(jnp.asarray(flips), b1)
    nE = flips.shape[-1]
    dtype = jnp.result_type(flips.dtype, jnp.asarray(T2a).dtype)
    flips = flips.astype(dtype)
    kw = dict(T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab, kba=kba,
              M0a=M0a, M0b=M0b, dfb=dfb)
    batch = jnp.broadcast_shapes(
        flips.shape[:-1], *(jnp.shape(jnp.asarray(v)) for v in
                            kw.values() if v is not None))
    K = nE + 1
    s = epgx_state(K, batch, M0a=M0a, M0b=M0b, dtype=dtype)
    s = epgx_rf(s, pi / 2 * jnp.ones(batch, dtype), phi_ex)
    flips_t = jnp.moveaxis(jnp.broadcast_to(flips, batch + (nE,)),
                           -1, 0)
    esp = jnp.asarray(esp, dtype)
    varesp = esp.ndim == 1                 # per-echo spacing train

    def half(s, espn):
        s = epgx_relax(s, espn / 2, **kw)
        return epg_grad(s)                       # pool axis = batch

    def step(s, x):
        a = x[0]
        espn = x[1] if varesp else esp
        s = half(s, espn)
        s = epgx_rf(s, a, 0.0)
        s = half(s, espn)
        return s, s[..., 0, 0, :].sum(-2)        # Fa+(0) + Fb+(0)

    xs = (flips_t,) + ((esp,) if varesp else ())
    _, echoes = jax.lax.scan(step, s, xs)
    return jnp.moveaxis(echoes, 0, -2)


def epgx_spgr(flips, phis=None, *, T1a, T2a, T1b, T2b, kab, kba, tr,
              M0a=1.0, M0b=0.1, dfb=0.0, b1=None, kshift: int = 1,
              K=None, mesh=None, backend: str = 'xla'):
    r"""Gradient-spoiled GRE train of a two-pool exchanging system —
    EPG-X dictionaries for exchange-sensitive MRF. Per TR: RF on both
    pools, demodulated total ``F+(0)`` readout, exact
    exchange-relaxation over TR, spoiler shift. See :func:`epg_spgr`
    for the single-pool conventions. ``tr`` may be scalar or a
    `(nTR,)` variable train (round 4 — exchange-MRF-X with the
    canonical variable-TR schedule; exact per-step 2x2 expm
    propagators — fused under ``backend='pallas'`` since round 5).

    Outputs: ``signals`` `(*batch, nTR, 2)`.

    ``backend='pallas'``: the fused two-pool TPU kernel
    (:func:`mrphy_tpu.ops.epg_pallas.epgx_spgr_pallas`; measured 17×
    the XLA scan at 64k-atom dictionary scale). Dictionary workload
    only (shared 1-D trains, 1-D atom batch); differentiable NATIVELY
    via the in-kernel two-pool adjoint (round 3; recompute-VJP
    fallback).
    """
    if mesh is not None:        # composes with backend='pallas'
        from mrphy_tpu.parallel.mesh import (
            epgx_train_sharded_traceable)
        return epgx_train_sharded_traceable(
            mesh, 'spgr', flips, phis, T1a=T1a, T2a=T2a,
            T1b=T1b, T2b=T2b, kab=kab, kba=kba, tr=tr,
            M0a=M0a, M0b=M0b, dfb=dfb, b1=b1, kshift=kshift, K=K,
            backend=backend)
    if backend == 'pallas':
        from mrphy_tpu.ops.epg_pallas import epgx_spgr_pallas
        from mrphy_tpu.ops._diffwrap import pallas_with_xla_vjp
        from mrphy_tpu.ops.routing import route
        r = route('epgx_spgr', backend='pallas', flips=flips,
                  T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab,
                  kba=kba, tr=tr, M0a=M0a, M0b=M0b, dfb=dfb, b1=b1,
                  kshift=kshift, K=K)
        sq = (jnp.ndim(flips) == 1
              and _scalar_batch(T1a, T2a, T1b, T2b, kab, kba, M0a,
                                M0b, dfb, b1))
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            return epgx_spgr(flips, phis, T1a=T1a, T2a=T2a, T1b=T1b,
                             T2b=T2b, kab=kab, kba=kba, tr=tr,
                             M0a=M0a, M0b=M0b, dfb=dfb, b1=b1,
                             kshift=kshift, K=K, backend='xla')
        if r['path'] == 'pallas-native-adjoint':
            # natively differentiable: in-kernel two-pool adjoint
            # (round 3; round 5 adds `(nTR,)` variable-TR trains via
            # streamed per-step propagator planes)
            # — exchange-MRF fitting at kernel speed
            return _unbatch(epgx_spgr_pallas(
                flips, phis, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
                kab=kab, kba=kba, tr=tr, M0a=M0a, M0b=M0b, dfb=dfb,
                b1=b1, kshift=kshift, K=K), sq)
        names = ('T1a', 'T2a', 'T1b', 'T2b', 'kab', 'kba', 'tr',
                 'M0a', 'M0b', 'dfb', 'b1')
        return _unbatch(pallas_with_xla_vjp(
            lambda fl, ph, *p: epgx_spgr_pallas(
                fl, ph, kshift=kshift, K=K, **dict(zip(names, p))),
            lambda fl, ph, *p: epgx_spgr(
                fl, ph, backend='xla', kshift=kshift, K=K,
                **dict(zip(names, p))),
            flips, phis, T1a, T2a, T1b, T2b, kab, kba, tr, M0a, M0b,
            dfb, b1), sq)
    assert backend == 'xla', backend
    flips = _apply_b1(jnp.asarray(flips), b1)
    nTR = flips.shape[-1]
    if phis is None:
        phis = jnp.zeros(nTR, flips.dtype)
    phis = jnp.asarray(phis)
    dtype = jnp.result_type(flips.dtype, phis.dtype,
                            jnp.asarray(T2a).dtype)
    flips, phis = flips.astype(dtype), phis.astype(dtype)
    kw = dict(T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b, kab=kab, kba=kba,
              M0a=M0a, M0b=M0b, dfb=dfb)
    batch = jnp.broadcast_shapes(
        flips.shape[:-1], phis.shape[:-1],
        *(jnp.shape(jnp.asarray(v)) for v in kw.values()
          if v is not None))
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    s = epgx_state(K, batch, M0a=M0a, M0b=M0b, dtype=dtype)
    flips_t = jnp.moveaxis(jnp.broadcast_to(flips, batch + (nTR,)),
                           -1, 0)
    phis_t = jnp.moveaxis(jnp.broadcast_to(phis, batch + (nTR,)),
                          -1, 0)
    tr = jnp.asarray(tr, dtype)
    vartr = tr.ndim == 1                   # per-TR train (round 4)

    def step(s, x):
        a, phi = x[0], x[1]
        trn = x[2] if vartr else tr
        s = epgx_rf(s, a, phi)
        fr = s[..., 0, 0, 0].sum(-1)             # total F+(0)
        fi = s[..., 0, 0, 1].sum(-1)
        c, si = jnp.cos(phi), jnp.sin(phi)
        sig = jnp.stack([c * fr + si * fi, c * fi - si * fr], -1)
        s = epgx_relax(s, trn, **kw)
        s = epg_grad(s, kshift)
        return s, sig

    xs = (flips_t, phis_t) + ((tr,) if vartr else ())
    _, sigs = jax.lax.scan(step, s, xs)
    return jnp.moveaxis(sigs, 0, -2)


# ------------------------------------------------------------------
# EPG-X(MT): bound-pool variant (no transverse b states, RF saturation)
# ------------------------------------------------------------------
# The macromolecular pool of magnetization transfer has T2b ~ 10 us:
# its transverse magnetization is gone between any two events, so it
# carries ONLY Z states, and RF acts on it as pure saturation of Zb at
# the rate W = pi * omega1_rms^2 * G(delta) (absorption lineshape G) —
# Malik et al. MRM 80(2):767, 2018, the "EPG-X(MT)" case; Henkelman /
# Morrison & Henkelman for the lineshapes.


def mt_lineshape(delta, T2b, kind: str = 'superlorentzian', nq: int = 256):
    r"""Macromolecular absorption lineshape ``G(Δ)`` ("Sec", i.e. the
    value that makes ``W = π·ω1²·G`` a rate for ω1 in rad/s).

    Inputs:
        - ``delta``: `(...)`, "Hz", saturation offset from the bound
          pool's center.
        - ``T2b``: `()`, "Sec" (~10–12 µs for white matter).
        - ``kind``: ``'superlorentzian'`` (tissue standard; fixed
          ``nq``-node quadrature over fiber angles — the Δ→0
          divergence is the physical one, evaluate at |Δ| ≳ 1 kHz) ⊻
          ``'gaussian'`` ⊻ ``'lorentzian'``.
    """
    delta = jnp.asarray(delta, jnp.result_type(float))
    delta, T2b = jnp.broadcast_arrays(
        delta, jnp.asarray(T2b, delta.dtype))    # per-voxel T2b maps
    if kind == 'lorentzian':
        return (T2b / pi) / (1 + (2 * pi * delta * T2b) ** 2)
    if kind == 'gaussian':
        return T2b / jnp.sqrt(2 * pi) * jnp.exp(
            -(2 * pi * delta * T2b) ** 2 / 2)
    assert kind == 'superlorentzian', kind
    # G(Δ) = ∫_0^1 du  sqrt(2/π) · T2b/|3u²−1| · exp(−2(2πΔT2b/(3u²−1))²)
    u = (jnp.arange(nq, dtype=delta.dtype) + 0.5) / nq
    du = 1.0 / nq
    denom = jnp.abs(3 * u ** 2 - 1)
    denom = jnp.maximum(denom, 1e-8)
    arg = (2 * pi * (delta * T2b)[..., None] / denom) ** 2
    integ = jnp.sqrt(2 / pi) * (T2b[..., None] / denom) \
        * jnp.exp(-2 * arg)
    return (integ * du).sum(-1)


def epgx_mt_relax(s, tau, *, T1a, T2a, T1b, kab, kba, M0a=1.0,
                  M0b=0.1):
    r"""EPG-X(MT) interval: pool a relaxes transversally with ``T2a``
    (the bound pool has no F states — its row/column drops out of the
    transverse system), and the longitudinal pair exchanges exactly as
    in :func:`epgx_relax`. State layout: `(*batch, 2, 3, K, 2)` with
    pool b's F rows kept at zero."""
    dtype = s.dtype
    par = [jnp.asarray(x, dtype) for x in
           (tau, T1a, T2a, T1b, kab, kba, M0a, M0b)]
    (tau, T1a, T2a, T1b, kab, kba, M0a, M0b) = (
        jnp.broadcast_to(x, s.shape[:-4]) for x in par)
    E2 = jnp.exp(-tau / T2a)[..., None, None, None]
    Fa = s[..., 0, :2, :, :] * E2                    # (..., 2, K, 2)
    from mrphy_tpu.ops.slowsims import _expm2
    Z00, Z01, Z10, Z11 = _expm2((-1 / T1a - kab) * tau, kba * tau,
                                kab * tau, (-1 / T1b - kba) * tau)
    Za, Zb = s[..., 0, 2, :, :], s[..., 1, 2, :, :]  # (..., K, 2)
    Za1 = Z00[..., None, None] * Za + Z01[..., None, None] * Zb
    Zb1 = Z10[..., None, None] * Za + Z11[..., None, None] * Zb
    ra, rb = _z_recovery(Z00, Z01, Z10, Z11, T1a, T1b, kab, kba,
                         M0a, M0b)
    Za1 = Za1.at[..., 0, 0].add(ra)
    Zb1 = Zb1.at[..., 0, 0].add(rb)
    pool_a = jnp.concatenate([Fa, Za1[..., None, :, :]], axis=-3)
    pool_b = jnp.concatenate([jnp.zeros_like(Fa),
                              Zb1[..., None, :, :]], axis=-3)
    return jnp.stack([pool_a, pool_b], axis=-4)


def epgx_mt_rf(s, alpha, phi=0.0, wt=0.0):
    r"""EPG-X(MT) RF event: rotate pool a by ``alpha`` about ``phi``;
    saturate the bound pool's Z states by ``exp(−wt)`` where
    ``wt = W·τ_rf = π ∫ω₁²(t)dt · G(Δ)`` (dimensionless saturation
    integral of THIS pulse — :func:`mt_lineshape` supplies ``G``).
    Broadcasts against `*batch`."""
    a = epg_rf(s[..., 0, :, :, :], jnp.asarray(alpha), phi)
    wt = jnp.asarray(wt, s.dtype)[..., None, None]
    b = s[..., 1, :, :, :]
    Zb = b[..., 2, :, :] * jnp.exp(-wt)
    b = jnp.concatenate([b[..., :2, :, :] * 0.0,
                         Zb[..., None, :, :]], axis=-3)
    return jnp.stack([a, b], axis=-4)


def epgx_mt_spgr(flips, phis=None, *, T1a, T2a, T1b, kab, kba, tr,
                 wt=0.0, M0a=1.0, M0b=0.1, b1=None, kshift: int = 1,
                 K=None, mesh=None, backend: str = 'xla'):
    r"""MT-weighted gradient-spoiled GRE train (the qMT-SPGR
    workhorse): per TR an on-resonance excitation of the free pool
    (flip ``flips[n]`` about ``phis[n]``) plus bound-pool saturation
    ``wt[n]`` (from the saturation pulse's power integral and
    :func:`mt_lineshape`), demodulated ``F+(0)`` readout, exact
    exchange-relaxation over TR, spoiler shift.

    Inputs: as :func:`epg_spgr` plus ``T1b``/``kab``/``kba``/``M0b``
    and ``wt`` `()` ⊻ `(nTR,)` ⊻ `(*batch, nTR)`.
        - ``K``: modeled configuration orders (default: the exact
          ``nTR·|kshift| + 1``; RF-spoiled steady-state work is
          standard at K ≈ 32–64 — truncation error decays as
          ``E2^K``, pinned by a test).
    Outputs: ``signals`` `(*batch, nTR, 2)`.

    Differentiable w.r.t. everything (qMT parameter fitting by
    gradient descent); validated against the analytic coupled
    steady state in ``tests/test_epgx.py``.

    ``backend='pallas'``: the fused TPU kernel
    (:func:`mrphy_tpu.ops.epg_pallas.epgx_mt_spgr_pallas`; measured
    31× the XLA scan at 64k-atom qMT-dictionary scale — per-atom
    saturation scaling goes through its ``wscale``). Dictionary
    workload only; differentiable NATIVELY via the in-kernel MT
    adjoint (round 3; recompute-VJP fallback).
    """
    if mesh is not None:        # composes with backend='pallas'
        from mrphy_tpu.parallel.mesh import (
            epgx_train_sharded_traceable)
        return epgx_train_sharded_traceable(
            mesh, 'mt_spgr', flips, phis, T1a=T1a, T2a=T2a,
            T1b=T1b, kab=kab, kba=kba, tr=tr, wt=wt, M0a=M0a,
            M0b=M0b, b1=b1, kshift=kshift, K=K, backend=backend)
    if backend == 'pallas':
        from mrphy_tpu.ops.epg_pallas import epgx_mt_spgr_pallas
        from mrphy_tpu.ops._diffwrap import pallas_with_xla_vjp
        from mrphy_tpu.ops.routing import route
        r = route('epgx_mt_spgr', backend='pallas', flips=flips,
                  T1a=T1a, T2a=T2a, T1b=T1b, kab=kab, kba=kba,
                  tr=tr, wt=wt, M0a=M0a, M0b=M0b, b1=b1,
                  kshift=kshift, K=K)
        sq = (jnp.ndim(flips) == 1
              and _scalar_batch(T1a, T2a, T1b, kab, kba, M0a, M0b,
                                b1))
        if r['path'] == 'xla-fallback':   # outside the kernel scope
            # (per-voxel flips or batched wt): the XLA scan carries it
            return epgx_mt_spgr(flips, phis, T1a=T1a, T2a=T2a,
                                T1b=T1b, kab=kab, kba=kba, tr=tr,
                                wt=wt, M0a=M0a, M0b=M0b, b1=b1,
                                kshift=kshift, K=K, backend='xla')
        if r['path'] == 'pallas-native-adjoint':
            # natively differentiable: in-kernel MT adjoint (round 3;
            # round 5 adds `(nTR,)` variable-TR trains) — volume qMT
            # fitting at kernel speed
            return _unbatch(epgx_mt_spgr_pallas(
                flips, phis, T1a=T1a, T2a=T2a, T1b=T1b, kab=kab,
                kba=kba, tr=tr, wt=wt, M0a=M0a, M0b=M0b, b1=b1,
                kshift=kshift, K=K), sq)
        names = ('T1a', 'T2a', 'T1b', 'kab', 'kba', 'tr', 'wt',
                 'M0a', 'M0b', 'b1')
        return _unbatch(pallas_with_xla_vjp(
            lambda fl, ph, *p: epgx_mt_spgr_pallas(
                fl, ph, kshift=kshift, K=K, **dict(zip(names, p))),
            lambda fl, ph, *p: epgx_mt_spgr(
                fl, ph, backend='xla', kshift=kshift, K=K,
                **dict(zip(names, p))),
            flips, phis, T1a, T2a, T1b, kab, kba, tr, wt, M0a, M0b,
            b1), sq)
    assert backend == 'xla', backend
    flips = _apply_b1(jnp.asarray(flips), b1)
    nTR = flips.shape[-1]
    if phis is None:
        phis = jnp.zeros(nTR, flips.dtype)
    phis = jnp.asarray(phis)
    dtype = jnp.result_type(flips.dtype, phis.dtype,
                            jnp.asarray(T2a).dtype)
    flips, phis = flips.astype(dtype), phis.astype(dtype)
    kw = dict(T1a=T1a, T2a=T2a, T1b=T1b, kab=kab, kba=kba, M0a=M0a,
              M0b=M0b)
    wt = jnp.asarray(wt, dtype)
    wt_b = jnp.broadcast_to(wt, jnp.broadcast_shapes(
        wt.shape, (nTR,)))
    batch = jnp.broadcast_shapes(
        flips.shape[:-1], phis.shape[:-1], wt_b.shape[:-1],
        *(jnp.shape(jnp.asarray(v)) for v in kw.values()))
    K = nTR * abs(int(kshift)) + 1 if K is None else int(K)
    s = epgx_state(K, batch, M0a=M0a, M0b=M0b, dtype=dtype)
    flips_t = jnp.moveaxis(jnp.broadcast_to(flips, batch + (nTR,)),
                           -1, 0)
    phis_t = jnp.moveaxis(jnp.broadcast_to(phis, batch + (nTR,)),
                          -1, 0)
    wt_t = jnp.moveaxis(jnp.broadcast_to(wt_b, batch + (nTR,)), -1, 0)
    tr = jnp.asarray(tr, dtype)
    vartr = tr.ndim == 1                   # per-TR train (round 4)

    def step(s, x):
        a, phi, w = x[0], x[1], x[2]
        trn = x[3] if vartr else tr
        s = epgx_mt_rf(s, a, phi, w)
        fr, fi = s[..., 0, 0, 0, 0], s[..., 0, 0, 0, 1]
        c, si = jnp.cos(phi), jnp.sin(phi)
        sig = jnp.stack([c * fr + si * fi, c * fi - si * fr], -1)
        s = epgx_mt_relax(s, trn, **kw)
        s = epg_grad(s, kshift)
        return s, sig

    xs = (flips_t, phis_t, wt_t) + ((tr,) if vartr else ())
    _, sigs = jax.lax.scan(step, s, xs)
    return jnp.moveaxis(sigs, 0, -2)
