r"""Shinnar–Le Roux (SLR) pulse design — exact slice-selective RF.

The hard-pulse approximation maps an ``nT``-sample RF waveform to a pair
of degree-``nT`` polynomials ``(A(z), B(z))`` in the per-sample
precession phasor ``z = e^{iω}`` — the spin-domain (Cayley–Klein)
parameters of the net rotation (Pauly, Le Roux, Nishimura, Macovski,
IEEE TMI 10:53, 1991). The map is INVERTIBLE: choose ``B`` as a digital
filter approximating the desired profile (``|B(ω)| = sin(flip/2)`` in
band), complete it with the minimum-phase ``A`` satisfying
``|A|² = 1 − |B|²`` (minimum-energy RF), and run the inverse recursion
to recover the exact large-tip RF — no small-tip approximation.

This module implements the full stack in JAX with complex values
carried as ``(..., 2)`` real/imag pairs (complex dtypes are unsupported
on this TPU runtime; the one complex intermediate lives inside
``rfft``/``irfft``, the same boundary :mod:`mrphy_tpu.utils.girf`
uses). All recursions are ``lax.scan``s over static-shape coefficient
arrays — jittable and differentiable end-to-end.

Conventions (pinned by tests against the framework's own simulators,
not by external code): per-sample nutation about the transverse axis at
the RF phase, THEN gradient precession about z; magnetization maps
``m_xy = 2 conj(α) β`` (excitation from +z), ``m_z = 1 − 2|β|²``, and
crushed-spin-echo refocusing efficiency ``β²``.
``tests/test_slr.py`` closes the loop through
:func:`mrphy_tpu.ops.slowsims.blochsim`.

The reference framework has no SLR designer (its README's recipe starts
from hand-built waveforms); like :mod:`mrphy_tpu.design.sta`, this is
part of the production design stack built on the simulators.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi

__all__ = ['slr_design', 'rf2ab', 'ab2rf', 'b2a', 'dzls', 'dinf',
           'ab_profile', 'slr_gr']


def dinf(d1: float, d2: float) -> float:
    r"""Lee's empirical transition-width parameter ``D∞(δ1, δ2)``: a
    length-``n`` equiripple filter with passband/stopband ripples
    ``δ1``/``δ2`` needs fractional transition width ``w = D∞/n``
    (per normalized frequency unit of cycles/sample)."""
    import math
    l1, l2 = math.log10(d1), math.log10(d2)
    return ((5.309e-3 * l1 * l1 + 7.114e-2 * l1 - 4.761e-1) * l2
            + (-2.66e-3 * l1 * l1 - 5.941e-1 * l1 - 4.278e-1))


def dzls(n: int, tb: float, d1: float, d2: float,
         ftype: str = 'ls') -> jax.Array:
    r"""Linear-phase FIR prototype for the SLR beta.

    Designs a length-``n`` symmetric filter whose frequency response is
    ≈1 over the passband ``|f| < (1−w)·tb/(2n)`` and ≈0 over the
    stopband ``|f| > (1+w)·tb/(2n)`` (``f`` in cycles/sample,
    ``w = dinf(d1,d2)/tb``). ``ftype='ls'`` (default): weighted least
    squares on a dense grid — jittable/differentiable, ripples
    concentrate at the band edges (measured ≈3–9× the requested ``d``
    at matched ``tb``); ``ftype='pm'``: Parks–McClellan equiripple via
    ``scipy.signal.remez`` — host-side (design-time only, breaks under
    jit), ripples land on spec. Returns the `(n,)` coefficient array
    (peak response ≈ 1 at DC; scale by ``sin(flip/2)`` for a beta
    polynomial).
    """
    assert n >= 4 and tb > 0 and 0 < d1 < 1 and 0 < d2 < 1
    w = dinf(d1, d2) / tb
    fp, fs = (1 - w) * tb / (2 * n), (1 + w) * tb / (2 * n)
    assert fs <= 0.5, f'tb={tb} too large for n={n} at these ripples'
    if ftype == 'pm':
        from scipy import signal
        h = signal.remez(n, [0., fp, fs, 0.5], [1., 0.],
                         weight=[1. / d1, 1. / d2])
        return jnp.asarray(h, jnp.result_type(float))
    assert ftype == 'ls', f"ftype={ftype!r} not in ('ls', 'pm')"
    ngrid = max(16 * n, 512)
    f = (jnp.arange(ngrid) + 0.5) / (2 * ngrid)      # (0, 1/2) cycles
    om = 2 * pi * f
    D = jnp.where(f <= fp, 1.0, 0.0)
    # squared-error weighting needs the squared ripple ratio to steer
    # max ripples toward the requested d1:d2
    wt = jnp.where(f <= fp, 1.0,
                   jnp.where(f >= fs, (d1 / d2) ** 2, 0.0))
    # zero-phase amplitude of a symmetric filter: cosine basis
    if n % 2:                                        # type I
        k = jnp.arange((n - 1) // 2 + 1)
        basis = jnp.cos(om[:, None] * k[None, :])
        basis = basis.at[:, 1:].multiply(2.0)
    else:                                            # type II
        k = jnp.arange(n // 2) + 0.5
        basis = 2.0 * jnp.cos(om[:, None] * k[None, :])
    Bw = basis * wt[:, None]
    G = jnp.matmul(Bw.T, basis, precision='highest')
    rhs = jnp.matmul(Bw.T, (D * wt), precision='highest')
    c = jnp.linalg.solve(G + 1e-9 * jnp.eye(G.shape[0]), rhs)
    if n % 2:                                        # h[M±k] = c_k
        hr = jnp.concatenate([c[1:][::-1], c[:1], c[1:]])
    else:
        hr = jnp.concatenate([c[::-1], c])
    return hr


def _cmul(x, y):
    r"""Complex multiply of trailing-dim-2 real pairs."""
    xr, xi = x[..., 0], x[..., 1]
    yr, yi = y[..., 0], y[..., 1]
    return jnp.stack([xr * yr - xi * yi, xr * yi + xi * yr], -1)


def _as_pair(x):
    x = jnp.asarray(x)
    if x.ndim == 1 or x.shape[-1] != 2:
        x = jnp.stack([x, jnp.zeros_like(x)], -1)
    return x


def rf2ab(rf, *, dt=dt0, gam=gamH) -> Tuple[jax.Array, jax.Array]:
    r"""Forward SLR: hard-pulse recursion RF → Cayley–Klein polynomials.

    Inputs:
        - ``rf``: `(nT, 2)` (Re, Im) pairs ⊻ `(nT,)` real, "Gauss".
    Optionals:
        - ``dt``/``gam``: "Sec" / "Hz/Gauss".
    Outputs:
        - ``(a, b)``: `(nT, 2)` each — coefficients of ``A(z)``
          (degrees ``z⁰..z^{nT-1}``) and of ``B(z)/z`` (``B`` itself is
          divisible by ``z``: the trailing precession of each sample).

    Per sample ``j``: nutation by ``θ_j = γ·2π·dt·|rf_j|`` about the
    transverse axis at phase ``∠rf_j``, then precession ``z``.
    """
    rf = _as_pair(jnp.asarray(rf, jnp.result_type(float)))
    nT = rf.shape[0]
    mag = jnp.sqrt(rf[:, 0] ** 2 + rf[:, 1] ** 2)
    theta = (2 * pi) * gam * dt * mag
    C = jnp.cos(theta / 2)
    sn = jnp.sin(theta / 2)
    eps = jnp.finfo(rf.dtype).tiny
    er = rf[:, 0] / jnp.maximum(mag, eps)
    ei = rf[:, 1] / jnp.maximum(mag, eps)
    # rotation by −θ about (cos φ, sin φ, 0) — the Bloch convention
    # dM/dt = γ M × B (pinned by probing the simulator: +x field turns
    # +z → +y). SU(2): [[C, −S*], [S, C]] with S = +i e^{iφ} sin(θ/2).
    S = jnp.stack([-sn * ei, sn * er], -1)

    a0 = jnp.zeros((nT, 2), rf.dtype).at[0, 0].set(1.0)
    b0 = jnp.zeros((nT, 2), rf.dtype)

    def body(carry, cs):
        a, b = carry
        C_j, S_j = cs
        # stored b is B/z, so the true β_{j-1} = z·b: shift up once
        bz = jnp.roll(b, 1, axis=0).at[0].set(0.0)
        Sc = jnp.stack([S_j[0], -S_j[1]])
        an = C_j * a - _cmul(Sc, bz)
        bn = _cmul(S_j, a) + C_j * bz    # = β_j/z (one ×z cancels)
        return (an, bn), None

    (a, b), _ = jax.lax.scan(body, (a0, b0), (C, S))
    return a, b


def b2a(b, *, oversamp: int = 16) -> jax.Array:
    r"""Minimum-phase spectral completion: ``|A(ω)|² = 1 − |B(ω)|²``.

    The minimum-phase choice minimizes the RF energy of the inverse
    recursion (Pauly et al. 1991, §V). Computed by the real-cepstrum
    method on an ``oversamp·nT``-point grid: fold the cepstrum of
    ``log|A|``, exponentiate the resulting analytic spectrum. The
    spectrum is Hermitian throughout, so everything routes through
    ``rfft``/``irfft`` (real arrays at the boundaries).

    Inputs:
        - ``b``: `(nT,)` real ⊻ `(nT, 2)` beta coefficients with
          ``max|B(ω)| < 1``.
    Outputs:
        - ``a``: `(nT, 2)` minimum-phase alpha coefficients.
    """
    b = _as_pair(jnp.asarray(b, jnp.result_type(float)))
    nT = b.shape[0]
    N = oversamp * nT
    Br = jnp.fft.rfft(b[:, 0], n=N)
    Bi = jnp.fft.rfft(b[:, 1], n=N)
    # B(ω) = Σ (br + i·bi) e^{-iωk}: rfft gives Σ x e^{-iωk} per part
    mag2 = (jnp.real(Br) - jnp.imag(Bi)) ** 2 \
        + (jnp.imag(Br) + jnp.real(Bi)) ** 2
    eps = 10 * jnp.finfo(b.dtype).eps
    amag2 = jnp.clip(1.0 - mag2, eps, 1.0)
    logmag = 0.5 * jnp.log(amag2)                    # real, (N//2+1,)
    cep = jnp.fft.irfft(logmag, n=N)                 # real cepstrum
    fold = cep.at[1:(N + 1) // 2].multiply(2.0)
    fold = fold.at[(N + 1) // 2:].set(0.0)
    if N % 2 == 0:
        fold = fold.at[N // 2].set(cep[N // 2])
    Alog = jnp.fft.rfft(fold, n=N)                   # log A (analytic)
    A = jnp.exp(Alog)                                # Hermitian spectrum
    a_full = jnp.fft.irfft(A, n=N)                   # real coefficients
    a = a_full[:nT]
    return jnp.stack([a, jnp.zeros_like(a)], -1)


def ab2rf(a, b, *, dt=dt0, gam=gamH) -> jax.Array:
    r"""Inverse SLR recursion: Cayley–Klein polynomials → RF.

    Peels one sample per step: with ``B/z`` stored (see :func:`rf2ab`),
    the constant coefficients give the last rotation —
    ``ρ = (B/z)(0)/A(0) = −i e^{iφ} tan(θ/2)`` — and the inverse SU(2)
    downdate ``[A; B] ← [[C, S*], [−S, C]]·[A; B/z]`` recovers the
    previous polynomials. Exact inverse of :func:`rf2ab` (round-trip
    tested at 1e-9 f64).

    Inputs:
        - ``(a, b)``: `(nT, 2)` coefficient pairs (``b`` = ``B/z``).
    Outputs:
        - ``rf``: `(nT, 2)` (Re, Im), "Gauss".
    """
    a = _as_pair(jnp.asarray(a, jnp.result_type(float)))
    b = _as_pair(jnp.asarray(b, a.dtype))
    nT = a.shape[0]

    def body(carry, _):
        a_c, b_c = carry
        a0r, a0i = a_c[0, 0], a_c[0, 1]
        b0r, b0i = b_c[0, 0], b_c[0, 1]
        den = jnp.maximum(a0r * a0r + a0i * a0i,
                          jnp.finfo(a_c.dtype).tiny)
        rr = (b0r * a0r + b0i * a0i) / den           # ρ = b0/a0
        ri = (b0i * a0r - b0r * a0i) / den
        t = jnp.sqrt(rr * rr + ri * ri)              # tan(θ/2)
        theta = 2 * jnp.arctan(t)
        phi = jnp.arctan2(-rr, ri)                   # ∠(−iρ)
        C = jnp.cos(theta / 2)
        sn = jnp.sin(theta / 2)
        S = jnp.stack([-sn * jnp.sin(phi), sn * jnp.cos(phi)])
        Sc = jnp.stack([S[0], -S[1]])
        a_p = C * a_c + _cmul(Sc, b_c)
        b_p = -_cmul(S, a_c) + C * b_c
        # undo the sample's trailing z: B_{j-1}/z = shift down
        b_p = jnp.roll(b_p, -1, axis=0).at[-1].set(0.0)
        rfmag = theta / ((2 * pi) * gam * dt)
        rf_j = jnp.stack([rfmag * jnp.cos(phi), rfmag * jnp.sin(phi)])
        return (a_p, b_p), rf_j

    (_, _), rf_rev = jax.lax.scan(body, (a, b), None, length=nT)
    return rf_rev[::-1]


def ab_profile(a, b, omega) -> Tuple[jax.Array, jax.Array]:
    r"""Evaluate ``A``, ``B`` on a precession-angle grid.

    Inputs:
        - ``(a, b)``: `(nT, 2)` coefficients (``b`` = ``B/z`` as
          returned by :func:`rf2ab`; the omitted global ``z`` phase is
          restored here).
        - ``omega``: `(nF,)`, per-sample precession angle, rad
          (``ω = 2π·f·dt`` for off-resonance ``f`` Hz, ``= γ2π·dt·g·x``
          for position ``x`` under gradient ``g``).
    Outputs:
        - ``(A, B)``: `(nF, 2)` real-pair values of the polynomials at
          ``z = e^{−iω}`` (the Bloch convention precesses by −ω about
          +z for positive off-resonance; the polynomial variable
          absorbs the sign so callers pass physical ω).
    """
    a = _as_pair(a)
    b = _as_pair(b)
    k = jnp.arange(a.shape[0], dtype=a.dtype)
    ph = -omega[:, None] * k[None, :]
    ck, sk = jnp.cos(ph), jnp.sin(ph)                # e^{+iωk}
    mm = lambda x, y: jnp.matmul(x, y, precision='highest')  # noqa: E731
    Ar = mm(ck, a[:, 0]) - mm(sk, a[:, 1])
    Ai = mm(ck, a[:, 1]) + mm(sk, a[:, 0])
    Br = mm(ck, b[:, 0]) - mm(sk, b[:, 1])
    Bi = mm(ck, b[:, 1]) + mm(sk, b[:, 0])
    # restore B = z · (B/z), z = e^{−iω}
    co, si = jnp.cos(omega), jnp.sin(-omega)
    return (jnp.stack([Ar, Ai], -1),
            jnp.stack([Br * co - Bi * si, Br * si + Bi * co], -1))


_RIPPLES = {
    # (d1_beta(d1), d2_beta(d2), beta_scale(flip)) per pulse type:
    # how profile-domain ripples map to beta-filter ripples (Pauly et
    # al. 1991, table I) and how flip sets the in-band |B|.
    'st': (lambda d1: d1, lambda d2: d2),
    'ex': (lambda d1: (d1 / 2.) ** 0.5, lambda d2: d2 / 2. ** 0.5),
    'se': (lambda d1: d1 / 4., lambda d2: d2 ** 0.5),
    'inv': (lambda d1: d1 / 8., lambda d2: (d2 / 2.) ** 0.5),
    'sat': (lambda d1: d1 / 2., lambda d2: d2 ** 0.5),
}


@functools.partial(jax.jit,
                   static_argnames=('nT', 'tb', 'ptype', 'flip', 'd1',
                                    'd2', 'dt', 'gam', 'ftype'))
def _slr_design(nT, tb, ptype, flip, d1, d2, dt, gam, ftype):
    f1, f2 = _RIPPLES[ptype]
    h = dzls(nT, tb, f1(d1), f2(d2), ftype)
    import math
    b = jnp.asarray(math.sin(flip / 2), h.dtype) * h
    # keep max|B(ω)| ≤ 1: at flip=π the filter's passband ripple
    # overshoots 1, where the spectral factor |A|²=1−|B|² does not
    # exist and b2a's truncation error blows up (measured: inversion
    # Mz −0.83 → −0.99 with this rescale)
    Bmax = jnp.max(jnp.abs(jnp.fft.rfft(b, 16 * nT)))
    b = b * jnp.minimum(1.0, 1.0 / Bmax)
    a = b2a(b)
    return ab2rf(a, b, dt=dt, gam=gam), b


def slr_design(nT: int, tb: float, *, ptype: str = 'ex',
               flip: float = pi / 2, d1: float = 0.01, d2: float = 0.01,
               dt=dt0, gam=gamH,
               ftype: str = 'pm') -> Tuple[jax.Array, jax.Array]:
    r"""Design a slice-selective RF pulse by the SLR transform.

    Inputs:
        - ``nT``: number of RF samples.
        - ``tb``: time-bandwidth product (profile bandwidth =
          ``tb/(nT·dt)`` Hz; sharper transitions cost larger ``tb``).
    Optionals:
        - ``ptype``: ``'ex'`` (excitation), ``'se'`` (crushed spin-echo
          refocusing), ``'inv'`` (inversion), ``'sat'`` (saturation),
          ``'st'`` (small-tip) — sets the profile→beta ripple mapping.
        - ``flip``: nominal flip angle, rad (in-band ``|B| =
          sin(flip/2)``; use π for ``'inv'``/``'se'``).
        - ``d1``/``d2``: passband/stopband PROFILE ripples.
        - ``dt``/``gam``: "Sec" / "Hz/Gauss" — set the amplitude scale.
        - ``ftype``: beta-filter design method — ``'pm'`` (default,
          equiripple, on-spec ripples, host-side prototype) ⊻ ``'ls'``
          (least squares, fully jittable/differentiable, edge ripples
          a few × the spec); see :func:`dzls`.
    Outputs:
        - ``(rf, b)``: `(1, 2, nT)` RF ("Gauss", framework layout —
          feed straight to :class:`~mrphy_tpu.models.mobjs.Pulse`) and
          the `(nT,)` beta-filter coefficients (profile oracle for
          tests/plots).

    The beta is a linear-phase least-squares filter (:func:`dzls`); the
    alpha is minimum-phase (:func:`b2a`), giving the minimum-energy RF
    for that profile; the inverse recursion (:func:`ab2rf`) is exact at
    any flip angle. Refocus (rephase) excitation pulses with the usual
    ``−(nT/2 − tb-dependent center)`` gradient area, or design
    ``'se'``/``'inv'`` pulses whose ``β²``/``m_z`` profiles need no
    rephasing.
    """
    assert ptype in _RIPPLES, f'ptype={ptype!r} not in {list(_RIPPLES)}'
    rf, b = _slr_design(int(nT), float(tb), ptype, float(flip),
                        float(d1), float(d2), float(dt), float(gam),
                        ftype)
    return rf.T[None], b


def slr_gr(nT: int, tb: float, slthick: float, *, dt=dt0,
           gam=gamH) -> jax.Array:
    r"""Constant slice-select gradient matching an SLR design:
    `(1, xyz, nT)` "Gauss/cm" with ``g_z = tb/(nT·dt·γ·slthick)`` so the
    pulse bandwidth ``tb/(nT·dt)`` Hz spans ``slthick`` cm."""
    g = tb / (nT * dt * gam * slthick)
    gr = jnp.zeros((1, 3, nT))
    return gr.at[:, 2, :].set(g)
