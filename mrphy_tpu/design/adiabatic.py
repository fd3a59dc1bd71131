r"""Adiabatic RF pulses — B1-insensitive inversion/refocusing.

Amplitude/frequency-modulated pulses whose effective field sweeps
slowly (adiabatically) from +z to −z in the frequency-modulated frame:
magnetization locks to it and inverts for ANY RF amplitude above the
adiabatic threshold — the standard answer to transmit-B1 inhomogeneity,
complementary to the profile-exact designs
(:mod:`mrphy_tpu.design.slr`) which scale linearly with B1 error.

Implemented: the hyperbolic-secant (Silver–Hoult) pulse, the workhorse
adiabatic full-passage. Frequency modulation is returned baked into the
RF phase (the simulators take phase-modulated ``(x, y)`` drive
directly), so the output plugs into :class:`~mrphy_tpu.models.mobjs.
Pulse`/the Bloch engines like any other waveform.

The adiabatic behavior is validated in ``tests/test_adiabatic.py`` by
simulation: inversion holds across a 2.5× B1 range and the sweep
bandwidth, and collapses below threshold — the defining signature.

The reference framework ships no pulse designers (its README recipe
starts from hand-built waveforms); like :mod:`~mrphy_tpu.design.sta`
and :mod:`~mrphy_tpu.design.slr` this extends the design stack.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi

__all__ = ['adiabatic_hypsec', 'adiabatic_bir4', 'adiabatic_wurst',
           'hypsec_bw', 'hypsec_threshold']


def hypsec_bw(beta: float, mu: float, dur: float) -> float:
    r"""Inversion bandwidth of :func:`adiabatic_hypsec`, "Hz": the
    frequency sweep spans ``±μβ/(2π)·(2/dur)``, so BW = ``2μβ/(π·dur)``
    with ``β`` in the unit-time parametrization below."""
    return mu * beta / pi * 2 / dur


def hypsec_threshold(beta: float, mu: float, dur: float,
                     gam: float = gamH) -> float:
    r"""Adiabatic threshold amplitude, "Gauss":
    ``γ2π·B1 = √μ·β·(2/dur)`` — inversion requires ``b1max`` a safety
    factor (≥~1.5×) above."""
    return (mu ** 0.5) * beta * (2 / dur) / (2 * pi * gam)


def adiabatic_hypsec(nT: int, *, beta: float = 5.3, mu: float = 4.9,
                     b1max: float = 0.15, dt=dt0,
                     gam=gamH) -> Tuple[jax.Array, float]:
    r"""Hyperbolic-secant adiabatic full-passage (Silver–Hoult).

    Amplitude ``B1(τ) = b1max·sech(βτ)`` and frequency sweep
    ``Δω(τ) = −μβ·tanh(βτ)·(2/dur)`` over ``τ ∈ [−1, 1]``, returned as
    phase-modulated RF (``φ = −μ·ln cosh(βτ)``, the exact integral of
    the sweep).

    Inputs:
        - ``nT``: number of samples.
    Optionals:
        - ``beta``: sweep truncation (``sech(β) ≈ 1e-2`` at 5.3).
        - ``mu``: adiabaticity; bandwidth and threshold both grow with
          it (:func:`hypsec_bw`, :func:`hypsec_threshold`).
        - ``b1max``: peak RF, "Gauss" — inversion is B1-INSENSITIVE for
          any amplitude ≳1.5× :func:`hypsec_threshold`.
        - ``dt``/``gam``: "Sec" / "Hz/Gauss".
    Outputs:
        - ``(rf, bw)``: `(1, 2, nT)` RF ("Gauss") and the inversion
          bandwidth ("Hz").
    """
    dur = nT * float(dt)
    tau = (2 * jnp.arange(nT) - nT + 1) / (nT - 1)   # [-1, 1]
    amp = b1max / jnp.cosh(beta * tau)
    phase = -mu * jnp.log(jnp.cosh(beta * tau))
    rf = jnp.stack([amp * jnp.cos(phase), amp * jnp.sin(phase)])[None]
    return rf, hypsec_bw(beta, mu, dur)


def adiabatic_wurst(nT: int, *, n: float = 20., bw: float = 4e3,
                    b1max: float = 0.15, dt=dt0,
                    gam=gamH) -> Tuple[jax.Array, float]:
    r"""WURST adiabatic inversion (wideband, uniform rate, smooth
    truncation — Kupče & Freeman): amplitude ``B1(τ) = b1max·(1 −
    |sin(πτ/2)|ⁿ)`` with a LINEAR frequency sweep over ``±bw/2``.

    The linear sweep makes the bandwidth an explicit parameter (vs the
    hypsec's μβ coupling) — the standard choice for broadband
    inversion/decoupling where the band edge must land exactly.

    Inputs:
        - ``nT``: number of samples.
    Optionals:
        - ``n``: truncation power (higher = flatter amplitude, sharper
          smooth edges; the classic "WURST-20" is ``n=20``).
        - ``bw``: full sweep width, "Hz" ≈ inversion bandwidth.
        - ``b1max``: peak RF, "Gauss"; adiabaticity at center is
          ``Q = (γ2π·b1max)²/(2π·bw/dur)`` — keep ≳ 3.
        - ``dt``/``gam``: "Sec" / "Hz/Gauss".
    Outputs:
        - ``(rf, Q)``: `(1, 2, nT)` RF ("Gauss") and the center-sweep
          adiabaticity factor (dimensionless).

    Phase is the exact integral of the linear sweep:
    ``φ(τ) = π·bw·dur·(τ²−τ)`` with ``τ ∈ [0, 1]`` (sweep
    ``f = bw·(τ − ½)``).
    """
    dur = nT * float(dt)
    tau = (jnp.arange(nT) + 0.5) / nT                 # (0, 1)
    amp = b1max * (1 - jnp.abs(jnp.sin(pi * (tau - 0.5))) ** n)
    phase = pi * bw * dur * (tau * tau - tau)
    rf = jnp.stack([amp * jnp.cos(phase), amp * jnp.sin(phase)])[None]
    Q = float((2 * pi * gam * b1max) ** 2 / (2 * pi * bw / dur))
    return rf, Q


def adiabatic_bir4(nT: int, theta: float, *, beta: float = 10.,
                   kappa: float = 1.5208, fmax: float = 1e4,
                   b1max: float = 0.15, dt=dt0,
                   gam=gamH) -> jax.Array:
    r"""BIR-4 (B1-insensitive rotation): adiabatic PLANE ROTATION by an
    ARBITRARY flip angle ``theta`` — where :func:`adiabatic_hypsec` only
    inverts, BIR-4 rotates by any angle regardless of RF amplitude
    (above threshold), the adiabatic answer for B1-robust excitation /
    saturation at chosen flips (Staewen et al. 1990, tanh/tan
    modulation).

    Four tanh-amplitude / tan-frequency quarter-segments; the flip is
    set purely by phase jumps ``±(π + θ/2)`` at the ¼ and ¾ boundaries.
    The frequency sweep is integrated ANALYTICALLY into the RF phase
    (``∫tan(κu)du = −ln cos(κu)/κ``), so the returned waveform is exact
    at any sampling.

    Inputs:
        - ``nT``: number of samples (multiple of 4 recommended).
        - ``theta``: rotation angle, rad (any value; 0 gives identity —
          the standard B1/B0-robustness self-test).
    Optionals:
        - ``beta``: tanh amplitude-ramp rate.
        - ``kappa``: tan frequency-sweep shape, rad (< π/2;
          default ``atan(20)``).
        - ``fmax``: peak frequency-sweep excursion, "Hz".
        - ``b1max``: peak RF, "Gauss" — rotation is B1-insensitive for
          amplitudes above the adiabatic threshold (validated ≳0.08 G
          at the defaults with ``nT·dt = 4.1 ms``).
        - ``dt``/``gam``: "Sec" / "Hz/Gauss".
    Outputs:
        - ``rf``: `(1, 2, nT)` RF, "Gauss".
    """
    dur = nT * float(dt)
    tau = (jnp.arange(nT) + 0.5) / nT                # (0, 1)
    # quarter-local argument x: amplitude tanh(β(1−|x|…)) and sweep
    # tan(κx)/tan(κ), with x running 0→1, −1→1, and −1→0 over Q1,
    # Q2+Q3, Q4 — both are even/odd in x so the waveform is continuous
    x = jnp.where(tau < 0.25, 4 * tau,
                  jnp.where(tau < 0.75, 4 * tau - 2, 4 * tau - 4))
    amp = b1max * jnp.tanh(beta * (1 - jnp.abs(x)))
    # φ = ∫2π·fmax·tan(κx(τ'))/tanκ · dur·dτ'; antiderivative in x is
    # −ln cos(κx)/κ (even in x → continuous across quarter boundaries)
    scale = 2 * pi * fmax * dur / (4 * jnp.tan(kappa))
    phase = scale * (-jnp.log(jnp.cos(kappa * x)) / kappa)
    dphi = pi + theta / 2
    phase = phase + dphi * ((tau >= 0.25) & (tau < 0.75))
    rf = jnp.stack([amp * jnp.cos(phase), amp * jnp.sin(phase)])[None]
    return rf
