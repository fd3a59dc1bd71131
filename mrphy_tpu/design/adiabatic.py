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

__all__ = ['adiabatic_hypsec', 'hypsec_bw', 'hypsec_threshold']


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
