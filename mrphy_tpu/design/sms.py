r"""Simultaneous multislice (SMS / multiband) RF pulses.

Replicate a single-slice pulse at several slice offsets in ONE pulse by
frequency modulation: under the slice-select gradient ``gz`` each band
``b`` at offset ``z_b`` needs carrier ``γ·gz·z_b`` Hz, so the multiband
waveform is ``Σ_b rf(t)·e^{i(2πγ·gz·z_b·t + φ_b)}``. Works with ANY
base pulse (sinc, :func:`~mrphy_tpu.design.slr_design`,
:func:`~mrphy_tpu.design.adiabatic_hypsec`, …).

The per-band phases ``φ_b`` set the peak-B1 behavior: phase-aligned
bands superpose coherently (peak ≈ nbands × base — usually infeasible),
while a scrambled schedule spreads the peaks in time: ``'quad'`` is
the classic quadratic schedule, and ``'opt'`` (default) is a
deterministic minimax schedule approaching the incoherent ``√nbands``
scaling.

All arithmetic is real (cos/sin pairs) — complex dtypes are unsupported
on this TPU runtime.

The reference framework has no multiband support; its multi-coil RF
path (``/root/reference/mrphy/beffective.py:144-165``) is orthogonal
(pTx, not SMS) and composes with this (modulate each coil's waveform).
"""

from functools import lru_cache
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mrphy_tpu import gamH, dt0, pi

__all__ = ['sms_modulate', 'sms_phases']


@lru_cache(maxsize=None)
def _opt_phases(nbands: int) -> tuple:
    r"""Deterministic minimax phase schedule: coordinate descent on
    ``max_u |Σ_b e^{i(2π·b·u + φ_b)}|`` (the asymptotic multiband
    envelope once the band carriers complete ≳1 beat period), the
    objective behind the published optimal multiband phase tables.
    Reaches ≈0.52–0.6 × coherent peak for 3–8 bands (incoherent bound
    is ``1/√nbands``)."""
    u = np.arange(4096) / 4096.0                        # one beat period
    carr = np.exp(2j * np.pi * np.outer(np.arange(nbands), u))
    cand = 2 * np.pi * np.arange(512) / 512.0

    def descend(phi):
        for _ in range(8):                               # sweeps
            for b in range(1, nbands):                   # φ_0 is gauge
                rest = (np.exp(1j * np.delete(phi, b))[:, None]
                        * np.delete(carr, b, 0)).sum(0)
                peaks = np.abs(rest[None] + np.exp(1j * cand)[:, None]
                               * carr[b][None]).max(1)
                phi[b] = cand[int(peaks.argmin())]
        peak = np.abs((np.exp(1j * phi)[:, None] * carr).sum(0)).max()
        return phi, peak

    # deterministic multi-start: Newman-family quadratic schedules
    # c·π·b²/n (coordinate descent alone strands in local minima)
    b2 = np.pi * np.arange(nbands, dtype=float) ** 2 / nbands
    best, bestp = None, np.inf
    for c in (0.0, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75):
        phi, peak = descend(c * b2.copy())
        if peak < bestp:
            best, bestp = phi, peak
    return tuple(best % (2 * np.pi))


def sms_phases(nbands: int, schedule: str = 'opt') -> jax.Array:
    r"""Per-band phase schedule for :func:`sms_modulate`: ``'opt'``
    (default — deterministic minimax schedule, peak-B1 near the
    incoherent ``√nbands`` bound) ⊻ ``'quad'`` (the classic
    ``φ_b = π·b²/nbands`` quadratic schedule) ⊻ ``'none'`` (zeros;
    coherent ``nbands``× peak)."""
    assert schedule in ('opt', 'quad', 'none'), schedule
    if schedule == 'opt':
        return jnp.asarray(_opt_phases(nbands))
    b = jnp.arange(nbands, dtype=jnp.float32)
    return pi * b ** 2 / nbands if schedule == 'quad' else 0 * b


def sms_modulate(rf: jax.Array, nbands: int, band_sep: float,
                 gz: float, *,
                 phases: Union[str, Sequence[float], None] = 'opt',
                 center: Optional[float] = None, dt=dt0,
                 gam=gamH) -> jax.Array:
    r"""Multiband-modulate a single-slice RF pulse.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))` base pulse, "Gauss".
        - ``nbands``: number of simultaneous slices.
        - ``band_sep``: slice-center spacing, "cm" (bands sit at
          ``(b − (nbands−1)/2)·band_sep``, symmetric about z=0).
        - ``gz``: slice-select gradient amplitude, "Gauss/cm" (e.g.
          from :func:`~mrphy_tpu.design.slr_gr`).
    Optionals:
        - ``phases``: ``'opt'`` (default) ⊻ ``'quad'`` ⊻ ``'none'`` ⊻
          an explicit length-``nbands`` phase array, rad (see
          :func:`sms_phases`).
        - ``center``: time origin of the modulation, samples (default
          ``(nT−1)/2`` — band phase ramps are zero at the pulse center,
          matching linear-phase bases whose isodelay is mid-pulse).
        - ``dt``/``gam``: "Sec" / "Hz/Gauss".
    Outputs:
        - ``rf_mb``: same shape as ``rf`` — feed to
          :class:`~mrphy_tpu.models.mobjs.Pulse` with the SAME ``gz``.
    """
    nT = rf.shape[2]
    if isinstance(phases, str) or phases is None:
        phases = sms_phases(nbands, phases or 'none')
    phases = jnp.asarray(phases)
    assert phases.shape == (nbands,), (phases.shape, nbands)
    c = (nT - 1) / 2 if center is None else center
    t = (jnp.arange(nT) - c) * dt                      # "Sec", centered
    zb = (jnp.arange(nbands) - (nbands - 1) / 2) * band_sep
    th = (2 * pi * gam * gz * zb[:, None] * t[None, :]
          + phases[:, None])                           # (nbands, nT)
    cs, sn = jnp.sum(jnp.cos(th), 0), jnp.sum(jnp.sin(th), 0)
    if rf.ndim == 4:
        cs, sn = cs[:, None], sn[:, None]
    x, y = rf[:, 0], rf[:, 1]
    return jnp.stack([x * cs - y * sn, x * sn + y * cs], 1)
