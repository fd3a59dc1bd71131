r"""VERSE — variable-rate selective excitation (peak-B1 reduction).

An RF sample and its gradient can be traded for a LONGER, WEAKER sample
with the gradient scaled down by the same factor: the on-resonance
rotation of a piecewise-constant step is about the axis
``(rf_x, rf_y, g·x)``, and dividing the whole field by α while playing
it α-times longer keeps both the axis and the total angle — EXACTLY,
for every spin position (this integer-split construction avoids the
interpolation error of classic continuous VERSE). Peak-B1-limited
pulses (SAR, hardware clipping) thus slow down only where |rf| exceeds
the cap, instead of scaling the whole pulse.

The classic caveat holds: off-resonance does not dilate with the
gradient, so VERSE'd pulses trade peak B1 for Δf sensitivity where the
rate varies — quantified in ``tests/test_verse.py``.

No reference counterpart (the reference ships no pulse tools); the
method is the standard Conolly/Hargreaves VERSE, in the exact
discrete form.
"""

from typing import Tuple

import numpy as np

__all__ = ['verse_b1cap']


def verse_b1cap(rf, gr, b1max: float, *, dt: float = None,
                smax: float = None) -> Tuple[np.ndarray, np.ndarray]:
    r"""Cap peak |RF| at ``b1max`` by exact integer sample splitting.

    Each sample ``k`` with ``|rf_k| > b1max`` is replaced by
    ``α_k = ceil(|rf_k|/b1max)`` consecutive samples of ``rf_k/α_k``
    and ``gr_k/α_k`` — the on-resonance rotation of every spin is
    IDENTICAL (axis and angle preserved per original sample), while
    peak |rf| respects the cap and duration grows by ``mean(α)``.

    Inputs:
        - ``rf``: `(1, 2, nT)` or `(2, nT)`, "Gauss" (single-coil —
          VERSE re-times the shared gradient, so per-coil peaks must be
          capped by their common α: pass the max-|rf| coil's profile
          or pre-combine).
        - ``gr``: `(1, 3, nT)` or `(3, nT)`, "Gauss/cm".
        - ``b1max``: "Gauss", the peak cap.
    Optionals:
        - ``dt``/``smax``: when both given, assert the VERSE'd gradient
          still meets the slew limit (fails loudly rather than silently
          shipping an unplayable waveform).

    .. warning::
        Rate changes step the gradient by ``g·Δ(1/α)`` in ONE sample —
        exactness and slew trade off. This form suits low-gradient
        stretches (e.g. RF peaks on a spiral's slow segments) or
        simulation studies; hardware-tight cases need continuous
        time-optimal VERSE (slew-constrained reparametrization), which
        sacrifices the exact-rotation property this function keeps.
    Outputs:
        - ``(rf_v, gr_v)``: same leading shapes, length ``Σα_k``.
    """
    rf = np.asarray(rf, float)
    gr = np.asarray(gr, float)
    lead_rf = rf.ndim == 3
    rf2 = rf[0] if lead_rf else rf
    gr2 = gr[0] if gr.ndim == 3 else gr
    assert rf2.shape[0] == 2 and gr2.shape[0] == 3
    nT = rf2.shape[-1]
    assert gr2.shape[-1] == nT
    amp = np.hypot(rf2[0], rf2[1])
    alpha = np.maximum(1, np.ceil(amp / b1max - 1e-12).astype(int))
    idx = np.repeat(np.arange(nT), alpha)
    a_rep = alpha[idx].astype(float)
    rf_v = rf2[:, idx] / a_rep
    gr_v = gr2[:, idx] / a_rep
    if dt is not None and smax is not None:
        from mrphy_tpu.utils.traj import traj_check
        traj_check(gr_v[None], gmax=np.abs(gr_v).max() + 1e-9,
                   smax=smax, dt=dt)
    if lead_rf:
        rf_v, gr_v = rf_v[None], gr_v[None]
    elif gr.ndim == 3:
        gr_v = gr_v[None]
    return rf_v, gr_v
