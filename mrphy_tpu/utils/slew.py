r"""Slew-rate clamps and constrained reparametrization.

Feature parity with ``/root/reference/mrphy/utils.py:261-310``
(``s2ts``, ``ts2s``, ``sclamp``): the tan-based bijection mapping
amplitude-limited slew rates to unbounded optimization variables for
gradient-waveform design.
"""

import jax.numpy as jnp

from mrphy_tpu import pi

__all__ = ['s2ts', 'ts2s', 'sclamp']


def s2ts(s, smax):
    r"""Slew rate → ts ≔ tan(s/smax·π/2) ∈ (-∞, ∞).

    Inputs:
        - ``s``: `(N, xyz, nT)`, "Gauss/cm/Sec", |s| < smax.
        - ``smax``: `()` ⊻ `(N, xyz)`, "Gauss/cm/Sec".

    Parity: ``/root/reference/mrphy/utils.py:261-275``.
    """
    s, smax = jnp.asarray(s), jnp.asarray(smax)
    return jnp.tan(s / smax[..., None] * pi / 2)


def ts2s(ts, smax):
    r"""ts ≔ tan(s/smax·π/2) → slew rate (inverse of :func:`s2ts`).

    Parity: ``/root/reference/mrphy/utils.py:296-310``.
    """
    ts, smax = jnp.asarray(ts), jnp.asarray(smax)
    return jnp.arctan(ts) / pi * 2 * smax[..., None]


def sclamp(s, smax):
    r"""Clamp slew rate elementwise to ``[-smax, smax]``.

    Inputs:
        - ``s``: `(N, xyz, nT)`, "Gauss/cm/Sec".
        - ``smax``: `()` ⊻ `(N, xyz)`, "Gauss/cm/Sec".

    Parity: ``/root/reference/mrphy/utils.py:278-293``.
    """
    s, smax = jnp.asarray(s), jnp.asarray(smax)
    if smax.ndim == 0:
        smax = smax[None]
    return jnp.clip(s, -smax[..., None], smax[..., None])
