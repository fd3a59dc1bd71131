r"""RF waveform converters, clamps, and constrained reparametrizations.

Feature parity with ``/root/reference/mrphy/utils.py:114-236,313-330``:
complex↔real converters (``rf_c2r``/``rf_r2c``), magnitude clamp
(``rfclamp``), and the two bounded↔unbounded bijections used to run
unconstrained optimization over peak-limited RF:

- tan-based:   ``rf2trho_theta`` / ``trho_theta2rf``
  (ref ``rf2tρθ``/``tρθ2rf``)
- logit-based: ``rf2lrho_theta`` / ``lrho_theta2rf``
  (ref ``rf2lρθ``/``lρθ2rf``)

No numpy/cupy split is needed (the reference dispatches on array type at
``utils.py:147-152``): jnp handles host and device arrays uniformly.

Complex-dtype boundary: some TPU runtimes (e.g. the remote-attached
"axon" backend) do not implement complex dtypes AT ALL — eager
``jnp.zeros(..., complex64)`` throws ``UNIMPLEMENTED``. These two
converters are data-prep utilities, not compute-path ops, so they stay
graceful there: :func:`rf_c2r` splits re/im **on the host** (numpy) and
only then moves the real-valued result to the device, and
:func:`rf_r2c` returns a host numpy complex array when the default
backend lacks complex support (a device-resident complex array cannot
exist there). On backends with complex support both return jax arrays.

Unicode aliases (``rf2tρθ`` …) are exported from :mod:`mrphy_tpu.utils`.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu import pi

__all__ = ['rf_c2r', 'rf_r2c', 'rf2trho_theta', 'trho_theta2rf',
           'rf2lrho_theta', 'lrho_theta2rf', 'rfclamp']


@functools.lru_cache(maxsize=1)
def _complex_ok() -> bool:
    r"""Whether the default backend supports complex dtypes (the axon TPU
    runtime does not — CLAUDE.md; probed once, cached)."""
    try:
        jnp.zeros((), jnp.complex64).block_until_ready()
        return True
    except Exception:
        return False


def rf_c2r(rf):
    r"""Convert complex RF to real RF.

    Inputs:
        - ``rf``: `(N, 1, nT, (nCoils))`, complex RF pulse.
    Outputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, x: real, y: imag.

    The re/im split happens on the host (numpy): complex inputs cannot
    be device-resident on runtimes without complex support, and the
    real-valued RESULT is what belongs on the device (see module note).

    Parity: ``/root/reference/mrphy/utils.py:134-152``.
    """
    rf = np.asarray(rf)
    return jnp.asarray(np.concatenate((rf.real, rf.imag), axis=1))


def rf_r2c(rf):
    r"""Convert real RF to complex RF.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, x: real, y: imag.
    Outputs:
        - ``rf``: `(N, 1, nT, (nCoils))`, complex RF pulse — a jax array
          when the backend supports complex dtypes, otherwise a host
          numpy array (see module note on the complex-dtype boundary).

    Parity: ``/root/reference/mrphy/utils.py:155-168``.
    """
    if _complex_ok():
        rf = jnp.asarray(rf)
        return rf[:, 0:1, ...] + 1j * rf[:, 1:2, ...]
    rf = np.asarray(rf)
    return rf[:, 0:1, ...] + 1j * rf[:, 1:2, ...]


def _rfmax_bcast(rfmax):
    r"""``rfmax``: `()` ⊻ `(N, (nCoils))` → `(N ⊻ 1, 1, 1, (nCoils))`."""
    rfmax = jnp.asarray(rfmax)
    if rfmax.ndim == 0:
        rfmax = rfmax[None]
    return rfmax[:, None, None, ...]


def rf2trho_theta(rf, rfmax):
    r"""Real RF → (tρ ≔ tan(ρ/rfmax·π/2), θ): unbounded design variables.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss", |rf| < rfmax.
        - ``rfmax``: `()` ⊻ `(N, (nCoils))`, "Gauss".
    Outputs:
        - ``trho``: `(N, 1, nT, (nCoils))`, tan(ρ/rfmax·π/2) ∈ [0, +∞).
        - ``theta``: `(N, 1, nT, (nCoils))`, RF phase ∈ [-π, π].

    Parity: ``/root/reference/mrphy/utils.py:196-214`` (``rf2tρθ``).
    """
    rf = jnp.asarray(rf)
    rho = jnp.linalg.norm(rf, axis=1, keepdims=True)
    trho = jnp.tan(rho / _rfmax_bcast(rfmax) * pi / 2)
    theta = jnp.arctan2(rf[:, 1:2, ...], rf[:, 0:1, ...])
    return trho, theta


def trho_theta2rf(trho, theta, rfmax):
    r"""(tρ, θ) → real RF (inverse of :func:`rf2trho_theta`).

    Outputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss", |rf| < rfmax.

    Parity: ``/root/reference/mrphy/utils.py:313-330`` (``tρθ2rf``).
    """
    trho, theta = jnp.asarray(trho), jnp.asarray(theta)
    rho = jnp.arctan(trho) / pi * 2 * _rfmax_bcast(rfmax)
    return rho * jnp.concatenate((jnp.cos(theta), jnp.sin(theta)), axis=1)


def rf2lrho_theta(rf, rfmax, *, eps=1e-7):
    r"""Real RF → (lρ ≔ logit(ρ/rfmax), θ): unbounded design variables.

    Outputs:
        - ``lrho``: `(N, 1, nT, (nCoils))`, logit(ρ/rfmax) ∈ (-∞, +∞).
        - ``theta``: `(N, 1, nT, (nCoils))`, RF phase ∈ [-π, π].

    Parity: ``/root/reference/mrphy/utils.py:171-193`` (``rf2lρθ``); the
    input ratio is clipped to ``[eps, 1-eps]`` like ``Tensor.logit(eps)``.
    """
    rf = jnp.asarray(rf)
    p = jnp.linalg.norm(rf, axis=1, keepdims=True) / _rfmax_bcast(rfmax)
    p = jnp.clip(p, eps, 1 - eps)
    lrho = jnp.log(p) - jnp.log1p(-p)
    theta = jnp.arctan2(rf[:, 1:2, ...], rf[:, 0:1, ...])
    return lrho, theta


def lrho_theta2rf(lrho, theta, rfmax):
    r"""(lρ, θ) → real RF (inverse of :func:`rf2lrho_theta`).

    Parity: ``/root/reference/mrphy/utils.py:114-131`` (``lρθ2rf``).
    """
    lrho, theta = jnp.asarray(lrho), jnp.asarray(theta)
    rho = jax.nn.sigmoid(lrho) * _rfmax_bcast(rfmax)
    return rho * jnp.concatenate((jnp.cos(theta), jnp.sin(theta)), axis=1)


def rfclamp(rf, rfmax, *, eps=1e-7):
    r"""Clamp RF magnitude |rf| to ``rfmax - eps``.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss".
        - ``rfmax``: `()` ⊻ `(N, (nCoils))`, "Gauss".
    Outputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, with ‖rf‖₂ (over xy) ≤ rfmax-eps.

    Parity: ``/root/reference/mrphy/utils.py:217-236``.
    """
    rf = jnp.asarray(rf)
    rf_abs = jnp.linalg.norm(rf, axis=1, keepdims=True)
    scale = jnp.minimum((_rfmax_bcast(rfmax) - eps) / rf_abs, 1.0)
    return rf * scale
