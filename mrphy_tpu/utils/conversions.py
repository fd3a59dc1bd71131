r"""k-space / gradient / slew-rate conversions and grid indexing.

Feature parity with ``/root/reference/mrphy/utils.py:27-111,239-258``
(``ctrsub``, ``g2k``, ``k2g``, ``g2s``, ``s2g``), rebuilt on jnp: cumulative
sums and finite differences are single fused XLA ops, jittable and
differentiable end-to-end (they sit on the design-loop gradient path).
"""

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0
from mrphy_tpu._kwalias import kwalias
from mrphy_tpu.utils._shapes import rshape

__all__ = ['ctrsub', 'g2k', 'g2s', 'k2g', 's2g']


def ctrsub(shape):
    r"""Center subscript of a regular grid: ``shape // 2``.

    Parity: ``/root/reference/mrphy/utils.py:27-33``. Accepts ints, tuples,
    or arrays; applies elementwise.
    """
    if isinstance(shape, (tuple, list)):
        return type(shape)(s // 2 for s in shape)
    return shape // 2


@kwalias(**{'γ': 'gam'})
def g2k(g, isTx: bool, dt=dt0, *, gam=gamH):
    r"""Compute k-space from gradients.

    Inputs:
        - ``g``: `(N, xyz, nT)`, "Gauss/cm", gradient.
        - ``isTx``: bool; if True, transmit k-space (ends at the origin).
    Optionals:
        - ``dt``: `()` ⊻ `(N ⊻ 1,)`, "Sec", dwell time.
        - ``gam`` (alias ``γ``): `()` ⊻ `(N ⊻ 1, ...)`, "Hz/Gauss".
    Outputs:
        - ``k``: `(N, xyz, nT)`, "cycle/cm".

    Parity: ``/root/reference/mrphy/utils.py:36-62`` (cumsum ⋅ γ ⋅ dt;
    Tx k-space shifted to end at 0).
    """
    g = jnp.asarray(g)
    gam, dt = rshape(gam, g.ndim), rshape(dt, g.ndim)
    k = gam * dt * jnp.cumsum(g, axis=2)
    if isTx:
        k = k - k[:, :, -1:]
    return k


def g2s(g, dt=dt0):
    r"""Compute slew rates from gradients (finite difference / dt).

    Inputs:
        - ``g``: `(N, xyz, nT)`, "Gauss/cm".
    Optionals:
        - ``dt``: `()` ⊻ `(N ⊻ 1,)`, "Sec".
    Outputs:
        - ``s``: `(N, xyz, nT)`, "Gauss/cm/Sec".

    Parity: ``/root/reference/mrphy/utils.py:65-83`` (first sample kept,
    i.e. diff against an implicit leading 0).
    """
    g = jnp.asarray(g)
    dt = rshape(dt, g.ndim)
    s = jnp.concatenate((g[:, :, :1], g[:, :, 1:] - g[:, :, :-1]), axis=2)/dt
    return s


@kwalias(**{'γ': 'gam'})
def k2g(k, isTx: bool, dt=dt0, *, gam=gamH):
    r"""Compute gradients from k-space (inverse of :func:`g2k`).

    Inputs:
        - ``k``: `(N, xyz, nT)`, "cycle/cm". If ``isTx``, ``k[..., -1]``
          must be 0 (transmit k-space ends at the origin).
    Outputs:
        - ``g``: `(N, xyz, nT)`, "Gauss/cm".

    Parity: ``/root/reference/mrphy/utils.py:86-111``. The reference
    ``assert``s the Tx-end-at-0 precondition at `utils.py:105`; under jit
    that check is untraceable, so it is enforced only on concrete inputs.
    """
    k = jnp.asarray(k)
    if isTx:
        try:
            if not bool(jnp.all(k[:, :, -1] == 0)):
                raise ValueError('Tx k-space must end at the origin')
        except jax.errors.TracerBoolConversionError:
            pass  # traced: precondition is the caller's responsibility
    gam, dt = rshape(gam, k.ndim), rshape(dt, k.ndim)
    g = jnp.concatenate((k[:, :, :1], k[:, :, 1:] - k[:, :, :-1]),
                        axis=2)/gam/dt
    return g


def s2g(s, dt=dt0):
    r"""Compute gradients from slew rates (inverse of :func:`g2s`).

    Inputs:
        - ``s``: `(N, xyz, nT)`, "Gauss/cm/Sec".
    Outputs:
        - ``g``: `(N, xyz, nT)`, "Gauss/cm".

    Parity: ``/root/reference/mrphy/utils.py:239-258`` (dt ⋅ cumsum).
    """
    s = jnp.asarray(s)
    dt = rshape(dt, s.ndim)
    return dt * jnp.cumsum(s, axis=2)
