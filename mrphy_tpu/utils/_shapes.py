r"""Internal shape/broadcast helpers shared across the package."""

import jax.numpy as jnp

__all__ = ['rshape', 'asarr', 'largest_divisor_leq']


def largest_divisor_leq(n: int, bound: int) -> int:
    r"""Largest divisor of ``n`` that is ≤ ``bound`` (≥ 1)."""
    best, i = 1, 1
    while i * i <= n:
        if n % i == 0:
            for d in (i, n // i):
                if best < d <= bound:
                    best = d
        i += 1
    return best


def asarr(x, dtype=None):
    r"""``jnp.asarray`` that leaves traced arrays alone unless dtype given."""
    return jnp.asarray(x, dtype=dtype)


def rshape(x, ndim: int):
    r"""Right-pad ``x`` with trailing singleton dims up to ``ndim``.

    The reference threads scalars/`(N,)`/`(N,*Nd)` parameters through every
    API by reshaping ``x.shape + (ndim - x.ndim)*(1,)``
    (e.g. ``/root/reference/mrphy/utils.py:57``); this is the same rule for
    jnp arrays and Python scalars.
    """
    x = jnp.asarray(x)
    if x.ndim > ndim:
        raise ValueError(f'cannot right-pad array of ndim {x.ndim} to {ndim}')
    return x.reshape(x.shape + (ndim - x.ndim) * (1,))
