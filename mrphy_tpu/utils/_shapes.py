r"""Internal shape/broadcast helpers shared across the package."""

import jax.numpy as jnp

__all__ = ['rshape', 'asarr']


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
