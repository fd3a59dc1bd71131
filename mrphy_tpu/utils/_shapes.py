r"""Internal shape/broadcast helpers shared across the package."""

import jax.numpy as jnp

__all__ = ['rshape', 'asarr', 'largest_divisor_leq',
           'largest_divisor_leq_pref']


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


def largest_divisor_leq_pref(n: int, bound: int, pref: int) -> int:
    r"""Largest divisor of ``n`` ≤ ``bound`` that is itself a multiple
    of ``pref``, else the plain largest divisor ≤ ``bound``.

    Time-chunk selection for the Pallas kernels: Mosaic ``fori_loop``
    cannot unroll, so the kernels unroll manually by
    ``gcd(tc, _UNROLL)`` — a tc like 125 (5³) degrades to unroll-1,
    measured **5×** slower (346 vs 71 ms for the two-pool forward at
    512k × 2000; RESULTS.md round 3). Preferring multiples of the
    unroll factor removes the cliff whenever ``n`` has any such
    divisor in range."""
    best = 0
    i = 1
    while i * i <= n:
        if n % i == 0:
            for d in (i, n // i):
                if best < d <= bound and d % pref == 0:
                    best = d
        i += 1
    return best if best else largest_divisor_leq(n, bound)


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
