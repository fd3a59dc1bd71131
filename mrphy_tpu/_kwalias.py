r"""Keyword-argument aliasing.

The reference API (`/root/reference/mrphy/utils.py:23-24`,
`beffective.py:15-18`) uses Unicode math identifiers (``γ``, ``Δf``, ``uϕrot``)
directly in its public API, and even has a latent quirk where ``__all__``
spells ``'beff2uφ'`` (U+03C6) while the function is ``beff2uϕ`` (U+03D5).

This rebuild uses ASCII-safe primary names throughout, but keeps full
call-compatibility with the reference by accepting the Unicode keyword
spellings as aliases. ``kwalias`` renames aliased keywords before the call.
"""

import functools

__all__ = ['kwalias']


def kwalias(**alias_to_primary):
    r"""Decorator: accept alias keyword names, mapping them to primary names.

    Usage::

        @kwalias(**{'γ': 'gam', 'Δf': 'df'})
        def f(x, *, gam=None, df=None): ...

        f(x, γ=4257.6)   # same as f(x, gam=4257.6)
    """
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            for alias, primary in alias_to_primary.items():
                if alias in kwargs:
                    if primary in kwargs:
                        raise TypeError(
                            f"{fn.__name__}() got both '{alias}' and its "
                            f"primary spelling '{primary}'")
                    kwargs[primary] = kwargs.pop(alias)
            return fn(*args, **kwargs)
        wrapper.__kwaliases__ = dict(alias_to_primary)
        return wrapper
    return deco
