r"""Axis-angle (Rodrigues) rotation.

Feature parity with ``/root/reference/mrphy/utils.py:333-359`` (``uϕrot``):

    Vo = cosΦ·Vi + (1-cosΦ)·(UᵀVi)·U + sinΦ·U×Vi

broadcast over an optional trailing ``nV`` dim. Purely functional (jnp),
differentiable by construction; no allocation concerns apply under XLA.
"""

import jax.numpy as jnp

__all__ = ['uphirot']


def uphirot(u, phi, vi):
    r"""Rotate ``vi`` about unit axis ``u`` by angle ``phi``.

    Inputs:
        - ``u``:   `(N, *Nd, xyz)`, rotation axes, assumed unit-norm.
        - ``phi``: `(N, *Nd)`, rotation angles (radians).
        - ``vi``:  `(N, *Nd, xyz, (nV))`, vectors to rotate; the trailing
          ``nV`` dim (if present) broadcasts the rotation across vectors.
    Outputs:
        - ``vo``:  `(N, *Nd, xyz, (nV))`, rotated vectors.

    Unicode alias ``uϕrot`` (and the ``uφrot`` spelling the reference's
    ``__all__`` uses at ``utils.py:24``) is exported by
    :mod:`mrphy_tpu.utils`.
    """
    u, phi, vi = jnp.asarray(u), jnp.asarray(phi), jnp.asarray(vi)

    if vi.ndim == u.ndim:        # vi: (..., xyz)
        dim, phi_ = -1, phi[..., None]
    else:                        # vi: (..., xyz, nV)
        dim, phi_, u = -2, phi[..., None, None], u[..., None]

    cphi, sphi = jnp.cos(phi_), jnp.sin(phi_)
    utv = jnp.sum(u * vi, axis=dim, keepdims=True)
    uxv = jnp.cross(jnp.broadcast_to(u, vi.shape), vi, axis=dim)
    return cphi * vi + (1 - cphi) * utv * u + sphi * uxv
