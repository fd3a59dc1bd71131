r"""Gradient nonlinearity (GNL): coil spatial imperfections and their
correction (the scanner's "gradwarp" stage).

Real gradient coils produce ``B_z^{(a)}(\mathbf r) = G_a\,f_a(\mathbf
r)`` with ``f_a(\mathbf r) = r_a + \sum_j c_{aj}\,S_j(\mathbf r)`` —
the ideal linear term plus (mostly odd-order) solid-harmonic
deviations that grow toward the FOV edge [Janke et al., MRM 52:115,
2004; Glover & Pelc, US4591789]. Everywhere the framework contracts
``loc·gr`` (``rfgr2beff``, the fused Bloch engines, the ``signal``
encoding operator), GNL is EXACTLY equivalent to replacing the true
location by the *effective location* ``f(\mathbf r)`` — so simulation
under GNL needs no engine change:

>>> beff = rfgr2beff(rf, gr, gnl_loc(loc, coeffs))       # distorted
>>> img_loc = gnl_invert(gnl_loc(grid, coeffs), coeffs)  # unwarp

This module provides the effective-location map, its (Newton) inverse
for image-domain distortion correction, and the Jacobian-determinant
intensity correction — all jnp, jittable, differentiable (a design
loop can therefore pre-compensate GNL the way it does GIRF via
``girf_=``).

Deviation coefficients ``c_{aj}`` index the :func:`mrphy_tpu.utils.
shim.sh_basis` columns (order 3 → 16 terms; the linear self-term is
NOT included — coeffs are deviations from ideal, zeros = ideal coil).
Every solid-harmonic column is harmonic (``∇²S_j = 0``, tested), as a
source-free coil field must be.

The reference framework has no gradient-nonlinearity stage (SURVEY
§2); beyond-reference capability.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mrphy_tpu.utils.shim import sh_basis

__all__ = ['gnl_loc', 'gnl_displacement', 'gnl_invert', 'gnl_jacdet']


def _order_of(nB: int) -> int:
    return {1: 0, 4: 1, 9: 2, 16: 3}[nB]


def gnl_loc(loc, coeffs, *, order: Optional[int] = None):
    r"""True location → gradient-effective location ``f(\mathbf r)``.

    Inputs:
        - ``loc``: `(..., xyz)`, "cm".
        - ``coeffs``: `(3, nB)`, "cm/cmⁿ" — per-gradient-axis
          deviation coefficients over the :func:`sh_basis` columns
          (row ``a`` describes coil ``a``; all-zero rows = ideal).
    Outputs:
        - ``loc_eff``: `(..., xyz)` — use anywhere ``loc`` feeds a
          ``loc·gr`` or ``loc·k`` contraction to simulate GNL.
    """
    loc = jnp.asarray(loc)
    coeffs = jnp.asarray(coeffs, loc.dtype)
    assert coeffs.ndim == 2 and coeffs.shape[0] == 3, coeffs.shape
    order = _order_of(coeffs.shape[1]) if order is None else order
    B = sh_basis(loc, order)                       # (..., nB)
    return loc + jnp.einsum('...j,aj->...a', B, coeffs,
                            precision=jax.lax.Precision.HIGHEST)


def gnl_displacement(loc, coeffs, *, order: Optional[int] = None):
    r"""``gnl_loc(loc) − loc`` — the apparent-position displacement
    field (same shapes as :func:`gnl_loc`)."""
    return gnl_loc(loc, coeffs, order=order) - jnp.asarray(loc)


def gnl_invert(loc_eff, coeffs, *, order: Optional[int] = None,
               iters: int = 8):
    r"""Invert the effective-location map: the true location that the
    scanner displays at grid position ``loc_eff`` (image-domain
    distortion correction / "gradwarp"):

    .. math:: f(\hat{\mathbf r}) = \mathbf r_{\mathrm{grid}}

    solved by damped fixed-point iteration ``r ← r_grid − d(r)``
    (``d`` = :func:`gnl_displacement`), which converges whenever the
    deviation Jacobian has spectral radius < 1 — always the case for
    physical coils inside the FOV. Round-trips with :func:`gnl_loc`
    at 1e-9 on 10 %-level deviations (tested).

    Inputs/outputs: as :func:`gnl_loc` (jittable, differentiable).
    """
    loc_eff = jnp.asarray(loc_eff)

    def body(r, _):
        return loc_eff - gnl_displacement(r, coeffs, order=order), None

    r, _ = jax.lax.scan(body, loc_eff, None, length=int(iters))
    return r


def gnl_jacdet(loc, coeffs, *, order: Optional[int] = None):
    r"""``det ∂f/∂r`` at each location — the Jacobian intensity
    correction of gradwarp: a true voxel images onto an area scaled
    by ``det J``, diluting its intensity by ``1/det J``, so MULTIPLY
    the unwarped intensities ``I_dist(f(r))`` by ``det J(r)``
    (verified empirically in ``examples/gnl_gradwarp.py``).

    Inputs: as :func:`gnl_loc`; Outputs: `(...,)` determinants.
    """
    loc = jnp.asarray(loc)
    shape = loc.shape

    def f(r):
        return gnl_loc(r, coeffs, order=order)

    J = jax.vmap(jax.jacfwd(f))(loc.reshape(-1, 3))    # (nS, 3, 3)
    return jnp.linalg.det(J).reshape(shape[:-1])
