r"""Physical coil fields: Biot–Savart loop coils in closed form.

The examples and design loops so far synthesized "birdcage-ish"
sensitivity phantoms; this module computes the *physical* field of
circular loop coils — the canonical MR surface-coil element — so pTx
design, SAR models, and reconstruction operate on Maxwell-consistent
maps, and coil placement itself becomes differentiable (every op here
is jnp, so gradients flow to loop centers/orientations/radii).

Physics: the magnetostatic field of a circular current loop has an
exact closed form in complete elliptic integrals (Smythe, *Static and
Dynamic Electricity*, §7.10). In loop-local cylindrical coordinates
(ρ, z), with loop radius ``a``, current ``I`` and
``m = 4aρ/((a+ρ)² + z²)``:

.. math::

    B_z &= \frac{\mu_0 I}{2\pi\sqrt{(a+\rho)^2+z^2}}
           \Big[K(m) + \frac{a^2-\rho^2-z^2}{(a-\rho)^2+z^2} E(m)\Big] \\
    B_\rho &= \frac{\mu_0 I\, z}{2\pi\rho\sqrt{(a+\rho)^2+z^2}}
           \Big[-K(m) + \frac{a^2+\rho^2+z^2}{(a-\rho)^2+z^2} E(m)\Big]

Units follow the framework (Gauss, cm, Ampere): ``μ0/4π = 0.1 G·cm/A``
exactly. The elliptic integrals use the arithmetic–geometric mean
(AGM) iteration — quadratically convergent, branch-free, jittable —
because ``jax.scipy.special`` ships neither ``ellipk`` nor ``ellipe``.

Validation (``tests/test_biot.py``): AGM vs ``scipy.special`` at
1e-13; the on-axis closed form; direct segment-quadrature Biot–Savart
at arbitrary orientation; ∇·B = 0 by exact autodiff Jacobians; and the
B1∓ rotating-frame conventions of the acquisition stack.

The reference framework has no field-synthesis stage (SURVEY §2); the
conventions (re/im pairs ``(..., xy, nC)``, receive B1⁻ = (Bx−iBy)/2
by reciprocity) match :mod:`mrphy_tpu.ops.signal` and
:mod:`mrphy_tpu.utils.coils`.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ['ellipk', 'ellipe', 'loop_field', 'loop_b1', 'loop_ring']

_MU0_4PI = 0.1      # Gauss·cm / Ampere, exact
_AGM_ITERS = 10     # c_n shrinks quadratically; 10 ≫ enough for f64


def _agm(m):
    r"""AGM tables for K/E: returns ``a_N`` and ``Σ 2^{n-1} c_n²``
    (Abramowitz & Stegun 17.6). ``m`` = the parameter (k²), m ∈ [0, 1).
    """
    m = jnp.asarray(m)
    a = jnp.ones_like(m)
    b = jnp.sqrt(1.0 - m)
    csum = 0.5 * m                      # n = 0 term: 2⁻¹ c₀², c₀ = √m
    two_n = jnp.asarray(1.0, m.dtype)
    for _ in range(_AGM_ITERS):         # static unroll, branch-free
        c = 0.5 * (a - b)
        a, b = 0.5 * (a + b), jnp.sqrt(a * b)
        two_n = two_n * 2.0
        csum = csum + two_n * c * c / 2.0
    return a, csum


def ellipk(m):
    r"""Complete elliptic integral of the first kind ``K(m)``,
    parameter convention (``m = k²``, like ``scipy.special.ellipk``),
    ``m ∈ [0, 1)``. AGM; matches scipy at ~1e-15 (f64)."""
    a, _ = _agm(m)
    return jnp.pi / (2.0 * a)


def ellipe(m):
    r"""Complete elliptic integral of the second kind ``E(m)``,
    parameter convention, ``m ∈ [0, 1]``. The ``m = 1`` endpoint is
    special-cased to the exact ``E(1) = 1`` (the AGM degenerates to
    linear convergence at ``b₀ = 0``, which would return π/4 after the
    fixed unroll); the derivative there is the true ±∞ singularity."""
    m = jnp.asarray(m)
    a, csum = _agm(jnp.where(m >= 1.0, 0.0, m))   # keep AGM well-posed
    e = jnp.pi / (2.0 * a) * (1.0 - csum)
    return jnp.where(m >= 1.0, jnp.ones_like(e), e)


def _is_batched(center, normal, radius, current):
    r"""True iff any loop parameter carries a coil axis — the contract
    that adds the trailing ``nC`` axis to :func:`loop_field` /
    :func:`loop_b1` outputs."""
    return (jnp.asarray(center).ndim == 2
            or jnp.asarray(normal).ndim == 2
            or jnp.asarray(radius).ndim >= 1
            or jnp.asarray(current).ndim >= 1)


def _frame(normal):
    r"""Orthonormal frame `(e1, e2, n̂)` from a loop normal `(..., 3)`;
    the in-plane axes are chosen deterministically (stable under jit,
    differentiable away from the ±x degeneracy)."""
    n = jnp.asarray(normal, jnp.result_type(float, normal))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    # seed with whichever lab axis is less aligned with n̂ (elementwise
    # select — works under vmap over coils, unlike a Python branch)
    ex = jnp.zeros_like(n).at[..., 0].set(1.0)
    ez = jnp.zeros_like(n).at[..., 2].set(1.0)
    seed = jnp.where(jnp.abs(n[..., :1]) < 0.9, ex, ez)
    e1 = seed - jnp.sum(seed * n, -1, keepdims=True) * n
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(n, e1)
    return e1, e2, n


def loop_field(loc, *, center, normal, radius, current=1.0):
    r"""Magnetic field of circular loop(s), exact closed form.

    Inputs:
        - ``loc``: `(..., 3)`, "cm" — field points.
        - ``center``: `(3,)` ⊻ `(nC, 3)`, "cm".
        - ``normal``: like ``center`` — loop axis (need not be unit).
        - ``radius``: scalar ⊻ `(nC,)`, "cm".
        - ``current``: scalar ⊻ `(nC,)`, "A" (DC equivalent; for RF,
          the per-unit-current map scaled by drive amplitude).

    A coil axis on ANY of the four loop parameters batches the result
    (trailing coil axis); the others broadcast against it.
    Output: ``B`` `(..., 3)` ⊻ `(..., 3, nC)`, "Gauss", lab frame.

    Exact off the wire; the on-wire singularity (ρ = a, z = 0) is the
    physical 1/r divergence — keep field points off the conductor.
    Differentiable in every input (loop-placement optimization).
    """
    center = jnp.asarray(center, jnp.result_type(float, center))
    normal = jnp.asarray(normal, center.dtype)
    radius = jnp.asarray(radius, center.dtype)
    current = jnp.asarray(current, center.dtype)
    # a coil axis on ANY input batches the result (keying off center
    # alone silently dropped all but coil 0 when only normal/radius
    # carried the axis)
    batched = _is_batched(center, normal, radius, current)
    nC = max(jnp.atleast_2d(center).shape[0],
             jnp.atleast_2d(normal).shape[0],
             radius.shape[0] if radius.ndim else 1,
             current.shape[0] if current.ndim else 1)
    cs = jnp.broadcast_to(jnp.atleast_2d(center), (nC, 3))   # (nC, 3)
    ns = jnp.broadcast_to(jnp.atleast_2d(normal), (nC, 3))
    rad = jnp.broadcast_to(radius, (nC,))
    cur = jnp.broadcast_to(current, (nC,))

    loc = jnp.asarray(loc, cs.dtype)
    e1, e2, nz = _frame(ns)                               # (nC, 3) each
    rel = loc[..., None, :] - cs                          # (..., nC, 3)
    x = jnp.sum(rel * e1, -1)
    y = jnp.sum(rel * e2, -1)
    z = jnp.sum(rel * nz, -1)
    rho = jnp.sqrt(x * x + y * y)
    eps = jnp.asarray(1e-12, cs.dtype)
    rho_s = jnp.maximum(rho, eps)                         # safe ρ

    a = rad
    d2 = (a + rho_s) ** 2 + z * z
    n2 = (a - rho_s) ** 2 + z * z                         # ≠0 off-wire
    m = 4.0 * a * rho_s / d2
    K, E = ellipk(m), ellipe(m)
    pref = 2.0 * _MU0_4PI * cur / jnp.sqrt(d2)            # μ0 I/(2π √d2)
    Bz = pref * (K + E * (a * a - rho_s ** 2 - z * z) / n2)
    Brho = (pref * z / rho_s
            * (-K + E * (a * a + rho_s ** 2 + z * z) / n2))
    Brho = jnp.where(rho > eps, Brho, 0.0)                # axis: B ∥ n̂

    cphi = jnp.where(rho > eps, x / rho_s, 1.0)
    sphi = jnp.where(rho > eps, y / rho_s, 0.0)
    B = (Brho[..., None] * (cphi[..., None] * e1 + sphi[..., None] * e2)
         + Bz[..., None] * nz)                            # (..., nC, 3)
    return jnp.moveaxis(B, -2, -1) if batched else B[..., 0, :]


def loop_b1(loc, *, center, normal, radius, current=1.0, mode='rx'):
    r"""Rotating-frame coil map(s) of loop coil(s): `(..., xy, nC)`.

    B0 is the lab ``z`` axis (framework convention). Receive
    (``mode='rx'``) returns B1⁻ = (Bx − iBy)/2 per unit current — the
    reciprocity sensitivity the acquisition stack's ``sens`` expects
    (:func:`mrphy_tpu.ops.signal.signal`); transmit (``mode='tx'``)
    returns B1⁺ = (Bx + iBy)/2 — the ``b1Map`` scaling of
    :func:`mrphy_tpu.ops.beffective.rfgr2beff`. Units: Gauss/A.
    """
    assert mode in ('rx', 'tx'), mode
    B = loop_field(loc, center=center, normal=normal, radius=radius,
                   current=current)
    if not _is_batched(center, normal, radius, current):
        B = B[..., None]                                  # (..., 3, 1)
    sign = -1.0 if mode == 'rx' else 1.0
    return 0.5 * jnp.stack([B[..., 0, :], sign * B[..., 1, :]], -2)


def loop_ring(nC: int, ring_radius: float, loop_radius: float, *,
              z: float = 0.0, axis: str = 'z', phase0: float = 0.0,
              dtype=None):
    r"""Standard cylindrical receive ring: ``nC`` loops on a circle of
    radius ``ring_radius`` (cm) around ``axis``, normals pointing
    radially inward (at the subject). Returns ``(centers (nC,3),
    normals (nC,3), radii (nC,))`` — feed to :func:`loop_field` /
    :func:`loop_b1`. Host-side numpy (geometry construction), like the
    trajectory generators."""
    assert axis in ('x', 'y', 'z'), axis
    phi = phase0 + 2 * np.pi * np.arange(nC) / nC
    c_t = ring_radius * np.cos(phi)
    s_t = ring_radius * np.sin(phi)
    zz = np.full(nC, z)
    cols = {'z': (c_t, s_t, zz), 'x': (zz, c_t, s_t),
            'y': (s_t, zz, c_t)}[axis]
    centers = np.stack(cols, -1)
    normals = -centers.copy()
    normals[..., 'xyz'.index(axis)] = 0.0
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    radii = np.full(nC, loop_radius)
    if dtype is not None:
        return (centers.astype(dtype), normals.astype(dtype),
                radii.astype(dtype))
    return centers, normals, radii
