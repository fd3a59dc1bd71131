r"""Specific-absorption-rate (SAR) machinery for pTx design.

Parallel-transmit arrays deposit RF power non-uniformly; regulatory
limits bound the *local* 10-g SAR, which for a coil array is a set of
quadratic forms over the per-coil drive vector:

    SAR_r(t) = z(t)^H Q_r z(t),   z(t) in C^{nCoils}

with one positive-semidefinite Hermitian ``Q_r`` per spatial position.
Electromagnetic simulation yields millions of such matrices; the
standard practice (Eichfelder & Gebhardt, MRM 66:1468, 2011) compresses
them to a few hundred *virtual observation points* (VOPs) whose maximum
over-estimates every position's SAR by at most a chosen margin. Design
then constrains the VOP maxima — exactly what
:func:`mrphy_tpu.design.design_pulse` does with ``sarQ_``/``lam_sar``.

TPU mapping: the VOP evaluation is a batch of tiny Hermitian forms —
``(nT, nCoils) @ (nVOP, nCoils, nCoils)`` einsums that XLA tiles onto
the MXU; complex arithmetic is carried as real/imaginary parts
(complex dtypes are unsupported on this TPU runtime), splitting each
Hermitian ``Q = Qr + i·Qi`` into its symmetric real and antisymmetric
imaginary parts, under which

    z^H Q z = x^T Qr x + y^T Qr y + 2 y^T Qi x,   z = x + i·y

is manifestly real. The compressor runs host-side (numpy eigenvalue
checks) as one-time preprocessing.

The reference framework has no SAR machinery (its design recipe is a
README narrative, ``/root/reference/README.md:27-36``); this module is
part of making the design loop production-complete for pTx.
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['sar_vops', 'vop_compress']

_HI = jax.lax.Precision.HIGHEST


def sar_vops(rf: jax.Array, Qr: jax.Array,
             Qi: Optional[jax.Array] = None) -> jax.Array:
    r"""Time-averaged SAR at each virtual observation point.

    Computes ``S[n, v] = (1/nT) Σ_t z_t^H Q_v z_t`` for the complex
    drive ``z_t = rf[n, 0, t, :] + i·rf[n, 1, t, :]``.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss" — real/imaginary RF
          parts per the package shape grammar (a missing trailing coil
          dim means one coil, matching ``rfgr2beff``'s contract, ref
          ``/root/reference/mrphy/beffective.py:148-156``).
        - ``Qr``: `(nVOP, nCoils, nCoils)`, symmetric real parts of the
          VOP matrices.
    Optionals:
        - ``Qi``: `(nVOP, nCoils, nCoils)`, antisymmetric imaginary
          parts; omitted ⇒ real-valued VOPs.
    Outputs:
        - ``S``: `(N, nVOP)`, time-averaged quadratic forms. Units
          follow the matrices: with ``Q`` in (W/kg)/Gauss² the result
          is W/kg at the pulse's duty cycle of 1; scale by the sequence
          duty cycle outside.
    """
    if rf.ndim == 3:
        rf = rf[..., None]
    x, y = rf[:, 0], rf[:, 1]                       # (N, nT, nCoils)
    nT = x.shape[-2]
    s = (jnp.einsum('ntc,vcd,ntd->nv', x, Qr, x, precision=_HI)
         + jnp.einsum('ntc,vcd,ntd->nv', y, Qr, y, precision=_HI))
    if Qi is not None:
        s = s + 2.0 * jnp.einsum('ntc,vcd,ntd->nv', y, Qi, x,
                                 precision=_HI)
    return s / nT


def _split_hermitian(Q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    Qr = np.real(Q)
    Qi = np.imag(Q)
    return 0.5 * (Qr + np.swapaxes(Qr, -1, -2)), \
        0.5 * (Qi - np.swapaxes(Qi, -1, -2))


def vop_compress(Q: np.ndarray, eps: float,
                 max_iter: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    r"""Greedy virtual-observation-point compression.

    Reduces a large set of Hermitian PSD SAR matrices to a subset
    ``{V_k}`` such that for EVERY input matrix ``Q_j`` there is a VOP
    with ``V_k + eps·λ̄·I − Q_j ⪰ 0`` (λ̄ = the largest eigenvalue seen
    across the set) — so ``max_k z^H V_k z + eps·λ̄·‖z‖²`` upper-bounds
    every position's SAR: the Eichfelder–Gebhardt guarantee with the
    simple greedy core (positions sorted by norm, first-fit dominance
    check via a minimum-eigenvalue test).

    Host-side preprocessing (numpy): runs once per coil/subject model,
    never under jit.

    Inputs:
        - ``Q``: `(nPos, nCoils, nCoils)`, complex (or real) Hermitian
          PSD matrices.
        - ``eps``: relative over-estimation margin (e.g. ``0.05``).
    Optionals:
        - ``max_iter``: cap on selected VOPs (None = unlimited).
    Outputs:
        - ``(Qr, Qi, idx)``: real `(nVOP, nCoils, nCoils)` symmetric /
          antisymmetric parts ready for :func:`sar_vops` — with the
          ``eps·λ̄·I`` margin already FOLDED IN so their maxima are true
          upper bounds — and the selected position indices.
    """
    Q = np.asarray(Q)
    assert Q.ndim == 3 and Q.shape[-1] == Q.shape[-2], Q.shape
    n = Q.shape[0]
    # spectral norms; process big matrices first so they become VOPs
    norms = np.linalg.norm(Q, ord=2, axis=(-2, -1))
    lam_bar = float(norms.max()) if n else 0.0
    order = np.argsort(-norms)
    margin = eps * lam_bar * np.eye(Q.shape[-1])
    vops: list = []
    idx: list = []
    for j in order:
        dominated = False
        for V in vops:
            # V + margin − Q_j ⪰ 0 ⇔ min eig ≥ 0 (tiny tolerance for
            # the eigensolver's rounding)
            w = np.linalg.eigvalsh(V + margin - Q[j])
            if w[0] >= -1e-12 * max(lam_bar, 1.0):
                dominated = True
                break
        if not dominated:
            if max_iter is not None and len(vops) >= max_iter:
                # cap reached: fall back to the conservative cover
                # V := V + Q_j on the nearest VOP (keeps the guarantee,
                # loosens the bound)
                k = int(np.argmin([np.linalg.norm(V - Q[j], ord=2)
                                   for V in vops]))
                vops[k] = vops[k] + Q[j]
            else:
                vops.append(Q[j].copy())
                idx.append(int(j))
    V = np.stack(vops) if vops else np.zeros((0,) + Q.shape[1:], Q.dtype)
    Qr, Qi = _split_hermitian(V + margin)   # fold the margin in
    return Qr, Qi, np.asarray(idx, np.int64)
