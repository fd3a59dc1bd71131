r"""B0 shimming: spherical-harmonic field fitting.

The calibration step between field mapping and off-resonance-corrected
work: scanners null the smooth part of Δf(x) with shim coils whose
fields are (to excellent approximation) the real solid harmonics. This
module fits shim currents to a measured field map by least squares and
returns the residual map — the Δf that simulation/design/recon then has
to handle (e.g. ``examples/fieldmap_recon.py``'s time-segmented NUFFT,
or a ``design_pulse`` run on the shimmed cube).

Everything is jnp (jittable, differentiable): the basis is polynomial,
the fit one QR least squares — shim optimization can sit inside a
larger design graph.

The reference framework has no shimming utilities (SURVEY §2); basis
conventions follow the standard low-order shim set (Golay/Romeo–Hoult).
"""

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ['sh_basis', 'shim_fit', 'shim_apply']

_NAMES = ('dc', 'x', 'y', 'z', 'xy', 'zy', 'z2', 'zx', 'x2y2',
          'z3', 'xz2', 'yz2', 'zx2y2', 'xyz', 'x3', 'y3')


def sh_basis(loc_, order: int = 2):
    r"""Real solid-harmonic shim basis sampled at spin locations.

    Inputs:
        - ``loc_``: `(..., nM, xyz)`, "cm".
        - ``order``: 0–3 (→ 1, 4, 9, or 16 terms:
          ``1; x, y, z; xy, zy, 3z²−r², zx, x²−y²`` — the standard
          first/second-order shim channels — plus the seven l=3
          harmonics used by :mod:`mrphy_tpu.utils.gnl`).
    Outputs:
        - ``B``: `(..., nM, nB)`, unit-normalized columns are NOT
          applied — values are the raw harmonics ("cmⁿ"), so fitted
          coefficients carry "Hz/cmⁿ".
    """
    loc_ = jnp.asarray(loc_)
    x, y, z = loc_[..., 0], loc_[..., 1], loc_[..., 2]
    cols = [jnp.ones_like(x)]
    if order >= 1:
        cols += [x, y, z]
    if order >= 2:
        cols += [x * y, z * y, 3 * z ** 2 - (x ** 2 + y ** 2 + z ** 2),
                 z * x, x ** 2 - y ** 2]
    if order >= 3:
        # l=3 real solid harmonics (raw scale, like the rest): the
        # leading gradient-coil nonlinearity terms (utils.gnl)
        r2t = x ** 2 + y ** 2
        cols += [z * (2 * z ** 2 - 3 * r2t),
                 x * (4 * z ** 2 - r2t), y * (4 * z ** 2 - r2t),
                 z * (x ** 2 - y ** 2), x * y * z,
                 x * (x ** 2 - 3 * y ** 2), y * (3 * x ** 2 - y ** 2)]
    assert order <= 3, 'shim basis implemented to 3rd order'
    return jnp.stack(cols, -1)


def shim_fit(df_, loc_, *, order: int = 2, w_=None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Least-squares shim: coefficients nulling the field map.

    Inputs:
        - ``df_``: `(nM,)` ⊻ `(N, nM)`, "Hz", measured field map
          (compact layout — a SpinCube's ``df_``).
        - ``loc_``: `(nM, xyz)` ⊻ `(N ⊻ 1, nM, xyz)`, "cm".
    Optionals:
        - ``order``: shim order (see :func:`sh_basis`).
        - ``w_``: `(nM,)`-broadcastable nonneg weights (restrict the
          fit to the object support: pass the mask/|ρ|).
    Outputs:
        - ``coeffs``: `(..., nB)`, "Hz/cmⁿ" — the SHIM setting is the
          NEGATIVE of these (they reproduce the field).
        - ``residual``: same shape as ``df_`` — the shimmed map
          ``df_ − B·coeffs``.
    """
    df_ = jnp.asarray(df_)
    B = sh_basis(loc_, order)
    B = jnp.broadcast_to(B, df_.shape + B.shape[-1:])
    if w_ is not None:
        sw = jnp.sqrt(jnp.broadcast_to(jnp.asarray(w_, df_.dtype),
                                       df_.shape))
        Bw = B * sw[..., None]
        yw = df_ * sw
    else:
        Bw, yw = B, df_
    # batched normal equations (lstsq is not batched) via pinv: the
    # minimum-norm solution survives degenerate channels (e.g. the z
    # columns vanish identically on a single-slice cube)
    G = jnp.einsum('...mi,...mj->...ij', Bw, Bw,
                   precision='highest')
    b = jnp.einsum('...mi,...m->...i', Bw, yw,
                   precision='highest')
    coeffs = jnp.einsum('...ij,...j->...i', jnp.linalg.pinv(G), b,
                        precision='highest')
    return coeffs, df_ - jnp.matmul(B, coeffs[..., None],
                      precision='highest')[..., 0]


def shim_apply(df_, loc_, coeffs, *, order: Optional[int] = None):
    r"""Field map after applying shim settings ``−coeffs``:
    ``df_ − sh_basis(loc_)·coeffs`` (broadcasts like :func:`shim_fit`)."""
    coeffs = jnp.asarray(coeffs)
    nB = coeffs.shape[-1]
    order = {1: 0, 4: 1, 9: 2, 16: 3}[nB] if order is None else order
    B = sh_basis(loc_, order)
    return jnp.asarray(df_) - jnp.matmul(B, coeffs[..., None],
                      precision='highest')[..., 0]
