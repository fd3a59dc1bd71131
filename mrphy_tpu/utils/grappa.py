r"""GRAPPA: k-space parallel imaging for uniformly undersampled
Cartesian acquisitions [Griswold et al., MRM 47(6):1202, 2002].

The k-space companion to SENSE (``examples/recon_sense.py``) and to the
subspace calibration of :func:`mrphy_tpu.utils.coils.espirit_maps`:
instead of estimating coil sensitivity *maps* and inverting an image-
domain model, GRAPPA fits small per-coil k-space interpolation kernels
from a fully-sampled autocalibration (ACS) block and synthesizes the
missing phase-encode lines directly — no maps, no iterations.

Split mirroring :mod:`mrphy_tpu.utils.coils`'s policy: the one-off
*calibration solve* (:func:`grappa_weights`, a regularized linear
least-squares per undersampling offset) runs on the host in numpy
(complex is fine there); the *application* (:func:`grappa_apply`) is a
jittable jnp function — each missing line is a batched complex
contraction over (source lines × kx taps × coils), i.e. matmuls that
ride the MXU, so synthesis scales to full-resolution multi-slice data
on device.

Conventions: k-space arrays are `(nC, ny, nx, 2)` re/im (the package's
no-complex-dtypes rule), phase encodes along axis 1 (`ny`), acquired
rows ``ky ≡ 0 (mod R)``. The reference framework has no acquisition or
reconstruction stage at all (SURVEY §2); this module is part of the
beyond-reference recon stack.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ['grappa_weights', 'grappa_apply', 'sg_weights', 'sg_apply']


def _src_offsets(nsy: int, r: int, R: int) -> np.ndarray:
    r"""Absolute ky offsets of the ``nsy`` source lines bracketing a
    target at undersampling offset ``r``: the acquired rows at
    ``dy = (i − nsy//2 + 1)·R − r`` relative to the target (all
    ``≡ 0 mod R`` relative to the acquired grid), i.e. the nearest
    acquired lines below/above."""
    i = np.arange(nsy)
    return (i - nsy // 2 + 1) * R - r


def grappa_weights(calib, R: int, *, kernel: Tuple[int, int] = (4, 5),
                   lam: float = 1e-4):
    r"""Fit GRAPPA kernels from a fully-sampled ACS block.

    For each undersampling offset ``r ∈ 1..R−1`` solve the regularized
    least squares ``min ‖S·W − T‖² + λ‖W‖²`` where the rows of ``S``
    are all ACS source blocks (``nsy`` acquired lines × ``nsx`` kx taps
    × ``nC`` coils, complex) and ``T`` the corresponding target samples
    (all coils) — Tikhonov because real arrays are noisy and the
    source blocks are strongly correlated.

    Inputs:
        - ``calib``: `(nC, cy, cx, 2)` re/im fully-sampled ACS block.
        - ``R``: uniform undersampling factor along ky (axis 1).
    Optionals:
        - ``kernel``: `(nsy, nsx)` source lines × kx taps (literature
          default 4×5; nsx must be odd).
        - ``lam``: relative Tikhonov weight (scaled by the mean source
          energy).
    Outputs:
        - ``W``: `(R−1, nsy, nsx, nC, nC, 2)` re/im weights —
          ``W[r−1, i, j, c_src, c_tgt]`` — for :func:`grappa_apply`.
    """
    calib = np.asarray(calib)
    assert calib.ndim == 4 and calib.shape[-1] == 2, calib.shape
    nC, cy, cx = calib.shape[:3]
    nsy, nsx = int(kernel[0]), int(kernel[1])
    assert nsx % 2 == 1, f'nsx must be odd, got {nsx}'
    R = int(R)
    assert R >= 2, R
    C = calib[..., 0] + 1j * calib[..., 1]            # (nC, cy, cx)
    hx = nsx // 2
    offs_all = [_src_offsets(nsy, r, R) for r in range(1, R)]
    lo = min(o.min() for o in offs_all)
    hi = max(o.max() for o in offs_all)
    assert cy >= hi - lo + 1 and cx >= nsx, \
        f'ACS {cy}x{cx} too small for kernel {kernel} at R={R}'

    Ws = []
    for r in range(1, R):
        offs = offs_all[r - 1]
        # target rows t where every source row t+dy stays inside ACS
        t0, t1 = -int(offs.min()), cy - int(offs.max())
        ts = np.arange(t0, t1)
        xs = np.arange(hx, cx - hx)
        # S: (nt·nx, nsy·nsx·nC); T: (nt·nx, nC)
        S = np.stack([C[:, ts + dy][:, :, xs + dx]
                      for dy in offs for dx in range(-hx, hx + 1)],
                     axis=-1)                         # (nC, nt, nx, k)
        S = np.moveaxis(S, 0, -1).reshape(len(ts) * len(xs), -1)
        T = np.moveaxis(C[:, ts][:, :, xs], 0, -1).reshape(
            len(ts) * len(xs), nC)
        ShS = S.conj().T @ S
        reg = lam * (np.trace(ShS).real / max(ShS.shape[0], 1))
        W = np.linalg.solve(ShS + reg * np.eye(ShS.shape[0]),
                            S.conj().T @ T)           # (k·nC, nC)
        Ws.append(W.reshape(nsy, nsx, nC, nC))
    W = np.stack(Ws)                                  # (R-1,...)
    return np.stack([W.real, W.imag], -1)


def grappa_apply(ksp, W, R: int):
    r"""Synthesize the missing ky lines of a uniformly undersampled
    Cartesian k-space with fitted GRAPPA kernels (jittable; the
    per-line synthesis is a complex contraction over sources — MXU
    matmuls under jit).

    Inputs:
        - ``ksp``: `(nC, ny, nx, 2)` re/im, acquired rows
          ``ky ≡ 0 (mod R)`` filled, missing rows anything (ignored).
        - ``W``: weights from :func:`grappa_weights`.
        - ``R``: the same undersampling factor.
    Outputs:
        - ``ksp``: `(nC, ny, nx, 2)` with missing rows synthesized and
          acquired rows passed through unchanged. Rows whose source
          lines fall outside the array use zero padding (edge rows are
          best-effort, as standard).
    """
    ksp = jnp.asarray(ksp)
    W = jnp.asarray(W, ksp.dtype)
    nC, ny, nx = ksp.shape[:3]
    Rm1, nsy, nsx = W.shape[:3]
    assert nC == W.shape[3], (ksp.shape, W.shape)
    R = int(R)
    assert Rm1 == R - 1, (W.shape, R)
    hx = nsx // 2
    acq = ksp[:, ::R]                                 # (nC, ⌈ny/R⌉, nx, 2)
    # zero-pad acquired rows and kx edges once; taps become static
    # slices (fused adds under jit)
    acqp = jnp.pad(acq, ((0, 0), (nsy, nsy), (hx, hx), (0, 0)))

    out = ksp
    for r in range(1, R):
        offs = _src_offsets(nsy, r, R)
        # target rows t = r + k·R, k = 0..nt-1; source acquired-row
        # index for tap dy: (t + dy)/R = k + (dy + r)/R  (integer)
        nt = (ny - r + R - 1) // R
        acc_r = jnp.zeros((nt, nx, nC), ksp.dtype)
        acc_i = jnp.zeros((nt, nx, nC), ksp.dtype)
        for i, dy in enumerate(offs):
            krow = nsy + (int(dy) + r) // R           # + k (row pad)
            rows = acqp[:, krow:krow + nt]            # (nC, nt, nx+2hx, 2)
            for j in range(nsx):
                blk = rows[:, :, j:j + nx]            # (nC, nt, nx, 2)
                sr = jnp.moveaxis(blk[..., 0], 0, -1)  # (nt, nx, nC)
                si = jnp.moveaxis(blk[..., 1], 0, -1)
                wr = W[r - 1, i, j, :, :, 0]          # (nC_src, nC_tgt)
                wi = W[r - 1, i, j, :, :, 1]
                mm = lambda a, b: jnp.matmul(          # noqa: E731
                    a, b, precision='highest')
                acc_r = acc_r + mm(sr, wr) - mm(si, wi)
                acc_i = acc_i + mm(sr, wi) + mm(si, wr)
        synth = jnp.stack([jnp.moveaxis(acc_r, -1, 0),
                           jnp.moveaxis(acc_i, -1, 0)], -1)
        out = out.at[:, r::R].set(synth)
    return out


# ------------------------------------------------------------------
# Split-slice GRAPPA (simultaneous multislice)
# ------------------------------------------------------------------

def _caipi_ramp(ny: int, f: float) -> np.ndarray:
    r"""Complex ky phase ramp a slice acquires from CAIPIRINHA blips
    realizing a ``+f·FOV`` shift: under this package's encoding sign
    (``s = Σ w e^{−i2π k·x}``, :mod:`mrphy_tpu.ops.signal`) a blip
    pattern ``kz_m = m·f/z_s`` imprints ``e^{−i2π m f}`` on the slice
    at ``z_s`` — the NEGATIVE ramp on the centered line index ``m``
    (verified numerically against a rolled image's centered spectrum;
    ``f = s/nbands`` is the standard interslice pattern, ``f = 1/2``
    the self-conjugate alternating-sign FOV/2 shift)."""
    m = np.arange(ny) - ny // 2
    return np.exp(-2j * np.pi * m * float(f))


def sg_weights(calibs, *, kernel: Tuple[int, int] = (5, 5),
               lam: float = 1e-4, shifts=None):
    r"""Fit split-slice-GRAPPA kernels for simultaneous-multislice
    (SMS) separation [Cauley et al., MRM 72(1):93, 2014] from
    single-slice ACS data — the reconstruction counterpart of the SMS
    pulse designer (:func:`mrphy_tpu.design.sms_modulate`).

    Each slice ``s`` gets a kernel ``W_s`` mapping *collapsed*
    k-space patches to that slice's samples, fitted with explicit
    leakage blocking: the calibration stacks every single slice's
    patches as sources, with targets ``δ_{ts}·calib_s`` — slice ``t``'s
    own data must map to zero in every other slice's kernel, so
    inter-slice leakage is minimized by construction, not just in the
    collapsed sum (the "sp-sg" formulation; plain slice-GRAPPA fits
    only the sum and lets leakage hide inside it).

    Inputs:
        - ``calibs``: `(nsl, nC, cy, cx, 2)` re/im single-slice ACS
          blocks (same coils, same grid).
    Optionals:
        - ``kernel``: `(nky, nkx)` odd patch size (5×5 default).
        - ``lam``: relative Tikhonov weight.
        - ``shifts``: per-slice CAIPIRINHA FOV-fraction shifts (length
          ``nsl``; ``'auto'`` → the standard ``s/nsl`` pattern;
          ``None`` → no shift). The shift ramps are applied to the
          calibration here and removed by :func:`sg_apply` — pass the
          SAME value to both, and acquire the collapsed data with the
          matching blip pattern.
    Outputs:
        - ``W``: `(nsl, nky, nkx, nC, nC, 2)` re/im kernels.
    """
    calibs = np.asarray(calibs)
    assert calibs.ndim == 5 and calibs.shape[-1] == 2, calibs.shape
    nsl, nC, cy, cx = calibs.shape[:4]
    nky, nkx = int(kernel[0]), int(kernel[1])
    assert nky % 2 == 1 and nkx % 2 == 1, kernel
    assert cy >= nky and cx >= nkx, (calibs.shape, kernel)
    C = calibs[..., 0] + 1j * calibs[..., 1]          # (nsl, nC, cy, cx)
    if shifts is not None:
        fs = ([s / nsl for s in range(nsl)]
              if isinstance(shifts, str) and shifts == 'auto'
              else [float(f) for f in shifts])
        assert len(fs) == nsl, (fs, nsl)
        for s in range(nsl):
            C[s] *= _caipi_ramp(cy, fs[s])[None, :, None]
    hy, hx = nky // 2, nkx // 2
    ts = np.arange(hy, cy - hy)
    xs = np.arange(hx, cx - hx)

    # per-slice source matrices (shared across all target slices)
    Ss = []
    for t in range(nsl):
        S = np.stack([C[t][:, ts + dy][:, :, xs + dx]
                      for dy in range(-hy, hy + 1)
                      for dx in range(-hx, hx + 1)], -1)
        Ss.append(np.moveaxis(S, 0, -1).reshape(len(ts) * len(xs), -1))
    Sall = np.concatenate(Ss, 0)                      # (nsl·nt·nx, k·nC)
    ShS = Sall.conj().T @ Sall
    reg = lam * (np.trace(ShS).real / max(ShS.shape[0], 1))
    lhs = ShS + reg * np.eye(ShS.shape[0])

    Ws = []
    for s in range(nsl):
        T = np.zeros((Sall.shape[0], nC), complex)
        blk = len(ts) * len(xs)
        T[s * blk:(s + 1) * blk] = np.moveaxis(
            C[s][:, ts][:, :, xs], 0, -1).reshape(blk, nC)
        W = np.linalg.solve(lhs, Sall.conj().T @ T)   # (k·nC, nC)
        Ws.append(W.reshape(nky, nkx, nC, nC))
    W = np.stack(Ws)
    return np.stack([W.real, W.imag], -1)


def sg_apply(ksp, W, *, shifts=None):
    r"""Separate a collapsed SMS k-space into per-slice k-spaces with
    fitted split-slice-GRAPPA kernels (jittable; per-tap complex
    matmuls on the MXU, like :func:`grappa_apply`).

    Inputs:
        - ``ksp``: `(nC, ny, nx, 2)` re/im collapsed (summed-slices)
          k-space.
        - ``W``: kernels from :func:`sg_weights`.
    Optionals:
        - ``shifts``: the SAME per-slice CAIPIRINHA shifts passed to
          :func:`sg_weights` — the separation runs in the shifted
          frame and the ramps are removed here, so the returned
          slices are un-shifted.
    Outputs:
        - ``out``: `(nsl, nC, ny, nx, 2)` separated k-spaces.
    """
    ksp = jnp.asarray(ksp)
    W = jnp.asarray(W, ksp.dtype)
    nC, ny, nx = ksp.shape[:3]
    nsl, nky, nkx = W.shape[:3]
    assert nC == W.shape[3], (ksp.shape, W.shape)
    hy, hx = nky // 2, nkx // 2
    kp = jnp.pad(ksp, ((0, 0), (hy, hy), (hx, hx), (0, 0)))

    mm = lambda a, b: jnp.matmul(a, b, precision='highest')  # noqa: E731
    outs = []
    for s in range(nsl):
        acc_r = jnp.zeros((ny, nx, nC), ksp.dtype)
        acc_i = jnp.zeros((ny, nx, nC), ksp.dtype)
        for i in range(nky):
            for j in range(nkx):
                blk = kp[:, i:i + ny, j:j + nx]       # (nC, ny, nx, 2)
                sr = jnp.moveaxis(blk[..., 0], 0, -1)
                si = jnp.moveaxis(blk[..., 1], 0, -1)
                wr, wi = W[s, i, j, :, :, 0], W[s, i, j, :, :, 1]
                acc_r = acc_r + mm(sr, wr) - mm(si, wi)
                acc_i = acc_i + mm(sr, wi) + mm(si, wr)
        outs.append(jnp.stack([jnp.moveaxis(acc_r, -1, 0),
                               jnp.moveaxis(acc_i, -1, 0)], -1))
    out = jnp.stack(outs)                             # (nsl, nC, ny, nx, 2)
    if shifts is not None:
        nsl_ = out.shape[0]
        fs = ([s / nsl_ for s in range(nsl_)]
              if isinstance(shifts, str) and shifts == 'auto'
              else [float(f) for f in shifts])
        ramps = np.stack([_caipi_ramp(ny, -f) for f in fs])  # undo
        rr = jnp.asarray(ramps.real, ksp.dtype)[:, None, :, None]
        ri = jnp.asarray(ramps.imag, ksp.dtype)[:, None, :, None]
        orr, oii = out[..., 0], out[..., 1]
        out = jnp.stack([orr * rr - oii * ri,
                         orr * ri + oii * rr], -1)
    return out
