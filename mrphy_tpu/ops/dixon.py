r"""Dixon / IDEAL water–fat separation from multi-echo data.

Chemical-species separation [Reeder et al., MRM 51(1):35, 2004
(IDEAL); Dixon, Radiology 153(1):189, 1984]: from ``L`` echoes of the
same voxel at times ``TE_l``, jointly estimate complex water ``W``,
complex fat ``F`` (with a known multi-peak spectrum), and the B0
field-map offset ``ψ`` (Hz) per voxel:

``s_l = (W + F·c_l)·e^{−i2π ψ TE_l}``,  ``c_l = Σ_p a_p e^{−i2π f_p TE_l}``

The ``e^{−i2π·}`` sign matches this package's off-resonance convention
(positive ``df`` dephases clockwise — :func:`mrphy_tpu.ops.slowsims.
freeprec`; the cross-validation test synthesizes echoes with the Bloch
free-precession engine and recovers the species exactly).

TPU-native design: everything is real re/im-pair arithmetic (complex
dtypes are unsupported on this runtime), fully jittable and batched —
the per-voxel work is a (2L × 5) Gauss–Newton Jacobian assembled in
registers and a batched 5×5 ``jnp.linalg.solve``, embarrassingly
voxel-parallel (vmap/shard over leading axes like the other qMRI
fits). The reference framework has no fitting stage at all
(SURVEY §2); this is part of the beyond-reference qMRI stack.

Field-map ambiguity: the model is periodic in ``ψ`` with period
``1/ΔTE`` — Gauss–Newton converges to the basin of ``psi0`` (pass a
smoothed initial map for region-growing-style initialization; the
default 0 is fine when |ψ| < 1/(2·max ΔTE)).
"""

from typing import Sequence

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['dixon_cl', 'dixon_ideal', 'FAT_HZ_3T', 'FAT_AMPS']

# 6-peak liver fat spectrum [Hamilton et al., NMR Biomed 24(7):784,
# 2011], shifts in Hz AT 3 T (−ppm·γ·B0 with water at 0; the main
# methylene peak is ≈ −434 Hz), relative amplitudes normalized to 1.
FAT_HZ_3T = (-434.0, -332.0, -486.0, -63.0, 37.0, -243.0)
FAT_AMPS = (0.693, 0.128, 0.087, 0.048, 0.039, 0.004)


def dixon_cl(TE, fat_df: Sequence[float] = FAT_HZ_3T,
             fat_amp: Sequence[float] = FAT_AMPS):
    r"""Complex fat dephasing coefficients ``c_l`` at the echo times.

    Inputs:
        - ``TE``: `(L,)`, "Sec".
    Optionals:
        - ``fat_df``: fat peak offsets, "Hz" (default: 6-peak liver
          spectrum at 3 T).
        - ``fat_amp``: relative amplitudes (same length).
    Outputs:
        - ``c``: `(L, 2)` re/im.
    """
    TE = jnp.asarray(TE)
    f = jnp.asarray(fat_df, TE.dtype)
    a = jnp.asarray(fat_amp, TE.dtype)
    a = a / a.sum()
    ang = -2.0 * jnp.pi * TE[:, None] * f[None]
    return jnp.stack([(a * jnp.cos(ang)).sum(-1),
                      (a * jnp.sin(ang)).sum(-1)], -1)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def dixon_ideal(s, TE, *, fat_df: Sequence[float] = FAT_HZ_3T,
                fat_amp: Sequence[float] = FAT_AMPS, psi0=None,
                iters: int = 12, damp: float = 1e-9):
    r"""IDEAL water–fat–fieldmap estimation (batched Gauss–Newton).

    Inputs:
        - ``s``: `(..., L, 2)` re/im echoes (any leading voxel axes).
        - ``TE``: `(L,)`, "Sec" — needs ``L ≥ 3`` for the 5 real
          unknowns.
    Optionals:
        - ``fat_df``/``fat_amp``: fat spectrum (see :func:`dixon_cl`).
        - ``psi0``: `(...)` "Hz" initial field map (default 0).
        - ``iters``: Gauss–Newton iterations (quadratic convergence;
          12 is far past f32 tolerance at SNR > 10).
        - ``damp``: relative Levenberg damping on the 5×5 normal
          matrix (keeps pure-noise voxels finite).
    Outputs: dict with
        - ``W``/``F``: `(..., 2)` re/im species amplitudes,
        - ``psi``: `(...)` "Hz" field map,
        - ``res``: `(...)` RMS model residual (quality map).
    """
    s = jnp.asarray(s)
    TE = jnp.asarray(TE, s.dtype)
    L = TE.shape[0]
    assert s.shape[-2:] == (L, 2), (s.shape, L)
    assert L >= 3, f'need >= 3 echoes, got {L}'
    c = dixon_cl(TE, fat_df, fat_amp).astype(s.dtype)  # (L, 2)
    batch = s.shape[:-2]
    psi = (jnp.zeros(batch, s.dtype) if psi0 is None
           else jnp.broadcast_to(jnp.asarray(psi0, s.dtype), batch))
    W = jnp.zeros(batch + (2,), s.dtype)
    F = jnp.zeros(batch + (2,), s.dtype)
    twopiTE = 2.0 * jnp.pi * TE                        # (L,)

    def model(W, F, psi):
        # e_l = e^{−i2πψTE_l}; m_l = (W + F c_l)·e_l
        th = twopiTE * psi[..., None]                  # (..., L)
        er, ei = jnp.cos(th), -jnp.sin(th)
        fr, fi = _cmul(F[..., :1], F[..., 1:], c[..., 0], c[..., 1])
        ur, ui = W[..., :1] + fr, W[..., 1:] + fi
        mr, mi = _cmul(ur, ui, er, ei)
        return er, ei, mr, mi

    def gn_step(_, state):
        W, F, psi = state
        er, ei, mr, mi = model(W, F, psi)
        b2r, b2i = _cmul(c[..., 0], c[..., 1], er, ei)  # e·c
        # J columns (complex as stacked re/im rows): Wr→e, Wi→ie,
        # Fr→ec, Fi→iec, ψ→−i2πTE·m
        Jr = jnp.stack([er, -ei, b2r, -b2i, twopiTE * mi], -1)
        Ji = jnp.stack([ei, er, b2i, b2r, -twopiTE * mr], -1)
        J = jnp.concatenate([Jr, Ji], -2)              # (..., 2L, 5)
        r = jnp.concatenate([s[..., 0] - mr, s[..., 1] - mi], -1)
        JtJ = jnp.einsum('...lk,...lm->...km', J, J,
                         precision='highest')
        Jtr = jnp.einsum('...lk,...l->...k', J, r,
                         precision='highest')
        tr = jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None, None]
        lhs = JtJ + (damp * tr / 5.0 + 1e-30) * jnp.eye(5, dtype=s.dtype)
        d = jnp.linalg.solve(lhs, Jtr[..., None])[..., 0]
        W = W + d[..., 0:2]
        F = F + d[..., 2:4]
        psi = psi + d[..., 4]
        return W, F, psi

    W, F, psi = lax.fori_loop(0, int(iters), gn_step, (W, F, psi))
    _, _, mr, mi = model(W, F, psi)
    res = jnp.sqrt(((s[..., 0] - mr) ** 2
                    + (s[..., 1] - mi) ** 2).mean(-1))
    return {'W': W, 'F': F, 'psi': psi, 'res': res}
