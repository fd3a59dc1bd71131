r"""Small-tip-angle (STA) linear pulse design — the spatial-domain method.

For small flip angles the Bloch equation linearizes: the transverse
magnetization excited by multi-coil RF ``rf_c(t)`` played along a
gradient trajectory is

    m_xy(r) ≈ i γ2π dt M0 Σ_c s_c(r) Σ_t rf_c(t)
              · exp(i 2π [k(t)·r + Δf(r)(t_t − T)])

with ``k(t)`` the (Tx, ends-at-origin) excitation k-space of the
gradients — a LINEAR system ``A rf = m`` (Pauly et al., JMR 81:43,
1989; Grissom et al., MRM 56:620, 2006). Solving its Tikhonov-
regularized least squares gives the classic fast designer, and the
standard warm start for the nonlinear joint loop
(:func:`mrphy_tpu.design.design_pulse`) which then handles large tips,
relaxation, and hardware constraints.

TPU mapping: the system is evaluated as ``(nM, nT) × (nT, nC)``
matmuls over cos/sin phasor planes (complex carried as real/imag pairs
— complex dtypes are unsupported on this runtime) — MXU work, unlike
the VPU-bound simulators. The adjoint ``A^H`` is obtained by
``jax.vjp`` of the forward map: the real-split transpose IS the
complex conjugate-transpose for the Re⟨·,·⟩ inner product, so the
normal equations solved by CG are exactly the complex ones. Everything
jits; the phasor planes are (nM, nT) f32 — chunk ``nM`` upstream if
that exceeds memory.

The reference framework has no linear designer (its README's design
recipe starts from hand-built waveforms); this module is part of the
production design stack.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu.utils.conversions import g2k

__all__ = ['sta_design', 'sta_forward']

_HI = jax.lax.Precision.HIGHEST


def _phasors(loc_, gr, df_, gam, dt):
    r"""cos/sin of the STA phase, per batch: `(N, nM, nT)` each.

    Midpoint convention: the phase at step t counts HALF of step t's
    own z-rotation (``k − γ·dt·g/2``; likewise −dt/2 on the Δf clock).
    This is both the continuum midpoint rule and what matches the
    discrete simulator, whose step-t rotation acts on the RF deposited
    within it: measured against ``sims.blochsim_rfgr`` it cuts the
    prediction error 16× (3.5% → 0.22% of sin(flip) on the 2D-spiral
    test), leaving only the genuine O(flip²) small-tip error."""
    k = g2k(gr, True, dt, gam=gam)                   # (N, 3, nT) cycle/cm
    k = k - 0.5 * gam * dt * gr
    phase = jnp.einsum('nmx,nxt->nmt', loc_, k, precision=_HI)
    if df_ is not None:
        nT = gr.shape[-1]
        t = (jnp.arange(nT, dtype=loc_.dtype) - nT + 0.5) * dt
        phase = phase + df_[..., None] * t           # Δf(r)·(t−T), cycles
    phase = 2 * pi * phase
    return jnp.cos(phase), jnp.sin(phase)


def sta_forward(rf, loc_, gr, *, b1Map_=None, df_=None, gam=gamH,
                dt=dt0, M0: float = 1.0) -> jax.Array:
    r"""Apply the STA system: RF → predicted transverse magnetization.

    Inputs:
        - ``rf``: `(N, xy, nT, nCoils)`, "Gauss".
        - ``loc_``: `(N, nM, xyz)`, "cm".
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm".
    Optionals:
        - ``b1Map_``: `(N, nM, xy, nCoils)`, coil sensitivities.
        - ``df_``: `(N, nM)`, "Hz", off-resonance.
        - ``gam``/``dt``/``M0``: "Hz/Gauss" / "Sec" / initial Mz.
    Outputs:
        - ``m``: `(N, nM, 2)` — (Re, Im) of the predicted m_xy.
    """
    rf = jnp.asarray(rf)
    if rf.ndim == 3:
        rf = rf[..., None]
    Pc, Ps = _phasors(loc_, gr, df_, gam, dt)
    a, b = rf[:, 0], rf[:, 1]                        # (N, nT, nC)
    # z_c(r) = Σ_t rf_c(t)·e^{iφ(r,t)}
    zr = (jnp.einsum('nmt,ntc->nmc', Pc, a, precision=_HI)
          - jnp.einsum('nmt,ntc->nmc', Ps, b, precision=_HI))
    zi = (jnp.einsum('nmt,ntc->nmc', Ps, a, precision=_HI)
          + jnp.einsum('nmt,ntc->nmc', Pc, b, precision=_HI))
    if b1Map_ is not None:
        sr, si = b1Map_[:, :, 0], b1Map_[:, :, 1]    # (N, nM, nC)
        mr = jnp.sum(sr * zr - si * zi, -1)
        mi = jnp.sum(sr * zi + si * zr, -1)
    else:
        mr, mi = jnp.sum(zr, -1), jnp.sum(zi, -1)
    scale = jnp.asarray(gam, mr.dtype) * 2 * pi * dt * M0
    # i·(mr + i·mi) = −mi + i·mr
    return jnp.stack([-scale * mi, scale * mr], -1)


@functools.partial(jax.jit, static_argnames=('niter', 'nC'))
def _sta_solve(loc_, gr, target_, b1Map_, df_, w_, gam, dt, M0, lam,
               niter: int, nC: int):
    N, nT = gr.shape[0], gr.shape[-1]
    dtype = target_.dtype

    def A(rf):
        return sta_forward(rf, loc_, gr, b1Map_=b1Map_, df_=df_,
                           gam=gam, dt=dt, M0=M0)

    rf0 = jnp.zeros((N, 2, nT, nC), dtype)
    _, AT = jax.vjp(A, rf0)                          # linear ⇒ exact A^T
    w = (jnp.ones_like(target_[..., 0]) if w_ is None else w_)[..., None]

    def AHWA(x):
        return AT(w * A(x))[0] + lam * x

    b = AT(w * target_)[0]

    # plain CG on the (SPD) normal equations, fixed iteration count
    def body(carry, _):
        x, r, p, rs = carry
        Ap = AHWA(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (x, r, p, rs_new), jnp.sqrt(rs_new)
    r0 = b
    (rf, *_), resnorms = jax.lax.scan(
        body, (rf0, r0, r0, jnp.vdot(r0, r0)), None, length=niter)
    return rf, resnorms


def sta_design(loc_, gr, target_, *, b1Map_=None, df_=None, w_=None,
               gam=gamH, dt=dt0, M0: float = 1.0, lam: float = 1e-5,
               niter: int = 30) -> Tuple[jax.Array, jax.Array]:
    r"""Tikhonov-regularized STA least-squares RF design.

    Solves ``min_rf ‖√w (A rf − target)‖² + lam·‖rf‖²`` by conjugate
    gradients on the normal equations (``A`` = :func:`sta_forward`).

    Inputs:
        - ``loc_``: `(N, nM, xyz)`, "cm".
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm" — the (fixed) gradient
          trajectory to design through.
        - ``target_``: `(N, nM, 2)` — desired (Re, Im) m_xy, e.g.
          ``sin(flip)·(cos ϕ, sin ϕ)``.
    Optionals:
        - ``b1Map_``: `(N, nM, xy, nCoils)`; absent ⇒ one uniform coil.
        - ``df_``: `(N, nM)`, "Hz".
        - ``w_``: `(N, nM)`, per-spin weights (0 = don't-care).
        - ``lam``: Tikhonov weight (RF power regularization). Do not
          shrink it toward 0 in f32: the system has a large near-null
          space, and unregularized f32 CG returns a fitting but
          large-norm RF whose bigger intermediate tips break the
          small-tip regime (measured on-chip: lam 1e-7 → 44× the RF
          norm and 10× the Bloch-sim deviation of lam 1e-5).
        - ``niter``: CG iterations.
    Outputs:
        - ``(rf, resnorms)``: `(N, xy, nT, nCoils)` designed RF and the
          per-iteration CG residual norms.

    Typical use: warm-start the nonlinear loop —
    ``design_pulse(cube, Pulse(rf=sta_rf, gr=gr), ...)``.
    """
    loc_ = jnp.asarray(loc_)
    gr = jnp.asarray(gr)
    target_ = jnp.asarray(target_)
    nC = 1 if b1Map_ is None else jnp.asarray(b1Map_).shape[-1]
    return _sta_solve(loc_, gr, target_,
                      None if b1Map_ is None else jnp.asarray(b1Map_),
                      None if df_ is None else jnp.asarray(df_),
                      None if w_ is None else jnp.asarray(w_),
                      jnp.asarray(gam, target_.dtype),
                      jnp.asarray(dt, target_.dtype),
                      float(M0), float(lam), int(niter), int(nC))
