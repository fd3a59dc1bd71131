r"""Quantitative susceptibility mapping (QSM) — the full clinical chain.

Every stage of a real QSM pipeline, on the dipole model family
(:mod:`mrphy_tpu.ops.field`):

1. **Phantom**: a "brain" mask containing a paramagnetic sphere
   ("microbleed", +0.4 ppm) and a vein ∥ B0 (+0.3 ppm), plus a strong
   air inclusion OUTSIDE the mask (the skull/sinus background source).
2. **Physics**: ``δ = chi2field(χ)``; ``Δf = δ·f0`` (Hz at 3 T) — the
   same off-resonance maps the rest of the framework consumes.
3. **Measurement**: multi-echo GRE phase, WRAPPED to (−π, π] + noise
   (2.3 % of in-mask voxels are aliased at the last echo).
4. **Unwrapping**: the short anchor echo is unwrapped spatially
   (:func:`mrphy_tpu.ops.field.unwrap_phase` — Picard-iterated
   Laplacian/DCT, all MXU matmuls); later echoes by temporal
   congruence against the anchor's linear prediction (exact wherever
   the prediction is within π — the multi-echo standard).
5. **Field fit**: least-squares echo slope → Δf̂ (≈0.15 Hz RMSE).
6. **Background removal**: :func:`mrphy_tpu.ops.field.sharp_background`
   (SMV/SHARP) separates the external source's harmonic field from
   the internal ("local") field on an eroded mask.
7. **Inversion**: TKD (closed form) and
   :func:`mrphy_tpu.ops.field.field2chi_tv` — TV-regularized Adam
   through the differentiable forward; the spatial prior fills the
   magic-angle cone (~2.8× lower in-mask χ RMSE than TKD here).

Asserts: in-mask unwrap exactness (to noise), field-map RMSE,
per-structure recovered means, and TV beating TKD on in-mask RMSE.

Run:
    python examples/qsm.py [--n 48] [--noise 0.02] [--iters 300]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=48, help='grid side')
    ap.add_argument('--noise', type=float, default=0.02,
                    help='phase noise std (rad) per echo')
    ap.add_argument('--iters', type=int, default=300,
                    help='TV-inversion Adam iterations')
    ap.add_argument('--lam', type=float, default=1e-4, help='TV weight')
    args = ap.parse_args()

    import jax.numpy as jnp
    from mrphy_tpu.ops.field import (chi2field, field2chi_tkd,
                                     field2chi_tv, unwrap_phase,
                                     sharp_background)

    rng = np.random.default_rng(0)
    n = args.n
    f0 = 127.74e6 * 1e-6            # Hz per ppm at 3 T
    rdt = jnp.zeros(()).dtype       # x64 when enabled

    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
    mask = x ** 2 + y ** 2 + z ** 2 <= (0.42 * n) ** 2

    chi = np.zeros((n, n, n))
    sph = (x + n // 8) ** 2 + (y + n // 8) ** 2 + z ** 2 <= (n // 10) ** 2
    vein = (x - n // 7) ** 2 + (y - n // 7) ** 2 <= (n // 12) ** 2
    vein &= mask
    chi[sph] += 0.4
    chi[vein] += 0.3
    air = x ** 2 + (y + n // 2 - 1) ** 2 + z ** 2 <= (n // 8) ** 2
    chi_bg = np.where(air & ~mask, 4.0, 0.0)        # external source

    df = f0 * np.asarray(chi2field(jnp.asarray(chi + chi_bg, rdt)))
    TE = np.asarray([5e-3, 15e-3, 25e-3])
    ph_true = 2 * np.pi * df[..., None] * TE
    psi = np.angle(np.exp(1j * (
        ph_true + args.noise * rng.standard_normal(ph_true.shape))))
    wfrac = float((np.abs(ph_true[..., -1][mask]) > np.pi).mean())

    # anchor echo spatially; later echoes by temporal congruence
    u0 = np.asarray(unwrap_phase(jnp.asarray(psi[..., 0], rdt), niter=4))
    U = [u0]
    for e in range(1, len(TE)):
        pred = u0 * (TE[e] / TE[0])
        U.append(psi[..., e]
                 + 2 * np.pi * np.round((pred - psi[..., e])
                                        / (2 * np.pi)))
    u = np.stack(U, -1)
    uw_err = []
    for e in range(len(TE)):
        d = (u[..., e] - ph_true[..., e])[mask]
        k = np.round(np.median(d) / (2 * np.pi))
        uw_err.append(float(np.abs(d - 2 * np.pi * k).max()))

    u = u - u.mean(axis=(0, 1, 2), keepdims=True)
    df_fit = (u @ TE) / (2 * np.pi * (TE ** 2).sum())
    df_rmse = float(np.sqrt(np.mean(
        ((df_fit - (df - df.mean()))[mask]) ** 2)))

    f_loc, m_er = sharp_background(jnp.asarray(df_fit / f0, rdt), mask,
                                   radius=4.0)
    f_true_loc = np.asarray(chi2field(jnp.asarray(chi, rdt)))
    a = np.asarray(f_loc)[m_er]
    b = f_true_loc[m_er]
    sharp_rel = float(np.linalg.norm((a - a.mean()) - (b - b.mean()))
                      / np.linalg.norm(b - b.mean()))

    chi_tkd = np.asarray(field2chi_tkd(f_loc, thresh=0.1))
    chi_tv = np.asarray(field2chi_tv(f_loc, iters=args.iters,
                                     lam=args.lam, mask=m_er))

    def interior(m0, erode=2):
        m = m0.copy()
        for _ in range(erode):
            m = (m & np.roll(m, 1, 0) & np.roll(m, -1, 0)
                 & np.roll(m, 1, 1) & np.roll(m, -1, 1)
                 & np.roll(m, 1, 2) & np.roll(m, -1, 2))
        return m

    print(f'  wrapped in-mask voxels at TE{len(TE)}: {wfrac:.1%};  '
          f'unwrap in-mask max err per echo: '
          f'{[round(e, 3) for e in uw_err]} rad')
    print(f'  field-map RMSE (in mask) = {df_rmse:.3f} Hz;  '
          f'SHARP local-field rel err = {sharp_rel:.2%}')
    errs = {}
    for name, m0, want in (('sphere', sph, 0.4), ('vein', vein, 0.3)):
        mm = interior(m0) & m_er
        a_, b_ = float(chi_tkd[mm].mean()), float(chi_tv[mm].mean())
        errs[name] = abs(b_ - want)
        print(f'  {name:7s} chi = {want:+.3f} ppm   TKD {a_:+.3f}   '
              f'TV {b_:+.3f}')
    r_tkd = float(np.sqrt(np.mean(((chi_tkd - chi)[m_er]) ** 2)))
    r_tv = float(np.sqrt(np.mean(((chi_tv - chi)[m_er]) ** 2)))
    print(f'  in-mask chi RMSE: TKD {r_tkd:.4f}  TV {r_tv:.4f} ppm')

    # noise-floor-scaled unwrap bound; physics bounds scale w/ grid
    assert max(uw_err) < max(0.2, 6 * args.noise), uw_err
    assert df_rmse < 1.0, df_rmse
    assert sharp_rel < (0.12 if n >= 40 else 0.30), sharp_rel
    assert errs['sphere'] < (0.06 if n >= 40 else 0.16), errs
    assert errs['vein'] < (0.06 if n >= 40 else 0.16), errs
    assert r_tv < 0.7 * r_tkd, (r_tv, r_tkd)
    print('qsm: OK')


if __name__ == '__main__':
    main()
