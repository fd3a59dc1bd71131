r"""Quantitative susceptibility mapping (QSM), end to end.

The susceptibility chain on top of the dipole forward model
(:mod:`mrphy_tpu.ops.field`):

1. **Phantom**: a 3-D χ distribution (ppm) — a paramagnetic sphere
   ("hemorrhage"), a vein-like cylinder ∥ B0, and a diamagnetic
   cylinder ⊥ B0.
2. **Physics**: the induced relative shift ``δ = chi2field(χ)`` and
   the off-resonance map ``Δf = δ · f0`` (Hz at 3 T) — the same map
   the rest of the framework consumes (``SpinArray.df``, NUFFT time
   segmentation, ``examples/fieldmap_recon.py``).
3. **Measurement**: multi-echo GRE phase ``φ(TE) = 2π Δf TE`` with
   receiver noise; the field map is re-estimated by least squares
   over echoes (the scanner's phase-difference fit).
4. **Inversion, two tiers**:
   (a) thresholded k-space division
   (:func:`mrphy_tpu.ops.field.field2chi_tkd`) — closed-form, one
   k-space divide, with the method's known cone-mode underestimation
   of compact structures;
   (b) **TV-regularized dipole inversion** — Adam through the
   *differentiable* forward (``min ‖chi2field(χ̂) − δ‖² + λ·TV(χ̂)``,
   one jitted ``lax.scan``, TKD as the initializer). The spatial
   prior fills in the magic-angle cone the data cannot constrain:
   measured here, it roughly halves the χ RMSE vs TKD and pulls the
   sphere's recovered mean from ~70 % to ~80 % of truth.

Asserts: per-structure interior means within tolerance for the TV
tier, field-map refit RMSE, and TV beating TKD on whole-volume RMSE.

Run:
    python examples/qsm.py [--n 48] [--noise 0.02] [--iters 400]
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
    ap.add_argument('--iters', type=int, default=400,
                    help='TV-inversion Adam iterations')
    ap.add_argument('--lam', type=float, default=1e-4,
                    help='TV weight')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops.field import (dipole_kernel, chi2field,
                                     field2chi_tkd)

    rng = np.random.default_rng(0)
    n = args.n
    f0 = 127.74e6 * 1e-6        # Hz per ppm at 3 T (γ̄·B0 · 1e-6)
    rdt = jnp.zeros(()).dtype   # x64 when enabled, f32 otherwise

    ax = np.arange(n) - n // 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')

    # χ in ppm: sphere (+0.4), vein ∥ B0 (+0.3), cylinder ⊥ B0 (−0.2)
    chi = np.zeros((n, n, n))
    sph = (x + n // 6) ** 2 + (y + n // 6) ** 2 + z ** 2 <= (n // 8) ** 2
    vein = (x - n // 5) ** 2 + (y - n // 5) ** 2 <= (n // 10) ** 2
    cylx = (y + n // 4) ** 2 + z ** 2 <= (n // 10) ** 2
    chi[sph] += 0.4
    chi[vein] += 0.3
    chi[cylx] -= 0.2

    # physics: δ (ppm) → Δf (Hz)
    delta = np.asarray(chi2field(jnp.asarray(chi, rdt)))
    df_hz = f0 * delta

    # multi-echo GRE phase + LS field-map refit (φ = 2π Δf TE + noise)
    TE = np.asarray([4e-3, 9e-3, 14e-3, 19e-3])
    phase = 2 * np.pi * df_hz[..., None] * TE
    phase += args.noise * rng.standard_normal(phase.shape)
    df_fit = phase @ TE / (2 * np.pi * (TE ** 2).sum())
    df_rmse = float(np.sqrt(np.mean((df_fit - df_hz) ** 2)))

    # tier (a): TKD
    dmeas = jnp.asarray(df_fit / f0, rdt)
    D = dipole_kernel((n, n, n), dtype=rdt)
    chi_tkd = field2chi_tkd(dmeas, thresh=0.1, D=D)

    # tier (b): TV-regularized inversion through the differentiable
    # forward, TKD-initialized, one jitted scan
    eps = 1e-6

    def tv(c):
        gs = [jnp.diff(c, axis=a, append=c.take(jnp.array([0]), axis=a))
              for a in range(3)]
        return jnp.sum(jnp.sqrt(sum(g ** 2 for g in gs) + eps))

    def loss_fn(c):
        r = chi2field(c, D=D) - dmeas
        return jnp.sum(r * r) + args.lam * tv(c)

    opt = qsm_opt = optax.adam(3e-2)

    @jax.jit
    def fit(c):
        st = qsm_opt.init(c)

        def body(carry, _):
            c, st = carry
            val, g = jax.value_and_grad(loss_fn)(c)
            upd, st = opt.update(g, st)
            return (c + upd, st), val

        (c, _), ls = jax.lax.scan(body, (c, st), None, length=args.iters)
        return c, ls

    chi_tv, losses = fit(chi_tkd)
    chi_tkd, chi_tv = np.asarray(chi_tkd), np.asarray(chi_tv)

    def interior(mask, *, erode=2):
        m = mask.copy()
        for _ in range(erode):
            m = (m & np.roll(m, 1, 0) & np.roll(m, -1, 0)
                 & np.roll(m, 1, 1) & np.roll(m, -1, 1)
                 & np.roll(m, 1, 2) & np.roll(m, -1, 2))
        return m

    rmse_tkd = float(np.sqrt(np.mean((chi_tkd - chi) ** 2)))
    rmse_tv = float(np.sqrt(np.mean((chi_tv - chi) ** 2)))
    print(f'  field-map refit RMSE = {df_rmse:.3f} Hz '
          f'(noise {args.noise} rad over {len(TE)} echoes)')
    print(f'  TV loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f} '
          f'({args.iters} iters)')
    errs = {}
    for name, mask, want in (('sphere', sph, 0.4), ('vein pB0', vein, 0.3),
                             ('cyl xB0', cylx, -0.2)):
        m = interior(mask)
        a, b = float(chi_tkd[m].mean()), float(chi_tv[m].mean())
        errs[name] = abs(b - want)
        print(f'  {name:9s} chi = {want:+.3f} ppm   TKD {a:+.3f}   '
              f'TV {b:+.3f}')
    print(f'  chi RMSE: TKD {rmse_tkd:.4f}  TV {rmse_tv:.4f} ppm')

    assert df_rmse < 1.0, df_rmse
    assert errs['vein pB0'] < 0.03, errs
    # the eroded interior of an n//8-radius sphere is partial-volume
    # dominated below ~n=40, so the bound scales with the grid
    assert errs['sphere'] < (0.12 if n >= 40 else 0.16), errs
    assert errs['cyl xB0'] < 0.09, errs
    assert rmse_tv < 0.7 * rmse_tkd, (rmse_tv, rmse_tkd)
    print('qsm: OK')


if __name__ == '__main__':
    main()
