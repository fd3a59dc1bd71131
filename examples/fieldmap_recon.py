r"""Field-map estimation → off-resonance-corrected reconstruction.

The full quantitative chain the scanner runs every day, end to end in
one differentiable framework:

1. **Calibration scan**: simulate a multi-echo GRE of a phantom with a
   smooth ground-truth off-resonance bowl and T2* decay — each echo is
   one :func:`mrphy_tpu.ops.slowsims.freeprec` (closed-form relaxation
   + precession, the autodiff oracle engine), plus receiver noise.
2. **Per-voxel fitting**: recover complex ``ρ``, ``Δf``, and ``R2*``
   maps. Initialize in closed form (phase-difference field map, echo
   spacing chosen inside the unambiguous band ``|Δf| < 1/(2ΔTE)``;
   log-magnitude slope for R2*), then polish ALL voxels jointly with
   Adam through the exact echo model — one jitted ``lax.scan``, the
   same pattern as ``examples/qmri_fit.py``.
3. **Accelerated scan**: acquire a long single-shot spiral readout of
   the same object through the exact encoding operator
   (:func:`mrphy_tpu.ops.signal.signal`) — 30+ ms of readout, so the
   off-resonance bowl badly blurs an uncorrected reconstruction.
4. **Corrected recon**: CG through the gridding NUFFT
   (:mod:`mrphy_tpu.ops.nufft`) with the *fitted* Δf/T2* maps driving
   hat time segmentation — and, for contrast, with zero maps.

Asserts: Δf RMSE well under the noise-driven CRLB ballpark (< 0.5 Hz
at the default SNR), R2* within 3%, and the corrected recon beats the
uncorrected one by a large factor while landing within a few % of the
truth.

Usage::

    python examples/fieldmap_recon.py [--n 24] [--iters 300]
                                      [--noise 0.5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=24, help='grid size')
    ap.add_argument('--fov', type=float, default=24.0, help='cm')
    ap.add_argument('--ne', type=int, default=6, help='echoes')
    ap.add_argument('--dte', type=float, default=2e-3,
                    help='echo spacing, s (unambiguous |df| < 1/2ΔTE)')
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--lr', type=float, default=0.02)
    ap.add_argument('--noise', type=float, default=0.5,
                    help='echo noise std, percent of peak |s|')
    ap.add_argument('--cg', type=int, default=25)
    ap.add_argument('--shim', action='store_true',
                    help='after mapping, null the smooth field with a '
                         '2nd-order spherical-harmonic shim '
                         '(mrphy_tpu.utils.shim), REACQUIRE on the '
                         'shimmed field, and reconstruct with the '
                         'fitted residual map')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import nufft as nf
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.ops import slowsims
    from mrphy_tpu.utils import spiral2d, g2k

    n, fov, f32 = args.n, args.fov, jnp.float32
    nM = n * n

    # ---- object: disk phantom, off-resonance bowl, T2* map ----
    ax = (np.arange(n) - n // 2) / n * fov
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    # deliberately ANISOTROPIC phantom + field: a symmetric scene
    # masked a k-axis transposition bug once — never again
    r2n = (1.3 * xx ** 2 + 0.8 * yy ** 2) / (fov / 2) ** 2
    rho = np.where(r2n < 0.64, 1.0 - 0.4 * r2n, 0.0)    # support mask
    df_true = 90.0 * (r2n / 0.32 - 1.0) + 15.0 * xx / (fov / 2)
    t2s_true = 0.025 + 0.02 * (1 - np.minimum(r2n, 1))  # 25..45 ms
    sup = rho.reshape(-1) > 0
    dfs = df_true.reshape(-1)[sup]
    print(f'{n}x{n} object, {sup.sum()} voxels in support, '
          f'df in [{dfs.min():.0f}, {dfs.max():.0f}] Hz')

    dfv = jnp.asarray(df_true.reshape(1, nM), f32)
    t2v = jnp.asarray(t2s_true.reshape(1, nM), f32)
    M0 = jnp.asarray(np.stack([rho.reshape(-1), 0 * sup, 0 * sup],
                              -1)[None], f32)           # (1, nM, 3)

    # ---- 1. multi-echo GRE through the oracle engine ----
    TE = args.dte * (1 + jnp.arange(args.ne, dtype=f32))
    echoes = jnp.stack([slowsims.freeprec(
        M0, te, T1=jnp.asarray(1.0, f32), T2=t2v, df=dfv)[0, :, :2]
        for te in TE])                                  # (nE, nM, 2)
    rng = np.random.default_rng(0)
    sigma = args.noise / 100 * float(jnp.abs(echoes).max())
    echoes = echoes + sigma * jnp.asarray(
        rng.standard_normal(echoes.shape), f32)
    print(f'{args.ne} echoes, TE {float(TE[0])*1e3:.0f}..'
          f'{float(TE[-1])*1e3:.0f} ms, noise sigma {sigma:.1e}')

    # ---- 2. per-voxel fit: closed-form init + joint Adam polish ----
    ec = np.asarray(echoes[..., 0] + 1j * echoes[..., 1])  # (nE, nM)
    # phase-difference field map (freeprec: positive df -> phase -2πft)
    ratio = (ec[1:] * np.conj(ec[:-1])).sum(0)
    df0 = -np.angle(ratio) / (2 * np.pi * args.dte)
    # log-magnitude slope for R2* (guard empty voxels)
    logm = np.log(np.maximum(np.abs(ec), 1e-12))
    ted = np.asarray(TE) - np.asarray(TE).mean()
    r20 = -(ted[:, None] * (logm - logm.mean(0))).sum(0) \
        / (ted ** 2).sum()
    r20 = np.clip(r20, 1.0, 200.0)
    # demodulated DC estimate for complex rho
    dem = ec * np.exp((r20 + 2j * np.pi * df0) * np.asarray(TE)[:, None])
    rho0 = dem.mean(0)

    params0 = dict(ar=jnp.asarray(rho0.real, f32),
                   ai=jnp.asarray(rho0.imag, f32),
                   df=jnp.asarray(df0, f32) / 100.0,    # ~O(1) scaling
                   r2=jnp.asarray(r20, f32) / 100.0)

    def model(p):
        # (nE, nM, 2) echoes from per-voxel params
        env = jnp.exp(-100.0 * p['r2'][None] * TE[:, None])
        ph = -2 * jnp.pi * 100.0 * p['df'][None] * TE[:, None]
        c, s = jnp.cos(ph), jnp.sin(ph)
        re = env * (p['ar'][None] * c - p['ai'][None] * s)
        im = env * (p['ar'][None] * s + p['ai'][None] * c)
        return jnp.stack([re, im], -1)

    def loss_fn(p):
        return jnp.mean((model(p) - echoes) ** 2)

    opt = optax.adam(args.lr)

    @jax.jit
    def fit(params):
        state = opt.init(params)

        def body(carry, _):
            params, state = carry
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(g, state, params)
            return (optax.apply_updates(params, updates), state), loss

        (params, _), losses = jax.lax.scan(body, (params, state), None,
                                           length=args.iters)
        return params, losses

    params, losses = fit(params0)
    df_fit = 100.0 * np.asarray(params['df'])
    r2_fit = 100.0 * np.asarray(params['r2'])
    df_rmse = float(np.sqrt(np.mean(
        (df_fit[sup] - df_true.reshape(-1)[sup]) ** 2)))
    r2_rel = float(np.median(np.abs(
        r2_fit[sup] * t2s_true.reshape(-1)[sup] - 1.0)))
    print(f'fit: loss {float(losses[0]):.2e} -> {float(losses[-1]):.2e}'
          f', df RMSE {df_rmse:.3f} Hz, median |R2*·T2*-1| '
          f'{100*r2_rel:.2f}%')
    assert df_rmse < 0.5, df_rmse
    assert r2_rel < 0.03, r2_rel

    # ---- 3. long spiral readout through the EXACT operator ----
    loc_ = jnp.asarray(np.stack([yy, xx, 0 * xx], -1).reshape(
        1, nM, 3), f32)
    gr, _ = spiral2d(fov, int(np.ceil(1.42 * n)), direction='out',
                     gmax=0.35, smax=4000.0)            # slow = long
    k3 = jnp.asarray(g2k(np.asarray(gr), False, dt=dt0), f32)
    nT = k3.shape[-1]
    Tread = nT * dt0
    s = sig.signal(M0, loc_, k3, df=dfv, T2s=t2v, dt=dt0)[0, 0]
    print(f'readout: nT={nT} ({Tread*1e3:.1f} ms) — '
          f'{float(jnp.abs(dfv).max()) * Tread:.1f} cycles of '
          f'off-resonance at the edge')

    # ---- 4. CG recon via NUFFT: fitted maps vs no correction ----
    plan = nf.nufft_plan((n, n), (fov, fov), width=5)
    # loc_ stacks [yy, xx]: k row 0 already pairs with grid axis 0
    k2 = k3[0, :2, :]
    truth = np.asarray(M0[0, :, :2]).reshape(n, n, 2)

    def recon(dfg, t2g, nseg):
        kw = {} if dfg is None else dict(
            df=jnp.asarray(dfg, f32), T2s=jnp.asarray(t2g, f32),
            dt=dt0, nseg=nseg)

        def A(x):
            return nf.nufft(plan, x, k2, **kw)

        def AH(y):
            return nf.nufft_adjoint(plan, y, k2, **kw)

        @jax.jit
        def cg(s):
            b = AH(s)
            x, r = jnp.zeros_like(b), b
            p, rs = r, jnp.vdot(r, r)

            def body(_, st):
                x, r, p, rs = st
                Ap = AH(A(p)) + 1e-6 * p
                al = rs / jnp.vdot(p, Ap)
                x, r = x + al * p, r - al * Ap
                rs2 = jnp.vdot(r, r)
                return x, r, r + (rs2 / rs) * p, rs2

            x, *_ = jax.lax.fori_loop(0, args.cg, body, (x, r, p, rs))
            return x

        xh = np.asarray(cg(s)).reshape(n, n, 2)
        return float(np.linalg.norm(xh - truth)
                     / np.linalg.norm(truth))

    err_fit = recon(df_fit.reshape(n, n), r2_fit.reshape(n, n) ** -1,
                    nseg=16)
    err_raw = recon(None, None, nseg=1)
    print(f'recon rel err: fitted-map {100*err_fit:.2f}% vs '
          f'uncorrected {100*err_raw:.2f}%')
    assert err_fit < 0.05, err_fit
    assert err_fit < err_raw / 3, (err_fit, err_raw)

    if args.shim:
        # ---- 5. shim from the FITTED map, reacquire, recon residual --
        from mrphy_tpu.utils import shim_fit, shim_apply
        w_sup = jnp.asarray(sup.astype(np.float64), f32)
        coeffs, res_fit = shim_fit(jnp.asarray(df_fit, f32)[None],
                                   loc_, w_=w_sup[None])
        # the physical shim acts on the TRUE field
        df_shimmed = shim_apply(dfv, loc_, coeffs)
        rms0 = float(jnp.sqrt(jnp.mean((dfv[0] * w_sup) ** 2)))
        rms1 = float(jnp.sqrt(jnp.mean((df_shimmed[0] * w_sup) ** 2)))
        print(f'shim: in-support RMS df {rms0:.1f} -> {rms1:.1f} Hz')
        assert rms1 < 0.35 * rms0, (rms0, rms1)
        s = sig.signal(M0, loc_, k3, df=df_shimmed, T2s=t2v,
                       dt=dt0)[0, 0]           # recon() closes over s
        err_shim = recon(np.asarray(res_fit[0]).reshape(n, n),
                         r2_fit.reshape(n, n) ** -1, nseg=8)
        err_shim_raw = recon(None, None, nseg=1)
        print(f'shimmed recon rel err: residual-map '
              f'{100*err_shim:.2f}% vs uncorrected '
              f'{100*err_shim_raw:.2f}%')
        assert err_shim < 0.05, err_shim
        assert err_shim_raw < err_raw         # shim already helps alone

    print('fieldmap pipeline OK: echoes -> (rho, df, R2*) maps -> '
          'off-resonance-corrected NUFFT recon')


if __name__ == '__main__':
    main()
