r"""CG-SENSE image reconstruction through the acquisition operator.

The framework's :func:`mrphy_tpu.ops.signal.signal` is the exact
(non-uniform, off-resonance- and decay-aware) encoding operator ``A``,
and :func:`signal_adjoint` its exact linear adjoint ``A^H`` — so
iterative SENSE reconstruction is just conjugate gradients on the
normal equations ``(A^H A + λI) x = A^H s``, no gridding/NUFFT kernels
or density compensation needed: every product is the same pair of MXU
matmul chains the simulator uses, and the whole solve jits into one
XLA program (CG via ``lax.fori_loop``).

This demo:

1. builds an ellipse phantom with a smooth phase on an ``n×n`` grid and
   smooth synthetic coil sensitivities (``nC`` coils);
2. acquires single-shot spiral-out k-space with
   :func:`mrphy_tpu.utils.spiral2d` through ``signal`` — optionally with
   a linear off-resonance map, which the reconstruction then corrects
   *exactly* because the model includes it (conjugate-phase/model-based
   recon for free);
3. reconstructs by CG-SENSE and asserts the relative L2 error.

``--mesh`` runs both operators spin-sharded over all devices
(:func:`mrphy_tpu.parallel.mesh.signal_sharded_traceable`): the forward
psum rides ICI, the adjoint is collective-free.

``--op nufft`` swaps the *reconstruction* operator for the gridding
NUFFT (:mod:`mrphy_tpu.ops.nufft`, O(G² + nT·W²) per product instead
of O(nM·nT); off-resonance via hat time segmentation). The
*acquisition* always uses the exact operator, so the reported error
includes the honest gridding/segmentation model mismatch — no inverse
crime.

Usage::

    python examples/recon_sense.py [--n 32] [--nc 4] [--iters 40]
                                   [--df 40] [--mesh] [--op nufft]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def phantom(n: int):
    r"""Ellipse phantom with a smooth phase; returns (n*n, 2) re/im."""
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    mag = np.zeros((n, n))
    mag[(x / 0.82) ** 2 + (y / 0.92) ** 2 < 1] = 1.0
    mag[((x - 0.22) / 0.31) ** 2 + ((y + 0.1) / 0.41) ** 2 < 1] = 0.35
    mag[((x + 0.22) / 0.27) ** 2 + ((y + 0.1) / 0.41) ** 2 < 1] = 0.65
    mag[(x / 0.08) ** 2 + ((y - 0.55) / 0.11) ** 2 < 1] = 1.4
    ph = 0.8 * x + 0.5 * y * y
    return np.stack([mag * np.cos(ph), mag * np.sin(ph)],
                    -1).reshape(-1, 2)


def coil_maps(n: int, nc: int):
    r"""Smooth complex birdcage-ish sensitivities, (n*n, 2, nc)."""
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    maps = []
    for c in range(nc):
        a = 2 * np.pi * c / nc
        cx, cy = 1.3 * np.cos(a), 1.3 * np.sin(a)
        r2 = (x - cx) ** 2 + (y - cy) ** 2
        m = np.exp(-r2 / 2.4)
        p = 0.5 * (x * np.sin(a) - y * np.cos(a))
        maps.append(np.stack([m * np.cos(p), m * np.sin(p)], -1))
    return np.stack(maps, -1).reshape(n * n, 2, nc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32, help='matrix size')
    ap.add_argument('--nc', type=int, default=4, help='coils')
    ap.add_argument('--fov', type=float, default=24.0, help='cm')
    ap.add_argument('--iters', type=int, default=40, help='CG iterations')
    ap.add_argument('--df', type=float, default=0.0,
                    help='peak linear off-resonance, Hz (modeled exactly)')
    ap.add_argument('--lam', type=float, default=1e-6)
    ap.add_argument('--traj', choices=['spiral', 'radial'],
                    default='spiral',
                    help='spiral-out (single shot) or golden-angle '
                         'radial (spokes ride the batch axis)')
    ap.add_argument('--noise', type=float, default=0.0,
                    help='receiver noise std; correlated across coils, '
                         'pre-whitened before the CG solve')
    ap.add_argument('--mesh', action='store_true',
                    help='spin-shard both operators over all devices')
    ap.add_argument('--op', choices=['exact', 'nufft'], default='exact',
                    help="reconstruction operator: 'exact' = the dense "
                         "O(nM*nT) encoding operator; 'nufft' = the "
                         "gridding NUFFT (mrphy_tpu.ops.nufft, "
                         "time-segmented off-resonance). Acquisition "
                         "ALWAYS uses the exact operator, so --op "
                         "nufft measures honest model error, not an "
                         "inverse crime.")
    ap.add_argument('--nseg', type=int, default=12,
                    help='time segments for --op nufft with --df')
    ap.add_argument('--toeplitz', action='store_true',
                    help='with --op nufft (df-free): apply A^H A via '
                         'the exact Toeplitz embedding — each CG '
                         'iteration is two dense grid DFTs, zero '
                         'gridding error, trajectory-independent cost')
    ap.add_argument('--maps', choices=['true', 'espirit'],
                    default='true',
                    help='espirit: SELF-calibrated SENSE — estimate '
                         'the maps from a Cartesian ACS acquisition '
                         '(utils.espirit_maps) instead of using the '
                         'ground truth; recon is then compared in '
                         'magnitude (the per-voxel map phase '
                         'reference is arbitrary)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.utils import spiral2d, radial, g2k

    n, nc, fov = args.n, args.nc, args.fov
    nM = n * n

    # grid locations (cm), phantom, coils — the SpinCube grid rule
    # x = (j - n//2)*fov/n (also what the NUFFT plan assumes)
    ax = (np.arange(n) - n // 2) / n * fov
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    loc_ = jnp.asarray(np.stack([xx, yy, np.zeros_like(xx)],
                                -1).reshape(1, nM, 3), jnp.float32)
    x_true = jnp.asarray(phantom(n), jnp.float32)            # (nM, 2)
    sens = jnp.asarray(coil_maps(n, nc)[None], jnp.float32)  # (1,nM,2,nc)
    df = None if args.df == 0 else jnp.asarray(
        args.df * (xx / fov * 2).reshape(1, nM), jnp.float32)

    # Readout k-space from the gradient. Trajectories cover a k-space
    # DISC — a discrete n x n image needs the Nyquist SQUARE, so extend
    # kmax to the corner radius (sqrt(2)); with the corners sampled,
    # CG-SENSE recovers the grid exactly.
    if args.traj == 'spiral':
        gr, _ = spiral2d(fov, int(np.ceil(1.42 * n)), direction='out')
    else:  # golden-angle radial: each spoke is its own readout, so the
        #    spokes ride the signal operator's BATCH axis (time — and
        #    hence off-resonance phase — restarts per spoke for free)
        gr, _ = radial(fov, int(np.ceil(1.42 * n)))
    k = jnp.asarray(g2k(np.asarray(gr), False, dt=dt0), jnp.float32)
    nsh, nT = k.shape[0], k.shape[-1]
    print(f'{n}x{n} phantom, {nc} coils, {args.traj} nshots={nsh} '
          f'nT={nT}, df_peak={args.df} Hz, mesh={args.mesh}, '
          f'op={args.op}')
    assert not (args.mesh and args.op == 'nufft'), \
        '--mesh shards the exact operator; use --op exact with it'

    mesh = None
    if args.mesh:
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        assert nM % mesh.shape['spins'] == 0

    def A_exact(x):                           # (nM,2) -> (nsh,nc,nT,2)
        M = jnp.broadcast_to(jnp.concatenate(
            [x, jnp.zeros((nM, 1), x.dtype)], -1)[None], (nsh, nM, 3))
        return sig.signal(M, loc_, k, sens=sens, df=df, dt=dt0,
                          mesh=mesh)

    def AH_exact(s):                          # (nsh,nc,nT,2) -> (nM,2)
        return sig.signal_adjoint(s, loc_, k, sens=sens, df=df,
                                  dt=dt0, mesh=mesh).sum(0)

    if args.op == 'nufft':
        from mrphy_tpu.ops import nufft as nf
        plan = nf.nufft_plan((n, n), (fov, fov), width=5)
        dfg = None if df is None else df.reshape(n, n)
        nkw = ({} if dfg is None
               else dict(df=dfg, dt=dt0, nseg=args.nseg))
        # grid axis 0 is y (meshgrid 'ij'): plan axes pair (ky, kx)
        k2 = k[:, (1, 0), :]                  # (nsh, 2, nT)

        def _sg():                            # read `sens` at call time
            return jnp.moveaxis(sens[0].reshape(n, n, 2, nc), -1, 0)

        def A(x):                             # gridding SENSE forward
            xg = x.reshape(n, n, 2)

            def coil(sc):                     # sc: (n, n, 2)
                wr = sc[..., 0] * xg[..., 0] - sc[..., 1] * xg[..., 1]
                wi = sc[..., 0] * xg[..., 1] + sc[..., 1] * xg[..., 0]
                w = jnp.stack([wr, wi], -1)
                return jax.vmap(lambda k1: nf.nufft(
                    plan, w, k1, **nkw))(k2)  # (nsh, nT, 2)

            return jnp.moveaxis(jax.vmap(coil)(_sg()), 0, 1)

        def AH(s):                            # conj(sens)-combined adj
            def coil(sc, s_c):                # s_c: (nsh, nT, 2)
                xg = jax.vmap(lambda k1, s1: nf.nufft_adjoint(
                    plan, s1, k1, **nkw))(k2, s_c).sum(0)
                xr = sc[..., 0] * xg[..., 0] + sc[..., 1] * xg[..., 1]
                xi = sc[..., 0] * xg[..., 1] - sc[..., 1] * xg[..., 0]
                return jnp.stack([xr, xi], -1)

            return jax.vmap(coil)(_sg(), jnp.moveaxis(s, 1, 0)).sum(
                0).reshape(nM, 2)
    else:
        A, AH = A_exact, AH_exact

    s_acq = A_exact(x_true)                   # honest: no inverse crime
    print(f'acquired |s| in [{float(jnp.abs(s_acq).min()):.3g}, '
          f'{float(jnp.abs(s_acq).max()):.3g}]')

    s_acs = None
    if args.maps == 'espirit':
        # Cartesian ACS acquisition (k = m/fov on a centered cs² block,
        # the centered-DFT convention espirit_maps documents), acquired
        # with the TRUE maps — estimation sees only data. df is off for
        # the ACS (a short, fully-refocused calibration readout).
        cs = min(24, n)
        ms = np.arange(cs) - cs // 2
        kyy_a, kxx_a = np.meshgrid(ms / fov, ms / fov, indexing='ij')
        k_acs = jnp.asarray(np.stack(
            [kxx_a, kyy_a, 0 * kxx_a], 0).reshape(3, cs * cs),
            jnp.float32)                      # pairs loc_'s (x, y, 0)
        M_acs = jnp.concatenate(
            [x_true, jnp.zeros((nM, 1), x_true.dtype)], -1)[None]
        s_acs = sig.signal(M_acs, loc_, k_acs[None], sens=sens, dt=dt0)

    if args.noise > 0:
        # correlated receiver noise, then pre-whiten signal AND maps:
        # the CG solve below is then the statistically optimal (SENSE)
        # estimator without any other change
        from mrphy_tpu.utils.coils import (add_noise, apply_ccmat,
                                           noise_whiten_mat)
        rngn = np.random.default_rng(1)
        Amix = rngn.standard_normal((nc, nc)) \
            + 1j * rngn.standard_normal((nc, nc))
        Psi = Amix @ Amix.conj().T + nc * np.eye(nc)
        Psi = np.stack([Psi.real, Psi.imag], 0)
        s_acq = add_noise(jax.random.key(2), s_acq, args.noise,
                          Psi=Psi)
        Wwh = jnp.asarray(noise_whiten_mat(Psi), jnp.float32)
        sens = apply_ccmat(sens, Wwh)
        s_acq = apply_ccmat(s_acq, Wwh, axis=1)
        if s_acs is not None:                 # same receiver chain
            s_acs = add_noise(jax.random.key(3), s_acs, args.noise,
                              Psi=Psi)
            s_acs = apply_ccmat(s_acs, Wwh, axis=1)
        print(f'noise std {args.noise} (correlated), pre-whitened')

    sens_true = sens                          # (possibly whitened)
    if args.maps == 'espirit':
        # estimation happens in the (possibly whitened) receiver
        # coordinates the CG solve runs in — exactly a real pipeline
        from mrphy_tpu.utils.coils import espirit_maps
        cs = int(np.sqrt(s_acs.shape[2]))
        calib = np.asarray(s_acs)[0].reshape(nc, cs, cs, 2)
        # kernel 6 needs a ≥24² ACS for an overdetermined Hankel
        # matrix ((cs−5)² rows ≥ 36·nC columns); smaller ACS → 4
        maps, lam = espirit_maps(calib, (n, n),
                                 kernel=6 if cs >= 24 else 4, crop=0.9)
        sens = jnp.asarray(maps.reshape(1, nM, 2, nc), jnp.float32)
        print(f'ESPIRiT maps from a {cs}x{cs} ACS: eigenvalue>=0.9 on '
              f'{float((lam >= 0.9).mean()) * 100:.0f}% of voxels')

    normal_op = None
    if args.toeplitz:
        assert args.op == 'nufft' and df is None, \
            '--toeplitz needs --op nufft and no --df (AHA is only ' \
            'Toeplitz without off-resonance)'
        # reuse the nufft branch's plan/k2/_sg (the assert guarantees
        # they exist and stay consistent with AH's RHS); the kernel is
        # a plain sum over samples, so one call on the concatenated
        # shots replaces per-shot contractions
        that = nf.toeplitz_kernel(
            plan, jnp.concatenate(list(k2), axis=-1))

        def normal_op(x):                     # Σ_c Sᴴ T S  (exact AᴴA)
            xg = x.reshape(n, n, 2)

            def coil(sc):
                wr = sc[..., 0] * xg[..., 0] - sc[..., 1] * xg[..., 1]
                wi = sc[..., 0] * xg[..., 1] + sc[..., 1] * xg[..., 0]
                y = nf.toeplitz_apply(plan, that,
                                      jnp.stack([wr, wi], -1))
                yr = sc[..., 0] * y[..., 0] + sc[..., 1] * y[..., 1]
                yi = sc[..., 0] * y[..., 1] - sc[..., 1] * y[..., 0]
                return jnp.stack([yr, yi], -1)

            return jax.vmap(coil)(_sg()).sum(0).reshape(nM, 2)

    @jax.jit
    def cg_sense(s):
        def normal(x):
            if normal_op is not None:
                return normal_op(x) + args.lam * x
            return AH(A(x)) + args.lam * x

        b = AH(s)
        x0 = jnp.zeros_like(b)
        r0 = b
        p0 = r0
        rs0 = jnp.vdot(r0, r0)

        def body(_, st):
            x, r, p, rs = st
            # freeze once converged: CG past machine-precision residual
            # divides ~0/~0 and NaNs the iterate (seen at f32)
            live = rs > 1e-12 * rs0
            Ap = normal(p)
            alpha = jnp.where(live, rs / jnp.vdot(p, Ap), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = jnp.where(live, r + (rs_new / jnp.maximum(
                rs, 1e-30)) * p, p)
            return x, r, p, rs_new

        x, r, _, _ = jax.lax.fori_loop(0, args.iters, body,
                                       (x0, r0, p0, rs0))
        return x, jnp.sqrt(jnp.vdot(r, r))

    x_rec, rnorm = cg_sense(s_acq)
    if args.maps == 'espirit':
        # ESPIRiT maps are unit-norm with an arbitrary (smooth)
        # per-voxel phase reference, so SENSE with them recovers
        # ‖S(q)‖·x(q) up to that phase: s = Σ_c S_c x = Σ_c Ŝ_c(‖S‖x).
        # Compare magnitudes against the norm-weighted truth — the
        # well-defined target of unit-norm self-calibrated recon.
        mg = jnp.linalg.norm(x_rec, axis=-1)
        snorm = jnp.linalg.norm(sens_true[0], axis=(-2, -1))
        mt = jnp.linalg.norm(x_true, axis=-1) * snorm
        err = float(jnp.linalg.norm(mg - mt) / jnp.linalg.norm(mt))
    else:
        err = float(jnp.linalg.norm(x_rec - x_true)
                    / jnp.linalg.norm(x_true))
    print(f'CG-SENSE {args.iters} iters: residual {float(rnorm):.3e}, '
          f'relative image error {100 * err:.3f}%')
    bound = 0.01 if args.noise == 0 else 0.05
    if args.op == 'nufft':
        bound = max(bound, 0.02)   # honest gridding/segmentation error
    if args.maps == 'espirit':
        bound = max(bound, 0.03)   # calibration bias (finite ACS)
    assert err < bound, f'recon error {err} too large'
    print('recon OK' + (' (exact-model recovery)'
                        if args.noise == 0 else ' (noisy, whitened)')
          + (' (self-calibrated: ESPIRiT maps)'
             if args.maps == 'espirit' else ''))


if __name__ == '__main__':
    main()
