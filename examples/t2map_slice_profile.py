r"""Slice-profile-resolved T2 mapping: EPG with real pulse profiles vs
a full Bloch simulation of the shaped-pulse CPMG train.

Multi-echo spin-echo T2 mapping with slice-selective refocusing is
biased: across the slice profile the refocusing angle β(z) is NOT 180°
(and protocols deliberately run reduced-power ~150° trains), so
stimulated-echo pathways feed magnetization back into later echoes and
a naive mono-exponential fit misestimates T2 — the classic problem the
slice-resolved EPG model (Lebel & Wilman, MRM 2010) solves.

This example builds the whole story out of library pieces and
cross-validates two INDEPENDENT engines against each other:

1. Design real pulses: SLR excitation (90°) and refocusing (nominal
   180°, played at ``--refoc`` degrees) with their slice gradient
   (:func:`mrphy_tpu.design.slr_design`).
2. Extract profiles exactly: α(z) by Bloch-simulating the excitation,
   β(z) as the rotation angle of the refocusing pulse's propagator
   (:func:`mrphy_tpu.ops.beffective.beff2ab` with E1=E2=1 →
   ``β = arccos((tr A − 1)/2)``).
3. Predict the echo train by slice-resolved EPG:
   :func:`mrphy_tpu.ops.epg.epg_cpmg` batched over z with per-z
   ``alpha_ex`` = α(z) and flips = β(z), integrated across the slice.
4. Simulate the ground truth with the Bloch engine: the actual RF+grad
   waveforms, relaxation during the pulses, free-precession delays,
   and ideal crushers emulated EXACTLY by a sub-voxel dephasing
   ensemble (nψ phase offsets kill every non-refocused pathway with
   |k| < nψ by symmetry — nψ > 4·nEcho, so the average is exact).
5. Fit T2 two ways from the Bloch-simulated echoes: a naive log-linear
   mono-exponential (biased), and a gradient-descent fit through the
   differentiable slice-resolved EPG forward (accurate).

Asserts: EPG-vs-Bloch echo amplitudes agree to a few %, the
slice-resolved fit recovers the true T2 to <2.5%, and the naive fit's
bias exceeds the slice-resolved fit's error several-fold.

Usage::

    python examples/t2map_slice_profile.py [--ne 10] [--refoc 150]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def rotz(M, phi):
    r"""Rotate spins about z by ``phi`` (ideal gradient impulse)."""
    import jax.numpy as jnp
    c, s = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack([c * M[..., 0] - s * M[..., 1],
                      s * M[..., 0] + c * M[..., 1], M[..., 2]], -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nz', type=int, default=96, help='z samples')
    ap.add_argument('--nt', type=int, default=192, help='RF samples')
    ap.add_argument('--tb', type=float, default=4.0)
    ap.add_argument('--thk', type=float, default=0.5, help='cm')
    ap.add_argument('--ne', type=int, default=10, help='echoes')
    ap.add_argument('--esp', type=float, default=0.012, help='Sec')
    ap.add_argument('--refoc', type=float, default=150.0, help='deg')
    ap.add_argument('--t1', type=float, default=1.0)
    ap.add_argument('--t2', type=float, default=0.08)
    ap.add_argument('--iters', type=int, default=250)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0, pi
    from mrphy_tpu.design import slr_design
    from mrphy_tpu.ops import slowsims
    from mrphy_tpu.ops.beffective import rfgr2beff, beff2ab
    from mrphy_tpu.ops.epg import epg_cpmg

    dt = float(dt0)
    nT, nz, nE = args.nt, args.nz, args.ne
    T1, T2, esp = args.t1, args.t2, args.esp
    Tp = nT * dt                                  # pulse duration, Sec
    assert esp / 2 > Tp * 1.5, 'esp too short for the pulse lengths'

    # ---- 1. pulses + slice gradient --------------------------------
    rf_ex, _ = slr_design(nT, args.tb, ptype='ex', flip=pi / 2)
    rf_se, _ = slr_design(nT, args.tb, ptype='se', flip=pi)
    rf_se = rf_se * (args.refoc / 180.0)
    # CPMG condition: refocusing axis ∥ the excited magnetization — the
    # refocusing RF is phase-shifted 90° from the (real) excitation
    # pulse: (re, im) → (−im, re). Without this the train is CP, not
    # CPMG, and β ≠ 180° errors accumulate instead of compensating.
    rf_se = jnp.stack([-rf_se[:, 1], rf_se[:, 0]], 1)
    bw = args.tb / Tp                             # profile bandwidth, Hz
    gz = bw / (float(gamH) * args.thk)            # Gauss/cm
    gr = jnp.concatenate([jnp.zeros((1, 2, nT)),
                          gz * jnp.ones((1, 1, nT))], 1)

    z = np.linspace(-1.5 * args.thk, 1.5 * args.thk, nz)
    loc_z = jnp.asarray(np.stack([0 * z, 0 * z, z], -1)[None],
                        jnp.float32)              # (1, nz, 3)

    # ---- 2. exact profiles α(z), β(z) ------------------------------
    beff_ex = rfgr2beff(rf_ex.astype(jnp.float32), gr.astype(
        jnp.float32), loc_z)
    M0 = jnp.broadcast_to(jnp.asarray([0., 0., 1.], jnp.float32),
                          (1, nz, 3))
    Mex = slowsims.blochsim(M0, beff_ex)          # no relax: profile
    # ideal half-area rephase lobe; pick the sign that rephases
    phs = float(gamH) * 2 * pi * gz * (Tp / 2) * z
    cands = [rotz(Mex, jnp.asarray(s * phs, jnp.float32)[None])
             for s in (+1.0, -1.0)]
    # |Σ Mxy| via real ops (complex dtypes are unsupported on the TPU
    # backend — CLAUDE.md)
    coh = [float(jnp.hypot(m[..., 0].sum(), m[..., 1].sum()))
           for m in cands]
    sgn = +1.0 if coh[0] >= coh[1] else -1.0
    Mex = cands[0] if sgn > 0 else cands[1]
    alpha = jnp.arctan2(jnp.hypot(Mex[0, :, 0], Mex[0, :, 1]),
                        Mex[0, :, 2])             # (nz,)
    # excitation phase profile (equiripple ringing flips sign out of
    # band) — carried into the EPG model through a per-z phi_ex; the
    # Bloch refocusing axis is +y ↔ EPG's +x, so the frame map is
    # phi_ex = angle(Mxy) up to a global π (resolved on echo 1 below)
    phi_prof = jnp.arctan2(Mex[0, :, 1], Mex[0, :, 0])

    beff_se = rfgr2beff(rf_se.astype(jnp.float32), gr.astype(
        jnp.float32), loc_z)
    A, _ = beff2ab(beff_se, E1=1.0, E2=1.0)       # pure rotation
    tr = A[0, :, 0, 0] + A[0, :, 1, 1] + A[0, :, 2, 2]
    beta = jnp.arccos(jnp.clip((tr - 1) / 2, -1.0, 1.0))   # (nz,)
    print(f'profiles: center α={float(alpha[nz//2])*180/np.pi:.1f}°, '
          f'β={float(beta[nz//2])*180/np.pi:.1f}° '
          f'(nominal 90/{args.refoc:.0f})')

    # ---- 3. slice-resolved EPG prediction --------------------------
    def epg_voxel(T2v, dphi=0.0):
        e = epg_cpmg(beta[:, None] * jnp.ones((1, nE)), T1=T1, T2=T2v,
                     esp=esp, alpha_ex=alpha,
                     phi_ex=phi_prof + dphi)      # (nz, nE, 2)
        # |Σ_z (re + i·im)| without complex dtypes (TPU backend)
        return jnp.hypot(e[..., 0].sum(0), e[..., 1].sum(0)) / nz

    # ---- 4. Bloch ground truth (shaped pulses + ideal crushers) ----
    npsi = 4 * nE + 9                              # kills |k| < nψ
    psi = 2 * pi * np.arange(npsi) / npsi
    locb = jnp.asarray(np.broadcast_to(
        np.stack([0 * z, 0 * z, z], -1)[:, None], (nz, npsi, 3))[None],
        jnp.float32)                               # (1, nz, nψ, 3)
    psi_b = jnp.asarray(np.broadcast_to(psi, (nz, npsi))[None],
                        jnp.float32)
    kw = dict(T1=jnp.asarray([[T1]], jnp.float32),
              T2=jnp.asarray([[T2]], jnp.float32))

    bex = rfgr2beff(rf_ex.astype(jnp.float32), gr.astype(jnp.float32),
                    locb)
    bse = rfgr2beff(rf_se.astype(jnp.float32), gr.astype(jnp.float32),
                    locb)
    reph = jnp.asarray(sgn * phs, jnp.float32)[None, :, None]

    M = jnp.broadcast_to(jnp.asarray([0., 0., 1.], jnp.float32),
                         (1, nz, npsi, 3))
    M = slowsims.blochsim(M, bex, **kw)            # excitation (relax)
    M = rotz(M, reph)                              # rephase lobe
    d_first = esp / 2 - Tp                         # exc ctr → se start
    d_half = esp / 2 - Tp / 2                      # echo ↔ pulse edge
    echoes = []
    for k in range(nE):
        M = slowsims.freeprec(M, d_first if k == 0 else d_half, **kw)
        M = rotz(M, psi_b)                         # crusher (ideal)
        M = slowsims.blochsim(M, bse, **kw)        # shaped refocusing
        M = rotz(M, psi_b)                         # crusher (ideal)
        M = slowsims.freeprec(M, d_half, **kw)
        c = jnp.hypot(M[..., 0].mean((1, 2)), M[..., 1].mean((1, 2)))
        echoes.append(float(c[0]))
    E_bloch = np.asarray(echoes)

    # resolve the global Bloch↔EPG frame rotation (the EPG convention
    # fixes the refocusing axis at +x; the Bloch frame's transverse
    # phase origin depends on the pulses' RF phases) on early echoes
    T2j = jnp.asarray(T2)
    cand = {d: np.asarray(epg_voxel(T2j, d)) for d in (0.0, np.pi / 2)}
    dphi = min(cand, key=lambda d: np.abs(cand[d][:3]
                                          - E_bloch[:3]).sum())
    E_epg = cand[dphi]

    rel = np.abs(E_epg / E_bloch - 1)
    print('echo amplitudes (Bloch):', np.round(E_bloch, 4))
    print('echo amplitudes (EPG):  ', np.round(E_epg, 4))
    print(f'EPG vs Bloch: max rel dev {rel.max()*100:.2f}%')
    # residual = relaxation DURING the shaped pulses + finite-pulse
    # effects the instantaneous-rotation EPG model cannot see
    # (pulses occupy Tp/esp ≈ 6% of the timeline here; the bound
    # leaves f32 headroom — the default config lands near 5%)
    assert rel.max() < 0.07, f'EPG-vs-Bloch deviation {rel.max():.3f}'

    # ---- 5. fits ----------------------------------------------------
    # Both fits start at echo 2: the first echo carries the largest
    # finite-pulse residual (the clinical "first-echo anomaly" —
    # routinely excluded in multi-echo T2 mapping).
    t_n = esp * np.arange(1, nE + 1)
    p = np.polyfit(t_n[1:], np.log(E_bloch[1:]), 1)  # naive mono-exp
    T2_naive = -1.0 / p[0]

    y = jnp.asarray(E_bloch[1:], jnp.float64)

    def objective(logT2):
        m = epg_voxel(jnp.exp(logT2), dphi)[1:]
        a = jnp.vdot(m, y) / jnp.vdot(m, m)       # amplitude, closed form
        return jnp.sum((a * m - y) ** 2)

    import optax
    lt = jnp.asarray(np.log(0.05), jnp.float64)   # deliberately off
    opt = optax.adam(0.05)
    st = opt.init(lt)
    vg = jax.jit(jax.value_and_grad(objective))

    for _ in range(args.iters):
        _, g = vg(lt)
        up, st = opt.update(g, st)
        lt = optax.apply_updates(lt, up)
    T2_fit = float(jnp.exp(lt))

    err_naive = abs(T2_naive - T2) / T2
    err_fit = abs(T2_fit - T2) / T2
    print(f'true T2 {T2*1e3:.1f} ms | naive mono-exp '
          f'{T2_naive*1e3:.1f} ms ({err_naive*100:+.1f}%) | '
          f'slice-resolved EPG fit {T2_fit*1e3:.1f} ms '
          f'({err_fit*100:+.1f}%)')
    assert err_fit < 0.025, f'slice-resolved fit off by {err_fit:.3f}'
    assert err_naive > 3 * max(err_fit, 0.005), \
        'expected a visible naive-fit bias'
    print('OK')


if __name__ == '__main__':
    main()
