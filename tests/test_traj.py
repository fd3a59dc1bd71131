r"""Trajectory generators: hardware limits hold sample-by-sample, the
spiral covers k-space to the requested extent, and the Tx convention
(k ends at origin) holds for excitation use."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0
from mrphy_tpu.utils.traj import (epi, radial, rewinder, rosette,
                                  spiral2d, traj_check, trapezoid)
from mrphy_tpu.utils.conversions import g2k

FOV, N = 24.0, 32          # 24 cm FOV, 32 matrix -> kmax 0.667 cyc/cm
GMAX, SMAX = 4.0, 15e3


class TestSpiral:

    def test_limits_and_coverage_out(self):
        gr, k = spiral2d(FOV, N, gmax=GMAX, smax=SMAX, direction='out')
        traj_check(gr, gmax=GMAX, smax=SMAX)
        kr = np.hypot(k[0, 0], k[0, 1])
        assert kr.max() >= N / (2 * FOV) * 0.99
        # outward spiral + Tx convention: |k| max sits at the END ramp
        assert np.argmax(kr) > 0.8 * kr.size

    def test_spiral_in_ends_at_origin(self):
        gr, k = spiral2d(FOV, N, gmax=GMAX, smax=SMAX, direction='in')
        traj_check(gr, gmax=GMAX, smax=SMAX)
        kr = np.hypot(k[0, 0], k[0, 1])
        assert kr[-1] < 1e-6                      # Tx endpoint
        assert kr.max() >= N / (2 * FOV) * 0.99
        assert np.argmax(kr) < 0.2 * kr.size      # large-k early
        # starts and ends at (near-)zero gradient: playable as-is
        assert np.abs(gr[0, :2, 0]).max() <= SMAX * float(dt0) * 1.001
        assert np.abs(gr[0, :2, -1]).max() <= SMAX * float(dt0) * 1.001

    def test_pitch_matches_nshots(self):
        r"""Radial spacing between turns = nshots/fov (Nyquist for the
        interleaved set)."""
        for nshots in (1, 4):
            gr, k = spiral2d(FOV, N, nshots=nshots, gmax=GMAX,
                             smax=SMAX, direction='out')
            kx, ky = k[0, 0], k[0, 1]
            th = np.unwrap(np.arctan2(ky, kx))
            kr = np.hypot(kx, ky)
            # fit |k| = lam*theta over the spiral body
            body = (kr > 0.1 * kr.max()) & (kr < 0.9 * kr.max())
            lam = (kr[body] / (th[body] - th[0])).mean()
            np.testing.assert_allclose(2 * np.pi * lam, nshots / FOV,
                                       rtol=0.05)

    def test_k_matches_g2k(self):
        gr, k = spiral2d(FOV, N, gmax=GMAX, smax=SMAX)
        k2 = np.asarray(g2k(jnp.asarray(gr), True, float(dt0), gam=gamH))
        np.testing.assert_allclose(k, k2, atol=1e-6)

    def test_trapezoid_exact_area_and_limits(self):
        for area in (1e-4, 3.2e-3, 1e-6, -5e-4):
            g = trapezoid(area, gmax=GMAX, smax=SMAX)
            np.testing.assert_allclose(g.sum() * float(dt0), area,
                                       rtol=1e-12)
            traj_check(g[None, None], gmax=GMAX, smax=SMAX)
        assert trapezoid(0.0).size == 0

    def test_epi_coverage_blips_and_limits(self):
        for flyback in (False, True):
            for nshots in (1, 4):
                gr, k = epi(FOV, N, nshots=nshots, flyback=flyback,
                            gmax=GMAX, smax=SMAX)
                traj_check(gr, gmax=GMAX, smax=SMAX)
                kx, ky = k[0, 0], k[0, 1]
                kmax = N / (2 * FOV)
                np.testing.assert_allclose(
                    [kx.min(), kx.max()], [-kmax, kmax], atol=1e-6)
                # phase encodes step by nshots/fov from -kmax
                np.testing.assert_allclose(ky.min(), -kmax, atol=1e-6)
                np.testing.assert_allclose(
                    ky.max(), -kmax + (N // nshots - 1) * nshots / FOV,
                    atol=1e-6)
                # Rx convention: starts at the origin (k[0] already
                # holds the first sample's accumulation)
                step = gamH * GMAX * float(dt0)
                assert abs(kx[0]) <= step and abs(ky[0]) <= step

    def test_epi_flyback_readouts_monotone(self):
        gr, k = epi(FOV, N, nshots=4, flyback=True, gmax=GMAX,
                    smax=SMAX)
        # during positive-gradient spans, kx only increases
        on = gr[0, 0] > 0.5 * GMAX
        dkx = np.diff(k[0, 0])
        assert np.all(dkx[on[1:]] > 0)

    def test_radial_limits_and_spokes(self):
        kmax = N / (2 * FOV)
        gr, k = radial(FOV, N, nspokes=13, gmax=GMAX, smax=SMAX)
        assert gr.shape[0] == 13 and gr.shape[1] == 3
        traj_check(gr, gmax=GMAX, smax=SMAX, dt=float(dt0))
        for j in range(13):
            kr = np.linalg.norm(k[j, :2], axis=0)
            # through center (after pre-phase) out to +kmax
            assert kr.min() < 1e-9 or np.any(kr < 2e-3)
            assert abs(kr.max() - kmax) / kmax < 1e-6
            # every sample lies ON the spoke line (perp component 0)
            phi = np.arctan2(k[j, 1, -1], k[j, 0, -1])
            perp = -np.sin(phi) * k[j, 0] + np.cos(phi) * k[j, 1]
            assert np.abs(perp).max() < 1e-9 * kmax + 1e-12

    def test_radial_golden_vs_uniform_angles(self):
        _, kg = radial(FOV, N, nspokes=8, golden=True, gmax=GMAX,
                       smax=SMAX)
        ang = np.arctan2(kg[:, 1, -1], kg[:, 0, -1])
        d = np.diff(np.unwrap(ang))
        ga = np.pi * (np.sqrt(5) - 1) / 2
        np.testing.assert_allclose(np.abs(d) % (2 * np.pi), ga,
                                   atol=1e-9)
        _, ku = radial(FOV, N, nspokes=8, golden=False, gmax=GMAX,
                       smax=SMAX)
        angu = np.arctan2(ku[:, 1, -1], ku[:, 0, -1])
        du = np.diff(np.unwrap(angu))
        np.testing.assert_allclose(du, np.pi / 8, atol=1e-9)

    def test_radial_default_nyquist_count(self):
        gr, _ = radial(FOV, 16, gmax=GMAX, smax=SMAX)
        assert gr.shape[0] == int(np.ceil(np.pi / 2 * 16))

    def test_radial3d_limits_and_sphere_coverage(self):
        from mrphy_tpu.utils.traj import radial3d
        kmax = N / (2 * FOV)
        gr, k = radial3d(FOV, N, nspokes=64, gmax=GMAX, smax=SMAX)
        assert gr.shape[0] == 64
        traj_check(gr, gmax=GMAX, smax=SMAX, dt=float(dt0))
        ends = k[:, :, -1]                       # (nspokes, 3)
        r = np.linalg.norm(ends, axis=1)
        np.testing.assert_allclose(r, kmax, rtol=1e-6)
        dirs = ends / r[:, None]
        # near-uniform sphere coverage: mean direction ~ 0 and every
        # octant is hit
        assert np.linalg.norm(dirs.mean(0)) < 0.1
        octants = set(map(tuple, (dirs > 0).astype(int)))
        assert len(octants) == 8
        # spokes are straight lines through the center
        perp = k[5] - np.outer(dirs[5], dirs[5] @ k[5])
        assert np.abs(perp).max() < 1e-9 * kmax + 1e-12

    def test_rosette_limits_and_center_crossings(self):
        kmax = N / (2 * FOV)
        gr, k = rosette(FOV, N, npetals=6, gmax=GMAX, smax=SMAX)
        traj_check(gr, gmax=GMAX, smax=SMAX, dt=float(dt0))
        kr = np.linalg.norm(k[0, :2], axis=0)
        assert kr.max() <= kmax * 1.001     # exact petal radius
        assert kr.max() > 0.95 * kmax       # ... and reaches it
        # re-crosses the center ~npetals times (ramp-in offset is small)
        crossings = int(np.sum(np.diff(kr < 0.08 * kmax).astype(int) == 1))
        assert crossings >= 5, crossings

    def test_rewinder_slew_and_endpoint(self):
        tail = rewinder(3.7, smax=SMAX, dt=float(dt0))
        assert tail.size > 0 and abs(tail[-1]) < 1e-12
        steps = np.diff(np.concatenate([[3.7], tail]))
        assert np.abs(steps).max() <= SMAX * float(dt0) * (1 + 1e-9)
        assert rewinder(0.0).size == 0

    def test_sta_design_through_generated_spiral(self):
        r"""Integration: a generated spiral-in feeds sta_design and
        excites a 2D target (the production use of the generator)."""
        from mrphy_tpu.design import sta_design
        from mrphy_tpu.design.sta import sta_forward
        gr, _ = spiral2d(12.0, 16, gmax=GMAX, smax=SMAX, direction='in')
        gr = jnp.asarray(gr)
        nM = 15 * 15
        xy = np.stack(np.meshgrid(np.linspace(-3, 3, 15),
                                  np.linspace(-3, 3, 15)), -1)
        loc = np.zeros((1, nM, 3))
        loc[0, :, :2] = xy.reshape(-1, 2)
        r = np.sqrt((xy ** 2).sum(-1).reshape(-1))
        # disc of radius 2 with a raised-cosine edge one resolution
        # element wide (kmax = 0.667 cyc/cm -> 0.75 cm): a hard edge
        # would force Gibbs ringing at ANY rf (band-limited excitation)
        prof = np.clip((2.0 + 0.375 - r) / 0.75, 0., 1.)
        tgt = np.zeros((1, nM, 2))
        tgt[0, :, 1] = 0.1 * (0.5 - 0.5 * np.cos(np.pi * prof))  # My
        rf, res = sta_design(jnp.asarray(loc), gr, jnp.asarray(tgt),
                             lam=1e-5, niter=40)
        pred = np.asarray(sta_forward(rf, jnp.asarray(loc), gr))
        err = np.abs(pred - tgt)[0].max() / 0.1
        assert err < 0.2, err                         # sidelobes only


class TestMintimeGradient:
    r"""Lustig–Kim–Pauly time-optimal reparametrization: hardware
    limits by construction, path fidelity to one k-sample step, the
    curvature speed limit actually attained on a circle, and the
    straight-line limit reducing to the min-time trapezoid."""

    def test_circle_reaches_curvature_limit(self):
        from mrphy_tpu import gamH, dt0, gmax0, smax0
        from mrphy_tpu.utils.traj import mintime_gradient, traj_check
        r = 0.4                                    # cycle/cm
        th = np.linspace(0, 2 * np.pi, 8001)
        path = np.stack([r - r * np.cos(th), r * np.sin(th)])
        gr = mintime_gradient(path)
        traj_check(gr)
        vss = min(gamH * gmax0, np.sqrt(gamH * smax0 * r))
        speed = gamH * np.linalg.norm(gr[0, :2], axis=0)
        assert speed.max() <= vss * 1.001
        assert speed.max() >= 0.97 * vss           # limit attained
        # fidelity: every sample on the circle to ~1 k-step
        import jax.numpy as jnp
        from mrphy_tpu.utils import g2k
        k = np.asarray(g2k(jnp.asarray(gr), False, dt=dt0))[0, :2]
        dev = np.abs(np.hypot(k[0] - r, k[1]) - r)
        assert dev.max() < 1.5 * gamH * gmax0 * dt0, dev.max()

    def test_line_matches_trapezoid(self):
        from mrphy_tpu import gamH
        from mrphy_tpu.utils.traj import (mintime_gradient, trapezoid,
                                          traj_check)
        A = 0.6                                    # cycle/cm
        path = np.stack([np.linspace(0, A, 4001),
                         np.zeros(4001)])
        gr = mintime_gradient(path)
        traj_check(gr)
        n_trap = trapezoid(A / gamH).size
        nT = gr.shape[-1]
        assert nT <= n_trap * 1.05 + 4, (nT, n_trap)
        assert nT >= n_trap - 1, (nT, n_trap)      # can't beat optimal
        # end position exact
        import jax.numpy as jnp
        from mrphy_tpu.utils import g2k
        from mrphy_tpu import dt0
        k = np.asarray(g2k(jnp.asarray(gr), False, dt=dt0))[0]
        assert abs(k[0, -1] - A) < 1e-6 and abs(k[1, -1]) < 1e-9

    def test_arbitrary_smooth_curve_fidelity(self):
        from mrphy_tpu import gamH, dt0, gmax0
        from mrphy_tpu.utils.traj import mintime_gradient, traj_check
        t = np.linspace(0, 1, 6001)
        path = 0.5 * np.stack([t * np.sin(4 * np.pi * t),
                               t * (1 - np.cos(4 * np.pi * t)),
                               0.8 * t * t])
        gr = mintime_gradient(path)
        traj_check(gr)
        import jax.numpy as jnp
        from mrphy_tpu.utils import g2k
        k = np.asarray(g2k(jnp.asarray(gr), False, dt=dt0))[0]
        # distance from every output sample to the dense input curve
        d2 = ((k[:, None, :] - path[:, :, None]) ** 2).sum(0)
        dev = np.sqrt(d2.min(0))
        assert dev.max() < 1.5 * gamH * gmax0 * dt0, dev.max()
