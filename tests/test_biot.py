r"""Biot–Savart loop coils (`utils/biot.py`): five independent oracles.

1. AGM elliptic integrals vs `scipy.special` (1e-13, f64).
2. On-axis closed form B_z = μ0 I a² / (2 (a²+z²)^{3/2}).
3. Direct segment-quadrature Biot–Savart at ARBITRARY orientation and
   off-axis points (the strongest check: exercises the elliptic-integral
   branch, the frame construction, and the cylindrical→lab mapping at
   once).
4. ∇·B = 0 by exact autodiff Jacobians at random points.
5. Rotating-frame conventions (B1∓) and differentiability of coil
   placement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.special as sps

from mrphy_tpu.utils.biot import (ellipk, ellipe, loop_field, loop_b1,
                                  loop_ring)

MU0_CM = 4 * np.pi * 0.1      # μ0 in Gauss·cm/A


class TestElliptic:

    def test_vs_scipy(self):
        m = jnp.asarray(np.linspace(0.0, 0.999, 401), jnp.float64)
        np.testing.assert_allclose(np.asarray(ellipk(m)),
                                   sps.ellipk(np.asarray(m)),
                                   rtol=1e-13)
        np.testing.assert_allclose(np.asarray(ellipe(m)),
                                   sps.ellipe(np.asarray(m)),
                                   rtol=1e-13)

    def test_endpoints(self):
        assert float(ellipk(jnp.float64(0.0))) == pytest.approx(
            np.pi / 2, abs=1e-15)
        assert float(ellipe(jnp.float64(0.0))) == pytest.approx(
            np.pi / 2, abs=1e-15)
        # regression: E(1) = 1 exactly (the raw AGM degenerates at
        # b0 = 0 and used to return pi/4)
        assert float(ellipe(jnp.float64(1.0))) == 1.0
        m = jnp.asarray(1.0 - np.logspace(-12, -3, 10), jnp.float64)
        np.testing.assert_allclose(np.asarray(ellipe(m)),
                                   sps.ellipe(np.asarray(m)),
                                   rtol=1e-12)


def _quadrature_field(pts, center, normal, radius, current=1.0,
                      nseg=200_000):
    r"""Direct Biot–Savart: Σ (μ0/4π) I dl×r̂/|r|², numpy f64."""
    center = np.asarray(center, np.float64)
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    seed = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array(
        [0, 0, 1.0])
    e1 = seed - seed.dot(n) * n
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    th = 2 * np.pi * (np.arange(nseg) + 0.5) / nseg
    pos = (center[None] + radius * (np.cos(th)[:, None] * e1
                                    + np.sin(th)[:, None] * e2))
    dl = (2 * np.pi * radius / nseg) * (-np.sin(th)[:, None] * e1
                                        + np.cos(th)[:, None] * e2)
    B = np.zeros((len(pts), 3))
    for i, p in enumerate(np.asarray(pts, np.float64)):
        r = p[None] - pos
        rn = np.linalg.norm(r, axis=-1, keepdims=True)
        B[i] = (0.1 * current * np.cross(dl, r) / rn ** 3).sum(0)
    return B


class TestLoopField:

    def test_on_axis_closed_form(self):
        a, i0 = 4.0, 2.5
        z = jnp.asarray(np.linspace(-8, 8, 33), jnp.float64)
        pts = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
        B = np.asarray(loop_field(pts, center=jnp.zeros(3),
                                  normal=jnp.asarray([0., 0., 1.]),
                                  radius=a, current=i0))
        bz_exact = MU0_CM * i0 * a ** 2 / (
            2 * (a ** 2 + np.asarray(z) ** 2) ** 1.5)
        np.testing.assert_allclose(B[:, 2], bz_exact, rtol=1e-12)
        np.testing.assert_allclose(B[:, :2], 0.0, atol=1e-14)

    def test_vs_quadrature_arbitrary_orientation(self):
        rng = np.random.default_rng(5)
        center = np.array([1.0, -2.0, 0.5])
        normal = np.array([1.0, 2.0, -1.5])
        radius, cur = 3.0, 1.7
        pts = rng.uniform(-6, 6, (12, 3))
        # keep points a finite distance off the wire
        keep = []
        nn = normal / np.linalg.norm(normal)
        for p in pts:
            rel = p - center
            z = rel.dot(nn)
            rho = np.linalg.norm(rel - z * nn)
            if abs(rho - radius) > 0.7 or abs(z) > 0.7:
                keep.append(p)
        pts = np.asarray(keep)
        B = np.asarray(loop_field(jnp.asarray(pts), center=center,
                                  normal=normal, radius=radius,
                                  current=cur))
        Bq = _quadrature_field(pts, center, normal, radius, cur)
        np.testing.assert_allclose(B, Bq, rtol=2e-9, atol=1e-12)

    def test_divergence_free(self):
        jac = jax.jacfwd(lambda p: loop_field(
            p, center=jnp.asarray([0.5, 0.0, -1.0]),
            normal=jnp.asarray([0.3, -1.0, 0.8]), radius=2.0))
        rng = np.random.default_rng(7)
        for p in rng.uniform(-4, 4, (8, 3)):
            J = np.asarray(jac(jnp.asarray(p, jnp.float64)))
            assert abs(np.trace(J)) < 1e-12 * max(1.0, np.abs(J).max())

    def test_multi_coil_axis(self):
        centers, normals, radii = loop_ring(8, 12.0, 4.0)
        pts = jnp.asarray(np.random.default_rng(0).uniform(
            -4, 4, (10, 3)))
        B = loop_field(pts, center=centers, normal=normals,
                       radius=radii)
        assert B.shape == (10, 3, 8)
        # each column equals the single-coil call
        for c in (0, 3, 7):
            Bc = loop_field(pts, center=centers[c], normal=normals[c],
                            radius=radii[c])
            np.testing.assert_allclose(np.asarray(B[..., c]),
                                       np.asarray(Bc), rtol=1e-12)


    def test_batched_by_any_parameter(self):
        # regression: batching used to key off center.ndim alone —
        # a batched normal/radius with a shared center silently
        # dropped every coil but the first
        pts = jnp.asarray(np.random.default_rng(1).uniform(
            -3, 3, (6, 3)))
        normals = jnp.asarray([[0.0, 0, 1], [1.0, 0, 0]])
        B = loop_field(pts, center=jnp.zeros(3), normal=normals,
                       radius=5.0)
        assert B.shape == (6, 3, 2)
        for c in range(2):
            Bc = loop_field(pts, center=jnp.zeros(3),
                            normal=normals[c], radius=5.0)
            np.testing.assert_allclose(np.asarray(B[..., c]),
                                       np.asarray(Bc), rtol=1e-12)
        # radius-only batching, center/normal shared
        B2 = loop_field(pts, center=jnp.zeros(3), normal=normals[0],
                        radius=jnp.asarray([4.0, 6.0]))
        assert B2.shape == (6, 3, 2)
        from mrphy_tpu.utils.biot import loop_b1
        s = loop_b1(pts, center=jnp.zeros(3), normal=normals,
                    radius=5.0)
        assert s.shape == (6, 2, 2)      # (..., xy, nC) keeps nC = 2


class TestB1Conventions:

    def test_rx_tx_pair(self):
        r"""A transverse (x-normal) loop at its own center produces a
        purely-x field: B1± = Bx/2 with ±(−By)=0 imaginary part."""
        c = jnp.asarray([0., 0., 0.])
        n = jnp.asarray([1., 0., 0.])
        p = jnp.zeros((1, 3))
        B = np.asarray(loop_field(p, center=c, normal=n, radius=5.0))
        rx = np.asarray(loop_b1(p, center=c, normal=n, radius=5.0,
                                mode='rx'))
        tx = np.asarray(loop_b1(p, center=c, normal=n, radius=5.0,
                                mode='tx'))
        assert rx.shape == (1, 2, 1)
        np.testing.assert_allclose(rx[0, 0, 0], B[0, 0] / 2, rtol=1e-12)
        np.testing.assert_allclose(rx[0, 1, 0], 0.0, atol=1e-14)
        np.testing.assert_allclose(tx[0, 0, 0], B[0, 0] / 2, rtol=1e-12)
        # a z-normal loop contributes no rotating-frame field on axis
        b1z = np.asarray(loop_b1(p, center=c,
                                 normal=jnp.asarray([0., 0., 1.]),
                                 radius=5.0))
        np.testing.assert_allclose(b1z, 0.0, atol=1e-14)

    def test_conjugate_relation(self):
        r"""B1⁻ = conj(B1⁺) pointwise (real Bx, By)."""
        centers, normals, radii = loop_ring(4, 10.0, 3.0)
        pts = jnp.asarray(np.random.default_rng(1).uniform(
            -3, 3, (6, 3)))
        rx = np.asarray(loop_b1(pts, center=centers, normal=normals,
                                radius=radii, mode='rx'))
        tx = np.asarray(loop_b1(pts, center=centers, normal=normals,
                                radius=radii, mode='tx'))
        np.testing.assert_allclose(rx[:, 0], tx[:, 0], rtol=1e-12)
        np.testing.assert_allclose(rx[:, 1], -tx[:, 1], rtol=1e-12)

    def test_placement_gradient(self):
        r"""Coil placement is differentiable: d|B1|²/d(center) is
        finite and nonzero — the hook for array-layout optimization."""
        pts = jnp.asarray(np.random.default_rng(2).uniform(
            -2, 2, (5, 3)))

        def obj(center):
            s = loop_b1(pts, center=center,
                        normal=jnp.asarray([1., 0., 0.]), radius=4.0)
            return jnp.sum(s ** 2)

        g = jax.grad(obj)(jnp.asarray([6.0, 0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestRingGeometry:

    def test_ring_points_inward(self):
        centers, normals, radii = loop_ring(6, 9.0, 3.0, axis='z',
                                            z=1.5)
        np.testing.assert_allclose(np.linalg.norm(centers[:, :2],
                                                  axis=-1), 9.0)
        np.testing.assert_allclose(centers[:, 2], 1.5)
        # normals: unit, radially inward, ⊥ axis
        np.testing.assert_allclose(np.linalg.norm(normals, axis=-1),
                                   1.0)
        np.testing.assert_allclose(normals[:, 2], 0.0)
        inward = -centers[:, :2] / 9.0
        np.testing.assert_allclose(normals[:, :2], inward, atol=1e-12)
        np.testing.assert_allclose(radii, 3.0)
