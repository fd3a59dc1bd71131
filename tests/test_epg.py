r"""Extended-Phase-Graph tests.

Gold validation: EPG is exactly the Fourier representation of a
uniformly dephased isochromat ensemble, so CPMG echo amplitudes from
``epg_cpmg`` must match a brute-force isochromat simulation (equally
spaced dephasing angles make the discrete Fourier sampling exact).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu import pi
from mrphy_tpu.ops import epg


def _iso_cpmg(flips, T1, T2, esp, nIso=64):
    r"""Brute-force isochromat CPMG: rotation matrices + relaxation,
    ensemble-averaged complex echo signals."""
    def rot_axis(phi, a):  # rotation by a about in-plane axis at phi
        Rz = np.array([[np.cos(phi), -np.sin(phi), 0],
                       [np.sin(phi), np.cos(phi), 0], [0, 0, 1.]])
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        return Rz @ Rx @ Rz.T

    thetas = 2 * np.pi * np.arange(nIso) / nIso
    Rz_th = np.stack([np.array(
        [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0],
         [0, 0, 1.]]) for t in thetas])
    E1, E2 = np.exp(-esp / 2 / T1), np.exp(-esp / 2 / T2)

    M = np.tile([0., 0., 1.], (nIso, 1))
    M = M @ rot_axis(np.pi / 2, np.pi / 2).T         # 90 about +y
    echoes = []
    for a in flips:
        M = M * [E2, E2, E1] + [0, 0, 1 - E1]
        M = np.einsum('nij,nj->ni', Rz_th, M)
        M = M @ rot_axis(0.0, a).T                   # refocus about +x
        M = M * [E2, E2, E1] + [0, 0, 1 - E1]
        M = np.einsum('nij,nj->ni', Rz_th, M)
        echoes.append(np.mean(M[:, 0] + 1j * M[:, 1]))
    return np.asarray(echoes)


class TestEPG:

    def test_perfect_cpmg_is_pure_t2_decay(self):
        T1, T2, esp, nE = 1.0, 0.08, 0.01, 10
        e = np.asarray(epg.epg_cpmg(jnp.full((nE,), pi, jnp.float64),
                                    T1=T1, T2=T2, esp=esp))
        want = np.exp(-(np.arange(1, nE + 1)) * esp / T2)
        np.testing.assert_allclose(np.hypot(e[..., 0], e[..., 1]), want,
                                   rtol=1e-9)

    def test_matches_isochromat_ensemble_imperfect_refocusing(self):
        r"""120° refocusing generates stimulated-echo pathways; EPG must
        reproduce the exact ensemble average (magnitudes compared —
        insensitive to rotation-handedness conventions)."""
        T1, T2, esp, nE = 0.6, 0.05, 0.012, 8
        rng = np.random.default_rng(0)
        flips = np.deg2rad(rng.uniform(100, 170, nE))
        e = np.asarray(epg.epg_cpmg(jnp.asarray(flips), T1=T1, T2=T2,
                                    esp=esp))
        e_epg = np.hypot(e[..., 0], e[..., 1])
        e_iso = np.abs(_iso_cpmg(flips, T1, T2, esp, nIso=64))
        np.testing.assert_allclose(e_epg, e_iso, atol=1e-9)

    def test_stimulated_echoes_exceed_pure_t2(self):
        r"""With reduced refocusing angles, stimulated-echo pathways
        (stored as Z states, immune to T2) make LATE echoes decay slower
        than exp(-t/T2) — the hallmark EPG effect driving B1-robust TSE."""
        T1, T2, esp, nE = 1.5, 0.05, 0.012, 12
        er = np.asarray(epg.epg_cpmg(
            jnp.full((nE,), np.deg2rad(120.0)), T1=T1, T2=T2, esp=esp))
        e = np.hypot(er[..., 0], er[..., 1])
        pure = np.exp(-(np.arange(1, nE + 1)) * esp / T2)
        assert e[-1] > pure[-1]
        # normalized late-echo ratio beats the pure-T2 ratio
        assert e[-1] / e[3] > pure[-1] / pure[3]

    def test_batched_voxel_maps(self):
        r"""Per-voxel T2 map + B1-scaled flip trains broadcast."""
        nV, nE = 5, 6
        T2 = jnp.asarray(np.linspace(0.03, 0.1, nV))
        b1 = jnp.asarray(np.linspace(0.7, 1.1, nV))[:, None]
        flips = b1 * pi * jnp.ones((nV, nE))
        e = epg.epg_cpmg(flips, T1=1.0, T2=T2, esp=0.01)
        assert e.shape == (nV, nE, 2)
        for v in range(nV):
            ev = epg.epg_cpmg(flips[v], T1=1.0, T2=T2[v], esp=0.01)
            np.testing.assert_allclose(np.asarray(e[v]), np.asarray(ev),
                                       atol=1e-12)

    def test_t2_fit_through_epg(self):
        r"""Echo-train T2 fitting by gradient descent through EPG (the
        flagship differentiability use-case: imperfect refocusing makes
        naive exponential fits biased; EPG-based fits are not)."""
        import optax
        T2_true, T1, esp, nE = 0.065, 1.2, 0.012, 10
        flips = jnp.full((nE,), np.deg2rad(140.0))
        def mag(e):
            return jnp.hypot(e[..., 0], e[..., 1])

        data = mag(epg.epg_cpmg(flips, T1=T1, T2=T2_true, esp=esp))

        def loss(logT2):
            e = mag(epg.epg_cpmg(flips, T1=T1, T2=jnp.exp(logT2),
                                 esp=esp))
            return jnp.sum((e - data) ** 2)

        p = jnp.log(jnp.asarray(0.03))          # bad init
        opt = optax.adam(0.1)

        @jax.jit
        def fit(p, st):
            def body(carry, _):
                p, st = carry
                up, st = opt.update(jax.grad(loss)(p), st)
                return (optax.apply_updates(p, up), st), None
            (p, st), _ = jax.lax.scan(body, (p, st), None, length=200)
            return p
        p = fit(p, opt.init(p))
        assert abs(float(jnp.exp(p)) - T2_true) < 1e-3
