r"""Extended-Phase-Graph tests.

Gold validation: EPG is exactly the Fourier representation of a
uniformly dephased isochromat ensemble, so CPMG echo amplitudes from
``epg_cpmg`` must match a brute-force isochromat simulation (equally
spaced dephasing angles make the discrete Fourier sampling exact).
"""

import numpy as np
import pytest
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


def _iso_spgr(flips, T1, T2, tr, nIso=64, kshift=1):
    r"""Brute-force isochromat FISP/SPGR (zero RF phases): RF about +x,
    read, relax TR, spoiler dephasing of ``kshift`` cycles."""
    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    thetas = kshift * 2 * np.pi * np.arange(nIso) / nIso
    Rz_th = np.stack([np.array(
        [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0],
         [0, 0, 1.]]) for t in thetas])
    E1, E2 = np.exp(-tr / T1), np.exp(-tr / T2)

    M = np.tile([0., 0., 1.], (nIso, 1))
    sigs = []
    for a in flips:
        M = M @ rx(a).T
        sigs.append(np.mean(M[:, 0] + 1j * M[:, 1]))
        M = M * [E2, E2, E1] + [0, 0, 1 - E1]
        M = np.einsum('nij,nj->ni', Rz_th, M)
    return np.asarray(sigs)


class TestEPGDepth:
    r"""Generalized shift operator + gradient-spoiled (SPGR/FISP)
    trains — the MRF-dictionary machinery."""

    def test_grad_composition_and_inverse(self):
        rng = np.random.default_rng(2)
        s = jnp.asarray(rng.normal(size=(3, 8, 2)))
        # k=2 equals two unit shifts
        np.testing.assert_allclose(epg.epg_grad(s, 2),
                                   epg.epg_grad(epg.epg_grad(s)),
                                   atol=1e-15)
        # +1 then -1 is identity for PHYSICAL states (where the
        # invariant F−(0) = conj(F+(0)) holds — both hemispheres view
        # the same k=0 coherence) that are not truncated at k=K-1
        s_low = jnp.asarray(s).at[..., -2:, :].set(0.)
        s_low = s_low.at[1, 0, 0].set(s_low[0, 0, 0])
        s_low = s_low.at[1, 0, 1].set(-s_low[0, 0, 1])
        rt = epg.epg_grad(epg.epg_grad(s_low, 1), -1)
        np.testing.assert_allclose(rt, s_low, atol=1e-15)
        rt2 = epg.epg_grad(epg.epg_grad(s_low, -1), 1)
        np.testing.assert_allclose(rt2, s_low, atol=1e-15)

    def test_spgr_matches_isochromat_ensemble(self):
        r"""FISP with variable (MRF-style) flips: EPG equals the exact
        uniformly-dephased ensemble average."""
        T1, T2, tr, nTR = 0.8, 0.06, 0.008, 12
        rng = np.random.default_rng(3)
        flips = np.deg2rad(rng.uniform(5, 70, nTR))
        e = np.asarray(epg.epg_spgr(jnp.asarray(flips), T1=T1, T2=T2,
                                    tr=tr))
        e_epg = np.hypot(e[..., 0], e[..., 1])
        e_iso = np.abs(_iso_spgr(flips, T1, T2, tr, nIso=64))
        np.testing.assert_allclose(e_epg, e_iso, atol=1e-9)

    def test_spgr_kshift2_matches_isochromat(self):
        r"""Double-area spoiler (kshift=2) against an ensemble dephased
        by two cycles per TR."""
        T1, T2, tr, nTR = 0.8, 0.06, 0.008, 8
        flips = np.deg2rad(np.full(nTR, 35.0))
        e = np.asarray(epg.epg_spgr(jnp.asarray(flips), T1=T1, T2=T2,
                                    tr=tr, kshift=2))
        e_epg = np.hypot(e[..., 0], e[..., 1])
        e_iso = np.abs(_iso_spgr(flips, T1, T2, tr, nIso=64, kshift=2))
        np.testing.assert_allclose(e_epg, e_iso, atol=1e-9)

    def test_rf_spoiled_reaches_ernst(self):
        r"""Quadratic 117° RF spoiling: the steady-state SPGR signal
        approaches the ideally-spoiled Ernst value (the textbook
        validation of RF spoiling)."""
        T1, T2, tr, nTR = 1.0, 0.08, 0.01, 600
        a = np.deg2rad(20.0)
        phis = epg.rf_spoil_phases(nTR)
        e = np.asarray(epg.epg_spgr(
            jnp.full((nTR,), a), phis, T1=T1, T2=T2, tr=tr))
        sig = np.hypot(e[..., 0], e[..., 1])
        E1 = np.exp(-tr / T1)
        ernst = np.sin(a) * (1 - E1) / (1 - np.cos(a) * E1)
        ss = np.mean(sig[-50:])
        # 117° quadratic spoiling is a good but not exact approximation
        # of ideal spoiling (classic Zur/Wood/Neuringer result): a few
        # percent off Ernst is physical, not a bug
        assert abs(ss - ernst) / ernst < 0.06, (ss, ernst)
        # and WITHOUT RF spoiling the FISP steady state is FARTHER from
        # Ernst (coherence pathways survive) — the schedule matters
        e0 = np.asarray(epg.epg_spgr(
            jnp.full((nTR,), a), None, T1=T1, T2=T2, tr=tr))
        s0 = np.mean(np.hypot(e0[..., 0], e0[..., 1])[-50:])
        assert abs(s0 - ernst) > abs(ss - ernst)
        assert abs(s0 - ernst) / ernst > 0.05

    def test_spgr_differentiable_and_batched(self):
        nV, nTR = 4, 10
        T2 = jnp.asarray(np.linspace(0.04, 0.1, nV))
        flips = jnp.full((nTR,), np.deg2rad(30.0))
        e = epg.epg_spgr(flips, T1=1.0, T2=T2, tr=0.01, te=0.004)
        assert e.shape == (nV, nTR, 2)

        def loss(T2):
            e = epg.epg_spgr(flips, T1=1.0, T2=T2, tr=0.01, te=0.004)
            return jnp.sum(e ** 2)
        g = jax.grad(loss)(T2)
        assert g.shape == (nV,) and bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestEPGDiffusion:
    r"""Diffusion weighting: the EPG b-factor attenuation must
    reproduce the Carr–Purcell–Meiboom–Gill closed form
    ``exp(−γ²G²D·esp³·n/12)`` for perfect refocusing in a constant
    gradient (with ``dk = γ·G·esp/2``, that is ``exp(−n·esp·dk²·D/3)``
    per echo)."""

    def test_cpmg_matches_carr_purcell_closed_form(self):
        nE, esp, T1, T2 = 16, 0.01, 1.0, 0.08
        D, dk = 2e-5, 668.0                  # cm^2/s; rad/cm per half-esp
        flips = pi * jnp.ones(nE)
        e = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=esp, D=D, dk=dk)
        mag = np.hypot(*np.moveaxis(np.asarray(e), -1, 0))
        n = np.arange(1, nE + 1)
        expect = np.exp(-n * esp / T2) * np.exp(-n * esp * dk ** 2
                                                * D / 3)
        np.testing.assert_allclose(mag, expect, rtol=1e-5)
        # and the attenuation is material (not testing 1 == 1)
        assert expect[-1] < 0.7 * np.exp(-nE * esp / T2)

    def test_d_zero_is_exact_noop(self):
        nE = 8
        flips = jnp.asarray(np.random.default_rng(0).uniform(
            2.0, pi, nE))
        e0 = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=0.01)
        e = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=0.01, D=0.0,
                         dk=400.0)
        np.testing.assert_allclose(e, e0, atol=1e-12)

    def test_stored_states_diffuse_without_gradient(self):
        # a pure F+(k=2) state under delta=0: exp(-D*tau*(2*dk)^2)
        K, D, dk, tau = 6, 1e-5, 300.0, 0.02
        s = epg.epg_state(K).at[2, 0, 0].set(0.0)
        s = s.at[0, 2, 0].set(1.0)
        out = epg.epg_diffusion(s, D, dk, tau, delta=0)
        np.testing.assert_allclose(
            out[0, 2, 0], np.exp(-D * tau * (2 * dk) ** 2), rtol=1e-6)
        # Z(k) attenuates with the same k^2 law, Z(0) not at all
        s2 = epg.epg_state(K).at[2, 3, 0].set(0.5)
        out2 = epg.epg_diffusion(s2, D, dk, tau, delta=0)
        np.testing.assert_allclose(
            out2[2, 3, 0], 0.5 * np.exp(-D * tau * (3 * dk) ** 2),
            rtol=1e-6)
        np.testing.assert_allclose(out2[2, 0, 0], 1.0, atol=1e-12)

    def test_spgr_diffusion_attenuates_and_d0_noop(self):
        nTR = 40
        flips = jnp.deg2rad(30.0) * jnp.ones(nTR)
        kw = dict(T1=1.0, T2=0.08, tr=0.01, te=0.004)
        s0 = epg.epg_spgr(flips, **kw)
        s_d0 = epg.epg_spgr(flips, D=0.0, dk=500.0, **kw)
        np.testing.assert_allclose(s_d0, s0, atol=1e-12)
        sD = epg.epg_spgr(flips, D=2e-5, dk=500.0, **kw)
        m0 = np.hypot(*np.moveaxis(np.asarray(s0), -1, 0))
        mD = np.hypot(*np.moveaxis(np.asarray(sD), -1, 0))
        # spoiler diffusion kills stored coherences: the late (steady
        # state) signal attenuates; the early transient can RISE (less
        # destructive interference) — both are the expected physics
        assert mD[-1] < 0.80 * m0[-1]
        assert mD[5] > m0[5]

    def test_cpmg_mesh_per_voxel_adc(self):
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        nV, nE = 16, 8
        rng = np.random.default_rng(5)
        flips = jnp.asarray(np.tile(np.pi * np.ones(nE), (nV, 1)))
        D = jnp.asarray(rng.uniform(1e-5, 3e-5, nV))
        e0 = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=0.01, D=D,
                          dk=500.0)
        e = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=0.01, D=D,
                         dk=500.0, mesh=mesh)
        np.testing.assert_allclose(e, e0, atol=1e-12)

    def test_adc_fit_gradient_flows(self):
        nE, esp, dk = 12, 0.01, 500.0
        flips = pi * jnp.ones(nE)
        truth = 2.3e-5
        target = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=esp,
                              D=truth, dk=dk)

        def loss(D):
            e = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=esp, D=D,
                             dk=dk)
            return jnp.sum((e - target) ** 2)

        g = jax.grad(loss)(jnp.asarray(1e-5))
        assert np.isfinite(g) and g != 0
        # one Newton-from-secant step moves toward the truth
        assert loss(1e-5) > loss(jnp.asarray(truth)) + 0


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


class TestAlphaEx:
    r"""`alpha_ex` (slice-profile-resolved excitation) semantics."""

    def test_default_matches_ideal(self):
        fl = jnp.full((5,), jnp.pi)
        a = epg.epg_cpmg(fl, T1=1.4, T2=0.08, esp=0.01)
        b = epg.epg_cpmg(fl, T1=1.4, T2=0.08, esp=0.01,
                         alpha_ex=jnp.pi / 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sin_alpha_scaling(self):
        r"""Perfect-180 train: echoes scale EXACTLY by sin(α) (F states
        are linear in the excited transverse magnetization, and no
        stimulated pathways exist at β=180°)."""
        nE, esp, T2 = 6, 0.01, 0.08
        fl = jnp.full((nE,), jnp.pi)
        exact = np.exp(-np.arange(1, nE + 1) * esp / T2)
        for a in (0.5, 1.1, jnp.pi / 2):
            e = np.asarray(epg.epg_cpmg(fl, T1=1.4, T2=T2, esp=esp,
                                        alpha_ex=a))
            m = np.hypot(e[..., 0], e[..., 1])
            np.testing.assert_allclose(m, np.sin(float(a)) * exact,
                                       rtol=1e-12)

    def test_batched_alpha_and_phase(self):
        r"""Per-voxel α AND per-voxel excitation phase batch together
        (the slice-profile-resolved T2-mapping configuration,
        examples/t2map_slice_profile.py); each row equals its own
        scalar call."""
        nE = 4
        fl = jnp.broadcast_to(2.4 * jnp.ones(nE), (3, nE))
        al = jnp.asarray([0.7, 1.2, jnp.pi / 2])
        ph = jnp.pi / 2 + jnp.asarray([-0.2, 0.0, 0.3])
        eb = np.asarray(epg.epg_cpmg(fl, T1=1.4, T2=0.08, esp=0.01,
                                     alpha_ex=al, phi_ex=ph))
        assert eb.shape == (3, nE, 2)
        for i in range(3):
            ei = np.asarray(epg.epg_cpmg(fl[i], T1=1.4, T2=0.08,
                                         esp=0.01, alpha_ex=al[i],
                                         phi_ex=ph[i]))
            np.testing.assert_allclose(eb[i], ei, rtol=1e-12, atol=1e-15)


class TestFusedTrainGrads:
    r"""``backend='pallas'`` trains are differentiable: the recompute-
    through-XLA custom VJP (``ops/_diffwrap.py``) makes ``jax.grad``
    through every fused dictionary kernel return the XLA backend's
    gradients. Tolerance 1e-6/f64, NOT 1e-9: the kernels emit f32, so
    the cotangent crosses one f32 rounding at the custom-vjp boundary
    (~1e-7 rel); in f32 pipelines the paths are identical."""

    def _mk(self, ntr=20, nA=6, seed=0):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        F = jnp.float64
        return (jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F),
                jnp.asarray(rng.uniform(0.3, 2.0, nA), F),
                jnp.asarray(rng.uniform(0.03, 0.3, nA), F),
                jnp.asarray(rng.uniform(0.8, 1.2, nA), F),
                jnp.asarray(rng.standard_normal((nA, ntr, 2)), F))

    def _check(self, f, flips, T1, T2, w):
        import jax
        import jax.numpy as jnp
        gx = jax.grad(lambda *a: jnp.sum(w * f(*a, 'xla')),
                      argnums=(0, 1, 2))(flips, T1, T2)
        gp = jax.grad(lambda *a: jnp.sum(w * f(*a, 'pallas')),
                      argnums=(0, 1, 2))(flips, T1, T2)
        for name, x, p in zip(('flips', 'T1', 'T2'), gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < 1e-6, (name, rel)

    def test_spgr(self):
        from mrphy_tpu.ops import epg
        flips, T1, T2, b1, w = self._mk()
        self._check(lambda fl, t1, t2, be: epg.epg_spgr(
            fl, None, T1=t1, T2=t2, tr=12e-3, te=3e-3, K=12, b1=b1,
            backend=be), flips, T1, T2, w)

    def test_cpmg(self):
        from mrphy_tpu.ops import epg
        flips, T1, T2, b1, w = self._mk()
        self._check(lambda fl, t1, t2, be: epg.epg_cpmg(
            fl, T1=t1, T2=t2, esp=0.01, b1=b1, backend=be),
            flips, T1, T2, w)

    def test_epgx_spgr(self):
        from mrphy_tpu.ops import epg
        flips, T1, T2, b1, w = self._mk()
        self._check(lambda fl, t1, t2, be: epg.epgx_spgr(
            fl, None, T1a=t1, T2a=t2, T1b=0.5, T2b=0.02, kab=4.0,
            kba=20.0, tr=12e-3, K=10, b1=b1, backend=be),
            flips, T1, T2, w)

    def test_epgx_cpmg_exchange_param_grads(self):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg
        flips, T1, T2, b1, w = self._mk()
        F = jnp.float64

        def loss(kab, t2b, be):
            s = epg.epgx_cpmg(flips, T1a=T1, T2a=T2, T1b=0.5, T2b=t2b,
                              kab=kab, kba=20.0, esp=0.01, b1=b1,
                              backend=be)
            return jnp.sum(w * s)

        args = (jnp.asarray(4.0, F), jnp.asarray(0.02, F))
        gx = jax.grad(loss, argnums=(0, 1))(*args, 'xla')
        gp = jax.grad(loss, argnums=(0, 1))(*args, 'pallas')
        # 2e-5, not 1e-6: this path now runs the NATIVE in-kernel
        # two-pool adjoint (all-f32), not the f64 XLA recompute
        for name, x, p in zip(('kab', 'T2b'), gx, gp):
            rel = abs(float(x - p)) / (abs(float(x)) + 1e-30)
            assert rel < 2e-5, (name, rel)

    def test_epgx_mt_spgr_grads(self):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg
        rng = np.random.default_rng(5)
        F = jnp.float64
        ntr, nA = 16, 5
        flips = jnp.asarray(np.deg2rad(rng.uniform(10, 40, ntr)), F)
        wt = jnp.asarray(rng.uniform(0.0, 20.0, ntr), F)
        T1a = jnp.asarray(rng.uniform(0.5, 2.0, nA), F)
        kba = jnp.asarray(rng.uniform(10.0, 40.0, nA), F)
        w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), F)

        def loss(t1a, kb, be):
            s = epg.epgx_mt_spgr(flips, None, T1a=t1a, T2a=0.08,
                                 T1b=1.0, kab=4.0, kba=kb, tr=0.03,
                                 wt=wt, M0a=1.0, M0b=0.15, K=8,
                                 backend=be)
            return jnp.sum(w * s)

        gx = jax.grad(loss, argnums=(0, 1))(T1a, kba, 'xla')
        gp = jax.grad(loss, argnums=(0, 1))(T1a, kba, 'pallas')
        for name, x, p in zip(('T1a', 'kba'), gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            # 2e-5, not the diffwrap-era 1e-6: since round 3 this path
            # runs the NATIVE in-kernel MT adjoint (f32 recompute +
            # transposed recursion) — same bar as the other native
            # adjoints (measured 1.7e-6 on kba here)
            assert rel < 2e-5, (name, rel)


class TestFusedSpgrAdjoint:
    r"""The hand-transposed in-kernel SPGR adjoint
    (``epg_pallas._spgr_bwd_kernel``) vs the XLA backend's autodiff —
    the native fused gradient path that replaces the recompute-
    through-XLA VJP when it fits (round 3). K=64/nTR=80 forces the
    multi-chunk checkpoint restarts."""

    # tol 2e-5, not the diffwrap tests' 1e-6: the native adjoint runs
    # entirely in f32 (state recompute + transposed recursion), while
    # the recompute-through-XLA VJP reverses in f64 under x64. A
    # transposition error would show at 1e-3+.
    def _check(self, ntr, nA, K, kshift=1, b1=None, seed=0, tol=2e-5):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        assert epg_pallas.spgr_bwd_is_available(nTR=ntr, K=K, nA=nA)
        rng = np.random.default_rng(seed)
        F = jnp.float64
        flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F)
        phis = jnp.asarray(epg.rf_spoil_phases(ntr), F)
        T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), F)
        T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), F)
        M0 = jnp.asarray(rng.uniform(0.8, 1.2, nA), F)
        w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), F)
        args = [flips, phis, T1, T2, M0]
        names = ['flips', 'phis', 'T1', 'T2', 'M0']
        if b1 is not None:
            args.append(jnp.asarray(b1, F))
            names.append('b1')

        def loss(be, *a):
            kw = dict(T1=a[2], T2=a[3], tr=12e-3, te=3e-3, M0=a[4],
                      K=K, kshift=kshift, backend=be)
            if b1 is not None:
                kw['b1'] = a[5]
            return jnp.sum(w * epg.epg_spgr(a[0], a[1], **kw))

        an = tuple(range(len(args)))
        gx = jax.grad(lambda *a: loss('xla', *a), argnums=an)(*args)
        gp = jax.grad(lambda *a: loss('pallas', *a), argnums=an)(*args)
        for name, x, p in zip(names, gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < tol, (name, rel)

    def test_single_chunk(self):
        self._check(20, 6, 12)

    def test_multi_chunk(self):
        # larger K*nTR accumulates more f32 rounding: the XLA path
        # ITSELF at f32 differs from its f64 run by 1.4e-4 on the T1
        # gradient at this scale (measured), so 5e-4 is the honest
        # f32 bar. The chunk restarts are EXACT — forcing tc=nTR
        # gives bit-identical fused gradients (verified).
        self._check(80, 5, 64, tol=5e-4)

    def test_negative_kshift(self):
        self._check(24, 4, 14, kshift=-1)

    def test_double_kshift(self):
        self._check(24, 4, 20, kshift=2)

    def test_b1_grads(self):
        rng = np.random.default_rng(9)
        self._check(24, 8, 12, b1=rng.uniform(0.8, 1.2, 8))

    def test_gate_falls_back_to_recompute_vjp(self):
        # a K too large for the scratch must still differentiate
        # (the recompute-through-XLA wrapper takes over)
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        assert not epg_pallas.spgr_bwd_is_available(nTR=2048, K=2049,
                                                    nA=4)
        flips = jnp.full((8,), 0.3, jnp.float64)
        g = jax.grad(lambda fl: jnp.sum(epg.epg_spgr(
            fl, None, T1=1.0, T2=0.1, tr=0.01, backend='pallas',
            K=None)))(flips)   # K=None -> nTR+1, still available; and
        assert bool(jnp.all(jnp.isfinite(g)))


class TestSpgrMRFSchedule:
    r"""Round 4: the canonical MRF-FISP acquisition (Jiang et al. MRM
    74:1621, 2015 — inversion prep + variable-flip/TR train) through
    ``epg_spgr``: ``zinit``/``ir_prep`` and `(nTR,)` ``tr``/``te``
    trains, XLA and fused-Pallas, forward and gradients."""

    def _setup(self, ntr=24, nA=5, seed=0):
        rng = np.random.default_rng(seed)
        F = jnp.float64
        from mrphy_tpu.ops import epg
        return dict(
            flips=jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F),
            phis=jnp.asarray(epg.rf_spoil_phases(ntr), F),
            trs=jnp.asarray(rng.uniform(10e-3, 15e-3, ntr), F),
            tes=jnp.asarray(rng.uniform(2e-3, 4e-3, ntr), F),
            T1=jnp.asarray(rng.uniform(0.3, 2.0, nA), F),
            T2=jnp.asarray(rng.uniform(0.03, 0.3, nA), F),
            M0=jnp.asarray(rng.uniform(0.8, 1.2, nA), F),
            w=jnp.asarray(rng.standard_normal((nA, ntr, 2)), F))

    def test_ir_prep_closed_form(self):
        from mrphy_tpu.ops import epg
        # perfect inversion at TI=0 gives -M0; TI >> T1 recovers M0
        assert abs(float(epg.ir_prep(0.0, 1.0, 1.3)) + 1.3) < 1e-12
        assert abs(float(epg.ir_prep(50.0, 1.0, 1.3)) - 1.3) < 1e-9
        # inv_eff=0 is a no-op prep... of a saturated pulse: M0(1-e)
        got = float(epg.ir_prep(0.3, 1.0, 1.0, inv_eff=0.0))
        assert abs(got - (1 - np.exp(-0.3))) < 1e-12

    def test_const_train_equals_scalar(self):
        # (nTR,) constant tr/te trains run the vartr path yet must
        # reproduce the scalar path exactly on XLA
        from mrphy_tpu.ops import epg
        s = self._setup()
        ntr = s['flips'].shape[0]
        a = epg.epg_spgr(s['flips'], s['phis'], T1=s['T1'], T2=s['T2'],
                         tr=12e-3, te=3e-3, K=14)
        b = epg.epg_spgr(s['flips'], s['phis'], T1=s['T1'], T2=s['T2'],
                         tr=jnp.full(ntr, 12e-3, jnp.float64),
                         te=jnp.full(ntr, 3e-3, jnp.float64), K=14)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-14)

    def test_zinit_vs_manual_prep(self):
        # zinit must equal manually seeding the EPG state
        from mrphy_tpu.ops import epg
        s = self._setup(nA=3)
        zi = epg.ir_prep(0.021, s['T1'], s['M0'])
        a = epg.epg_spgr(s['flips'], s['phis'], T1=s['T1'], T2=s['T2'],
                         tr=12e-3, te=3e-3, M0=s['M0'], zinit=zi, K=14)
        # manual: one relax-free composition from the seeded state
        K = 14
        st = epg.epg_state(K, (3,), M0=zi, dtype=jnp.float64)

        def step(st, x):
            a_, phi = x
            st = epg.epg_rf(st, a_, phi)
            fr, fi = st[..., 0, 0, 0], st[..., 0, 0, 1]
            c, si = jnp.cos(phi), jnp.sin(phi)
            sig = np.exp(-3e-3) ** (1 / np.asarray(s['T2'], float)) \
                [:, None] * jnp.stack([c * fr + si * fi,
                                       c * fi - si * fr], -1)
            st = epg.epg_relax(st, 12e-3, s['T1'], s['T2'], s['M0'])
            st = epg.epg_grad(st, 1)
            return st, sig

        _, sigs = jax.lax.scan(
            step, st, (jnp.broadcast_to(s['flips'], (3, 24)).T,
                       jnp.broadcast_to(s['phis'], (3, 24)).T))
        want = jnp.moveaxis(sigs, 0, -2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   atol=1e-12)

    def test_pallas_fwd_parity_vartr_zinit(self):
        from mrphy_tpu.ops import epg
        s = self._setup()
        zi = epg.ir_prep(0.021, s['T1'], s['M0'])
        kw = dict(T1=s['T1'], T2=s['T2'], tr=s['trs'], te=s['tes'],
                  M0=s['M0'], zinit=zi, K=14)
        x = epg.epg_spgr(s['flips'], s['phis'], backend='xla', **kw)
        p = epg.epg_spgr(s['flips'], s['phis'], backend='pallas', **kw)
        rel = float(jnp.max(jnp.abs(x - p)) / jnp.max(jnp.abs(x)))
        assert rel < 2e-5, rel

    def test_native_adjoint_vartr_zinit(self, b1=None, ntr=24,
                                        tol=5e-5):
        import jax
        from mrphy_tpu.ops import epg
        s = self._setup(ntr=ntr)
        args = [s['flips'], s['phis'], s['trs'], s['tes'], s['T1'],
                s['T2'], s['M0'],
                epg.ir_prep(0.021, s['T1'], s['M0'])]
        names = ['flips', 'phis', 'tr', 'te', 'T1', 'T2', 'M0',
                 'zinit']
        if b1 is not None:
            args.append(jnp.asarray(b1, jnp.float64))
            names.append('b1')

        def loss(be, *a):
            kw = dict(T1=a[4], T2=a[5], tr=a[2], te=a[3], M0=a[6],
                      zinit=a[7], K=14, backend=be)
            if b1 is not None:
                kw['b1'] = a[8]
            return jnp.sum(s['w'] * epg.epg_spgr(a[0], a[1], **kw))

        an = tuple(range(len(args)))
        gx = jax.grad(lambda *a: loss('xla', *a), argnums=an)(*args)
        gp = jax.grad(lambda *a: loss('pallas', *a), argnums=an)(*args)
        for name, x, p in zip(names, gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < tol, (name, rel)

    def test_native_adjoint_vartr_b1(self):
        rng = np.random.default_rng(11)
        self.test_native_adjoint_vartr_zinit(b1=rng.uniform(0.7, 1.3,
                                                            5))

    @pytest.mark.slow
    def test_native_adjoint_vartr_multichunk(self):
        # nTR=80 at K=64 forces tc=40, ntc=2 checkpoint restarts in
        # the vartr mode too (see _pick_tc_spgr); larger f32
        # accumulation -> the SPGR multi-chunk bar
        import jax
        from mrphy_tpu.ops import epg, epg_pallas
        s = self._setup(ntr=80, nA=4, seed=3)
        assert epg_pallas._pick_tc_spgr(80, 64) < 80

        def loss(be, fl, trv, t1, t2):
            return jnp.sum(s['w'] * epg.epg_spgr(
                fl, s['phis'], T1=t1, T2=t2, tr=trv, te=3e-3, K=64,
                backend=be))

        an = tuple(range(4))
        a = (s['flips'], s['trs'], s['T1'], s['T2'])
        gx = jax.grad(lambda *x: loss('xla', *x), argnums=an)(*a)
        gp = jax.grad(lambda *x: loss('pallas', *x), argnums=an)(*a)
        for name, x, p in zip(('flips', 'tr', 'T1', 'T2'), gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < 5e-4, (name, rel)

    def test_diffusion_in_kernel(self):
        r"""Round 4: spoiler diffusion in the fused SPGR kernel —
        per-order attenuation planes exactly matching
        ``epg_diffusion(delta=kshift)``, with the dD chain carried by
        the in-kernel adjoint (diffusion-MRF dictionaries)."""
        import jax
        from mrphy_tpu.ops import epg
        rng = np.random.default_rng(17)
        ntr, nA, K = 24, 5, 14
        F = jnp.float64
        flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F)
        phis = jnp.asarray(epg.rf_spoil_phases(ntr), F)
        T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), F)
        T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), F)
        Dv = jnp.asarray(rng.uniform(0.5e-5, 3e-5, nA), F)
        w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), F)
        for ks, b1 in ((1, None),
                       (2, jnp.asarray(rng.uniform(0.7, 1.3, nA), F))):
            kw = dict(T1=T1, T2=T2, tr=12e-3, te=3e-3, K=K + 6 * ks,
                      dk=500.0, kshift=ks, b1=b1)
            x = epg.epg_spgr(flips, phis, D=Dv, backend='xla', **kw)
            p = epg.epg_spgr(flips, phis, D=Dv, backend='pallas',
                             **kw)
            rel = float(jnp.max(jnp.abs(x - p)) / jnp.max(jnp.abs(x)))
            assert rel < 2e-5, (ks, rel)
            # D must actually matter (sensitivity, not a no-op)
            x0 = epg.epg_spgr(flips, phis, backend='pallas', **kw)
            assert float(jnp.max(jnp.abs(x0 - p))) > 1e-3

            def loss(be, t2, d):
                return jnp.sum(w * epg.epg_spgr(
                    flips, phis, D=d, backend=be,
                    **{**kw, 'T2': t2}))

            gx = jax.grad(lambda *a: loss('xla', *a),
                          argnums=(0, 1))(T2, Dv)
            gp = jax.grad(lambda *a: loss('pallas', *a),
                          argnums=(0, 1))(T2, Dv)
            for n, xg, pg in zip(('T2', 'D'), gx, gp):
                r = float(jnp.max(jnp.abs(xg - pg))
                          / (jnp.max(jnp.abs(xg)) + 1e-30))
                assert r < 5e-5, (ks, n, r)

    def test_diffusion_in_kernel_variable_tr(self):
        r"""Round 4 (continued): spoiler diffusion composed with the
        variable-TR/TE canonical-FISP schedule — the kernel recomputes
        the attenuation planes per step from the rate row ``D·dk²``
        and the SMEM tr train, and the adjoint chains dD (per-TR
        weighted) AND the tr train's diffusion row. Gradient parity
        vs the XLA scan at f64/kernel-f32 tolerance."""
        import jax
        from mrphy_tpu.ops import epg
        rng = np.random.default_rng(23)
        ntr, nA = 24, 5
        F = jnp.float64
        flips = jnp.asarray(np.deg2rad(rng.uniform(10, 60, ntr)), F)
        phis = jnp.asarray(epg.rf_spoil_phases(ntr), F)
        trs = jnp.asarray(rng.uniform(9e-3, 15e-3, ntr), F)
        tes = jnp.asarray(rng.uniform(2e-3, 4e-3, ntr), F)
        T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), F)
        T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), F)
        Dv = jnp.asarray(rng.uniform(0.5e-5, 3e-5, nA), F)
        b1 = jnp.asarray(rng.uniform(0.7, 1.3, nA), F)
        w = jnp.asarray(rng.standard_normal((nA, ntr, 2)), F)
        for ks, b1v in ((1, None), (2, b1)):
            kw = dict(T1=T1, T2=T2, K=14 + 6 * ks, dk=500.0,
                      kshift=ks, b1=b1v, te=tes)
            x = epg.epg_spgr(flips, phis, D=Dv, tr=trs,
                             backend='xla', **kw)
            p = epg.epg_spgr(flips, phis, D=Dv, tr=trs,
                             backend='pallas', **kw)
            rel = float(jnp.max(jnp.abs(x - p)) / jnp.max(jnp.abs(x)))
            assert rel < 2e-5, (ks, rel)
            p0 = epg.epg_spgr(flips, phis, tr=trs, backend='pallas',
                              **kw)
            assert float(jnp.max(jnp.abs(p0 - p))) > 1e-3

            def loss(be, t2, d, trv):
                return jnp.sum(w * epg.epg_spgr(
                    flips, phis, D=d, tr=trv, backend=be,
                    **{**kw, 'T2': t2}))

            gx = jax.grad(lambda *a: loss('xla', *a),
                          argnums=(0, 1, 2))(T2, Dv, trs)
            gp = jax.grad(lambda *a: loss('pallas', *a),
                          argnums=(0, 1, 2))(T2, Dv, trs)
            for n, xg, pg in zip(('T2', 'D', 'tr'), gx, gp):
                r = float(jnp.max(jnp.abs(xg - pg))
                          / (jnp.max(jnp.abs(xg)) + 1e-30))
                assert r < 5e-5, (ks, n, r)

    def test_sharded_mesh_parity(self):
        from mrphy_tpu.ops import epg
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        rng = np.random.default_rng(13)
        nV, ntr = 16, 12
        flips = jnp.asarray(rng.uniform(0.2, 1.0, ntr), jnp.float32)
        trs = jnp.asarray(rng.uniform(10e-3, 14e-3, ntr), jnp.float32)
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, nV), jnp.float32)
        T2 = jnp.asarray(rng.uniform(0.03, 0.2, nV), jnp.float32)
        zi = epg.ir_prep(0.02, T1)
        kw = dict(T1=T1, T2=T2, tr=trs, te=3e-3, zinit=zi, K=8)
        a = epg.epg_spgr(flips, **kw)
        b = epg.epg_spgr(flips, mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        # batched per-voxel flips shard too; grads flow
        flb = jnp.asarray(rng.uniform(0.2, 1.0, (nV, ntr)), jnp.float32)
        a = epg.epg_spgr(flb, T1=T1, T2=T2, tr=trs, te=3e-3, K=8)
        b = epg.epg_spgr(flb, T1=T1, T2=T2, tr=trs, te=3e-3, K=8,
                         mesh=mesh)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        g = jax.grad(lambda t1: jnp.sum(epg.epg_spgr(
            flips, T1=t1, T2=T2, tr=trs, te=3e-3, K=8, mesh=mesh)
            ** 2))(T1)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestFusedCpmgAdjoint:
    r"""The in-kernel CPMG adjoint (``epg_pallas._cpmg_bwd_kernel``) vs
    the XLA backend's autodiff — volume T2/MWF fitting gradients
    (flips, T1, T2, esp, M0, excitation, b1) at kernel speed.
    nE=96 forces the multi-chunk restarts."""

    def _check(self, nE, nA, b1=None, alpha_ex=None, seed=0, tol=2e-5):
        import jax
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        assert epg_pallas.cpmg_bwd_is_available(nE=nE, nA=nA)
        rng = np.random.default_rng(seed)
        F = jnp.float64
        flips = jnp.asarray(np.deg2rad(rng.uniform(120, 180, nE)), F)
        T1 = jnp.asarray(rng.uniform(0.3, 2.0, nA), F)
        T2 = jnp.asarray(rng.uniform(0.03, 0.3, nA), F)
        M0 = jnp.asarray(rng.uniform(0.8, 1.2, nA), F)
        esp = jnp.asarray(0.01, F)
        w = jnp.asarray(rng.standard_normal((nA, nE, 2)), F)
        args = [flips, T1, T2, esp, M0]
        names = ['flips', 'T1', 'T2', 'esp', 'M0']
        kwn = []
        if b1 is not None:
            args.append(jnp.asarray(b1, F))
            names.append('b1')
            kwn.append('b1')
        if alpha_ex is not None:
            args.append(jnp.asarray(alpha_ex, F))
            names.append('alpha_ex')
            kwn.append('alpha_ex')

        def loss(be, *a):
            kw = dict(T1=a[1], T2=a[2], esp=a[3], M0=a[4], backend=be)
            for i, n in enumerate(kwn):
                kw[n] = a[5 + i]
            return jnp.sum(w * epg.epg_cpmg(a[0], **kw))

        an = tuple(range(len(args)))
        gx = jax.grad(lambda *a: loss('xla', *a), argnums=an)(*args)
        gp = jax.grad(lambda *a: loss('pallas', *a), argnums=an)(*args)
        for name, x, p in zip(names, gx, gp):
            rel = float(jnp.max(jnp.abs(x - p))
                        / (jnp.max(jnp.abs(x)) + 1e-30))
            assert rel < tol, (name, rel)

    def test_basic(self):
        self._check(16, 6)

    def test_multi_chunk(self):
        self._check(96, 4, tol=2e-4)   # f32 bar at nE*K scale

    def test_b1_and_sliceprofile_excitation(self):
        rng = np.random.default_rng(11)
        self._check(20, 8, b1=rng.uniform(0.8, 1.2, 8),
                    alpha_ex=rng.uniform(1.2, 1.6, 8))


class TestFusedEpgxAdjoints:
    r"""The in-kernel EPG-X adjoints (two-pool SPGR and CPMG) vs the
    XLA backend's autodiff — volume MWF/exchange-MRF fitting
    gradients. All-f32 kernels vs the f64 XLA reverse: 2e-5 bar
    (multi-chunk at K·nTR scale: 5e-4, cf. the single-pool batteries)."""

    def _mk(self, n, nA, seed=0):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        F = jnp.float64
        return (jnp.asarray(np.deg2rad(rng.uniform(60, 180, n)), F),
                jnp.asarray(rng.uniform(0.5, 2.0, nA), F),
                jnp.asarray(rng.uniform(0.06, 0.12, nA), F),
                jnp.asarray(rng.uniform(2.0, 8.0, nA), F),
                jnp.asarray(rng.uniform(0.8, 1.2, nA), F),
                jnp.asarray(rng.standard_normal((nA, n, 2)), F))

    def _grads(self, loss, args, names, tol):
        import jax
        import jax.numpy as jnp
        an = tuple(range(len(args)))
        gx = jax.grad(lambda *a: loss('xla', *a), argnums=an)(*args)
        gp = jax.grad(lambda *a: loss('pallas', *a),
                      argnums=an)(*args)
        for name, x, p in zip(names, gx, gp):
            rel = float(jnp.max(jnp.abs(jnp.asarray(x - p)))
                        / (jnp.max(jnp.abs(jnp.asarray(x))) + 1e-30))
            assert rel < tol, (name, rel)

    def test_xspgr(self):
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        ntr, nA = 24, 5
        assert epg_pallas.xspgr_bwd_is_available(nTR=ntr, K=12, nA=nA)
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA)
        F = jnp.float64

        def loss(be, fl, t1a, t2a, k_, dfb, m0b, b_):
            s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=t2a, T1b=1.0,
                              T2b=0.02, kab=k_, kba=20.0, tr=12e-3,
                              M0a=1.0, M0b=m0b, dfb=dfb, K=12, b1=b_,
                              backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, jnp.asarray(120.0, F),
                     jnp.asarray(0.15, F), b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'dfb', 'M0b',
                     'b1'), 2e-5)

    def test_xspgr_multichunk(self):
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        ntr, nA, K = 64, 4, 40
        from mrphy_tpu.ops.epg_pallas import _pick_tc_x
        assert _pick_tc_x(ntr, K) < ntr      # chunked
        assert epg_pallas.xspgr_bwd_is_available(nTR=ntr, K=K, nA=nA)
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA, seed=2)

        def loss(be, fl, t1a, k_):
            s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                              T2b=0.02, kab=k_, kba=20.0, tr=12e-3,
                              K=K, backend=be)
            return jnp.sum(w * s)

        self._grads(loss, (flips, T1a, kab),
                    ('flips', 'T1a', 'kab'), 5e-4)

    def test_xspgr_vartr(self):
        r"""Round 5: the `(nTR,)` variable-TR two-pool train runs the
        fused kernel with the per-step streamed-propagator adjoint —
        grads in every rate, the tr train, flips and b1 must match the
        XLA scan's autodiff."""
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        ntr, nA = 24, 5
        assert epg_pallas.xspgr_bwd_is_available(nTR=ntr, K=12, nA=nA,
                                                 varint=True)
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA, seed=7)
        F = jnp.float64
        rng = np.random.default_rng(8)
        trs = jnp.asarray(rng.uniform(0.009, 0.018, ntr), F)

        def loss(be, fl, t1a, t2a, k_, tr_, m0b, b_):
            s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=t2a, T1b=1.0,
                              T2b=0.02, kab=k_, kba=20.0, tr=tr_,
                              M0a=1.0, M0b=m0b, dfb=35.0, K=12, b1=b_,
                              backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, trs, jnp.asarray(0.15, F),
                     b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'trs', 'M0b',
                     'b1'), 2e-5)

    def test_xspgr_vartr_multichunk(self):
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg
        from mrphy_tpu.ops.epg_pallas import _pick_tc_x
        ntr, nA, K = 64, 4, 40
        assert _pick_tc_x(ntr, K) < ntr      # chunked
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA, seed=9)
        rng = np.random.default_rng(10)
        trs = jnp.asarray(rng.uniform(0.009, 0.018, ntr), jnp.float64)

        def loss(be, fl, t1a, k_, tr_):
            s = epg.epgx_spgr(fl, None, T1a=t1a, T2a=0.08, T1b=1.0,
                              T2b=0.02, kab=k_, kba=20.0, tr=tr_,
                              K=K, backend=be)
            return jnp.sum(w * s)

        self._grads(loss, (flips, T1a, kab, trs),
                    ('flips', 'T1a', 'kab', 'trs'), 5e-4)

    def test_xcpmg(self):
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        nE, nA = 20, 6
        assert epg_pallas.xcpmg_bwd_is_available(nE=nE, nA=nA)
        flips, T1a, T2a, kab, b1, w = self._mk(nE, nA, seed=3)
        F = jnp.float64

        def loss(be, fl, t1a, t2a, k_, esp, m0b, b_):
            s = epg.epgx_cpmg(fl, T1a=t1a, T2a=t2a, T1b=1.0,
                              T2b=0.015, kab=k_, kba=18.0, esp=esp,
                              M0a=1.0, M0b=m0b, dfb=30.0, b1=b_,
                              backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, jnp.asarray(0.01, F),
                     jnp.asarray(0.15, F), b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'esp', 'M0b',
                     'b1'), 2e-5)

    def test_mt_spgr(self):
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        ntr, nA = 24, 5
        assert epg_pallas.mt_bwd_is_available(nTR=ntr, K=12, nA=nA)
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA, seed=5)
        rng = np.random.default_rng(6)
        F = jnp.float64
        wt = jnp.asarray(rng.uniform(0.0, 30.0, ntr), F)

        def loss(be, fl, t1a, t2a, k_, wt_, m0b, b_):
            s = epg.epgx_mt_spgr(fl, None, T1a=t1a, T2a=t2a, T1b=1.0,
                                 kab=k_, kba=20.0, tr=0.03, wt=wt_,
                                 M0a=1.0, M0b=m0b, K=12, b1=b_,
                                 backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, wt, jnp.asarray(0.15, F),
                     b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'wt', 'M0b', 'b1'),
                    2e-5)

    def test_xcpmg_varesp(self):
        r"""Round 5: `(nEcho,)` spacing trains run the fused two-pool
        CPMG kernel (per-step streamed propagators at esp_t/2, summed
        two-half entry-cotangent rows)."""
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        nE, nA = 20, 6
        assert epg_pallas.xcpmg_bwd_is_available(nE=nE, nA=nA,
                                                 varint=True)
        flips, T1a, T2a, kab, b1, w = self._mk(nE, nA, seed=13)
        rng = np.random.default_rng(14)
        esps = jnp.asarray(rng.uniform(0.006, 0.015, nE), jnp.float64)

        def loss(be, fl, t1a, t2a, k_, esp, m0b, b_):
            s = epg.epgx_cpmg(fl, T1a=t1a, T2a=t2a, T1b=1.0,
                              T2b=0.015, kab=k_, kba=18.0, esp=esp,
                              M0a=1.0, M0b=m0b, dfb=30.0, b1=b_,
                              backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, esps,
                     jnp.asarray(0.15, jnp.float64), b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'esps', 'M0b',
                     'b1'), 2e-5)

    def test_mt_spgr_vartr(self):
        r"""Round 5: `(nTR,)` TR trains run the fused MT kernel
        (per-TR streamed [Z, ra, rb, E2a] planes)."""
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        ntr, nA = 24, 5
        assert epg_pallas.mt_bwd_is_available(nTR=ntr, K=12, nA=nA,
                                              varint=True)
        flips, T1a, T2a, kab, b1, w = self._mk(ntr, nA, seed=15)
        rng = np.random.default_rng(16)
        F = jnp.float64
        wt = jnp.asarray(rng.uniform(0.0, 30.0, ntr), F)
        trs = jnp.asarray(rng.uniform(0.02, 0.05, ntr), F)

        def loss(be, fl, t1a, t2a, k_, tr_, m0b, b_):
            s = epg.epgx_mt_spgr(fl, None, T1a=t1a, T2a=t2a, T1b=1.0,
                                 kab=k_, kba=20.0, tr=tr_, wt=wt,
                                 M0a=1.0, M0b=m0b, K=12, b1=b_,
                                 backend=be)
            return jnp.sum(w * s)

        self._grads(loss,
                    (flips, T1a, T2a, kab, trs, jnp.asarray(0.15, F),
                     b1),
                    ('flips', 'T1a', 'T2a', 'kab', 'trs', 'M0b',
                     'b1'), 2e-5)

    def test_cpmg_varesp_diffusion(self):
        r"""Round 5: the single-pool CPMG kernel models spoiler
        diffusion in-kernel (per-half attenuation planes, delta=1)
        and accepts `(nEcho,)` spacing trains — (T2, D) echo-train
        fitting gradients at kernel speed. Parity incl. dD and the
        per-echo esp row."""
        import jax.numpy as jnp
        from mrphy_tpu.ops import epg, epg_pallas
        nE, nA = 20, 6
        assert epg_pallas.cpmg_bwd_is_available(nE=nE, nA=nA,
                                                varint=True)
        flips, T1, T2, _, b1, w = self._mk(nE, nA, seed=17)
        rng = np.random.default_rng(18)
        F = jnp.float64
        esps = jnp.asarray(rng.uniform(0.006, 0.015, nE), F)
        Dv = jnp.asarray(rng.uniform(0.5, 3.0, nA) * 1e-3, F)

        def loss(be, fl, t1, t2, d, esp, b_):
            s = epg.epg_cpmg(fl, T1=t1, T2=t2, esp=esp, D=d, dk=25.0,
                             b1=b_, backend=be)
            return jnp.sum(w * s)

        self._grads(loss, (flips, T1, T2, Dv, esps, b1),
                    ('flips', 'T1', 'T2', 'D', 'esps', 'b1'), 2e-5)
        # constant-spacing diffusion parity through the same dispatch
        out = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01, D=Dv,
                           dk=25.0, backend='pallas')
        ref = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01, D=Dv,
                           dk=25.0, backend='xla')
        assert float(jnp.max(jnp.abs(out - ref))) < 2e-6


class TestVariableIntervalTrains:
    r"""Round 4 (continued): per-TR / per-echo interval trains across
    EVERY family's XLA scan (epg_cpmg esp, epgx_spgr tr, epgx_cpmg
    esp, epgx_mt_spgr tr), with the pallas dispatches routing them to
    the XLA scan. Oracles: scalar-interval equality when the train is
    constant, the closed-form CPMG decay under 180° refocusing for a
    genuinely variable train, and the decoupled two-pool limit against
    the (independently validated) single-pool variable-TR paths."""

    def test_constant_train_equals_scalar(self):
        from mrphy_tpu.ops import epg
        F = jnp.float64
        rng = np.random.default_rng(5)
        fl = jnp.asarray(np.deg2rad(rng.uniform(100, 180, 12)), F)
        T1, T2 = jnp.asarray([0.9, 1.4], F), jnp.asarray([0.07, .12], F)
        esp_t = jnp.full((12,), 0.011, F)
        a = epg.epg_cpmg(fl, T1=T1, T2=T2, esp=0.011)
        b = epg.epg_cpmg(fl, T1=T1, T2=T2, esp=esp_t)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-13)
        flg = jnp.asarray(np.deg2rad(rng.uniform(10, 60, 12)), F)
        kwx = dict(T1a=T1, T2a=T2, T1b=jnp.asarray(0.5, F),
                   T2b=jnp.asarray(0.02, F), kab=jnp.asarray(2.0, F),
                   kba=jnp.asarray(8.0, F), M0b=0.2)
        a = epg.epgx_spgr(flg, tr=0.011, **kwx)
        b = epg.epgx_spgr(flg, tr=jnp.full((12,), 0.011, F), **kwx)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-13)
        a = epg.epgx_cpmg(fl, esp=0.011, **kwx)
        b = epg.epgx_cpmg(fl, esp=esp_t, **kwx)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-13)
        kwm = dict(T1a=T1, T2a=T2, T1b=jnp.asarray(1.0, F),
                   kab=jnp.asarray(4.0, F), kba=jnp.asarray(20.0, F),
                   wt=0.3, M0b=0.15)
        a = epg.epgx_mt_spgr(flg, tr=0.011, **kwm)
        b = epg.epgx_mt_spgr(flg, tr=jnp.full((12,), 0.011, F), **kwm)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-13)

    def test_cpmg_varesp_closed_form(self):
        r"""Perfect 180° refocusing: |echo_n| = M0 exp(-sum esp_i/T2)
        exactly, for ANY spacing train (T1 drops out of F+(0))."""
        from mrphy_tpu.ops import epg
        F = jnp.float64
        rng = np.random.default_rng(7)
        nE = 10
        esp_t = jnp.asarray(rng.uniform(0.006, 0.02, nE), F)
        T2 = jnp.asarray([0.05, 0.11], F)
        fl = jnp.full((nE,), np.pi, F)
        e = epg.epg_cpmg(fl, T1=1.2, T2=T2, esp=esp_t, M0=0.9)
        mag = np.hypot(np.asarray(e)[..., 0], np.asarray(e)[..., 1])
        want = 0.9 * np.exp(-np.cumsum(np.asarray(esp_t))
                            / np.asarray(T2)[:, None])
        np.testing.assert_allclose(mag, want, rtol=1e-10)

    def test_two_pool_decoupled_limits(self):
        r"""kab = kba = 0, M0b = 0: the a-pool evolves as a single
        pool — every two-pool variable-interval train must match its
        single-pool counterpart (validated against the isochromat
        ensemble / fused adjoints elsewhere)."""
        from mrphy_tpu.ops import epg
        F = jnp.float64
        rng = np.random.default_rng(11)
        nTR = 16
        flg = jnp.asarray(np.deg2rad(rng.uniform(10, 60, nTR)), F)
        phis = jnp.asarray(epg.rf_spoil_phases(nTR), F)
        trs = jnp.asarray(rng.uniform(0.009, 0.016, nTR), F)
        T1 = jnp.asarray([0.8, 1.6], F)
        T2 = jnp.asarray([0.06, 0.13], F)
        one = epg.epg_spgr(flg, phis, T1=T1, T2=T2, tr=trs, te=0.0)
        two = epg.epgx_spgr(flg, phis, T1a=T1, T2a=T2, T1b=1.0,
                            T2b=0.02, kab=0.0, kba=0.0, M0b=0.0,
                            tr=trs)
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   atol=1e-12)
        mt = epg.epgx_mt_spgr(flg, phis, T1a=T1, T2a=T2, T1b=1.0,
                              kab=0.0, kba=0.0, M0b=0.0, wt=5.0,
                              tr=trs)
        np.testing.assert_allclose(np.asarray(mt), np.asarray(one),
                                   atol=1e-12)
        fl = jnp.asarray(np.deg2rad(rng.uniform(120, 180, nTR)), F)
        esp_t = jnp.asarray(rng.uniform(0.008, 0.014, nTR), F)
        onec = epg.epg_cpmg(fl, T1=T1, T2=T2, esp=esp_t)
        twoc = epg.epgx_cpmg(fl, T1a=T1, T2a=T2, T1b=1.0, T2b=0.02,
                             kab=0.0, kba=0.0, M0b=0.0, esp=esp_t)
        np.testing.assert_allclose(np.asarray(twoc), np.asarray(onec),
                                   atol=1e-12)

    def test_pallas_routes_and_grads(self):
        r"""backend='pallas' with a variable train stays correct and
        differentiable (incl. the interval trains themselves —
        schedule optimization). Since round 5 the two-pool variable-TR
        train runs the FUSED kernel (f32), so the parity bar is the
        kernel's, not the identical-routing 1e-13."""
        from mrphy_tpu.ops import epg
        F = jnp.float64
        rng = np.random.default_rng(13)
        nTR = 10
        flg = jnp.asarray(np.deg2rad(rng.uniform(10, 60, nTR)), F)
        trs = jnp.asarray(rng.uniform(0.009, 0.016, nTR), F)
        kwx = dict(T1a=jnp.asarray([0.9], F), T2a=jnp.asarray([.08], F),
                   T1b=0.5, T2b=0.02, kab=2.0, kba=8.0, M0b=0.2)
        a = epg.epgx_spgr(flg, tr=trs, **kwx)
        b = epg.epgx_spgr(flg, tr=trs, backend='pallas', **kwx)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6)
        g = jax.grad(lambda t: jnp.sum(
            epg.epgx_spgr(flg, tr=t, **kwx) ** 2))(trs)
        assert bool(jnp.all(jnp.isfinite(g))) and float(
            jnp.abs(g).max()) > 0
        esp_t = jnp.asarray(rng.uniform(0.008, 0.014, nTR), F)
        fl = jnp.asarray(np.deg2rad(rng.uniform(120, 180, nTR)), F)
        a = epg.epg_cpmg(fl, T1=1.0, T2=0.08, esp=esp_t)
        b = epg.epg_cpmg(fl, T1=1.0, T2=0.08, esp=esp_t,
                         backend='pallas')     # fused since round 5
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6)
        g = jax.grad(lambda e: jnp.sum(epg.epg_cpmg(
            fl, T1=1.0, T2=0.08, esp=e) ** 2))(esp_t)
        assert bool(jnp.all(jnp.isfinite(g))) and float(
            jnp.abs(g).max()) > 0

    def test_sharded_interval_trains_replicate(self):
        r"""mesh=: a variable interval train whose length happens to
        EQUAL the voxel count must still replicate (excluded from the
        nV inference), and results must match unsharded."""
        from mrphy_tpu.ops import epg
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        rng = np.random.default_rng(17)
        nV = 16                                   # == nE on purpose
        fl = jnp.asarray(np.deg2rad(rng.uniform(120, 180, nV)),
                         jnp.float32)
        esp_t = jnp.asarray(rng.uniform(0.008, 0.014, nV), jnp.float32)
        T2 = jnp.asarray(rng.uniform(0.04, 0.2, nV), jnp.float32)
        a = epg.epg_cpmg(fl, T1=1.0, T2=T2, esp=esp_t)
        b = epg.epg_cpmg(fl, T1=1.0, T2=T2, esp=esp_t, mesh=mesh)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        trs = esp_t
        T1a = jnp.asarray(rng.uniform(0.5, 2.0, nV), jnp.float32)
        a = epg.epgx_spgr(fl, T1a=T1a, T2a=0.08, T1b=0.5, T2b=0.02,
                          kab=2.0, kba=8.0, M0b=0.2, tr=trs, K=8)
        b = epg.epgx_spgr(fl, T1a=T1a, T2a=0.08, T1b=0.5, T2b=0.02,
                          kab=2.0, kba=8.0, M0b=0.2, tr=trs, K=8,
                          mesh=mesh)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
