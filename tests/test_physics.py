r"""Analytic-physics golden tests.

Third kind of oracle (beyond golden values copied from the reference and
cross-implementation equivalence): closed-form solutions of the Bloch
equation derived from physics alone. Each case is exact for the
discrete-rotation simulator (fixed rotation axes compose exactly), so the
assertions run at the f64 oracle tolerance of 1e-9 like the reference's
physics tests (`/root/reference/tests/test_sims.py:16`).

Conventions under test (reference parity):
- rotation angle per step is ``phi = -gamma*2*pi*dt*|B|`` about ``B/|B|``
  (`/root/reference/mrphy/beffective.py:18-37` — negated because the Bloch
  equation is dM/dt = M x gamma*B);
- free precession phase is ``phi = -2*pi*df*dur`` about z with relaxation
  ``Mxy *= E2``, ``Mz -> Mz*E1 + (1 - E1)``
  (`/root/reference/mrphy/slowsims.py:134-174`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mrphy_tpu import gamH
from mrphy_tpu.ops import sims, slowsims

ATOL = 1e-9


def _mk(x, dtype=jnp.float64):
    return jnp.asarray(x, dtype)


class TestAnalyticRotations:

    def test_exact_flip_angle_on_resonance(self):
        r"""Constant on-resonance B1 along x for time T tips M from z by
        theta = gamma*2*pi*B1*T: M = (0, sin(theta), cos(theta))."""
        nT, dt, b1 = 257, 4e-6, 0.05  # Gauss
        for engine in (sims.blochsim, slowsims.blochsim):
            Mi = _mk([[[0., 0., 1.]]])
            beff = jnp.broadcast_to(_mk([b1, 0., 0.]), (1, 1, nT, 3))
            Mo = np.asarray(engine(Mi, beff, gam=_mk(gamH), dt=_mk(dt)))
            theta = gamH * 2 * np.pi * b1 * nT * dt
            want = [0., np.sin(theta), np.cos(theta)]
            assert np.allclose(Mo[0, 0], want, atol=ATOL), (engine, Mo)

    def test_rabi_offresonance_nutation(self):
        r"""Constant B1 with off-resonance df: the effective field tilts
        and Mz(t) = 1 - (w1^2/weff^2) * (1 - cos(weff*t)) (Rabi formula).
        Exact for the discrete simulator because the axis is fixed."""
        nT, dt, b1 = 199, 4e-6, 0.03
        df = 150.0  # Hz
        Mi = _mk([[[0., 0., 1.]]])
        rf = jnp.broadcast_to(_mk([[b1], [0.]]), (1, 2, nT))
        gr = jnp.zeros((1, 3, nT), jnp.float64)
        loc = jnp.zeros((1, 1, 3), jnp.float64)
        Mo = np.asarray(sims.blochsim_rfgr(
            Mi, rf, gr, loc, df=_mk([[df]]), gam=_mk(gamH), dt=_mk(dt)))
        w1 = gamH * 2 * np.pi * b1
        dw = 2 * np.pi * df
        weff = np.hypot(w1, dw)
        t = nT * dt
        mz_want = 1 - (w1 / weff) ** 2 * (1 - np.cos(weff * t))
        assert np.allclose(Mo[0, 0, 2], mz_want, atol=ATOL), Mo

    def test_gradient_dephasing_phase(self):
        r"""Constant gradient gz: a spin at z accrues transverse phase
        -gamma*2*pi*gz*z*T (the k-space/Fourier relation)."""
        nT, dt, gz = 128, 4e-6, 0.8  # G/cm
        zs = np.linspace(-1.0, 1.0, 7)  # cm
        nM = zs.size
        Mi = jnp.broadcast_to(_mk([1., 0., 0.]), (1, nM, 3))
        rf = jnp.zeros((1, 2, nT), jnp.float64)
        gr = jnp.broadcast_to(_mk([0., 0., gz])[:, None], (1, 3, nT))
        loc = _mk(np.stack([np.zeros(nM), np.zeros(nM), zs], -1))[None]
        Mo = np.asarray(sims.blochsim_rfgr(
            Mi, rf, gr, loc, gam=_mk(gamH), dt=_mk(dt)))
        phase = -gamH * 2 * np.pi * gz * zs * nT * dt
        want = np.stack([np.cos(phase), np.sin(phase), np.zeros(nM)], -1)
        assert np.allclose(Mo[0], want, atol=ATOL), Mo[0] - want


class TestAnalyticRelaxation:

    def test_freeprec_decay_and_recovery(self):
        r"""M0 = (1,0,0): Mxy = e^(-t/T2), Mz = 1 - e^(-t/T1)."""
        T1, T2, dur = 1.47, 0.07, 0.1
        Mi = _mk([[[1., 0., 0.]]])
        for fp in (sims.freeprec, slowsims.freeprec):
            Mo = np.asarray(fp(Mi, _mk(dur), T1=_mk([[T1]]), T2=_mk([[T2]])))
            want = [np.exp(-dur / T2), 0., 1 - np.exp(-dur / T1)]
            assert np.allclose(Mo[0, 0], want, atol=ATOL), (fp, Mo)

    def test_inversion_recovery(self):
        r"""M0 = (0,0,-1): Mz(t) = 1 - 2 e^(-t/T1); null at t = T1 ln 2."""
        T1, T2 = 1.47, 0.07
        Mi = _mk([[[0., 0., -1.]]])
        t_null = T1 * np.log(2.0)
        Mo = np.asarray(sims.freeprec(Mi, _mk(t_null),
                                      T1=_mk([[T1]]), T2=_mk([[T2]])))
        assert np.allclose(Mo[0, 0], [0., 0., 0.], atol=ATOL), Mo
        dur = 0.33
        Mo = np.asarray(sims.freeprec(Mi, _mk(dur),
                                      T1=_mk([[T1]]), T2=_mk([[T2]])))
        assert np.allclose(Mo[0, 0, 2], 1 - 2 * np.exp(-dur / T1),
                           atol=ATOL), Mo


class TestAdiabatic:

    def test_hyperbolic_secant_inversion_b1_insensitive(self):
        r"""A hyperbolic-secant (HS1) frequency-swept pulse inverts spins
        for ANY B1 amplitude above the adiabatic threshold — the defining
        property of adiabatic passage, and a stringent nonlinear test of
        the simulator (no small-angle regime, strong frequency
        modulation). Encoded as Bz(t) = sweep/gamma in the rotating
        frame."""
        nT, dt = 2500, 4e-6                   # 10 ms pulse
        T = nT * dt
        beta = 2 * 5.3 / T                    # sech truncation ~1%
        mu = 5.0
        A0 = 0.15                             # Gauss; threshold ~0.089
        t = (np.arange(nT) + 0.5) * dt - T / 2
        am = A0 / np.cosh(beta * t)
        sweep = mu * beta * np.tanh(beta * t) / (2 * np.pi)  # Hz

        scales = np.array([0.8, 1.0, 1.4, 2.0])
        for s in scales:
            beff = np.zeros((1, 1, nT, 3))
            beff[0, 0, :, 0] = s * am
            beff[0, 0, :, 2] = sweep / gamH
            Mo = np.asarray(sims.blochsim(
                _mk([[[0., 0., 1.]]]), _mk(beff), gam=_mk(gamH),
                dt=_mk(dt)))
            assert Mo[0, 0, 2] < -0.9, (s, Mo)

        # below threshold, inversion fails — the test is discriminating
        beff = np.zeros((1, 1, nT, 3))
        beff[0, 0, :, 0] = 0.2 * am
        beff[0, 0, :, 2] = sweep / gamH
        Mo = np.asarray(sims.blochsim(_mk([[[0., 0., 1.]]]), _mk(beff),
                                      gam=_mk(gamH), dt=_mk(dt)))
        assert Mo[0, 0, 2] > -0.5, Mo


class TestTissueParamGradients:
    r"""Differentiability w.r.t. T1/T2 — beyond the reference, whose fast
    engine returns no tissue-parameter gradients
    (`/root/reference/mrphy/sims.py:149-150`). The autodiff oracle path
    gives them, enabling quantitative-MRI fitting."""

    def test_freeprec_T1_T2_grads_analytic(self):
        r"""d/dT1 [Mz0*E1 + (1-E1)] = (Mz0-1)*E1*t/T1^2 and
        d/dT2 [Mx0*E2] = Mx0*E2*t/T2^2, checked against jax.grad."""
        import jax
        T1, T2, dur, mz0, mx0 = 1.3, 0.09, 0.25, -0.4, 0.8
        Mi = _mk([[[mx0, 0., mz0]]])

        gT1 = jax.grad(lambda T1_: slowsims.freeprec(
            Mi, _mk(dur), T1=T1_, T2=_mk([[T2]]))[0, 0, 2])(_mk([[T1]]))
        want = (mz0 - 1) * np.exp(-dur / T1) * dur / T1 ** 2
        assert np.allclose(np.asarray(gT1), want, atol=ATOL), (gT1, want)

        gT2 = jax.grad(lambda T2_: slowsims.freeprec(
            Mi, _mk(dur), T1=_mk([[T1]]), T2=T2_)[0, 0, 0])(_mk([[T2]]))
        want = mx0 * np.exp(-dur / T2) * dur / T2 ** 2
        assert np.allclose(np.asarray(gT2), want, atol=ATOL), (gT2, want)

    def test_blochsim_relaxation_grads_flow(self):
        r"""grads w.r.t. T1/T2 through the scanned oracle Bloch sim are
        finite and nonzero (the fast engine's documented gap)."""
        import jax
        nT = 32
        Mi = _mk([[[0., 0., 1.]]])
        beff = jnp.broadcast_to(_mk([0.02, 0., 0.01]), (1, 1, nT, 3))

        def f(T1, T2):
            return jnp.sum(slowsims.blochsim(
                Mi, beff, T1=T1, T2=T2, gam=_mk(gamH), dt=_mk(4e-5)) ** 2)
        g1, g2 = jax.grad(f, argnums=(0, 1))(_mk([[1.0]]), _mk([[0.08]]))
        for g in (g1, g2):
            g = np.asarray(g)
            assert np.all(np.isfinite(g)) and np.abs(g).max() > 0, g

    def test_qmri_t1_t2_recovery(self):
        r"""Recover heterogeneous T1/T2 from clean IR + SE signals by
        gradient descent through the simulator (compact version of
        examples/qmri_fit.py)."""
        import jax
        optax = pytest.importorskip("optax")
        nM = 8
        rng = np.random.default_rng(3)
        T1_true = _mk(rng.uniform(0.4, 2.0, (1, nM)))
        T2_true = _mk(rng.uniform(0.04, 0.2, (1, nM)))
        TIs = _mk([0.1, 0.4, 1.2, 3.0])
        taus = _mk([0.01, 0.04, 0.1]) / 2
        mz = jnp.tile(_mk([0., 0., -1.]), (1, nM, 1))
        my = jnp.tile(_mk([0., 1., 0.]), (1, nM, 1))

        def sig(T1, T2):
            ir = jax.vmap(lambda TI: slowsims.freeprec(
                mz, TI, T1=T1, T2=T2)[..., 2])(TIs)
            se = jax.vmap(lambda tau: slowsims.freeprec(
                slowsims.freeprec(my, tau, T1=T1, T2=T2)
                * _mk([-1., 1., -1.]), tau, T1=T1, T2=T2)[..., 1])(taus)
            return ir, se

        ir0, se0 = sig(T1_true, T2_true)

        def loss_fn(p):
            ir, se = sig(jnp.exp(p['lT1']), jnp.exp(p['lT2']))
            return jnp.mean((ir - ir0) ** 2) + jnp.mean((se - se0) ** 2)

        params = {'lT1': jnp.zeros((1, nM)), 'lT2': jnp.full((1, nM), -2.)}
        opt = optax.adam(0.05)

        @jax.jit
        def run(params):
            state = opt.init(params)

            def body(c, _):
                p, s = c
                u, s = opt.update(jax.grad(loss_fn)(p), s, p)
                return (optax.apply_updates(p, u), s), None
            (params, _), _ = jax.lax.scan(body, (params, state), None,
                                          length=600)
            return params

        params = run(params)
        T1f, T2f = jnp.exp(params['lT1']), jnp.exp(params['lT2'])
        assert float(jnp.max(jnp.abs(T1f - T1_true) / T1_true)) < 1e-3
        assert float(jnp.max(jnp.abs(T2f - T2_true) / T2_true)) < 1e-3


class TestSliceSelect:

    def test_sinc_slab_profile_matches_small_tip(self):
        r"""Windowed-sinc RF under a slab gradient + half-area refocusing
        lobe: the simulated profile matches the small-tip-angle Fourier
        prediction (10-deg flip, where small-tip is accurate), the slab
        edges land at the nominal thickness, and in-slice phase is
        refocused. Exercises the full stack: Pulse -> SpinCube ->
        applypulse -> fused engine."""
        from mrphy_tpu.models import mobjs

        flip, thk, tb, dur = np.deg2rad(10.), 0.5, 6., 1.28e-3
        dt = 4e-6
        nT = int(round(dur / dt))
        bw = tb / dur
        gz = bw / (gamH * thk)

        t = (np.arange(nT) - nT / 2 + 0.5) * dt
        env = np.sinc(bw * t) * np.hamming(nT)
        b1 = env * flip / (gamH * 2 * np.pi * env.sum() * dt)

        nRef = nT // 2
        rf = np.zeros((1, 2, nT + nRef))
        rf[0, 0, :nT] = b1
        gr = np.zeros((1, 3, nT + nRef))
        gr[0, 2, :nT] = gz
        gr[0, 2, nT:] = -gz
        p = mobjs.Pulse(rf=_mk(rf), gr=_mk(gr), dt=_mk(dt),
                        dtype=jnp.float64)

        nz = 128
        cube = mobjs.SpinCube((1, 1, 1, nz), _mk([[1., 1., 4 * thk]]),
                              T1_=_mk([[1.47]]), T2_=_mk([[0.07]]),
                              dtype=jnp.float64)
        z = np.asarray(cube.loc_[0, :, 2])
        M = np.asarray(cube.applypulse(p, doRelax=False))[0].reshape(-1, 3)
        mxy = M[:, 0] + 1j * M[:, 1]

        stp = 1j * gamH * 2 * np.pi * dt * (
            b1[None] * np.exp(1j * 2 * np.pi * gamH * gz
                              * np.outer(z, t))).sum(1)

        insl = np.abs(z) < thk * 0.35
        outsl = np.abs(z) > thk * 0.8
        # small-tip agreement: O(flip^3) error ~ (0.175)^3 ~ 5e-3
        assert np.abs(mxy - stp).max() < 1.5e-3, np.abs(mxy - stp).max()
        flip_meas = np.arctan2(np.abs(mxy[insl]), M[insl, 2]).mean()
        assert abs(flip_meas - flip) < 0.03 * flip, flip_meas
        assert np.abs(mxy[outsl]).max() < 0.02
        assert np.abs(np.angle(mxy[insl] * np.exp(-1j * np.pi / 2))
                      ).max() < np.deg2rad(2.0)


class TestSpinEcho:

    @pytest.mark.parametrize('fp', [sims.freeprec, slowsims.freeprec],
                             ids=['sims', 'slowsims'])
    def test_hahn_echo_refocuses(self, fp):
        r"""Dephase an off-resonance ensemble for tau, flip 180deg about y,
        dephase tau again: every spin refocuses to
        (0, E2^2, (1-E1)^2) regardless of its df — the Hahn echo."""
        T1, T2, tau = 1.47, 0.07, 0.02
        nM = 33
        dfs = np.linspace(-80., 80., nM)  # Hz
        Mi = jnp.broadcast_to(_mk([0., 1., 0.]), (1, nM, 3))
        T1_, T2_ = _mk([[T1]]), _mk([[T2]])
        df_ = _mk(dfs)[None]

        M = fp(Mi, _mk(tau), T1=T1_, T2=T2_, df=df_)
        # mid-point sanity: the ensemble mean transverse magnitude has
        # genuinely dephased (|mean Mxy| well below the per-spin E2)
        mean_xy = np.linalg.norm(np.asarray(M)[0, :, :2].mean(0))
        assert mean_xy < 0.5 * np.exp(-tau / T2), mean_xy

        # hard 180deg about y (relaxation-free pulse -> exact flip)
        nT, dt = 64, 4e-6
        b1y = np.pi / (gamH * 2 * np.pi * nT * dt)
        beff = jnp.broadcast_to(_mk([0., b1y, 0.]), (1, nM, nT, 3))
        M = sims.blochsim(M, beff, gam=_mk(gamH), dt=_mk(dt))

        M = np.asarray(fp(M, _mk(tau), T1=T1_, T2=T2_, df=df_))
        E1, E2 = np.exp(-tau / T1), np.exp(-tau / T2)
        want = np.array([0., E2 ** 2, (1 - E1) ** 2])
        assert np.allclose(M[0], want[None], atol=ATOL), \
            np.abs(M[0] - want).max()


class TestInvariants:

    def test_rotation_isometry_all_engines(self):
        r"""Without relaxation every Bloch step is a pure rotation:
        |M| is conserved for ANY field — an invariant no golden value
        can miss. Checked across both engines and the fused path."""
        rng = np.random.default_rng(8)
        nM, nT = 9, 77
        Mi = _mk(rng.random((1, nM, 3)) - 0.5)
        norms0 = np.linalg.norm(np.asarray(Mi), axis=-1)
        beff = _mk(rng.normal(size=(1, nM, nT, 3)) * 2)

        for engine in (sims.blochsim, slowsims.blochsim,
                       slowsims.blochsim_tparallel):
            Mo = np.asarray(engine(Mi, beff, gam=_mk(gamH), dt=_mk(4e-6)))
            assert np.allclose(np.linalg.norm(Mo, axis=-1), norms0,
                               atol=ATOL), engine

        rf = _mk(rng.random((1, 2, nT)))
        gr = _mk(rng.random((1, 3, nT)))
        loc = _mk(rng.random((1, nM, 3)))
        Mo = np.asarray(sims.blochsim_rfgr(Mi, rf, gr, loc, gam=_mk(gamH),
                                           dt=_mk(4e-6)))
        assert np.allclose(np.linalg.norm(Mo, axis=-1), norms0, atol=ATOL)


class TestT2Star:

    def test_intravoxel_dephasing_matches_lorentzian_t2star(self):
        r"""Effective transverse relaxation T2*: a voxel modeled as a
        sub-spin ensemble whose off-resonances follow a Lorentzian
        (Cauchy) distribution of HWHM Γ dephases as
        ``E[exp(i·2π·df·t)] = exp(-2πΓ|t|)``, i.e. the voxel signal decays
        with ``1/T2* = 1/T2 + 2πΓ`` — the standard T2' = 1/(2πΓ) model.
        Quantile (inverse-CDF) sampling makes the ensemble deterministic;
        the framework needs no special feature: per-spin ``df`` IS the
        intra-voxel field distribution (see examples/t2star_fid.py)."""
        K = 16384                      # sub-spins per voxel
        T1, T2, T2p = 1.0, 0.05, 0.02  # Sec
        Gam = 1 / (2 * np.pi * T2p)    # Hz (Lorentzian HWHM)
        u = (np.arange(K) + 0.5) / K
        df = _mk(Gam * np.tan(np.pi * (u - 0.5)))[None]     # (1, K)
        Mi = jnp.broadcast_to(_mk([1., 0., 0.]), (1, K, 3))
        T1a, T2a = _mk([[T1]]), _mk([[T2]])

        for t in (0.002, 0.005, 0.01, 0.02):
            Mo = np.asarray(sims.freeprec(Mi, _mk(t), T1=T1a, T2=T2a,
                                          df=df))
            sig = complex(Mo[0, :, 0].mean(), Mo[0, :, 1].mean())
            want = np.exp(-t * (1 / T2 + 1 / T2p))
            # quantile discretization error only (heavy Cauchy tails)
            assert abs(abs(sig) - want) < 2e-3, (t, abs(sig), want)
        # and the ensemble is exact at t=0 (no spurious decay)
        Mo0 = np.asarray(sims.freeprec(Mi, _mk(0.), T1=T1a, T2=T2a,
                                       df=df))
        assert np.allclose(Mo0[0, :, 0], 1.0, atol=ATOL)


class TestSteadyState:

    def test_bssfp_fixed_point_via_ab_solve(self):
        r"""Steady state from ONE linear solve: a 2-TR bSSFP period is an
        affine map M → A·M + B (beff2ab), so its steady state is
        M* = (I − A)⁻¹B — no hundreds of iterated TRs. Checks:
        (1) simulating one full period from M* returns M* (the simulator
        agrees it is a fixed point); (2) on resonance the post-pulse
        transverse magnitude matches the instantaneous-RF analytic bSSFP
        level sinα(1−E1)/(1−(E1−E2)cosα−E1E2) to ~1%."""
        from mrphy_tpu.ops import beffective

        dt, nTp, TR = 4e-6, 10, 5e-3
        T1, T2, alpha = 1.0, 0.08, np.deg2rad(30.0)
        ngap = int(round(TR / dt)) - nTp
        b1 = alpha / (gamH * 2 * np.pi * nTp * dt)

        nf = 32
        df = _mk(np.linspace(-1 / TR, 1 / TR, nf))[None]      # (1, nf)
        bz = (df / gamH)[..., None, None]                     # Bz = df/γ

        def tr_beff(sign):
            bx = np.zeros(nTp + ngap)
            bx[:nTp] = sign * b1
            bxy = _mk(np.stack([bx, np.zeros_like(bx)], -1))  # (nT, 2)
            bxy = jnp.broadcast_to(bxy, (1, nf, nTp + ngap, 2))
            return jnp.concatenate(
                [bxy, jnp.broadcast_to(bz, (1, nf, nTp + ngap, 1))], -1)

        beff2 = jnp.concatenate([tr_beff(+1), tr_beff(-1)], axis=2)
        E1 = _mk(np.exp(-dt / T1))
        E2 = _mk(np.exp(-dt / T2))
        A, B = beffective.beff2ab(beff2, E1=E1, E2=E2, gam=_mk(gamH),
                                  dt=_mk(dt))
        I3 = jnp.eye(3, dtype=A.dtype)
        Mss = jnp.linalg.solve(I3 - A, B[..., None])[..., 0]  # (1, nf, 3)

        # (1) the simulator confirms the fixed point
        Mo = sims.blochsim(Mss, beff2, T1=_mk([[T1]]), T2=_mk([[T2]]),
                           gam=_mk(gamH), dt=_mk(dt))
        assert np.allclose(np.asarray(Mo), np.asarray(Mss), atol=1e-9)

        # (2) analytic on-resonance level, right after the +α pulse:
        # propagate M* (period start = just before the +α pulse) through
        # the pulse segment only
        Ap, Bp = beffective.beff2ab(beff2[:, :, :nTp], E1=E1, E2=E2,
                                    gam=_mk(gamH), dt=_mk(dt))
        Mpost = np.asarray(slowsims.blochsim_ab(Mss, Ap, Bp))
        i0 = int(np.argmin(np.abs(np.asarray(df)[0])))  # nearest df = 0
        e1, e2 = np.exp(-TR / T1), np.exp(-TR / T2)
        want = (np.sin(alpha) * (1 - e1)
                / (1 - (e1 - e2) * np.cos(alpha) - e1 * e2))
        got = np.hypot(Mpost[0, i0, 0], Mpost[0, i0, 1])
        assert abs(got - want) / want < 0.01, (got, want)

    def test_spoiled_gre_ernst_steady_state(self):
        r"""Spoiled GRE: perfect spoiling zeroes Mxy each TR — still an
        affine per-TR map (diag(0,0,1) composed with the pulse+decay
        propagator), so the same (I−A)⁻¹B fixed point applies. On
        resonance the longitudinal steady state obeys the Ernst formula
        Mz⁻ = (1−E1)/(1−E1·cosα), maximal signal at the Ernst angle."""
        from mrphy_tpu.ops import beffective

        dt, nTp, TR = 4e-6, 10, 10e-3
        T1, T2 = 0.8, 0.05
        ngap = int(round(TR / dt)) - nTp
        e1 = np.exp(-TR / T1)

        def steady_mz(alpha):
            b1 = alpha / (gamH * 2 * np.pi * nTp * dt)
            bx = np.zeros((1, 1, nTp + ngap, 3))
            bx[0, 0, :nTp, 0] = b1
            A, B = beffective.beff2ab(
                _mk(bx), E1=_mk(np.exp(-dt / T1)),
                E2=_mk(np.exp(-dt / T2)), gam=_mk(gamH), dt=_mk(dt))
            S = jnp.asarray(np.diag([0., 0., 1.]))   # perfect spoiler
            A2 = jnp.einsum('ij,...jk->...ik', S, A)
            B2 = jnp.einsum('ij,...j->...i', S, B)
            Mss = jnp.linalg.solve(jnp.eye(3) - A2, B2[..., None])[..., 0]
            return float(Mss[0, 0, 2])   # Mz just before the next pulse

        for alpha in np.deg2rad([10., 25., 50.]):
            want = (1 - e1) / (1 - e1 * np.cos(alpha))
            got = steady_mz(alpha)
            # finite-width pulse (40 us) vs instantaneous-RF formula
            assert abs(got - want) < 2e-3, (np.rad2deg(alpha), got, want)

        # Ernst angle maximizes the acquired signal Mz⁻·sinα
        a_ernst = np.arccos(e1)
        sig = lambda a: steady_mz(a) * np.sin(a)  # noqa: E731
        assert sig(a_ernst) > sig(a_ernst * 0.7)
        assert sig(a_ernst) > sig(a_ernst * 1.3)
