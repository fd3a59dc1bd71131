r"""Small-tip-angle linear designer: CG solution vs an explicit
normal-equations oracle, CG convergence, and the physics loop closed —
the designed RF, run through the actual Bloch simulator, must excite
the requested pattern to small-tip accuracy."""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0
from mrphy_tpu.design.sta import sta_design, sta_forward


def _problem(rng, nM=40, nT=24, nC=2, df=True):
    loc_ = jnp.asarray(rng.uniform(-1, 1, (1, nM, 3)))
    gr = jnp.asarray(0.3 * rng.normal(size=(1, 3, nT)))
    b1_ = jnp.asarray(np.stack([0.5 + rng.random((1, nM, nC)),
                                0.3 * rng.normal(size=(1, nM, nC))], 2))
    df_ = jnp.asarray(rng.uniform(-50, 50, (1, nM))) if df else None
    tgt = jnp.asarray(0.05 * rng.normal(size=(1, nM, 2)))
    return loc_, gr, b1_, df_, tgt


class TestStaOracle:

    def test_cg_matches_explicit_normal_equations(self):
        r"""Build A explicitly by probing sta_forward with basis RF
        vectors, solve (AᵀA + lam·I)x = Aᵀb in numpy, compare."""
        rng = np.random.default_rng(0)
        loc_, gr, b1_, df_, tgt = _problem(rng)
        nT, nC = gr.shape[-1], b1_.shape[-1]
        lam = 1e-3

        cols = []
        for part in range(2):
            for t in range(nT):
                for c in range(nC):
                    e = np.zeros((1, 2, nT, nC))
                    e[0, part, t, c] = 1.0
                    cols.append(np.asarray(sta_forward(
                        jnp.asarray(e), loc_, gr, b1Map_=b1_,
                        df_=df_)).ravel())
        A = np.stack(cols, -1)                       # (2·nM, 2·nT·nC)
        b = np.asarray(tgt).ravel()
        x = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]), A.T @ b)
        rf_ref = x.reshape(1, 2, nT, nC)

        rf, resnorms = sta_design(loc_, gr, tgt, b1Map_=b1_, df_=df_,
                                  lam=lam, niter=400)
        np.testing.assert_allclose(np.asarray(rf), rf_ref, atol=1e-9)
        assert float(resnorms[-1]) < float(resnorms[0]) * 1e-6

    def test_weights_zero_out_dont_care(self):
        r"""w_=0 spins must not influence the solution: solving with
        weights == solving the reduced problem on the kept spins."""
        rng = np.random.default_rng(1)
        loc_, gr, b1_, df_, tgt = _problem(rng, nM=30)
        keep = np.zeros(30)
        keep[:18] = 1.0
        w_ = jnp.asarray(keep[None])
        rf_w, _ = sta_design(loc_, gr, tgt, b1Map_=b1_, df_=df_, w_=w_,
                             lam=1e-3, niter=300)
        rf_r, _ = sta_design(loc_[:, :18], gr, tgt[:, :18],
                             b1Map_=b1_[:, :18], df_=df_[:, :18],
                             lam=1e-3, niter=300)
        np.testing.assert_allclose(np.asarray(rf_w), np.asarray(rf_r),
                                   atol=1e-9)


class TestStaPhysics:

    def test_designed_rf_excites_target_in_bloch_sim(self):
        r"""Close the loop: STA-design a 2D pattern, then run the real
        (nonlinear) Bloch simulator — the excited m_xy must match the
        target to small-tip accuracy, and the STA prediction itself to
        tighter accuracy."""
        from mrphy_tpu.ops import sims
        rng = np.random.default_rng(2)
        n = 9
        g = np.linspace(-2.0, 2.0, n)
        X, Y = np.meshgrid(g, g, indexing='ij')
        loc = np.stack([X.ravel(), Y.ravel(), np.zeros(n * n)], -1)
        nM = loc.shape[0]
        loc_ = jnp.asarray(loc[None])

        # inward spiral covering ex-k-space; modest amplitude
        nT = 400
        tt = np.linspace(1.0, 0.0, nT)
        kmax = 1.1                                    # cycle/cm
        kx = kmax * tt * np.cos(2 * np.pi * 6 * tt)
        ky = kmax * tt * np.sin(2 * np.pi * 6 * tt)
        k = np.stack([kx, ky, np.zeros(nT)], 0)[None]
        from mrphy_tpu.utils import k2g
        gr = k2g(jnp.asarray(k), True, dt=float(dt0))

        flip = np.deg2rad(6.0)                        # small tip
        blob = np.exp(-((X + 0.6) ** 2 + Y ** 2) / 0.5).ravel()
        tgt = np.stack([np.zeros(nM), np.sin(flip) * blob], -1)[None]
        tgt_ = jnp.asarray(tgt)

        rf, _ = sta_design(loc_, gr, tgt_, lam=1e-7, niter=300)

        pred = np.asarray(sta_forward(rf, loc_, gr))
        Mi = jnp.asarray(np.tile([0., 0., 1.], (1, nM, 1)))
        Mo = np.asarray(sims.blochsim_rfgr(Mi, rf, gr, loc_,
                                           gam=gamH, dt=dt0))
        mxy_sim = Mo[0, :, :2]

        # simulator vs STA prediction: small-tip approximation error
        # only (scales as flip² — measured 3.5% at 8°, ~2% at 6°)
        err_pred = np.abs(mxy_sim - pred[0]).max() / np.sin(flip)
        assert err_pred < 0.03, err_pred
        # simulator vs target: approximation + truncated-k fit residual
        err_tgt = np.sqrt(((mxy_sim - tgt[0]) ** 2).sum(-1)).max() \
            / np.sin(flip)
        assert err_tgt < 0.15, err_tgt

    def test_warm_start_helps_joint_design(self):
        r"""STA warm start: the nonlinear loop started from the STA
        solution must begin at a far lower loss than from zero RF."""
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig
        rng = np.random.default_rng(3)
        cube = mobjs.Examples.spincube()
        loc_ = cube.loc_
        nT = 64
        gr = jnp.asarray(0.2 * rng.normal(size=(1, 3, nT)), jnp.float32)
        flip = np.deg2rad(12.0)
        tgt = np.zeros((1, cube.nM, 2))
        tgt[0, :, 1] = np.sin(flip)
        rf_sta, _ = sta_design(loc_, gr, jnp.asarray(tgt, jnp.float32),
                               lam=1e-6, niter=200)
        Mtgt = np.concatenate([tgt, np.full((1, cube.nM, 1),
                                            np.cos(flip))], -1)
        Mtgt_ = jnp.asarray(Mtgt, jnp.float32)
        # rfmax comfortably above the STA solution's 0.77 G peak: the
        # warm start must survive init_params' clamp to count
        cfg = DesignConfig(niter=2, lr=1e-3, rfmax=2.0, smax=12e3,
                           dt=float(dt0))
        p_sta = mobjs.Pulse(rf=jnp.asarray(rf_sta, jnp.float32), gr=gr,
                            dt=dt0)
        p_zero = mobjs.Pulse(rf=jnp.zeros_like(p_sta.rf), gr=gr, dt=dt0)
        _, l_sta = design_pulse(cube, p_sta, Mtgt_, cfg=cfg,
                                doRelax=False)
        _, l_zero = design_pulse(cube, p_zero, Mtgt_, cfg=cfg,
                                 doRelax=False)
        assert float(l_sta[0]) < 0.25 * float(l_zero[0])
