r"""SpinBolus flow-simulation tests.

The reference's SpinBolus is an empty stub (mobjs.py:968-973); here it
simulates moving spins: locations evolve as loc + vel·t inside the Bloch
scan. Oracle: explicitly build the time-varying B-effective from the
moved positions and run the autodiff engine.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import dt0, gamH
from mrphy_tpu.models import mobjs
from mrphy_tpu.ops import sims, slowsims, beffective

DTYPE = jnp.float64
ATOL = 1e-9


def _moving_beff(rf, gr, loc0, vel, dt, gam):
    r"""Oracle: per-step B-effective from explicitly moved locations."""
    nT = gr.shape[2]
    beffs = []
    for t in range(nT):
        loc_t = loc0 + vel * (t * dt)
        beffs.append(beffective.rfgr2beff(rf[..., t:t + 1, :] if rf.ndim == 4
                                          else rf[..., t:t + 1],
                                          gr[..., t:t + 1], loc_t,
                                          gam=gam)[..., 0, :])
    return jnp.stack(beffs, axis=-2)  # (N, nM, nT, xyz)


class TestBolus:

    def test_zero_velocity_matches_static(self):
        rng = np.random.default_rng(0)
        nM, nT = 16, 32
        loc_ = jnp.asarray(rng.random((1, nM, 3)), DTYPE)
        rf = jnp.asarray(rng.random((1, 2, nT)), DTYPE)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)), DTYPE)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0, dtype=DTYPE)

        arr = mobjs.SpinArray((1, nM), dtype=DTYPE)
        bol = mobjs.SpinBolus((1, nM), dtype=DTYPE)  # vel defaults to 0
        np.testing.assert_allclose(bol.applypulse(p, loc_=loc_),
                                   arr.applypulse(p, loc_=loc_),
                                   atol=ATOL)

    def test_flow_matches_moving_beff_oracle(self):
        rng = np.random.default_rng(1)
        nM, nT = 8, 48
        loc0 = jnp.asarray(rng.random((1, nM, 3)), DTYPE)
        vel = jnp.asarray(rng.normal(size=(1, nM, 3)) * 50, DTYPE)  # cm/s
        rf = jnp.asarray(rng.random((1, 2, nT)) * 0.1, DTYPE)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)), DTYPE)
        T1 = jnp.asarray([[1.]], DTYPE)
        T2 = jnp.asarray([[4e-2]], DTYPE)
        gam = jnp.asarray(gamH, DTYPE)
        Mi = jnp.asarray(rng.random((1, nM, 3)), DTYPE)

        Mo = sims.blochsim_rfgr(Mi, rf, gr, loc0, T1=T1, T2=T2, gam=gam,
                                dt=dt0, vel=vel)
        beff = _moving_beff(rf, gr, loc0, vel, float(dt0), gam)
        Mo_oracle = slowsims.blochsim(Mi, beff, T1=T1, T2=T2, gam=gam,
                                      dt=dt0)
        np.testing.assert_allclose(Mo, Mo_oracle, atol=ATOL)

    def test_flow_phase_accrual_analytic(self):
        r"""A transverse spin moving along z in a constant z-gradient
        accrues phase −γ2π·g·dt·Σ(z₀ + v·tₖ) — first gradient-moment flow
        encoding, the textbook bolus effect."""
        nT = 100
        g, z0, v = 0.1, 0.5, 30.0  # Gauss/cm, cm, cm/s
        dt = float(dt0)
        Mi = jnp.asarray([[[1., 0., 0.]]], DTYPE)
        loc0 = jnp.asarray([[[0., 0., z0]]], DTYPE)
        vel = jnp.asarray([[[0., 0., v]]], DTYPE)
        rf = jnp.zeros((1, 2, nT), DTYPE)
        gr = jnp.concatenate([jnp.zeros((1, 2, nT), DTYPE),
                              jnp.full((1, 1, nT), g, DTYPE)], axis=1)

        Mo = sims.blochsim_rfgr(Mi, rf, gr, loc0, dt=dt, vel=vel)

        ts = np.arange(nT) * dt
        phi = 2 * np.pi * gamH * g * dt * np.sum(z0 + v * ts)
        # rotation about +z by −φ: [cos φ, −sin φ, 0]
        np.testing.assert_allclose(
            np.asarray(Mo)[0, 0], [np.cos(phi), -np.sin(phi), 0.],
            atol=ATOL)

    def test_flow_grads_reconstruct_vs_history(self):
        rng = np.random.default_rng(2)
        nM, nT = 12, 24
        loc0 = jnp.asarray(rng.random((1, nM, 3)), DTYPE)
        vel = jnp.asarray(rng.normal(size=(1, nM, 3)) * 20, DTYPE)
        rf = jnp.asarray(rng.random((1, 2, nT)), DTYPE)
        gr = jnp.asarray(rng.normal(size=(1, 3, nT)), DTYPE)
        T1 = jnp.asarray([[1.]], DTYPE)
        T2 = jnp.asarray([[4e-2]], DTYPE)
        Mi = jnp.asarray(rng.random((1, nM, 3)), DTYPE)

        def mk(adjoint):
            return jax.grad(lambda r, g_: jnp.sum(sims.blochsim_rfgr(
                Mi, r, g_, loc0, T1=T1, T2=T2, dt=dt0, vel=vel,
                adjoint=adjoint) ** 2), argnums=(0, 1))

        g_r = mk('reconstruct')(rf, gr)
        g_h = mk('history')(rf, gr)
        np.testing.assert_allclose(g_r[0], g_h[0], atol=ATOL)
        np.testing.assert_allclose(g_r[1], g_h[1], atol=ATOL)

    def test_bolus_object_roundtrip(self):
        bol = mobjs.SpinBolus((1, 3, 3, 3), vel=jnp.asarray([0., 0., 10.]),
                              dtype=DTYPE)
        assert bol.vel_.shape == (1, 27, 3)
        d = bol.asdict(doEmbed=False)
        assert 'vel_' in d
        leaves, treedef = jax.tree_util.tree_flatten(bol)
        bol2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(bol2.vel_, bol.vel_, atol=0)
        # unicode/grid access
        assert bol.vel.shape == (1, 3, 3, 3, 3)

    def test_flow_per_batch_dt(self):
        r"""Per-batch dwell times: each batch's spins move on its own
        clock (review finding: tarr previously used dt[0] for all)."""
        rng = np.random.default_rng(3)
        nM, nT = 4, 20
        loc0 = jnp.asarray(rng.random((2, nM, 3)), DTYPE)
        vel = jnp.asarray(rng.normal(size=(2, nM, 3)) * 30, DTYPE)
        rf = jnp.asarray(rng.random((2, 2, nT)), DTYPE)
        gr = jnp.asarray(rng.normal(size=(2, 3, nT)), DTYPE)
        Mi = jnp.asarray(rng.random((2, nM, 3)), DTYPE)
        dt2 = jnp.asarray([4e-6, 8e-6], DTYPE)

        Mo = sims.blochsim_rfgr(Mi, rf, gr, loc0, dt=dt2, vel=vel)
        for n, dtn in enumerate([4e-6, 8e-6]):
            ref = sims.blochsim_rfgr(Mi[n:n + 1], rf[n:n + 1],
                                     gr[n:n + 1], loc0[n:n + 1],
                                     dt=dtn, vel=vel[n:n + 1])
            np.testing.assert_allclose(Mo[n:n + 1], ref, atol=ATOL)


class TestVelocityEstimation:

    def test_recover_velocity_by_gradient_descent(self):
        r"""Inverse flow problem: recover per-spin velocities from the
        magnetization a bipolar-encoded pulse produces, by gradient
        descent through the flow simulator — enabled by the fused
        engine's dvel gradients."""
        optax = pytest.importorskip("optax")
        rng = np.random.default_rng(4)
        nM, nT = 6, 64
        dt = float(dt0)
        loc0 = jnp.asarray(rng.random((1, nM, 3)) - 0.5, DTYPE)
        vel_true = jnp.asarray(np.stack(
            [np.zeros(nM), np.zeros(nM),
             rng.uniform(-40, 40, nM)], -1)[None], DTYPE)
        Mi = jnp.broadcast_to(jnp.asarray([1., 0., 0.], DTYPE), (1, nM, 3))
        rf = jnp.zeros((1, 2, nT), DTYPE)
        # bipolar z-gradient: zero net area, nonzero first moment
        gz = np.concatenate([np.ones(nT // 2), -np.ones(nT // 2)])
        gr = jnp.asarray(np.stack([np.zeros(nT), np.zeros(nT), gz])[None],
                         DTYPE)

        def sim(vel):
            return sims.blochsim_rfgr(Mi, rf, gr, loc0, gam=gamH, dt=dt,
                                      vel=vel)
        M_meas = sim(vel_true)

        def loss(vz):
            vel = jnp.concatenate(
                [jnp.zeros((1, nM, 2), DTYPE), vz[..., None]], -1)
            return jnp.mean((sim(vel) - M_meas) ** 2)

        vz = jnp.zeros((1, nM), DTYPE)
        opt = optax.adam(1.0)
        state = opt.init(vz)

        @jax.jit
        def run(vz, state):
            def body(c, _):
                vz, state = c
                u, state = opt.update(jax.grad(loss)(vz), state, vz)
                return (optax.apply_updates(vz, u), state), None
            (vz, state), _ = jax.lax.scan(body, (vz, state), None,
                                          length=800)
            return vz
        vz = run(vz, state)
        err = float(jnp.max(jnp.abs(vz - vel_true[..., 2])))
        assert err < 1e-3, err  # cm/s, velocities up to +-40
