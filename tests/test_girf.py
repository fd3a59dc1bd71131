r"""Gradient-system impulse response tests (mrphy_tpu/utils/girf.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.utils.girf import apply_girf, exp_decay_girf


class TestApplyGirf:

    def test_identity_response(self):
        rng = np.random.default_rng(0)
        gr = jnp.asarray(rng.normal(size=(2, 3, 37)))
        h = np.zeros(9)
        h[0] = 1.0
        np.testing.assert_allclose(apply_girf(gr, h), gr, atol=1e-12)

    def test_pure_delay(self):
        rng = np.random.default_rng(1)
        gr = jnp.asarray(rng.normal(size=(1, 3, 32)))
        h = np.zeros(8)
        h[3] = 1.0
        out = np.asarray(apply_girf(gr, h))
        np.testing.assert_allclose(out[..., 3:], np.asarray(gr)[..., :-3],
                                   atol=1e-12)
        np.testing.assert_allclose(out[..., :3], 0, atol=1e-12)

    def test_matches_direct_convolution(self):
        rng = np.random.default_rng(2)
        gr = rng.normal(size=(1, 3, 41))
        h = rng.normal(size=(3, 7))
        out = np.asarray(apply_girf(jnp.asarray(gr), jnp.asarray(h)))
        for ax in range(3):
            ref = np.convolve(gr[0, ax], h[ax])[:41]
            np.testing.assert_allclose(out[0, ax], ref, atol=1e-10)

    def test_eddy_response_settles_to_dc(self):
        r"""Unit-DC-gain response: a long plateau must settle back to
        the commanded amplitude (the normalization contract)."""
        h = exp_decay_girf(256, 4e-6, amps=(0.05, 0.01),
                           taus=(1e-4, 1e-3))
        assert abs(h.sum() - 1.0) < 1e-12
        gr = jnp.ones((1, 3, 1024))
        out = np.asarray(apply_girf(gr, h))
        np.testing.assert_allclose(out[..., -1], 1.0, atol=1e-6)
        # the transient must actually distort before settling
        assert float(np.abs(out[0, 0, :64] - 1.0).max()) > 1e-3

    def test_differentiable(self):
        rng = np.random.default_rng(3)
        gr = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float64)
        h = jnp.asarray(exp_decay_girf(8, 4e-6, amps=(0.1,),
                                       taus=(1e-4,)))
        g = jax.grad(lambda x: jnp.sum(apply_girf(x, h) ** 2))(gr)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_preemphasis_solve_converges(self):
        r"""The deterministic core of girf-aware design: solving
        ``min_g ||apply_girf(g) - g*||²`` (convex) must recover a
        commanded waveform whose PLAYED version matches the desired
        ``g*`` — and that commanded waveform must genuinely differ from
        ``g*`` (i.e. real pre-emphasis, not a no-op)."""
        import optax
        rng = np.random.default_rng(4)
        gstar = jnp.asarray(np.cumsum(rng.normal(size=(1, 3, 64)), -1)
                            * 0.1, jnp.float64)
        h = jnp.asarray(exp_decay_girf(32, 4e-6, amps=(0.2,),
                                       taus=(4e-5,)))

        def loss(g):
            return jnp.mean((apply_girf(g, h) - gstar) ** 2)

        opt = optax.adam(3e-2)
        g = gstar
        state = opt.init(g)
        step = jax.jit(lambda g, s: (lambda gr, s2: (
            optax.apply_updates(g, gr[0]), gr[1]))(
                opt.update(jax.grad(loss)(g), s, g), s))
        for _ in range(400):
            g, state = step(g, state)
        played = apply_girf(g, h)
        scale = float(jnp.max(jnp.abs(gstar)))
        assert float(jnp.max(jnp.abs(played - gstar))) / scale < 1e-3
        assert float(jnp.max(jnp.abs(g - gstar))) / scale > 1e-2

    def test_design_girf_plumbing(self):
        r"""design_pulse(girf_=δ) must equal the girf-free design (the
        convolution is exact passthrough), and a real eddy response
        must change the outcome while respecting the hardware limits."""
        from mrphy_tpu import dt0
        from mrphy_tpu.models.mobjs import Examples
        from mrphy_tpu.design import design_pulse, DesignConfig
        from mrphy_tpu.utils import g2s

        cube = Examples.spincube()
        p = Examples.pulse()
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        cfg = DesignConfig(niter=8, lr=0.01, rfmax=12.0, smax=5e6,
                           dt=float(dt0))
        ident = np.zeros(8, np.float32)
        ident[0] = 1.0
        p_base, l_base = design_pulse(cube, p, Mtgt_, cfg=cfg)
        p_id, l_id = design_pulse(cube, p, Mtgt_, cfg=cfg,
                                  girf_=jnp.asarray(ident))
        # identity response: same loss SURFACE (iteration-0 values
        # match). Trajectories are not comparable: the f32 FFT
        # round-trip adds ~1e-7 waveform noise, and Adam's first
        # update is sign-like — near-zero gradient components flip,
        # so even one step diverges by design, not by bug.
        np.testing.assert_allclose(float(l_id[0]), float(l_base[0]),
                                   atol=1e-5)
        assert np.isfinite(np.asarray(l_id)).all()

        h = jnp.asarray(exp_decay_girf(32, float(dt0), amps=(0.2,),
                                       taus=(4e-5,)), jnp.float32)
        p_g, l_g = design_pulse(cube, p, Mtgt_, cfg=cfg, girf_=h)
        assert np.isfinite(np.asarray(l_g)).all()
        # the response must actually influence the optimization
        assert float(jnp.max(jnp.abs(p_g.gr - p_base.gr))) > 1e-6
        # hardware limits still hold on the COMMANDED waveform
        assert float(jnp.max(jnp.abs(
            g2s(p_g.gr, cfg.dt)))) <= cfg.smax * (1 + 1e-6)
        assert float(jnp.max(jnp.linalg.norm(p_g.rf, axis=1))) \
            <= 12.0 + 1e-4
