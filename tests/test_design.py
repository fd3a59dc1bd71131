r"""Joint RF+gradient design loop tests: loss decreases, constraints hold,
multi-scale interpT refinement works end-to-end."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import dt0
from mrphy_tpu.design import (DesignConfig, design_pulse, init_params,
                              params2pulse)
from mrphy_tpu.models.mobjs import Examples
from mrphy_tpu.utils import g2s


class TestDesign:

    def test_params_roundtrip(self):
        # rfmax strictly above the demo pulse's |rf|=10 so the waveform is
        # interior to the clamp (at the boundary tan(ρ/rfmax·π/2) diverges
        # and the f32 round-trip degrades by design)
        cfg = DesignConfig(rfmax=12.0, smax=5e6, dt=float(dt0))
        p = Examples.pulse()
        params = init_params(p.rf, p.gr, cfg)
        rf, gr = params2pulse(params, cfg)
        np.testing.assert_allclose(rf, np.asarray(p.rf), atol=1e-4)
        np.testing.assert_allclose(gr, np.asarray(p.gr), atol=2e-2)

    def test_design_reduces_loss_and_respects_limits(self):
        cube = Examples.spincube()
        p = Examples.pulse()
        # rfmax strictly above the demo pulse's |rf|=10: at the boundary
        # the tan reparametrization is ill-conditioned (trho ~ 1e7) and
        # this tiny nonconvex problem becomes descent-flaky
        cfg = DesignConfig(niter=30, lr=0.01, rfmax=12.0, smax=5e6,
                           dt=float(dt0))
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        p2, losses = design_pulse(cube, p, Mtgt_, cfg=cfg)

        assert float(losses[-1]) < float(losses[0])
        assert float(jnp.max(jnp.linalg.norm(p2.rf, axis=1))) <= 12.0 + 1e-4
        s = g2s(p2.gr, cfg.dt)
        assert float(jnp.max(jnp.abs(s))) <= cfg.smax * (1 + 1e-4)

    def test_optimizer_lbfgs_converges(self):
        r"""cfg.optimizer='lbfgs' (zoom linesearch through the Bloch sim)
        reduces the loss; in this smooth small problem it should match or
        beat Adam at the same iteration count."""
        cube = Examples.spincube()
        p = Examples.pulse()
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        base = dict(niter=15, rfmax=12.0, smax=5e6, dt=float(dt0))
        pa, la = design_pulse(cube, p, Mtgt_,
                              cfg=DesignConfig(lr=0.01, **base))
        pl, ll = design_pulse(
            cube, p, Mtgt_, cfg=DesignConfig(optimizer='lbfgs', **base))
        assert float(ll[-1]) < float(ll[0])
        assert float(ll[-1]) <= float(la[-1]) * 1.5
        # constraints still hold by construction under the new update rule
        assert float(jnp.max(jnp.linalg.norm(pl.rf, axis=1))) <= 12.0 + 1e-4

    def test_optimizer_variants_and_bad_name(self):
        from mrphy_tpu.design import make_optimizer
        import pytest
        for name in ('adam', 'adamw', 'sgd', 'momentum', 'lbfgs'):
            make_optimizer(DesignConfig(optimizer=name))
        with pytest.raises(ValueError, match='nadam'):
            make_optimizer(DesignConfig(optimizer='nadam'))

    def test_multiscale_interpT_refine(self):
        r"""Design at coarse dt, refine via interpT, continue: the README's
        multi-scale strategy (/root/reference/README.md:27-36)."""
        cube = Examples.spincube()
        p = Examples.pulse()
        dt_c = float(dt0) * 2
        p_coarse = p.interpT(jnp.asarray(dt_c))
        cfg_c = DesignConfig(niter=5, lr=0.01, rfmax=12.0, smax=5e6,
                             dt=dt_c)
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        p1, losses1 = design_pulse(cube, p_coarse, Mtgt_, cfg=cfg_c)

        p_fine = p1.interpT(jnp.asarray(float(dt0)))
        # refinement doubles nT exactly (the f32-dt truncation bug would
        # silently drop a sample here)
        assert p_fine.rf.shape[2] == 2 * p1.rf.shape[2]
        cfg_f = DesignConfig(niter=10, lr=0.005, rfmax=12.0, smax=5e6,
                             dt=float(dt0))
        p2, losses2 = design_pulse(cube, p_fine, Mtgt_, cfg=cfg_f)
        # the toy problem is nonconvex: require progress at *some* point
        # of the refine stage rather than strict last-vs-first descent
        assert float(jnp.min(losses2)) < float(losses2[0])
        assert bool(jnp.all(jnp.isfinite(losses2)))
        assert p2.rf.shape[2] == p_fine.rf.shape[2]

    def test_design_multiscale_api(self):
        r"""design_multiscale = the manual coarse→fine loop in one call:
        stages chain through interpT, nT refines, losses stay finite and
        the final stage makes progress."""
        from mrphy_tpu.design import design_multiscale
        cube = Examples.spincube()
        p = Examples.pulse()
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        cfg = DesignConfig(lr=0.01, rfmax=12.0, smax=5e6)
        p2, losses = design_multiscale(
            cube, p, Mtgt_, dts=[2 * float(dt0), float(dt0)],
            niters=[5, 8], cfg=cfg)
        assert len(losses) == 2
        assert losses[0].shape == (5,) and losses[1].shape == (8,)
        # coarse stage halves nT; refine doubles it back
        assert p2.rf.shape[2] == p.rf.shape[2]
        assert bool(jnp.all(jnp.isfinite(jnp.concatenate(losses))))
        assert float(jnp.min(losses[1])) < float(losses[0][0])

    def test_ptx_multicoil_design(self):
        r"""Parallel-transmit design: per-coil RF (N, xy, nT, nCoils)
        optimized jointly with gradients under a multi-coil B1 map —
        works through the same design loop with no special-casing."""
        import numpy as np
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        nC, nT = 4, 64
        cube = mobjs.Examples.spincube()
        rng = np.random.default_rng(0)
        rf = jnp.asarray(0.01 * rng.normal(size=(1, 2, nT, nC)),
                         jnp.float32)
        gr = jnp.asarray(0.1 * rng.normal(size=(1, 3, nT)), jnp.float32)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)
        b1_ = jnp.asarray(0.5 + 0.5 * rng.random((1, cube.nM, 2, nC)),
                          jnp.float32)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.], jnp.float32),
                         (1, cube.nM, 1))
        p2, losses = design_pulse(
            cube, p, Mtgt_, b1Map_=b1_,
            cfg=DesignConfig(niter=30, lr=0.05, rfmax=0.25, smax=12e3,
                             dt=float(dt0)))
        assert p2.rf.shape == (1, 2, nT, nC)
        assert float(losses[-1]) < 0.1 * float(losses[0])
        assert float(jnp.abs(p2.rf).max()) <= 0.25 + 1e-5

    def test_ptx_percoil_rfmax(self):
        r"""Heterogeneous per-coil RF limits (the realistic pTx
        constraint): cfg.rfmax as a (nCoils,) tuple; each coil's
        |rf| bound must hold by construction, and the design must
        actually drive both coils against their (different) limits."""
        import numpy as np
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        nC, nT = 2, 64
        limits = (0.02, 0.25)              # coil 0 much tighter
        cube = mobjs.Examples.spincube()
        rng = np.random.default_rng(1)
        rf = jnp.asarray(0.005 * rng.normal(size=(1, 2, nT, nC)),
                         jnp.float32)
        gr = jnp.asarray(0.1 * rng.normal(size=(1, 3, nT)), jnp.float32)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)
        b1_ = jnp.asarray(0.5 + 0.5 * rng.random((1, cube.nM, 2, nC)),
                          jnp.float32)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.], jnp.float32),
                         (1, cube.nM, 1))
        p2, losses = design_pulse(
            cube, p, Mtgt_, b1Map_=b1_,
            cfg=DesignConfig(niter=40, lr=0.1, rfmax=limits, smax=12e3,
                             dt=float(dt0)))
        assert float(losses[-1]) < float(losses[0])
        amp = jnp.linalg.norm(p2.rf, axis=1)      # (1, nT, nC)
        for c, lim in enumerate(limits):
            mx = float(amp[..., c].max())
            assert mx <= lim + 1e-6, (c, mx, lim)
        # the tight coil must be BOUND by its own limit (i.e. the limit
        # is active, not vacuous): it gets close to 0.02 yet far under
        # the loose coil's 0.25
        assert float(amp[..., 0].max()) > 0.5 * limits[0]
        # round-trip: the designed pulse re-parametrizes consistently
        from mrphy_tpu.design.joint import (init_params, params2pulse,
                                            _rfmax_arr)
        cfg = DesignConfig(rfmax=limits, dt=float(dt0))
        rf_rt, _ = params2pulse(init_params(p2.rf, p2.gr, cfg), cfg)
        np.testing.assert_allclose(np.asarray(rf_rt),
                                   np.asarray(p2.rf), atol=1e-5)
        assert _rfmax_arr(cfg).shape == (1, nC)

    def test_gmax_penalty_limits_gradient_amplitude(self):
        r"""lam_gmax: the slew parametrization leaves |g| free; the
        hinge penalty must pull the designed gradient inside gmax
        (compare against the same design without the penalty)."""
        import numpy as np
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        nT = 64
        cube = mobjs.Examples.spincube()
        rng = np.random.default_rng(2)
        rf = jnp.asarray(0.01 * rng.normal(size=(1, 2, nT)), jnp.float32)
        # start from a gradient ALREADY above the limit
        gr = jnp.asarray(3.0 + rng.random((1, 3, nT)), jnp.float32)
        p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.], jnp.float32),
                         (1, cube.nM, 1))
        gmax = 1.0        # tight: must actually bind
        base = dict(niter=40, lr=0.1, rfmax=0.25, smax=12e4,
                    dt=float(dt0), gmax=gmax)
        p_free, _ = design_pulse(cube, p, Mtgt_,
                                 cfg=DesignConfig(**base))
        p_pen, _ = design_pulse(cube, p, Mtgt_,
                                cfg=DesignConfig(lam_gmax=100.0, **base))
        over_free = float(jnp.max(jnp.abs(p_free.gr)))
        over_pen = float(jnp.max(jnp.abs(p_pen.gr)))
        assert over_free > gmax * 1.2, over_free  # limit binds the test
        assert over_pen < over_free
        assert over_pen < gmax * 1.1, over_pen
        assert float(jnp.asarray(p_pen.gmax).reshape(-1)[0]) == gmax

    def test_design_on_mesh_matches_single_device(self):
        r"""design_pulse(mesh=...) — the multi-chip loop via shard_map —
        produces the same loss trajectory and waveforms as the
        single-device loop (f64, 8 virtual devices)."""
        import numpy as np
        from mrphy_tpu.models.mobjs import SpinArray, Pulse
        from mrphy_tpu.parallel import make_mesh

        rng = np.random.default_rng(7)
        N, nT = 1, 32
        arr = SpinArray((N, 8, 8),
                        M_=jnp.asarray(np.tile([0., 0., 1.], (N, 64, 1))))
        loc_ = jnp.asarray(rng.random((N, 64, 3)) - .5)
        p = Pulse(jnp.asarray(rng.random((N, 2, nT)) * .05),
                  jnp.asarray(rng.random((N, 3, nT)) * .1), dt=dt0)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.]), (N, 64, 1))
        cfg = DesignConfig(niter=8, lr=0.02, rfmax=0.25, smax=12e3,
                           dt=float(dt0))

        p1, l1 = design_pulse(arr, p, Mtgt_, loc_=loc_, cfg=cfg)
        mesh = make_mesh()  # N=1: all 8 devices on the spin axis
        p2, l2 = design_pulse(arr, p, Mtgt_, loc_=loc_, cfg=cfg,
                              mesh=mesh)
        np.testing.assert_allclose(l2, l1, atol=1e-12)
        np.testing.assert_allclose(p2.rf, p1.rf, atol=1e-10)
        np.testing.assert_allclose(p2.gr, p1.gr, atol=1e-10)

    def test_design_mesh_broadcast_args_batch2(self):
        r"""Batch-sharded design (dp=2) with broadcast-shaped optionals —
        w_/df_ of leading dim 1 while N=2 — must replicate on the batch
        axis, not crash the pre-placement, and match single-device."""
        import numpy as np
        from mrphy_tpu.models.mobjs import SpinArray, Pulse
        from mrphy_tpu.parallel import make_mesh

        rng = np.random.default_rng(11)
        N, nM, nT = 2, 32, 16
        arr = SpinArray((N, 4, 8),
                        M_=jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1))))
        loc_ = jnp.asarray(rng.random((N, nM, 3)) - .5)
        df_ = jnp.asarray(rng.random((1, nM)) * 20)   # broadcast (1, nM)
        w_ = jnp.asarray(rng.random((1, nM)) + .5)    # broadcast (1, nM)
        p = Pulse(jnp.asarray(rng.random((N, 2, nT)) * .05),
                  jnp.asarray(rng.random((N, 3, nT)) * .1), dt=dt0)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.]), (N, nM, 1))
        cfg = DesignConfig(niter=4, lr=0.02, rfmax=0.25, smax=12e3,
                           dt=float(dt0))

        p1, l1 = design_pulse(arr, p, Mtgt_, loc_=loc_, df_=df_, w_=w_,
                              cfg=cfg)
        mesh = make_mesh(batch=2)   # (2, 4) mesh
        p2, l2 = design_pulse(arr, p, Mtgt_, loc_=loc_, df_=df_, w_=w_,
                              cfg=cfg, mesh=mesh)
        np.testing.assert_allclose(l2, l1, atol=1e-12)
        np.testing.assert_allclose(p2.rf, p1.rf, atol=1e-10)

    def test_mls_loss_frees_the_phase(self):
        r"""Magnitude least squares (cfg.loss='mls'): a target whose
        phase pattern is deliberately unrealizable (random per-spin
        phases) is easy in magnitude — MLS must reach a much lower
        |Mxy| error than vector SSE at the same budget, and 'mls' with
        a phase-matched target must still converge."""
        import numpy as np
        from mrphy_tpu.models.mobjs import SpinArray, Pulse

        rng = np.random.default_rng(7)
        nM, nT = 24, 64
        arr = SpinArray((1, nM), M_=jnp.asarray(
            np.tile([0., 0., 1.], (1, nM, 1)), jnp.float32))
        loc_ = jnp.asarray(rng.uniform(-1, 1, (1, nM, 3)), jnp.float32)
        p = Pulse(jnp.asarray(rng.random((1, 2, nT)) * .02, jnp.float32),
                  jnp.asarray(rng.random((1, 3, nT)) * .1, jnp.float32),
                  dt=dt0)
        flip = np.deg2rad(20.)
        ph = rng.uniform(0, 2 * np.pi, nM)       # unrealizable phases
        Mtgt = np.stack([np.sin(flip) * np.cos(ph),
                         np.sin(flip) * np.sin(ph),
                         np.cos(flip) * np.ones(nM)], -1)[None]
        Mtgt_ = jnp.asarray(Mtgt, jnp.float32)

        def mag_err(p2):
            M = np.asarray(arr.applypulse(p2, loc_=loc_, doRelax=False))
            mag = np.hypot(M[0, :, 0], M[0, :, 1])
            return float(np.abs(mag - np.sin(flip)).max())

        kw = dict(niter=60, lr=0.02, rfmax=0.25, smax=12e3,
                  dt=float(dt0))
        p_sse, _ = design_pulse(arr, p, Mtgt_,
                                loc_=loc_, cfg=DesignConfig(**kw))
        p_mls, l_mls = design_pulse(arr, p, Mtgt_, loc_=loc_,
                                    cfg=DesignConfig(loss='mls', **kw))
        assert float(l_mls[-1]) < float(l_mls[0])
        e_sse, e_mls = mag_err(p_sse), mag_err(p_mls)
        assert e_mls < 0.5 * e_sse, (e_mls, e_sse)
        assert e_mls < 0.05, e_mls

    def test_weighted_allones_matches_unweighted(self):
        r"""All-ones broadcast weights (1, nM) with N>1 must reproduce the
        unweighted loss exactly (a bare sum(w_) normalization would be
        off by a factor of N)."""
        import numpy as np
        from mrphy_tpu.models.mobjs import SpinArray, Pulse

        rng = np.random.default_rng(12)
        N, nM, nT = 2, 16, 8
        arr = SpinArray((N, 4, 4),
                        M_=jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1))))
        loc_ = jnp.asarray(rng.random((N, nM, 3)) - .5)
        p = Pulse(jnp.asarray(rng.random((N, 2, nT)) * .05),
                  jnp.asarray(rng.random((N, 3, nT)) * .1), dt=dt0)
        Mtgt_ = jnp.tile(jnp.asarray([0., 1., 0.]), (N, nM, 1))
        cfg = DesignConfig(niter=3, lr=0.02, rfmax=0.25, smax=12e3,
                           dt=float(dt0))
        _, l_none = design_pulse(arr, p, Mtgt_, loc_=loc_, cfg=cfg)
        _, l_ones = design_pulse(arr, p, Mtgt_, loc_=loc_,
                                 w_=jnp.ones((1, nM)), cfg=cfg)
        np.testing.assert_allclose(l_ones, l_none, atol=1e-12)

    def test_weighted_loss_ignores_dont_care(self):
        r"""w_=0 spins must not influence the design: corrupting their
        targets changes nothing."""
        import numpy as np
        from mrphy_tpu import dt0
        from mrphy_tpu.models import mobjs
        from mrphy_tpu.design import design_pulse, DesignConfig

        cube = mobjs.Examples.spincube()
        p = mobjs.Examples.pulse()
        nM = cube.nM
        rng = np.random.default_rng(0)
        Mtgt = np.tile([0., 1., 0.], (1, nM, 1))
        w = (rng.random(nM) > 0.4).astype(np.float32)
        Mtgt_bad = Mtgt.copy()
        Mtgt_bad[0, w == 0] = rng.normal(size=(int((w == 0).sum()), 3))
        cfg = DesignConfig(niter=10, lr=0.02, rfmax=0.25, smax=12e3,
                           dt=float(dt0))
        w_ = jnp.asarray(w[None])
        p1, l1 = design_pulse(cube, p, jnp.asarray(Mtgt, jnp.float32),
                              w_=w_, cfg=cfg)
        p2, l2 = design_pulse(cube, p, jnp.asarray(Mtgt_bad, jnp.float32),
                              w_=w_, cfg=cfg)
        assert jnp.allclose(l1, l2, atol=1e-7)
        assert jnp.allclose(p1.rf, p2.rf, atol=1e-7)


class TestDesignCheckpoint:
    r"""Checkpoint/resume of the design loop (design/checkpoint.py):
    segmentation must be exact, resume must equal an uninterrupted run,
    and a config mismatch must refuse to resume."""

    def _setup(self):
        from mrphy_tpu.models import mobjs
        cube = mobjs.Examples.spincube()
        p = mobjs.Examples.pulse()
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        cfg = DesignConfig(niter=12, lr=0.01, rfmax=12.0, smax=5e6,
                           dt=float(dt0))
        return cube, p, Mtgt_, cfg

    def test_segmented_matches_single_scan(self, tmp_path):
        from mrphy_tpu.design import DesignCheckpoint
        cube, p, Mtgt_, cfg = self._setup()
        p_ref, l_ref = design_pulse(cube, p, Mtgt_, cfg=cfg)
        spec = DesignCheckpoint(dir=str(tmp_path / 'ckpt'), every=5)
        p_ck, l_ck = design_pulse(cube, p, Mtgt_, cfg=cfg,
                                  checkpoint=spec)
        # 12 iters as 5+5+2 segments: identical op order, bit-identical
        np.testing.assert_array_equal(np.asarray(l_ref),
                                      np.asarray(l_ck))
        np.testing.assert_array_equal(np.asarray(p_ref.rf),
                                      np.asarray(p_ck.rf))

    def test_resume_continues_from_saved_segment(self, tmp_path):
        import dataclasses
        from mrphy_tpu.design import DesignCheckpoint
        cube, p, Mtgt_, cfg = self._setup()
        spec = DesignCheckpoint(dir=str(tmp_path / 'ckpt'), every=4)
        # "interrupted" run: only 8 of the 12 iterations complete
        cfg8 = dataclasses.replace(cfg, niter=8)
        design_pulse(cube, p, Mtgt_, cfg=cfg8, checkpoint=spec)
        # resuming with niter=8 must be a no-op restore (0 new segments)
        p_again, l_again = design_pulse(cube, p, Mtgt_, cfg=cfg8,
                                        checkpoint=spec)
        assert l_again.shape == (8,)
        # resume to the FULL count: continues from iteration 8 and
        # equals the uninterrupted 12-iteration run bit-for-bit
        p_res, l_res = design_pulse(cube, p, Mtgt_, cfg=cfg,
                                    checkpoint=spec)
        p_ref, l_ref = design_pulse(cube, p, Mtgt_, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(l_ref),
                                      np.asarray(l_res))
        np.testing.assert_array_equal(np.asarray(p_ref.rf),
                                      np.asarray(p_res.rf))
        np.testing.assert_array_equal(np.asarray(l_ref[:8]),
                                      np.asarray(l_again))

    def test_config_mismatch_refuses(self, tmp_path):
        import dataclasses
        from mrphy_tpu.design import DesignCheckpoint
        cube, p, Mtgt_, cfg = self._setup()
        spec = DesignCheckpoint(dir=str(tmp_path / 'ckpt'), every=6)
        design_pulse(cube, p, Mtgt_, cfg=cfg, checkpoint=spec)
        cfg2 = dataclasses.replace(cfg, lr=0.05)
        try:
            design_pulse(cube, p, Mtgt_, cfg=cfg2, checkpoint=spec)
            raise RuntimeError('expected a config-mismatch refusal')
        except AssertionError as e:
            assert 'refusing to resume' in str(e)
