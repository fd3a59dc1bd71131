r"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed machinery to mirror (SURVEY §2.9); these
tests validate the TPU-native design: spin-sharded simulation equals the
single-device result, and the graft entry's sharded training step runs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu.ops import sims
from mrphy_tpu.parallel import make_mesh, shard_spins, blochsim_sharded
from mrphy_tpu.parallel.mesh import pad_spins, SPIN_AXIS


class TestParallel:

    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_mesh_shapes(self):
        mesh = make_mesh(batch=2)
        assert mesh.shape == {'batch': 2, 'spins': 4}
        mesh = make_mesh()
        assert mesh.shape == {'batch': 1, 'spins': 8}

    def test_blochsim_sharded_matches_single_device(self):
        mesh = make_mesh()  # 1 x 8
        rng = np.random.default_rng(0)
        N, nM, nT = 1, 64, 32
        Mi = jnp.asarray(rng.random((N, nM, 3)))
        Beff = jnp.asarray(rng.random((N, nM, nT, 3)))
        T1 = jnp.asarray([[1.]])
        T2 = jnp.asarray([[4e-2]])

        Mo_ref = sims.blochsim(Mi, Beff, T1=T1, T2=T2, backend='xla')
        Mo_sh = blochsim_sharded(mesh, Mi, Beff, T1=T1, T2=T2,
                                 backend='xla')
        np.testing.assert_allclose(Mo_sh, Mo_ref, atol=1e-12)

        # gradients through the shard_map'd engine match too
        g_sh = jax.grad(lambda b: jnp.sum(blochsim_sharded(
            mesh, Mi, b, T1=T1, T2=T2, backend='xla') ** 2))(Beff)
        g_ref = jax.grad(lambda b: jnp.sum(sims.blochsim(
            Mi, b, T1=T1, T2=T2, backend='xla') ** 2))(Beff)
        np.testing.assert_allclose(g_sh, g_ref, atol=1e-12)

    def test_grad_sharded_matches(self):
        mesh = make_mesh()
        rng = np.random.default_rng(1)
        N, nM, nT = 1, 64, 16
        Mi = jnp.asarray(rng.random((N, nM, 3)))
        Beff = jnp.asarray(rng.random((N, nM, nT, 3)))

        def loss(b):
            return jnp.sum(sims.blochsim(Mi, b, backend='xla') ** 2)

        g_ref = jax.grad(loss)(Beff)
        sh = shard_spins(mesh, 4)
        g_sh = jax.jit(jax.grad(loss))(jax.device_put(Beff, sh))
        np.testing.assert_allclose(g_sh, g_ref, atol=1e-12)

    def test_pad_spins(self):
        mesh = make_mesh()
        x = jnp.ones((1, 13, 3))
        xp = pad_spins(x, mesh)
        assert xp.shape == (1, 16, 3)
        assert mesh.shape[SPIN_AXIS] == 8
        np.testing.assert_allclose(xp[:, :13], x, atol=0)
        np.testing.assert_allclose(xp[:, 13:], 0, atol=0)

    def test_graft_dryrun_multichip(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'graft_entry', '__graft_entry__.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
        mod.dryrun_multichip(4)

    def test_graft_entry_compiles(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'graft_entry', '__graft_entry__.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_shard_spin_obj(self):
        from mrphy_tpu.parallel import shard_spin_obj
        from mrphy_tpu.models.mobjs import SpinArray, Pulse
        import numpy as np
        mesh = make_mesh()
        rng = np.random.default_rng(0)
        arr = SpinArray((1, 4, 4), M_=jnp.asarray(rng.random((1, 16, 3))))
        arr_sh = shard_spin_obj(arr, mesh)
        np.testing.assert_allclose(arr_sh.M_, arr.M_, atol=0)
        assert 'spins' in str(arr_sh.M_.sharding.spec)
        # sharded object still simulates correctly
        p_rf = jnp.asarray(rng.random((1, 2, 8)))
        p_gr = jnp.asarray(rng.random((1, 3, 8)))
        M1 = arr.applypulse(Pulse(p_rf, p_gr), loc_=jnp.asarray(
            rng.random((1, 16, 3))) * 0)
        M2 = arr_sh.applypulse(Pulse(p_rf, p_gr), loc_=jnp.zeros((1, 16, 3)))
        np.testing.assert_allclose(M1, M2, atol=1e-12)

    def test_blochsim_rfgr_sharded_matches(self):
        r"""Fused waveform engine under shard_map == unsharded engine:
        forward AND gradients (incl. the psum'd waveform grads), on both
        a (2, 4) and a (1, 8) mesh, with relax + df + b1Map + vel."""
        from mrphy_tpu import gamH, dt0
        from mrphy_tpu.parallel import blochsim_rfgr_sharded

        rng = np.random.default_rng(3)
        N, nM, nT = 2, 64, 24
        Mi = jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1)))
        loc = jnp.asarray(rng.random((N, nM, 3)) - .5)
        df = jnp.asarray(rng.random((N, nM)) * 50)
        b1 = jnp.asarray(np.stack([0.5 + rng.random((N, nM)),
                                   rng.random((N, nM)) - .5], -1))
        vel = jnp.asarray(rng.random((N, nM, 3)) - .5)
        rf = jnp.asarray(rng.random((N, 2, nT)) * .1)
        gr = jnp.asarray(rng.random((N, 3, nT)))
        T1 = jnp.asarray([[1.47]])
        T2 = jnp.asarray([[0.07]])
        kw = dict(T1=T1, T2=T2, df=df, b1Map=b1, vel=vel, gam=gamH,
                  dt=dt0)

        Mo_ref = sims.blochsim_rfgr(Mi, rf, gr, loc, **kw)

        def loss_ref(rf, gr, Mi, loc):
            return jnp.sum(sims.blochsim_rfgr(Mi, rf, gr, loc, **kw) ** 2)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(rf, gr, Mi, loc)

        for batch in (2, 1):
            mesh = make_mesh(batch=batch)
            Mo = blochsim_rfgr_sharded(mesh, Mi, rf, gr, loc, **kw)
            np.testing.assert_allclose(Mo, Mo_ref, atol=1e-12)

            def loss_sh(rf, gr, Mi, loc):
                from mrphy_tpu.parallel import rfgr_sharded_traceable
                Mo = rfgr_sharded_traceable(mesh, Mi, rf, gr, loc, **kw)
                return jnp.sum(Mo ** 2)
            g_sh = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2, 3)))(
                rf, gr, Mi, loc)
            for a, b in zip(g_sh, g_ref):
                np.testing.assert_allclose(a, b, atol=1e-12)

    def test_blochsim_rfgr_sharded_norelax_multicoil(self):
        r"""No-relaxation + multi-coil (nC=3) branch under shard_map."""
        from mrphy_tpu import gamH, dt0
        from mrphy_tpu.parallel import blochsim_rfgr_sharded

        rng = np.random.default_rng(4)
        N, nM, nT, nC = 1, 32, 16, 3
        Mi = jnp.asarray(np.tile([1., 0., 0.], (N, nM, 1)))
        loc = jnp.asarray(rng.random((N, nM, 3)) - .5)
        b1 = jnp.asarray(rng.random((N, nM, 2, nC)) - .3)
        rf = jnp.asarray(rng.random((N, 2, nT, nC)) * .1)
        gr = jnp.asarray(rng.random((N, 3, nT)))

        mesh = make_mesh()  # 1 x 8
        Mo_ref = sims.blochsim_rfgr(Mi, rf, gr, loc, b1Map=b1, gam=gamH,
                                    dt=dt0)
        Mo = blochsim_rfgr_sharded(mesh, Mi, rf, gr, loc, b1Map=b1,
                                   gam=gamH, dt=dt0)
        np.testing.assert_allclose(Mo, Mo_ref, atol=1e-12)

    def test_applypulse_mesh_matches(self):
        r"""Object-level multi-chip: SpinArray/SpinCube/SpinBolus
        ``applypulse(mesh=...)`` equals the single-device result."""
        from mrphy_tpu.models.mobjs import SpinArray, SpinBolus, Pulse

        rng = np.random.default_rng(6)
        N, nM, nT = 1, 64, 12
        mesh = make_mesh()
        p = Pulse(jnp.asarray(rng.random((N, 2, nT)) * .1),
                  jnp.asarray(rng.random((N, 3, nT))))
        loc_ = jnp.asarray(rng.random((N, nM, 3)) - .5)

        arr = SpinArray((N, 8, 8),
                        M_=jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1))))
        # jit the eager object-level calls (same dispatch-cost story as
        # the sharded-loss tests above)
        f1 = jax.jit(lambda o: o.applypulse(p, loc_=loc_))
        f2 = jax.jit(lambda o: o.applypulse(p, loc_=loc_, mesh=mesh))
        np.testing.assert_allclose(f2(arr), f1(arr), atol=1e-12)

        bol = SpinBolus((N, 8, 8),
                        vel_=jnp.asarray(rng.random((N, nM, 3)) - .5),
                        M_=jnp.asarray(np.tile([1., 0., 0.], (N, nM, 1))))
        g1 = jax.jit(lambda o: o.applypulse(p, loc_=loc_))
        g2 = jax.jit(lambda o: o.applypulse(p, loc_=loc_, mesh=mesh))
        np.testing.assert_allclose(g2(bol), g1(bol), atol=1e-12)

    def test_oracle_sharded_matches(self):
        r"""slowsims.blochsim(mesh=) — incl. T1/T2 gradients, which only
        the oracle engine provides."""
        from mrphy_tpu.ops import slowsims
        mesh = make_mesh()
        rng = np.random.default_rng(3)
        N, nM, nT = 1, 64, 24
        M = jnp.asarray(rng.random((N, nM, 3)))
        Beff = jnp.asarray(rng.normal(size=(N, nM, nT, 3)) * 0.05)
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, (N, nM)))
        T2 = jnp.asarray(rng.uniform(0.02, 0.2, (N, nM)))

        Mo = slowsims.blochsim(M, Beff, T1=T1, T2=T2)
        Mo_sh = slowsims.blochsim(M, Beff, T1=T1, T2=T2, mesh=mesh)
        np.testing.assert_allclose(Mo_sh, Mo, atol=1e-12)

        def loss(T1, T2, mesh):
            return jnp.sum(slowsims.blochsim(M, Beff, T1=T1, T2=T2,
                                             mesh=mesh) ** 2)
        f = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)
        g_sh = f(T1, T2, mesh)
        g = f(T1, T2, None)
        np.testing.assert_allclose(g_sh[0], g[0], atol=1e-12)
        np.testing.assert_allclose(g_sh[1], g[1], atol=1e-12)

    def test_mc_sharded_matches(self):
        r"""Fwd parity + per-voxel exchange-rate gradient parity (CEST
        fitting) in ONE value_and_grad per variant — the 8-device
        shard_map VJP compile dominates this test's cost."""
        from mrphy_tpu.ops import slowsims
        mesh = make_mesh()
        rng = np.random.default_rng(4)
        N, nM, nT = 1, 16, 8
        Ma = jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1)))
        Mb = 0.05 * Ma
        Beff = jnp.asarray(rng.normal(size=(N, nM, nT, 3)) * 0.01)
        kw = dict(T1a=1.2, T2a=0.06, T1b=1.0, T2b=0.01,
                  kba=50.0, Ma0=1.0, Mb0=0.02, dfb=750.0, dt=2e-4)
        kab_v = jnp.asarray(rng.uniform(0.5, 2.0, (N, nM)))
        W = jnp.asarray(rng.normal(size=(2, N, nM, 3)))

        def loss(kab, mesh):
            a, b = slowsims.blochsim_mc(Ma, Mb, Beff, kab=kab,
                                        mesh=mesh, **kw)
            return jnp.sum(W[0] * a + W[1] * b)
        # jit with the mesh static: EAGER shard_map dispatch compiles
        # every primitive separately (~100 s); jitted this is ~10 s
        f = jax.jit(jax.value_and_grad(loss), static_argnums=1)
        v_sh, g_sh = f(kab_v, mesh)
        v, g = f(kab_v, None)
        np.testing.assert_allclose(v_sh, v, atol=1e-12)
        np.testing.assert_allclose(g_sh, g, atol=1e-12)

    def test_mc_rfgr_sharded_matches(self):
        r"""Fused two-pool waveform engine under shard_map == unsharded:
        fwd + per-voxel exchange-rate grad + psum'd rf grad in ONE
        value_and_grad per variant."""
        from mrphy_tpu.ops import mc
        mesh = make_mesh()
        rng = np.random.default_rng(7)
        N, nM, nT = 1, 16, 8
        Ma = jnp.asarray(np.tile([0., 0., 1.], (N, nM, 1)))
        Mb = 0.05 * Ma
        loc = jnp.asarray(rng.random((N, nM, 3)) - .5)
        df = jnp.asarray(rng.random((N, nM)) * 50)
        rf = jnp.asarray(rng.random((N, 2, nT)) * .05)
        gr = jnp.asarray(rng.random((N, 3, nT)))
        kw = dict(T1a=1.2, T2a=0.06, T1b=1.0, T2b=0.01, kba=50.0,
                  Ma0=1.0, Mb0=0.02, dfb=750.0, dt=2e-4, df=df,
                  backend='xla')
        kab_v = jnp.asarray(rng.uniform(0.5, 2.0, (N, nM)))
        W = jnp.asarray(rng.normal(size=(2, N, nM, 3)))

        def loss(kab, rf, mesh):
            a, b = mc.blochsim_mc_rfgr(Ma, Mb, rf, gr, loc, kab=kab,
                                       mesh=mesh, **kw)
            return jnp.sum(W[0] * a + W[1] * b)
        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)),
                    static_argnums=2)
        v_sh, g_sh = f(kab_v, rf, mesh)
        v, g = f(kab_v, rf, None)
        np.testing.assert_allclose(v_sh, v, atol=1e-12)
        for a, b in zip(g_sh, g):
            np.testing.assert_allclose(a, b, atol=1e-12)

    def test_epg_cpmg_sharded_matches(self):
        from mrphy_tpu.ops import epg
        mesh = make_mesh()
        rng = np.random.default_rng(5)
        nV, nE = 8, 6
        flips = jnp.asarray(np.tile(np.pi * 0.9, (nV, nE)))
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, (nV,)))
        T2 = jnp.asarray(rng.uniform(0.02, 0.2, (nV,)))
        W = jnp.asarray(rng.normal(size=(nV, nE, 2)))

        def loss(T2, mesh):
            e = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01, mesh=mesh)
            return jnp.sum(W * e)
        f = jax.jit(jax.value_and_grad(loss), static_argnums=1)
        v_sh, g_sh = f(T2, mesh)
        v, g = f(T2, None)
        np.testing.assert_allclose(v_sh, v, atol=1e-12)
        np.testing.assert_allclose(g_sh, g, atol=1e-12)

    def test_epg_cpmg_sharded_sequence_kwargs(self):
        # regression: tuple/list kwargs must shard per-voxel like
        # arrays (a tuple used to become a STATIC replicated constant
        # → silently wrong shapes/physics; a list crashed the cache)
        from mrphy_tpu.ops import epg
        mesh = make_mesh()
        nV, nE = 8, 4
        flips = jnp.full((nV, nE), np.pi * 0.9)
        T1_t = tuple(0.5 + 0.1 * i for i in range(nV))
        e_arr = epg.epg_cpmg(flips, T1=jnp.asarray(T1_t), T2=0.08,
                             esp=0.01, mesh=mesh)
        e_tup = epg.epg_cpmg(flips, T1=T1_t, T2=0.08, esp=0.01,
                             mesh=mesh)
        e_lst = epg.epg_cpmg(flips, T1=list(T1_t), T2=0.08, esp=0.01,
                             mesh=mesh)
        assert e_tup.shape == (nV, nE, 2)
        np.testing.assert_allclose(e_tup, e_arr, atol=0)
        np.testing.assert_allclose(e_lst, e_arr, atol=0)

    def test_epg_cpmg_sharded_shared_flips_necho_eq_nv(self):
        # regression: a shared 1-D flips train whose length equals nV
        # must stay the (replicated) echo axis, not get sharded
        from mrphy_tpu.ops import epg
        mesh = make_mesh()
        nV = nE = 8
        flips = jnp.full((nE,), np.pi * 0.9)
        T1 = jnp.asarray(np.linspace(0.5, 2.0, nV))
        e_sh = epg.epg_cpmg(flips, T1=T1, T2=0.08, esp=0.01, mesh=mesh)
        e = epg.epg_cpmg(flips, T1=T1, T2=0.08, esp=0.01)
        assert e_sh.shape == (nV, nE, 2)
        np.testing.assert_allclose(np.asarray(e_sh), np.asarray(e),
                                   atol=1e-12)

    def test_mesh_composes_with_pallas_dictionary_kernels(self):
        r"""``mesh=`` + ``backend='pallas'``: each device runs the
        fused dictionary/mapping kernel on its voxel shard — equal to
        the single-device kernel up to compile-fusion ulps (per-atom
        math is independent of tile padding; the epgx propagator
        precompute may fuse differently across the two programs)."""
        from mrphy_tpu.ops import epg, ssfp
        mesh = make_mesh()
        rng = np.random.default_rng(31)
        nV, nE = 16, 6
        flips = jnp.asarray(rng.uniform(1.5, 3.1, nE), jnp.float32)
        T1 = jnp.asarray(rng.uniform(0.5, 2.0, nV), jnp.float32)
        T2 = jnp.asarray(rng.uniform(0.02, 0.2, nV), jnp.float32)
        df = jnp.asarray(rng.uniform(-80, 80, nV), jnp.float32)

        a = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01,
                         backend='pallas')
        b = epg.epg_cpmg(flips, T1=T1, T2=T2, esp=0.01,
                         backend='pallas', mesh=mesh)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        a = ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                             backend='pallas')
        b = ssfp.bssfp_train(flips, T1=T1, T2=T2, tr=5e-3, df=df,
                             backend='pallas', mesh=mesh)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        kw = dict(T1a=T1, T2a=T2, T1b=0.3, T2b=0.01, kab=2.0,
                  kba=8.0, tr=12e-3, K=8)
        a = epg.epgx_spgr(flips, None, backend='pallas', **kw)
        b = epg.epgx_spgr(flips, None, backend='pallas', mesh=mesh,
                          **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)
        mt = dict(T1a=T1, T2a=T2, T1b=0.25, kab=3.0, kba=12.0,
                  tr=12e-3, wt=jnp.full((nE,), 2.0, jnp.float32), K=8)
        a = epg.epgx_mt_spgr(flips, None, backend='pallas', **mt)
        b = epg.epgx_mt_spgr(flips, None, backend='pallas', mesh=mesh,
                             **mt)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-7)

    def test_epgx_sharded_shared_flips_xla(self):
        r"""The relaxed epgx wrapper: a shared 1-D train replicates
        (nV from the tissue arrays) and matches the batched-flips
        sharding and the unsharded run."""
        from mrphy_tpu.ops import epg
        mesh = make_mesh()
        rng = np.random.default_rng(33)
        nV, nE = 8, 5
        flips = jnp.asarray(rng.uniform(1.5, 3.1, nE))
        T1a = jnp.asarray(rng.uniform(0.5, 2.0, nV))
        kw = dict(T1a=T1a, T2a=0.08, T1b=0.3, T2b=0.01, kab=2.0,
                  kba=8.0, esp=0.01)
        ref = epg.epgx_cpmg(flips, **kw)
        out = epg.epgx_cpmg(flips, mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    def test_timing_utils(self):
        from mrphy_tpu.utils.timing import (host_sync, amortized_timeit,
                                            chained_timeit)
        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        host_sync(f(x))
        dt1 = amortized_timeit(f, x, repeats=2)
        dt2 = chained_timeit(f, x, repeats=2,
                             feedback=lambda x, out: out * 0.5)
        assert dt1 > 0 and dt2 > 0


def test_enable_persistent_cache(tmp_path, monkeypatch):
    r"""Smoke: sets the compilation-cache config (behavior is exercised
    on real hardware; here we only verify the knobs are applied). The
    suite's conftest sets ``MRPHY_NO_PERSISTENT_CACHE`` (the function
    must then be a no-op — torn entries from a crashed writer abort
    cache reads); lift it to check the knobs, then restore."""
    import jax
    from mrphy_tpu.utils.timing import enable_persistent_cache
    d = str(tmp_path / 'jc')
    enable_persistent_cache(d)               # gated: must be a no-op
    assert jax.config.jax_compilation_cache_dir is None
    monkeypatch.delenv('MRPHY_NO_PERSISTENT_CACHE', raising=False)
    try:
        enable_persistent_cache(d)
        got = jax.config.jax_compilation_cache_dir
        # host-fingerprint suffix: another machine's XLA:CPU AOT
        # entries SIGILL on load, so the dir is per-CPU-flags
        assert got is not None and got.startswith(d + '-')
    finally:
        jax.config.update('jax_compilation_cache_dir', None)


class TestSubspaceMeshParity:
    r"""Round 5: `mesh=` pass-through in the subspace MRF stack — each
    frame's NUFFT samples shard over the spin axis; the sharded
    encode/adjoint/recon equal the unsharded ones."""

    def _setup(self):
        from mrphy_tpu.ops import mrf
        from mrphy_tpu.ops.nufft import nufft_plan
        rng = np.random.default_rng(11)
        N, nTR, nRO = 16, 12, 40
        fov = 20.0
        # a random J-closed pair basis is enough for operator parity
        M = rng.standard_normal((nTR * 2, 4))
        Q, _ = np.linalg.qr(M)
        basis = mrf.Basis(B=jnp.asarray(Q), jc=None, s=jnp.ones(4),
                          tail=(nTR, 2))
        kmax = N / (2 * fov)
        rad = (np.arange(nRO) - nRO / 2 + 0.5) * (2 * kmax / nRO)
        phi = np.pi * (np.sqrt(5) - 1) / 2 * np.arange(nTR)
        ktrajs = jnp.asarray(np.stack([np.cos(phi)[:, None] * rad,
                                       np.sin(phi)[:, None] * rad],
                                      1))
        plan = nufft_plan((N, N), (fov, fov), dtype=jnp.float64)
        return mrf, plan, ktrajs, basis, rng

    def test_subspace_encode_adjoint_recon_sharded(self):
        mrf, plan, ktrajs, basis, rng = self._setup()
        mesh = make_mesh()                        # 1 x 8
        N = plan.im_size[0]
        x = jnp.asarray(rng.standard_normal((4, N, N)))
        y = jnp.asarray(rng.standard_normal(
            (ktrajs.shape[0], ktrajs.shape[2], 2)))
        e0 = mrf.subspace_encode(plan, ktrajs, basis, x)
        e1 = mrf.subspace_encode(plan, ktrajs, basis, x, mesh=mesh)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                                   atol=1e-11)
        a0 = mrf.subspace_adjoint(plan, ktrajs, basis, y)
        a1 = mrf.subspace_adjoint(plan, ktrajs, basis, y, mesh=mesh)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   atol=1e-11)
        r0 = mrf.kspace_subspace_recon(plan, ktrajs, basis, y,
                                       iters=4, method='frames')
        r1 = mrf.kspace_subspace_recon(plan, ktrajs, basis, y,
                                       iters=4, method='frames',
                                       mesh=mesh)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   atol=1e-9)
