r"""Object-model tests: Pulse / SpinArray / SpinCube / Examples.

Mirrors `/root/reference/tests/test_mobjs.py`: construction + deepcopy +
asdict round-trip, crds_ writes (functional idiom), applypulse golden
values with/without relaxation and doUpdate semantics, freeprec golden,
interpT against hand-computed samples. Adds pytree/jit round-trip checks.
"""

from copy import deepcopy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi, _slice
from mrphy_tpu.models import mobjs

from tests._scenario import (MO_GOLD_RELAX, MO_GOLD_NORELAX, FREEPREC_GOLD)

ATOL = 1e-9
DTYPE = jnp.float64


def _setup(T1_, T2, gam, dtype=DTYPE):
    r"""Rebuild of the reference's test scenario (test_mobjs.py:14-59)."""
    N, Nd, nT = 1, (3, 3, 3), 512

    t = jnp.arange(nT, dtype=dtype).reshape((N, 1, nT))
    rf = 10 * jnp.concatenate([jnp.cos(t / nT * 2 * pi),
                               jnp.sin(t / nT * 2 * pi)], 1)
    gr = jnp.concatenate([jnp.ones((N, 1, nT), dtype),
                          jnp.ones((N, 1, nT), dtype),
                          10 * jnp.arctan(t - round(nT / 2)) / pi], 1)

    p = mobjs.Pulse(rf=rf, gr=gr, dt=dt0, dtype=dtype)
    p = deepcopy(p)
    p = mobjs.Pulse(**p.asdict(toNumpy=False))

    shape = (N, *Nd)
    mask = np.zeros((1,) + Nd, dtype=bool)
    mask[0, :, 1, :], mask[0, 1, :, :] = True, True
    fov = jnp.asarray([[3., 3., 3.]], dtype)
    ofst = jnp.asarray([[0., 0., 1.]], dtype)

    cube = mobjs.SpinCube(shape, fov, mask=mask, T1_=jnp.asarray(T1_, dtype),
                          gam=gam, dtype=dtype)
    cube = deepcopy(cube)
    d = cube.asdict(toNumpy=False)
    cube = mobjs.SpinCube(**{k: d[k] for k in
                             ('shape', 'fov', 'mask', 'T1', 'γ', 'dtype')})
    cube.ofst = ofst

    cube.M_ = jnp.asarray([0., 1., 0.], dtype)
    cube.T2 = jnp.broadcast_to(jnp.asarray(T2, dtype), cube.shape)

    M001 = jnp.asarray([0., 0., 1.], dtype)
    M100 = jnp.asarray([1., 0., 0.], dtype)
    # functional indexed writes via crds_ (the JAX idiom for the
    # reference's cube.M_[crds] = v, reference test_mobjs.py:53-57)
    crds_100 = cube.crds_([_slice, [0, 1], [1, 0], _slice, _slice])
    cube.M_ = cube.M_.at[tuple(crds_100)].set(M100)
    crds_001 = cube.crds_([_slice, [2, 1], [1, 2], _slice, _slice])
    cube.M_ = cube.M_.at[tuple(crds_001)].set(M001)

    return cube, p


class TestMobjs:
    gam = jnp.asarray(gamH, DTYPE)

    def test_examples(self):
        assert isinstance(mobjs.Examples.pulse(), mobjs.Pulse)
        assert isinstance(mobjs.Examples.spinarray(), mobjs.SpinArray)
        assert isinstance(mobjs.Examples.spincube(), mobjs.SpinCube)
        assert isinstance(mobjs.Examples.spincube(), mobjs.SpinArray)

    def test_mobjs_basic(self):
        cube, p = _setup([[1.]], [[4e-2]], self.gam)
        assert p.shape == (1, 1, 512)
        assert cube.dim() == len(cube.shape) == 4
        assert cube.nM == 15  # 3x3x3 cross mask
        assert cube.numel() == 27
        assert p.is_cuda is False and cube.is_cuda is False

    def test_asdict_roundtrip_numpy(self):
        cube, p = _setup([[1.]], [[4e-2]], self.gam)
        d = p.asdict(toNumpy=True)
        assert isinstance(d['rf'], np.ndarray)
        p2 = mobjs.Pulse(**d)
        np.testing.assert_allclose(p2.rf, p.rf, atol=0)
        dc = cube.asdict(toNumpy=True, doEmbed=False)
        assert set(dc) >= {'loc_', 'Δf_', 'fov', 'ofst', 'T1_', 'T2_',
                           'γ_', 'M_', 'mask', 'shape'}

    def test_applypulse_golden(self):
        cube, p = _setup([[1.]], [[4e-2]], self.gam)
        # gradient x/y == 1 Gauss/cm cancels Δf of the two cross arms
        cube.df = jnp.sum(-cube.loc[0:1, :, :, :, 0:2], axis=-1) * cube.gam

        Mres1a = cube.applypulse(p, doEmbed=True)
        cube.applypulse(p, doEmbed=True, doRelax=False, doUpdate=True)
        Mres1b = cube.M

        np.testing.assert_allclose(
            np.asarray(Mres1a)[0:1, 1, :, 1, :], MO_GOLD_RELAX, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(Mres1a)[0:1, :, 1, 1, :], MO_GOLD_RELAX, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(Mres1b)[0:1, 1, :, 1, :], MO_GOLD_NORELAX, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(Mres1b)[0:1, :, 1, 1, :], MO_GOLD_NORELAX, atol=ATOL)

    def test_freeprec_golden(self):
        E = jnp.asarray([[0.5]], DTYPE)
        dur = jnp.asarray(0.5, DTYPE)
        T1 = T2 = -dur / jnp.log(E)

        cube, _ = _setup(T1, T2, self.gam)
        _df = jnp.asarray([[[1 / 4 / dur], [-1 / 4 / dur], [1]]], DTYPE)
        cube.df = jnp.tile(_df, (1, 3, 1, 3))

        Mres1a = cube.freeprec(dur, doEmbed=True)
        np.testing.assert_allclose(
            np.asarray(Mres1a)[0:1, 1, :, 1, :], FREEPREC_GOLD, atol=ATOL)

    def test_pulse_interpT(self):
        dt_n = jnp.asarray(dt0 * 5, DTYPE)
        nT = 11
        kw = {'num': nT, 'axis': 2}
        rf = 0.1 * np.concatenate([np.linspace([[0.]], 1., **kw),
                                   np.linspace([[1.]], 0., **kw)], 1)
        gr = 0.1 * np.concatenate([np.linspace([[0.]], 1., **kw),
                                   np.linspace([[1.]], 0., **kw),
                                   np.ones((1, 1, nT))], 1)

        p_old = mobjs.Pulse(rf=jnp.asarray(rf, DTYPE),
                            gr=jnp.asarray(gr, DTYPE), dt=dt0, dtype=DTYPE)
        p_new = p_old.interpT(dt=dt_n, kind='linear')

        np.testing.assert_allclose(
            p_new.rf, np.array([[[0.04, 0.09], [0.06, 0.01]]]), atol=ATOL)
        np.testing.assert_allclose(
            p_new.gr, np.array([[[0.04, 0.09], [0.06, 0.01],
                                 [0.1, 0.1]]]), atol=ATOL)
        # same dt → deepcopy
        p_same = p_old.interpT(dt=jnp.asarray(dt0, DTYPE))
        np.testing.assert_allclose(p_same.rf, p_old.rf, atol=0)

    def test_pulse_interpT_cubic_on_device(self):
        r"""Non-linear ``interpT`` kinds run on-device (round 4:
        :mod:`mrphy_tpu.utils.interp` matrix path) and match the
        host-SciPy result the reference would produce — and, unlike
        the host round-trip, stay differentiable w.r.t. the
        waveform."""
        from scipy import interpolate
        rng = np.random.default_rng(3)
        nT = 40
        rf = jnp.asarray(rng.standard_normal((1, 2, nT)), DTYPE)
        gr = jnp.asarray(rng.standard_normal((1, 3, nT)), DTYPE)
        p_old = mobjs.Pulse(rf=rf, gr=gr, dt=dt0, dtype=DTYPE)
        dt_n = jnp.asarray(dt0 * 2.5, DTYPE)
        for kind in ('cubic', 'nearest', 'previous'):
            p_new = p_old.interpT(dt=dt_n, kind=kind)
            # reproduce the reference-style host path (zero-prepended)
            rf0 = np.concatenate([np.zeros((1, 2, 1)),
                                  np.asarray(rf, np.float64)], 2)
            t_o = np.arange(nT + 1) * float(np.asarray(p_old.dt))
            t_n = np.arange(1, int(np.floor(
                t_o[-1] / float(dt_n) + 1e-9)) + 1) * float(dt_n)
            want = interpolate.interp1d(t_o, rf0, axis=2,
                                        kind=kind)(t_n)
            np.testing.assert_allclose(np.asarray(p_new.rf), want,
                                       atol=2e-6, err_msg=kind)

        def loss(rfv):
            pn = mobjs.Pulse(rf=rfv, gr=gr, dt=dt0,
                             dtype=DTYPE).interpT(dt=dt_n, kind='cubic')
            return jnp.sum(pn.rf ** 2)

        g = jax.grad(loss)(rf)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0

    def test_readonly_and_validation(self):
        cube, p = _setup([[1.]], [[4e-2]], self.gam)
        with pytest.raises(AttributeError):
            p.shape = (2, 1, 3)
        with pytest.raises(AttributeError):
            cube.loc_ = jnp.zeros((1, 15, 3))
        with pytest.raises(AttributeError):
            cube.spinarray = None

    def test_embed_extract_roundtrip(self):
        arr = mobjs.Examples.spinarray(dtype=DTYPE)
        rng = np.random.default_rng(0)
        v_ = jnp.asarray(rng.random((1, arr.nM, 3)), DTYPE)
        v = arr.embed(v_)
        assert v.shape == arr.shape + (3,)
        np.testing.assert_allclose(arr.extract(v), v_, atol=0)
        assert bool(jnp.all(jnp.isnan(v[:, 0, 0, 0, :])))  # outside mask

    def test_mask_(self):
        arr = mobjs.Examples.spinarray(dtype=DTYPE)
        m = np.zeros_like(arr.mask)
        m[0, 1, 1, 1] = True
        m_ = arr.mask_(mask=m)
        assert m_.shape == (1, arr.nM)
        assert m_.sum() == 1

    def test_unicode_attr_aliases(self):
        cube = mobjs.Examples.spincube(dtype=DTYPE)
        np.testing.assert_allclose(getattr(cube, 'γ_'), cube.gam_, atol=0)
        np.testing.assert_allclose(getattr(cube, 'Δf_'), cube.df_, atol=0)
        setattr(cube, 'Δf_', 5.0)
        np.testing.assert_allclose(cube.df_, 5.0 * jnp.ones_like(cube.df_))

    def test_pytree_jit(self):
        r"""Objects pass through jit as pytrees (no reference analog)."""
        cube = mobjs.Examples.spincube(dtype=DTYPE)
        p = mobjs.Examples.pulse(dtype=DTYPE)

        @jax.jit
        def f(cube, p):
            return cube.applypulse(p, doEmbed=False)

        M_ = f(cube, p)
        M_ref = cube.applypulse(p, doEmbed=False)
        np.testing.assert_allclose(M_, M_ref, atol=1e-12)

        leaves, treedef = jax.tree_util.tree_flatten(cube)
        cube2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(cube2.M_, cube.M_, atol=0)

    def test_spincube_update_loc_on_fov_set(self):
        cube = mobjs.Examples.spincube(dtype=DTYPE)
        loc0 = np.asarray(cube.loc_)
        cube.fov = 2.0 * cube.fov
        np.testing.assert_allclose(
            np.asarray(cube.loc_) - np.asarray(cube.ofst)[:, None, :],
            2 * (loc0 - np.asarray(cube.ofst)[:, None, :]), atol=1e-12)

    def test_pulse_to_dtype(self):
        p = mobjs.Examples.pulse(dtype=jnp.float32)
        p64 = p.to(dtype=jnp.float64)
        assert p64.rf.dtype == jnp.float64
        assert p.to().rf.dtype == jnp.float32


class TestSmallCoverage:

    def test_pulse_limit_setters(self):
        p = mobjs.Examples.pulse()
        p.gmax = 4.0
        assert p.gmax.shape == (1, 3)
        p.smax = jnp.asarray([1e4, 2e4, 3e4])
        assert p.smax.shape == (1, 3)
        p.rfmax = jnp.asarray([[0.25]])
        assert p.rfmax.shape == (1,)
        p.dt = 8e-6
        assert p.dt.shape == (1,)
        with pytest.raises(AssertionError):
            p.rf = jnp.zeros((2, 2, 512))  # wrong batch

    def test_spinarray_to_dtype(self):
        arr = mobjs.Examples.spinarray(dtype=jnp.float32)
        arr64 = arr.to(dtype=jnp.float64)
        assert arr64.M_.dtype == jnp.float64
        assert arr.to() is arr

    def test_examples_spinbolus(self):
        bol = mobjs.Examples.spinbolus()
        assert isinstance(bol, mobjs.SpinBolus)
        assert bol.vel_.shape == (1, bol.nM, 3)

    def test_tpu_is_available_runs(self):
        import mrphy_tpu
        assert mrphy_tpu.tpu_is_available() in (True, False)

    def test_interpT_same_dt_f32_roundtrip(self):
        r"""Resampling to the pulse's own dt must be a deepcopy even when
        the stored dt is f32 and the argument f64 (review finding)."""
        p = mobjs.Examples.pulse()  # f32, dt=4e-6
        p2 = p.interpT(jnp.asarray(4e-6, jnp.float64))
        assert p2.rf.shape == p.rf.shape
        np.testing.assert_allclose(p2.rf, p.rf, atol=0)

    def test_spinbolus_to_preserves_class_and_vel(self):
        bol = mobjs.Examples.spinbolus()
        bol64 = bol.to(dtype=jnp.float64)
        assert isinstance(bol64, mobjs.SpinBolus)
        assert bol64.vel_.dtype == jnp.float64
        np.testing.assert_allclose(bol64.vel_, bol.vel_, atol=0)


class TestApplypulseFused:

    @pytest.mark.parametrize('dtype,vtol,gtol', [
        (jnp.float64, 1e-11, 1e-10),
        # f32 (the production default): the two paths order the γ2πdt
        # scaling differently (the fused engine pre-scales the per-spin
        # fields), so agreement is to f32 rounding, not bit-identical
        (jnp.float32, 2e-5, 1e-4),
    ], ids=['f64', 'f32'])
    def test_fused_matches_composed(self, dtype, vtol, gtol):
        r"""doFuse=True (B-effective assembled inside the scan) must equal
        the composed pulse2beff -> blochsim path, values and gradients."""
        import jax
        cube = mobjs.Examples.spincube(dtype=dtype)
        p = mobjs.Examples.pulse(dtype=dtype)
        for doRelax in (True, False):
            a = cube.applypulse(p, doRelax=doRelax, doFuse=True)
            b = cube.applypulse(p, doRelax=doRelax, doFuse=False)
            assert jnp.max(jnp.abs(a - b)) < vtol, float(jnp.max(
                jnp.abs(a - b)))

        def loss(rf, fuse):
            p2 = mobjs.Pulse(rf, p.gr, dt=p.dt, dtype=p.dtype)
            return jnp.sum(cube.applypulse(p2, doFuse=fuse) ** 2)
        ga = jax.grad(lambda rf: loss(rf, True))(p.rf)
        gb = jax.grad(lambda rf: loss(rf, False))(p.rf)
        assert jnp.max(jnp.abs(ga - gb)) < gtol, float(jnp.max(
            jnp.abs(ga - gb)))


class TestAcquire:
    r"""SpinArray/SpinCube.acquire: the object-model entry to the
    acquisition operator — equals ops.signal on the extracted state,
    and chains with applypulse."""

    def test_spinarray_acquire_matches_ops_signal(self):
        from mrphy_tpu.ops import signal as sig
        from mrphy_tpu.utils import g2k

        rng = np.random.default_rng(0)
        N, nM, nT, nC = 1, 12, 20, 2
        arr = mobjs.SpinArray((N, 3, 4), M_=jnp.asarray(
            rng.standard_normal((N, nM, 3)), jnp.float32))
        loc_ = jnp.asarray(rng.uniform(-2, 2, (N, nM, 3)), jnp.float32)
        gr = jnp.asarray(rng.uniform(-2, 2, (N, 3, nT)), jnp.float32)
        sens_ = jnp.asarray(rng.standard_normal((N, nM, 2, nC)),
                            jnp.float32)
        T2s_ = jnp.asarray(rng.uniform(1e-3, 1e-2, (N, nM)), jnp.float32)
        df_ = jnp.asarray(rng.uniform(-50, 50, (N, nM)), jnp.float32)

        s = arr.acquire(gr, loc_=loc_, sens_=sens_, T2s_=T2s_, df_=df_)
        k = g2k(gr, False, float(dt0), gam=jnp.asarray(gamH,
                                                       jnp.float32))
        s_ref = sig.signal(arr.M_, loc_, k, sens=sens_, df=df_,
                           T2s=T2s_, dt=float(dt0))
        np.testing.assert_allclose(s, s_ref, atol=1e-6)
        assert s.shape == (N, nC, nT, 2)

    def test_spincube_excite_then_acquire(self):
        cube, p = mobjs.Examples.spincube(), mobjs.Examples.pulse()
        cube.df = 10.0 * jnp.ones(cube.shape)     # cube injects its df_
        cube.applypulse(p, doUpdate=True)
        gr_ro = jnp.zeros((1, 3, 16)).at[0, 0].set(0.2)
        s = cube.acquire(gr_ro)
        assert s.shape == (1, 1, 16, 2)
        assert np.isfinite(np.asarray(s)).all()
        # off-resonance must matter: zero df gives a different signal
        cube.df_ = jnp.zeros((1, cube.nM))
        s0 = cube.acquire(gr_ro)
        assert float(jnp.max(jnp.abs(s - s0))) > 1e-6

    def test_acquire_unicode_alias_and_unknown_kwarg(self):
        arr = mobjs.SpinArray((1, 2, 2))
        gr = jnp.zeros((1, 3, 4))
        loc_ = jnp.zeros((1, 4, 3))
        s1 = arr.acquire(gr, loc_=loc_, **{'Δf_': jnp.zeros((1, 4))})
        s2 = arr.acquire(gr, loc_=loc_, df_=jnp.zeros((1, 4)))
        np.testing.assert_allclose(s1, s2, atol=0)
        with pytest.raises(AssertionError):
            arr.acquire(gr, loc_=loc_, bogus=1)
