r"""AOT export artifacts (`utils/export.py`): round-trip exactness,
gradient export, shape polymorphism, file persistence, cross-platform
lowering, and the flagship ``export_applypulse`` serving artifact.

Round-trips must be BIT-exact: serialization preserves the StableHLO,
so the loaded artifact runs the same program as the direct call.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu import gamH, dt0
from mrphy_tpu.models.mobjs import Examples
from mrphy_tpu.ops import sims, slowsims
from mrphy_tpu.utils import (export_compiled, load_compiled,
                             symbolic_dim, export_applypulse)

DT = jnp.float32


def _build(nM, nT, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        Mi=jnp.asarray(rng.random((1, nM, 3)) - 0.5, DT),
        loc=jnp.asarray(rng.random((1, nM, 3)) - 0.5, DT),
        rf=jnp.asarray(rng.random((1, 2, nT)) * 0.1, DT),
        gr=jnp.asarray(rng.random((1, 3, nT)), DT),
        T1=jnp.asarray([[1.47]], DT), T2=jnp.asarray([[0.07]], DT))


def _fwd(Mi, rf, gr, loc, T1, T2):
    return sims.blochsim_rfgr(Mi, rf, gr, loc, T1=T1, T2=T2,
                              gam=gamH, dt=dt0)


class TestRoundTrip:
    r"""All bit-exact assertions compare JIT to JIT: the artifact embeds
    the jitted program, and eager execution fuses (hence rounds)
    differently — under f32 the eager result can differ in ulps (seen on
    the verify pass; invisible here only because conftest enables x64)."""

    def test_forward_bit_exact(self):
        a = _build(40, 16)
        args = (a['Mi'], a['rf'], a['gr'], a['loc'], a['T1'], a['T2'])
        blob = export_compiled(_fwd, args)
        loaded = load_compiled(blob)
        np.testing.assert_array_equal(np.asarray(jax.jit(_fwd)(*args)),
                                      np.asarray(loaded(*args)))

    def test_gradient_artifact_bit_exact(self):
        a = _build(40, 16)

        # jit on BOTH sides: the artifact embeds the jitted program, and
        # only jit-vs-jit is bit-comparable (eager executes op-by-op
        # with different fusion rounding).
        loss_grad = jax.jit(jax.grad(lambda r: jnp.sum(_fwd(
            a['Mi'], r, a['gr'], a['loc'], a['T1'], a['T2'])**2)))

        blob = export_compiled(loss_grad, (a['rf'],))
        loaded = load_compiled(blob)
        np.testing.assert_array_equal(np.asarray(loss_grad(a['rf'])),
                                      np.asarray(loaded(a['rf'])))

    def test_loaded_composes_under_jit(self):
        a = _build(24, 8)
        args = (a['Mi'], a['rf'], a['gr'], a['loc'], a['T1'], a['T2'])
        loaded = load_compiled(export_compiled(_fwd, args))
        outer = jax.jit(lambda *xs: jnp.sum(loaded(*xs)**2))
        ref = jax.jit(lambda *xs: jnp.sum(_fwd(*xs)**2))
        np.testing.assert_allclose(float(outer(*args)), float(ref(*args)),
                                   rtol=1e-6)

    def test_file_round_trip(self, tmp_path):
        a = _build(24, 8)
        args = (a['Mi'], a['rf'], a['gr'], a['loc'], a['T1'], a['T2'])
        path = str(tmp_path / 'fwd.mrxp')
        export_compiled(_fwd, args, path=path)
        loaded = load_compiled(path)
        np.testing.assert_array_equal(np.asarray(jax.jit(_fwd)(*args)),
                                      np.asarray(loaded(*args)))

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / 'junk.bin'
        p.write_bytes(b'not an artifact')
        with pytest.raises(AssertionError, match='magic'):
            load_compiled(str(p))


class TestSymbolicShapes:
    r"""One artifact serves ANY spin count for the scan oracle (its
    layout is shape-oblivious; the fused engine's tile/chunk choices
    are shape-dependent, so it serves fixed buckets — see module
    docstring)."""

    def test_oracle_symbolic_nM(self):
        nT = 12
        m, = symbolic_dim('m')

        def fwd(Mi, beff, T1, T2):
            return slowsims.blochsim(Mi, beff, T1=T1, T2=T2,
                                     gam=gamH, dt=dt0)

        specs = (jax.ShapeDtypeStruct((1, m, 3), DT),
                 jax.ShapeDtypeStruct((1, m, nT, 3), DT),
                 jax.ShapeDtypeStruct((1, 1), DT),
                 jax.ShapeDtypeStruct((1, 1), DT))
        loaded = load_compiled(export_compiled(fwd, specs))
        jfwd = jax.jit(fwd)

        rng = np.random.default_rng(3)
        for nM in (17, 64, 129):
            Mi = jnp.asarray(rng.random((1, nM, 3)) - 0.5, DT)
            beff = jnp.asarray(rng.random((1, nM, nT, 3)), DT)
            T1 = jnp.asarray([[1.47]], DT)
            T2 = jnp.asarray([[0.07]], DT)
            np.testing.assert_array_equal(
                np.asarray(jfwd(Mi, beff, T1, T2)),
                np.asarray(loaded(Mi, beff, T1, T2)))

    def test_constraint_scope(self):
        m, = symbolic_dim('m', constraints=('m >= 1', 'm <= 4096'))
        assert str(m) == 'm'


class TestCrossPlatform:

    def test_tpu_artifact_builds_on_cpu_host(self):
        r"""Lowering targets TPU from this CPU host: the artifact
        serializes and records its platform; execution belongs to a
        TPU worker (not asserted here)."""
        a = _build(24, 8)
        args = (a['Mi'], a['rf'], a['gr'], a['loc'], a['T1'], a['T2'])
        blob = export_compiled(_fwd, args, platforms=('tpu',))
        loaded = load_compiled(blob)
        assert loaded.platforms == ('tpu',)
        assert len(blob) > 1000


class TestApplypulseArtifact:

    def test_matches_object_call(self):
        from mrphy_tpu.models.mobjs import Pulse
        cube = Examples.spincube()
        p = Examples.pulse()
        blob = export_applypulse(cube, p, doEmbed=True)
        loaded = load_compiled(blob)

        # jit-to-jit: the same (rf, gr) → Mo closure the artifact embeds
        ref = jax.jit(lambda rf, gr: cube.applypulse(
            Pulse(rf, gr, dt=p.dt, gmax=p.gmax, smax=p.smax,
                  rfmax=p.rfmax), doEmbed=True))
        np.testing.assert_array_equal(np.asarray(ref(p.rf, p.gr)),
                                      np.asarray(loaded(p.rf, p.gr)))
        # and the eager object call agrees to f32 roundoff
        np.testing.assert_allclose(
            np.asarray(cube.applypulse(p, doEmbed=True)),
            np.asarray(loaded(p.rf, p.gr)), atol=1e-5)
