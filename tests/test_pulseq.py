r"""Pulseq export/import round trips (mrphy_tpu/utils/pulseq.py)."""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import dt0, gamH
from mrphy_tpu.models.mobjs import Examples, Pulse
from mrphy_tpu.utils.pulseq import pulse_to_seq, seq_to_pulse


class TestPulseq:

    def _roundtrip(self, p, **kw):
        return seq_to_pulse(pulse_to_seq(p, **kw), dtype=jnp.float64)

    def test_roundtrip_example_pulse(self):
        p = Examples.pulse()
        q = self._roundtrip(p)
        np.testing.assert_allclose(np.asarray(q.rf),
                                   np.asarray(p.rf, np.float64),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(q.gr),
                                   np.asarray(p.gr, np.float64),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(q.dt).reshape(-1)[0],
            np.asarray(p.dt, np.float64).reshape(-1)[0], rtol=1e-9)

    def test_roundtrip_random_signed(self):
        rng = np.random.default_rng(0)
        rf = rng.normal(size=(1, 2, 33)) * 0.1
        gr = rng.normal(size=(1, 3, 33)) * 2.0
        rf[0, :, 5] = 0.0              # zero sample: phase must not NaN
        gr[0, 1] = 0.0                 # an all-zero gradient axis
        p = Pulse(rf=jnp.asarray(rf), gr=jnp.asarray(gr), dt=dt0,
                  dtype=jnp.float64)
        q = self._roundtrip(p)
        np.testing.assert_allclose(np.asarray(q.rf), rf, atol=1e-9)
        np.testing.assert_allclose(np.asarray(q.gr), gr, atol=1e-9)

    def test_units_are_gamma_scaled(self):
        r"""Peak RF must serialize as gam*|B1| Hz and gradients as
        gam*100*g Hz/m (the Pulseq unit contract)."""
        rf = np.zeros((1, 2, 4))
        rf[0, 0] = [0.0, 0.05, 0.1, 0.0]       # peak 0.1 Gauss
        gr = np.zeros((1, 3, 4))
        gr[0, 2] = [1.0, 2.0, -4.0, 0.0]       # peak |g| 4 Gauss/cm
        p = Pulse(rf=jnp.asarray(rf), gr=jnp.asarray(gr), dt=4e-6)
        text = pulse_to_seq(p)
        rf_line = text.split('[RF]')[1].splitlines()[1]
        assert abs(float(rf_line.split()[1]) - 0.1 * gamH) < 1e-6
        gz_line = text.split('[GRADIENTS]')[1].splitlines()[3]
        assert abs(float(gz_line.split()[1]) - 4 * gamH * 100) < 1e-3

    def test_compressed_shape_reader(self):
        r"""External tools write derivative+run-length shapes; the
        reader must decompress them (constant shape == extreme case)."""
        from mrphy_tpu.utils.pulseq import _decompress
        # shape [1,1,1,1,1]: derivative [1,0,0,0,0] -> rle [1,0,0,2]
        out = _decompress([1.0, 0.0, 0.0, 2.0], 5)
        np.testing.assert_allclose(out, np.ones(5))
        # uncompressed passthrough
        out = _decompress([0.1, 0.2, 0.3], 3)
        np.testing.assert_allclose(out, [0.1, 0.2, 0.3])

    def test_multicoil_refused(self):
        rng = np.random.default_rng(1)
        p = Pulse(rf=jnp.asarray(rng.normal(size=(1, 2, 8, 2))),
                  gr=jnp.asarray(rng.normal(size=(1, 3, 8))), dt=dt0)
        try:
            pulse_to_seq(p)
            raise RuntimeError('expected refusal')
        except AssertionError as e:
            assert 'single transmit channel' in str(e)

    def test_designed_pulse_exports(self, tmp_path):
        r"""End to end: design -> export -> reimport -> same profile."""
        from mrphy_tpu.design import design_pulse, DesignConfig
        cube = Examples.spincube()
        p = Examples.pulse()
        Mtgt_ = jnp.tile(jnp.asarray([0., 0., -1.], jnp.float32),
                         (1, cube.nM, 1))
        cfg = DesignConfig(niter=5, lr=0.01, rfmax=12.0, smax=5e6,
                           dt=float(dt0))
        p2, _ = design_pulse(cube, p, Mtgt_, cfg=cfg)
        f = str(tmp_path / 'designed.seq')
        pulse_to_seq(p2, f)
        q = seq_to_pulse(f)
        M1 = np.asarray(cube.applypulse(p2))
        M2 = np.asarray(cube.applypulse(q))
        np.testing.assert_allclose(M2, M1, atol=1e-4)
