r"""Dixon/IDEAL tests:

- exact recovery on model-generated echoes (single- and multi-peak
  fat, nonzero field map, batched voxels);
- CROSS-VALIDATION against the Bloch free-precession engine: echoes
  synthesized by :func:`mrphy_tpu.ops.slowsims.freeprec` on two
  physical pools (water at ψ, fat peaks at ψ+f_p) must be separated
  exactly — this pins the e^{−i2πψTE} sign against the package's
  off-resonance convention, not just self-consistency;
- noise robustness and the residual quality map.
"""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu.ops.dixon import dixon_cl, dixon_ideal
from mrphy_tpu.ops import slowsims

F64 = jnp.float64


def _synth(W, F, psi, TE, fat_df, fat_amp):
    r"""Model echoes for scalar complex W, F and field psi."""
    c = np.asarray(dixon_cl(jnp.asarray(TE, F64), fat_df, fat_amp))
    cc = c[:, 0] + 1j * c[:, 1]
    e = np.exp(-2j * np.pi * np.asarray(psi) * np.asarray(TE))
    s = (W + F * cc) * e
    return np.stack([s.real, s.imag], -1)


def test_exact_recovery_batched_multipeak():
    rng = np.random.default_rng(3)
    nv = 64
    TE = 1.2e-3 + 1.6e-3 * np.arange(6)               # 6 echoes
    fat_df = (-434.0, -332.0, -486.0)
    fat_amp = (0.7, 0.2, 0.1)
    Wt = rng.standard_normal(nv) + 1j * rng.standard_normal(nv)
    Ft = 0.6 * (rng.standard_normal(nv) + 1j * rng.standard_normal(nv))
    psit = rng.uniform(-60, 60, nv)
    s = np.stack([_synth(Wt[v], Ft[v], psit[v], TE, fat_df, fat_amp)
                  for v in range(nv)])
    out = dixon_ideal(jnp.asarray(s, F64), jnp.asarray(TE, F64),
                      fat_df=fat_df, fat_amp=fat_amp)
    W = np.asarray(out['W'][..., 0] + 1j * out['W'][..., 1])
    F = np.asarray(out['F'][..., 0] + 1j * out['F'][..., 1])
    assert np.abs(W - Wt).max() < 1e-8, np.abs(W - Wt).max()
    assert np.abs(F - Ft).max() < 1e-8, np.abs(F - Ft).max()
    assert np.abs(np.asarray(out['psi']) - psit).max() < 1e-7
    assert float(np.asarray(out['res']).max()) < 1e-9


def test_cross_validated_against_freeprec():
    r"""Physical synthesis: water pool precessing at df=ψ and fat
    pools at df=ψ+f_p (each with its spectral weight), sampled at the
    echo times with the Bloch free-precession engine (no relaxation).
    IDEAL must recover the pool amplitudes and ψ exactly."""
    TE = np.asarray([1.0e-3, 2.2e-3, 3.4e-3, 4.6e-3, 5.8e-3])
    fat_df = (-434.0, -332.0)
    fat_amp = (0.75, 0.25)
    psi = 37.0
    Wc = 1.0 + 0.4j
    Fc = 0.5 - 0.3j

    # pools: water + one per fat peak; Mxy complex = (Mx, My)
    amps = [Wc] + [Fc * a for a in np.asarray(fat_amp)
                   / np.sum(fat_amp)]
    dfs = [psi] + [psi + f for f in fat_df]
    s = np.zeros((len(TE), 2))
    for amp, df in zip(amps, dfs):
        M0 = jnp.asarray([[[amp.real, amp.imag, 0.0]]], F64)
        for el, te in enumerate(TE):
            M1 = slowsims.freeprec(M0, jnp.asarray(te, F64),
                                   df=jnp.asarray([[df]], F64))
            s[el, 0] += float(M1[0, 0, 0])
            s[el, 1] += float(M1[0, 0, 1])

    out = dixon_ideal(jnp.asarray(s, F64), jnp.asarray(TE, F64),
                      fat_df=fat_df, fat_amp=fat_amp, psi0=20.0)
    W = complex(out['W'][0], out['W'][1])
    F = complex(out['F'][0], out['F'][1])
    assert abs(W - Wc) < 1e-8, (W, Wc)
    assert abs(F - Fc) < 1e-8, (F, Fc)
    assert abs(float(out['psi']) - psi) < 1e-7


def test_noise_and_quality_map():
    rng = np.random.default_rng(7)
    nv = 128
    TE = 1.2e-3 + 1.8e-3 * np.arange(5)
    Wt = 1.0 + 0.2j
    Ft = 0.4 - 0.1j
    psit = -25.0
    s0 = _synth(Wt, Ft, psit, TE, (-434.0,), (1.0,))
    s = np.broadcast_to(s0, (nv,) + s0.shape).copy()
    s += 0.01 * rng.standard_normal(s.shape)
    out = dixon_ideal(jnp.asarray(s, F64), jnp.asarray(TE, F64),
                      fat_df=(-434.0,), fat_amp=(1.0,))
    W = np.asarray(out['W'][..., 0] + 1j * out['W'][..., 1])
    F = np.asarray(out['F'][..., 0] + 1j * out['F'][..., 1])
    assert np.abs(W - Wt).mean() < 0.03
    assert np.abs(F - Ft).mean() < 0.03
    assert np.abs(np.asarray(out['psi']) - psit).mean() < 2.0
    # residual tracks the injected noise level
    assert 0.003 < float(np.asarray(out['res']).mean()) < 0.03
