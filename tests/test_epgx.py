r"""EPG-X (two-pool exchange EPG) tests.

Oracle tiers:
- the complex 2x2 expm (`_expm2c`) vs ``scipy.linalg.expm`` on random
  exchange systems (independent machinery, 1e-12);
- the DECOUPLED limit (kab=kba=0, M0b=0) reproduces single-pool
  :func:`epg_cpmg`/:func:`epg_spgr` exactly;
- the IDENTICAL-POOLS invariance: exchange between indistinguishable
  pools is invisible — total signal equals one pool of the summed M0
  for ANY exchange rate;
- a full two-pool CPMG vs an independent isochromat ensemble stepped
  with scipy-expm propagators and numpy rotations (the EPG states are
  the Fourier coefficients of a uniformly dephased ensemble — exact
  for nIso > 2K);
- physics: exchange with a short-T2 partner accelerates the apparent
  echo decay; everything differentiable w.r.t. exchange rates.
"""

import numpy as np
import pytest
import scipy.linalg
import jax
import jax.numpy as jnp

from mrphy_tpu import pi
from mrphy_tpu.ops import epg

F64 = jnp.float64


def test_expm2c_vs_scipy():
    rng = np.random.default_rng(3)
    for _ in range(20):
        r2a, r2b = rng.uniform(1, 80, 2)
        ka, kb = rng.uniform(0, 40, 2)
        w = rng.uniform(-300, 300) * 2 * np.pi
        tau = rng.uniform(1e-3, 0.05)
        A = np.array([[-r2a - ka, kb],
                      [ka, -r2b - kb - 1j * w]]) * tau
        E = scipy.linalg.expm(A)
        (E00, E01, E10, E11) = epg._expm2c(
            jnp.asarray(A[0, 0].real, F64), jnp.asarray(0.0, F64),
            jnp.asarray(A[0, 1].real, F64), jnp.asarray(A[1, 0].real,
                                                        F64),
            jnp.asarray(A[1, 1].real, F64), jnp.asarray(A[1, 1].imag,
                                                        F64))
        got = np.array([[E00[0] + 1j * E00[1], E01[0] + 1j * E01[1]],
                        [E10[0] + 1j * E10[1], E11[0] + 1j * E11[1]]])
        assert np.abs(got - E).max() < 1e-12, (got, E)


def test_decoupled_limit_matches_single_pool():
    flips = jnp.asarray(np.deg2rad([160, 150, 140, 130, 120]), F64)
    kw = dict(T1a=1.0, T2a=0.08, T1b=0.5, T2b=0.01, kab=0.0, kba=0.0,
              esp=0.01, M0a=1.0, M0b=0.0)
    ex = epg.epgx_cpmg(flips, **kw)
    ref = epg.epg_cpmg(flips, T1=1.0, T2=0.08, esp=0.01, M0=1.0)
    assert float(jnp.abs(ex - ref).max()) < 1e-13

    phis = epg.rf_spoil_phases(8)
    fl = jnp.full(8, np.deg2rad(15.0), F64)
    exs = epg.epgx_spgr(fl, phis, T1a=1.0, T2a=0.08, T1b=0.5,
                        T2b=0.01, kab=0.0, kba=0.0, tr=0.01, M0a=1.0,
                        M0b=0.0)
    refs = epg.epg_spgr(fl, phis, T1=1.0, T2=0.08, tr=0.01, M0=1.0)
    assert float(jnp.abs(exs - refs).max()) < 1e-13


def test_identical_pools_invariance():
    r"""Exchange between identical pools is unobservable: total echoes
    equal a single pool carrying M0a+M0b, for any kab."""
    flips = jnp.asarray(np.deg2rad([170, 160, 150, 140]), F64)
    for kab in (0.0, 3.0, 50.0):
        kba = kab * 0.7 / 0.3                 # detailed balance
        ex = epg.epgx_cpmg(flips, T1a=0.9, T2a=0.07, T1b=0.9,
                           T2b=0.07, kab=kab, kba=kba, esp=0.012,
                           M0a=0.7, M0b=0.3)
        ref = epg.epg_cpmg(flips, T1=0.9, T2=0.07, esp=0.012, M0=1.0)
        assert float(jnp.abs(ex - ref).max()) < 1e-12, kab


def _iso_cpmg(flips, *, T1a, T2a, T1b, T2b, kab, kba, esp, M0a, M0b,
              dfb, nIso=64):
    r"""Independent two-pool CPMG oracle: uniformly dephased isochromat
    ensemble. RF via 3-vector rotation matrices (the SAME convention
    that validates the single-pool EPG in ``tests/test_epg.py``);
    relaxation-exchange(-shift) via scipy-expm 2x2 propagators on the
    complex transverse pair and the real longitudinal pair."""
    th = 2 * np.pi * np.arange(nIso) / nIso   # per-half-esp dephasing
    AT = np.array([[-1 / T2a - kab, kba],
                   [kab, -1 / T2b - kba - 2j * np.pi * dfb]])
    AL = np.array([[-1 / T1a - kab, kba], [kab, -1 / T1b - kba]])
    ET = scipy.linalg.expm(AT * esp / 2)
    EL = scipy.linalg.expm(AL * esp / 2)
    # exact affine recovery A^-1 (E - I) b (NOT (I-E)[M0a, M0b],
    # which is right only under detailed balance)
    b = np.array([M0a / T1a, M0b / T1b])
    rec = np.linalg.solve(AL, (EL - np.eye(2)) @ b)

    def rot_axis(phi, a):  # rotation by a about in-plane axis at phi
        Rz = np.array([[np.cos(phi), -np.sin(phi), 0],
                       [np.sin(phi), np.cos(phi), 0], [0, 0, 1.]])
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        return Rz @ Rx @ Rz.T

    # (nIso, pools, 3) cartesian state
    M = np.zeros((nIso, 2, 3))
    M[:, 0, 2], M[:, 1, 2] = M0a, M0b

    def apply_rf(alpha, phi):
        nonlocal M
        M = np.einsum('ij,npj->npi', rot_axis(phi, alpha), M)

    def half():
        nonlocal M
        mxy = (M[..., 0] + 1j * M[..., 1]) @ ET.T     # (nIso, pools)
        mz = M[..., 2] @ EL.T + rec
        mxy = mxy * np.exp(1j * th)[:, None]          # dephasing
        M = np.stack([mxy.real, mxy.imag, mz], -1)

    apply_rf(np.pi / 2, np.pi / 2)
    echoes = []
    for a in np.asarray(flips):
        half()
        apply_rf(a, 0.0)
        half()
        mxy = M[..., 0] + 1j * M[..., 1]
        echoes.append(mxy.sum(-1).mean())             # total transverse
    return np.asarray(echoes)


def test_cpmg_vs_isochromat_ensemble():
    flips = np.deg2rad([160, 145, 130, 115, 100])
    kw = dict(T1a=0.9, T2a=0.08, T1b=0.3, T2b=0.015, kab=8.0,
              kba=8.0 * 0.8 / 0.2, esp=0.012, M0a=0.8, M0b=0.2,
              dfb=120.0)
    ech = np.asarray(epg.epgx_cpmg(jnp.asarray(flips, F64), **kw))
    ech_c = ech[..., 0] + 1j * ech[..., 1]
    ref = _iso_cpmg(flips, **kw)
    assert np.abs(ech_c - ref).max() < 1e-10, (ech_c, ref)


def test_exchange_accelerates_decay_and_differentiable():
    flips = jnp.full(8, jnp.pi, F64)          # perfect refocusing
    kw = dict(T1a=1.0, T2a=0.1, T1b=1.0, T2b=0.005, esp=0.01,
              M0a=0.8, M0b=0.2)

    def last_echo(kab):
        kba = kab * 0.8 / 0.2
        e = epg.epgx_cpmg(flips, kab=kab, kba=kba, **kw)
        return jnp.hypot(e[-1, 0], e[-1, 1])

    free = float(last_echo(0.0))
    coupled = float(last_echo(10.0))
    assert coupled < 0.9 * free, (coupled, free)
    g = float(jax.grad(last_echo)(5.0))
    assert np.isfinite(g) and g < 0            # more exchange, more loss


def test_epgx_batched_maps():
    r"""Per-voxel parameter maps broadcast like the single-pool train."""
    flips = jnp.asarray(np.deg2rad([150, 140, 130]), F64)
    kab = jnp.asarray([0.0, 5.0, 20.0], F64)
    ech = epg.epgx_cpmg(flips, T1a=1.0, T2a=0.08, T1b=0.4, T2b=0.01,
                        kab=kab, kba=kab * 4.0, esp=0.01,
                        M0a=0.8, M0b=0.2)
    assert ech.shape == (3, 3, 2)
    one = epg.epgx_cpmg(flips, T1a=1.0, T2a=0.08, T1b=0.4, T2b=0.01,
                        kab=5.0, kba=20.0, esp=0.01, M0a=0.8, M0b=0.2)
    assert float(jnp.abs(ech[1] - one).max()) < 1e-13


# ------------------------------------------------------------------
# EPG-X(MT): bound pool with RF saturation
# ------------------------------------------------------------------

def test_mt_lineshapes_common_normalization():
    r"""All three absorption lineshapes integrate to 1/(2π) over Δ —
    they are the same normalization family (each super-Lorentzian
    angle component is a Gaussian of that family)."""
    T2b = 11e-6
    X = 3e5
    d = np.linspace(-X, X, 60001)
    # the Lorentzian's 1/Δ² tails put ~3% beyond ±X: compare against
    # the truncated analytic mass (2/π)·arctan(2πXT2b) of 1/(2π)
    expect = {'lorentzian': (2 / np.pi) * np.arctan(2 * np.pi * X
                                                    * T2b),
              'gaussian': 1.0, 'superlorentzian': 1.0}
    for kind in ('lorentzian', 'gaussian', 'superlorentzian'):
        G = np.asarray(epg.mt_lineshape(jnp.asarray(d, F64), T2b,
                                        kind=kind))
        integral = np.trapezoid(G, d) * 2 * np.pi
        assert abs(integral - expect[kind]) < 2e-3, (kind, integral)
    # exact on-center values of the closed forms
    g0 = float(epg.mt_lineshape(jnp.asarray(0.0, F64), T2b,
                                kind='lorentzian'))
    assert abs(g0 - T2b / np.pi) < 1e-18
    g0 = float(epg.mt_lineshape(jnp.asarray(0.0, F64), T2b,
                                kind='gaussian'))
    assert abs(g0 - T2b / np.sqrt(2 * np.pi)) < 1e-18


def test_mt_no_saturation_decoupled_matches_single_pool():
    phis = epg.rf_spoil_phases(10)
    fl = jnp.full(10, np.deg2rad(12.0), F64)
    mt = epg.epgx_mt_spgr(fl, phis, T1a=1.0, T2a=0.08, T1b=1.0,
                          kab=0.0, kba=0.0, tr=0.03, M0a=1.0, M0b=0.0)
    ref = epg.epg_spgr(fl, phis, T1=1.0, T2=0.08, tr=0.03, M0=1.0)
    assert float(jnp.abs(mt - ref).max()) < 1e-13


def test_mt_spgr_analytic_steady_state():
    r"""RF-spoiled MT-SPGR approaches the ideal-spoiling two-pool
    steady state: ``z = E_L diag(cos a, e^{-wt}) z + rec`` solved
    directly (numpy); the signal is ``sin(a) Za_ss``."""
    import scipy.linalg
    a, wt, tr = np.deg2rad(10.0), 0.35, 0.03
    T1a, T1b, kab, kba = 1.2, 0.9, 2.0, 8.0
    M0a, M0b = 0.8, 0.2
    n = 600
    sig = epg.epgx_mt_spgr(
        jnp.full(n, a, F64), epg.rf_spoil_phases(n),
        T1a=T1a, T2a=0.06, T1b=T1b, kab=kab, kba=kba, tr=tr, wt=wt,
        M0a=M0a, M0b=M0b)
    mag = float(jnp.hypot(sig[-1, 0], sig[-1, 1]))
    AL = np.array([[-1 / T1a - kab, kba], [kab, -1 / T1b - kba]])
    EL = scipy.linalg.expm(AL * tr)
    rec = np.linalg.solve(AL, (EL - np.eye(2))
                          @ np.array([M0a / T1a, M0b / T1b]))
    S = np.diag([np.cos(a), np.exp(-wt)])
    z_ss = np.linalg.solve(np.eye(2) - EL @ S, rec)
    ana = np.sin(a) * z_ss[0]
    assert abs(mag - ana) / ana < 0.01, (mag, ana)
    # MT contrast: saturation suppresses the free-pool signal
    sig0 = epg.epgx_mt_spgr(
        jnp.full(n, a, F64), epg.rf_spoil_phases(n),
        T1a=T1a, T2a=0.06, T1b=T1b, kab=kab, kba=kba, tr=tr, wt=0.0,
        M0a=M0a, M0b=M0b)
    mag0 = float(jnp.hypot(sig0[-1, 0], sig0[-1, 1]))
    assert mag < 0.97 * mag0, (mag, mag0)


def test_mt_differentiable_in_exchange_and_saturation():
    def last(kab, wt):
        s = epg.epgx_mt_spgr(
            jnp.full(40, np.deg2rad(12.0), F64),
            epg.rf_spoil_phases(40), T1a=1.0, T2a=0.07, T1b=1.0,
            kab=kab, kba=4.0 * kab, tr=0.03, wt=wt, M0a=0.8, M0b=0.2)
        return jnp.hypot(s[-1, 0], s[-1, 1])

    gk, gw = jax.grad(last, argnums=(0, 1))(2.0, 0.3)
    assert np.isfinite(float(gk)) and np.isfinite(float(gw))
    assert float(gw) < 0           # more saturation, less signal


def test_spgr_truncated_orders():
    r"""``K=`` truncation: an RF-spoiled 200-TR train at K=48 matches
    the full-order (K=201) train to ~E2^K — the standard EPG
    steady-state shortcut, ~4x cheaper."""
    n = 200
    fl = jnp.full(n, np.deg2rad(12.0), F64)
    ph = epg.rf_spoil_phases(n)
    kw = dict(T1=1.0, T2=0.07, tr=0.03)
    full = epg.epg_spgr(fl, ph, **kw)
    trunc = epg.epg_spgr(fl, ph, K=48, **kw)
    rel = float(jnp.abs(full - trunc).max()
                / jnp.abs(full).max())
    assert rel < 1e-9, rel
    kwx = dict(T1a=1.0, T2a=0.07, T1b=1.0, kab=2.0, kba=8.0, tr=0.03,
               wt=0.3, M0a=0.8, M0b=0.2)
    fullx = epg.epgx_mt_spgr(fl, ph, **kwx)
    truncx = epg.epgx_mt_spgr(fl, ph, K=48, **kwx)
    relx = float(jnp.abs(fullx - truncx).max()
                 / jnp.abs(fullx).max())
    assert relx < 1e-9, relx


def test_epgx_relax_non_detailed_balance_steady_state():
    r"""Arbitrary (non-detailed-balance) rates: long free evolution
    must reach the TRUE Bloch-McConnell steady state ``-A^-1 b``, not
    the equilibrium [M0a, M0b] (the shortcut recovery formula is wrong
    there - regression for a confirmed bug)."""
    T1a, T1b, kab, kba = 1.0, 0.5, 5.0, 2.0   # kab*M0a != kba*M0b
    M0a, M0b = 0.8, 0.2
    s = epg.epgx_state(3, M0a=M0a, M0b=M0b, dtype=F64)
    s = s.at[...].set(0.0)                    # start from zero
    s = epg.epgx_relax(s, 50.0, T1a=T1a, T2a=0.1, T1b=T1b, T2b=0.01,
                       kab=kab, kba=kba, M0a=M0a, M0b=M0b)
    AL = np.array([[-1 / T1a - kab, kba], [kab, -1 / T1b - kba]])
    z_ss = np.linalg.solve(-AL, [M0a / T1a, M0b / T1b])
    got = np.array([float(s[0, 2, 0, 0]), float(s[1, 2, 0, 0])])
    assert np.abs(got - z_ss).max() < 1e-12, (got, z_ss)
    # MT variant shares the recovery path
    s2 = epg.epgx_state(3, M0a=M0a, M0b=M0b, dtype=F64)
    s2 = s2.at[...].set(0.0)
    s2 = epg.epgx_mt_relax(s2, 50.0, T1a=T1a, T2a=0.1, T1b=T1b,
                           kab=kab, kba=kba, M0a=M0a, M0b=M0b)
    got2 = np.array([float(s2[0, 2, 0, 0]), float(s2[1, 2, 0, 0])])
    assert np.abs(got2 - z_ss).max() < 1e-12, (got2, z_ss)


def test_epgx_mesh_sharded_parity():
    r"""Voxel-sharded EPG-X trains on the 8-virtual-device mesh match
    the unsharded ones at 1e-12 (per-voxel exchange maps for CPMG,
    per-voxel saturation trains for MT-SPGR)."""
    from mrphy_tpu.parallel import make_mesh
    mesh = make_mesh()
    nv = 16
    rng = np.random.default_rng(11)
    flips = jnp.asarray(np.tile(np.deg2rad([160, 150, 140, 130]),
                                (nv, 1)), F64)
    kab = jnp.asarray(rng.uniform(0.5, 10.0, nv), F64)
    kw = dict(T1a=1.0, T2a=0.08, T1b=0.4, T2b=0.012, kab=kab,
              kba=kab * 3.0, esp=0.01, M0a=0.8, M0b=0.2)
    a = epg.epgx_cpmg(flips, **kw)
    b = epg.epgx_cpmg(flips, mesh=mesh, **kw)
    assert a.shape == b.shape == (nv, 4, 2)
    assert float(jnp.abs(a - b).max()) < 1e-12

    nTR = 12
    fl = jnp.asarray(np.tile(np.deg2rad(12.0), (nv, nTR)), F64)
    ph = epg.rf_spoil_phases(nTR)
    wt = jnp.asarray(rng.uniform(0.0, 0.5, (nv, nTR)), F64)
    kwm = dict(T1a=1.1, T2a=0.06, T1b=1.0, kab=2.0, kba=8.0, tr=0.03,
               wt=wt, M0a=0.8, M0b=0.2)
    a = epg.epgx_mt_spgr(fl, ph, **kwm)
    b = epg.epgx_mt_spgr(fl, ph, mesh=mesh, **kwm)
    assert float(jnp.abs(a - b).max()) < 1e-12


def test_epgx_mesh_pervoxel_phis_and_wt_ambiguity():
    r"""Regressions for confirmed sharded-dispatch bugs: batched
    per-voxel phis must shard (it used to raise for nV != mesh extent
    and SILENTLY return a wrong-shaped result for nV == extent), and a
    1-D wt with nTR == nV must be rejected as ambiguous rather than
    mis-sharded."""
    from mrphy_tpu.parallel import make_mesh
    mesh = make_mesh()
    rng = np.random.default_rng(13)
    for nv in (16, 8):                        # 8 == the mesh extent
        fl = jnp.full((nv, 6), np.deg2rad(14.0), F64)
        ph = jnp.asarray(rng.uniform(0, 2 * np.pi, (nv, 6)), F64)
        kw = dict(T1a=1.0, T2a=0.07, T1b=0.5, T2b=0.01, kab=2.0,
                  kba=8.0, tr=0.02, M0a=0.8, M0b=0.2)
        a = epg.epgx_spgr(fl, ph, **kw)
        b = epg.epgx_spgr(fl, ph, mesh=mesh, **kw)
        assert b.shape == (nv, 6, 2), b.shape
        assert float(jnp.abs(a - b).max()) < 1e-12

    fl = jnp.full((8, 8), 0.2, F64)
    kwm = dict(T1a=1.0, T2a=0.07, T1b=0.5, kab=2.0, kba=8.0, tr=0.02,
               M0a=0.8, M0b=0.2)
    with pytest.raises(ValueError, match='ambiguous'):
        epg.epgx_mt_spgr(fl, None, wt=jnp.ones(8), mesh=mesh, **kwm)
    wt = 0.3 * jnp.ones((1, 8))
    a = epg.epgx_mt_spgr(fl, None, wt=jnp.broadcast_to(wt, (8, 8)),
                         **kwm)
    b = epg.epgx_mt_spgr(fl, None, wt=wt, mesh=mesh, **kwm)
    assert float(jnp.abs(a - b).max()) < 1e-12
