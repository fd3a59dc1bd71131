r"""Randomized cross-engine consistency sweep.

Property-based tier on top of the golden/oracle tests: for random
shapes, parameter combinations, and dtypes, the custom-VJP engine, the
autodiff oracle, and the fused waveform engine must agree — outputs AND
gradients — at f64 oracle tolerance. Catches broadcast/optional-argument
interactions no hand-picked case covers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu import gamH, dt0
from mrphy_tpu.ops import sims, slowsims
from mrphy_tpu.ops import beffective


def _case(rng):
    N = int(rng.integers(1, 3))
    nM = int(rng.integers(1, 33))
    nT = int(rng.integers(1, 24))
    nC = int(rng.choice([1, 1, 2, 3]))
    relax = bool(rng.random() < 0.7)
    has_df = bool(rng.random() < 0.6)
    has_b1 = bool(rng.random() < 0.5)
    # broadcast or per-spin params, both legal per the shape grammar
    pshape = (1, 1) if rng.random() < 0.5 else (N, nM)
    return dict(N=N, nM=nM, nT=nT, nC=nC, relax=relax, has_df=has_df,
                has_b1=has_b1, pshape=pshape)


@pytest.mark.parametrize('seed', [
    *range(4),
    *(pytest.param(k, marks=pytest.mark.slow) for k in range(4, 8))])
def test_engines_agree_on_random_configs(seed):
    rng = np.random.default_rng(100 + seed)
    c = _case(rng)
    N, nM, nT, nC = c['N'], c['nM'], c['nT'], c['nC']
    f64 = jnp.float64

    Mi = jnp.asarray(rng.random((N, nM, 3)) - 0.5, f64)
    loc = jnp.asarray(rng.random((N, nM, 3)) - 0.5, f64)
    rf = jnp.asarray(rng.random((N, 2, nT, nC)) * 0.2, f64)
    if nC == 1 and not c['has_b1'] and rng.random() < 0.5:
        rf = rf[..., 0]              # missing-coil-dim path
    gr = jnp.asarray(rng.random((N, 3, nT)), f64)
    kw = dict(gam=gamH, dt=float(dt0))
    if c['relax']:
        kw['T1'] = jnp.asarray(rng.random(c['pshape']) * 2 + 0.2, f64)
        kw['T2'] = jnp.asarray(rng.random(c['pshape']) * 0.2 + 0.02, f64)
    if c['has_df']:
        kw['df'] = jnp.asarray(rng.random((N, nM)) * 100 - 50, f64)
    if c['has_b1']:
        kw['b1Map'] = jnp.asarray(
            rng.random((N, nM, 2, nC)) - 0.3, f64)

    W = jnp.asarray(rng.normal(size=(N, nM, 3)), f64)

    # composed references: rfgr2beff + (fast engine | oracle)
    bkw = {k: kw[k] for k in ('df', 'b1Map') if k in kw}
    beff = beffective.rfgr2beff(rf, gr, loc, gam=kw['gam'], **bkw)
    skw = {k: kw[k] for k in ('T1', 'T2', 'gam', 'dt') if k in kw}

    def loss_fused(rf, gr, Mi):
        return jnp.sum(W * sims.blochsim_rfgr(Mi, rf, gr, loc, **kw))

    def loss_fast(rf, gr, Mi):
        b = beffective.rfgr2beff(rf, gr, loc, gam=kw['gam'], **bkw)
        return jnp.sum(W * sims.blochsim(Mi, b, backend='xla', **skw))

    def loss_oracle(rf, gr, Mi):
        b = beffective.rfgr2beff(rf, gr, loc, gam=kw['gam'], **bkw)
        return jnp.sum(W * slowsims.blochsim(Mi, b, **skw))

    Mo_fused = sims.blochsim_rfgr(Mi, rf, gr, loc, **kw)
    Mo_fast = sims.blochsim(Mi, beff, backend='xla', **skw)
    Mo_oracle = slowsims.blochsim(Mi, beff, **skw)
    np.testing.assert_allclose(Mo_fused, Mo_oracle, atol=1e-9, err_msg=c)
    np.testing.assert_allclose(Mo_fast, Mo_oracle, atol=1e-9, err_msg=c)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(rf, gr, Mi)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(rf, gr, Mi)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(rf, gr, Mi)
    for a, b, d in zip(g_fused, g_fast, g_oracle):
        np.testing.assert_allclose(a, d, atol=1e-8, err_msg=c)
        np.testing.assert_allclose(b, d, atol=1e-8, err_msg=c)


@pytest.mark.parametrize('seed', [
    *range(3),
    *(pytest.param(k, marks=pytest.mark.slow) for k in range(3, 6))])
def test_signal_backends_agree_on_random_configs(seed):
    r"""Acquisition operator: XLA path, fused-Pallas path (interpret),
    and the dense closed form agree for random shapes and optional
    combinations; the adjoint satisfies the dot-product identity."""
    from mrphy_tpu.ops import signal as sig

    rng = np.random.default_rng(300 + seed)
    N = int(rng.integers(1, 3))
    nM = int(rng.integers(1, 40))
    nT = int(rng.integers(1, 50))
    nC = int(rng.choice([1, 2, 4]))
    has_df = bool(rng.random() < 0.6)
    has_t2 = bool(rng.random() < 0.6)
    has_se = bool(rng.random() < 0.7)
    dt = float(rng.uniform(1e-5, 1e-4))

    f32 = jnp.float32
    M = jnp.asarray(rng.standard_normal((N, nM, 3)), f32)
    loc_ = jnp.asarray(rng.uniform(-5, 5, (N, nM, 3)), f32)
    k = jnp.asarray(rng.uniform(-1, 1, (N, 3, nT)), f32)
    kw = dict(dt=dt)
    if has_df:
        kw['df'] = jnp.asarray(rng.uniform(-100, 100, (N, nM)), f32)
    if has_t2:
        kw['T2s'] = jnp.asarray(rng.uniform(1e-3, 1e-1, (N, nM)), f32)
    if has_se:
        kw['sens'] = jnp.asarray(rng.standard_normal((N, nM, 2, nC)),
                                 f32)

    s_x = sig.signal(M, loc_, k, **kw)
    s_p = sig.signal(M, loc_, k, backend='pallas',
                     _pallas_interpret=True, **kw)
    tol = 3e-5 * float(np.abs(np.asarray(s_x)).max()) + 1e-6
    np.testing.assert_allclose(s_p, s_x, atol=tol)

    # dense closed form (f64)
    t = (np.arange(nT) + 1) * dt
    psi = -2 * np.pi * (np.einsum('nmx,nxt->nmt', np.asarray(
        loc_, np.float64), np.asarray(k, np.float64))
        + (np.asarray(kw['df'], np.float64)[..., None] * t
           if has_df else 0))
    fac = np.exp(1j * psi)
    if has_t2:
        fac = fac * np.exp(-t / np.asarray(kw['T2s'],
                                           np.float64)[..., None])
    mxy = np.asarray(M[..., 0], np.float64) \
        + 1j * np.asarray(M[..., 1], np.float64)
    if has_se:
        se = np.asarray(kw['sens'], np.float64)
        wc = (se[..., 0, :] + 1j * se[..., 1, :]) * mxy[..., None]
        s_ref = np.einsum('nmc,nmt->nct', wc, fac)
    else:
        s_ref = np.einsum('nm,nmt->nt', mxy, fac)[:, None]
    np.testing.assert_allclose(s_x[..., 0] + 1j * np.asarray(
        s_x[..., 1]), s_ref, atol=tol)

    # adjoint identity on the same random config
    s_ct = jnp.asarray(rng.standard_normal(s_x.shape), f32)
    m_hat = sig.signal_adjoint(s_ct, loc_, k, **kw)
    lhs = float(jnp.sum(s_x * s_ct))
    rhs = float(jnp.sum(M[..., :2] * m_hat))
    assert abs(lhs - rhs) <= 3e-6 * abs(lhs) + 1e-4, (lhs, rhs)


@pytest.mark.parametrize('seed', [
    *range(3),
    *(pytest.param(k, marks=pytest.mark.slow) for k in range(3, 6))])
def test_nufft_agrees_with_exact_on_random_configs(seed):
    r"""Random grid shapes/dims/widths/anisotropies: the gridding NUFFT
    and its adjoint must match the exact operator within the
    width-dependent gridding tolerance, and the pair must stay an
    exact transpose."""
    from mrphy_tpu.ops import nufft as nf
    from mrphy_tpu.ops import signal as sig
    rng = np.random.default_rng(500 + seed)
    d = int(rng.integers(1, 4))
    im_size = tuple(int(rng.integers(4, 15)) for _ in range(d))
    fov = tuple(float(rng.uniform(8, 30)) for _ in range(d))
    width = int(rng.choice([4, 5, 6]))
    osf = float(rng.choice([1.75, 2.0, 2.5]))
    nT = int(rng.integers(5, 120))
    tol = {4: 3e-3, 5: 5e-4, 6: 5e-5}[width] * (3.0 if osf < 2 else 1.0)
    f64 = jnp.float64

    axes = [(np.arange(n) - n // 2) / n * f
            for n, f in zip(im_size, fov)]
    mesh = np.meshgrid(*axes, indexing='ij')
    loc = np.zeros(tuple(im_size) + (3,))
    for a in range(d):
        loc[..., a] = mesh[a]
    nM = int(np.prod(im_size))
    loc_ = jnp.asarray(loc.reshape(nM, 3), f64)[None]
    img = jnp.asarray(rng.standard_normal(im_size + (2,)), f64)
    k = np.zeros((3, nT))
    for a in range(d):
        kmax = 0.95 * im_size[a] / (2 * fov[a])
        k[a] = rng.uniform(-kmax, kmax, nT)
    k3 = jnp.asarray(k, f64)

    plan = nf.nufft_plan(im_size, fov, width=width, osf=osf,
                         dtype=f64)
    s = nf.nufft(plan, img, k3[:d])
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), f64)], -1)[None]
    s0 = sig.signal(M, loc_, k3[None])[0, 0]
    rel = float(jnp.linalg.norm(s - s0) / jnp.linalg.norm(s0))
    assert rel < tol, (rel, tol, im_size, width, osf, nT)

    y = jnp.asarray(rng.standard_normal((nT, 2)), f64)
    xh = np.asarray(nf.nufft_adjoint(plan, y, k3[:d]))

    def c(a):
        return np.asarray(a[..., 0] + 1j * a[..., 1]).reshape(-1)

    lhs = np.vdot(c(np.asarray(y)), c(np.asarray(s)))
    rhs = np.vdot(c(xh), c(np.asarray(img)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-12
