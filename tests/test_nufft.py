r"""Gridding NUFFT tests — every claim is checked against the EXACT
encoding operator :mod:`mrphy_tpu.ops.signal` (itself validated against
the stepped Bloch simulator in ``tests/test_signal.py``):

- type-2 forward accuracy vs the exact operator at W=4 (≲1e-3) and
  W=6 (≲1e-5), in 1-D, anisotropic 2-D, and anisotropic 3-D (different
  per-axis n AND fov so axis mixups cannot cancel);
- :func:`nufft_adjoint` is the exact transpose (dot-product identity
  AND bit-match against ``jax.vjp`` of the forward);
- the Toeplitz normal operator matches AᴴWA assembled from the exact
  operator to f64 roundoff (it is exact by construction);
- sample-chunking invariance; gradients flow through image, samples,
  and trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu.ops import nufft as nf
from mrphy_tpu.ops import signal as sig

F64 = jnp.float64


def _grid_problem(rng, im_size, fov, dtype=F64):
    r"""SpinCube-convention grid locations (x = fov·(j − n//2)/n on the
    first ``d`` axes, zeros beyond) + a random transverse image."""
    d = len(im_size)
    axes = [(np.arange(n) - n // 2) / n * f for n, f in zip(im_size, fov)]
    mesh = np.meshgrid(*axes, indexing='ij')
    loc = np.zeros(tuple(im_size) + (3,))
    for a in range(d):
        loc[..., a] = mesh[a]
    nM = int(np.prod(im_size))
    loc_ = jnp.asarray(loc.reshape(nM, 3), dtype)[None]
    img = jnp.asarray(rng.standard_normal(tuple(im_size) + (2,)), dtype)
    return loc_, img


def _ktraj(rng, d, im_size, fov, nT, dtype=F64):
    r"""Random k within the grid Nyquist box (|k_a| ≤ 0.95·n_a/(2·fov_a)),
    padded with zero rows to the (3, nT) the exact operator wants."""
    k = np.zeros((3, nT))
    for a in range(d):
        kmax = 0.95 * im_size[a] / (2 * fov[a])
        k[a] = rng.uniform(-kmax, kmax, nT)
    return jnp.asarray(k, dtype)


def _exact(img, loc_, k3):
    r"""The exact operator on the same image: M = (re, im, 0)."""
    nM = loc_.shape[1]
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), img.dtype)], -1)[None]
    return sig.signal(M, loc_, k3[None])[0, 0]        # (nT, 2)


CASES = [
    ((32,), (24.0,), 4, 2e-3),
    ((16, 12), (24.0, 18.0), 4, 2e-3),
    ((16, 12), (24.0, 18.0), 6, 2e-5),
    ((8, 6, 10), (16.0, 12.0, 20.0), 5, 2e-4),
]


@pytest.mark.parametrize('im_size,fov,width,tol', CASES,
                         ids=[f'{len(c[0])}d_w{c[2]}' for c in CASES])
def test_forward_matches_exact_operator(im_size, fov, width, tol):
    rng = np.random.default_rng(7)
    loc_, img = _grid_problem(rng, im_size, fov)
    k3 = _ktraj(rng, len(im_size), im_size, fov, nT=257)
    plan = nf.nufft_plan(im_size, fov, width=width, dtype=F64)
    s = nf.nufft(plan, img, k3[:len(im_size)])
    s0 = _exact(img, loc_, k3)
    rel = float(jnp.linalg.norm(s - s0) / jnp.linalg.norm(s0))
    assert rel < tol, (rel, tol)


def test_adjoint_is_exact_transpose():
    rng = np.random.default_rng(11)
    im_size, fov = (16, 12), (24.0, 18.0)
    loc_, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, 2, im_size, fov, nT=64)[:2]
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    y = jnp.asarray(rng.standard_normal((64, 2)), F64)

    # complex dot-product identity <Ax, y> == <x, A^H y>
    s = np.asarray(nf.nufft(plan, img, k))
    xh = np.asarray(nf.nufft_adjoint(plan, y, k))

    def c(a):
        return np.asarray(a[..., 0] + 1j * a[..., 1]).reshape(-1)

    lhs = np.vdot(c(y), c(s))
    rhs = np.vdot(c(xh), c(np.asarray(img)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-13, (lhs, rhs)

    # and it matches jax.vjp of the forward bit-for-bit-ish
    _, vjp = jax.vjp(lambda x: nf.nufft(plan, x, k), img)
    g = vjp(y)[0]
    assert float(jnp.abs(g - nf.nufft_adjoint(plan, y, k)).max()) < 1e-12


def test_adjoint_matches_exact_operator():
    rng = np.random.default_rng(13)
    im_size, fov = (16, 12), (24.0, 18.0)
    loc_, _ = _grid_problem(rng, im_size, fov)
    k3 = _ktraj(rng, 2, im_size, fov, nT=129)
    plan = nf.nufft_plan(im_size, fov, width=6, dtype=F64)
    y = jnp.asarray(rng.standard_normal((129, 2)), F64)
    xh = nf.nufft_adjoint(plan, y, k3[:2])
    x0 = sig.signal_adjoint(y[None, None], loc_, k3[None])[0]  # (nM, 2)
    x0 = x0.reshape(im_size + (2,))
    rel = float(jnp.linalg.norm(xh - x0) / jnp.linalg.norm(x0))
    assert rel < 2e-5, rel


@pytest.mark.parametrize('weighted', [False, True])
def test_toeplitz_matches_exact_normal_operator(weighted):
    rng = np.random.default_rng(17)
    im_size, fov = (12, 10), (24.0, 20.0)
    loc_, img = _grid_problem(rng, im_size, fov)
    nT = 201
    k3 = _ktraj(rng, 2, im_size, fov, nT=nT)
    w = (jnp.asarray(rng.uniform(0.2, 1.0, nT), F64) if weighted
         else None)
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    that = nf.toeplitz_kernel(plan, k3[:2], weights=w, chunk=64)
    out = nf.toeplitz_apply(plan, that, img)

    s = _exact(img, loc_, k3)                         # (nT, 2)
    if w is not None:
        s = s * w[:, None]
    x0 = sig.signal_adjoint(s[None, None], loc_, k3[None])[0]
    x0 = x0.reshape(im_size + (2,))
    rel = float(jnp.linalg.norm(out - x0) / jnp.linalg.norm(x0))
    assert rel < 1e-11, rel                           # exact: roundoff


def test_toeplitz_3d_matches_exact():
    rng = np.random.default_rng(23)
    im_size, fov = (6, 4, 8), (12.0, 8.0, 16.0)
    loc_, img = _grid_problem(rng, im_size, fov)
    k3 = _ktraj(rng, 3, im_size, fov, nT=97)
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    that = nf.toeplitz_kernel(plan, k3, chunk=32)
    out = nf.toeplitz_apply(plan, that, img)
    s = _exact(img, loc_, k3)
    x0 = sig.signal_adjoint(s[None, None], loc_, k3[None])[0]
    rel = float(jnp.linalg.norm(out - x0.reshape(out.shape))
                / jnp.linalg.norm(out))
    assert rel < 1e-11, rel


def test_time_segmented_df_t2s_matches_exact():
    r"""df/T2* hat time segmentation vs the exact operator: a 5 ms
    readout with ±50 Hz off-resonance and 20 ms T2* at nseg=16 must
    land within the documented ≲1e-3 (W=6 so gridding error is far
    below the segmentation error being measured)."""
    rng = np.random.default_rng(41)
    im_size, fov = (16, 12), (24.0, 18.0)
    loc_, img = _grid_problem(rng, im_size, fov)
    nT, dt = 500, 1e-5                                # 5 ms readout
    k3 = _ktraj(rng, 2, im_size, fov, nT=nT)
    dfg = jnp.asarray(rng.uniform(-50, 50, im_size), F64)
    t2g = jnp.asarray(rng.uniform(0.01, 0.05, im_size), F64)
    plan = nf.nufft_plan(im_size, fov, width=6, dtype=F64)
    s = nf.nufft(plan, img, k3[:2], df=dfg, T2s=t2g, dt=dt, nseg=16)

    nM = int(np.prod(im_size))
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), F64)], -1)[None]
    s0 = sig.signal(M, loc_, k3[None], df=dfg.reshape(1, nM),
                    T2s=t2g.reshape(1, nM), dt=dt)[0, 0]
    rel = float(jnp.linalg.norm(s - s0) / jnp.linalg.norm(s0))
    assert rel < 1.5e-3, rel
    # more segments -> strictly better
    s32 = nf.nufft(plan, img, k3[:2], df=dfg, T2s=t2g, dt=dt, nseg=32)
    rel32 = float(jnp.linalg.norm(s32 - s0) / jnp.linalg.norm(s0))
    assert rel32 < rel / 2, (rel, rel32)


def test_time_segmented_single_sample_no_nan():
    r"""Regression: nT < nseg (extreme: nT = 1) used to divide by a
    zero hat spacing and return all-NaN; nseg must clamp to nT."""
    rng = np.random.default_rng(47)
    im_size, fov = (16, 12), (24.0, 18.0)
    loc_, img = _grid_problem(rng, im_size, fov)
    k3 = _ktraj(rng, 2, im_size, fov, nT=1)
    dfg = jnp.asarray(rng.uniform(-50, 50, im_size), F64)
    plan = nf.nufft_plan(im_size, fov, width=6, dtype=F64)
    s = nf.nufft(plan, img, k3[:2], df=dfg, dt=1e-5, nseg=8)
    assert np.isfinite(np.asarray(s)).all(), s
    nM = int(np.prod(im_size))
    M = jnp.concatenate([img.reshape(nM, 2),
                         jnp.zeros((nM, 1), F64)], -1)[None]
    s0 = sig.signal(M, loc_, k3[None], df=dfg.reshape(1, nM),
                    dt=1e-5)[0, 0]
    rel = float(jnp.linalg.norm(s - s0) / jnp.linalg.norm(s0))
    assert rel < 2e-5, rel
    x = nf.nufft_adjoint(plan, s, k3[:2], df=dfg, dt=1e-5, nseg=8)
    assert np.isfinite(np.asarray(x)).all()


def test_time_segmented_adjoint_consistent():
    r"""Under df/T2s the pair must STILL be an exact complex-adjoint
    pair (same arguments), so CG normal equations stay symmetric."""
    rng = np.random.default_rng(43)
    im_size, fov = (12, 10), (24.0, 20.0)
    _, img = _grid_problem(rng, im_size, fov)
    nT, dt = 100, 1e-5
    k = _ktraj(rng, 2, im_size, fov, nT=nT)[:2]
    dfg = jnp.asarray(rng.uniform(-80, 80, im_size), F64)
    t2g = jnp.asarray(rng.uniform(0.01, 0.05, im_size), F64)
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    kw = dict(df=dfg, T2s=t2g, dt=dt, nseg=6)
    y = jnp.asarray(rng.standard_normal((nT, 2)), F64)
    s = np.asarray(nf.nufft(plan, img, k, **kw))
    xh = np.asarray(nf.nufft_adjoint(plan, y, k, **kw))

    def c(a):
        return np.asarray(a[..., 0] + 1j * a[..., 1]).reshape(-1)

    lhs = np.vdot(c(y), c(s))
    rhs = np.vdot(c(xh), c(np.asarray(img)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-13, (lhs, rhs)


def test_chunking_invariance():
    rng = np.random.default_rng(29)
    im_size, fov = (16, 12), (24.0, 18.0)
    _, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, 2, im_size, fov, nT=53)[:2]       # odd: forces pad
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    s_full = nf.nufft(plan, img, k)
    s_chunk = nf.nufft(plan, img, k, chunk=8)
    assert float(jnp.abs(s_full - s_chunk).max()) < 1e-12
    y = jnp.asarray(rng.standard_normal((53, 2)), F64)
    a_full = nf.nufft_adjoint(plan, y, k)
    a_chunk = nf.nufft_adjoint(plan, y, k, chunk=8)
    assert float(jnp.abs(a_full - a_chunk).max()) < 1e-12


def test_dcf_pipe_menon_radial_ramp():
    r"""On a uniformly-spaced radial trajectory the converged
    Pipe–Menon weights must reproduce the analytic ramp |k| away from
    the center crossing and the k-space edge (the two places PM
    *improves* on the ramp). Uniform spokes and grid-matched kmax on
    purpose: golden-angle with few spokes has genuinely nonuniform
    azimuthal density (PM then correctly deviates from the ramp), and
    beyond-Nyquist samples wrap consistently for recon but mix local
    densities."""
    im_size, fov = (16, 16), 24.0
    kmax = im_size[0] / (2 * fov)
    nsp, nro = 48, 65
    th = np.pi * np.arange(nsp) / nsp
    r = kmax * np.linspace(-1, 1, nro)
    kx = (np.cos(th)[:, None] * r[None]).reshape(-1)
    ky = (np.sin(th)[:, None] * r[None]).reshape(-1)
    k = jnp.asarray(np.stack([kx, ky]), F64)
    plan = nf.nufft_plan(im_size, (fov, fov), width=4, dtype=F64)
    w = np.asarray(nf.dcf_pipe_menon(plan, k, iters=40,
                                     normalize=False))
    # PM fixed point: kernel-smoothed density ~ flat at the samples
    fi, fw = nf._taps(plan, *nf._coords(plan, k))
    g = np.zeros(int(np.prod(plan.grid_size)))
    np.add.at(g, np.asarray(fi).reshape(-1),
              np.asarray(fw * w[:, None]).reshape(-1))
    d = (np.asarray(fw) * g[np.asarray(fi)]).sum(-1)
    assert np.percentile(np.abs(d - 1.0), 95) < 0.05, \
        np.percentile(np.abs(d - 1.0), 95)
    # ramp shape on the interior annulus
    kr = np.linalg.norm(np.asarray(k).T, axis=-1)
    kmax = kr.max()
    ann = (kr > 0.15 * kmax) & (kr < 0.8 * kmax)
    corr = np.corrcoef(w[ann], kr[ann])[0, 1]
    assert corr > 0.995, corr


def test_dcf_conjugate_phase_recon():
    r"""Single-pass gridding recon ``nufft_adjoint(w ⊙ s)`` of a smooth
    object through corner-covering golden-angle radial: PM-compensated
    recon lands at a few tenths of a percent, vs ~60% for the (even
    optimally scaled) uncompensated adjoint."""
    from mrphy_tpu import dt0
    from mrphy_tpu.utils import radial, g2k
    n, fov = 24, 24.0
    im_size = (n, n)
    gr, _ = radial(fov, int(np.ceil(1.42 * n)))
    k3 = np.asarray(g2k(np.asarray(gr), False, dt=dt0))
    k = jnp.asarray(k3[:, :2].transpose(1, 0, 2).reshape(2, -1), F64)
    ax = (np.arange(n) - n // 2) / n * fov
    yy, xx = np.meshgrid(ax, ax, indexing='ij')
    mag = np.exp(-(xx ** 2 + yy ** 2) / (fov / 4) ** 2)
    img = jnp.asarray(np.stack([mag, 0.3 * mag], -1), F64)
    plan = nf.nufft_plan(im_size, (fov, fov), width=5, dtype=F64)
    s = nf.nufft(plan, img, k)
    w = nf.dcf_pipe_menon(plan, k, iters=40)
    x_cp = nf.nufft_adjoint(plan, w[:, None] * s, k)
    rel = float(jnp.linalg.norm(x_cp - img) / jnp.linalg.norm(img))
    x_raw = nf.nufft_adjoint(plan, s, k)
    x_raw = x_raw * (jnp.vdot(x_raw, img) / jnp.vdot(x_raw, x_raw))
    rel_raw = float(jnp.linalg.norm(x_raw - img) / jnp.linalg.norm(img))
    assert rel < 0.02, rel
    assert rel < rel_raw / 20, (rel, rel_raw)


def test_gradients_flow_img_samples_trajectory():
    rng = np.random.default_rng(31)
    im_size, fov = (8, 8), (16.0, 16.0)
    _, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, 2, im_size, fov, nT=17)[:2]
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    y = jnp.asarray(rng.standard_normal((17, 2)), F64)

    def loss(img, k):
        return jnp.sum((nf.nufft(plan, img, k) - y) ** 2)

    gi, gk = jax.grad(loss, argnums=(0, 1))(img, k)
    assert bool(jnp.all(jnp.isfinite(gi))) and float(
        jnp.abs(gi).max()) > 0
    assert bool(jnp.all(jnp.isfinite(gk))) and float(
        jnp.abs(gk).max()) > 0
    # trajectory gradient vs central differences on one coordinate
    eps = 1e-6
    e = jnp.zeros_like(k).at[0, 3].set(eps)
    fd = (loss(img, k + e) - loss(img, k - e)) / (2 * eps)
    assert abs(float(fd - gk[0, 3])) < 1e-4 * max(1.0, abs(float(fd)))


@pytest.mark.parametrize('im_size,fov', [((32,), (24.0,)),
                                         ((16, 12), (24.0, 18.0))],
                         ids=['1d', '2d'])
def test_matmul_interp_matches_gather(im_size, fov):
    r"""``interp='matmul'`` (dense one-hot MXU factors) must be
    value-identical to the gather/scatter path up to f64 sum order —
    forward, adjoint, Pipe–Menon DCF, chunked variants, and the
    trajectory gradient (the subtlest path: d/dk flows through the KB
    weights inside the compare-selects)."""
    rng = np.random.default_rng(59)
    d = len(im_size)
    _, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, d, im_size, fov, nT=257)[:d]
    y = jnp.asarray(rng.standard_normal((257, 2)), F64)
    pg = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='gather')
    pm = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='matmul')
    assert nf.nufft_plan(im_size, fov, dtype=F64).interp == 'matmul'

    assert float(jnp.abs(nf.nufft(pg, img, k)
                         - nf.nufft(pm, img, k)).max()) < 1e-12
    assert float(jnp.abs(nf.nufft(pm, img, k)
                         - nf.nufft(pm, img, k, chunk=100)).max()) < 1e-12
    assert float(jnp.abs(nf.nufft_adjoint(pg, y, k)
                         - nf.nufft_adjoint(pm, y, k)).max()) < 1e-12
    assert float(jnp.abs(nf.nufft_adjoint(pm, y, k)
                         - nf.nufft_adjoint(pm, y, k, chunk=100)
                         ).max()) < 1e-12
    assert float(jnp.abs(nf.dcf_pipe_menon(pg, k, iters=10)
                         - nf.dcf_pipe_menon(pm, k, iters=10)
                         ).max()) < 1e-12

    def loss(plan, kk):
        return jnp.sum(nf.nufft(plan, img, kk) ** 2)

    gk_g = jax.grad(lambda kk: loss(pg, kk))(k)
    gk_m = jax.grad(lambda kk: loss(pm, kk))(k)
    rel = float(jnp.abs(gk_g - gk_m).max() / jnp.abs(gk_g).max())
    assert rel < 1e-13, rel


def test_matmul_interp_3d_rejected():
    r"""3-D plans never take 'matmul' (the dense factors would cost
    nT·G³): on CPU 'auto' resolves to gather (the pallas mode needs a
    TPU), and an explicit 'matmul' asserts."""
    p = nf.nufft_plan((8, 8, 8), (16.0, 16.0, 16.0), dtype=F64)
    assert p.interp == 'gather'
    with pytest.raises(AssertionError):
        nf.nufft_plan((8, 8, 8), (16.0,) * 3, dtype=F64,
                      interp='matmul')
    with pytest.raises(AssertionError):
        nf.nufft_plan((8, 8), (16.0,) * 2, dtype=F64, interp='pallas')


def test_pallas_interp_3d_matches_gather():
    r"""``interp='pallas'`` (VMEM-resident slice kernel, d = 3) vs the
    gather path: forward, adjoint, the ⟨Ax, y⟩ = ⟨x, Aᴴy⟩ identity on
    the pallas pair itself, and the trajectory gradient (recompute-
    through-XLA VJP ⇒ exactly the gather path's grads at the f32
    kernel boundary). Kernel runs f32, so parity is f32-roundoff."""
    rng = np.random.default_rng(61)
    im_size, fov = (12, 10, 14), (18.0, 15.0, 21.0)
    _, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, 3, im_size, fov, nT=333)
    y = jnp.asarray(rng.standard_normal((333, 2)), F64)
    pg = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='gather')
    pp = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='pallas')

    sg, sp = nf.nufft(pg, img, k), nf.nufft(pp, img, k)
    rel = float(jnp.abs(sg - sp).max() / jnp.abs(sg).max())
    assert rel < 1e-5, rel
    ag, ap = nf.nufft_adjoint(pg, y, k), nf.nufft_adjoint(pp, y, k)
    rel = float(jnp.abs(ag - ap).max() / jnp.abs(ag).max())
    assert rel < 1e-5, rel

    lhs = float(jnp.sum(sp.astype(F64) * y))
    rhs = float(jnp.sum(img * ap.astype(F64)))
    assert abs(lhs - rhs) < 3e-6 * abs(lhs) + 1e-6, (lhs, rhs)

    # df/T2s segmentation + chunking compose through the pallas stage
    df = jnp.asarray(rng.uniform(-30, 30, im_size), F64)
    T2s = jnp.asarray(rng.uniform(0.01, 0.05, im_size), F64)
    sgs = nf.nufft(pg, img, k, df=df, T2s=T2s, dt=4e-6, nseg=4)
    sps = nf.nufft(pp, img, k, df=df, T2s=T2s, dt=4e-6, nseg=4)
    rel = float(jnp.abs(sgs - sps).max() / jnp.abs(sgs).max())
    assert rel < 1e-5, rel

    def loss(plan, kk):
        return jnp.sum(nf.nufft(plan, img, kk) ** 2)

    gk_g = jax.grad(lambda kk: loss(pg, kk))(k)
    gk_p = jax.grad(lambda kk: loss(pp, kk))(k)
    rel = float(jnp.abs(gk_g - gk_p).max() / jnp.abs(gk_g).max())
    assert rel < 1e-4, rel

    def loss_img(plan, im):
        return jnp.sum(nf.nufft(plan, im, k) ** 2)

    gi_g = jax.grad(lambda im: loss_img(pg, im))(img)
    gi_p = jax.grad(lambda im: loss_img(pp, im))(img)
    rel = float(jnp.abs(gi_g - gi_p).max() / jnp.abs(gi_g).max())
    assert rel < 1e-4, rel


def test_pallas_interp_3d_adjoint_grads_match_gather():
    r"""Adjoint-side gradients of the native 3-D Pallas VJP (round 4):
    d/d(samples) and d/d(ktraj) of ``nufft_adjoint(interp='pallas')``
    vs the gather path — this exercises :func:`scatter3d_vjp`'s
    sample-cotangent transpose (``sample3d`` of the grid cotangent)
    and the role-swapped ``dk3d`` call, neither of which the forward
    test touches."""
    rng = np.random.default_rng(67)
    im_size, fov = (10, 12, 8), (15.0, 18.0, 12.0)
    k = _ktraj(rng, 3, im_size, fov, nT=257)
    y = jnp.asarray(rng.standard_normal((257, 2)), F64)
    pg = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='gather')
    pp = nf.nufft_plan(im_size, fov, width=4, dtype=F64,
                       interp='pallas')
    tgt = jnp.asarray(rng.standard_normal(im_size + (2,)), F64)

    def loss(plan, s, kk):
        return jnp.sum((nf.nufft_adjoint(plan, s, kk) - tgt) ** 2)

    gs_g, gk_g = jax.grad(lambda s, kk: loss(pg, s, kk),
                          argnums=(0, 1))(y, k)
    gs_p, gk_p = jax.grad(lambda s, kk: loss(pp, s, kk),
                          argnums=(0, 1))(y, k)
    rel = float(jnp.abs(gs_g - gs_p).max() / jnp.abs(gs_g).max())
    assert rel < 1e-4, rel
    rel = float(jnp.abs(gk_g - gk_p).max() / jnp.abs(gk_g).max())
    assert rel < 1e-4, rel


def test_mesh_sharded_parity():
    r"""Sample-sharded NUFFT on the 8-virtual-device mesh must match
    the unsharded operators bit-for-bit-ish (1e-12): df-free and
    time-segmented, forward and adjoint, with an nT that does NOT
    divide the mesh extent (exercises the zero-padding)."""
    from mrphy_tpu.parallel import make_mesh
    rng = np.random.default_rng(47)
    im_size, fov = (12, 10), (24.0, 20.0)
    _, img = _grid_problem(rng, im_size, fov)
    nT, dt = 101, 1e-5                                # 101 % 8 != 0
    k = _ktraj(rng, 2, im_size, fov, nT=nT)[:2]
    y = jnp.asarray(rng.standard_normal((nT, 2)), F64)
    dfg = jnp.asarray(rng.uniform(-60, 60, im_size), F64)
    t2g = jnp.asarray(rng.uniform(0.01, 0.05, im_size), F64)
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)
    mesh = make_mesh()

    for kw in ({}, dict(df=dfg, T2s=t2g, dt=dt, nseg=5)):
        s0 = nf.nufft(plan, img, k, **kw)
        s1 = nf.nufft(plan, img, k, mesh=mesh, **kw)
        assert float(jnp.abs(s0 - s1).max()) < 1e-12, kw.keys()
        x0 = nf.nufft_adjoint(plan, y, k, **kw)
        x1 = nf.nufft_adjoint(plan, y, k, mesh=mesh, **kw)
        assert float(jnp.abs(x0 - x1).max()) < 1e-12, kw.keys()


def test_spincube_acquire_nufft_backend():
    r"""``SpinCube.acquire(backend='nufft')`` vs the exact backend:
    full chain through the object model — multi-coil, off-resonance +
    T2* segmentation, a singleton z axis dropped from the plan, and a
    nonzero ofst (including on the dropped axis) carried as the exact
    sample phase."""
    from mrphy_tpu import dt0
    from mrphy_tpu.models.mobjs import SpinCube
    rng = np.random.default_rng(53)
    n, fov = 12, 24.0
    cube = SpinCube((1, n, n, 1),
                    jnp.asarray([[fov, fov, 1.0]], F64),
                    ofst=jnp.asarray([[1.5, -2.0, 3.0]], F64),
                    T1=jnp.asarray(1.0, F64), T2=jnp.asarray(0.08, F64))
    nM = n * n
    M = jnp.asarray(rng.standard_normal((1, nM, 3)), F64)
    object.__setattr__(cube._spinarray, 'M_', M)
    cube.df_ = jnp.asarray(rng.uniform(-40, 40, (1, nM)), F64)
    T2s_ = jnp.asarray(rng.uniform(0.02, 0.06, (1, nM)), F64)
    sens_ = jnp.asarray(rng.standard_normal((1, nM, 2, 3)), F64)
    gr = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 3, 300)), F64)
    gr = gr.at[:, 2].set(0.0)                     # in-plane readout
    s0 = cube.acquire(gr, sens_=sens_, T2s_=T2s_, dt=dt0)
    s1 = cube.acquire(gr, sens_=sens_, T2s_=T2s_, dt=dt0,
                      backend='nufft', width=6, nseg=16)
    rel = float(jnp.linalg.norm(s1 - s0) / jnp.linalg.norm(s0))
    assert rel < 1e-3, rel                        # segmentation-limited

    # no-df/no-T2s path (pure gridding, no segmentation): tighter
    cube2 = SpinCube((1, n, n, 1),
                     jnp.asarray([[fov, fov, 1.0]], F64),
                     ofst=jnp.asarray([[1.5, -2.0, 3.0]], F64),
                     T1=jnp.asarray(1.0, F64),
                     T2=jnp.asarray(0.08, F64))
    object.__setattr__(cube2._spinarray, 'M_', M)
    s0 = cube2.acquire(gr, sens_=sens_, dt=dt0)
    s1 = cube2.acquire(gr, sens_=sens_, dt=dt0, backend='nufft',
                       width=6)
    rel = float(jnp.linalg.norm(s1 - s0) / jnp.linalg.norm(s0))
    assert rel < 5e-5, rel


def test_plan_is_jittable_pytree():
    rng = np.random.default_rng(37)
    im_size, fov = (8, 8), (16.0, 16.0)
    _, img = _grid_problem(rng, im_size, fov)
    k = _ktraj(rng, 2, im_size, fov, nT=17)[:2]
    plan = nf.nufft_plan(im_size, fov, width=4, dtype=F64)

    @jax.jit
    def f(plan, img, k):
        return nf.nufft(plan, img, k)

    s = f(plan, img, k)
    assert float(jnp.abs(s - nf.nufft(plan, img, k)).max()) < 1e-12
