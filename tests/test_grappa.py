r"""GRAPPA tests: kernels fitted from a central ACS block must
synthesize the missing lines of a uniformly undersampled Cartesian
multi-coil k-space to ~1% (R=2) on smooth-coil data, acquired lines
must pass through untouched, the apply must be jittable, and
undersized ACS blocks must be rejected. Data is built with the same
centered-DFT convention :func:`mrphy_tpu.utils.coils.espirit_maps`
pins against the exact acquisition operator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrphy_tpu.utils.grappa import grappa_weights, grappa_apply


def _cfft(x, axes=(1, 2)):
    return np.fft.fftshift(np.fft.fftn(
        np.fft.ifftshift(x, axes=axes), axes=axes), axes=axes)


def _problem(n=64, nc=8, noise=1e-4, seed=5):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    mag = ((x / 0.8) ** 2 + (y / 0.9) ** 2 < 1).astype(float)
    mag += 0.4 * (((x - 0.2) / 0.3) ** 2 + (y / 0.4) ** 2 < 1)
    obj = mag * np.exp(1j * (0.8 * x + 0.5 * y * y))
    S = []
    for c in range(nc):
        a = 2 * np.pi * c / nc
        m = np.exp(-((x - 1.3 * np.cos(a)) ** 2
                     + (y - 1.3 * np.sin(a)) ** 2) / 2.2)
        S.append(m * np.exp(1j * 0.5 * (x * np.sin(a)
                                        - y * np.cos(a))))
    ksp_c = _cfft(np.stack(S) * obj[None])
    ksp_c = ksp_c + noise * (rng.standard_normal(ksp_c.shape)
                             + 1j * rng.standard_normal(ksp_c.shape))
    return np.stack([ksp_c.real, ksp_c.imag], -1), ksp_c


def _undersample(ksp, R):
    und = ksp.copy()
    for r in range(1, R):
        und[:, r::R] = 0
    return und


def _rss(kc):
    img = np.fft.fftshift(np.fft.ifftn(
        np.fft.ifftshift(kc, axes=(1, 2)), axes=(1, 2)), axes=(1, 2))
    return np.sqrt((np.abs(img) ** 2).sum(0))


@pytest.mark.parametrize('R,tol', [(2, 0.02), (3, 0.03)])
def test_recovers_missing_lines(R, tol):
    ksp, ksp_c = _problem()
    n = ksp.shape[1]
    cs = 24
    calib = ksp[:, n // 2 - cs // 2:n // 2 + cs // 2,
                n // 2 - cs // 2:n // 2 + cs // 2]
    W = grappa_weights(calib, R)
    und = _undersample(ksp, R)
    rec = np.asarray(grappa_apply(jnp.asarray(und), jnp.asarray(W), R))
    # acquired rows bit-identical
    assert np.array_equal(rec[:, ::R], und[:, ::R])
    rc = rec[..., 0] + 1j * rec[..., 1]
    rel = (np.linalg.norm(_rss(rc) - _rss(ksp_c))
           / np.linalg.norm(_rss(ksp_c)))
    assert rel < tol, (R, rel)
    # and it clearly beats zero-filling
    uc = und[..., 0] + 1j * und[..., 1]
    rel0 = (np.linalg.norm(_rss(uc) - _rss(ksp_c))
            / np.linalg.norm(_rss(ksp_c)))
    assert rel < rel0 / 10, (rel, rel0)


def test_apply_is_jittable():
    ksp, _ = _problem(n=32, nc=4)
    n = ksp.shape[1]
    calib = ksp[:, n // 2 - 12:n // 2 + 12, n // 2 - 12:n // 2 + 12]
    W = jnp.asarray(grappa_weights(calib, 2))
    und = jnp.asarray(_undersample(ksp, 2))
    eager = grappa_apply(und, W, 2)
    jitted = jax.jit(grappa_apply, static_argnums=2)(und, W, 2)
    assert float(jnp.abs(eager - jitted).max()) < 1e-10


def test_undersized_acs_rejected():
    ksp, _ = _problem(n=32, nc=4)
    with pytest.raises(AssertionError):
        grappa_weights(ksp[:, :6, :24], 2)        # rows < kernel span
    with pytest.raises(AssertionError):
        grappa_weights(ksp[:, :24, :3], 2)        # cols < nsx
