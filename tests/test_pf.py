r"""POCS partial-Fourier tests: the filled k-space must preserve the
acquired rows bit-for-bit, clearly beat zero-filling in image
magnitude at several partial fractions, be near-exact for a REAL
image (where conjugate symmetry is exact), and degrade gracefully as
the fraction shrinks."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrphy_tpu.utils.pf import pocs_pf


def _cfft(x, axes=(0, 1)):
    return np.fft.fftshift(np.fft.fftn(
        np.fft.ifftshift(x, axes=axes), axes=axes), axes=axes)


def _img(k):
    return np.fft.fftshift(np.fft.ifftn(
        np.fft.ifftshift(k, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1))


def _problem(n=64, nc=3, phase=True):
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    mag = ((x / 0.8) ** 2 + (y / 0.9) ** 2 < 1).astype(float)
    mag += 0.4 * ((x - 0.2) ** 2 + y ** 2 < 0.05)
    obj = mag * (np.exp(1j * (0.5 * x + 0.3 * y * y)) if phase
                 else 1.0)
    ims = [obj * np.exp(-((x - 0.8 * np.cos(2 * np.pi * c / nc)) ** 2
                          + (y - 0.8 * np.sin(2 * np.pi * c / nc)) ** 2)
                        / 3.0) for c in range(nc)]
    kcs = np.stack([_cfft(im) for im in ims])
    return np.stack([kcs.real, kcs.imag], -1), kcs


def _errs(ksp_full, kcs, nacq, iters=10):
    und = ksp_full.copy()
    und[:, nacq:] = 0
    rec = np.asarray(pocs_pf(jnp.asarray(und), nacq, iters))
    assert np.array_equal(rec[:, :nacq], ksp_full[:, :nacq])
    rc = rec[..., 0] + 1j * rec[..., 1]
    uc = und[..., 0] + 1j * und[..., 1]
    ref = np.abs(_img(kcs))
    e = np.linalg.norm(np.abs(_img(rc)) - ref) / np.linalg.norm(ref)
    e0 = np.linalg.norm(np.abs(_img(uc)) - ref) / np.linalg.norm(ref)
    return e, e0


@pytest.mark.parametrize('pf,tol', [(0.5625, 0.02), (0.625, 0.012),
                                    (0.75, 0.008)])
def test_beats_zero_filling(pf, tol):
    ksp, kcs = _problem()
    n = kcs.shape[1]
    e, e0 = _errs(ksp, kcs, int(pf * n))
    assert e < tol, (pf, e)
    assert e < e0 / 4, (pf, e, e0)


def test_real_image_near_exact():
    r"""For a real image conjugate symmetry holds exactly; with the
    Hann-apodized phase estimate POCS recovers the missing rows to
    numerical noise."""
    ksp, kcs = _problem(phase=False)
    n = kcs.shape[1]
    e, e0 = _errs(ksp, kcs, int(0.5625 * n), iters=15)
    assert e < 1e-4, e
    assert e < e0 / 100, (e, e0)


def test_bad_nacq_rejected():
    ksp, _ = _problem(n=32, nc=1)
    with pytest.raises(AssertionError):
        pocs_pf(jnp.asarray(ksp), 16)     # must exceed ny//2
