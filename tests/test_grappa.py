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


# ------------------------------------------------------------------
# Split-slice GRAPPA (SMS)
# ------------------------------------------------------------------

def _sms_problem(n=48, nc=8, nsl=2, noise=1e-4):
    r"""Per-slice phantoms with distinct structure; coils rotate with
    slice so the collapsed problem is separable."""
    rng = np.random.default_rng(11)
    ksps, kcs = [], []
    for s in range(nsl):
        y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
        if s % 2 == 0:
            mag = ((x / 0.7) ** 2 + (y / 0.9) ** 2 < 1).astype(float)
            mag += 0.5 * ((x - 0.25) ** 2 + y ** 2 < 0.05)
        else:
            mag = (np.abs(x) < 0.6) * (np.abs(y) < 0.6) * 1.0
            mag += 0.4 * ((x + 0.2) ** 2 + (y - 0.2) ** 2 < 0.07)
        obj = mag * np.exp(1j * (0.6 * x - 0.3 * y + 0.2 * s))
        S = []
        for c in range(nc):
            # slices at different z see rotated, wider, re-phased
            # coil patterns — the physical basis of SMS separability
            a = 2 * np.pi * (c + 0.5 * s) / nc
            m = np.exp(-((x - 1.3 * np.cos(a)) ** 2
                         + (y - 1.3 * np.sin(a)) ** 2) / (2.0 + 1.5 * s))
            S.append(m * np.exp(1j * (0.4 + 0.25 * s)
                                * (x * np.sin(a) - y * np.cos(a))))
        kc = _cfft(np.stack(S) * obj[None])
        kc = kc + noise * (rng.standard_normal(kc.shape)
                           + 1j * rng.standard_normal(kc.shape))
        kcs.append(kc)
        ksps.append(np.stack([kc.real, kc.imag], -1))
    return np.stack(ksps), np.stack(kcs)            # (nsl,nC,n,n,[2])


def _sms_recon_err(ksps, kcs, shifts):
    from mrphy_tpu.utils.grappa import sg_weights, sg_apply
    nsl, nC, n = ksps.shape[:3]
    cs = 24
    sl = (slice(None), slice(None),
          slice(n // 2 - cs // 2, n // 2 + cs // 2),
          slice(n // 2 - cs // 2, n // 2 + cs // 2))
    W = sg_weights(ksps[sl], shifts=shifts)
    # collapsed acquisition: sum of blip-shifted slice k-spaces. The
    # ramp is written out EXPLICITLY in the physical convention — a
    # kz_m = m·f/z_s blip imprints e^{−i2π m f} under the package's
    # e^{−i2π k·x} encoding sign — independent of the library helper,
    # so a sign regression there fails here (it did once, invisible
    # at nsl=2 where (−1)^m is self-conjugate).
    if shifts is None:
        coll_c = kcs.sum(0)
    else:
        m = np.arange(n) - n // 2
        coll_c = sum(kcs[s] * np.exp(-2j * np.pi * m * (s / nsl)
                                     )[None, :, None]
                     for s in range(nsl))
    coll = np.stack([coll_c.real, coll_c.imag], -1)
    out = np.asarray(sg_apply(jnp.asarray(coll), jnp.asarray(W),
                              shifts=shifts))
    rels = []
    for s in range(nsl):
        rc = out[s, ..., 0] + 1j * out[s, ..., 1]
        rels.append(np.linalg.norm(_rss(rc) - _rss(kcs[s]))
                    / np.linalg.norm(_rss(kcs[s])))
    return rels


@pytest.mark.parametrize('nsl,shifts,tol',
                         [(2, None, 0.12), (2, 'auto', 0.05),
                          (3, 'auto', 0.09)],
                         ids=['plain', 'caipi', 'caipi3'])
def test_sms_separation(nsl, shifts, tol):
    r"""Plain (unshifted) SMS separation is intrinsically limited by
    in-plane coil variation alone (~8% here — this is WHY CAIPIRINHA
    exists); with FOV/nsl interslice shifts the same kernels separate
    to a few %. nsl=3 exercises non-self-conjugate ramps (the case
    that pins the blip sign)."""
    ksps, kcs = _sms_problem(nsl=nsl)
    for s, rel in enumerate(_sms_recon_err(ksps, kcs, shifts)):
        assert rel < tol, (shifts, s, rel)


def test_sms_array_shifts_match_list():
    r"""Regression: a numpy-array ``shifts`` used to raise (ambiguous
    truth value in the ``== 'auto'`` comparison); arrays must behave
    exactly like the equivalent list."""
    ksps, kcs = _sms_problem()
    nsl = ksps.shape[0]
    fs = [s / nsl for s in range(nsl)]
    r_list = _sms_recon_err(ksps, kcs, fs)
    r_arr = _sms_recon_err(ksps, kcs, np.asarray(fs))
    np.testing.assert_allclose(r_arr, r_list, rtol=0, atol=0)


def test_caipi_beats_plain():
    ksps, kcs = _sms_problem()
    plain = max(_sms_recon_err(ksps, kcs, None))
    caipi = max(_sms_recon_err(ksps, kcs, 'auto'))
    assert caipi < plain / 2, (caipi, plain)


def test_sms_leakage_blocking():
    r"""Feed sg_apply a 'collapsed' k-space containing ONLY slice 1:
    the slice-0 output must be near-silent (the sp-sg fit maps other
    slices' data to zero by construction)."""
    from mrphy_tpu.utils.grappa import sg_weights, sg_apply
    ksps, kcs = _sms_problem()
    nsl, nC, n = ksps.shape[:3]
    cs = 24
    sl = (slice(None), slice(None),
          slice(n // 2 - cs // 2, n // 2 + cs // 2),
          slice(n // 2 - cs // 2, n // 2 + cs // 2))
    W = sg_weights(ksps[sl])
    out = np.asarray(sg_apply(jnp.asarray(ksps[1]), jnp.asarray(W)))
    r0 = out[0, ..., 0] + 1j * out[0, ..., 1]
    r1 = out[1, ..., 0] + 1j * out[1, ..., 1]
    leak = np.linalg.norm(r0) / np.linalg.norm(kcs[1])
    keep = np.linalg.norm(r1) / np.linalg.norm(kcs[1])
    assert leak < 0.15, leak           # unshifted frame: best-effort
    assert keep > 0.9, keep
    assert leak < keep / 6, (leak, keep)
