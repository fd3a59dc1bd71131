r"""Receive-array utilities: SVD coil compression and noise handling.

Calibration-time helpers around the acquisition operator
(:mod:`mrphy_tpu.ops.signal`). Everything here keeps the framework's
real re/im-pair convention — the ``(..., xy, nC)`` shape rule of
``b1Map_``/``sens`` — because complex dtypes are unsupported on some
TPU runtimes; the two *matrix factorizations* (SVD, Cholesky) run on
the host in numpy (one-off calibration work, like the trajectory
generators), while the *applications* (:func:`apply_ccmat`,
:func:`add_noise`) are jittable jnp ops usable inside reconstruction /
design graphs.

The reference framework has no acquisition stage (SURVEY §2), so no
parity target exists; conventions follow the standard SENSE/SCC
literature (geometric/SVD coil compression; noise pre-whitening by the
inverse Cholesky factor of the noise covariance).
"""

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['coil_compress', 'apply_ccmat', 'noise_whiten_mat',
           'add_noise', 'adaptive_maps', 'espirit_maps',
           'gfactor_sense', 'gfactor_replica', 'replica_std']


def _to_complex(x):
    x = np.asarray(x)
    assert x.shape[-2] == 2, f're/im axis expected at -2, got {x.shape}'
    return x[..., 0, :] + 1j * x[..., 1, :]


def _to_pairs(z):
    return np.stack([z.real, z.imag], axis=-2)


def coil_compress(calib, ncc: int) -> Tuple[np.ndarray, np.ndarray]:
    r"""SVD (SCC) coil compression from calibration data.

    Inputs:
        - ``calib``: `(..., xy, nC)` re/im calibration samples — e.g.
          the sensitivity maps themselves (``sens.reshape(-1, 2, nC)``
          semantics; leading axes are flattened) or ACS k-space lines.
        - ``ncc``: number of virtual coils to keep.
    Outputs:
        - ``W``: `(xy, nC, ncc)` re/im compression matrix (columns =
          dominant right-singular vectors of the calibration matrix).
        - ``energy``: `(nC,)` normalized singular-value energy
          (``energy[:ncc].sum()`` = fraction captured).

    Host-side numpy (complex SVD); apply with :func:`apply_ccmat` to
    ``sens`` AND to acquired signals `(N, nC, nT, 2)` — compression
    commutes with the (linear-in-``sens``) acquisition operator, so
    compressed-then-acquired equals acquired-then-compressed exactly
    (asserted in ``tests/test_coils.py``).
    """
    X = _to_complex(calib).reshape(-1, np.asarray(calib).shape[-1])
    nC = X.shape[-1]
    assert 1 <= ncc <= nC, (ncc, nC)
    _, s, Vh = np.linalg.svd(X, full_matrices=False)
    W = Vh.conj().T[:, :ncc]                     # (nC, ncc)
    energy = (s ** 2) / max((s ** 2).sum(), 1e-30)
    energy = np.pad(energy, (0, nC - energy.size))
    return np.stack([W.real, W.imag], 0), energy


def apply_ccmat(x, W, *, axis: int = -1):
    r"""Apply a compression/whitening matrix along the coil axis.

    Inputs:
        - ``x``: array with a coil axis at ``axis`` and an re/im pair
          axis somewhere — supported layouts: ``sens`` `(..., xy, nC)`
          (``axis=-1``, pairs at -2) and signals `(N, nC, nT, xy)`
          (``axis=1``, pairs at -1).
        - ``W``: `(xy, nC, k)` re/im matrix from :func:`coil_compress`
          / :func:`noise_whiten_mat`.
    Outputs:
        - ``x``: same layout with the coil axis of size ``k``.

    Jittable (real arithmetic): ``y = x @ W`` in the complex sense.
    """
    x = jnp.asarray(x)
    W = jnp.asarray(W, x.dtype)
    wr, wi = W[0], W[1]
    mm = lambda a, b: jnp.matmul(a, b, precision='highest')  # noqa: E731
    ax = axis % x.ndim
    if ax == x.ndim - 1:                     # (..., xy, nC), pairs at -2
        xr, xi = x[..., 0, :], x[..., 1, :]
        return jnp.stack([mm(xr, wr) - mm(xi, wi),
                          mm(xr, wi) + mm(xi, wr)], axis=-2)
    # coil axis elsewhere (e.g. signals (N, nC, nT, xy), pairs at -1)
    xm = jnp.moveaxis(x, ax, -1)
    xr, xi = xm[..., 0, :], xm[..., 1, :]    # pairs now at -2 after move
    y = jnp.stack([mm(xr, wr) - mm(xi, wi),
                   mm(xr, wi) + mm(xi, wr)], axis=-2)
    return jnp.moveaxis(y, -1, ax)


def noise_whiten_mat(Psi) -> np.ndarray:
    r"""Noise pre-whitening matrix from a coil noise covariance.

    Inputs:
        - ``Psi``: `(xy, nC, nC)` re/im Hermitian noise covariance
          (estimate as ``E[n nᴴ]`` from noise-only samples).
    Outputs:
        - ``W``: `(xy, nC, nC)` re/im with ``W = L⁻ᵀ`` for
          ``Psi = L Lᴴ`` — under :func:`apply_ccmat`'s row convention
          ``y = x·W`` this is ``y = L⁻¹·x``, making the effective noise
          identity-covariance (the SENSE-optimal metric), asserted
          statistically in tests. Apply the SAME ``W`` to signals and
          sensitivities.
    """
    P = np.asarray(Psi)[0] + 1j * np.asarray(Psi)[1]
    L = np.linalg.cholesky(P)
    W = np.linalg.inv(L).T                      # row conv: y = L^-1 x
    return np.stack([W.real, W.imag], 0)


def add_noise(key, s, sigma, Psi=None):
    r"""Synthesize complex receiver noise on a signal.

    Inputs:
        - ``key``: ``jax.random`` key; ``s``: `(N, nC, nT, 2)` signal.
        - ``sigma``: per-channel std of the re/im components.
        - ``Psi``: optional `(xy, nC, nC)` coil covariance — noise is
          colored as ``L n`` with ``Psi = L Lᴴ`` (host Cholesky).
    Outputs:
        - noisy signal, same shape. Jittable for ``Psi=None``.
    """
    s = jnp.asarray(s)
    n = sigma * jax.random.normal(key, s.shape, s.dtype)
    if Psi is not None:
        P = np.asarray(Psi)[0] + 1j * np.asarray(Psi)[1]
        L = np.linalg.cholesky(P)
        # row convention y = x·W colors as L·n when W = Lᵀ
        Lt = np.stack([L.T.real, L.T.imag], 0)
        n = apply_ccmat(n, jnp.asarray(Lt, s.dtype), axis=1)
    return s + n


def espirit_maps(calib, im_size, *, kernel: int = 6,
                 thresh_sv: float = 0.02, crop: float = 0.0):
    r"""ESPIRiT coil-sensitivity maps from a Cartesian calibration
    (ACS) block [Uecker et al., MRM 71(3):990, 2014] — the subspace
    companion to :func:`adaptive_maps` (Walsh): instead of local
    covariance averaging, the maps are the per-voxel dominant
    eigenvectors of the calibration-matrix row-space operator, which
    additionally yields an **eigenvalue map** ≈ 1 exactly where the
    data is consistent with a single smooth sensitivity pattern (the
    standard support/crop criterion).

    Convention: ``calib`` is the centered ACS block of the Cartesian
    spectrum under this package's encoding sign, ``s(k) = Σ_j w_j
    e^{−i2π k·x_j}`` (:mod:`mrphy_tpu.ops.signal`) — i.e. the centered
    DFT ``fftshift(fftn(ifftshift(img)))`` of the coil images, or a
    gridded/Cartesian readout of them.

    Algorithm (host numpy — one-off calibration work, per the module
    policy; complex is fine on the host):
    block-Hankel matrix A of all ``kernel^d`` sliding windows → SVD →
    row-space kernels (σ ≥ ``thresh_sv``·σ₀) → zero-padded centered
    inverse DFT (scale ``N/√K``) → per-voxel ``nC×nC`` Hermitian
    ``GᴴG`` eigendecomposition; maps = conj of the top eigenvector
    (convention pinned by the recovery test against known smooth
    maps), phase-anchored to the strongest coil like
    :func:`adaptive_maps`.

    Inputs:
        - ``calib``: `(nC, c_1, …, c_d, 2)` re/im centered ACS block.
        - ``im_size``: `(n_1, …, n_d)` output grid.
    Optionals:
        - ``kernel``: window side W (6 is the literature default).
        - ``thresh_sv``: row-space singular-value cutoff (relative).
        - ``crop``: zero the maps where the eigenvalue < ``crop``
          (0 = no crop; 0.9 is a common choice).
    Outputs:
        - ``maps``: `(n_1, …, n_d, 2, nC)` unit-norm maps (the
          ``sens_``-style trailing layout, like :func:`adaptive_maps`).
        - ``lam``: `(n_1, …, n_d)` top-eigenvalue map (∈ [0, 1]).
    """
    calib = np.asarray(calib)
    assert calib.shape[-1] == 2, f'expected (nC, c…, 2), {calib.shape}'
    C = calib[..., 0] + 1j * calib[..., 1]        # (nC, c…)
    nC = C.shape[0]
    cshape = C.shape[1:]
    d = len(cshape)
    im_size = tuple(int(n) for n in im_size)
    assert len(im_size) == d, (im_size, cshape)
    ks = (int(kernel),) * d
    assert all(c >= k for c, k in zip(cshape, ks)), (cshape, ks)
    assert all(n >= k for n, k in zip(im_size, ks)), (im_size, ks)

    # block-Hankel of sliding windows → row-space kernels
    win = np.lib.stride_tricks.sliding_window_view(
        C, ks, axis=tuple(range(1, 1 + d)))
    win = np.moveaxis(win, 0, -1)                 # (w…, k…, nC)
    A = win.reshape(-1, int(np.prod(ks)) * nC)
    _, s, Vh = np.linalg.svd(A, full_matrices=False)
    nk = max(1, int((s >= thresh_sv * s[0]).sum()))
    kerns = Vh[:nk].reshape((nk,) + ks + (nC,))   # (nk, k…, nC)

    # zero-pad centered, inverse centered DFT, scale N/√K
    N, K = int(np.prod(im_size)), int(np.prod(ks))
    kpad = np.zeros((nk,) + im_size + (nC,), complex)
    sl = (slice(None),) + tuple(
        slice(n // 2 - k // 2, n // 2 - k // 2 + k)
        for n, k in zip(im_size, ks)) + (slice(None),)
    kpad[sl] = kerns
    axes = tuple(range(1, 1 + d))
    G = np.fft.fftshift(np.fft.ifftn(
        np.fft.ifftshift(kpad, axes=axes), axes=axes),
        axes=axes) * (N / np.sqrt(K))             # (nk, n…, nC)

    # per-voxel GᴴG (nC×nC Hermitian), top eigenpair
    Gq = np.moveaxis(G, 0, -2)                    # (n…, nk, nC)
    M = np.einsum('...ic,...ie->...ce', Gq.conj(), Gq)
    w, v = np.linalg.eigh(M)
    lam = np.clip(w[..., -1].real, 0.0, None)
    m = v[..., -1].conj()                         # (n…, nC)

    # phase-anchor to the strongest coil (cf. adaptive_maps)
    ref = int(np.argmax((np.abs(m) ** 2).reshape(-1, nC).sum(0)))
    ph = m[..., ref] / np.maximum(np.abs(m[..., ref]), 1e-30)
    m = m * ph.conj()[..., None]
    if crop > 0:
        m = m * (lam >= crop)[..., None]
    return np.stack([m.real, m.imag], -2), lam


def adaptive_maps(imgs, *, block: int = 5, iters: int = 40,
                  eps: float = 1e-12):
    r"""Receive-sensitivity maps from coil images — Walsh's adaptive
    method [Walsh, Gmitro & Marcellin, MRM 43(5):682, 2000]: per voxel,
    the principal eigenvector of the locally averaged coil covariance
    ``R(x) = Σ_{x'∈block} s(x') s(x')ᴴ`` IS the relative sensitivity
    vector (the object magnitude is rank-one locally). Phase is
    anchored to the strongest coil, so the maps are usable directly in
    SENSE (:mod:`mrphy_tpu.ops.signal` / CG recon) — estimated, not
    assumed.

    Fully jittable: the block average is a separable box filter
    (cumsum differences) over the ``nC²`` correlation images, and the
    eigenvector comes from fixed-count power iteration — no complex
    dtypes, no host eigendecompositions.

    Inputs:
        - ``imgs``: `(nC, n_1, …, n_d, 2)` coil images (re/im), e.g.
          low-resolution gridded calibration reconstructions.
    Optionals:
        - ``block``: box side (odd), voxels.
        - ``iters``: power iterations (the spectral gap is large where
          there is signal; 40 is far past convergence).
    Outputs:
        - ``maps``: `(n_1, …, n_d, 2, nC)` unit-norm sensitivity
          vectors (the ``sens_``-style trailing layout, batch-free).
    """
    imgs = jnp.asarray(imgs)
    assert block % 2 == 1, f'block must be odd, got {block}'
    nC = imgs.shape[0]
    d = imgs.ndim - 2
    xr, xi = imgs[..., 0], imgs[..., 1]                # (nC, n…)

    def box_filter(a, axis):
        n = a.shape[axis]
        h = block // 2
        c = jnp.cumsum(a, axis=axis)
        pad_lo = [(0, 0)] * a.ndim
        pad_lo[axis] = (h + 1, 0)
        pad_hi = [(0, 0)] * a.ndim
        pad_hi[axis] = (0, h)
        chi = jnp.pad(c, pad_hi, mode='edge')
        clo = jnp.pad(c, pad_lo)[tuple(
            slice(0, n) if ax == axis else slice(None)
            for ax in range(a.ndim))]
        hi = chi[tuple(slice(h, h + n) if ax == axis else slice(None)
                       for ax in range(a.ndim))]
        return hi - clo

    # nC x nC correlation images, box-averaged (upper triangle +
    # Hermitian fill)
    def corr(a, b):                        # Σ-ready a_i·b_j images
        return jnp.einsum('i...,j...->ij...', a, b,
                          precision='highest')

    Rr = corr(xr, xr) + corr(xi, xi)       # Re(s_i s_j^*)
    Ri = corr(xi, xr) - corr(xr, xi)       # Im(s_i s_j^*)
    for ax in range(2, 2 + d):
        Rr = box_filter(Rr, ax)
        Ri = box_filter(Ri, ax)

    # power iteration on the Hermitian (Rr + iRi) per voxel
    vr = jnp.ones((nC,) + imgs.shape[1:-1], imgs.dtype)
    vi = jnp.zeros_like(vr)

    def step(_, vv):
        vr, vi = vv
        wr = jnp.einsum('ij...,j...->i...', Rr, vr,
                       precision='highest') \
            - jnp.einsum('ij...,j...->i...', Ri, vi,
                         precision='highest')
        wi = jnp.einsum('ij...,j...->i...', Rr, vi,
                       precision='highest') \
            + jnp.einsum('ij...,j...->i...', Ri, vr,
                         precision='highest')
        nrm = jnp.sqrt((wr ** 2 + wi ** 2).sum(0, keepdims=True))
        nrm = jnp.maximum(nrm, eps)
        return wr / nrm, wi / nrm

    vr, vi = jax.lax.fori_loop(0, iters, step, (vr, vi))
    # anchor the per-voxel phase to the strongest coil (its map is
    # made real-positive), so maps vary smoothly like physical coils
    power = vr ** 2 + vi ** 2
    ref = jnp.argmax(power.sum(tuple(range(1, 1 + d))))   # global ref
    rr, ri = vr[ref], vi[ref]
    mag = jnp.sqrt(jnp.maximum(rr ** 2 + ri ** 2, eps))
    cr, ci = rr / mag, -ri / mag                       # conj(phase)
    mr = vr * cr - vi * ci
    mi = vr * ci + vi * cr
    return jnp.moveaxis(jnp.stack([mr, mi], -1), 0, -1)  # (n…, 2, nC)


def gfactor_sense(maps, R: int, *, axis: int = 0, Psi=None,
                  ridge: float = 1e-12):
    r"""Analytic SENSE geometry (g-) factor map for uniform Cartesian
    undersampling [Pruessmann et al., MRM 42(5):952, 1999, eq. 23]:

    .. math:: g_\rho = \sqrt{[(S^H \Psi^{-1} S)^{-1}]_{\rho\rho}
                             \,[S^H \Psi^{-1} S]_{\rho\rho}}

    where ``S`` stacks the coil sensitivities of the ``R`` pixels that
    alias onto each other (separation ``n/R`` along the accelerated
    axis). ``g ≥ 1`` is the *noise amplification of the unaliasing
    solve beyond the unavoidable* ``√R`` — the standard figure of merit
    for a coil array + acceleration choice (SNR_acc = SNR_full /
    (g·√R)), and the quantity :func:`gfactor_replica` estimates by
    Monte-Carlo for reconstructions with no analytic form (GRAPPA).

    The reference framework has no acquisition stage (SURVEY §2), so no
    parity target exists; validated against a direct complex-numpy
    evaluation of the formula and against :func:`gfactor_replica` on an
    explicit least-squares SENSE solve (``tests/test_coils.py``).

    Inputs:
        - ``maps``: `(n_1, …, n_d, xy, nC)` re/im sensitivity maps
          (the layout of :func:`espirit_maps` / :func:`adaptive_maps`).
        - ``R``: integer acceleration; ``n_axis % R == 0``.
    Optionals:
        - ``axis``: which spatial axis is undersampled (default 0).
        - ``Psi``: `(xy, nC, nC)` re/im coil noise covariance — maps
          are pre-whitened on the host (:func:`noise_whiten_mat`);
          omit if the data is already whitened. ``Psi=None`` keeps the
          whole computation jittable.
        - ``ridge``: relative Tikhonov floor making all-zero aliasing
          sets invertible (does not perturb active sets: a zero pixel
          contributes a zero row/column, decoupled from the rest).
    Outputs:
        - ``g``: `(n_1, …, n_d)` map; 1 where only one pixel of the
          set has support, 0 where ``maps`` has no support at all.

    The complex ``R×R`` set inversion runs in real arithmetic (complex
    dtypes are unsupported on some TPU runtimes) via the standard
    ``[[Re, −Im], [Im, Re]]`` embedding, whose inverse is the
    embedding of the complex inverse.
    """
    m = jnp.asarray(maps)
    assert m.ndim >= 3 and m.shape[-2] == 2, \
        f'expected (n…, xy, nC), got {m.shape}'
    if Psi is not None:
        m = apply_ccmat(m, jnp.asarray(noise_whiten_mat(Psi), m.dtype))
    d = m.ndim - 2
    ax = axis % d
    R = int(R)
    n = m.shape[ax]
    assert R >= 1 and n % R == 0, (R, n)
    m = jnp.moveaxis(m, ax, 0)                    # (n, rest…, xy, nC)
    rest = m.shape[1:-2]
    nC = m.shape[-1]
    m = m.reshape(R, n // R, *rest, 2, nC)        # pixels n/R apart alias
    Sr = jnp.moveaxis(m[..., 0, :], 0, -2)        # (n/R, rest…, R, nC)
    Si = jnp.moveaxis(m[..., 1, :], 0, -2)
    ein = functools.partial(jnp.einsum, precision='highest')
    # H = S* Sᵀ (Hermitian, (…, R, R)): H[a,b] = Σ_c conj(S[a,c]) S[b,c]
    Hr = ein('...ac,...bc->...ab', Sr, Sr) + ein('...ac,...bc->...ab',
                                                 Si, Si)
    Hi = ein('...ac,...bc->...ab', Sr, Si) - ein('...ac,...bc->...ab',
                                                 Si, Sr)
    diag = jnp.diagonal(Hr, axis1=-2, axis2=-1)   # (…, R) |s_ρ|²
    eye = jnp.eye(R, dtype=m.dtype)
    eps = ridge * jnp.mean(diag, -1, keepdims=True)[..., None] * eye \
        + jnp.asarray(1e-30, m.dtype) * eye
    # real embedding [[Hr, -Hi], [Hi, Hr]]; inv's top-left = Re(H⁻¹)
    M = jnp.concatenate([
        jnp.concatenate([Hr + eps, -Hi], -1),
        jnp.concatenate([Hi, Hr + eps], -1)], -2)
    Minv = jnp.linalg.inv(M)
    dinv = jnp.diagonal(Minv, axis1=-2, axis2=-1)[..., :R]  # Re diag
    g = jnp.sqrt(jnp.maximum(dinv * diag, 0.0))
    g = jnp.where(diag > 0, g, 0.0)               # no support → 0
    g = jnp.moveaxis(g, -1, 0).reshape(n, *rest)  # undo set grouping
    return jnp.moveaxis(g, 0, ax)


def replica_std(recon, shape, *, n: int = 300, key=None, sigma: float = 1.0,
                Psi=None, dtype=jnp.float32):
    r"""Pixelwise noise std of a linear reconstruction by pseudo
    multiple replicas [Robson et al., MRM 60(4):895, 2008]: feed ``n``
    iid noise-only inputs through ``recon`` and return the per-output-
    element standard deviation (Welford accumulation, host numpy — the
    recon itself may be host-side, e.g. GRAPPA weight solves).

    Inputs:
        - ``recon``: callable, noise array of ``shape`` → image-domain
          array (any shape); must be LINEAR (zero maps to zero) for the
          returned std to be the recon's noise propagation.
        - ``shape``: input noise shape — include the re/im pair axis
          if the recon expects pairs; each element gets iid
          ``N(0, sigma²)``.
    Optionals:
        - ``n``: replica count (std-of-std ≈ ``1/√(2n)`` relative).
        - ``key``: ``jax.random`` key (default ``PRNGKey(0)``).
        - ``Psi``: optional `(xy, nC, nC)` covariance; the noise is
          colored as in :func:`add_noise` — ``shape`` must then be the
          signal layout `(N, nC, nT, xy)`.
    Outputs:
        - ``std``: numpy array, the recon's output shape.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    mean = m2 = None
    for i in range(int(n)):
        key, sub = jax.random.split(key)
        noise = sigma * jax.random.normal(sub, tuple(shape), dtype)
        if Psi is not None:
            noise = add_noise(sub, jnp.zeros(tuple(shape), dtype),
                              sigma, Psi=Psi)
        x = np.asarray(recon(noise))
        if mean is None:
            mean, m2 = np.zeros_like(x), np.zeros_like(x)
        delta = x - mean
        mean += delta / (i + 1)
        m2 += delta * (x - mean)
    return np.sqrt(m2 / max(int(n) - 1, 1))


def gfactor_replica(recon_accel, recon_full, shape, R: int, *,
                    n: int = 300, key=None, Psi=None,
                    dtype=jnp.float32, eps: float = 1e-30):
    r"""Monte-Carlo g-factor map for an arbitrary linear recon pair
    (e.g. GRAPPA, CG-SENSE, compressed coils) by the pseudo-replica
    identity ``SNR_acc = SNR_full / (g·√R)``:

    .. math:: g = \frac{\sigma_{acc}}{\sigma_{full}\,\sqrt{R}}

    Both recons receive noise-only inputs of the SAME ``shape`` (the
    fully-sampled signal layout) — the accelerated recon is expected to
    use only its sampled subset internally (undersampling a white
    input stays white, so generating the full array for both keeps the
    contract simple). Matches :func:`gfactor_sense` on an explicit
    least-squares SENSE solve (``tests/test_coils.py``).

    Inputs/optionals: as :func:`replica_std`, with ``recon_accel`` /
    ``recon_full`` the R-fold-undersampled and fully-sampled recons
    (both must combine coils the same way) and ``R`` the acceleration.
    Outputs:
        - ``g``: numpy array, the recons' output shape; 0 where the
          full recon has no noise response (outside support).
    """
    key = jax.random.PRNGKey(1) if key is None else key
    ka, kf = jax.random.split(key)
    sd_a = replica_std(recon_accel, shape, n=n, key=ka, Psi=Psi,
                       dtype=dtype)
    sd_f = replica_std(recon_full, shape, n=n, key=kf, Psi=Psi,
                       dtype=dtype)
    g = sd_a / (np.sqrt(float(R)) * np.maximum(sd_f, eps))
    return np.where(sd_f > eps, g, 0.0)
