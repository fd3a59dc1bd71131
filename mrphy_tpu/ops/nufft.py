r"""Gridding NUFFT (types 1/2) and Toeplitz normal operator — on the MXU.

:mod:`mrphy_tpu.ops.signal` is the *exact* encoding operator: O(nM·nT)
per application, the right tool for per-spin off-resonance/decay and for
oracle-grade recon at moderate sizes. This module is its fast companion
for **grid-resident** magnetization (a :class:`~mrphy_tpu.models.mobjs.
SpinCube`): the classic Kaiser–Bessel gridding NUFFT [Beatty et al.,
IEEE TMI 24(6):799, 2005; Fessler & Sutton, IEEE TSP 51(2):560, 2003],
O(G^d log-free + nT·W^d), plus the Toeplitz embedding of the normal
operator ``AᴴA`` [Fessler et al., IEEE TSP 53(9):3393, 2005] that makes
CG-SENSE iterations trajectory-independent.

TPU-native design decisions:

- **No complex dtypes, no FFT.** Complex is UNIMPLEMENTED on this TPU
  runtime, and at MRI grid sizes (n ≤ 512 per axis) the uniform-grid
  DFT stage is cast as per-axis ``(G, n)`` **real-pair matmuls on the
  MXU** (4 real matmuls per complex one, ``precision=HIGHEST``): a
  dense separable DFT is a handful of large matmuls — exactly the
  shape the systolic array wants — and is exact (no twiddle-factor
  rounding cascade). The d-dim transform is ``d`` einsums.
- **Gather/scatter interpolation** with *wrapped* (mod-G) indices —
  exact, because the DFT grid is periodic — and separable per-axis
  Kaiser–Bessel weights evaluated in-graph (I₀ via the Abramowitz &
  Stegun 9.8.1/9.8.2 polynomials), so the sample stage is
  differentiable w.r.t. the image, the samples, AND the trajectory.
- **MXU interpolation for d ≤ 2** (``interp='matmul'``, the default
  there): XLA's TPU gather/scatter serializes per element, so the
  sample stage is instead cast as *dense one-hot per-axis matmuls* —
  the W-sparse per-axis KB rows are expanded to dense ``(chunk, G_a)``
  factors (W fused compare-selects, no scatter) and the separable
  interpolation becomes ``s = rowsum((W_y @ grid) ⊙ W_x)``, one MXU
  matmul per chunk; the adjoint is ``grid = W_yᵀ @ (s ⊙ W_x)`` — a
  matmul instead of a serialized `.at[].add` scatter. Value-identical
  to the gather path up to float sum order (asserted in the tests);
  the O(nT·G_y·G_x) flops ride the MXU, which is exactly the trade
  the systolic array wants at MRI grid sizes. 3-D keeps gather
  (the dense-factor trick would cost nT·G³).
- **Adjoint = exact transpose.** :func:`nufft_adjoint` scatters with
  the same weights the forward gathers with, so ``⟨Ax, y⟩ = ⟨x, Aᴴy⟩``
  holds to float roundoff (asserted in ``tests/test_nufft.py``), and
  the pair composes into exact normal equations for CG.
- **Toeplitz kernel computed exactly** (not by gridding): the PSF
  ``h(r) = Σ_t w_t e^{+i2π Σ_a u_{a,t} r_a / n_a}`` on the doubled grid
  is one ``(2n, nT) @ (nT, 2n)``-shaped chunked contraction — again
  MXU matmuls — so :func:`toeplitz_apply` carries *zero* gridding
  error of its own.

Conventions match :func:`mrphy_tpu.ops.signal.signal` exactly
(validated side-by-side in the tests): spin locations are the SpinCube
grid ``x_j = fov·(j − n//2)/n`` (reference ``mobjs.py:815-839`` grid
rule), ``ktraj`` is in "cycle/cm" (:func:`mrphy_tpu.utils.g2k` with
``isTx=False``), and the encoded sample is
``s(t) = Σ_j w_j e^{−i2π k(t)·x_j}``. A SpinCube with nonzero ``ofst``
is handled by pre/post-phasing the samples with
``e^{∓i2π k(t)·ofst}`` (the grid itself is always centered).

The reference framework has no acquisition/recon stage at all
(`SURVEY.md` §2); this module is part of the beyond-reference
acquisition stack (see also :mod:`mrphy_tpu.ops.signal`,
``examples/recon_sense.py``).
"""

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mrphy_tpu import pi

__all__ = ['NufftPlan', 'nufft_plan', 'nufft', 'nufft_adjoint',
           'dcf_pipe_menon', 'toeplitz_kernel', 'toeplitz_apply']

_PH = jax.lax.Precision.HIGHEST


# ------------------------------------------------------------------
# Kaiser–Bessel kernel (in-graph, differentiable)
# ------------------------------------------------------------------

def _i0(x):
    r"""Modified Bessel I₀ — Abramowitz & Stegun 9.8.1/9.8.2 polynomial
    minimax fits (|err| < 2e-7 relative), branch-free via ``where``."""
    ax = jnp.abs(x)
    t = (ax / 3.75) ** 2
    small = 1.0 + t * (3.5156229 + t * (3.0899424 + t * (
        1.2067492 + t * (0.2659732 + t * (0.0360768 + t * 0.0045813)))))
    # large branch: guard ax>=3.75 so 1/ax and exp stay tame
    axl = jnp.maximum(ax, 3.75)
    u = 3.75 / axl
    large = (jnp.exp(axl) / jnp.sqrt(axl)) * (
        0.39894228 + u * (0.01328592 + u * (0.00225319 + u * (
            -0.00157565 + u * (0.00916281 + u * (-0.02057706 + u * (
                0.02635537 + u * (-0.01647633 + u * 0.00392377))))))))
    return jnp.where(ax < 3.75, small, large)


def _kb(delta, width: int, beta: float):
    r"""Kaiser–Bessel interpolation weight φ(δ) = I₀(β√(1−(2δ/W)²))/I₀(β)
    for |δ| ≤ W/2, else 0 (δ in grid units)."""
    arg = 1.0 - (2.0 * delta / width) ** 2
    inside = arg > 0
    val = _i0(beta * jnp.sqrt(jnp.where(inside, arg, 0.0)))
    return jnp.where(inside, val, 0.0) / float(np.i0(beta))


def _kb_d(delta, width: int, beta: float):
    r"""dφ/dδ of :func:`_kb`. Chains ``i0'`` via ``jax.jvp`` of the
    SAME ``_i0`` polynomial the weights use, so trajectory gradients
    from the derivative-weight kernels match the XLA autodiff of
    ``_kb`` to f32 roundoff (the clamp differs only at the
    measure-zero tap edge ``|δ| = W/2``, where autodiff NaNs)."""
    arg = 1.0 - (2.0 * delta / width) ** 2
    inside = arg > 1e-12
    s = jnp.sqrt(jnp.where(inside, arg, 1.0))
    x = beta * s
    i0p = jax.jvp(_i0, (x,), (jnp.ones_like(x),))[1]
    d = i0p * beta * (-4.0 * delta / width ** 2) / s
    return jnp.where(inside, d, 0.0) / float(np.i0(beta))


def _kb_ft(xi, width: int, beta: float):
    r"""Continuous Fourier transform of the (I₀(β)-normalized) KB kernel
    at reduced frequency ``xi = (p − ctr)/G`` (host numpy, plan build):
    ``Φ(ξ) = W·sinh(√(β²−(πWξ)²)) / (I₀(β)·√(β²−(πWξ)²))`` — the sinh
    turns into sin past the kernel's mainlobe edge."""
    xi = np.asarray(xi, np.float64)
    a2 = beta ** 2 - (np.pi * width * xi) ** 2
    r = np.sqrt(np.abs(a2))
    r = np.where(r < 1e-12, 1e-12, r)
    val = np.where(a2 >= 0, np.sinh(r) / r, np.sin(r) / r)
    return width * val / np.i0(beta)


# ------------------------------------------------------------------
# Plan
# ------------------------------------------------------------------

class NufftPlan:
    r"""Static gridding plan: per-axis DFT matrices (real pairs, built
    in f64 on the host), the d-dim deapodization array, and the scalar
    geometry. Registered as a pytree (arrays are leaves), so plans can
    be closed over or passed through ``jit`` freely.

    Attrs:
        - ``im_size``: `(n_1, …, n_d)` image grid (static ints).
        - ``grid_size``: `(G_1, …, G_d)`, ``G = ceil(osf·n)`` rounded
          up to even.
        - ``fov``: `(d,)` floats, "cm" — scales "cycle/cm" ``ktraj``
          into cycles-across-FOV.
        - ``width``, ``beta``: kernel taps per axis and KB shape
          (default: Beatty's ``β = π√(W²/σ²·(σ−½)² − 0.8)``).
        - ``dft_re/dft_im``: per-axis `(G_a, n_a)` forward-DFT factors
          ``e^{−i2π m (p − n_a//2) / G_a}``.
        - ``deapod``: `(n_1, …, n_d)` real separable 1/Φ image weights.
        - ``interp``: ``'gather'`` ⊻ ``'matmul'`` sample-stage strategy
          (static; see the module docstring).
    """

    def __init__(self, im_size, grid_size, fov, width, beta,
                 dft_re, dft_im, deapod, interp='gather'):
        self.im_size = tuple(im_size)
        self.grid_size = tuple(grid_size)
        self.fov = tuple(fov)
        self.width = int(width)
        self.beta = float(beta)
        self.dft_re = tuple(dft_re)
        self.dft_im = tuple(dft_im)
        self.deapod = deapod
        self.interp = str(interp)

    @property
    def ndim(self) -> int:
        return len(self.im_size)

    def __repr__(self):
        return (f'NufftPlan(im_size={self.im_size}, '
                f'grid_size={self.grid_size}, fov={self.fov}, '
                f'width={self.width}, beta={self.beta:.3f}, '
                f'interp={self.interp!r})')


def _plan_flatten(p):
    return ((p.dft_re, p.dft_im, p.deapod),
            (p.im_size, p.grid_size, p.fov, p.width, p.beta, p.interp))


def _plan_unflatten(aux, leaves):
    dft_re, dft_im, deapod = leaves
    return NufftPlan(*aux[:3], aux[3], aux[4], dft_re, dft_im, deapod,
                     interp=aux[5])


jax.tree_util.register_pytree_node(NufftPlan, _plan_flatten,
                                   _plan_unflatten)


def nufft_plan(im_size: Sequence[int], fov, *, osf: float = 2.0,
               width: int = 4, beta: Optional[float] = None,
               dtype=jnp.float32, interp: str = 'auto') -> NufftPlan:
    r"""Build a gridding plan for a ``len(im_size)``-dim image grid.

    Inputs:
        - ``im_size``: `(n_1, …, n_d)` grid shape (the SpinCube shape,
          singleton axes dropped).
        - ``fov``: `(d,)`, "cm" — the SpinCube FOV per axis.
    Optionals:
        - ``osf``: grid oversampling σ (default 2.0).
        - ``width``: kernel taps W per axis (4 → ~1e-3 relative
          accuracy, 6 → ~1e-5; measured against the exact operator in
          ``tests/test_nufft.py``).
        - ``beta``: KB shape (default: Beatty's formula for (σ, W)).
        - ``dtype``: on-device dtype of the plan constants.
        - ``interp``: sample-stage strategy — ``'gather'`` (wrapped
          gather/scatter), ``'matmul'`` (dense one-hot MXU factors,
          d ≤ 2 only), ``'pallas'`` (VMEM-resident slice kernel,
          d = 3 only — :mod:`mrphy_tpu.ops.nufft_pallas`), or
          ``'auto'`` (matmul for d ≤ 2; pallas for d = 3 when the
          padded grid fits VMEM and a TPU is present, else gather).
          All modes are value-identical up to float sum order.
          NOTE: ``'pallas'``'s native VJP computes data/trajectory
          cotangents in f32 kernels regardless of ``dtype`` (TPU has
          no f64); with a f64 plan, use ``'gather'`` when full-dtype
          gradient precision matters (its autodiff differentiates the
          f64 gather path).
    """
    im_size = tuple(int(n) for n in im_size)
    fov = tuple(float(f) for f in np.asarray(fov).reshape(-1))
    d = len(im_size)
    assert len(fov) == d, (im_size, fov)
    assert all(n >= 2 for n in im_size), im_size
    assert interp in ('auto', 'gather', 'matmul', 'pallas'), interp
    grid_probe = tuple(int(-2 * (-osf * n // 2)) for n in im_size)
    if interp == 'auto':
        if d <= 2:
            interp = 'matmul'
        else:
            from mrphy_tpu.ops import nufft_pallas as _np3
            from mrphy_tpu.ops.pallas_kernels import _on_tpu
            nGp = int(np.prod([g + width for g in grid_probe]))
            interp = ('pallas' if (8 * nGp <= _np3._VMEM_BUDGET
                                   and _on_tpu()) else 'gather')
    assert not (interp == 'matmul' and d > 2), \
        f'interp=matmul supports d<=2 (got {d}-dim; use gather)'
    assert not (interp == 'pallas' and d != 3), \
        f'interp=pallas supports d=3 only (got {d}-dim)'
    grid = tuple(int(-2 * (-osf * n // 2)) for n in im_size)  # even ≥ σn
    if beta is None:
        s = osf
        beta = float(np.pi * np.sqrt(
            (width ** 2 / s ** 2) * (s - 0.5) ** 2 - 0.8))
    dft_re, dft_im, deap1 = [], [], []
    for n, G in zip(im_size, grid):
        assert G >= n + width, (
            f'grid {G} too small for image {n} + kernel {width}; '
            f'raise osf')
        m = np.arange(G, dtype=np.float64)[:, None]
        p = np.arange(n, dtype=np.float64)[None, :] - n // 2
        ang = -2.0 * np.pi * m * p / G
        dft_re.append(jnp.asarray(np.cos(ang), dtype))
        dft_im.append(jnp.asarray(np.sin(ang), dtype))
        xi = (np.arange(n, dtype=np.float64) - n // 2) / G
        deap1.append(1.0 / _kb_ft(xi, width, beta))
    full = deap1[0]
    for w in deap1[1:]:
        full = full[..., None] * w
    return NufftPlan(im_size, grid, fov, width, beta,
                     dft_re, dft_im, jnp.asarray(full, dtype),
                     interp=interp)


# ------------------------------------------------------------------
# Real-pair complex helpers
# ------------------------------------------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _dft_axis(xr, xi, mr, mi, axis: int):
    r"""Apply the `(G, n)` DFT factor along ``axis`` of a real-pair
    d-dim array: 4 real tensordots on the MXU."""
    def td(a, b):
        out = jnp.tensordot(b, a, axes=([1], [axis]),
                            precision=_PH)            # (G, ...rest)
        return jnp.moveaxis(out, 0, axis)
    return (td(xr, mr) - td(xi, mi)), (td(xr, mi) + td(xi, mr))


# ------------------------------------------------------------------
# Interpolation coordinates
# ------------------------------------------------------------------

def _coords(plan: NufftPlan, ktraj):
    r"""Per-axis wrapped tap indices `(d × (nT, W))` int32 and KB
    weights `(d × (nT, W))` for ``ktraj`` `(d, nT)` in cycle/cm."""
    W = plan.width
    offs = jnp.arange(W, dtype=ktraj.dtype)
    idxs, wts = [], []
    for a, (G, f) in enumerate(zip(plan.grid_size, plan.fov)):
        scale = G / plan.im_size[a]                   # σ_a
        v = ktraj[a] * f * scale                      # (nT,) grid units
        base = jnp.floor(v - W / 2.0) + 1.0
        taps = base[:, None] + offs[None]             # (nT, W)
        wts.append(_kb(v[:, None] - taps, W, plan.beta))
        idxs.append(jnp.mod(taps, G).astype(jnp.int32))
    return idxs, wts


def _dense_factor(idx, wt, G: int):
    r"""W-sparse per-axis KB row → dense `(c, G)` one-hot-weighted
    factor, built as ``W`` fused compare-selects (never a `(c, W, G)`
    intermediate, and no scatter — the serialized op this mode exists
    to avoid). Wrapped taps that collide (W > G never happens, but
    anyway) sum correctly. Differentiable in ``wt`` (the trajectory
    gradient path); the integer taps carry none, matching the gather
    path's semantics."""
    iota = lax.broadcasted_iota(jnp.int32, (1, G), 1)
    oh = jnp.zeros((idx.shape[0], G), wt.dtype)
    for w in range(idx.shape[1]):                     # static, W ≤ ~6
        oh = oh + jnp.where(idx[:, w:w + 1] == iota,
                            wt[:, w:w + 1], 0.0)
    return oh


def _dense_factors(plan, k_c):
    r"""`(c, d)` sample chunk → per-axis dense factors `d × (c, G_a)`."""
    idxs, wts = _coords(plan, k_c.T)
    return [_dense_factor(i, w, G) for i, w, G
            in zip(idxs, wts, plan.grid_size)]


def _taps(plan, idxs, wts):
    r"""Combine per-axis taps into flat indices `(nT, W^d)` and product
    weights `(nT, W^d)` (d ≤ 3 unrolled for clarity)."""
    d = plan.ndim
    G = plan.grid_size
    if d == 1:
        return idxs[0], wts[0]
    if d == 2:
        fi = (idxs[0][:, :, None] * G[1] + idxs[1][:, None, :])
        fw = wts[0][:, :, None] * wts[1][:, None, :]
    elif d == 3:
        fi = ((idxs[0][:, :, None, None] * G[1]
               + idxs[1][:, None, :, None]) * G[2]
              + idxs[2][:, None, None, :])
        fw = (wts[0][:, :, None, None] * wts[1][:, None, :, None]
              * wts[2][:, None, None, :])
    else:
        raise NotImplementedError(f'{d}-dim NUFFT (supported: 1..3)')
    nT = fi.shape[0]
    return fi.reshape(nT, -1), fw.reshape(nT, -1)


_MM_CHUNK = 16384       # default matmul-mode sample chunk (see nufft)


def _chunked(fn, n: int, chunk: Optional[int], *arrays):
    r"""Run ``fn`` over length-``chunk`` slices of axis 0 (zero-padded;
    callers discard or rely on zero contributions) via ``lax.map``."""
    if chunk is None or chunk >= n:
        return fn(*arrays), n
    pad = (-n) % chunk
    arrays = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
              for a in arrays]
    splits = (n + pad) // chunk
    arrays = [a.reshape((splits, chunk) + a.shape[1:]) for a in arrays]
    out = lax.map(lambda xs: fn(*xs), tuple(arrays))
    return out, n


# ------------------------------------------------------------------
# Type 2: image grid → nonuniform samples
# ------------------------------------------------------------------

def _fwd_core(plan: NufftPlan, img, ktraj, chunk):
    xr = img[..., 0] * plan.deapod
    xi = img[..., 1] * plan.deapod
    for a in range(plan.ndim):
        xr, xi = _dft_axis(xr, xi, plan.dft_re[a], plan.dft_im[a], a)

    if plan.interp == 'matmul':                       # d ≤ 2, MXU
        def sample(k_c):
            ohs = _dense_factors(plan, k_c)
            if plan.ndim == 1:
                sr = jnp.einsum('cg,g->c', ohs[0], xr, precision=_PH)
                si = jnp.einsum('cg,g->c', ohs[0], xi, precision=_PH)
            else:
                sr = (jnp.einsum('cg,gh->ch', ohs[0], xr,
                                 precision=_PH) * ohs[1]).sum(-1)
                si = (jnp.einsum('cg,gh->ch', ohs[0], xi,
                                 precision=_PH) * ohs[1]).sum(-1)
            return jnp.stack([sr, si], -1)            # (chunk, 2)
    elif plan.interp == 'pallas':                     # d = 3, VMEM
        from mrphy_tpu.ops import nufft_pallas as _np3
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        return _np3.sample3d_vjp(plan, xr, xi, ktraj,
                                 interpret=not _on_tpu())
    else:
        br, bi = xr.reshape(-1), xi.reshape(-1)       # (ΠG,)

        def sample(k_c):
            fi, fw = _taps(plan, *_coords(plan, k_c.T))
            sr = (br[fi] * fw).sum(-1)
            si = (bi[fi] * fw).sum(-1)
            return jnp.stack([sr, si], -1)            # (chunk, 2)

    nT = ktraj.shape[-1]
    if chunk is None and plan.interp == 'matmul':
        chunk = _MM_CHUNK
    out, _ = _chunked(sample, nT, chunk, ktraj.T)
    return out.reshape(-1, 2)[:nT]


def _segments(plan, df, T2s, dt, nseg: int, nT: int, dtype):
    r"""Hat-function time segmentation [Sutton, Fessler & Noll, IEEE
    TMI 22(2):178, 2003]: ``e^{−t/T2* − i2π Δf t} ≈ Σ_l b_l(t)·w_l``
    with ``τ_l`` equispaced over the readout, ``b_l`` the linear-interp
    hats (a partition of unity), ``w_l = e^{−τ_l/T2*}e^{−i2πΔf τ_l}``
    per voxel. Returns `(nseg, nT)` coefficients and `(nseg, n…, 2)`
    voxel weights."""
    t = (jnp.arange(nT, dtype=dtype) + 1) * dt        # signal()'s t_t
    t0, t1 = dt, nT * dt
    nseg = min(nseg, nT)      # nseg > nT ⇒ dtau = 0 ⇒ NaN hats at nT=1
    if nseg == 1:
        taus = jnp.asarray([(t0 + t1) / 2], dtype)
        b = jnp.ones((1, nT), dtype)
    else:
        taus = t0 + (t1 - t0) * jnp.arange(nseg, dtype=dtype) / (
            nseg - 1)
        dtau = (t1 - t0) / (nseg - 1)
        b = jnp.maximum(0.0, 1.0 - jnp.abs(t[None] - taus[:, None])
                        / dtau)                       # (nseg, nT)
    zero = jnp.zeros(plan.im_size, dtype)
    dfg = zero if df is None else jnp.broadcast_to(
        jnp.asarray(df, dtype), plan.im_size)
    phase = -2.0 * pi * dfg[None] * taus.reshape(
        (nseg,) + (1,) * plan.ndim)                   # (nseg, n…)
    if T2s is None:
        env = jnp.ones_like(phase)
    else:
        t2g = jnp.broadcast_to(jnp.asarray(T2s, dtype), plan.im_size)
        env = jnp.exp(-taus.reshape((nseg,) + (1,) * plan.ndim)
                      / t2g[None])
    w = jnp.stack([env * jnp.cos(phase), env * jnp.sin(phase)], -1)
    return b, w


def nufft(plan: NufftPlan, img, ktraj, *, df=None, T2s=None, dt=None,
          nseg: int = 8, chunk: Optional[int] = None, mesh=None):
    r"""Sample the image's spectrum at a nonuniform trajectory
    (type-2 NUFFT): ``s(t) ≈ Σ_j img_j · e^{−i2π k(t)·x_j}`` with
    ``x_j`` the centered FOV grid.

    Inputs:
        - ``img``: `(n_1, …, n_d, 2)` re/im image on the plan's grid
          (e.g. ``Mx/My`` of a SpinCube, coil-weighted).
        - ``ktraj``: `(d, nT)`, "cycle/cm".
    Optionals:
        - ``df``/``T2s``: `()` ⊻ `(n_1, …, n_d)`, "Hz"/"Sec" —
          off-resonance and T2* **maps on the grid**, modeled by
          ``nseg``-segment hat time segmentation (Sutton–Fessler–Noll;
          requires ``dt``). Semantics match
          :func:`mrphy_tpu.ops.signal.signal` (sample times
          ``(t+1)·dt``) to the segmentation error — measured ≲1e-3
          relative at nseg=16 over a 5 ms/±50 Hz readout in the tests.
        - ``dt``: `()`, "Sec", dwell (required with ``df``/``T2s``).
        - ``nseg``: time segments (error ∝ (2πΔf·T/nseg)²).
        - ``chunk``: samples per interpolation block — bounds the
          `(chunk, W^d)` tap table (gather mode) or the
          `d × (chunk, G_a)` dense factors (matmul mode). Default:
          all of ``nT`` for gather; **16384 for matmul** (the dense
          factors are the memory bound there — ~34 MB/axis at G=512 —
          and chunking is value-identical, asserted in the tests).
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` —
          samples (and the tap table) shard over the spin axis, the
          grid stage replicates; collective-free forward.
    Outputs:
        - ``s``: `(nT, 2)` re/im samples.
    """
    img = jnp.asarray(img)
    assert img.shape == plan.im_size + (2,), (img.shape, plan.im_size)
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import nufft_sharded_traceable
        return nufft_sharded_traceable(mesh, plan, img, ktraj, df=df,
                                       T2s=T2s, dt=dt, nseg=nseg,
                                       chunk=chunk)
    if df is None and T2s is None:
        return _fwd_core(plan, img, ktraj, chunk)
    assert dt is not None, 'df/T2s time segmentation needs dt'
    nT = ktraj.shape[-1]
    b, w = _segments(plan, df, T2s, dt, nseg, nT, img.dtype)
    s = jnp.zeros((nT, 2), img.dtype)
    # NB each _fwd_core call rebuilds the same interpolation factors
    # from the unchanged ktraj; under jit XLA CSE merges those
    # identical pure subgraphs, so only the per-segment grid stages
    # (different weighted images — inherent to the model) remain.
    for el in range(b.shape[0]):                      # static, small
        wr, wi = _cmul(img[..., 0], img[..., 1],
                       w[el, ..., 0], w[el, ..., 1])
        s = s + b[el][:, None] * _fwd_core(
            plan, jnp.stack([wr, wi], -1), ktraj, chunk)
    return s


# ------------------------------------------------------------------
# Type 1: nonuniform samples → image grid (exact transpose)
# ------------------------------------------------------------------

def nufft_adjoint(plan: NufftPlan, s, ktraj, *, df=None, T2s=None,
                  dt=None, nseg: int = 8,
                  chunk: Optional[int] = None, mesh=None):
    r"""Exact (complex-conjugate) adjoint of :func:`nufft` — including
    under ``df``/``T2s`` time segmentation, where each segment's
    scatter is weighted by ``b_l`` and re-phased by ``conj(w_l)``, so
    ``⟨nufft(x), y⟩ = ⟨x, nufft_adjoint(y)⟩`` holds for the SAME
    arguments (CG normal equations stay consistent).

    Inputs:
        - ``s``: `(nT, 2)` re/im samples (zero-pad convention: padded
          samples contribute nothing).
        - ``ktraj``: `(d, nT)`, "cycle/cm".
    Optionals: as :func:`nufft` (under ``mesh=`` each chip scatters
    its sample shard; ONE ``psum`` combines the grids).
    Outputs:
        - ``img``: `(n_1, …, n_d, 2)`.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import (
            nufft_adjoint_sharded_traceable)
        return nufft_adjoint_sharded_traceable(mesh, plan, s, ktraj,
                                               df=df, T2s=T2s, dt=dt,
                                               nseg=nseg, chunk=chunk)
    if df is not None or T2s is not None:
        assert dt is not None, 'df/T2s time segmentation needs dt'
        s = jnp.asarray(s)
        nT = ktraj.shape[-1]
        b, w = _segments(plan, df, T2s, dt, nseg, nT, s.dtype)
        out = jnp.zeros(plan.im_size + (2,), s.dtype)
        for el in range(b.shape[0]):                  # static, small
            x = nufft_adjoint(plan, b[el][:, None] * s, ktraj,
                              chunk=chunk)
            # conj(w_l) ⊙ x
            xr, xi = _cmul(x[..., 0], x[..., 1],
                           w[el, ..., 0], -w[el, ..., 1])
            out = out + jnp.stack([xr, xi], -1)
        return out
    s = jnp.asarray(s)
    nT = ktraj.shape[-1]
    assert s.shape == (nT, 2), (s.shape, nT)
    return _adj_finish(plan, _adj_scatter(plan, s, ktraj, chunk))


def _adj_scatter(plan: NufftPlan, s, ktraj, chunk):
    r"""Sample → oversampled-grid KB scatter, `(2, ΠG)` — the only
    sample-dependent stage of the adjoint (the sharded dispatch psums
    exactly this)."""
    nT = ktraj.shape[-1]
    nG = int(np.prod(plan.grid_size))

    if plan.interp == 'matmul':                       # d ≤ 2, MXU
        def scatter(k_c, s_c):
            ohs = _dense_factors(plan, k_c)
            if plan.ndim == 1:
                br = jnp.einsum('cg,c->g', ohs[0], s_c[:, 0],
                                precision=_PH)
                bi = jnp.einsum('cg,c->g', ohs[0], s_c[:, 1],
                                precision=_PH)
            else:
                br = jnp.einsum('cg,ch->gh', ohs[0],
                                s_c[:, :1] * ohs[1], precision=_PH)
                bi = jnp.einsum('cg,ch->gh', ohs[0],
                                s_c[:, 1:] * ohs[1], precision=_PH)
            return jnp.stack([br.reshape(-1), bi.reshape(-1)])
    elif plan.interp == 'pallas':                     # d = 3, VMEM
        from mrphy_tpu.ops import nufft_pallas as _np3
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        return _np3.scatter3d_vjp(plan, s, ktraj,
                                  interpret=not _on_tpu())
    else:
        def scatter(k_c, s_c):
            fi, fw = _taps(plan, *_coords(plan, k_c.T))
            z = jnp.zeros((nG,), s.dtype)
            br = z.at[fi.reshape(-1)].add((fw * s_c[:, :1]).reshape(-1))
            bi = z.at[fi.reshape(-1)].add((fw * s_c[:, 1:]).reshape(-1))
            return jnp.stack([br, bi])

    if chunk is None and plan.interp == 'matmul':
        chunk = _MM_CHUNK
    out, _ = _chunked(scatter, nT, chunk, ktraj.T, s)
    if out.ndim == 3:                                 # chunked: sum maps
        out = out.sum(0)
    return out


def _adj_finish(plan: NufftPlan, grid2):
    r"""Grid → image: adjoint (conj-transpose) DFT factors per axis,
    then deapodize."""
    br, bi = (g.reshape(plan.grid_size) for g in (grid2[0], grid2[1]))
    for a in range(plan.ndim):
        br, bi = _dft_axis(br, bi, plan.dft_re[a].T, -plan.dft_im[a].T,
                           a)
    return jnp.stack([br * plan.deapod, bi * plan.deapod], -1)


# ------------------------------------------------------------------
# Density compensation (Pipe–Menon)
# ------------------------------------------------------------------

def dcf_pipe_menon(plan: NufftPlan, ktraj, *, iters: int = 30,
                   normalize: bool = True):
    r"""Iterative sampling-density compensation [Pipe & Menon, MRM
    41(1):179, 1999]: fixed-point iteration ``w ← w / (C Cᴴ w)`` where
    ``C`` is the KB interpolation (sample → grid) convolution — the
    gridding kernel *without* the DFT stage. At convergence
    ``C Cᴴ w ≈ 1`` at every sample, i.e. the kernel-smoothed sampling
    density is flat, which is what makes single-pass conjugate-phase /
    gridding reconstruction ``nufft_adjoint(w ⊙ s)`` quantitatively
    usable (validated in ``tests/test_nufft.py``: PM weights reproduce
    the analytic ramp |k| on a radial trajectory, and a smooth phantom
    reconstructs to ~0.4% vs ~60% uncompensated).

    CP quality is trajectory-dependent: on golden-angle radial it is
    sub-percent, while on this package's slew-limited spiral (rapid
    density transitions) it plateaus around 10% — for such
    trajectories use iterative CG through :func:`nufft`/
    :func:`nufft_adjoint` (``examples/recon_sense.py --op nufft``),
    which needs no density compensation at all.

    Optionals:
        - ``iters``: fixed-point iterations (30 ≈ converged for
          spiral/radial).
        - ``normalize``: calibrate the global scale to unit DC gain —
          ``nufft_adjoint(w ⊙ nufft(𝟙))`` returns ≈𝟙 — so
          conjugate-phase recon is unbiased. (PSF-*peak* calibration
          would average the spectral response over the whole Nyquist
          square, overshooting the in-band gain by up to ~4/π when the
          trajectory covers only the inscribed disk.)
    Outputs:
        - ``w``: `(nT,)` sample weights.

    Memory: holds the `(nT, W^d)` tap table (gather mode) or the
    `d × (nT, G_a)` dense factors (matmul mode — UNchunked here, since
    the factors are reused across all ``iters``); for very large
    ``nT`` prefer iterating per-shot and concatenating, or a gather
    plan.
    """
    ktraj = jnp.asarray(ktraj)
    nT = ktraj.shape[-1]
    if plan.interp == 'matmul':                       # d ≤ 2, MXU
        ohs = _dense_factors(plan, ktraj.T)

        def cch(w):
            if plan.ndim == 1:
                g = jnp.einsum('cg,c->g', ohs[0], w, precision=_PH)
                return jnp.einsum('cg,g->c', ohs[0], g, precision=_PH)
            g = jnp.einsum('cg,ch->gh', ohs[0], w[:, None] * ohs[1],
                           precision=_PH)
            return (jnp.einsum('cg,gh->ch', ohs[0], g,
                               precision=_PH) * ohs[1]).sum(-1)
    else:
        fi, fw = _taps(plan, *_coords(plan, ktraj))
        nG = int(np.prod(plan.grid_size))

        def cch(w):
            g = jnp.zeros((nG,), w.dtype).at[fi.reshape(-1)].add(
                (fw * w[:, None]).reshape(-1))
            return (fw * g[fi]).sum(-1)

    def body(_, w):
        d = cch(w)
        return w / jnp.maximum(d, 1e-30)

    w = lax.fori_loop(0, iters, body, jnp.ones((nT,), ktraj.dtype))
    if normalize:
        ones = jnp.stack([jnp.ones(plan.im_size, ktraj.dtype),
                          jnp.zeros(plan.im_size, ktraj.dtype)], -1)
        y = nufft_adjoint(plan, w[:, None] * _fwd_core(
            plan, ones, ktraj, None), ktraj)
        w = w / jnp.mean(y[..., 0])
    return w


# ------------------------------------------------------------------
# Toeplitz normal operator
# ------------------------------------------------------------------

def toeplitz_kernel(plan: NufftPlan, ktraj, *, weights=None,
                    chunk: int = 4096):
    r"""Spectrum of the normal operator's Toeplitz embedding, computed
    EXACTLY (chunked MXU contractions, no gridding): returns
    ``T̂ = DFT_{2n}(h)`` with PSF
    ``h(r) = Σ_t w_t e^{+i2π Σ_a u_{a,t} r_a/n_a}``, so that
    :func:`toeplitz_apply` realizes ``AᴴWA`` with zero approximation
    error beyond float roundoff (A = the *exact* encoding operator;
    asserted against :func:`mrphy_tpu.ops.signal.signal_adjoint` ∘
    :func:`~mrphy_tpu.ops.signal.signal` in the tests).

    Optionals:
        - ``weights``: `(nT,)` real sample weights ``w_t`` (density
          compensation / masking; default 1).
        - ``chunk``: samples per contraction block.
    Outputs:
        - ``that``: `(2n_1, …, 2n_d, 2)` re/im multipliers.
    """
    ktraj = jnp.asarray(ktraj)
    nT = ktraj.shape[-1]
    dtype = ktraj.dtype
    w = (jnp.ones((nT,), dtype) if weights is None
         else jnp.broadcast_to(jnp.asarray(weights, dtype), (nT,)))
    d = plan.ndim

    # per-axis complex factors E_a[t, q] = e^{+i2π u_a,t (q−n)/n}
    def factors(k_c, w_c):
        es = []
        for a, (n, f) in enumerate(zip(plan.im_size, plan.fov)):
            q = jnp.arange(2 * n, dtype=dtype) - n    # (2n,) displ.
            ang = 2.0 * pi * (k_c[:, a] * f)[:, None] * q[None] / n
            es.append((jnp.cos(ang), jnp.sin(ang)))
        # weight folded into axis 0
        er, ei = es[0]
        es[0] = (er * w_c[:, None], ei * w_c[:, None])
        if d == 1:
            hr = es[0][0].sum(0)
            hi = es[0][1].sum(0)
        elif d == 2:
            hr = (jnp.einsum('ty,tx->yx', es[0][0], es[1][0],
                             precision=_PH)
                  - jnp.einsum('ty,tx->yx', es[0][1], es[1][1],
                               precision=_PH))
            hi = (jnp.einsum('ty,tx->yx', es[0][0], es[1][1],
                             precision=_PH)
                  + jnp.einsum('ty,tx->yx', es[0][1], es[1][0],
                               precision=_PH))
        else:
            def e3(i, j, k):
                return jnp.einsum('tz,ty,tx->zyx', es[0][i], es[1][j],
                                  es[2][k], precision=_PH)
            hr = e3(0, 0, 0) - e3(0, 1, 1) - e3(1, 0, 1) - e3(1, 1, 0)
            hi = e3(0, 0, 1) + e3(0, 1, 0) + e3(1, 0, 0) - e3(1, 1, 1)
        return jnp.stack([hr, hi], -1)

    out, _ = _chunked(factors, nT, min(chunk, nT), ktraj.T, w)
    h = out.sum(0) if out.ndim == d + 2 else out      # (2n…, 2)
    # circulant layout: hc[r mod 2n] = h(r), r ∈ [−n, n)
    for a, n in enumerate(plan.im_size):
        h = jnp.roll(h, -n, axis=a)
    # spectrum via plain (unshifted) DFT on the 2n grid
    hr, hi = h[..., 0], h[..., 1]
    for a, n in enumerate(plan.im_size):
        mr, mi = _dft2n(2 * n, dtype)
        hr, hi = _dft_axis(hr, hi, mr, mi, a)
    return jnp.stack([hr, hi], -1)


def _dft2n(G: int, dtype):
    r"""Unshifted `(G, G)` DFT factor ``e^{−i2π m p / G}`` (in-graph;
    tiny per-axis matrices, folded to constants under jit). The angle
    is reduced EXACTLY via integer ``(m·p) mod G`` before the float
    divide, so the factors carry no argument-reduction roundoff in
    either f32 or f64."""
    m = jnp.arange(G, dtype=jnp.int32)[:, None]
    p = jnp.arange(G, dtype=jnp.int32)[None]
    ang = (-2.0 * pi / G) * ((m * p) % G).astype(dtype)
    return jnp.cos(ang), jnp.sin(ang)


def toeplitz_apply(plan: NufftPlan, that, img):
    r"""Apply the normal operator: zero-pad ``img`` to the `(2n)^d`
    grid, multiply the spectrum by ``that``, inverse-DFT, crop — one
    circular convolution realizing exact ``AᴴWA`` for the planned
    trajectory.

    Inputs:
        - ``that``: from :func:`toeplitz_kernel`.
        - ``img``: `(n_1, …, n_d, 2)`.
    Outputs: same shape as ``img``.
    """
    img = jnp.asarray(img)
    assert img.shape == plan.im_size + (2,), (img.shape, plan.im_size)
    dtype = img.dtype
    xr, xi = img[..., 0], img[..., 1]
    pads = [(0, n) for n in plan.im_size]
    xr, xi = jnp.pad(xr, pads), jnp.pad(xi, pads)
    for a, n in enumerate(plan.im_size):
        mr, mi = _dft2n(2 * n, dtype)
        xr, xi = _dft_axis(xr, xi, mr, mi, a)
    xr, xi = _cmul(xr, xi, that[..., 0], that[..., 1])
    scale = 1.0
    for a, n in enumerate(plan.im_size):
        mr, mi = _dft2n(2 * n, dtype)
        xr, xi = _dft_axis(xr, xi, mr.T, -mi.T, a)    # conj transpose
        scale /= 2 * n
    sl = tuple(slice(0, n) for n in plan.im_size)
    return jnp.stack([xr[sl] * scale, xi[sl] * scale], -1)
