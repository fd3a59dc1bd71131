r"""On-device 1-D resampling as precomputed interpolation matrices.

Every SciPy ``interp1d`` kind is a LINEAR map of the sample values, so
for static sample/query grids the whole resampling collapses to one
`(nNew, nOld)` matrix built once on the host and applied on-device as
a single (MXU) matmul — the same static-diagonal pattern as the DFT/
DCT operators in :mod:`mrphy_tpu.ops.field`. This replaces the
reference's host-SciPy round-trip for non-linear ``Pulse.interpT``
kinds (``/root/reference/mrphy/mobjs.py:214-215``, its one remaining
device→host boundary): on TPU the resample stays on-device AND stays
differentiable w.r.t. the waveform (the host round-trip severs
autodiff).

Matrix construction is exact f64 on the host:

- ``linear``/``nearest``/``nearest-up``/``previous``/``next``/``zero``:
  closed-form selection/weight rows (SciPy conventions, pinned by
  tests against ``scipy.interpolate.interp1d``).
- ``cubic``: the not-a-knot cubic spline (what SciPy's ``kind='cubic'``
  builds via ``make_interp_spline``) in second-derivative form — the
  tridiagonal-plus-not-a-knot system is data-independent, so its
  inverse folds into the matrix: ``C = Wy + Wm · A⁻¹ · B``.
- any other kind: the matrix is probed column-by-column through SciPy
  itself (interpolation is linear in the data, so evaluating the kind
  on identity basis vectors IS the matrix) — exact parity with the
  host path at matrix-build time, on-device application after.
"""

import functools

import numpy as np

__all__ = ['interp_matrix', 'interp1d_apply']

_NATIVE = ('linear', 'nearest', 'nearest-up', 'previous', 'next',
           'zero', 'cubic')


def _cubic_notaknot_matrix(t_o, t_n):
    r"""`(nNew, nOld)` not-a-knot cubic-spline resampling matrix.

    Second-derivative (M) form: interior rows are the classic
    tridiagonal continuity conditions, the two boundary rows impose
    third-derivative continuity at the second and second-to-last
    knots (not-a-knot). ``M = A⁻¹·B·y`` with both ``A`` and ``B``
    data-independent, and the piecewise evaluation at ``t_n`` is
    linear in ``(y, M)`` — everything folds into one dense matrix."""
    n = t_o.size
    assert n >= 4, f'cubic (not-a-knot) needs >= 4 samples, got {n}'
    h = np.diff(t_o)                                   # (n-1,)
    A = np.zeros((n, n))
    B = np.zeros((n, n))
    i = np.arange(1, n - 1)
    A[i, i - 1] = h[:-1] / 6
    A[i, i] = (h[:-1] + h[1:]) / 3
    A[i, i + 1] = h[1:] / 6
    B[i, i - 1] = 1 / h[:-1]
    B[i, i] = -(1 / h[:-1] + 1 / h[1:])
    B[i, i + 1] = 1 / h[1:]
    A[0, :3] = (h[1], -(h[0] + h[1]), h[0])            # d3y cont. at t1
    A[-1, -3:] = (h[-1], -(h[-2] + h[-1]), h[-2])      # ... at t_{n-2}
    AinvB = np.linalg.solve(A, B)                      # (n, n)

    idx = np.clip(np.searchsorted(t_o, t_n, side='right') - 1, 0, n - 2)
    hi = h[idx]
    u = t_n - t_o[idx]                                 # left offset
    v = t_o[idx + 1] - t_n                             # right offset
    rows = np.arange(t_n.size)
    Wy = np.zeros((t_n.size, n))
    Wm = np.zeros((t_n.size, n))
    Wy[rows, idx] = v / hi
    Wy[rows, idx + 1] = u / hi
    Wm[rows, idx] = v ** 3 / (6 * hi) - hi * v / 6
    Wm[rows, idx + 1] = u ** 3 / (6 * hi) - hi * u / 6
    return Wy + Wm @ AinvB


def _selection_matrix(t_o, t_n, kind):
    r"""One-hot/weight rows for the non-spline kinds (SciPy
    conventions: ``nearest`` ties round down, ``nearest-up`` up;
    ``zero`` is the order-0 spline = previous-knot value)."""
    n = t_o.size
    nn = t_n.size
    C = np.zeros((nn, n))
    rows = np.arange(nn)
    if kind == 'linear':
        idx = np.clip(np.searchsorted(t_o, t_n, side='right') - 1,
                      0, n - 2)
        w = (t_n - t_o[idx]) / (t_o[idx + 1] - t_o[idx])
        C[rows, idx] = 1 - w
        C[rows, idx + 1] = w
    elif kind in ('nearest', 'nearest-up'):
        mid = (t_o[:-1] + t_o[1:]) / 2
        side = 'left' if kind == 'nearest' else 'right'
        idx = np.searchsorted(mid, t_n, side=side)
        C[rows, np.clip(idx, 0, n - 1)] = 1
    elif kind in ('previous', 'zero'):
        idx = np.clip(np.searchsorted(t_o, t_n, side='right') - 1,
                      0, n - 1)
        C[rows, idx] = 1
    elif kind == 'next':
        idx = np.clip(np.searchsorted(t_o, t_n, side='left'), 0, n - 1)
        C[rows, idx] = 1
    else:                                    # pragma: no cover
        raise ValueError(kind)
    return C


@functools.lru_cache(maxsize=32)
def _interp_matrix_cached(t_o, t_n, kind):
    to = np.asarray(t_o, np.float64)
    tn = np.asarray(t_n, np.float64)
    if kind == 'cubic':
        return _cubic_notaknot_matrix(to, tn)
    if kind in _NATIVE:
        return _selection_matrix(to, tn, kind)
    # exotic kinds ('quadratic', 'slinear', integer orders, ...):
    # probe SciPy column-by-column — interp1d is linear in the data,
    # so its action on the identity basis IS the matrix
    from scipy import interpolate
    eye = np.eye(to.size)
    return interpolate.interp1d(to, eye, kind=kind, axis=0,
                                copy=False, assume_sorted=True)(tn)


def interp_matrix(t_o, t_n, kind: str = 'cubic') -> np.ndarray:
    r"""Build the `(len(t_n), len(t_o))` f64 resampling matrix for
    SciPy-``interp1d`` semantics of ``kind`` on static grids.

    ``t_o`` must be strictly increasing; ``t_n`` must lie within
    ``[t_o[0], t_o[-1]]`` (pulse resampling never extrapolates).
    Results are LRU-cached on the grid/kind (multi-scale design loops
    re-request the same ladder)."""
    to = np.asarray(t_o, np.float64)
    tn = np.asarray(t_n, np.float64)
    assert to.ndim == 1 and tn.ndim == 1, (to.shape, tn.shape)
    assert np.all(np.diff(to) > 0), 't_o must be strictly increasing'
    assert tn.size == 0 or (tn[0] >= to[0] - 1e-12
                            and tn[-1] <= to[-1] + 1e-12), \
        'interp_matrix does not extrapolate'
    return _interp_matrix_cached(tuple(to.tolist()),
                                 tuple(tn.tolist()), kind)


def interp1d_apply(C, y, axis: int = -1, precision=None):
    r"""Apply a resampling matrix along ``axis`` of ``y`` on-device:
    ``out[..., n, ...] = Σ_t C[n, t]·y[..., t, ...]`` — one matmul,
    differentiable w.r.t. ``y``. ``precision`` defaults to HIGHEST
    (TPU einsum defaults multiply in bf16 — the package-wide rule)."""
    import jax
    import jax.numpy as jnp
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    y = jnp.asarray(y)
    Cj = jnp.asarray(C, y.dtype)
    ym = jnp.moveaxis(y, axis, -1)
    out = jnp.einsum('nt,...t->...n', Cj, ym, precision=precision)
    return jnp.moveaxis(out, -1, axis)
