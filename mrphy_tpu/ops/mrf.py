r"""MR fingerprinting: dictionary compression, matching, and refinement.

The reference framework stops at simulation; its MRF story is "generate
signals, match elsewhere". This module closes the loop on-device: the
dictionary lives in HBM, matching is streamed MXU matmuls, and the
continuous refinement differentiates THROUGH the signal model — the
end-to-end path exercised by ``examples/mrf_dictionary.py`` promoted to
library form (beyond-reference family; no counterpart in
``/root/reference``).

Design notes (TPU-first):

- **Signals are real re/im pairs** ``(..., nTR, 2)`` — complex dtypes
  are unimplemented on this TPU runtime (see ``ops/epg.py``), so all
  complex arithmetic (modulus matching, phase-invariant scores, complex
  proton density) is spelled out in pair arithmetic. Plain real signals
  ``(..., nT)`` work too (``pair`` auto-detected from the trailing 2).
- **Matching = chunked matmuls.** ``dict_match`` scans over PROBE
  chunks with the full atom axis per chunk: one MXU matmul
  (``precision=HIGHEST`` — bf16-input scores can flip the argmax
  between close atoms) plus a single-pass row argmax, no in-loop
  gathers (which serialize on TPU). Memory stays ``O(chunk · nA)``
  whatever the probe count.
- **Compression is a Gram eigendecomposition** (McGivney et al., IEEE
  TMI 33(12):2311, 2014): the ``(nT, nT)`` Gram of the dictionary is
  tiny next to ``(nA, nT)``, so the SVD cost is one big matmul plus an
  ``eigh`` of a few-hundred-square matrix. For pair signals the Gram is
  augmented with the i-rotated copy of every atom, which makes it
  commute with the rotation operator J — the retained (even-rank)
  eigenspace is then J-invariant and complex inner products survive
  compression: ``Im⟨d, x⟩ = (Jd)·x ≈ (J_c d_c)·x_c`` with
  ``J_c = BᵀJB`` computed once.

Validated in ``tests/test_mrf.py``: exact-atom recovery with random
complex scales, compressed-vs-full match identity, streaming-block
invariance, and refinement below grid resolution.
"""

import functools as _functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision

__all__ = ['Basis', 'MatchResult', 'pair_rotate', 'svd_basis',
           'compress', 'dict_match', 'dict_match_compressed',
           'match_refine', 'subspace_encode', 'subspace_adjoint',
           'kspace_subspace_recon', 'subspace_toeplitz_kernels',
           'subspace_toeplitz_apply',
           'slice_profile_integrate']


class Basis(NamedTuple):
    r"""Temporal subspace basis from :func:`svd_basis`.

    - ``B``: `(nT, r)` orthonormal columns in the FLATTENED real signal
      space (``nT = nTR·2`` for pair signals).
    - ``jc``: `(r, r)` compressed i-rotation ``BᵀJB`` (pair signals;
      ``None`` for plain real dictionaries).
    - ``s``: `(nT,)` full singular-value spectrum (descending) of the
      (J-augmented) dictionary — for rank/energy diagnostics.
    - ``tail``: trailing signal shape the basis was built from, e.g.
      ``(nTR, 2)``; :func:`compress` checks inputs against it.
    """
    B: jnp.ndarray
    jc: Optional[jnp.ndarray]
    s: jnp.ndarray
    tail: tuple


class MatchResult(NamedTuple):
    r"""Per-voxel match from :func:`dict_match`.

    - ``idx``: `(*batch,)` int32 — best atom index.
    - ``score``: `(*batch,)` — ``|⟨d̂, x⟩|`` against the unit-norm atom
      (signed ``⟨d̂, x⟩`` for plain real signals).
    - ``m0``: `(*batch, 2)` re/im pair — least-squares complex scale
      ``⟨d, x⟩/‖d‖²`` (proton density × receive phase). For plain real
      signals the im half is zero.
    """
    idx: jnp.ndarray
    score: jnp.ndarray
    m0: jnp.ndarray


def _is_pair(x, pair):
    if pair is not None:
        return bool(pair)
    return x.ndim >= 1 and x.shape[-1] == 2


def pair_rotate(x):
    r"""Multiply a re/im pair signal by i: ``(re, im) → (−im, re)``.

    The rotation operator J of the pair representation; antisymmetric,
    ``J² = −I``. ``Im⟨d, x⟩ = (Jd)·x`` under the flattened real dot."""
    return jnp.stack([-x[..., 1], x[..., 0]], -1)


def _flatten(x, tail_ndim):
    batch = x.shape[:x.ndim - tail_ndim]
    return x.reshape(batch + (-1,)), batch


def svd_basis(D, rank: Optional[int] = None, energy: float = 0.9999,
              pair: Optional[bool] = None) -> Basis:
    r"""Temporal subspace of a dictionary (SVD compression basis).

    Eager/one-shot (dictionary prep, not a jit step): the rank chosen
    from ``energy`` is data-dependent. Cost is one ``(nT, nA)·(nA, nT)``
    Gram matmul + an ``eigh(nT)``.

    Inputs:
        - ``D``: `(nA, nTR, 2)` pair signals (or `(nA, nT)` real).
    Optionals:
        - ``rank``: subspace size; default: smallest rank capturing
          ``energy`` of the spectrum. Pair bases round up to EVEN rank —
          J-invariance (hence complex scores) needs the conjugate
          partner of every retained direction.
        - ``energy``: retained spectral energy (squared singular
          values) when ``rank`` is None.
    Outputs:
        - :class:`Basis`.
    """
    D = jnp.asarray(D)
    p = _is_pair(D, pair)
    tail = D.shape[1:]
    Df, _ = _flatten(D, len(tail))
    nT = Df.shape[1]
    G = jnp.matmul(Df.T, Df, precision=Precision.HIGHEST)
    if p:
        Jf = pair_rotate(Df.reshape(D.shape)).reshape(Df.shape)
        G = G + jnp.matmul(Jf.T, Jf, precision=Precision.HIGHEST)
    vals, vecs = jnp.linalg.eigh(G)
    vals, vecs = vals[::-1], vecs[:, ::-1]
    vals = jnp.maximum(vals, 0.0)
    if rank is None:
        cum = jnp.cumsum(vals)
        tot = cum[-1]
        r = int(jnp.searchsorted(cum, energy * tot)) + 1
    else:
        r = int(rank)
    if p:
        r = min(nT, r + (r % 2))
    r = max(1, min(nT, r))
    B = vecs[:, :r]
    jc = None
    if p:
        JB = pair_rotate(B.T.reshape((r,) + tail)).reshape(r, nT).T
        jc = jnp.matmul(B.T, JB, precision=Precision.HIGHEST)
    return Basis(B=B, jc=jc, s=jnp.sqrt(vals), tail=tuple(tail))


def compress(x, basis: Basis):
    r"""Project signals onto a :class:`Basis`: `(..., *tail)` → `(..., r)`.

    Works on dictionaries and probe/image data alike; inner products
    (and, for pair bases, complex inner products via ``basis.jc``) are
    preserved up to the discarded spectral energy."""
    x = jnp.asarray(x)
    tail = basis.tail
    assert x.shape[x.ndim - len(tail):] == tail, \
        (x.shape, tail, 'signal tail does not match the basis')
    xf, batch = _flatten(x, len(tail))
    out = jnp.matmul(xf, basis.B, precision=Precision.HIGHEST)
    return out.reshape(batch + (out.shape[-1],))


def _pick_chunk(nV: int, nA: int) -> int:
    r"""Probe-chunk size: cap the live `(chunk, nA)` score tile at
    ~256M elements (1 GB f32; a few such tiles are alive at once —
    measured 2× faster than 256 MB tiles at 64k atoms), keep the MXU
    row dimension ≥ 256 when possible."""
    c = max(256, (1 << 28) // max(1, nA))
    return min(nV, c)


@_functools.partial(jax.jit, static_argnames=('chunk', 'pairlike'))
def _match_flat(Dre, Dim, X, nrm, *, chunk: int, pairlike: bool):
    r"""Argmax match in the flattened (or compressed) space.

    ``Dre``/``Dim``: `(nA, nT)` unit-norm atoms (+ their i-rotation;
    ``Dim`` is ignored when not pairlike). ``X``: `(nV, nT)` probes.

    Chunks over PROBES with the full atom axis per chunk: each chunk is
    one `(chunk, nT)·(nT, nA)` MXU matmul plus a single-pass row
    max/argmax — no per-block gathers or running-best selects, which
    serialize on TPU (the atom-streaming formulation this replaces
    measured 26× off the matmul roofline). ``m0`` components are
    recovered AFTER the loop with one row-gather of the winning atoms.
    Peak memory is the `(chunk, nA)` score tile, never `(nV, nA)`."""
    nA = Dre.shape[0]
    nV, nT = X.shape
    nck = -(-nV // chunk)
    pad = nck * chunk - nV
    Xb = (jnp.pad(X, ((0, pad), (0, 0))) if pad else X).reshape(
        nck, chunk, nT)

    def body(_, xc):
        sre = jnp.matmul(xc, Dre.T, precision=Precision.HIGHEST)
        if pairlike:
            sim = jnp.matmul(xc, Dim.T, precision=Precision.HIGHEST)
            mag = sre * sre + sim * sim    # |⟨d̂,x⟩|² per (voxel, atom)
        else:
            mag = sre                      # signed real correlation
        return None, (jnp.argmax(mag, -1).astype(jnp.int32),
                      jnp.max(mag, -1))

    _, (idx, best) = jax.lax.scan(body, None, Xb)
    idx, best = idx.reshape(-1)[:nV], best.reshape(-1)[:nV]
    return _finish_match(Dre, Dim, X, nrm, idx, best,
                         pairlike=pairlike)


def _finish_match(Dre, Dim, X, nrm, idx, best, *, pairlike: bool):
    r"""score/m0 from the winning atom per probe: one row-gather, then
    row-wise dots (recomputing the two winning inner products is far
    cheaper than carrying them through the search)."""
    score = jnp.sqrt(jnp.maximum(best, 0.0)) if pairlike else best
    re = jnp.sum(jnp.take(Dre, idx, axis=0) * X, -1)
    im = (jnp.sum(jnp.take(Dim, idx, axis=0) * X, -1) if pairlike
          else jnp.zeros_like(re))
    m0 = (jnp.stack([re, im], -1)
          / jnp.maximum(nrm[idx], 1e-30)[:, None])
    return idx, score, m0


@_functools.partial(jax.jit, static_argnames=('pairlike', 'interpret',
                                              'precision'))
def _match_flat_pallas(Dre, Dim, X, nrm, *, pairlike: bool,
                       interpret: bool = False,
                       precision: str = 'highest'):
    r"""Fused-kernel search (`ops/mrf_pallas.py`): scores never touch
    HBM; m0 recovery reuses :func:`_finish_match`."""
    from mrphy_tpu.ops import mrf_pallas
    idx, best = mrf_pallas.match_core(Dre, Dim if pairlike else Dre[:1],
                                      X, pairlike=pairlike,
                                      precision=precision,
                                      interpret=interpret)
    return _finish_match(Dre, Dim, X, nrm, idx, best,
                         pairlike=pairlike)


def _use_pallas(backend: str, nA: int, nV: int, dtype) -> bool:
    from mrphy_tpu.ops import mrf_pallas
    if backend == 'pallas':
        return True
    if backend != 'auto':
        return False
    # the fused kernel wins at volume scale; below that the XLA
    # matcher is already sub-ms and compiles much faster
    return (nA >= 1024 and nV >= 32768
            and mrf_pallas.is_available(dtype=dtype))


def _prep_dict(D, pair):
    r"""`(nA, *tail)` dictionary → unit-norm flat rows (+ i-rotation for
    pairs) and the original row norms."""
    D = jnp.asarray(D)
    p = _is_pair(D, pair)
    tail = D.shape[1:]
    Df, _ = _flatten(D, len(tail))
    nrm = jnp.linalg.norm(Df, axis=1)
    Dn = Df / jnp.maximum(nrm, 1e-30)[:, None]
    Dim = (pair_rotate(Dn.reshape((Dn.shape[0],) + tail))
           .reshape(Dn.shape) if p else None)
    return Dn, Dim, nrm, p, tail


def dict_match(D, probes, *, chunk_probes: Optional[int] = None,
               pair: Optional[bool] = None, backend: str = 'auto',
               mesh=None, _pallas_interpret: bool = False
               ) -> MatchResult:
    r"""Matched-filter dictionary search.

    Inputs:
        - ``D``: `(nA, nTR, 2)` pair dictionary (or `(nA, nT)` real).
        - ``probes``: `(*batch, nTR, 2)` (or `(*batch, nT)`) measured
          evolutions — any voxel batch shape.
    Optionals:
        - ``chunk_probes``: probes per score tile (memory knob: the
          peak live tile is `(chunk, nA)` floats; default caps it at
          ~256 MB).
        - ``pair``: force/deny pair (re/im) semantics; default
          auto-detects a trailing axis of 2.
        - ``backend``: ``'auto'`` (fused Pallas kernel at volume scale
          on TPU, XLA otherwise), ``'xla'``, ``'pallas'``. The kernel
          keeps score tiles in VMEM (:mod:`mrphy_tpu.ops.mrf_pallas`).
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` —
          voxel-sharded matching (dictionary replicated, probes
          `(nV, *tail)` sharded; communication-free). See
          :func:`mrphy_tpu.parallel.mesh.dict_match_sharded_traceable`.
    Outputs:
        - :class:`MatchResult` with ``idx``/``score``/``m0`` shaped
          like the probe batch.

    Pair matching maximizes the COMPLEX modulus ``|⟨d̂, x⟩|`` — the
    result is invariant to per-voxel receive phase, which lands in
    ``m0`` instead.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import dict_match_sharded_traceable
        return dict_match_sharded_traceable(
            mesh, D, probes, chunk_probes=chunk_probes, pair=pair)
    Dn, Dim, nrm, p, tail = _prep_dict(D, pair)
    probes = jnp.asarray(probes)
    Xf, batch = _flatten(probes, len(tail))
    assert Xf.shape[-1] == Dn.shape[-1], (probes.shape, D.shape)
    Xf = Xf.reshape(-1, Xf.shape[-1])
    if _use_pallas(backend, Dn.shape[0], Xf.shape[0], Xf.dtype) \
            or _pallas_interpret:
        idx, score, m0 = _match_flat_pallas(
            Dn, Dim if p else Dn[:0], Xf, nrm, pairlike=p,
            interpret=_pallas_interpret)
    else:
        chunk = int(chunk_probes
                    or _pick_chunk(Xf.shape[0], Dn.shape[0]))
        idx, score, m0 = _match_flat(
            Dn, Dim if p else Dn[:0], Xf, nrm, chunk=chunk, pairlike=p)
    return MatchResult(idx.reshape(batch), score.reshape(batch),
                       m0.reshape(batch + (2,)))


def dict_match_compressed(Dc, probes, basis: Basis, *,
                          chunk_probes: Optional[int] = None,
                          backend: str = 'auto', mesh=None,
                          _pallas_interpret: bool = False
                          ) -> MatchResult:
    r"""Dictionary search in the compressed subspace.

    Inputs:
        - ``Dc``: `(nA, r)` compressed dictionary (``compress(D, basis)``).
        - ``probes``: raw `(*batch, *tail)` signals (compressed
          internally) or already-compressed `(*batch, r)` coefficients.
        - ``basis``: the :class:`Basis` that produced ``Dc``.
    Optionals:
        - ``mesh``: voxel-sharded matching (see :func:`dict_match`).

    Complex scores survive compression because the pair basis is
    J-invariant: ``Im⟨d, x⟩ ≈ (J_c d_c)·x_c`` with ``J_c = basis.jc``
    (exact up to the discarded spectral energy).
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import dict_match_sharded_traceable
        return dict_match_sharded_traceable(
            mesh, Dc, probes, chunk_probes=chunk_probes, basis=basis)
    Dc = jnp.asarray(Dc)
    probes = jnp.asarray(probes)
    tail = basis.tail
    r = basis.B.shape[1]
    if probes.shape[probes.ndim - len(tail):] == tail:
        Xc = compress(probes, basis)
    else:
        assert probes.shape[-1] == r, (probes.shape, tail, r)
        Xc = probes
    Xf, batch = _flatten(Xc, 1)
    Xf = Xf.reshape(-1, Xf.shape[-1])
    nrm = jnp.linalg.norm(Dc, axis=1)
    Dn = Dc / jnp.maximum(nrm, 1e-30)[:, None]
    p = basis.jc is not None
    Dim = jnp.matmul(Dn, basis.jc.T,
                     precision=Precision.HIGHEST) if p else Dn[:0]
    if _use_pallas(backend, Dn.shape[0], Xf.shape[0], Xf.dtype) \
            or _pallas_interpret:
        idx, score, m0 = _match_flat_pallas(
            Dn, Dim, Xf, nrm, pairlike=p,
            interpret=_pallas_interpret)
    else:
        chunk = int(chunk_probes
                    or _pick_chunk(Xf.shape[0], Dn.shape[0]))
        idx, score, m0 = _match_flat(Dn, Dim, Xf, nrm, chunk=chunk,
                                     pairlike=p)
    return MatchResult(idx.reshape(batch), score.reshape(batch),
                       m0.reshape(batch + (2,)))


def match_refine(signal_fn: Callable, p0, probes, *, iters: int = 200,
                 lr: float = 0.02, pair: Optional[bool] = None,
                 batched: bool = False):
    r"""Continuous parameter refinement through the signal model.

    The dictionary quantizes parameters to its grid; gradient descent
    through the simulator, started from the matched atom, recovers
    continuous values below grid resolution (the capability a lookup
    table cannot provide). Scale- and (for pairs) phase-invariant loss:
    ``−|⟨ŝ(p), x̂⟩|`` — M0/receive phase need not be parametrized.

    Inputs:
        - ``signal_fn``: maps ONE parameter vector `(nP,)` to its
          signal `(*tail)` (e.g. ``lambda p: epg_spgr(flips, phis,
          T1=exp(p[0]), T2=exp(p[1]), tr=tr)``) — vmapped internally,
          so it must be jit-traceable. With ``batched=True`` it
          instead maps the WHOLE `(nVox, nP)` parameter array to
          `(nVox, *tail)` signals — e.g. ``lambda P: epg_spgr(flips,
          None, T1=exp(P[:, 0]), T2=exp(P[:, 1]), tr=tr,
          backend='pallas')``. The per-voxel losses are independent,
          so the gradients are identical; the batched form runs ONE
          train per iteration instead of a vmap of per-voxel scans —
          and can route through the fused Pallas dictionary kernels
          (round-3 measurement: 1.7 k → 64 k voxels/s at 50 Adam
          iterations, `benchmarks/RESULTS.md`).
        - ``p0``: `(*batch, nP)` starting parameters (matched atoms).
        - ``probes``: `(*batch, *tail)` measured evolutions.
    Optionals:
        - ``iters``/``lr``: Adam schedule (one compiled ``lax.scan``).
    Outputs:
        - ``p``: `(*batch, nP)` refined parameters.
        - ``score``: `(*batch,)` final correlation (1 = perfect fit).
    """
    import optax

    p0 = jnp.asarray(p0)
    probes = jnp.asarray(probes)
    nP = p0.shape[-1]
    batch = p0.shape[:-1]
    if batched:
        probe0 = signal_fn(p0.reshape(-1, nP)[:1])
        tail = jnp.shape(probe0)[1:]
    else:
        probe0 = signal_fn(p0.reshape(-1, nP)[0])
        tail = jnp.shape(probe0)
    pr = _is_pair(jnp.asarray(probe0), pair)
    assert probes.shape[probes.ndim - len(tail):] == tuple(tail), \
        (probes.shape, tail)
    Xf = probes.reshape((-1,) + tuple(tail))
    Xf = Xf.reshape(Xf.shape[0], -1)
    Xn = Xf / jnp.maximum(jnp.linalg.norm(Xf, axis=1, keepdims=True),
                          1e-30)
    P0 = p0.reshape(-1, nP)

    def corr(p, xn, xjn):
        s = signal_fn(p).reshape(-1)
        s = s / jnp.maximum(jnp.linalg.norm(s), 1e-30)
        re = jnp.dot(s, xn, precision=Precision.HIGHEST)
        if not pr:
            return re
        im = jnp.dot(s, xjn, precision=Precision.HIGHEST)
        return jnp.sqrt(re * re + im * im + 1e-30)

    def corr_batched(P, Xn, Xjn):
        S = signal_fn(P).reshape(P.shape[0], -1)
        S = S / jnp.maximum(jnp.linalg.norm(S, axis=1, keepdims=True),
                            1e-30)
        re = jnp.sum(S * Xn, -1)
        if not pr:
            return re
        im = jnp.sum(S * Xjn, -1)
        return jnp.sqrt(re * re + im * im + 1e-30)

    Xjn = (pair_rotate(Xn.reshape((-1,) + tuple(tail)))
           .reshape(Xn.shape) if pr else jnp.zeros_like(Xn))
    opt = optax.adam(lr)
    if batched:
        # per-voxel losses are independent, so the gradient of their
        # SUM carries every voxel's own gradient — one train per
        # iteration instead of a vmap of per-voxel scans
        grad_fn = jax.grad(lambda P_, xn, xjn:
                           -jnp.sum(corr_batched(P_, xn, xjn)))

        def step_grad(P, Xn, Xjn):
            return grad_fn(P, Xn, Xjn)

        def scores(P, Xn, Xjn):
            return corr_batched(P, Xn, Xjn)
    else:
        vg = jax.vmap(jax.value_and_grad(lambda p, xn, xjn:
                                         -corr(p, xn, xjn)))

        def step_grad(P, Xn, Xjn):
            return vg(P, Xn, Xjn)[1]

        def scores(P, Xn, Xjn):
            return -vg(P, Xn, Xjn)[0]

    @jax.jit
    def run(P, Xn, Xjn):
        st = opt.init(P)

        def body(carry, _):
            P, st = carry
            g = step_grad(P, Xn, Xjn)
            up, st = opt.update(g, st)
            return (optax.apply_updates(P, up), st), None

        (P, st), _ = jax.lax.scan(body, (P, st), None, length=iters)
        return P, scores(P, Xn, Xjn)

    P, score = run(P0, Xn, Xjn)
    return P.reshape(batch + (nP,)), score.reshape(batch)


# ------------------------------------------------------------------
# k-space MRF: subspace-constrained non-Cartesian reconstruction
# (round 5). Real fingerprinting starts from undersampled k-space —
# one spoke/interleaf per TR — not from clean per-voxel time series.
# The standard fix (McGivney SVD-MRF / Assländer low-rank recon /
# the T2-shuffling construction of examples/t2shuffling.py, now for
# arbitrary non-Cartesian trajectories) constrains the temporal
# evolution to the dictionary's SVD subspace: per-voxel REAL
# coefficients α_l(x) with x_t(x) = Σ_l B[(t,·), l]·α_l(x), and the
# encoding per frame is the plan's exact NUFFT on frame t's own
# trajectory. The normal equations are solved by CG (the operator is
# PSD by construction); the reconstructed α ARE the compressed probes
# `dict_match_compressed` consumes — no decompression step exists in
# the whole pipeline. No reference counterpart.
# ------------------------------------------------------------------

def _b2(basis: Basis):
    r"""The pair basis reshaped to `(nF, 2, r)` frame slices."""
    assert len(basis.tail) == 2 and basis.tail[1] == 2, (
        basis.tail, 'k-space subspace recon needs a (nF, 2) pair '
        'basis (svd_basis of a (nA, nF, 2) dictionary)')
    r = basis.B.shape[1]
    return basis.B.reshape(basis.tail + (r,))


def subspace_encode(plan, ktrajs, basis: Basis, alpha, *, sens=None,
                    df=None, T2s=None, dt=None, nseg: int = 8,
                    mesh=None):
    r"""Forward model of the subspace-constrained dynamic acquisition:
    coefficient images → per-frame k-space samples.

    Inputs:
        - ``plan``: :class:`mrphy_tpu.ops.nufft.NufftPlan` (the shared
          image grid).
        - ``ktrajs``: `(nF, d, nRO)` — frame ``t`` samples ITS OWN
          trajectory (e.g. one golden-angle spoke per TR).
        - ``basis``: `(nF, 2)`-tailed pair :class:`Basis`.
        - ``alpha``: `(r, *im_size)` REAL coefficient images, or —
          with ``sens`` — `(r, *im_size, 2)` COMPLEX re/im pairs (coil
          phases make the coefficient maps complex; McGivney SVD-MRF
          generalized to SENSE as in Assländer MRM 79:83, 2018).
    Optionals:
        - ``sens``: `(nC, *im_size, 2)` re/im receive sensitivities —
          frame images are coil-weighted before sampling (SENSE
          forward model; every coil sees the same spoke).
        - ``df``/``T2s``/``dt``/``nseg``: off-resonance and T2* maps
          on the grid, modeled within each frame's readout by the
          NUFFT's hat time segmentation (see
          :func:`mrphy_tpu.ops.nufft.nufft`; every frame shares the
          same dwell/readout timing) — the B0-informed MRF encode.
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` —
          each frame's samples (the interpolation tap tables, the
          memory bound) shard over the spin axis; the grid stages
          replicate (see :func:`mrphy_tpu.ops.nufft.nufft`).
    Outputs:
        - ``s``: `(nF, nRO, 2)`, or `(nC, nF, nRO, 2)` with ``sens``.
    """
    from mrphy_tpu.ops.nufft import _cmul, nufft
    kw = dict(df=df, T2s=T2s, dt=dt, nseg=nseg, mesh=mesh)
    B2 = _b2(basis).astype(alpha.dtype)           # (nF, 2, r)
    if sens is None:
        def step(_, tx):
            b2, k = tx
            img = jnp.stack(
                [jnp.tensordot(b2[0], alpha, axes=(0, 0),
                               precision=Precision.HIGHEST),
                 jnp.tensordot(b2[1], alpha, axes=(0, 0),
                               precision=Precision.HIGHEST)], -1)
            return None, nufft(plan, img, k, **kw)

        return jax.lax.scan(step, None, (B2, ktrajs))[1]

    sens = jnp.asarray(sens, alpha.dtype)
    r = basis.B.shape[1]
    assert alpha.shape == (r,) + plan.im_size + (2,), (
        alpha.shape, 'with sens=, alpha must be (r, *im_size, 2) '
        'complex pairs')
    assert sens.shape[1:] == plan.im_size + (2,), (sens.shape,
                                                   plan.im_size)
    nC = sens.shape[0]

    def td(w, a):
        return jnp.tensordot(w, a, axes=(0, 0),
                             precision=Precision.HIGHEST)

    def step(_, tx):
        b2, k = tx
        # frame image (w_t = b2r + i·b2i against complex alpha)
        fr = td(b2[0], alpha[..., 0]) - td(b2[1], alpha[..., 1])
        fi = td(b2[0], alpha[..., 1]) + td(b2[1], alpha[..., 0])
        outs = []
        for c in range(nC):               # static, small; shared
            wr, wi = _cmul(fr, fi,        # interp factors CSE-merge
                           sens[c, ..., 0], sens[c, ..., 1])
            outs.append(nufft(plan, jnp.stack([wr, wi], -1), k,
                              **kw))
        return None, jnp.stack(outs)      # (nC, nRO, 2)

    s = jax.lax.scan(step, None, (B2, ktrajs))[1]
    return jnp.moveaxis(s, 1, 0)          # (nC, nF, nRO, 2)


def subspace_adjoint(plan, ktrajs, basis: Basis, s, *, dcf=None,
                     sens=None, df=None, T2s=None, dt=None,
                     nseg: int = 8, mesh=None):
    r"""Exact adjoint of :func:`subspace_encode` (Φ-weighted
    back-projection): per-frame samples → `(r, *im_size)` coefficient
    images (`(r, *im_size, 2)` complex pairs with ``sens``, which
    conj-weights and sums the per-coil back-projections). ``dcf``
    `(nRO,)` optionally density-compensates each frame's samples
    (e.g. the radial ramp ``|k|``) — then this is the classic
    one-shot sliding-window/SVD-MRF gridding estimate rather than the
    exact adjoint (use ``dcf=None`` inside CG). ``df``/``T2s``/``dt``
    keep the adjoint exact w.r.t. the segmented encode (see
    :func:`mrphy_tpu.ops.nufft.nufft_adjoint`)."""
    from mrphy_tpu.ops.nufft import _cmul, nufft_adjoint
    kw = dict(df=df, T2s=T2s, dt=dt, nseg=nseg, mesh=mesh)
    B2 = _b2(basis).astype(s.dtype)
    r = basis.B.shape[1]
    if sens is None:
        def step(acc, tx):
            b2, k, st = tx
            if dcf is not None:
                st = st * dcf[:, None]
            bp = nufft_adjoint(plan, st, k, **kw)  # (*im, 2)
            upd = (jnp.tensordot(b2[0], bp[..., 0], axes=0,
                                 precision=Precision.HIGHEST)
                   + jnp.tensordot(b2[1], bp[..., 1], axes=0,
                                   precision=Precision.HIGHEST))
            return acc + upd, None

        acc0 = jnp.zeros((r,) + plan.im_size, s.dtype)
        return jax.lax.scan(step, acc0, (B2, ktrajs, s))[0]

    sens = jnp.asarray(sens, s.dtype)
    nC = sens.shape[0]
    assert s.shape[0] == nC and s.ndim == 4, (s.shape, nC)

    def t0(w, a):
        return jnp.tensordot(w, a, axes=0, precision=Precision.HIGHEST)

    def step(acc, tx):
        b2, k, st = tx                            # st: (nC, nRO, 2)
        if dcf is not None:
            st = st * dcf[:, None]
        br = jnp.zeros(plan.im_size, s.dtype)
        bi = jnp.zeros(plan.im_size, s.dtype)
        for c in range(nC):                       # static, small
            bp = nufft_adjoint(plan, st[c], k, **kw)
            xr, xi = _cmul(bp[..., 0], bp[..., 1],      # conj(S_c)⊙bp
                           sens[c, ..., 0], -sens[c, ..., 1])
            br, bi = br + xr, bi + xi
        # conj(w_t) · (br + i·bi) per subspace row
        upr = t0(b2[0], br) + t0(b2[1], bi)
        upi = t0(b2[0], bi) - t0(b2[1], br)
        return acc + jnp.stack([upr, upi], -1), None

    acc0 = jnp.zeros((r,) + plan.im_size + (2,), s.dtype)
    return jax.lax.scan(step, acc0,
                        (B2, ktrajs, jnp.moveaxis(s, 0, 1)))[0]


def kspace_subspace_recon(plan, ktrajs, basis: Basis, s, *,
                          iters: int = 8, lam: float = 0.0,
                          method: str = 'auto', G=None, sens=None,
                          df=None, T2s=None, dt=None, nseg: int = 8,
                          mesh=None):
    r"""Subspace-constrained least-squares reconstruction of
    undersampled dynamic (MRF) k-space by CG on the normal equations
    ``(AᵀA + λI) α = Aᵀ s`` with ``A`` = :func:`subspace_encode`.

    Inputs:
        - ``s``: `(nF, nRO, 2)` measured samples (frame ``t`` on
          ``ktrajs[t]``).
    Optionals:
        - ``iters``: CG iterations (each costs one fwd+adj sweep over
          all frames; 8 suffices for matching-grade α at 4-8× radial
          undersampling — pinned by ``tests/test_mrf.py``).
        - ``lam``: Tikhonov weight (0 = plain least squares).
        - ``method``: ``'frames'`` applies the normal operator as
          encode∘adjoint sweeps (2·nF NUFFTs per CG iteration,
          ~11 ms at 128² × 400 spokes); ``'toeplitz'`` prebuilds the
          factored spectral kernels
          (:func:`subspace_toeplitz_kernels`; ~88 ms, one frame
          sweep) after which every iteration costs 2r `(2n)`-grid
          DFT pairs + r² spectral multiplies (~0.2 ms) —
          frame-count-independent and exact-encoding (vs the plan's
          ~1e-3 KB interpolation). ``'auto'`` picks toeplitz at ≥8
          iterations or when a prebuilt ``G`` is passed.
        - ``G``: precomputed :func:`subspace_toeplitz_kernels` output
          — reuse it across slices/datasets acquired with the SAME
          spoke schedule (the multi-slice MRF pattern): the recon
          then costs iterations only. ``G`` depends ONLY on spokes +
          basis, so the same kernels serve the SENSE path too.
        - ``sens``: `(nC, *im_size, 2)` receive sensitivities — SENSE
          reconstruction from multi-coil samples
          `(nC, nF, nRO, 2)`. The normal operator becomes
          ``Σ_c S_cᴴ (AᵀA) S_c`` (one per-coil sandwich around the
          SAME Toeplitz kernels) and the coefficient images come back
          complex.
        - ``df``/``T2s``/``dt``/``nseg``: B0/T2* maps — the encode
          models the in-readout phase accrual by time segmentation
          and the recon deblurs it (conjugate-phase-in-CG; forces
          ``method='frames'``, the Toeplitz kernels don't model
          segmentation).
    Outputs:
        - ``alpha``: `(r, *im_size)` coefficient images
          (`(r, *im_size, 2)` complex pairs with ``sens``) — directly
          the compressed probes for :func:`dict_match_compressed`
          (transpose the leading axis to the back; for the pair form
          the compressed probe is ``α_re + jc·α_im``, see
          ``examples/mrf_kspace.py --coils``).
    """
    assert method in ('auto', 'frames', 'toeplitz'), method
    seg = df is not None or T2s is not None
    if method == 'auto':
        # kernel BUILD costs ~one frame sweep, each iteration then
        # ~nothing (measured 128^2 x 400 spokes: build 88 ms, apply
        # 0.2 ms vs ~11 ms/iter for the frame sweep) -> toeplitz
        # pays off above ~8 iterations, or immediately with a
        # precomputed/reused G (multi-slice: same spokes per slice)
        method = ('frames' if seg
                  else 'toeplitz' if G is not None or iters >= 8
                  else 'frames')
    assert not (seg and method == 'toeplitz'), (
        'the Toeplitz kernels do not model df/T2s time segmentation '
        "(cross-segment kernels would cost r^2*nseg^2 grids); use "
        "method='frames'")
    kw = dict(df=df, T2s=T2s, dt=dt, nseg=nseg, mesh=mesh)
    if sens is not None:
        sens = jnp.asarray(sens, jnp.asarray(s).dtype)
    if method == 'toeplitz':
        from mrphy_tpu.ops.nufft import _cmul
        if G is None:
            G = subspace_toeplitz_kernels(plan, ktrajs, basis)

        def normal(al):
            if sens is None:
                out = subspace_toeplitz_apply(plan, G, al)
            else:
                out = jnp.zeros_like(al)
                for c in range(sens.shape[0]):    # static, small
                    sr, si = sens[c, ..., 0], sens[c, ..., 1]
                    xr, xi = _cmul(al[..., 0], al[..., 1], sr, si)
                    y = subspace_toeplitz_apply(
                        plan, G, jnp.stack([xr, xi], -1))
                    zr, zi = _cmul(y[..., 0], y[..., 1], sr, -si)
                    out = out + jnp.stack([zr, zi], -1)
            return out + lam * al if lam else out
    else:
        def normal(al):
            out = subspace_adjoint(plan, ktrajs, basis,
                                   subspace_encode(plan, ktrajs,
                                                   basis, al,
                                                   sens=sens, **kw),
                                   sens=sens, **kw)
            return out + lam * al if lam else out

    rhs = subspace_adjoint(plan, ktrajs, basis, s, sens=sens, **kw)

    def dot(a, b):
        # operand-dtype accumulation: truncating to f32 would cap an
        # f64 solve's achievable residual for no reason
        return jnp.sum(a * b)

    def body(carry, _):
        al, rr, p, rs = carry
        Ap = normal(p)
        alf = rs / jnp.maximum(dot(p, Ap), 1e-30)
        al = al + alf * p
        rr = rr - alf * Ap
        rs_new = dot(rr, rr)
        p = rr + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (al, rr, p, rs_new), None

    al0 = jnp.zeros_like(rhs)
    st0 = (al0, rhs, rhs, dot(rhs, rhs))
    (al, _, _, _), _ = jax.lax.scan(body, st0, None, length=iters)
    return al


def slice_profile_integrate(gen, pars: dict, profile, *, b1=None,
                            weights=None):
    r"""Slice-profile-integrated dictionary (round 5): the acquired
    voxel signal is the through-slice integral of evolutions at the
    LOCAL flip scale ``p(z) = α(z)/α_nom``, not the nominal-flip
    evolution — naive dictionaries bias MRF maps (Ma et al.,
    MRM 78:1781, 2017). This composes the correction from the fused
    kernels' existing per-atom ``b1`` axis: atoms are tiled ``nS``
    sub-slices wide, ONE fused train runs at `(nA·nS,)` effective
    flip scales, and the readout is a weighted sum — no kernel
    change, exact for any profile.

    Inputs:
        - ``gen``: dictionary generator called as ``gen(b1=b1_eff,
          **pars_tiled)`` → `(nA·nS, nT, ...)` (e.g. a lambda over
          :func:`mrphy_tpu.ops.epg.epg_spgr` with
          ``backend='pallas'``).
        - ``pars``: per-atom kwargs — `(nA,)` arrays (tiled
          internally) or scalars (passed through).
        - ``profile``: `(nS,)` flip-scale samples ``α(z_j)/α_nom``
          across the slice (from a Bloch sim of the actual excitation
          pulse; the shape-invariance of small-tip profiles makes one
          profile valid for the whole variable-flip train).
    Optionals:
        - ``b1``: `(nA,)` transmit scale (the B1+ dictionary axis) —
          composes multiplicatively with the profile.
        - ``weights``: `(nS,)` sub-slice quadrature weights
          (default: uniform; normalized internally).
    Outputs:
        - ``D``: `(nA, nT, ...)` profile-integrated dictionary.
    """
    profile = jnp.asarray(profile)
    nS = profile.shape[0]
    nA = max([1] + [jnp.shape(v)[0] for v in pars.values()
                    if jnp.ndim(v) >= 1])
    parsE = {k: (jnp.repeat(jnp.asarray(v), nS)
                 if jnp.ndim(v) >= 1 else v)
             for k, v in pars.items()}
    b1a = (jnp.ones((nA,), profile.dtype) if b1 is None
           else jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(b1)),
                                 (nA,)))
    b1E = (b1a[:, None] * profile[None, :]).reshape(-1)
    D = gen(b1=b1E, **parsE)                     # (nA*nS, nT, ...)
    w = (jnp.full((nS,), 1.0 / nS, D.dtype) if weights is None
         else jnp.asarray(weights, D.dtype)
         / jnp.sum(jnp.asarray(weights, D.dtype)))
    Ds = D.reshape((nA, nS) + D.shape[1:])
    return jnp.einsum('as...,s->a...', Ds, w,
                      precision=Precision.HIGHEST)


def subspace_toeplitz_kernels(plan, ktrajs, basis: Basis, *,
                              chunk: int = 4096):
    r"""Spectral kernels of the subspace normal operator,
    Toeplitz-factored (round 5): ``G_ll' = Σ_t conj(w_tl)·w_tl'·T̂_t``
    with ``w_tl = B[(t,re),l] + i·B[(t,im),l]`` and ``T̂_t`` frame
    ``t``'s exact Toeplitz spectrum
    (:func:`mrphy_tpu.ops.nufft.toeplitz_kernel`). One sweep over the
    frames builds `(r, r, *2n, 2)` kernels; afterwards EVERY
    application of ``AᵀA`` costs ``r`` forward + ``r`` inverse
    `(2n)`-grid DFT pairs and ``r²`` spectral multiplies —
    independent of the number of frames (the frame-sweep operator
    pays ``2·nF`` NUFFTs per CG iteration instead).

    Note the Toeplitz path realizes the normal operator of the EXACT
    encoding ``e^{−i2πk·x}`` (zero gridding error), while
    :func:`subspace_encode` carries the plan's Kaiser–Bessel
    interpolation error (~1e-3 at width 4) — for measured data the
    Toeplitz operator is the more faithful one.
    """
    from mrphy_tpu.ops.nufft import toeplitz_kernel
    B2 = _b2(basis)                                # (nF, 2, r)
    r = basis.B.shape[1]
    d = plan.ndim
    shape2n = tuple(2 * n for n in plan.im_size)
    dtype = jnp.asarray(ktrajs).dtype

    def step(G, tx):
        b2, k = tx
        that = toeplitz_kernel(plan, k, chunk=chunk)
        wr, wi = b2[0].astype(dtype), b2[1].astype(dtype)
        cr = (wr[:, None] * wr[None] + wi[:, None] * wi[None]
              ).reshape((r, r) + (1,) * d)
        ci = (wr[:, None] * wi[None] - wi[:, None] * wr[None]
              ).reshape((r, r) + (1,) * d)
        tr_, ti_ = that[..., 0], that[..., 1]
        Gr = G[..., 0] + cr * tr_ - ci * ti_
        Gi = G[..., 1] + cr * ti_ + ci * tr_
        return jnp.stack([Gr, Gi], -1), None

    G0 = jnp.zeros((r, r) + shape2n + (2,), dtype)
    return jax.lax.scan(step, G0, (B2, jnp.asarray(ktrajs)))[0]


def subspace_toeplitz_apply(plan, G, alpha):
    r"""Apply the Toeplitz-factored subspace normal operator:
    ``out_l = Re crop F⁻¹ Σ_l' G_ll' · F pad(α_l')`` — exactly
    ``subspace_adjoint ∘ subspace_encode`` with the plan's
    interpolation replaced by the exact encoding (see
    :func:`subspace_toeplitz_kernels`). ``alpha`` may be REAL
    `(r, *im_size)` or a COMPLEX pair `(r, *im_size, 2)` (the SENSE
    path's coefficient images) — the pair form skips the Re crop and
    returns a pair."""
    from mrphy_tpu.ops.nufft import _dft2n, _dft_axis
    alpha = jnp.asarray(alpha)
    pair = alpha.shape[1:] == plan.im_size + (2,)
    assert pair or alpha.shape[1:] == plan.im_size, (alpha.shape,
                                                     plan.im_size)
    dtype = alpha.dtype
    pads = [(0, 0)] + [(0, n) for n in plan.im_size]
    if pair:
        xr = jnp.pad(alpha[..., 0], pads)
        xi = jnp.pad(alpha[..., 1], pads)
    else:
        xr = jnp.pad(alpha, pads)
        xi = jnp.zeros_like(xr)
    for a, n in enumerate(plan.im_size):
        mr, mi = _dft2n(2 * n, dtype)
        xr, xi = _dft_axis(xr, xi, mr, mi, a + 1)
    Gr, Gi = G[..., 0].astype(dtype), G[..., 1].astype(dtype)
    yr = (jnp.einsum('lk...,k...->l...', Gr, xr, precision=Precision.HIGHEST)
          - jnp.einsum('lk...,k...->l...', Gi, xi,
                       precision=Precision.HIGHEST))
    yi = (jnp.einsum('lk...,k...->l...', Gr, xi, precision=Precision.HIGHEST)
          + jnp.einsum('lk...,k...->l...', Gi, xr,
                       precision=Precision.HIGHEST))
    scale = 1.0
    for a, n in enumerate(plan.im_size):
        mr, mi = _dft2n(2 * n, dtype)
        yr, yi = _dft_axis(yr, yi, mr.T, -mi.T, a + 1)
        scale /= 2 * n
    sl = (slice(None),) + tuple(slice(0, n) for n in plan.im_size)
    if pair:
        return jnp.stack([yr[sl], yi[sl]], -1) * scale
    return yr[sl] * scale
