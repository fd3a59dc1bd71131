r"""Fused Pallas TPU kernel for dictionary matching.

The XLA matcher (:func:`mrphy_tpu.ops.mrf.dict_match`) materializes the
`(chunk, nA)` score tiles in HBM; at volume scale the score traffic
dominates (1M voxels × 64k atoms ≈ 275 GB per score array, several
round trips — measured ~1.3 s, HBM/MXU-pass-bound). This kernel fuses
score + modulus + running argmax in VMEM:

- tiles are ``(A atoms on sublanes) × (V voxels on lanes)``;
- each tile is two MXU ``dot_general``s ``(A, r) @ (r, V)`` (the
  real and i-rotated atom blocks against the probe block);
- ``|score|²`` and the tile max/argmax happen in registers; only the
  per-voxel running best (two `(1, V)` rows) ever reaches the output.

HBM traffic is one read of the dictionary per (wide) voxel tile and one
read of the probes — the score matrix never exists in memory. The MXU
cost is inherently pass-padded (the compressed rank r ≪ 128 contraction
depth), so the dot precision is a real lever: ``precision='high'``
(bf16x3 via an explicit hi/lo split — Mosaic rejects
``Precision.HIGH``) halves the passes of ``'highest'`` (bf16x6) at
~1e-5 relative score error. Measured on-chip at 1M voxels × 65k atoms
× r=16: XLA 1319 ms (HBM-bound: 275 GB of score tiles) → fused 1185 ms
at ``'highest'`` (≈90% of the pass-padded MXU roofline for bf16x6) →
717 ms at ``'high'``. That sounds small, but realistic
dictionaries are NEAR-DEGENERATE: measured on a 6k-atom SPGR grid it
flips 3.7% of argmax winners between signal-equivalent neighbors
(score parity 1.3e-5 — the flips are exact near-ties, so maps are
unaffected). Default is therefore ``'highest'`` — bit-comparable
with the XLA/HIGHEST matcher (argmax-parity-checked in
``benchmarks/tpu_checks.py``) — with ``'high'`` an opt-in 2× knob
for when tie identity doesn't matter.

Scope: TPU backend, f32 (CPU tests via ``interpret=True``). Matching is
a forward-only lookup (argmax is piecewise constant), so there is no
VJP to provide.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['is_available', 'match_core']

_DEF_VT = 512          # voxels per tile (lane extent, multiple of 128)
_DEF_AT = 1024         # atoms per tile (sublane extent)


def _dot_hi(a, b, dims):
    r"""bf16x3 f32 dot (3 MXU passes). Mosaic's ``dot_general`` rejects
    ``Precision.HIGH``, so emulate it: split each f32 operand into a
    bf16 hi half (exact truncation) + bf16 lo remainder and sum the
    three significant products in f32. Drops only the lo·lo term
    (≲2⁻¹⁸ relative) — half the passes of HIGHEST (bf16x6)."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    ah = a.astype(bf16)
    al = (a - ah.astype(f32)).astype(bf16)
    bh = b.astype(bf16)
    bl = (b - bh.astype(f32)).astype(bf16)

    def d(u, v):
        return jax.lax.dot_general(u, v, dims,
                                   preferred_element_type=f32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _dot_highest(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


_PREC = {'high': _dot_hi, 'highest': _dot_highest}


def is_available(*, dtype) -> bool:
    r"""Pallas matcher gate: TPU platform, f32 scores."""
    try:
        on_tpu = jax.devices()[0].platform.startswith(('tpu', 'axon'))
    except RuntimeError:
        on_tpu = False
    return on_tpu and dtype == jnp.float32


def _match_kernel(pairlike: bool, at: int, nA_true: int, dot,
                  dre, dim, x, mag_ref, idx_ref):
    j = pl.program_id(1)                       # atom tile (accumulate)
    arow = (j * at + jax.lax.broadcasted_iota(jnp.int32, (at, 1), 0)
            ).astype(jnp.float32)              # global atom index
    dims = (((1,), (0,)), ((), ()))
    sre = dot(dre[...], x[...], dims)
    if pairlike:
        sim = dot(dim[...], x[...], dims)
        mag = sre * sre + sim * sim            # (at, V)
    else:
        mag = sre
    mag = jnp.where(arow < float(nA_true), mag, -jnp.inf)
    tmax = jnp.max(mag, axis=0, keepdims=True)            # (1, V)
    # first-max index within the tile (min global index among hits —
    # matches jnp.argmax's first-occurrence tie rule)
    tidx = jnp.min(jnp.where(mag >= tmax, arow, jnp.inf),
                   axis=0, keepdims=True)                 # (1, V)

    @pl.when(j == 0)
    def _():
        mag_ref[...] = jnp.full_like(mag_ref, -jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    upd = tmax > mag_ref[...]
    idx_ref[...] = jnp.where(upd, tidx, idx_ref[...])
    mag_ref[...] = jnp.where(upd, tmax, mag_ref[...])


def match_core(Dre, Dim, X, *, pairlike: bool, at: int = _DEF_AT,
               vt: int = _DEF_VT, precision: str = 'highest',
               interpret: bool = False):
    r"""Fused argmax match: unit-norm atoms ``Dre``/``Dim`` `(nA, r)`
    (``Dim`` ignored when not pairlike), probes ``X`` `(nV, r)` →
    ``(idx int32, best)`` per voxel, where ``best`` is ``|⟨d̂, x⟩|²``
    (pairlike) or the signed correlation (real)."""
    nA, r = Dre.shape
    nV = X.shape[0]
    f32 = jnp.float32
    at = min(at, max(8, -(-nA // 8) * 8))
    vt = min(vt, max(128, -(-nV // 128) * 128))
    padA = (-nA) % at
    padV = (-nV) % vt
    if padA:
        Dre = jnp.pad(Dre, ((0, padA), (0, 0)))
        if pairlike:
            Dim = jnp.pad(Dim, ((0, padA), (0, 0)))
    if not pairlike:
        Dim = Dre[:1]                          # unused placeholder
    Xt = jnp.pad(X.T, ((0, 0), (0, padV))).astype(f32)
    nat, nvt = (nA + padA) // at, (nV + padV) // vt

    atom = pl.BlockSpec((at, r), lambda i, j: (j, 0))
    kern = functools.partial(_match_kernel, pairlike, at, nA,
                             _PREC[precision])
    mag, idx = pl.pallas_call(
        kern,
        grid=(nvt, nat),
        in_specs=[atom, atom if pairlike
                  else pl.BlockSpec((1, r), lambda i, j: (0, 0)),
                  pl.BlockSpec((r, vt), lambda i, j: (0, i))],
        out_specs=[pl.BlockSpec((1, vt), lambda i, j: (0, i)),
                   pl.BlockSpec((1, vt), lambda i, j: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((1, nV + padV), f32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(Dre.astype(f32), Dim.astype(f32), Xt)
    return idx[0, :nV].astype(jnp.int32), mag[0, :nV]
