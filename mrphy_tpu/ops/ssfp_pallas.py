r"""Fused Pallas TPU kernel for transient balanced-SSFP trains
(bSSFP-MRF dictionary generation).

Why a kernel: :func:`mrphy_tpu.ops.ssfp.bssfp_train`'s XLA ``lax.scan``
round-trips the `(nAtoms, 3)` magnetization plus every per-TR
broadcast through HBM each TR. A bSSFP-MRF dictionary carries the
off-resonance dimension on top of (T1, T2) — Ma et al.'s original MRF
sequence (Nature 495:187, 2013) — so atom counts run LARGER than the
FISP dictionaries (``T1 × T2 × df (× B1)`` grids), and the per-TR math
is tiny (~30 flops): the scan is pure memory traffic. This kernel keeps
each tile's magnetization in registers across the whole train and
streams out only the echoes.

Layout: unlike the EPG kernels (:mod:`mrphy_tpu.ops.epg_pallas`, which
spend the sublane axis on configuration orders), a bSSFP voxel is ONE
isochromat — three state planes and no k-shift — so the atom batch
fills the full `(8, 128·k)` tile: atoms ride sublanes AND lanes
(8·tile atoms per grid step). Per-TR RF-rotation coefficients are
scalars from SMEM (flips/phases are the train, shared across the
dictionary); per-atom relaxation/precession factors enter as
`(8, tile)` planes.

Two precession modes, chosen statically from the input shapes:

- constant TR/TE (scalars): the 8 relax/precess factors per atom
  (cos/sin/E2/E1-recovery at TE and at TR−TE) are precomputed by the
  dispatcher — the kernel runs ZERO transcendentals per TR (B1-less).
- variable TR/TE trains (`(nTR,)` — variable-TR bSSFP-MRF): the kernel
  computes them from per-atom rates (R1, R2, −2π·df) and the SMEM
  te/rem durations — 8 transcendentals per atom·TR.

Scope (asserted by the dispatcher): shared 1-D ``flips``/``phis``
trains, 1-D atom batch, equilibrium start. The kernel itself is
forward-only; the public dispatcher wraps it in the recompute-through-
XLA VJP (``ops/_diffwrap.py``), so ``backend='pallas'`` trains are
differentiable — kernel-speed forwards, one XLA-speed reverse. Parity
with the XLA engine is pinned in ``tests/test_ssfp.py`` and on-chip
by ``benchmarks/tpu_checks.py::bssfp_dict_kernel``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['bssfp_train_pallas']

_LANE = 128
_SUB = 8
_VMEM_LIMIT = 100 * 1024 * 1024
_UNROLL = 8      # Mosaic fori_loop can't unroll; do it manually


def _nexpm1(x):
    r"""``expm1(-x)`` for ``x ≥ 0`` without the ``expm1`` primitive
    (Mosaic has no TPU lowering for it): 6-term Taylor below 0.17
    (series tail < 8e-9 — f32-exact where ``exp(-x) - 1`` cancels),
    plain ``exp(-x) - 1`` above (cancellation harmless there)."""
    t = -x * (1 + x * (-1 / 2 + x * (1 / 6 + x * (
        -1 / 24 + x * (1 / 120 - x * (1 / 720))))))
    return jnp.where(x < 0.17, t, jnp.exp(-x) - 1)


def _bssfp_kernel(nTR: int, has_b1: bool, vartr: bool,
                  coef_ref, pk_ref, outr_ref, outi_ref):
    r"""One `(8, tile)` atom tile: the whole train with (Mx, My, Mz)
    as loop carry (registers — never HBM). RF rotation about
    ``u = (cosφ, sinφ, 0)`` by ``−α`` is Rodrigues with shared scalar
    coefficients (per-atom trig only under ``has_b1``)."""
    if vartr:
        R1, R2 = pk_ref[0], pk_ref[1]
        om, M0 = pk_ref[2], pk_ref[3]
        b1 = pk_ref[4]
    else:
        cte, ste = pk_ref[0], pk_ref[1]
        E2te, a1te = pk_ref[2], pk_ref[3]
        crem, srem = pk_ref[4], pk_ref[5]
        E2rem, a1rem = pk_ref[6], pk_ref[7]
        M0, b1 = pk_ref[8], pk_ref[9]

    def step(t, M):
        Mx, My, Mz = M
        cphi, sphi = coef_ref[5, t], coef_ref[6, t]
        if has_b1:
            al = coef_ref[7, t] * b1             # (8, TA) per-atom flip
            ca, sa = jnp.cos(al), jnp.sin(al)
            A, B = sa * sphi, sa * cphi
            oc = 1 - ca
            vc, vs = oc * cphi, oc * sphi
        else:
            ca, A, B = coef_ref[0, t], coef_ref[1, t], coef_ref[2, t]
            vc, vs = coef_ref[3, t], coef_ref[4, t]

        # uϕrot(u_φ, −α): M' = ca·M − sa·(u×M) + (1−ca)·u·(u·M)
        dot = cphi * Mx + sphi * My
        Mx1 = ca * Mx - A * Mz + vc * dot
        My1 = ca * My + B * Mz + vs * dot
        Mz1 = ca * Mz + A * Mx - B * My

        if vartr:
            ten, remn = coef_ref[8, t], coef_ref[9, t]
            phi = om * ten
            cte_t, ste_t = jnp.cos(phi), jnp.sin(phi)
            E2te_t = jnp.exp(-ten * R2)
            a1te_t = -_nexpm1(ten * R1)
            phi = om * remn
            crem_t, srem_t = jnp.cos(phi), jnp.sin(phi)
            E2rem_t = jnp.exp(-remn * R2)
            a1rem_t = -_nexpm1(remn * R1)
        else:
            cte_t, ste_t, E2te_t, a1te_t = cte, ste, E2te, a1te
            crem_t, srem_t = crem, srem
            E2rem_t, a1rem_t = E2rem, a1rem

        # precess/relax to TE (freeprec semantics: φ = −2π·df·te)
        MxE = E2te_t * (cte_t * Mx1 - ste_t * My1)
        MyE = E2te_t * (ste_t * Mx1 + cte_t * My1)
        MzE = (1 - a1te_t) * Mz1 + a1te_t * M0

        # echo, demodulated by the transmit phase
        outr_ref[pl.ds(t, 1), :, :] = (cphi * MxE + sphi * MyE)[None]
        outi_ref[pl.ds(t, 1), :, :] = (cphi * MyE - sphi * MxE)[None]

        # precess/relax over the TR remainder
        Mx2 = E2rem_t * (crem_t * MxE - srem_t * MyE)
        My2 = E2rem_t * (srem_t * MxE + crem_t * MyE)
        Mz2 = (1 - a1rem_t) * MzE + a1rem_t * M0
        return (Mx2, My2, Mz2)

    u = math.gcd(nTR, _UNROLL)

    def body(j, M):
        for jj in range(u):
            M = step(j * u + jj, M)
        return M

    zero = jnp.zeros_like(M0)
    jax.lax.fori_loop(0, nTR // u, body, (zero, zero, M0))


@functools.partial(jax.jit, static_argnames=('tile', 'interpret',
                                             'has_b1', 'vartr'))
def _bssfp_dispatch(flips, phis, trs, tes, T1, T2, df, M0, b1, *,
                    tile: int, interpret: bool, has_b1: bool,
                    vartr: bool):
    from mrphy_tpu import pi

    nTR = flips.shape[0]
    nA = T1.shape[0]
    f32 = jnp.float32
    # pad the train to a multiple of _UNROLL so the manual unroll never
    # degrades to gcd(nTR, 8) = 1 on odd/prime train lengths: the train
    # is causal (echo t depends on flips[0..t] only), so appended
    # zero-flip TRs cannot perturb the first nTR echoes, which are all
    # we return.
    tpad = (-nTR) % _UNROLL
    if tpad:
        flips = jnp.pad(flips, (0, tpad))
        phis = jnp.pad(phis, (0, tpad))
        trs = jnp.pad(trs, (0, tpad), constant_values=1.0)
        tes = jnp.pad(tes, (0, tpad), constant_values=0.5)
    nTRp = nTR + tpad
    flips, phis = flips.astype(f32), phis.astype(f32)
    ca, sa = jnp.cos(flips), jnp.sin(flips)
    cphi, sphi = jnp.cos(phis), jnp.sin(phis)
    rows = [ca, sa * sphi, sa * cphi, (1 - ca) * cphi, (1 - ca) * sphi,
            cphi, sphi, flips]
    if vartr:
        rows += [tes.astype(f32), (trs - tes).astype(f32)]
    coef = jnp.stack(rows)                       # (8|10, nTR)

    T1, T2 = T1.astype(f32), T2.astype(f32)
    om = (-(2 * pi) * df).astype(f32)
    M0a = jnp.broadcast_to(jnp.asarray(M0, f32), (nA,))
    if vartr:
        planes = [1 / T1, 1 / T2, om, M0a,
                  jnp.broadcast_to(jnp.asarray(b1, f32), (nA,))]
    else:
        te, rem = tes[0], trs[0] - tes[0]
        planes = [jnp.cos(om * te), jnp.sin(om * te),
                  jnp.exp(-te / T2), -jnp.expm1(-te / T1),
                  jnp.cos(om * rem), jnp.sin(om * rem),
                  jnp.exp(-rem / T2), -jnp.expm1(-rem / T1),
                  M0a, jnp.broadcast_to(jnp.asarray(b1, f32), (nA,))]
    pk = jnp.stack([jnp.broadcast_to(p, (nA,)) for p in planes])
    pk = pk.astype(f32)

    blk = _SUB * tile
    pad = (-nA) % blk
    if pad:                     # zero pads are inert: a1 = 0, M0 = 0
        pk = jnp.pad(pk, [(0, 0), (0, pad)])
    nAp = nA + pad
    nP = pk.shape[0]
    pk = pk.reshape(nP, nAp // tile, tile)

    # NB both output blocks are full (nTRp, 8, tile) VMEM residents
    # (~8 KB per TR at tile=128 for the pair), so trains beyond ~6k TR
    # hit the VMEM cap at compile time — far above any MRF train.
    out = pl.BlockSpec((nTRp, _SUB, tile), lambda i: (0, i, 0))
    outr, outi = pl.pallas_call(
        functools.partial(_bssfp_kernel, nTRp, has_b1, vartr),
        grid=(nAp // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((nP, _SUB, tile), lambda i: (0, i, 0))],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((nTRp, nAp // tile, tile),
                                        f32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(coef, pk)
    outr = outr.reshape(nTRp, nAp)[:nTR, :nA]
    outi = outi.reshape(nTRp, nAp)[:nTR, :nA]
    return jnp.stack([outr, outi], -1)           # (nTR, nA, 2)


def bssfp_train_pallas(flips, *, T1, T2, tr, df=0.0, te=None,
                       phis=None, dphi=None, M0=1.0, b1=None,
                       tile: int = 128, interpret=None):
    r"""Fused-TPU transient bSSFP train — off-resonance-sensitive
    (Ma 2013) MRF dictionaries at volume scale.

    Same semantics as :func:`mrphy_tpu.ops.ssfp.bssfp_train` restricted
    to the dictionary workload: shared 1-D ``flips``/``phis`` `(nTR,)`
    trains, 1-D atom batch ``T1``/``T2``/``df``/``M0`` `(nAtoms,)`
    (scalars broadcast), equilibrium start. ``tr``/``te`` may be
    scalars (zero in-kernel transcendentals) or `(nTR,)` variable
    trains (computed in-kernel). ``b1`` `(nAtoms,)` scales the whole
    flip train per atom — the dictionary's B1+ dimension (equivalent
    to the XLA path's batched ``b1[:, None] * flips``). Returns
    `(nAtoms, nTR, 2)`. Forward-only (use the XLA backend for
    gradients). ``tile`` lanes × 8 sublanes of atoms per grid step.
    """
    from mrphy_tpu import pi as _pi
    if interpret is None:
        from mrphy_tpu.ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    flips = jnp.asarray(flips)
    assert flips.ndim == 1, 'pallas backend needs a shared (nTR,) train'
    nTR = flips.shape[0]
    f32 = jnp.float32
    if phis is None:
        # identical arithmetic to the XLA path's default schedule
        dphi = _pi if dphi is None else dphi
        phis = jnp.asarray(dphi, f32) * jnp.arange(nTR, dtype=f32)
    else:
        assert dphi is None, 'phis and dphi are mutually exclusive'
        phis = jnp.asarray(phis)
        assert phis.shape == flips.shape, (phis.shape, flips.shape)
    vartr = (jnp.ndim(tr) == 1) or (te is not None and jnp.ndim(te) == 1)
    trs = jnp.broadcast_to(jnp.asarray(tr, f32), (nTR,))
    tes = trs / 2 if te is None else jnp.broadcast_to(
        jnp.asarray(te, f32), (nTR,))
    pars = [jnp.atleast_1d(jnp.asarray(x, f32)) for x in
            (T1, T2, df, M0, 1.0 if b1 is None else b1)]
    nA = max(p.shape[0] for p in pars)
    pars = [jnp.broadcast_to(p, (nA,)) for p in pars]
    assert tile % _LANE == 0, f'tile must be a multiple of {_LANE}'
    sig = _bssfp_dispatch(flips, phis, trs, tes, *pars, tile=tile,
                          interpret=interpret, has_b1=b1 is not None,
                          vartr=vartr)
    return jnp.moveaxis(sig, 1, 0)               # (nA, nTR, 2)
