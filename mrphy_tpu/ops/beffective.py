r"""B-effective assembly and rotation extraction.

Feature parity with ``/root/reference/mrphy/beffective.py``:

- :func:`rfgr2beff` — assemble B-effective from RF + gradients + locations,
  with off-resonance and multi-coil transmit-sensitivity (B1) mixing
  (ref ``beffective.py:107-168``). The gradient·location term and the
  coil mixing are expressed as batched contractions (``einsum``) that XLA
  maps onto the MXU.
- :func:`beff2uphi` — rotation axis/angle from B-effective
  (ref ``beffective.py:18-37``).
- :func:`beff2ab` — Hargreaves affine propagator (A, B) such that
  ``M_out = A @ M_in + B`` over a whole pulse (doi:10.1002/mrm.1170;
  ref ``beffective.py:40-104``), as a ``lax.scan`` over time.
- :func:`beff2ab_assoc` — the same propagator via
  ``lax.associative_scan``: affine-map composition is associative, so the
  time axis (strictly sequential in the reference's Python loop,
  ``beffective.py:88``) evaluates in O(log nT) parallel depth. This is the
  TPU-idiomatic "sequence-axis" scaling strategy (SURVEY §2.9/§5.7);
  it trades O(nT·9·nSpins) extra memory for parallel time.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi
from mrphy_tpu._kwalias import kwalias
from mrphy_tpu.utils import uphirot
from mrphy_tpu.utils._shapes import rshape

# NB: Python NFKC-normalizes identifiers, so source code written with
# either reference spelling (`beff2uϕ` U+03D5 or `beff2uφ` U+03C6)
# resolves to the single normalized attribute 'beff2uφ' below. The
# reference's `__all__` lists the *string* 'beff2uφ' while its function
# normalizes the same way — so its star-import works by accident; a
# string entry with U+03D5 would not (strings are not normalized).
__all__ = ['beff2ab', 'beff2ab_assoc', 'beff2uphi', 'rfgr2beff',
           'beff2uφ']

_NORM_EPS = 1e-12  # matches torch.nn.functional.normalize default eps


def beff2uphi(beff, gam2pidt, *, dim: int = -1) -> Tuple[jax.Array, jax.Array]:
    r"""Compute rotation axes and angles from B-effectives.

    Inputs:
        - ``beff``: `(N, *Nd, xyz)`, "Gauss".
        - ``gam2pidt``: `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Rad/Gauss",
          2π·γ·dt.
    Optionals:
        - ``dim``: the ``xyz`` axis of ``beff``.
    Outputs:
        - ``u``: `(N, *Nd, xyz)`, unit rotation axis.
        - ``phi``: `(N, *Nd)`, rotation angle; negated (Bloch precession is
          M×B, ref ``beffective.py:36``).

    Parity: ``/root/reference/mrphy/beffective.py:18-37`` (``beff2uϕ``).
    """
    beff = jnp.asarray(beff)
    nrm = jnp.linalg.norm(beff, axis=dim)
    u = beff / jnp.maximum(jnp.expand_dims(nrm, dim), _NORM_EPS)
    phi = -nrm * gam2pidt
    return u, phi


def _ab_step_inputs(beff, E1, E2, gam, dt):
    r"""Shared preprocessing for the two A/B propagator implementations."""
    beff = jnp.asarray(beff)
    ndim = beff.ndim - 2  # (N, *Nd) rank
    E1, E2, gam, dt = (rshape(x, ndim) for x in (E1, E2, gam, dt))
    gam2pidt = 2 * pi * gam * dt
    return beff, E1, E2, gam2pidt


@kwalias(**{'γ': 'gam'})
def beff2ab(beff, *, E1=0.0, E2=0.0, gam=gamH, dt=dt0):
    r"""Hargreaves A/B affine propagator of a whole pulse.

    Runs the time loop once over an affine state ``AB = [A | B]`` of shape
    `(N, *Nd, xyz, 4)`, producing the pulse's total affine map
    ``M → A·M + B`` including per-step E1/E2 relaxation.

    Inputs:
        - ``beff``: `(N, *Nd, nT, xyz)`, "Gauss".
    Optionals:
        - ``E1``/``E2``: `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, per-step relaxation
          factors ``exp(-dt/T1)`` / ``exp(-dt/T2)``. (Defaults 0.0 match the
          reference signature ``beffective.py:40-46``.)
        - ``gam`` (alias ``γ``): `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Hz/Gauss".
        - ``dt``: `()` ⊻ `(N ⊻ 1,)`, "Sec".
    Outputs:
        - ``A``: `(N, *Nd, xyz, 3)`; ``B``: `(N, *Nd, xyz)`.

    Parity: ``/root/reference/mrphy/beffective.py:40-104``; the Python time
    loop becomes ``lax.scan`` (single compiled loop, no per-step dispatch).
    """
    beff, E1, E2, gam2pidt = _ab_step_inputs(beff, E1, E2, gam, dt)
    NNd, nT = beff.shape[:-2], beff.shape[-2]

    E2_ = E2[..., None, None]   # scales rows 0:2 of (xyz, 4)
    E1_ = E1[..., None]         # scales row 2
    E1_1 = E1 - 1

    eye34 = jnp.concatenate(
        [jnp.eye(3, dtype=beff.dtype), jnp.zeros((3, 1), dtype=beff.dtype)],
        axis=-1)
    ab0 = jnp.broadcast_to(eye34, NNd + (3, 4))

    beff_t = jnp.moveaxis(beff, -2, 0)  # (nT, N, *Nd, xyz)

    def step(ab, b_t):
        u, phi = beff2uphi(b_t, gam2pidt)
        ab1 = uphirot(u, phi, ab)  # rotate the 4 affine columns
        ab1 = jnp.concatenate([ab1[..., 0:2, :] * E2_,
                               ab1[..., 2:3, :] * E1_[..., None]], axis=-2)
        ab1 = ab1.at[..., 2, 3].add(-E1_1)
        return ab1, None

    ab, _ = jax.lax.scan(step, ab0, beff_t)
    return ab[..., 0:3], ab[..., 3]


@kwalias(**{'γ': 'gam'})
def beff2ab_assoc(beff, *, E1=0.0, E2=0.0, gam=gamH, dt=dt0):
    r"""A/B propagator via parallel-in-time pairwise tree reduction.

    Same result as :func:`beff2ab`. Each step is an affine map
    ``M → D·R(u,φ)·M + c`` (D = diag(E2,E2,E1), c = [0,0,1-E1]); affine
    composition is associative, so the whole pulse composes in O(log nT)
    parallel depth instead of a sequential scan. Only the final
    propagator is materialized (no all-prefix ``associative_scan``);
    peak memory is the 12 f32 planes of (nT, nSpins) at the first tree
    level — keep ``nT·nSpins ≲ 2.5e8`` per 16 GB HBM, and prefer the
    sequential :func:`beff2ab` at grid-scale spin counts.
    """
    beff, E1, E2, gam2pidt = _ab_step_inputs(beff, E1, E2, gam, dt)
    NNd = beff.shape[:-2]
    nT = beff.shape[-2]
    dtype = beff.dtype

    u, phi = beff2uphi(beff, gam2pidt[..., None])  # (N,*Nd,nT,xyz), (...,nT)

    # TPU layout: structure-of-arrays. The affine map of each step is
    # held as 9 + 3 separate (nT, S) planes (flattened spin axis S on
    # the vector lanes), so every op below is elementwise on well-tiled
    # arrays. Carrying (…, 3, 3)-trailing tensors instead makes XLA pad
    # the matrix dims onto the (sublane, lane) tile at a measured 57x
    # memory expansion (nT=65k exceeded HBM by 16 GB), and einsums over
    # the tiny contraction dim lower to badly-laid-out convolutions.
    u2 = jnp.moveaxis(u.reshape(-1, nT, 3), 0, -1)      # (nT, 3, S)
    cp = jnp.moveaxis(jnp.cos(phi).reshape(-1, nT), 0, -1)   # (nT, S)
    sp = jnp.moveaxis(jnp.sin(phi).reshape(-1, nT), 0, -1)
    ux, uy, uz = u2[:, 0], u2[:, 1], u2[:, 2]           # (nT, S)

    E1f = jnp.broadcast_to(E1, NNd).reshape(-1).astype(dtype)   # (S,)
    E2f = jnp.broadcast_to(E2, NNd).reshape(-1).astype(dtype)
    c1 = 1 - cp
    # rows of D·R(u,φ): R_ik = cφ·δ_ik + (1−cφ)·u_i·u_k + sφ·[u]ₓ_ik
    row = ((cp + c1 * ux * ux, c1 * ux * uy - sp * uz,
            c1 * ux * uz + sp * uy),
           (c1 * uy * ux + sp * uz, cp + c1 * uy * uy,
            c1 * uy * uz - sp * ux),
           (c1 * uz * ux - sp * uy, c1 * uz * uy + sp * ux,
            cp + c1 * uz * uz))
    dscale = (E2f, E2f, E1f)
    a = [[dscale[i] * row[i][k] for k in range(3)] for i in range(3)]
    zb = jnp.zeros((nT,) + E1f.shape, dtype)
    b = [zb, zb, jnp.broadcast_to(1 - E1f, (nT,) + E1f.shape)]

    # pairwise tree reduction: only the FINAL propagator is needed, so
    # composing pairs (O(nT) total work, log2(nT) layers of elementwise
    # mul-adds) beats associative_scan, which materializes every prefix.
    nrem = nT
    while nrem > 1:
        odd = nrem % 2
        if odd:  # hold the temporally-last step out, re-append after
            a_last = [[m[-1:] for m in r] for r in a]
            b_last = [v[-1:] for v in b]
            a = [[m[:-1] for m in r] for r in a]
            b = [v[:-1] for v in b]
        lo = [[m[0::2] for m in r] for r in a]
        hi = [[m[1::2] for m in r] for r in a]
        b_lo = [v[0::2] for v in b]
        b_hi = [v[1::2] for v in b]
        a = [[hi[i][0] * lo[0][k] + hi[i][1] * lo[1][k]
              + hi[i][2] * lo[2][k] for k in range(3)] for i in range(3)]
        b = [hi[i][0] * b_lo[0] + hi[i][1] * b_lo[1] + hi[i][2] * b_lo[2]
             + b_hi[i] for i in range(3)]
        if odd:
            a = [[jnp.concatenate([a[i][k], a_last[i][k]])
                  for k in range(3)] for i in range(3)]
            b = [jnp.concatenate([b[i], b_last[i]]) for i in range(3)]
        nrem = nrem // 2 + odd

    A = jnp.stack([jnp.stack([a[i][k][0] for k in range(3)], -1)
                   for i in range(3)], -2).reshape(NNd + (3, 3))
    B = jnp.stack([b[i][0] for i in range(3)], -1).reshape(NNd + (3,))
    return A, B


@kwalias(**{'γ': 'gam', 'Δf': 'df'})
def rfgr2beff(rf, gr, loc, *, df: Optional[jax.Array] = None,
              b1Map: Optional[jax.Array] = None, gam=gamH,
              b0: Optional[float] = None):
    r"""Assemble B-effective from RF and gradients.

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss"; x: real, y: imag.
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm".
        - ``loc``: `(N, *Nd, xyz)`, "cm", spin locations.
    Optionals:
        - ``df`` (alias ``Δf``): `(N, *Nd)`, "Hz", off-resonance.
        - ``b1Map``: `(N, *Nd, xy, (nCoils))`, a.u., transmit sensitivity
          (complex as real/imag pairs along ``xy``).
        - ``gam`` (alias ``γ``): `()` ⊻ `(N ⊻ 1, *Nd ⊻ 1,)`, "Hz/Gauss".
        - ``b0``: `()`, "Gauss", main field strength — when given, the
          lowest-order concomitant (Maxwell) field is ADDED to ``Bz``:

          .. math::
             B_c = \frac{(g_x z - g_z x/2)^2 + (g_y z - g_z y/2)^2}
                        {2 B_0}

          (the exact quadratic term for a symmetric gradient coil;
          scales as 1/B₀ — the low-field / strong-gradient artifact
          source: slice shifts, spiral blurring. Differentiable w.r.t.
          ``gr``/``loc``, so designs can penalize or pre-compensate it.)
    Outputs:
        - ``beff``: `(N, *Nd, nT, xyz)`, "Gauss".

    Parity: ``/root/reference/mrphy/beffective.py:107-168``, including the
    missing-coil-dim conventions (``:148-156``): an ``rf`` with a coil dim
    but no ``b1Map`` is summed over coils; a coil-less ``rf`` or ``b1Map``
    is treated as single-coil. ``Bz = loc·gr`` and the coil mixing are
    einsum contractions (MXU-path under XLA).
    """
    rf, gr, loc = jnp.asarray(rf), jnp.asarray(gr), jnp.asarray(loc)
    shape = loc.shape
    N, Nd = shape[0], shape[1:-1]
    nT = gr.shape[2]

    # precision='highest': TPU default matmul precision is bf16-input,
    # which costs ~1e-3 relative error in Beff and compounds over the
    # Bloch scan; the contraction dims here are tiny (3 / nCoils) so full
    # f32 passes are effectively free.
    _PH = jax.lax.Precision.HIGHEST
    loc2 = loc.reshape(N, -1, 3)                       # (N, nS, xyz)
    Bz = jnp.einsum('nsx,nxt->nst', loc2, gr, precision=_PH)  # (N, nS, nT)

    if b0 is not None:
        x, y, z = loc2[..., 0], loc2[..., 1], loc2[..., 2]  # (N, nS)
        gx, gy, gz = gr[:, 0], gr[:, 1], gr[:, 2]           # (N, nT)
        cx = (z[:, :, None] * gx[:, None, :]
              - 0.5 * x[:, :, None] * gz[:, None, :])
        cy = (z[:, :, None] * gy[:, None, :]
              - 0.5 * y[:, :, None] * gz[:, None, :])
        Bz = Bz + (cx * cx + cy * cy) / (2.0 * b0)

    if df is not None:
        df = jnp.asarray(df).reshape(N, -1)            # (N, nS)
        # right-pad gam like the reference (beffective.py:141): plain
        # broadcast_to would mis-align a (N,) gam against (N, *Nd)
        gam_b = jnp.broadcast_to(rshape(gam, len(shape) - 1),
                                 shape[:-1]).reshape(N, -1)
        Bz = Bz + (df / gam_b)[..., None]

    if b1Map is None:
        if rf.ndim == 4:  # (N, xy, nT, nCoils): sum over coils
            rf = jnp.sum(rf, axis=-1)
        Bx = jnp.broadcast_to(rf[:, 0, None, :], Bz.shape)
        By = jnp.broadcast_to(rf[:, 1, None, :], Bz.shape)
    else:
        b1Map = jnp.asarray(b1Map)
        if b1Map.ndim == 2 + len(Nd):   # (N, *Nd, xy) → add coil dim
            b1Map = b1Map[..., None]
        if rf.ndim == 3:                # (N, xy, nT) → add coil dim
            rf = rf[..., None]
        # b1Map spatial dims may be 1 (broadcast over spins, like the
        # reference's expand_as at beffective.py:162)
        b1 = b1Map.reshape(N, -1, 2, b1Map.shape[-1])  # (N, nSb, xy, nCoils)
        # complex mix: B = Σ_coils b1 ⊗ rf  (b1, rf complex as xy pairs)
        Bx = (jnp.einsum('nsc,ntc->nst', b1[:, :, 0], rf[:, 0],
                         precision=_PH)
              - jnp.einsum('nsc,ntc->nst', b1[:, :, 1], rf[:, 1],
                           precision=_PH))
        By = (jnp.einsum('nsc,ntc->nst', b1[:, :, 0], rf[:, 1],
                         precision=_PH)
              + jnp.einsum('nsc,ntc->nst', b1[:, :, 1], rf[:, 0],
                           precision=_PH))
        Bx = jnp.broadcast_to(Bx, Bz.shape)
        By = jnp.broadcast_to(By, Bz.shape)

    beff = jnp.stack([Bx, By, Bz], axis=-1)            # (N, nS, nT, xyz)
    return beff.reshape((N,) + tuple(Nd) + (nT, 3))


# Unicode alias: source written with either `beff2uϕ` (U+03D5, the
# reference's function name at beffective.py:18) or `beff2uφ` (U+03C6,
# its __all__ spelling at :15) NFKC-normalizes to this one attribute.
beff2uφ = beff2uphi
