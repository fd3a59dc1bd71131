r"""Recompute-through-XLA custom VJPs for fused Pallas forwards.

The dictionary/train kernels (:mod:`mrphy_tpu.ops.epg_pallas`,
:mod:`mrphy_tpu.ops.ssfp_pallas`) are forward-only by construction —
dictionary generation needs no gradients, and a hand-derived in-kernel
adjoint for a k-order EPG ladder would be a large surface for little
win. But MRF *sequence design* (gradients w.r.t. flips/TRs through a
train, e.g. CRLB or coherence losses over a 64k-atom dictionary) wants
the fused forward inside an optimization loop. This wrapper gives every
fused train a ``jax.custom_vjp`` whose backward recomputes through the
XLA train — the same pattern proven for the two-pool waveform engine in
round 2 (``ops/mc.py``, before its hand-derived adjoint landed):

- the primal (and the VJP's forward pass) run the Pallas kernel;
- the reverse pass runs one XLA-train forward + backward, so gradients
  are the XLA backend's evaluated at the incoming cotangent. The
  kernels emit f32, so under x64 the cotangent crosses an f32 rounding
  at the boundary — parity vs the pure-XLA grads is pinned at 1e-6/f64
  (``tests/test_epg.py``/``test_ssfp.py``); in f32 pipelines (the
  actual kernel regime) the rounding is a no-op.

A design loop thus pays kernel-speed forwards every iteration and one
XLA-speed reverse — for loss landscapes evaluated more often than
differentiated (line searches, CRLB sweeps over candidate trains), the
kernel speedup dominates end-to-end.
"""

import jax
import jax.numpy as jnp

__all__ = ['pallas_with_xla_vjp']


def pallas_with_xla_vjp(pallas_fn, xla_fn, *args):
    r"""``pallas_fn(*args)`` with gradients defined as the autodiff of
    ``xla_fn(*args)``.

    Both callables must map the same ``args`` (arrays, python scalars,
    or None — None members get None cotangents) to outputs of the same
    total size; any static configuration is closed over. The backward
    casts/reshapes the incoming cotangent to the XLA output's
    dtype/shape (the paths may differ in weak-dtype promotion or a
    leading length-1 atom axis)."""
    @jax.custom_vjp
    def f(*a):
        return pallas_fn(*a)

    def fwd(*a):
        return pallas_fn(*a), a

    def bwd(res, g):
        out, vjp = jax.vjp(xla_fn, *res)
        g = jax.tree_util.tree_map(
            lambda gg, oo: jnp.asarray(gg, oo.dtype).reshape(oo.shape),
            g, out)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(*args)
