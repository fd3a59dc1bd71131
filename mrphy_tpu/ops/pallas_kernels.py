r"""Pallas TPU kernels for the fused Bloch rotation+relaxation step.

The TPU-native equivalent of the reference's hand-tuned inner loops
(``/root/reference/mrphy/sims.py:91-126`` forward, ``:195-261`` adjoint):
where the reference pre-allocates buffers and uses ``out=`` ops to avoid
allocator traffic on CUDA, the TPU version keeps the loop-carried
magnetization in VMEM across a block of time steps and streams
``Beff``/``Mhst`` blocks HBM↔VMEM through the Pallas pipeline.

Layout contract (shared with :mod:`mrphy_tpu.ops.sims`):
``m`` is `(xyz=3, B)`; ``beff`` is `(nT, 3, B)`; spin axis on lanes.

This module is import-light: importing it does not build kernels.
"""

import jax.numpy as jnp

__all__ = ['is_available', 'blochsim_core']


def is_available(*, nT: int, nspins: int, dtype) -> bool:
    r"""Whether the fused Pallas path supports this problem instance."""
    # Pallas fused kernel lands in a later milestone; XLA scan is the
    # default engine until it wins benchmarks.
    return False


def blochsim_core(mi, beff, E, e1_1, g2pd):
    raise NotImplementedError(
        'Pallas blochsim kernel not yet enabled; use backend="xla"')
