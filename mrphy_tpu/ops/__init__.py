r"""Functional compute ops: B-effective assembly, Bloch simulation engines,
and Pallas TPU kernels. Everything here is jittable, shardable, and
differentiable (explicitly via ``jax.custom_vjp`` where noted).
"""
