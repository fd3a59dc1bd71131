r"""AOT engine artifacts (`jax.export`): compile-once / serve-many.

Production serving separates *build time* from *run time*: trace and
lower a jitted engine ONCE (on any build host — lowering can target TPU
from a CPU machine), persist the serialized StableHLO artifact, and
execute it on the serving fleet with no Python retracing and no
framework source at run time beyond this loader. The artifact pins the
calling convention (pytree structure, shapes, dtypes, target
platforms) and carries jax.export's cross-version compatibility
guarantees, so build and serving environments may run different
framework versions.

The reference has no deployment story (eager torch; every process
re-traces per call — e.g. the Python `for`-loop step dispatch of
`/root/reference/mrphy/sims.py:183-192` runs anew each call); this
module is part of the beyond-reference production surface, next to
:mod:`mrphy_tpu.design.checkpoint` (long-run persistence) and
:mod:`mrphy_tpu.parallel.mesh` (multi-chip execution).

Shape polymorphism: the `lax.scan` oracles (:mod:`~mrphy_tpu.ops.
slowsims`) export with *symbolic* spin counts (`symbolic_dim`) — one
artifact serves any ``nM`` — because their layout is shape-oblivious.
The fused/Pallas engines (:mod:`~mrphy_tpu.ops.sims`) choose tile and
chunk sizes from the concrete shapes (lane padding, VMEM budgeting),
so they export at fixed serving shapes — the production norm for
compiled serving anyway; export one artifact per served shape bucket.

Round-trips are bit-exact (same StableHLO → same executable):
asserted in ``tests/test_export.py``.
"""

import io
import os
from typing import Optional, Sequence, Union

import jax
from jax import export as _jexp

__all__ = ['export_compiled', 'load_compiled', 'symbolic_dim',
           'export_applypulse']

_MAGIC = b'MRPHY_TPU_EXPORT/1\n'


def symbolic_dim(spec: str, constraints: Sequence[str] = ()):
    r"""Symbolic dimension(s) for shape-polymorphic export.

    Thin alias of `jax.export.symbolic_shape` (kept here so serving
    code imports one module). ``spec`` like ``'m'`` or ``'m, n'``;
    optional scope ``constraints`` like ``('m >= 1', 'm <= 65536')``.
    Returns a tuple of dimension objects usable inside
    `jax.ShapeDtypeStruct` shapes passed to :func:`export_compiled`.
    """
    if constraints:
        scope = _jexp.SymbolicScope(constraints)
        return _jexp.symbolic_shape(spec, scope=scope)
    return _jexp.symbolic_shape(spec)


def _spec(x):
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    a = jax.numpy.asarray(x)
    return jax.ShapeDtypeStruct(a.shape, a.dtype)


def export_compiled(fn, example_args=(), example_kwargs=None, *,
                    platforms: Optional[Sequence[str]] = None,
                    path: Optional[str] = None) -> bytes:
    r"""Serialize jitted ``fn`` to a self-contained serving artifact.

    Args:
        - ``fn``: callable (jitted or not; wrapped in `jax.jit` if not)
          over array pytrees.
        - ``example_args`` / ``example_kwargs``: example inputs — real
          arrays or `jax.ShapeDtypeStruct`\ s (mix freely; structs may
          carry symbolic dims from :func:`symbolic_dim`). Only
          shape/dtype are read.
        - ``platforms``: lowering targets, e.g. ``('tpu',)`` to build a
          TPU artifact from a CPU host, or ``('tpu', 'cpu')`` for a
          multi-platform artifact. Default: the current platform.
        - ``path``: also write the artifact to this file.

    Returns the serialized artifact ``bytes``.
    """
    if not isinstance(fn, jax.stages.Wrapped):
        fn = jax.jit(fn)
    args = jax.tree.map(_spec, tuple(example_args))
    kwargs = jax.tree.map(_spec, dict(example_kwargs or {}))
    exp = _jexp.export(fn, platforms=platforms)(*args, **kwargs)
    blob = _MAGIC + exp.serialize()
    if path is not None:
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            f.write(blob)
        os.replace(tmp, path)                     # atomic publish
    return blob


class _Loaded:
    r"""Deserialized artifact: a callable with its contract exposed.

    Calling executes the embedded StableHLO on the current platform
    (must be one of ``.platforms``); works eagerly and under an outer
    `jax.jit`/`grad` (the artifact participates in tracing as a
    first-class primitive)."""

    def __init__(self, exported):
        self._exported = exported

    def __call__(self, *args, **kwargs):
        return self._exported.call(*args, **kwargs)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    @property
    def in_avals(self):
        return self._exported.in_avals

    @property
    def out_avals(self):
        return self._exported.out_avals

    def __repr__(self):
        return (f'load_compiled(<{self._exported.fun_name}>, '
                f'platforms={self.platforms})')


def load_compiled(src: Union[bytes, str, io.IOBase]) -> _Loaded:
    r"""Load an artifact written by :func:`export_compiled`.

    ``src``: the artifact ``bytes``, a file path, or a binary stream.
    """
    if isinstance(src, str):
        with open(src, 'rb') as f:
            blob = f.read()
    elif isinstance(src, (bytes, bytearray)):
        blob = bytes(src)
    else:
        blob = src.read()
    assert blob.startswith(_MAGIC), \
        'not an mrphy_tpu export artifact (bad magic)'
    return _Loaded(_jexp.deserialize(blob[len(_MAGIC):]))


def export_applypulse(spins, pulse, *, doEmbed: bool = False,
                      doRelax: bool = True,
                      platforms: Optional[Sequence[str]] = None,
                      path: Optional[str] = None) -> bytes:
    r"""Flagship serving artifact: ``(rf, gr) → Mo`` for a fixed subject.

    The spin object's parameters (loc/T1/T2/Δf/B1, mask geometry) and
    the pulse's static config (dt, limits) are baked into the artifact
    as constants; the served inputs are the waveforms — the pulse
    evaluation service a scanner-side deployment wants. Shapes are
    fixed at ``pulse.rf``/``pulse.gr``'s (see module docstring on why
    the fused engine serves fixed shape buckets).
    """
    cls = type(pulse)

    def fn(rf, gr):
        p = cls(rf, gr, dt=pulse.dt, gmax=pulse.gmax, smax=pulse.smax,
                rfmax=pulse.rfmax)
        return spins.applypulse(p, doEmbed=doEmbed, doRelax=doRelax)

    return export_compiled(fn, (pulse.rf, pulse.gr),
                           platforms=platforms, path=path)
