r"""Device meshes and spin-sharded simulation.

The reference has **no** distributed machinery (verified in SURVEY §2.9:
no torch.distributed / NCCL / multi-process code anywhere). The workload's
parallel axes are the batch ``N`` and the spin axis ``nM``/``*Nd`` — every
per-step op of the Bloch scan is elementwise over spins, so spin-sharded
data parallelism is **communication-free in the hot loop**; collectives
appear only in loss reductions.

TPU-native design (this module):

- a ``jax.sharding.Mesh`` over ``('batch', 'spins')`` — batch-DP across
  DCN-connected slices, spin-sharding across ICI-connected chips;
- ``NamedSharding`` constructors for the ``(N, nM, ...)`` shape grammar;
- :func:`blochsim_sharded`: the fast engine under ``jit`` with sharding
  constraints — XLA partitions the scan with zero collectives;
- :func:`psum_loss`: mean-loss helper whose gradient is correct under
  sharding (XLA inserts the ``psum`` over ICI automatically).

Time (``nT``) is never sharded: it is the sequential scan axis; its
scaling story is segmented remat (:func:`mrphy_tpu.ops.slowsims.
blochsim_segmented`) and the associative A/B propagator
(:func:`mrphy_tpu.ops.beffective.beff2ab_assoc`).
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrphy_tpu.ops import sims

__all__ = ['make_mesh', 'shard_spins', 'spin_pspec', 'blochsim_sharded',
           'blochsim_rfgr_sharded', 'rfgr_sharded_traceable',
           'oracle_sharded_traceable', 'oracle_freeprec_traceable',
           'mc_sharded_traceable', 'mc_rfgr_sharded_traceable',
           'epg_cpmg_sharded_traceable',
           'bssfp_train_sharded_traceable', 'dict_match_sharded_traceable',
           'signal_sharded_traceable', 'signal_adjoint_sharded_traceable',
           'nufft_sharded_traceable', 'nufft_adjoint_sharded_traceable',
           'epgx_train_sharded_traceable',
           'shard_spin_obj', 'psum_loss', 'pad_spins']

BATCH_AXIS = 'batch'
SPIN_AXIS = 'spins'


def make_mesh(devices: Optional[Sequence] = None, *,
              batch: int = 1, spins: Optional[int] = None) -> Mesh:
    r"""Build a ``(batch, spins)`` device mesh.

    Optionals:
        - ``devices``: devices to use (default ``jax.devices()``).
        - ``batch``: mesh extent for batch-DP (default 1).
        - ``spins``: mesh extent for spin sharding (default: all remaining
          devices).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if spins is None:
        assert n % batch == 0, f'{n} devices not divisible by batch={batch}'
        spins = n // batch
    assert batch * spins == n, f'{batch}x{spins} != {n} devices'
    dev_arr = np.asarray(devices).reshape(batch, spins)
    return Mesh(dev_arr, (BATCH_AXIS, SPIN_AXIS))


def pad_spins(x, mesh: Mesh, *, axis: int = 1, fill=0.0):
    r"""Pad the spin axis to a multiple of the mesh's spin extent.

    .. warning::
        Relaxation attributes (``T1_``/``T2_``) must pad with a POSITIVE
        ``fill`` (e.g. 1.0): zero-padded relaxation times give
        ``E = exp(-dt/0) = 0`` and the reconstruction adjoint divides by
        E, NaN-poisoning cross-spin waveform-gradient reductions.
    """
    import jax.numpy as jnp
    n = x.shape[axis]
    k = mesh.shape[SPIN_AXIS]
    pad = (-n) % k
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def shard_spins(mesh: Mesh, ndim: int, *, spin_axis: int = 1,
                batch_axis: int = 0) -> NamedSharding:
    r"""NamedSharding placing ``batch_axis`` on the batch mesh axis and
    ``spin_axis`` on the spin mesh axis of an ``ndim``-rank array."""
    spec = [None] * ndim
    spec[batch_axis] = BATCH_AXIS
    spec[spin_axis] = SPIN_AXIS
    return NamedSharding(mesh, P(*spec))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _sharded_blochsim_jit(mesh: Mesh, arr_keys: tuple, static_kw: tuple):
    r"""One jitted callable per (mesh, array-kwarg names, static kwargs)
    combo — a fresh jit per call would retrace/recompile every
    invocation. shard_map (not GSPMD auto-partitioning) so the engine's
    Pallas fast path runs per shard on real multi-chip hardware (a
    pallas_call is a custom call XLA cannot partition); check_vma=False
    because the engine is a custom_vjp function (parity asserted in
    tests/test_parallel.py)."""
    def f(Mi, Beff, *vals):
        N, nM = Mi.shape[0], Mi.shape[1]

        def body(Mi, Beff, *vals):
            kw = dict(zip(arr_keys, vals))
            kw.update(dict(static_kw))
            return sims.blochsim(Mi, Beff, **kw)

        in_specs = (spin_pspec(Mi, N, nM), spin_pspec(Beff, N, nM)
                    ) + tuple(spin_pspec(v, N, nM) for v in vals)
        sm = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=spin_pspec(Mi, N, nM),
                           check_vma=False)
        return sm(Mi, Beff, *vals)
    return jax.jit(f)


def blochsim_sharded(mesh: Mesh, Mi, Beff, **kw):
    r"""Fast-engine Bloch simulation with ``(N, nM)`` sharded over the mesh.

    ``Mi``: `(N, nM, xyz)`; ``Beff``: `(N, nM, nT, xyz)`. ``nM`` must be
    divisible by the mesh's spin extent (see :func:`pad_spins`). Each
    device simulates its local spin block via shard_map (the scan body is
    elementwise over spins → zero collectives in the hot loop; the Pallas
    fast path runs per shard on real multi-chip hardware).
    """
    import jax.numpy as jnp
    Mi, Beff = jnp.asarray(Mi), jnp.asarray(Beff)
    nM, sp = Mi.shape[1], mesh.shape[SPIN_AXIS]
    assert nM % sp == 0, (f'nM={nM} not divisible by spin mesh extent '
                          f'{sp}; see pad_spins')
    Mi = jax.device_put(Mi, shard_spins(mesh, 3))
    Beff = jax.device_put(Beff, shard_spins(mesh, 4))
    static = tuple(sorted((k, v) for k, v in kw.items()
                          if isinstance(v, (str, bool, int, float))
                          or v is None))
    arrays = {k: jnp.asarray(v) for k, v in kw.items()
              if k not in dict(static)}
    arr_keys = tuple(sorted(arrays))
    f = _sharded_blochsim_jit(mesh, arr_keys, static)
    return f(Mi, Beff, *[arrays[k] for k in arr_keys])


# --------------------------------------------------------------------------
# Fused rf/gr engine under shard_map
#
# Why shard_map and not plain GSPMD jit: the fused engine's fast path is a
# Pallas kernel (a custom call XLA cannot auto-partition). shard_map runs
# the per-shard engine — Pallas included — on each device's local block;
# the hot loop stays communication-free, and the only collective is the
# psum over the spin axis that shard_map's transpose inserts for the
# replicated waveform inputs' gradients (rf/gr cotangents are reductions
# over ALL spins). `check_vma=False` because the engines are custom_vjp
# functions whose replication the vma checker cannot see through; gradient
# parity vs the unsharded engine is asserted in tests/test_parallel.py.
# --------------------------------------------------------------------------

_RFGR_STATIC_KW = ('adjoint', 'backend', 'max_phi', '_pallas_interpret')


def spin_pspec(x, N: int, nM: int) -> P:
    r"""The by-shape sharding rule for ``(N ⊻ 1, nM ⊻ 1, ...)`` params,
    shared by :func:`rfgr_sharded_traceable` and the design loop's
    pre-placement: axis 0 goes on the batch mesh axis when its extent is
    ``N`` (broadcast leading-1 replicates), axis 1 on the spin mesh axis
    when its extent is ``nM``."""
    if x.ndim == 0:
        return P()
    parts = [None] * x.ndim
    if x.shape[0] == N:
        parts[0] = BATCH_AXIS
    if x.ndim >= 2 and x.shape[1] == nM:
        parts[1] = SPIN_AXIS
    return P(*parts)


def rfgr_sharded_traceable(mesh: Mesh, Mi, rf, gr, loc, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.sims.blochsim_rfgr` — the
    traceable core of :func:`blochsim_rfgr_sharded`, usable inside an
    outer ``jit`` (e.g. the design loop's scan).

    ``Mi``/``loc`` must be compact `(N, nM, xyz)`; per-spin optionals
    (``df``, ``b1Map``, ``vel``, per-spin ``T1``/``T2``/``gam``) shard on
    ``(batch, spins)`` by shape; waveforms and broadcast params replicate
    (batch-sharded when their leading axis is ``N``).
    """
    import jax.numpy as jnp

    Mi, rf, gr, loc = (jnp.asarray(x) for x in (Mi, rf, gr, loc))
    assert Mi.ndim == 3, 'compact (N, nM, xyz) layout required'
    N, nM = Mi.shape[0], Mi.shape[1]
    dp, sp = mesh.shape[BATCH_AXIS], mesh.shape[SPIN_AXIS]
    assert N % dp == 0, f'N={N} not divisible by batch mesh extent {dp}'
    assert nM % sp == 0, (f'nM={nM} not divisible by spin mesh extent '
                          f'{sp}; see pad_spins')

    static = {k: v for k, v in kw.items() if k in _RFGR_STATIC_KW}
    arrs = {k: jnp.asarray(v) for k, v in kw.items()
            if k not in _RFGR_STATIC_KW and kw[k] is not None}

    def pspec(x):  # per-spin / broadcast params: the shared shape rule
        return spin_pspec(x, N, nM)

    def wfspec(x):  # waveforms: never spin-sharded
        return P(BATCH_AXIS) if x.shape[0] == N else P()

    names = tuple(sorted(arrs))

    def body(Mi, rf, gr, loc, *vals):
        kwd = dict(zip(names, vals))
        kwd.update(static)
        return sims.blochsim_rfgr(Mi, rf, gr, loc, **kwd)

    in_specs = (pspec(Mi), wfspec(rf), wfspec(gr), pspec(loc)) + tuple(
        pspec(arrs[k]) for k in names)
    f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                      out_specs=pspec(Mi), check_vma=False)
    return f(Mi, rf, gr, loc, *(arrs[k] for k in names))


@_functools.lru_cache(maxsize=None)
def _rfgr_sharded_jit(mesh: Mesh, names: tuple, static_kw: tuple):
    def f(Mi, rf, gr, loc, *vals):
        kw = dict(zip(names, vals))
        kw.update(dict(static_kw))
        return rfgr_sharded_traceable(mesh, Mi, rf, gr, loc, **kw)
    return jax.jit(f)


def blochsim_rfgr_sharded(mesh: Mesh, Mi, rf, gr, loc, **kw):
    r"""Fused waveform engine with ``(N, nM)`` sharded over the mesh.

    The multi-chip form of :func:`mrphy_tpu.ops.sims.blochsim_rfgr` (same
    signature after ``mesh``, compact layout only): each device simulates
    its local spin block — Pallas fast path included — with zero
    collectives in the hot loop; gradients w.r.t. the replicated ``rf``/
    ``gr`` are psum-reduced over the spin axis automatically by the
    shard_map transpose. ``nM`` must divide by the mesh's spin extent
    (:func:`pad_spins` otherwise; pad ``T1_``/``T2_`` with 1, see its
    warning).
    """
    import jax.numpy as jnp

    Mi, rf, gr, loc = (jnp.asarray(x) for x in (Mi, rf, gr, loc))
    N, nM = Mi.shape[0], Mi.shape[1]
    # place inputs where the computation wants them (no-op if already so)
    Mi = jax.device_put(Mi, shard_spins(mesh, Mi.ndim))
    loc = jax.device_put(loc, shard_spins(mesh, loc.ndim))
    static = tuple(sorted((k, v) for k, v in kw.items()
                          if k in _RFGR_STATIC_KW))
    arrs = {k: jnp.asarray(v) for k, v in kw.items()
            if k not in dict(static) and kw[k] is not None}
    for k, v in arrs.items():
        if v.ndim >= 2 and v.shape[0] == N and v.shape[1] == nM:
            arrs[k] = jax.device_put(v, shard_spins(mesh, v.ndim))
    names = tuple(sorted(arrs))
    f = _rfgr_sharded_jit(mesh, names, static)
    return f(Mi, rf, gr, loc, *(arrs[k] for k in names))


# --------------------------------------------------------------------------
# Oracle / extended families under shard_map.
#
# slowsims.blochsim (autodiff oracle), slowsims.blochsim_mc (two-pool
# Bloch–McConnell: CEST Z-spectra over millions of voxels) and
# ops.epg.epg_cpmg (voxel-wise echo trains for T2 mapping) are exactly as
# embarrassingly spin/voxel-parallel as the fast engine — every per-step
# op is elementwise over the spin axis. The same by-shape rule
# (spin_pspec) shards them; the only collectives are in user losses.
# These are the `mesh=` kwargs' dispatch targets (traceable: usable
# inside an outer jit, e.g. a fitting loop's scan).
# --------------------------------------------------------------------------

def _sharded_elementwise(mesh: Mesh, fn, pos: tuple, kw: dict, N: int,
                         nM: int, out_specs):
    r"""shard_map ``fn(*pos, **kw)`` with every array argument sharded by
    the ``(N, nM)`` by-shape rule (:func:`spin_pspec`); non-array kwargs
    pass through statically. Dispatch goes through a CACHED jit — an
    eager shard_map would execute the traced ops one by one across the
    mesh (~100× slower than the compiled program on the 8-virtual-
    device CPU mesh); ``fn`` must be a module-level function so the
    cache key is stable across calls."""
    import jax.numpy as jnp

    pos = tuple(jnp.asarray(x) for x in pos)
    static = {k: v for k, v in kw.items()
              if not hasattr(v, 'ndim') and isinstance(
                  v, (str, bool, int, float, type(None)))}
    arrs = {k: jnp.asarray(v) for k, v in kw.items() if k not in static}
    names = tuple(sorted(arrs))

    in_specs = tuple(spin_pspec(x, N, nM) for x in pos) + tuple(
        spin_pspec(arrs[k], N, nM) for k in names)
    f = _elementwise_jit(mesh, fn, len(pos), names,
                         tuple(sorted(static.items())), in_specs,
                         out_specs)
    return f(*pos, *(arrs[k] for k in names))


@_functools.lru_cache(maxsize=None)
def _elementwise_jit(mesh: Mesh, fn, npos: int, names: tuple,
                     static_items: tuple, in_specs: tuple, out_specs):
    def run(*vals):
        def body(*v):
            p, rest = v[:npos], v[npos:]
            kwd = dict(zip(names, rest))
            kwd.update(dict(static_items))
            return fn(*p, **kwd)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
        return f(*vals)

    return jax.jit(run)


def _check_divisible(mesh: Mesh, N: int, nM: int):
    dp, sp = mesh.shape[BATCH_AXIS], mesh.shape[SPIN_AXIS]
    assert N % dp == 0, f'N={N} not divisible by batch mesh extent {dp}'
    assert nM % sp == 0, (f'nM={nM} not divisible by spin mesh extent '
                          f'{sp}; see pad_spins')


def oracle_sharded_traceable(mesh: Mesh, M, Beff, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.slowsims.blochsim` (the
    autodiff oracle — differentiable w.r.t. T1/T2/γ/dt too, unlike the
    fast engine). Compact `(N, nM, xyz)` layout; per-spin params shard
    by shape, scalars replicate."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import slowsims

    M = jnp.asarray(M)
    assert M.ndim == 3, 'mesh= requires compact (N, nM, xyz) layout'
    N, nM = M.shape[0], M.shape[1]
    _check_divisible(mesh, N, nM)
    return _sharded_elementwise(mesh, slowsims.blochsim, (M, Beff), kw,
                                N, nM, spin_pspec(M, N, nM))


def oracle_freeprec_traceable(mesh: Mesh, M, dur, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.slowsims.freeprec`
    (closed-form precession+relaxation — the qMRI-fit signal model).
    Compact `(N, nM, xyz)` layout."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import slowsims

    M = jnp.asarray(M)
    assert M.ndim == 3, 'mesh= requires compact (N, nM, xyz) layout'
    N, nM = M.shape[0], M.shape[1]
    _check_divisible(mesh, N, nM)
    # NB: pass the module-level function itself — a per-call closure
    # would defeat the _elementwise_jit cache (new key every call)
    return _sharded_elementwise(mesh, slowsims.freeprec,
                                (M, jnp.asarray(dur)), kw,
                                N, nM, spin_pspec(M, N, nM))


def mc_sharded_traceable(mesh: Mesh, Ma, Mb, Beff, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.slowsims.blochsim_mc`
    (two-pool Bloch–McConnell). Compact `(N, nM, xyz)` layout; returns
    ``(Ma, Mb)``."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import slowsims

    Ma = jnp.asarray(Ma)
    assert Ma.ndim == 3, 'mesh= requires compact (N, nM, xyz) layout'
    N, nM = Ma.shape[0], Ma.shape[1]
    _check_divisible(mesh, N, nM)
    spec = spin_pspec(Ma, N, nM)
    return _sharded_elementwise(mesh, slowsims.blochsim_mc,
                                (Ma, Mb, Beff), kw, N, nM, (spec, spec))


_MC_RFGR_STATIC_KW = ('backend', 'max_phi', '_pallas_interpret')


def mc_rfgr_sharded_traceable(mesh: Mesh, Mia, Mib, rf, gr, loc, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.mc.blochsim_mc_rfgr` (the
    fused two-pool waveform engine) — each device simulates its local
    voxel block (Pallas fast path included) with zero collectives in the
    forward; waveform gradients psum over the spin axis automatically by
    the shard_map transpose.

    ``Mia``/``Mib``/``loc`` must be compact `(N, nM, xyz)`; per-voxel
    optionals (``df``, ``b1Map``, tissue/exchange maps) shard on
    ``(batch, spins)`` by shape; waveforms and broadcast params
    replicate (batch-sharded when their leading axis is ``N``)."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import mc

    Mia, Mib, rf, gr, loc = (jnp.asarray(x)
                             for x in (Mia, Mib, rf, gr, loc))
    assert Mia.ndim == 3, 'compact (N, nM, xyz) layout required'
    N, nM = Mia.shape[0], Mia.shape[1]
    _check_divisible(mesh, N, nM)

    static = {k: v for k, v in kw.items() if k in _MC_RFGR_STATIC_KW}
    arrs = {k: jnp.asarray(v) for k, v in kw.items()
            if k not in _MC_RFGR_STATIC_KW and kw[k] is not None}

    def pspec(x):  # per-voxel / broadcast params: the shared shape rule
        return spin_pspec(x, N, nM)

    def wfspec(x):  # waveforms: never spin-sharded
        return P(BATCH_AXIS) if x.shape[0] == N else P()

    names = tuple(sorted(arrs))

    def body(Mia, Mib, rf, gr, loc, *vals):
        kwd = dict(zip(names, vals))
        kwd.update(static)
        return mc.blochsim_mc_rfgr(Mia, Mib, rf, gr, loc, **kwd)

    in_specs = (pspec(Mia), pspec(Mib), wfspec(rf), wfspec(gr),
                pspec(loc)) + tuple(pspec(arrs[k]) for k in names)
    f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                      out_specs=(pspec(Mia), pspec(Mib)),
                      check_vma=False)
    return f(Mia, Mib, rf, gr, loc, *(arrs[k] for k in names))


def epg_cpmg_sharded_traceable(mesh: Mesh, flips, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.epg.epg_cpmg` for 1-D
    voxel batches: ``flips`` `(nV, nEcho)` (or `(nEcho,)` replicated
    with per-voxel ``T1``/``T2`` `(nV,)`). The voxel axis shards on the
    mesh's spin axis; returns ``(nV, nEcho, 2)``."""
    import jax.numpy as jnp

    sp = mesh.shape[SPIN_AXIS]

    def vox_spec(x, key=None):
        x = jnp.asarray(x)
        if key == 'esp':                  # shared echo-spacing train
            return P()
        if x.ndim >= 1 and x.shape[0] == nV:
            return P(SPIN_AXIS, *([None] * (x.ndim - 1)))
        return P()

    # arrays, tracers AND list/tuple sequences are traced args; only
    # python scalars stay static — keeps the jit-cache key hashable
    arrs = {k: jnp.asarray(v) for k, v in kw.items()
            if hasattr(v, 'ndim') or isinstance(v, (list, tuple))}
    static = {k: v for k, v in kw.items() if k not in arrs}
    flips = jnp.asarray(flips)
    # voxel count: leading axis of any (nV, ...) operand.  A 1-D flips
    # train is ALWAYS the shared echo axis (never sharded), so it is
    # excluded both here and from vox_spec below — otherwise an
    # accidental nEcho == nV would silently shard the echoes. A 1-D
    # esp is the shared per-echo spacing train (round 4) — likewise
    # excluded and replicated.
    cands = [flips.shape[0]] if flips.ndim == 2 else []
    cands += [v.shape[0] for k, v in arrs.items()
              if v.ndim >= 1 and k != 'esp']
    assert cands, 'no per-voxel operand; nothing to shard'
    nV = max(cands)
    assert nV % sp == 0, (f'nV={nV} not divisible by spin mesh extent '
                          f'{sp}')
    names = tuple(sorted(arrs))
    flips_spec = vox_spec(flips) if flips.ndim == 2 else P()
    in_specs = (flips_spec,) + tuple(vox_spec(arrs[k], k)
                                     for k in names)
    f = _epg_cpmg_sharded_jit(mesh, names,
                              tuple(sorted(static.items())), in_specs)
    return f(flips, *(arrs[k] for k in names))


@_functools.lru_cache(maxsize=None)
def _epg_cpmg_sharded_jit(mesh: Mesh, names: tuple, static_items: tuple,
                          in_specs: tuple):
    r"""Cached jit of the voxel-sharded CPMG train (eager shard_map
    dispatches the whole echo-train scan op-by-op across the mesh)."""
    from mrphy_tpu.ops import epg

    def run(flips, *vals):
        def body(flips, *v):
            kwd = dict(zip(names, v))
            kwd.update(dict(static_items))
            return epg.epg_cpmg(flips, **kwd)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(SPIN_AXIS, None, None),
                          check_vma=False)
        return f(flips, *vals)

    return jax.jit(run)


def epg_spgr_sharded_traceable(mesh: Mesh, flips, phis=None, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.epg.epg_spgr` for 1-D
    voxel batches (round 4 — closes the one train family without a
    ``mesh=`` path): ``flips``/``phis`` batched `(nV, nTR)` or shared
    `(nTR,)` (replicated), per-voxel ``T1``/``T2``/``M0``/``zinit``/
    ``b1`` `(nV,)` sharded on the mesh's spin axis. ``tr``/``te``
    `(nTR,)` trains are shared TIME axes and always replicate (they
    are excluded from the voxel-count inference — an accidental
    ``nTR == nV`` must not shard the schedule). Returns
    `(nV, nTR, 2)`."""
    import jax.numpy as jnp

    sp = mesh.shape[SPIN_AXIS]

    arrs = {k: jnp.asarray(v) for k, v in kw.items()
            if hasattr(v, 'ndim') or isinstance(v, (list, tuple))}
    static = {k: v for k, v in kw.items() if k not in arrs}
    flips = jnp.asarray(flips)
    phis_a = None if phis is None else jnp.asarray(phis)
    cands = [flips.shape[0]] if flips.ndim == 2 else []
    cands += [a.shape[0] for a in (phis_a,)
              if a is not None and a.ndim == 2]
    cands += [v.shape[0] for k, v in arrs.items()
              if v.ndim >= 1 and k not in ('tr', 'te')]
    assert cands, 'no per-voxel operand; nothing to shard'
    nV = max(cands)
    assert nV % sp == 0, (f'nV={nV} not divisible by spin mesh extent '
                          f'{sp}')

    def vox_spec(x, key=None):
        x = jnp.asarray(x)
        if key in ('tr', 'te'):                  # shared time trains
            return P()
        if x.ndim >= 1 and x.shape[0] == nV:
            return P(SPIN_AXIS, *([None] * (x.ndim - 1)))
        return P()

    names = tuple(sorted(arrs))
    flips_spec = vox_spec(flips) if flips.ndim == 2 else P()
    has_phis = phis_a is not None
    phis_spec = (vox_spec(phis_a) if (has_phis and phis_a.ndim == 2)
                 else P())
    in_specs = (flips_spec,) + ((phis_spec,) if has_phis else ()) \
        + tuple(vox_spec(arrs[k], k) for k in names)
    f = _epg_spgr_sharded_jit(mesh, names,
                              tuple(sorted(static.items())), in_specs,
                              has_phis)
    args = (flips,) + ((phis_a,) if has_phis else ())
    return f(*args, *(arrs[k] for k in names))


@_functools.lru_cache(maxsize=None)
def _epg_spgr_sharded_jit(mesh: Mesh, names: tuple, static_items: tuple,
                          in_specs: tuple, has_phis: bool):
    r"""Cached jit of the voxel-sharded SPGR train."""
    from mrphy_tpu.ops import epg

    def run(*args):
        def body(flips, *rest):
            if has_phis:
                ph, vals = rest[0], rest[1:]
            else:
                ph, vals = None, rest
            kwd = dict(zip(names, vals))
            kwd.update(dict(static_items))
            return epg.epg_spgr(flips, ph, **kwd)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(SPIN_AXIS, None, None),
                          check_vma=False)
        return f(*args)

    return jax.jit(run)


def bssfp_train_sharded_traceable(mesh: Mesh, flips, **kw):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.ssfp.bssfp_train` for 1-D
    voxel batches: ``flips`` batched `(nV, nTR)` or a shared `(nTR,)`
    train (replicated; ``nV`` then comes from the per-voxel parameter
    arrays); per-voxel ``T1``/``T2``/``df``/``M0`` `(nV,)` (and
    ``Minit`` `(nV, 3)`) shard on the mesh's spin axis. The
    time-shaped kwargs ``phis``/``tr``/``te`` replicate when 1-D (a
    1-D array of these is ALWAYS the shared TR axis — pass `(nV, nTR)`
    phis for per-voxel schedules). Returns `(nV, nTR, 2)`. A static
    ``backend='pallas'`` kwarg passes through: each device runs the
    fused dictionary kernel on its voxel shard (shared-train workloads
    only)."""
    import jax.numpy as jnp

    sp = mesh.shape[SPIN_AXIS]
    flips = jnp.asarray(flips)
    allarr = {k: jnp.asarray(v) for k, v in kw.items()
              if hasattr(v, 'ndim') or isinstance(v, (list, tuple))}
    if flips.ndim == 2:
        nV = flips.shape[0]
    else:                   # shared (nTR,) train: replicate; nV from
        assert flips.ndim == 1      # the per-voxel parameter arrays
        # any non-time kwarg with a leading axis is a candidate (e.g.
        # a call whose only per-voxel operand is Minit (nV, 3)); 1-D
        # phis/tr/te are shared TR schedules, 2-D ones are (nV, nTR)
        cands = [v.shape[0] for k, v in allarr.items()
                 if v.ndim >= 1 and (k not in ('phis', 'tr', 'te')
                                     or v.ndim == 2)]
        assert cands, 'no per-voxel operand; nothing to shard'
        nV = max(cands)
    assert nV % sp == 0, (f'nV={nV} not divisible by spin mesh extent '
                          f'{sp}')

    def per_voxel(k, v):
        if k in ('phis', 'tr', 'te') and v.ndim == 1:
            return False          # 1-D time schedules are shared
        return v.ndim >= 1 and v.shape[0] == nV

    vox = {k: v for k, v in allarr.items() if per_voxel(k, v)}
    rep = {k: v for k, v in allarr.items() if k not in vox}
    static = {k: v for k, v in kw.items() if k not in allarr}
    vnames, rnames = tuple(sorted(vox)), tuple(sorted(rep))
    flips_spec = P(SPIN_AXIS, None) if flips.ndim == 2 else P()
    in_specs = ((flips_spec,)
                + tuple(P(SPIN_AXIS, *([None] * (vox[k].ndim - 1)))
                        for k in vnames)
                + tuple(P() for _ in rnames))
    f = _bssfp_sharded_jit(mesh, vnames, rnames,
                           tuple(sorted(static.items())), in_specs)
    return f(flips, *(vox[k] for k in vnames),
             *(rep[k] for k in rnames))


@_functools.lru_cache(maxsize=None)
def _bssfp_sharded_jit(mesh: Mesh, vnames: tuple, rnames: tuple,
                       static_items: tuple, in_specs: tuple):
    r"""Cached jit of the voxel-sharded bSSFP train (see
    :func:`_elementwise_jit` for why eager shard_map is avoided)."""
    from mrphy_tpu.ops import ssfp

    def run(flips, *vals):
        def body(flips, *v):
            kwd = dict(zip(vnames + rnames, v))
            kwd.update(dict(static_items))
            return ssfp.bssfp_train(flips, **kwd)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(SPIN_AXIS, None, None),
                          check_vma=False)
        return f(flips, *vals)

    return jax.jit(run)


def dict_match_sharded_traceable(mesh: Mesh, D, probes, *,
                                 chunk_probes=None, pair=None,
                                 basis=None):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.mrf.dict_match` (and the
    compressed variant when ``basis`` is given): the dictionary
    replicates — every chip matches the full atom set against ITS voxel
    shard — and ``probes`` `(nV, *tail)` (or `(nV, r)` compressed)
    shard on the mesh's spin axis. Communication-free: matching is an
    independent per-voxel argmax. Returns a
    :class:`~mrphy_tpu.ops.mrf.MatchResult` with voxel-sharded fields."""
    import jax.numpy as jnp

    D = jnp.asarray(D)
    probes = jnp.asarray(probes)
    sp = mesh.shape[SPIN_AXIS]
    assert probes.ndim >= 2, 'mesh= needs a leading (nV, ...) voxel axis'
    nV = probes.shape[0]
    assert nV % sp == 0, (f'nV={nV} not divisible by spin mesh extent '
                          f'{sp}')
    pair = None if pair is None else bool(pair)
    chunk = None if chunk_probes is None else int(chunk_probes)
    if basis is None:
        f = _dict_match_sharded_jit(mesh, probes.ndim,
                                    chunk, pair, None, False)
        return f(D, probes)
    f = _dict_match_sharded_jit(mesh, probes.ndim, chunk,
                                pair, tuple(basis.tail),
                                basis.jc is not None)
    args = (D, probes, basis.B) + (
        (basis.jc,) if basis.jc is not None else ())
    return f(*args)


@_functools.lru_cache(maxsize=None)
def _dict_match_sharded_jit(mesh: Mesh, pdim: int, chunk, pair,
                            tail, has_jc: bool):
    r"""Cached jit of the voxel-sharded dictionary match (see
    :func:`_elementwise_jit` for why eager shard_map is avoided)."""
    from mrphy_tpu.ops import mrf as _mrf

    vox = P(SPIN_AXIS, *([None] * (pdim - 1)))
    out = _mrf.MatchResult(P(SPIN_AXIS), P(SPIN_AXIS),
                           P(SPIN_AXIS, None))

    if tail is None:
        def body(D, X):
            return _mrf.dict_match(D, X, chunk_probes=chunk, pair=pair)

        in_specs = (P(), vox)
    else:
        def body(D, X, B, *jcs):
            b = _mrf.Basis(B=B, jc=jcs[0] if jcs else None,
                           s=B[:0, 0], tail=tail)
            return _mrf.dict_match_compressed(D, X, b,
                                              chunk_probes=chunk)

        in_specs = (P(), vox, P()) + ((P(),) if has_jc else ())

    def run(*vals):
        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=out, check_vma=False)
        return f(*vals)

    return jax.jit(run)


def signal_sharded_traceable(mesh: Mesh, M, loc_, ktraj, *, sens=None,
                             df=None, T2s=None, dt=None, chunk=None,
                             backend: str = 'xla',
                             _pallas_interpret: bool = False):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.signal.signal`: each chip
    encodes its spin shard's contribution to the k-space signal, then ONE
    ``psum`` over the spin mesh axis combines the per-coil signals (the
    only collective — it rides ICI). Per-spin operands (``M``, ``loc_``,
    ``sens``, ``df``, ``T2s``) shard by the ``(N, nM)`` shape rule;
    ``ktraj`` is a waveform (never spin-sharded)."""
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import signal as _sig
    from mrphy_tpu.utils._shapes import rshape

    M, loc_, ktraj = (jnp.asarray(x) for x in (M, loc_, ktraj))
    assert M.ndim == 3, 'mesh= requires compact (N, nM, xyz) layout'
    N, nM = M.shape[0], M.shape[1]
    _check_divisible(mesh, N, nM)
    dt = dt0 if dt is None else dt

    arrs = {'sens': None if sens is None else jnp.broadcast_to(
                jnp.asarray(sens), (N,) + jnp.asarray(sens).shape[1:]),
            'df': None if df is None else jnp.broadcast_to(
                rshape(df, 2), (N, nM)),
            'T2s': None if T2s is None else jnp.broadcast_to(
                rshape(T2s, 2), (N, nM))}
    arrs = {k: v for k, v in arrs.items() if v is not None}
    names = tuple(sorted(arrs))

    def wfspec(x):  # ktraj: time axis trailing, never spin-sharded
        return P(BATCH_AXIS if x.shape[0] == N else None,
                 *([None] * (x.ndim - 1)))

    dt_static, dt_args = _dt_split(dt)
    in_specs = ((spin_pspec(M, N, nM), spin_pspec(loc_, N, nM),
                 wfspec(ktraj))
                + tuple(P() for _ in dt_args)
                + tuple(spin_pspec(arrs[k], N, nM) for k in names))
    f = _signal_sharded_jit(mesh, names, chunk, backend,
                            _pallas_interpret, dt_static, in_specs)
    return f(M, loc_, ktraj, *dt_args, *(arrs[k] for k in names))


def _dt_split(dt):
    r"""dt → (static float, ()) when concrete — the Pallas signal
    backend needs a concrete dwell — or (None, (dt,)) when it is a
    tracer (XLA backend only; differentiable)."""
    try:
        return float(dt), ()
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None, (dt,)


@_functools.lru_cache(maxsize=None)
def _signal_sharded_jit(mesh: Mesh, names: tuple, chunk, backend: str,
                        _pallas_interpret: bool, dt_static,
                        in_specs: tuple):
    r"""Cached jit of the spin-sharded acquisition operator (eager
    shard_map dispatches each traced op across the mesh)."""
    from mrphy_tpu.ops import signal as _sig
    ndt = 0 if dt_static is not None else 1

    def run(M, loc_, ktraj, *vals):
        def body(M, loc_, ktraj, *v):
            dt = dt_static if ndt == 0 else v[0]
            kwd = dict(zip(names, v[ndt:]))
            s = _sig.signal(M, loc_, ktraj, dt=dt, chunk=chunk,
                            backend=backend,
                            _pallas_interpret=_pallas_interpret, **kwd)
            return jax.lax.psum(s, SPIN_AXIS)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(BATCH_AXIS, None, None, None),
                          check_vma=False)
        return f(M, loc_, ktraj, *vals)

    return jax.jit(run)


def signal_adjoint_sharded_traceable(mesh: Mesh, s, loc_, ktraj, *,
                                     sens=None, df=None, T2s=None,
                                     dt=None, chunk=None,
                                     backend: str = 'xla',
                                     _pallas_interpret: bool = False):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.signal.signal_adjoint`:
    the signal replicates over the spin mesh axis, each chip
    back-projects onto its own spin shard — zero collectives."""
    import jax.numpy as jnp
    from mrphy_tpu import dt0
    from mrphy_tpu.ops import signal as _sig
    from mrphy_tpu.utils._shapes import rshape

    s, loc_, ktraj = (jnp.asarray(x) for x in (s, loc_, ktraj))
    assert loc_.ndim == 3, 'mesh= requires compact (N|1, nM, xyz) loc_'
    N, nM = s.shape[0], loc_.shape[1]
    _check_divisible(mesh, N, nM)
    dt = dt0 if dt is None else dt
    loc_ = jnp.broadcast_to(loc_, (N,) + loc_.shape[1:])

    arrs = {'sens': None if sens is None else jnp.broadcast_to(
                jnp.asarray(sens), (N,) + jnp.asarray(sens).shape[1:]),
            'df': None if df is None else jnp.broadcast_to(
                rshape(df, 2), (N, nM)),
            'T2s': None if T2s is None else jnp.broadcast_to(
                rshape(T2s, 2), (N, nM))}
    arrs = {k: v for k, v in arrs.items() if v is not None}
    names = tuple(sorted(arrs))

    def wfspec(x):
        return P(BATCH_AXIS if x.shape[0] == N else None,
                 *([None] * (x.ndim - 1)))

    dt_static, dt_args = _dt_split(dt)
    in_specs = ((P(BATCH_AXIS, None, None, None),
                 spin_pspec(loc_, N, nM), wfspec(ktraj))
                + tuple(P() for _ in dt_args)
                + tuple(spin_pspec(arrs[k], N, nM) for k in names))
    f = _signal_adjoint_sharded_jit(mesh, names, chunk, backend,
                                    _pallas_interpret, dt_static,
                                    in_specs)
    return f(s, loc_, ktraj, *dt_args, *(arrs[k] for k in names))


@_functools.lru_cache(maxsize=None)
def _signal_adjoint_sharded_jit(mesh: Mesh, names: tuple, chunk,
                                backend: str, _pallas_interpret: bool,
                                dt_static, in_specs: tuple):
    r"""Cached jit of the spin-sharded acquisition adjoint."""
    from mrphy_tpu.ops import signal as _sig
    ndt = 0 if dt_static is not None else 1

    def run(s, loc_, ktraj, *vals):
        def body(s, loc_, ktraj, *v):
            dt = dt_static if ndt == 0 else v[0]
            kwd = dict(zip(names, v[ndt:]))
            return _sig.signal_adjoint(
                s, loc_, ktraj, dt=dt, chunk=chunk, backend=backend,
                _pallas_interpret=_pallas_interpret, **kwd)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(BATCH_AXIS, SPIN_AXIS, None),
                          check_vma=False)
        return f(s, loc_, ktraj, *vals)

    return jax.jit(run)


def epgx_train_sharded_traceable(mesh: Mesh, train: str, flips,
                                 phis=None, **kw):
    r"""shard_map-wrapped EPG-X trains (``'cpmg'`` ⊻ ``'spgr'`` ⊻
    ``'mt_spgr'``) for 1-D voxel batches: ``flips`` batched `(nV, nT)`
    or a shared `(nT,)` train (replicated; ``nV`` then comes from the
    per-voxel parameter arrays — required for a static
    ``backend='pallas'``, which runs the fused dictionary kernel on
    each device's voxel shard). ``phis`` and kwargs shard with
    the voxels when their leading axis is ``nV``, else replicate —
    EXCEPT the time-shaped ``wt``: a 1-D ``wt`` with ``nTR == nV`` is
    ambiguous and rejected (pass `(1, nTR)` for a shared train or
    `(nV, 1)` for per-voxel rates). Returns `(nV, nT, 2)`."""
    import jax.numpy as jnp

    assert train in ('cpmg', 'spgr', 'mt_spgr'), train
    sp = mesh.shape[SPIN_AXIS]
    flips = jnp.asarray(flips)
    if flips.ndim == 2:
        nV, nT = flips.shape
    else:                   # shared (nT,) train: replicate; nV from
        assert flips.ndim == 1      # the per-voxel parameter arrays
        nT = flips.shape[0]
        _c = [jnp.asarray(v).shape[0] for k, v in kw.items()
              if k not in ('wt', 'tr', 'esp') and hasattr(v, 'ndim')
              and jnp.asarray(v).ndim == 1]
        assert _c, 'no per-voxel operand; nothing to shard'
        nV = max(_c)
    assert nV % sp == 0, (f'nV={nV} not divisible by spin mesh extent '
                          f'{sp}')

    def per_voxel(k, v):
        if v.ndim < 1 or v.shape[0] != nV:
            return False
        if k in ('tr', 'esp') and v.ndim == 1:
            return False     # shared per-TR/per-echo interval trains
        if k == 'wt' and v.ndim == 1 and nV == nT:
            raise ValueError(
                "mesh=: 1-D wt with nTR == nV is ambiguous; pass "
                "(1, nTR) for a shared saturation train or (nV, 1) "
                "for per-voxel rates")
        return True

    # three-way split: per-voxel arrays shard; other arrays (shared
    # trains, 0-d scalars, tracers) are traced but REPLICATED; python
    # scalars stay static (hashable jit-cache key)
    allarr = {k: jnp.asarray(v) for k, v in kw.items()
              if hasattr(v, 'ndim') or isinstance(v, (list, tuple))}
    vox = {k: v for k, v in allarr.items() if per_voxel(k, v)}
    rep = {k: v for k, v in allarr.items() if k not in vox}
    static = {k: v for k, v in kw.items() if k not in allarr}
    vnames, rnames = tuple(sorted(vox)), tuple(sorted(rep))
    # phis is per-voxel when batched (nV, nT); else replicate
    phis_a = None if phis is None else jnp.asarray(phis)
    phis_sharded = phis_a is not None and phis_a.ndim == 2 \
        and phis_a.shape[0] == nV

    pos = (flips,) + ((phis_a,) if phis_sharded else ())
    rep_phis = () if phis_sharded or phis_a is None else (phis_a,)
    flips_spec = P(SPIN_AXIS, None) if flips.ndim == 2 else P()
    in_specs = ((flips_spec,)
                + tuple(P(SPIN_AXIS, None) for _ in pos[1:])
                + tuple(P(SPIN_AXIS, *([None] * (vox[k].ndim - 1)))
                        for k in vnames)
                + tuple(P() for _ in rep_phis)
                + tuple(P() for _ in rnames))
    f = _epgx_train_sharded_jit(
        mesh, train, len(pos), phis_sharded, bool(rep_phis), vnames,
        rnames, tuple(sorted(static.items())), in_specs)
    return f(*pos, *(vox[k] for k in vnames), *rep_phis,
             *(rep[k] for k in rnames))


@_functools.lru_cache(maxsize=None)
def _epgx_train_sharded_jit(mesh: Mesh, train: str, npos: int,
                            phis_sharded: bool, has_rep_phis: bool,
                            vnames: tuple, rnames: tuple,
                            static_items: tuple, in_specs: tuple):
    r"""Cached jit of the voxel-sharded EPG-X trains (see
    :func:`_elementwise_jit` for why eager shard_map is avoided)."""
    from mrphy_tpu.ops import epg

    fn = {'cpmg': epg.epgx_cpmg, 'spgr': epg.epgx_spgr,
          'mt_spgr': epg.epgx_mt_spgr}[train]

    def run(*vals):
        def body(*v):
            p, rest = v[:npos], list(v[npos:])
            flips = p[0]
            ph = p[1] if phis_sharded else None
            vv = {k: rest.pop(0) for k in vnames}
            if has_rep_phis:
                ph = rest.pop(0)
            vv.update({k: rest.pop(0) for k in rnames})
            vv.update(dict(static_items))
            if train == 'cpmg':
                return fn(flips, **vv)
            return fn(flips, ph, **vv)

        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(SPIN_AXIS, None, None),
                          check_vma=False)
        return f(*vals)

    return jax.jit(run)


def nufft_sharded_traceable(mesh: Mesh, plan, img, ktraj, *, df=None,
                            T2s=None, dt=None, nseg: int = 8,
                            chunk=None):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.nufft.nufft`: the image
    (and its uniform-DFT grid stage) replicates over the mesh; the
    samples — and hence the `(nT, W^d)` interpolation tap table, the
    adjoint's memory bound — shard over the spin axis. Zero
    collectives in the forward. ``nT`` is zero-padded to the mesh
    extent (exact: padded outputs are sliced off). With ``df``/``T2s``
    the segmentation coefficients ``b_l(t)`` are built on the GLOBAL
    time axis and sharded alongside the samples."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as _nf

    img, ktraj = jnp.asarray(img), jnp.asarray(ktraj)
    nT = ktraj.shape[-1]
    sp = mesh.shape[SPIN_AXIS]
    pad = (-nT) % sp
    kp = jnp.pad(ktraj, ((0, 0), (0, pad)))
    segmented = df is not None or T2s is not None
    nseg = min(int(nseg), nT)    # match _segments' nT=1 NaN guard
    f = _nufft_sharded_jit(mesh, segmented, nseg, chunk)
    if segmented:
        assert dt is not None, 'df/T2s time segmentation needs dt'
        b, w = _nf._segments(plan, df, T2s, dt, nseg, nT, img.dtype)
        b = jnp.pad(b, ((0, 0), (0, pad)))
        return f(plan, img, kp, b, w)[:nT]
    return f(plan, img, kp)[:nT]


@_functools.lru_cache(maxsize=None)
def _nufft_sharded_jit(mesh: Mesh, segmented: bool, nseg: int, chunk):
    r"""Cached jit of the sample-sharded NUFFT forward: eager calls of
    the *_traceable wrappers would otherwise dispatch each traced op
    across the mesh one by one (measured ~70 s per segmented call on
    the 8-virtual-device CPU mesh vs ~1 s compiled)."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as _nf

    def run(plan, img, kp, *bw):
        def body(k_sh, *b_sh):
            if not segmented:
                return _nf._fwd_core(plan, img, k_sh, chunk)
            w = bw[1]
            s = jnp.zeros((k_sh.shape[-1], 2), img.dtype)
            for el in range(nseg):
                wr, wi = (img[..., 0] * w[el, ..., 0]
                          - img[..., 1] * w[el, ..., 1],
                          img[..., 0] * w[el, ..., 1]
                          + img[..., 1] * w[el, ..., 0])
                s = s + b_sh[0][el][:, None] * _nf._fwd_core(
                    plan, jnp.stack([wr, wi], -1), k_sh, chunk)
            return s

        in_specs = ((P(None, SPIN_AXIS), P(None, SPIN_AXIS))
                    if segmented else (P(None, SPIN_AXIS),))
        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(SPIN_AXIS, None), check_vma=False)
        return f(kp, bw[0]) if segmented else f(kp)

    return jax.jit(run)


def nufft_adjoint_sharded_traceable(mesh: Mesh, plan, s, ktraj, *,
                                    df=None, T2s=None, dt=None,
                                    nseg: int = 8, chunk=None):
    r"""shard_map-wrapped :func:`mrphy_tpu.ops.nufft.nufft_adjoint`:
    each chip KB-scatters its sample shard onto a local oversampled
    grid, ONE ``psum`` (over all segments at once) combines them, and
    the replicated inverse-DFT/deapodize stage finishes. Padded
    samples carry ``s = 0`` and scatter nothing (exact)."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as _nf

    s, ktraj = jnp.asarray(s), jnp.asarray(ktraj)
    nT = ktraj.shape[-1]
    sp = mesh.shape[SPIN_AXIS]
    pad = (-nT) % sp
    kp = jnp.pad(ktraj, ((0, 0), (0, pad)))
    sP = jnp.pad(s, ((0, pad), (0, 0)))
    segmented = df is not None or T2s is not None
    nseg = min(int(nseg), nT)    # match _segments' nT=1 NaN guard
    f = _nufft_adjoint_sharded_jit(mesh, segmented, nseg, chunk)
    if segmented:
        assert dt is not None, 'df/T2s time segmentation needs dt'
        b, w = _nf._segments(plan, df, T2s, dt, nseg, nT, s.dtype)
        b = jnp.pad(b, ((0, 0), (0, pad)))
        return f(plan, sP, kp, b, w)
    return f(plan, sP, kp)


@_functools.lru_cache(maxsize=None)
def _nufft_adjoint_sharded_jit(mesh: Mesh, segmented: bool, nseg: int,
                               chunk):
    r"""Cached jit of the sample-sharded NUFFT adjoint (see
    :func:`_nufft_sharded_jit` for why)."""
    import jax.numpy as jnp
    from mrphy_tpu.ops import nufft as _nf

    def run(plan, sP, kp, *bw):
        def body(k_sh, s_sh, *b_sh):
            if not segmented:
                g = _nf._adj_scatter(plan, s_sh, k_sh, chunk)
                g = jax.lax.psum(g, SPIN_AXIS)
                return _nf._adj_finish(plan, g)
            w = bw[1]
            gs = jnp.stack([_nf._adj_scatter(
                plan, b_sh[0][el][:, None] * s_sh, k_sh, chunk)
                for el in range(nseg)])
            gs = jax.lax.psum(gs, SPIN_AXIS)      # one collective
            out = jnp.zeros(plan.im_size + (2,), sP.dtype)
            for el in range(nseg):
                x = _nf._adj_finish(plan, gs[el])
                xr = (x[..., 0] * w[el, ..., 0]
                      + x[..., 1] * w[el, ..., 1])
                xi = (x[..., 1] * w[el, ..., 0]
                      - x[..., 0] * w[el, ..., 1])
                out = out + jnp.stack([xr, xi], -1)
            return out

        in_specs = ((P(None, SPIN_AXIS), P(SPIN_AXIS, None),
                     P(None, SPIN_AXIS)) if segmented
                    else (P(None, SPIN_AXIS), P(SPIN_AXIS, None)))
        out_specs = P(*([None] * (len(plan.im_size) + 1)))
        f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
        return f(kp, sP, bw[0]) if segmented else f(kp, sP)

    return jax.jit(run)


def psum_loss(fn):
    r"""Wrap a per-spin loss ``fn(...) -> (N, nM)`` into a global mean that
    is sharding-correct: ``jnp.mean`` under ``jit`` + sharding lowers to a
    local reduce + ``psum`` over ICI."""
    import jax.numpy as jnp
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        return jnp.mean(fn(*args, **kw))
    return wrapped


def shard_spin_obj(obj, mesh: Mesh):
    r"""Shard a ``SpinArray``/``SpinCube`` (any registered pytree with
    ``shape``/``nM``) over the mesh: leaf axis 0 of extent ``N`` goes to
    the batch mesh axis, leaf axis 1 of extent ``nM`` to the spin axis;
    everything else replicates. ``nM`` must be divisible by the mesh's
    spin extent (pad the mask/compact attrs otherwise).
    """
    import jax.numpy as jnp  # noqa: F401

    N, nM = obj.shape[0], obj.nM
    k = mesh.shape[SPIN_AXIS]
    assert nM % k == 0, (f'nM={nM} not divisible by spin mesh extent {k}; '
                         f'pad the mask to a multiple')

    def put(x):
        if not hasattr(x, 'ndim'):
            return x
        spec = [None] * x.ndim
        if x.ndim >= 1 and x.shape[0] == N:
            spec[0] = BATCH_AXIS
        if x.ndim >= 2 and x.shape[1] == nM:
            spec[1] = SPIN_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    leaves, treedef = jax.tree_util.tree_flatten(obj)
    return jax.tree_util.tree_unflatten(treedef, [put(x) for x in leaves])
