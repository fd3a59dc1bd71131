r"""User-facing object model: ``Pulse``, ``SpinArray``, ``SpinCube``,
``SpinBolus``, ``Examples``.

Feature parity with ``/root/reference/mrphy/mobjs.py``, redesigned for JAX:

- Objects are **registered pytrees**: they pass through ``jit`` / ``grad`` /
  ``vmap`` boundaries; array attributes are leaves, ``shape``/``mask``/
  ``desc`` are static aux data. The reference's ``asdict``-based
  serialization (``mobjs.py:127-146,452-474``) is kept, and pytree
  flattening gives structural serialization for free.
- **Masked compact storage** (``(N, nM, ...)`` vs grid ``(N, *Nd, ...)``,
  ref ``mobjs.py:289-302``) uses a *static* boolean mask (host numpy).
  ``nM`` is a static int, so ``embed``/``extract`` are jittable
  gather/scatter with concrete indices — the TPU answer to "dynamic shapes
  don't jit".
- JAX arrays are immutable: where the reference mutates
  (``cube.M_[crds] = v``, ``doUpdate=True`` writing ``self.M_``,
  ``mobjs.py:447-448``), mutation here happens at the Python attribute
  level between jitted calls (``obj.M_ = new``), and indexed writes use
  the functional idiom ``obj.M_ = obj.M_.at[crds].set(v)`` with the same
  ``crds_`` index helper.
- ``device`` constructor keywords are accepted for API compatibility;
  placement is handled by JAX (``jax.device_put`` when an explicit device
  is given).

Unicode attribute/keyword aliases of the reference API are accepted
everywhere: ``γ``/``γ_`` ↔ ``gam``/``gam_``, ``Δf``/``Δf_`` ↔ ``df``/``df_``.
"""

import copy
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mrphy_tpu import (gamH, dt0, gmax0, smax0, rfmax0, T1G, T2G, pi)
from mrphy_tpu.ops import beffective, sims
from mrphy_tpu.utils import ctrsub

__all__ = ['Pulse', 'SpinArray', 'SpinCube', 'SpinBolus', 'Examples']

# Unicode → ASCII attribute-name normalization (reference spellings)
_UNI2ASCII = {'γ': 'gam', 'γ_': 'gam_', 'Δf': 'df', 'Δf_': 'df_'}


def _norm_name(k: str) -> str:
    return _UNI2ASCII.get(k, k)


def _asarr(v, dtype):
    return jnp.asarray(v, dtype=dtype)


def _tonp(x, toNumpy: bool):
    x = jax.lax.stop_gradient(x)
    return np.asarray(x) if toNumpy else x


class _SlotStateMixin:
    r"""Pickle/deepcopy support for validated ``__slots__`` classes.

    ``__setstate__`` restores raw slot values via ``object.__setattr__``,
    bypassing attribute validation — the clean replacement for the
    reference's ``inspect.stack()`` deepcopy hack
    (``/root/reference/mrphy/mobjs.py:96-99``).
    """

    __slots__ = ()

    def __getstate__(self):
        state = {}
        for klass in type(self).__mro__:
            for k in getattr(klass, '__slots__', ()):
                desc = klass.__dict__.get(k)
                if desc is None:
                    continue
                try:
                    state[k] = desc.__get__(self, klass)
                except AttributeError:
                    pass  # unset slot (e.g. SpinArray slots on a SpinCube)
        return state

    def __setstate__(self, state):
        for k, v in state.items():
            object.__setattr__(self, k, v)


# ==========================================================================
# Pulse
# ==========================================================================

class Pulse(_SlotStateMixin):
    r"""RF + gradient pulse container.

    Usage:
        ``pulse = Pulse(rf, gr, *, dt, gmax, smax, rfmax, desc, dtype)``

    Inputs:
        - ``rf``: `(N, xy, nT, (nCoils))`, "Gauss"; x: real, y: imag.
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm".
        - ``dt``: `()` ⊻ `(N ⊻ 1,)`, "Sec", dwell time.
        - ``gmax``/``smax``: `()` ⊻ `(N ⊻ 1, xyz ⊻ 1)`, limits.
        - ``rfmax``: `()` ⊻ `(N ⊻ 1, (nCoils))`, "Gauss".
        - ``desc``: str description.
        - ``dtype``: jnp dtype (default: inferred from ``rf``/``gr``,
          falling back to float32).

    Parity: ``/root/reference/mrphy/mobjs.py:18-240``. Registered as a JAX
    pytree (leaves: rf, gr, dt, gmax, smax, rfmax).
    """

    _readonly = ('shape', 'dtype', 'device', 'is_cuda', 'is_tpu')
    _limits = ('gmax', 'smax', 'rfmax')
    __slots__ = ('rf', 'gr', 'dt', 'gmax', 'smax', 'rfmax', 'desc', '_dtype')

    def __init__(self, rf=None, gr=None, *, dt=dt0, gmax=gmax0, smax=smax0,
                 rfmax=rfmax0, desc: str = 'generic pulse',
                 device=None, dtype=None):
        assert not (rf is None and gr is None), \
            'Missing both `rf` and `gr` inputs'

        if dtype is None:
            cands = [jnp.asarray(x).dtype for x in (rf, gr)
                     if x is not None and hasattr(x, 'dtype')]
            dtype = jnp.result_type(*cands) if cands else jnp.float32
            if not jnp.issubdtype(dtype, jnp.floating):
                dtype = jnp.float32
        object.__setattr__(self, '_dtype', jnp.dtype(dtype))

        if rf is None:
            gr = _asarr(gr, dtype)
            rf = jnp.zeros((gr.shape[0], 2, gr.shape[2]), dtype)
        elif gr is None:
            rf = _asarr(rf, dtype)
            gr = jnp.zeros((rf.shape[0], 3, rf.shape[2]), dtype)

        self.rf, self.gr = rf, gr
        self.dt, self.gmax, self.smax, self.rfmax = dt, gmax, smax, rfmax
        self.desc = desc
        if device is not None:
            for k in ('rf', 'gr', 'dt', 'gmax', 'smax', 'rfmax'):
                object.__setattr__(self, k,
                                   jax.device_put(getattr(self, k), device))

    # -- attribute validation (parity: mobjs.py:95-125) --
    def __setattr__(self, k, v):
        if k in self._readonly:
            raise AttributeError(f"'Pulse' attribute '{k}' is read-only")
        if k == 'desc':
            object.__setattr__(self, k, v)
            return
        v = _asarr(v, self._dtype)
        if k in ('rf', 'gr'):
            cur = getattr(self, 'gr' if k == 'rf' else 'rf', None)
            if cur is not None:
                assert v.shape[0] == cur.shape[0] and \
                    v.shape[2] == cur.shape[2], \
                    f'{k} shape {v.shape} inconsistent with {cur.shape}'
        elif k in ('gmax', 'smax'):  # → (N ⊻ 1, xyz)
            if v.ndim == 0:
                v = v[None, None]
            elif v.ndim == 1:
                v = v[None, :] if v.shape[0] == 3 else v[:, None]
            v = jnp.broadcast_to(v, (v.shape[0], 3))
        elif k == 'rfmax':  # → (N ⊻ 1, (nCoils))
            if v.ndim == 0:
                v = v[None]
            elif v.ndim == 2 and v.shape[1] == 1:
                v = v[:, 0]
        elif k == 'dt':
            if v.ndim == 0:
                v = v[None]
            assert v.ndim == 1, f'dt must be scalar or 1-d, got {v.shape}'
        object.__setattr__(self, k, v)

    def __getattr__(self, k):
        raise AttributeError(f"'Pulse' has no attribute '{k}'")

    # -- properties --
    @property
    def shape(self):
        return (self.rf.shape[0], 1, self.rf.shape[2])

    @property
    def dtype(self):
        return self._dtype

    @property
    def device(self):
        devs = getattr(self.rf, 'devices', None)
        return next(iter(devs())) if devs else None

    @property
    def is_cuda(self):
        return False

    @property
    def is_tpu(self):
        d = self.device
        return d is not None and d.platform.startswith(('tpu', 'axon'))

    def __repr__(self):
        N, _, nT = self.shape
        return (f'Pulse(N={N}, nT={nT}, dtype={self.dtype}, '
                f'desc={self.desc!r})')

    # -- methods --
    def asdict(self, *, toNumpy: bool = True) -> dict:
        r"""Detached dict of the object (parity: mobjs.py:127-146)."""
        keys = ('rf', 'gr', 'dt', 'gmax', 'smax', 'rfmax')
        d = {k: _tonp(getattr(self, k), toNumpy) for k in keys}
        d.update(desc=self.desc, device=self.device, dtype=self.dtype)
        return d

    def beff(self, loc, *, gam=gamH, **kw):
        r"""B-effective at ``loc`` from this pulse
        (parity: mobjs.py:148-175).

        Optionals: ``df`` (alias ``Δf``): `(N, *Nd)`, "Hz"; ``b1Map``:
        `(N, *Nd, xy, (nCoils))`; ``gam`` (alias ``γ``).
        Outputs: ``beff``: `(N, *Nd, nT, xyz)`.
        """
        return beffective.rfgr2beff(self.rf, self.gr, loc, gam=gam, **kw)

    def interpT(self, dt, *, kind: str = 'linear') -> 'Pulse':
        r"""Temporal resampling to a new dwell time (multi-scale design).

        On-device resampling replaces the reference's host-SciPy
        round-trip (``mobjs.py:177-220``, the one device→host boundary in
        the reference) for EVERY kind: 'linear' via ``jnp.interp``;
        'cubic'/'nearest'/'nearest-up'/'previous'/'next'/'zero' via a
        precomputed `(nNew, nOld)` interpolation matrix applied as one
        HIGHEST-precision matmul (:mod:`mrphy_tpu.utils.interp` — grids
        are static, so the not-a-knot spline solve folds into the
        matrix on the host; exotic kinds probe SciPy column-wise at
        build time only). Unlike the reference's host path, the
        resample stays differentiable w.r.t. ``rf``/``gr``. ``dt`` must
        be scalar/concrete on both sides (the output length is
        shape-determining, hence not jittable).

        Inputs:
            - ``dt``: `()` ⊻ `(1,)`, "Sec", new dwell time.
            - ``kind``: any SciPy ``interp1d`` kind (default 'linear',
              matching the reference's default).
        """
        # compare both dwell times in the pulse dtype (the stored dt is
        # e.g. float32; comparing it to a float64 argument would miss the
        # equality shortcut and floor away the final resampled step)
        cast = np.dtype(self.dtype).type
        dt_o = float(cast(np.asarray(self.dt).reshape(-1)[0]))
        dt_n = float(cast(np.asarray(dt).reshape(-1)[0]))
        assert np.asarray(self.dt).size == 1 and np.asarray(dt).size == 1, \
            'interpT requires scalar/global dwell times'
        if dt_o == dt_n:
            return copy.deepcopy(self)

        # prepend a zero sample, like the reference (mobjs.py:204-207)
        f0 = lambda x: jnp.concatenate(  # noqa: E731
            [jnp.zeros_like(x[:, :, :1]), x], axis=2)
        rf0, gr0 = f0(self.rf), f0(self.gr)

        nT = rf0.shape[2]
        t_o = np.arange(nT) * dt_o
        # tolerant floor: dt ratios that are exact in intent (e.g. dt/2)
        # may be a few ulps under an integer after float conversion
        t_n = np.arange(1, int(np.floor(t_o[-1] / dt_n + 1e-9)) + 1) * dt_n

        if kind == 'linear':
            def interp_time(x):  # x: (..., nT_old, ...) time on axis 2
                xm = jnp.moveaxis(x, 2, -1)
                flat = xm.reshape(-1, nT)
                out = jax.vmap(lambda y: jnp.interp(
                    jnp.asarray(t_n), jnp.asarray(t_o), y))(flat)
                return jnp.moveaxis(
                    out.reshape(xm.shape[:-1] + (len(t_n),)), -1, 2)
            rf_n, gr_n = interp_time(rf0), interp_time(gr0)
        else:
            from mrphy_tpu.utils.interp import (interp_matrix,
                                                interp1d_apply)
            C = interp_matrix(t_o, t_n, kind)
            rf_n = interp1d_apply(C, rf0, axis=2)
            gr_n = interp1d_apply(C, gr0, axis=2)

        desc = f'{self.desc} + interpT\'ed: dt = {dt_n}'
        return Pulse(_asarr(rf_n, self.dtype), _asarr(gr_n, self.dtype),
                     dt=dt, desc=desc, dtype=self.dtype)

    def to(self, *, device=None, dtype=None) -> 'Pulse':
        r"""Copy with new dtype and/or device (parity: mobjs.py:222-240)."""
        dtype = self.dtype if dtype is None else dtype
        if dtype == self.dtype and device is None:
            return self
        return Pulse(self.rf, self.gr, dt=self.dt, gmax=self.gmax,
                     smax=self.smax, rfmax=self.rfmax, desc=self.desc,
                     device=device, dtype=dtype)


def _pulse_flatten(p: Pulse):
    leaves = (p.rf, p.gr, p.dt, p.gmax, p.smax, p.rfmax)
    aux = (p.desc, p._dtype)
    return leaves, aux


def _pulse_unflatten(aux, leaves):
    p = object.__new__(Pulse)
    for k, v in zip(('rf', 'gr', 'dt', 'gmax', 'smax', 'rfmax'), leaves):
        object.__setattr__(p, k, v)
    object.__setattr__(p, 'desc', aux[0])
    object.__setattr__(p, '_dtype', aux[1])
    return p


jax.tree_util.register_pytree_node(Pulse, _pulse_flatten, _pulse_unflatten)


# ==========================================================================
# SpinArray
# ==========================================================================

class SpinArray(_SlotStateMixin):
    r"""Batched spin ensemble over a (statically) masked grid.

    Usage:
        ``spinarray = SpinArray(shape, mask, *, T1(_), T2(_), γ(_)/gam(_),``
        `` M(_), dtype)``

    Inputs:
        - ``shape``: tuple ``(N, *Nd)``.
    Optionals:
        - ``mask``: `(1, *Nd)` bool (host/static); compact attributes hold
          only the ``nM = mask.sum()`` masked locations.
        - ``T1`` ⊻ ``T1_``, ``T2`` ⊻ ``T2_``, ``gam`` ⊻ ``gam_`` (aliases
          ``γ``/``γ_``), ``M`` ⊻ ``M_``: grid `(N, *Nd, ...)` or compact
          `(N, nM, ...)` attributes.

    Properties: ``shape``, ``mask``, ``ndim``, ``nM``, ``dtype``; compact
    ``T1_, T2_, gam_, M_``; grid views via plain names (``obj.T1`` embeds).

    Parity: ``/root/reference/mrphy/mobjs.py:243-685``. The mask is global
    per batch (same rationale: one compact buffer per attribute) and
    **static** (host numpy), which is what makes ``applypulse`` jittable.
    """

    _readonly = ('shape', 'mask', 'device', 'dtype', 'is_cuda', 'is_tpu',
                 'ndim', 'nM')
    _compact = ('T1_', 'T2_', 'gam_', 'M_')
    __slots__ = ('T1_', 'T2_', 'gam_', 'M_',
                 '_shape', '_mask', '_midx', '_dtype')

    def __init__(self, shape: tuple, mask=None, *,
                 T1=None, T1_=None, T2=None, T2_=None,
                 gam=None, gam_=None, M=None, M_=None,
                 device=None, dtype=jnp.float32, **kw):
        # unicode kwarg aliases: γ/γ_
        for uni, asc in (('γ', 'gam'), ('γ_', 'gam_')):
            if uni in kw:
                assert locals()[asc] is None
                if asc == 'gam':
                    gam = kw.pop(uni)
                else:
                    gam_ = kw.pop(uni)
        assert not kw, f'unknown kwargs: {sorted(kw)}'

        shape = tuple(int(s) for s in shape)
        if mask is None:
            mask = np.ones((1,) + shape[1:], dtype=bool)
        mask = np.asarray(mask)
        assert mask.dtype == np.bool_ and mask.shape == (1,) + shape[1:], \
            f'mask must be bool of shape {(1,) + shape[1:]}'

        object.__setattr__(self, '_shape', shape)
        object.__setattr__(self, '_mask', mask)
        object.__setattr__(self, '_midx',
                           np.flatnonzero(mask[0].reshape(-1)))
        object.__setattr__(self, '_dtype', jnp.dtype(dtype))

        assert (T1 is None) or (T1_ is None)
        if T1 is None:
            self.T1_ = T1G if T1_ is None else T1_
        else:
            self.T1 = T1

        assert (T2 is None) or (T2_ is None)
        if T2 is None:
            self.T2_ = T2G if T2_ is None else T2_
        else:
            self.T2 = T2

        assert (gam is None) or (gam_ is None)
        if gam is None:
            self.gam_ = gamH if gam_ is None else gam_
        else:
            self.gam = gam

        assert (M is None) or (M_ is None)
        if M is None:
            self.M_ = jnp.asarray([0., 0., 1.], dtype) if M_ is None else M_
        else:
            self.M = M

        if device is not None:
            for k in self._compact:
                object.__setattr__(self, k,
                                   jax.device_put(getattr(self, k), device))

    # -- static properties --
    @property
    def shape(self):
        return self._shape

    @property
    def mask(self):
        return self._mask

    @property
    def ndim(self):
        return len(self._shape)

    @property
    def nM(self):
        return int(self._midx.size)

    @property
    def dtype(self):
        return self._dtype

    @property
    def device(self):
        devs = getattr(self.M_, 'devices', None)
        return next(iter(devs())) if devs else None

    @property
    def is_cuda(self):
        return False

    @property
    def is_tpu(self):
        d = self.device
        return d is not None and d.platform.startswith(('tpu', 'axon'))

    # -- attribute semantics (parity: mobjs.py:356-392) --
    def __getattr__(self, k):
        k = _norm_name(k)
        if k in self._compact:  # unicode alias of a compact slot (γ_ → gam_)
            return object.__getattribute__(self, k)
        if k + '_' not in self._compact:
            raise AttributeError(f"'SpinArray' has no attribute '{k}'")
        v_ = getattr(self, k + '_')
        if self.nM == int(np.prod(self.shape[1:])):
            return v_.reshape(self.shape + v_.shape[2:])
        return self.embed(v_)

    def __setattr__(self, k_, v_):
        k_ = _norm_name(k_)
        if k_ in self._readonly:
            raise AttributeError(f"'SpinArray' attribute '{k_}' is read-only")
        if k_ in SpinArray.__slots__ and k_ not in self._compact:
            raise AttributeError(f"'{k_}' is internal")

        v_ = _asarr(v_, self._dtype)
        shape = self._shape
        vec3 = ('M_', 'vel_')  # (N, nM, xyz)-shaped compact attributes
        if k_ + '_' in self._compact:  # non-compact assignment → extract
            k_ = k_ + '_'
            tgt = shape + ((3,) if k_ in vec3 else ())
            v_ = self.extract(jnp.broadcast_to(v_, tgt))

        if k_ in vec3:
            v_ = jnp.broadcast_to(v_, (shape[0], self.nM, 3))
        elif k_ in self._compact:  # (T1_, T2_, gam_)
            v_ = jnp.broadcast_to(v_, (shape[0], self.nM))
        object.__setattr__(self, k_, v_)

    # -- embed/extract (parity: mobjs.py:512-553) --
    def embed(self, v_, *, fill=jnp.nan):
        r"""Compact `(N, nM, ...)` → grid `(N, *Nd, ...)`, ``fill`` outside
        the mask (NaN like the reference)."""
        v_ = jnp.asarray(v_)
        N, tail = self.shape[0], v_.shape[2:]
        nS = int(np.prod(self.shape[1:]))
        flat = jnp.full((N, nS) + tail, jnp.asarray(fill, v_.dtype),
                        dtype=v_.dtype)
        flat = flat.at[:, self._midx].set(v_)
        return flat.reshape(self.shape + tail)

    def extract(self, v):
        r"""Grid `(N, *Nd, ...)` → compact `(N, nM, ...)`."""
        v = jnp.asarray(v)
        tail = v.shape[self.ndim:]
        nS = int(np.prod(self.shape[1:]))
        return v.reshape((self.shape[0], nS) + tail)[:, self._midx]

    def crds_(self, crds: list) -> list:
        r"""Map grid indices to compact-attribute indices.

        ``v_[crds_] == v[crds]`` (grid positions outside the mask are
        dropped). Use with the functional update idiom:
        ``obj.M_ = obj.M_.at[tuple(crds_)].set(value)``.

        Parity: ``/root/reference/mrphy/mobjs.py:476-502``.
        """
        ndim, nM = self.ndim, self.nM
        assert len(crds) >= ndim
        crds_ = [crds[0]] + [crds[i] for i in range(ndim, len(crds))]
        m = np.full(self.mask.shape, -1, dtype=np.int64)
        m[self.mask] = np.arange(nM)
        inds_ = [i for i in np.asarray(m[tuple([[0]] + list(crds[1:ndim]))]
                                       ).reshape(-1).tolist() if i != -1]
        crds_.insert(1, inds_)
        return crds_

    def mask_(self, *, mask) -> np.ndarray:
        r"""Compact form `(1, nM)` of an external grid ``mask`` `(1, *Nd)`.

        Parity: ``/root/reference/mrphy/mobjs.py:594-606``; NB the
        reference's implementation has a latent bug (calls ``mask(...)``
        instead of indexing, ``mobjs.py:605``) — fixed here.
        """
        mask = np.asarray(mask)
        return mask[self.mask].reshape(1, -1)

    # -- physics methods --
    def applypulse(self, pulse: Pulse, *, doEmbed: bool = False,
                   doRelax: bool = True, doUpdate: bool = False,
                   doFuse: bool = True, mesh=None,
                   loc=None, loc_=None, b1Map=None, b1Map_=None, **kw):
        r"""Apply a pulse through the fast engine.

        Inputs:
            - ``pulse``: :class:`Pulse`.
            - ``loc`` ⊻ ``loc_``: `(N, *Nd ⊻ nM, xyz)`, "cm".
        Optionals:
            - ``doEmbed``: return grid ``M`` instead of compact ``M_``.
            - ``doRelax``: include T1/T2 relaxation.
            - ``doUpdate``: assign the result to ``self.M_``.
            - ``doFuse``: assemble B-effective *inside* the time loop
              (``sims.blochsim_rfgr``) so the O(nM·nT) field tensor never
              materializes — same physics, same gradients. ``False``
              composes ``pulse2beff`` → ``sims.blochsim`` like the
              reference (``/root/reference/mrphy/mobjs.py:394-450``).
            - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh`
              to run multi-chip via shard_map (fused engine only; ``nM``
              must divide by the mesh's spin extent).
            - ``df`` ⊻ ``df_`` (aliases ``Δf``/``Δf_``): `(N, *Nd ⊻ nM)`.
            - ``b1Map`` ⊻ ``b1Map_``: `(N, *Nd ⊻ nM, xy, (nCoils))`.

        Parity: ``/root/reference/mrphy/mobjs.py:394-450``.
        """
        df = kw.pop('df', kw.pop('Δf', None))
        df_ = kw.pop('df_', kw.pop('Δf_', None))
        assert not kw, f'unknown kwargs: {sorted(kw)}'
        assert (loc_ is None) != (loc is None), 'need loc xor loc_'
        loc_ = loc_ if loc is None else self.extract(loc)
        assert (df_ is None) or (df is None)
        df_ = df_ if df is None else self.extract(df)
        assert (b1Map_ is None) or (b1Map is None)
        b1Map_ = b1Map_ if b1Map is None else self.extract(b1Map)
        assert mesh is None or doFuse, 'mesh requires the fused engine'

        T1, T2 = (self.T1_, self.T2_) if doRelax else (None, None)
        if doFuse:
            pulse = pulse.to(dtype=self.dtype)
            M_ = sims.blochsim_rfgr(self.M_, pulse.rf, pulse.gr, loc_,
                                    T1=T1, T2=T2, df=df_, b1Map=b1Map_,
                                    gam=self.gam_, dt=pulse.dt, mesh=mesh)
        else:
            beff_ = self.pulse2beff(pulse, loc_=loc_, df_=df_,
                                    b1Map_=b1Map_, doEmbed=False)
            M_ = sims.blochsim(self.M_, beff_, T1=T1, T2=T2,
                               gam=self.gam_, dt=pulse.dt)
        if doUpdate:
            self.M_ = M_
        return self.embed(M_) if doEmbed else M_

    def freeprec(self, dur, *, doEmbed: bool = False, doRelax: bool = True,
                 doUpdate: bool = False, **kw):
        r"""Free precession for duration ``dur``
        (parity: ``mobjs.py:555-592``).

        Optionals: ``df`` ⊻ ``df_`` (aliases ``Δf``/``Δf_``).
        """
        df = kw.pop('df', kw.pop('Δf', None))
        df_ = kw.pop('df_', kw.pop('Δf_', None))
        assert not kw, f'unknown kwargs: {sorted(kw)}'
        assert (df_ is None) or (df is None)
        df_ = df_ if df is None else self.extract(df)

        T1, T2 = (self.T1_, self.T2_) if doRelax else (None, None)
        M_ = sims.freeprec(self.M_, dur, T1=T1, T2=T2, df=df_)
        if doUpdate:
            self.M_ = M_
        return self.embed(M_) if doEmbed else M_

    def acquire(self, gr, *, loc=None, loc_=None, sens=None, sens_=None,
                T2s=None, T2s_=None, dt=None, mesh=None,
                backend: str = 'xla', **kw):
        r"""k-space signal of this array's CURRENT magnetization over a
        readout gradient (no reference counterpart — the acquisition
        stage, :mod:`mrphy_tpu.ops.signal`).

        Chains naturally with the simulators::

            cube.applypulse(p, doUpdate=True)   # excite
            s = cube.acquire(gr_readout, sens=maps)

        Inputs:
            - ``gr``: `(N ⊻ 1, xyz, nT)`, "Gauss/cm", readout gradient;
              the Rx k-space is its γ·dt cumsum (:func:`mrphy_tpu.utils
              .g2k` with ``isTx=False``).
        Optionals:
            - ``loc``/``loc_``: spin positions (default: a SpinCube's
              own grid).
            - ``sens``/``sens_``: `(N ⊻ 1, *Nd ⊻ nM, xy, nC)` receive
              maps; ``df``/``df_`` off-resonance during the readout
              (aliases ``Δf``/``Δf_``; SpinCube defaults to its own
              ``Δf_``); ``T2s``/``T2s_`` effective T2* decay (NOT
              defaulted to ``T2_`` — intra-voxel dephasing usually
              dominates); ``dt`` dwell (default: the array default);
              ``mesh``/``backend`` as in :func:`mrphy_tpu.ops.signal
              .signal`.
        Outputs:
            - ``s``: `(N, nC, nT, 2)` signal, re/im pairs.
        """
        from mrphy_tpu import dt0 as _dt0
        from mrphy_tpu.ops import signal as _sig
        from mrphy_tpu.utils import g2k

        df = kw.pop('df', kw.pop('Δf', None))
        df_ = kw.pop('df_', kw.pop('Δf_', None))
        assert not kw, f'unknown kwargs: {sorted(kw)}'
        loc_ = loc_ if loc is None else self.extract(loc)
        assert loc_ is not None, 'need loc xor loc_'
        assert (df_ is None) or (df is None)
        df_ = df_ if df is None else self.extract(df)
        assert (sens_ is None) or (sens is None)
        sens_ = sens_ if sens is None else self.extract(sens)
        assert (T2s_ is None) or (T2s is None)
        T2s_ = T2s_ if T2s is None else self.extract(T2s)
        dt = _dt0 if dt is None else dt
        # one species per batch for the g->k conversion (per-spin gam
        # would need per-spin k-space; the signal model has one k)
        gam_b = jnp.asarray(self.gam_)[:, :1, None]       # (N, 1, 1)
        k = g2k(jnp.asarray(gr, self.dtype), False, dt, gam=gam_b)
        return _sig.signal(self.M_, loc_, k, sens=sens_, df=df_,
                           T2s=T2s_, dt=dt, mesh=mesh, backend=backend)

    def pulse2beff(self, pulse: Pulse, *, doEmbed: bool = False,
                   loc=None, loc_=None, b1Map=None, b1Map_=None, **kw):
        r"""B-effective of ``pulse`` under this array's γ
        (parity: ``mobjs.py:619-655``)."""
        df = kw.pop('df', kw.pop('Δf', None))
        df_ = kw.pop('df_', kw.pop('Δf_', None))
        assert not kw, f'unknown kwargs: {sorted(kw)}'
        assert (loc_ is None) != (loc is None), 'need loc xor loc_'
        loc_ = loc_ if loc is None else self.extract(loc)
        assert (df_ is None) or (df is None)
        df_ = df_ if df is None else self.extract(df)
        assert (b1Map_ is None) or (b1Map is None)
        b1Map_ = b1Map_ if b1Map is None else self.extract(b1Map)

        pulse = pulse.to(dtype=self.dtype)
        beff_ = pulse.beff(loc_, gam=self.gam_, df=df_, b1Map=b1Map_)
        return self.embed(beff_) if doEmbed else beff_

    # -- bookkeeping --
    def asdict(self, *, toNumpy: bool = True, doEmbed: bool = True) -> dict:
        r"""Detached dict (parity: ``mobjs.py:452-474``); keys use the
        reference's Unicode spellings (``γ``/``γ_``)."""
        keys = (('T1', 'T2', 'γ', 'M') if doEmbed else
                ('T1_', 'T2_', 'γ_', 'M_'))
        d = {k: _tonp(getattr(self, k), toNumpy) for k in keys}
        d['mask'] = self.mask.copy()
        d.update(shape=self.shape, device=self.device, dtype=self.dtype)
        return d

    def dim(self) -> int:
        return len(self.shape)

    def numel(self) -> int:
        return int(self.mask.size)

    def size(self) -> tuple:
        return self.shape

    def to(self, *, device=None, dtype=None) -> 'SpinArray':
        dtype = self.dtype if dtype is None else dtype
        if dtype == self.dtype and device is None:
            return self
        return SpinArray(self.shape, self.mask, T1_=self.T1_, T2_=self.T2_,
                         gam_=self.gam_, M_=self.M_, device=device,
                         dtype=dtype)

    def __repr__(self):
        return (f'SpinArray(shape={self.shape}, nM={self.nM}, '
                f'dtype={self.dtype})')


def _spinarray_flatten(sa: SpinArray):
    leaves = (sa.T1_, sa.T2_, sa.gam_, sa.M_)
    aux = (sa._shape, sa._mask.tobytes(), sa._dtype)
    return leaves, aux


def _spinarray_unflatten(aux, leaves):
    sa = object.__new__(SpinArray)
    shape, mask_bytes, dtype = aux
    mask = np.frombuffer(mask_bytes, dtype=bool).reshape((1,) + shape[1:])
    object.__setattr__(sa, '_shape', shape)
    object.__setattr__(sa, '_mask', mask)
    object.__setattr__(sa, '_midx', np.flatnonzero(mask[0].reshape(-1)))
    object.__setattr__(sa, '_dtype', dtype)
    for k, v in zip(('T1_', 'T2_', 'gam_', 'M_'), leaves):
        object.__setattr__(sa, k, v)
    return sa


jax.tree_util.register_pytree_node(SpinArray, _spinarray_flatten,
                                   _spinarray_unflatten)


# ==========================================================================
# SpinCube
# ==========================================================================

class SpinCube(SpinArray):
    r"""``SpinArray`` + geometry: FOV/offset-derived locations and an
    off-resonance map.

    Usage:
        ``SpinCube(shape, fov, *, mask, ofst, Δf(_)/df(_), T1(_), T2(_),``
        `` γ(_)/gam(_), M(_), dtype)``

    Properties: ``spinarray``, ``fov`` `(N, xyz)`, ``ofst`` `(N, xyz)`,
    ``df_``/``Δf_`` `(N, nM)`, derived read-only ``loc_`` `(N, nM, xyz)`
    recomputed whenever ``fov``/``ofst`` are set.

    Parity: ``/root/reference/mrphy/mobjs.py:688-965`` (including the
    composition-over-inheritance design: a ``spinarray`` attribute holds
    the base object; unknown attributes forward to it).
    """

    _readonly = ('spinarray', 'loc_')
    _compact = ('df_', 'loc_')
    __slots__ = ('_spinarray', 'fov', 'ofst', 'df_', 'loc_')

    def __init__(self, shape: tuple, fov, *, mask=None, ofst=None,
                 df=None, df_=None, T1=None, T1_=None, T2=None, T2_=None,
                 gam=None, gam_=None, M=None, M_=None,
                 device=None, dtype=jnp.float32, **kw):
        for uni, asc in (('Δf', 'df'), ('Δf_', 'df_'),
                         ('γ', 'gam'), ('γ_', 'gam_')):
            if uni in kw:
                v = kw.pop(uni)
                assert locals()[asc] is None
                if asc == 'df':
                    df = v
                elif asc == 'df_':
                    df_ = v
                elif asc == 'gam':
                    gam = v
                else:
                    gam_ = v
        assert not kw, f'unknown kwargs: {sorted(kw)}'

        sp = SpinArray(shape, mask, T1=T1, T1_=T1_, T2=T2, T2_=T2_,
                       gam=gam, gam_=gam_, M=M, M_=M_, dtype=dtype)
        object.__setattr__(self, '_spinarray', sp)

        if ofst is None:
            ofst = jnp.zeros((1, 3), sp.dtype)
        object.__setattr__(self, 'fov', _asarr(fov, sp.dtype))
        object.__setattr__(self, 'ofst', _asarr(ofst, sp.dtype))
        assert self.fov.ndim == 2 and self.ofst.ndim == 2
        self._update_loc_()

        assert (df is None) or (df_ is None)
        if df is None:
            self.df_ = 0.0 if df_ is None else df_
        else:
            self.df = df
        if device is not None:
            for k in ('fov', 'ofst', 'df_', 'loc_'):
                object.__setattr__(self, k,
                                   jax.device_put(getattr(self, k), device))

    # -- attribute forwarding & semantics (parity: mobjs.py:761-813) --
    @property
    def spinarray(self) -> SpinArray:
        return self._spinarray

    def __getattr__(self, k):
        k = _norm_name(k)
        if k in SpinCube._compact:  # unicode alias of a compact slot
            return object.__getattribute__(self, k)
        if k + '_' not in SpinCube._compact:
            sp = object.__getattribute__(self, '_spinarray')
            return getattr(sp, k)
        v_, sp = getattr(self, k + '_'), self._spinarray
        if sp.nM == int(np.prod(sp.shape[1:])):
            return v_.reshape(sp.shape + v_.shape[2:])
        return sp.embed(v_)

    def __setattr__(self, k_, v_):
        k_ = _norm_name(k_)
        if (k_ in SpinCube._readonly) or (k_ + '_' in SpinCube._readonly):
            raise AttributeError(f"'SpinCube' attribute '{k_}' is read-only")

        sp = self._spinarray
        if k_ in SpinArray._compact or k_ + '_' in SpinArray._compact or \
                k_ in ('T1', 'T2', 'gam', 'M'):
            setattr(sp, k_, v_)
            return

        v_ = _asarr(v_, sp.dtype)
        if k_ == 'df':  # grid assignment → extract
            k_, v_ = 'df_', sp.extract(jnp.broadcast_to(v_, sp.shape))
        if k_ == 'df_':
            v_ = jnp.broadcast_to(v_, (sp.shape[0], sp.nM))
        elif k_ in ('fov', 'ofst'):
            assert v_.ndim == 2, f'{k_} must be (N, xyz), got {v_.shape}'
        object.__setattr__(self, k_, v_)

        if k_ in ('fov', 'ofst'):
            self._update_loc_()

    def _update_loc_(self):
        r"""Recompute ``loc_`` from FOV and offset: normalized grid
        coordinates ``(arange(n) - ctrsub(n)) / n`` scaled by FOV
        (parity: ``mobjs.py:815-839``)."""
        sp = self._spinarray
        fov, ofst = self.fov, self.ofst
        crdn = [(np.arange(n) - ctrsub(n)) / n for n in sp.shape[1:]]
        locn = np.meshgrid(*crdn, indexing='ij')
        locn_ = np.stack([ln[sp.mask[0]] for ln in locn], axis=-1)  # (nM,xyz)
        loc_ = (fov[:, None, :] * jnp.asarray(locn_, sp.dtype)[None]
                + ofst[:, None, :])
        object.__setattr__(self, 'loc_', loc_)

    # -- physics methods (inject loc_, df_; parity: mobjs.py:841-944) --
    def applypulse(self, pulse: Pulse, *, doEmbed: bool = False,
                   doRelax: bool = True, doUpdate: bool = False,
                   doFuse: bool = True, mesh=None, b1Map=None,
                   b1Map_=None):
        sp = self._spinarray
        assert (b1Map_ is None) or (b1Map is None)
        b1Map_ = b1Map_ if b1Map is None else sp.extract(b1Map)
        return sp.applypulse(pulse, doEmbed=doEmbed, doRelax=doRelax,
                             doUpdate=doUpdate, doFuse=doFuse, mesh=mesh,
                             df_=self.df_, loc_=self.loc_, b1Map_=b1Map_)

    def freeprec(self, dur, *, doEmbed: bool = False, doRelax: bool = True,
                 doUpdate: bool = False):
        return self._spinarray.freeprec(dur, df_=self.df_, doEmbed=doEmbed,
                                        doRelax=doRelax, doUpdate=doUpdate)

    def acquire(self, gr, *, sens=None, sens_=None, T2s=None, T2s_=None,
                dt=None, mesh=None, backend: str = 'xla',
                nseg: int = 8, width: int = 5):
        r"""Readout of the cube's current magnetization — its own grid
        ``loc_`` and off-resonance ``Δf_`` are injected (see
        :meth:`SpinArray.acquire`).

        ``backend='nufft'`` routes through the gridding NUFFT
        (:mod:`mrphy_tpu.ops.nufft`) instead of the exact operator —
        O(G^d + nT·W^d) per readout instead of O(nM·nT). Requires a
        FULL mask (the cube IS the NUFFT grid); singleton axes drop
        out of the plan and ``ofst`` enters as the exact sample phase
        ``e^{−i2π k·ofst}``; ``Δf_``/``T2s`` go through ``nseg``-hat
        time segmentation (accuracy ∝ (2πΔf·T/nseg)²; the exact
        backend stays the oracle). ``width``: KB taps (accuracy knob).
        Under ``mesh=`` the samples shard (see :func:`mrphy_tpu.ops
        .nufft.nufft`).
        """
        sp = self._spinarray
        assert (sens_ is None) or (sens is None)
        sens_ = sens_ if sens is None else sp.extract(sens)
        assert (T2s_ is None) or (T2s is None)
        T2s_ = T2s_ if T2s is None else sp.extract(T2s)
        if backend != 'nufft':
            return sp.acquire(gr, loc_=self.loc_, df_=self.df_,
                              sens_=sens_, T2s_=T2s_, dt=dt, mesh=mesh,
                              backend=backend)
        from mrphy_tpu import dt0 as _dt0
        from mrphy_tpu.ops import nufft as _nf
        from mrphy_tpu.utils import g2k
        assert bool(np.all(sp.mask)), \
            "backend='nufft' needs a full-grid cube (mask all True)"
        dt = _dt0 if dt is None else dt
        N, grid_full = sp.shape[0], sp.shape[1:]
        dims = tuple(i for i, n in enumerate(grid_full) if n > 1)
        im_size = tuple(grid_full[i] for i in dims)
        fov_np = np.asarray(self.fov)
        assert np.ptp(fov_np, axis=0).max() == 0 or N == 1, \
            'per-batch FOVs need per-batch plans; split the batch'
        plan = _nf.nufft_plan(im_size, fov_np[0, list(dims)],
                              width=width, dtype=self.dtype)
        gam_b = jnp.asarray(self.gam_)[:, :1, None]
        k = jnp.broadcast_to(
            g2k(jnp.asarray(gr, self.dtype), False, dt, gam=gam_b),
            (N, 3, gr.shape[-1]))
        df_b = (None if self.df_ is None else
                jnp.broadcast_to(self.df_, (N, sp.nM)))
        t2_b = (None if T2s_ is None else jnp.broadcast_to(
            jnp.asarray(T2s_, self.dtype), (N, sp.nM)))
        sens_b = (None if sens_ is None else jnp.broadcast_to(
            jnp.asarray(sens_, self.dtype),
            (N,) + jnp.asarray(sens_).shape[1:]))
        ofst = jnp.asarray(self.ofst)                   # (N, 3)
        outs = []
        for n in range(N):                              # static batch
            kd = k[n][list(dims), :]
            kw = {}
            if df_b is not None or t2_b is not None:
                kw = dict(
                    df=None if df_b is None else
                    df_b[n].reshape(im_size),
                    T2s=None if t2_b is None else
                    t2_b[n].reshape(im_size),
                    dt=dt, nseg=nseg)
            mxy = sp.M_[n, :, :2].reshape(im_size + (2,))
            nC = 1 if sens_b is None else sens_b.shape[-1]
            coils = []
            for c in range(nC):                         # static coils
                if sens_b is None:
                    img = mxy
                else:
                    sr = sens_b[n, :, 0, c].reshape(im_size)
                    si = sens_b[n, :, 1, c].reshape(im_size)
                    img = jnp.stack(
                        [sr * mxy[..., 0] - si * mxy[..., 1],
                         sr * mxy[..., 1] + si * mxy[..., 0]], -1)
                coils.append(_nf.nufft(plan, img, kd, mesh=mesh, **kw))
            s = jnp.stack(coils)                        # (nC, nT, 2)
            # exact offset phase over ALL axes (incl. dropped ones)
            ph = -2 * pi * jnp.einsum('xt,x->t', k[n], ofst[n],
                                      precision='highest')
            c_, s_ = jnp.cos(ph), jnp.sin(ph)
            s = jnp.stack([s[..., 0] * c_ - s[..., 1] * s_,
                           s[..., 0] * s_ + s[..., 1] * c_], -1)
            outs.append(s)
        return jnp.stack(outs)                          # (N, nC, nT, 2)

    def pulse2beff(self, pulse: Pulse, *, doEmbed: bool = False,
                   b1Map=None, b1Map_=None):
        return self._spinarray.pulse2beff(pulse, loc_=self.loc_,
                                          doEmbed=doEmbed, df_=self.df_,
                                          b1Map=b1Map, b1Map_=b1Map_)

    def asdict(self, *, toNumpy: bool = True, doEmbed: bool = True) -> dict:
        keys = ('loc', 'Δf') if doEmbed else ('loc_', 'Δf_')
        d = {k: _tonp(getattr(self, k), toNumpy) for k in keys}
        d.update(fov=self.fov, ofst=self.ofst)
        d.update(self._spinarray.asdict(toNumpy=toNumpy, doEmbed=doEmbed))
        return d

    def to(self, *, device=None, dtype=None) -> 'SpinCube':
        dtype = self.dtype if dtype is None else dtype
        if dtype == self.dtype and device is None:
            return self
        return SpinCube(self.shape, self.fov, mask=self.mask, ofst=self.ofst,
                        df_=self.df_, T1_=self.T1_, T2_=self.T2_,
                        gam_=self.gam_, M_=self.M_, device=device,
                        dtype=dtype)

    def __repr__(self):
        return (f'SpinCube(shape={self.shape}, nM={self.nM}, '
                f'dtype={self.dtype})')


def _spincube_flatten(sc: SpinCube):
    leaves = (sc._spinarray, sc.fov, sc.ofst, sc.df_, sc.loc_)
    return leaves, None


def _spincube_unflatten(aux, leaves):
    sc = object.__new__(SpinCube)
    for k, v in zip(('_spinarray', 'fov', 'ofst', 'df_', 'loc_'), leaves):
        object.__setattr__(sc, k, v)
    return sc


jax.tree_util.register_pytree_node(SpinCube, _spincube_flatten,
                                   _spincube_unflatten)


class SpinBolus(SpinArray):
    r"""Flowing spin ensemble: a :class:`SpinArray` whose spins move with
    per-spin velocities during the pulse.

    The reference left this as an empty stub
    (``/root/reference/mrphy/mobjs.py:968-973``); here it is implemented
    on the fused waveform engine: locations evolve as ``loc + vel·t``
    *inside* the Bloch scan (no per-step location tensors materialize),
    capturing flow/bolus effects like gradient-induced phase accrual of
    moving spins.

    Usage:
        ``SpinBolus(shape, mask, *, vel(_), T1(_), T2(_), γ(_), M(_),``
        `` dtype)``

    Extra properties:
        - ``vel_``: `(N, nM, xyz)`, "cm/s", per-spin velocity (grid form
          ``vel`` embeds/extracts like every other attribute).
    """

    _compact = SpinArray._compact + ('vel_',)
    __slots__ = ('vel_',)

    def __init__(self, shape: tuple, mask=None, *, vel=None, vel_=None,
                 **kw):
        super().__init__(shape, mask, **kw)
        assert (vel is None) or (vel_ is None)
        if vel is None:
            self.vel_ = (jnp.zeros(3, self.dtype) if vel_ is None
                         else vel_)
        else:
            self.vel = vel

    def applypulse(self, pulse: Pulse, *, doEmbed: bool = False,
                   doRelax: bool = True, doUpdate: bool = False,
                   doFuse: bool = True, mesh=None,
                   loc=None, loc_=None, b1Map=None, b1Map_=None, **kw):
        r"""Apply a pulse to the flowing ensemble (``loc``/``loc_`` are
        the spins' positions at t=0). Same flags and ⊻-kwargs as
        :meth:`SpinArray.applypulse`, except flow only runs on the fused
        engine (``doFuse=False`` is rejected — a composed path would
        need the O(nM·nT) moving-field tensor)."""
        assert doFuse, 'SpinBolus flow requires the fused engine'
        df = kw.pop('df', kw.pop('Δf', None))
        df_ = kw.pop('df_', kw.pop('Δf_', None))
        assert not kw, f'unknown kwargs: {sorted(kw)}'
        assert (loc_ is None) != (loc is None), 'need loc xor loc_'
        loc_ = loc_ if loc is None else self.extract(loc)
        assert (df_ is None) or (df is None)
        df_ = df_ if df is None else self.extract(df)
        assert (b1Map_ is None) or (b1Map is None)
        b1Map_ = b1Map_ if b1Map is None else self.extract(b1Map)

        pulse = pulse.to(dtype=self.dtype)
        T1, T2 = (self.T1_, self.T2_) if doRelax else (None, None)
        M_ = sims.blochsim_rfgr(self.M_, pulse.rf, pulse.gr, loc_,
                                T1=T1, T2=T2, df=df_, b1Map=b1Map_,
                                gam=self.gam_, dt=pulse.dt,
                                vel=self.vel_, mesh=mesh)
        if doUpdate:
            self.M_ = M_
        return self.embed(M_) if doEmbed else M_

    def asdict(self, *, toNumpy: bool = True, doEmbed: bool = True) -> dict:
        d = super().asdict(toNumpy=toNumpy, doEmbed=doEmbed)
        k = 'vel' if doEmbed else 'vel_'
        d[k] = _tonp(getattr(self, k), toNumpy)
        return d

    def to(self, *, device=None, dtype=None) -> 'SpinBolus':
        dtype = self.dtype if dtype is None else dtype
        if dtype == self.dtype and device is None:
            return self
        return SpinBolus(self.shape, self.mask, vel_=self.vel_,
                         T1_=self.T1_, T2_=self.T2_, gam_=self.gam_,
                         M_=self.M_, device=device, dtype=dtype)

    def __repr__(self):
        return (f'SpinBolus(shape={self.shape}, nM={self.nM}, '
                f'dtype={self.dtype})')


def _spinbolus_flatten(sb: SpinBolus):
    leaves = (sb.T1_, sb.T2_, sb.gam_, sb.M_, sb.vel_)
    aux = (sb._shape, sb._mask.tobytes(), sb._dtype)
    return leaves, aux


def _spinbolus_unflatten(aux, leaves):
    sb = object.__new__(SpinBolus)
    shape, mask_bytes, dtype = aux
    mask = np.frombuffer(mask_bytes, dtype=bool).reshape((1,) + shape[1:])
    object.__setattr__(sb, '_shape', shape)
    object.__setattr__(sb, '_mask', mask)
    object.__setattr__(sb, '_midx', np.flatnonzero(mask[0].reshape(-1)))
    object.__setattr__(sb, '_dtype', dtype)
    for k, v in zip(('T1_', 'T2_', 'gam_', 'M_', 'vel_'), leaves):
        object.__setattr__(sb, k, v)
    return sb


jax.tree_util.register_pytree_node(SpinBolus, _spinbolus_flatten,
                                   _spinbolus_unflatten)


# ==========================================================================
# Examples
# ==========================================================================

class Examples:
    r"""Canonical demo objects (parity: ``mobjs.py:976-1038``)."""

    @staticmethod
    def pulse(dtype=jnp.float32) -> Pulse:
        r"""512-step cos/sin RF + atan gradient demo pulse."""
        N, nT = 1, 512
        t = jnp.arange(nT, dtype=dtype).reshape((N, 1, nT))
        rf = 10 * jnp.concatenate([jnp.cos(t / nT * 2 * pi),
                                   jnp.sin(t / nT * 2 * pi)], axis=1)
        gr = jnp.concatenate([jnp.ones((N, 1, nT), dtype),
                              jnp.ones((N, 1, nT), dtype),
                              10 * jnp.arctan(t - round(nT / 2)) / pi],
                             axis=1)
        return Pulse(rf=rf, gr=gr, dt=dt0, dtype=dtype)

    @staticmethod
    def _cross_mask(Nd=(3, 3, 3)) -> np.ndarray:
        mask = np.zeros((1,) + Nd, dtype=bool)
        mask[0, :, 1, :] = True
        mask[0, 1, :, :] = True
        return mask

    @staticmethod
    def spinarray(dtype=jnp.float32) -> SpinArray:
        r"""3×3×3 cross-masked spin array."""
        shape = (1, 3, 3, 3)
        return SpinArray(shape, mask=Examples._cross_mask(),
                         T1_=jnp.asarray([[1.]], dtype),
                         T2_=jnp.asarray([[4e-2]], dtype),
                         gam_=gamH, dtype=dtype)

    @staticmethod
    def spinbolus(dtype=jnp.float32) -> 'SpinBolus':
        r"""3x3x3 cross-masked bolus flowing at 10 cm/s along z."""
        shape = (1, 3, 3, 3)
        return SpinBolus(shape, mask=Examples._cross_mask(),
                         vel=jnp.asarray([0., 0., 10.], dtype),
                         T1_=jnp.asarray([[1.]], dtype),
                         T2_=jnp.asarray([[4e-2]], dtype),
                         gam_=gamH, dtype=dtype)

    @staticmethod
    def spincube(dtype=jnp.float32) -> SpinCube:
        r"""3×3×3 cross-masked cube, fov=[3,3,3], ofst=[0,0,1], Δf ∝ -x-y."""
        shape = (1, 3, 3, 3)
        fov = jnp.asarray([[3., 3., 3.]], dtype)
        ofst = jnp.asarray([[0., 0., 1.]], dtype)
        cube = SpinCube(shape, fov, mask=Examples._cross_mask(), ofst=ofst,
                        T1_=jnp.asarray([[1.]], dtype),
                        T2_=jnp.asarray([[4e-2]], dtype),
                        gam_=gamH, dtype=dtype)
        cube.df_ = jnp.sum(-cube.loc_[..., 0:2], axis=-1) * cube.gam_
        return cube
