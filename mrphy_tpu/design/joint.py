r"""Joint RF + gradient waveform design via auto-differentiation.

This is the workload the reference framework exists to serve ("Joint
Design of RF and Gradient Waveforms via Auto-Differentiation for 3D
Tailored Excitation in MRI", cited at ``/root/reference/README.md:9-11``);
the reference ships the differentiable simulator but leaves the
optimization loop to user code. Here the loop is a first-class, fully
jitted component:

- **Constrained → unconstrained**: RF is parametrized by
  ``(tρ, θ)`` (:func:`mrphy_tpu.utils.rf2trho_theta`) and gradients by
  slew-rate ``ts`` (:func:`mrphy_tpu.utils.s2ts`), so hardware limits
  (``rfmax``, ``smax``) hold by construction and optimization is
  unconstrained — the reference's reparametrization utilities
  (``/root/reference/mrphy/utils.py:114-330``) put to work.
- **One jitted step**: params → waveforms → B-effective → Bloch scan
  (custom-VJP engine) → loss → optax update; everything fuses under XLA
  and differentiates through thousands of time steps.
- **Multi-scale**: design at a coarse dwell time, ``interpT`` to a finer
  one, continue — the README's multi-scale strategy
  (``/root/reference/README.md:27-36``) with on-device resampling.
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mrphy_tpu import gamH, dt0, gmax0, rfmax0, smax0
from mrphy_tpu.ops import sims
from mrphy_tpu.utils import (rf2trho_theta, trho_theta2rf, s2ts, ts2s,
                             s2g, g2s, rfclamp, sclamp)

__all__ = ['DesignConfig', 'design_pulse', 'design_multiscale',
           'design_step', 'init_params', 'params2pulse',
           'make_optimizer']


@dataclasses.dataclass(frozen=True)
class DesignConfig:
    r"""Hyper-parameters of the joint design loop.

    ``rfmax`` is a scalar shared RF peak limit, or a ``(nCoils,)``
    TUPLE of per-coil limits for pTx arrays with heterogeneous channel
    constraints (tuple, not array, so the config stays hashable as a
    jit static key); it feeds the ``(N ⊻ 1, (nCoils))`` rfmax contract
    of the reparametrizations (ref ``/root/reference/mrphy/utils.py:
    196-214``), so each coil's |rf| bound holds by construction.

    ``loss`` selects the fidelity term: ``'sse'`` (default — squared
    error on the magnetization VECTOR, the reference recipe) or
    ``'mls'`` — magnitude least squares, ``(|Mxy| − |Mxy^tgt|)² +
    (Mz − Mz^tgt)²``: the excitation PHASE is left free, the standard
    relaxation for pTx shimming/excitation where only |Mxy| is imaged
    (phase-free targets are much easier to realize; smooth
    ``sqrt(·+ε)`` keeps gradients finite at zeros).

    ``optimizer`` selects the update rule: ``'adam'`` (default),
    ``'adamw'``, ``'sgd'``, ``'momentum'`` (Nesterov 0.9), or
    ``'lbfgs'`` — optax L-BFGS with zoom linesearch (``lr`` ignored;
    the linesearch picks the step). Each linesearch trial re-evaluates
    the loss THROUGH the Bloch simulation, so an L-BFGS iteration costs
    a few forward sims plus one gradient — typically repaid by far
    fewer iterations on smooth (small-``lam_*``) problems.
    """
    niter: int = 100
    lr: float = 1e-1
    optimizer: str = 'adam'
    loss: str = 'sse'         # 'sse' ⊻ 'mls' (magnitude least squares)
    rfmax: object = rfmax0    # Gauss; float ⊻ (nCoils,) tuple
    smax: float = smax0       # Gauss/cm/Sec
    gmax: float = gmax0       # Gauss/cm (soft, via lam_gmax)
    dt: float = dt0           # Sec
    lam_pow: float = 0.0      # RF power penalty weight
    lam_gmax: float = 0.0     # peak-gradient excess penalty weight
    lam_sar: float = 0.0      # local-SAR (VOP) excess penalty weight
    sar_limit: float = 0.0    # per-VOP time-averaged SAR limit
    lam_pns: float = 0.0      # PNS excess penalty weight
    pns_limit: float = 80.0   # %, normal operating mode
    pns_smin: tuple = (6000.0, 6000.0, 6000.0)  # Gauss/cm/s rheobase
    pns_chronaxie: float = 334e-6               # Sec
    gam: float = gamH


def make_optimizer(cfg: DesignConfig) -> optax.GradientTransformation:
    r"""The optax transform named by ``cfg.optimizer`` (see
    :class:`DesignConfig`)."""
    name = cfg.optimizer
    if name == 'adam':
        return optax.adam(cfg.lr)
    if name == 'adamw':
        return optax.adamw(cfg.lr)
    if name == 'sgd':
        return optax.sgd(cfg.lr)
    if name == 'momentum':
        return optax.sgd(cfg.lr, momentum=0.9, nesterov=True)
    if name == 'lbfgs':
        return optax.lbfgs()
    raise ValueError(
        f"cfg.optimizer={name!r}; expected one of "
        "'adam', 'adamw', 'sgd', 'momentum', 'lbfgs'")


def _rfmax_arr(cfg: DesignConfig):
    r"""``cfg.rfmax`` → the `()` ⊻ `(1, nCoils)` array the rf utils
    expect (tuple = per-coil limits, broadcast over the batch)."""
    if isinstance(cfg.rfmax, (tuple, list)):
        return jnp.asarray(cfg.rfmax)[None, :]
    return jnp.asarray(cfg.rfmax)


def init_params(rf, gr, cfg: DesignConfig) -> dict:
    r"""Map initial (clamped) waveforms to unbounded design variables."""
    rfmax = _rfmax_arr(cfg)
    rf = rfclamp(rf, rfmax)
    s = sclamp(g2s(gr, cfg.dt), cfg.smax * (1 - 1e-6))
    trho, theta = rf2trho_theta(rf, rfmax)
    return {'trho': trho, 'theta': theta, 'ts': s2ts(s, jnp.asarray(cfg.smax))}


def params2pulse(params: dict,
                 cfg: DesignConfig) -> Tuple[jax.Array, jax.Array]:
    r"""Unbounded design variables → (rf, gr) respecting rfmax/smax."""
    rf = trho_theta2rf(params['trho'], params['theta'], _rfmax_arr(cfg))
    s = ts2s(params['ts'], jnp.asarray(cfg.smax))
    gr = s2g(s, cfg.dt)
    return rf, gr


def _loss_fn(params, cfg, M0_, loc_, Mtgt_, T1_, T2_, gam_, df_, b1Map_,
             w_, girf_, sarQr_, sarQi_, doRelax: bool, mesh=None):
    rf, gr = params2pulse(params, cfg)
    if girf_ is not None:
        # design THROUGH the gradient-chain response: simulate what
        # the hardware plays, so the optimizer pre-compensates it
        from mrphy_tpu.utils.girf import apply_girf
        gr = apply_girf(gr, girf_)
    T1, T2 = (T1_, T2_) if doRelax else (None, None)
    # fused engine: B-effective is assembled inside the scan, so the
    # design loop never materializes the O(nM·nT) field tensor
    M_ = sims.blochsim_rfgr(M0_, rf, gr, loc_, T1=T1, T2=T2, df=df_,
                            b1Map=b1Map_, gam=gam_, dt=cfg.dt, mesh=mesh)
    if cfg.loss == 'mls':
        # magnitude least squares: phase-free |Mxy| target (+ Mz term);
        # smooth sqrt keeps the gradient finite where |Mxy| -> 0
        eps = 1e-12
        mag = jnp.sqrt(M_[..., 0] ** 2 + M_[..., 1] ** 2 + eps)
        mtg = jnp.sqrt(Mtgt_[..., 0] ** 2 + Mtgt_[..., 1] ** 2 + eps)
        se = (mag - mtg) ** 2 + (M_[..., 2] - Mtgt_[..., 2]) ** 2
    else:
        assert cfg.loss == 'sse', cfg.loss
        se = jnp.sum((M_ - Mtgt_) ** 2, axis=-1)
    if w_ is None:
        err = jnp.mean(se)
    else:  # per-spin weights, e.g. don't-care transition bands at 0.
        # Broadcast BEFORE normalizing: with w_ (1, nM) and N > 1, a
        # bare sum(w_) would undercount by N and rescale the loss.
        wb = jnp.broadcast_to(w_, se.shape)
        err = jnp.sum(wb * se) / jnp.sum(wb)
    pen = cfg.lam_pow * jnp.mean(jnp.sum(rf ** 2, axis=1))
    if cfg.lam_gmax:
        # soft peak-gradient constraint: the slew (ts) parametrization
        # bounds |dg/dt| by construction but leaves |g| free; penalize
        # per-axis excess over gmax (hinge², zero inside the limit) —
        # the reference's Pulse carries gmax (ref mobjs.py:57-64) but
        # its design recipe leaves amplitude to user code
        excess = jax.nn.relu(jnp.abs(gr) - cfg.gmax)
        pen = pen + cfg.lam_gmax * jnp.mean(jnp.sum(excess ** 2, axis=1))
    if sarQr_ is not None:
        # soft local-SAR constraint over virtual observation points:
        # hinge² on each VOP's time-averaged quadratic form over the
        # per-coil complex drive (utils.sar) — the realistic pTx limit
        # beyond per-coil |rf| peaks
        from mrphy_tpu.utils.sar import sar_vops
        sar = sar_vops(rf, sarQr_, sarQi_)          # (N, nVOP)
        sar_ex = jax.nn.relu(sar - cfg.sar_limit)
        pen = pen + cfg.lam_sar * jnp.mean(jnp.sum(sar_ex ** 2, axis=-1))
    if cfg.lam_pns:
        # soft peripheral-nerve-stimulation constraint: hinge² on the
        # chronaxie-filtered combined slew over the limit (utils.pns).
        # The ts parametrization caps instantaneous |slew| per axis,
        # but PNS binds the FILTERED √Σ-axes response — a different,
        # often tighter, constraint on fast trapezoid trains.
        from mrphy_tpu.utils.pns import pns_predict
        pns = pns_predict(gr, cfg.dt, smin=cfg.pns_smin,
                          chronaxie=cfg.pns_chronaxie)  # (N, nT), %
        pns_ex = jax.nn.relu(pns - cfg.pns_limit)
        pen = pen + cfg.lam_pns * jnp.mean(jnp.sum(pns_ex ** 2, -1))
    return err + pen, M_


def design_step(params, opt_state, optimizer, cfg, *args, **kw):
    r"""One jitted optimization step: value+grad through the Bloch scan,
    then an optax update. Returns ``(params, opt_state, loss, M_)``."""
    (loss, M_), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        params, cfg, *args, **kw)
    if cfg.optimizer == 'lbfgs':
        # the zoom linesearch probes trial steps, each re-running the
        # full differentiable simulation via value_fn (scalar loss only)
        updates, opt_state = optimizer.update(
            grads, opt_state, params, value=loss, grad=grads,
            value_fn=lambda p: _loss_fn(p, cfg, *args, **kw)[0])
    else:
        updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, M_


@functools.partial(jax.jit, static_argnames=('cfg',))
def _init_params_jit(rf, gr, cfg):
    return init_params(rf, gr, cfg)


@functools.partial(jax.jit, static_argnames=('cfg',))
def _params2pulse_jit(params, cfg):
    return params2pulse(params, cfg)


@functools.partial(jax.jit, static_argnames=('cfg', 'doRelax', 'mesh'))
def _design_scan(params, opt_state, cfg, M0_, loc_, Mtgt_, T1_,
                 T2_, gam_, df_, b1Map_, w_, girf_, sarQr_, sarQi_,
                 doRelax, mesh=None):
    r"""The whole optimization as ONE jitted ``lax.scan``. Module-level
    (not a per-call closure) so repeated ``design_pulse`` calls — e.g.
    multi-scale stages — reuse the compiled executable; ``cfg`` is a
    frozen (hashable) dataclass and serves as the static key (``mesh``,
    also hashable, keys the multi-chip variant)."""
    optimizer = make_optimizer(cfg)

    def body(carry, _):
        params, opt_state = carry
        params, opt_state, loss, _ = design_step(
            params, opt_state, optimizer, cfg, M0_, loc_, Mtgt_, T1_,
            T2_, gam_, df_, b1Map_, w_, girf_, sarQr_, sarQi_, doRelax,
            mesh=mesh)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), None, length=cfg.niter)
    return params, opt_state, losses


@functools.partial(jax.jit, static_argnames=('cfg', 'doRelax', 'mesh'))
def _design_step_jit(params, opt_state, cfg, M0_, loc_, Mtgt_, T1_, T2_,
                     gam_, df_, b1Map_, w_, girf_, sarQr_, sarQi_,
                     doRelax, mesh=None):
    optimizer = make_optimizer(cfg)
    return design_step(params, opt_state, optimizer, cfg, M0_, loc_,
                       Mtgt_, T1_, T2_, gam_, df_, b1Map_, w_, girf_,
                       sarQr_, sarQi_, doRelax, mesh=mesh)


def design_pulse(spinarray, pulse, Mtgt_, *, loc_=None, df_=None,
                 b1Map_=None, w_=None, girf_=None, sarQ_=None,
                 cfg: Optional[DesignConfig] = None,
                 doRelax: bool = True, verbose: bool = False,
                 mesh=None, checkpoint=None):
    r"""Jointly design RF + gradients steering ``spinarray`` to ``Mtgt_``.

    Inputs:
        - ``spinarray``: :class:`~mrphy_tpu.models.mobjs.SpinArray` or
          :class:`~mrphy_tpu.models.mobjs.SpinCube` (supplies ``M_``,
          ``T1_``, ``T2_``, ``gam_``; a cube also supplies ``loc_``/``df_``).
        - ``pulse``: initial :class:`~mrphy_tpu.models.mobjs.Pulse`.
        - ``Mtgt_``: `(N, nM, xyz)`, target magnetization (compact).
    Optionals:
        - ``w_``: `(N ⊻ 1, nM)`, per-spin loss weights (normalized by
          their sum). Use 0 for don't-care regions — e.g. the physically
          unavoidable transition band of a slab profile — and larger
          values to emphasize under-represented ensemble members in
          robust (B0/B1-ensemble) designs.
        - ``verbose``: print per-iteration losses. This switches from the
          single-dispatch path (the whole optimization is ONE jitted
          ``lax.scan`` over iterations — no host round-trip per step) to a
          per-iteration host loop.
        - ``girf_``: `(3, nH)` ⊻ `(nH,)` gradient-system impulse
          response (:mod:`mrphy_tpu.utils.girf`). The loss simulates
          ``apply_girf(gr, girf_)`` — what the hardware plays — so the
          optimizer PRE-COMPENSATES the gradient chain; the returned
          Pulse holds the waveform to command.
        - ``sarQ_``: local-SAR virtual observation points — ``Qr`` of
          shape `(nVOP, nCoils, nCoils)` ⊻ a ``(Qr, Qi)`` pair (see
          :func:`mrphy_tpu.utils.sar.sar_vops`, and
          :func:`~mrphy_tpu.utils.sar.vop_compress` to build them from
          field-simulation Q-matrices). With ``cfg.lam_sar`` set, each
          VOP's time-averaged SAR is hinge²-penalized above
          ``cfg.sar_limit`` — the realistic pTx constraint beyond the
          per-coil |rf| limits that ``rfmax`` enforces by construction.
        - ``checkpoint``: a
          :class:`~mrphy_tpu.design.checkpoint.DesignCheckpoint` to
          persist/resume the optimization: the scan runs in
          ``checkpoint.every``-iteration segments, ``(params,
          opt_state, losses)`` are saved (orbax, atomic) after each,
          and a rerun pointing at the same directory resumes from the
          newest segment — bit-identical to an uninterrupted run.
          Ignored under ``verbose`` (which is already per-iteration).
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` (see
          :func:`mrphy_tpu.parallel.make_mesh`) to run the design loop
          multi-chip: spins shard across devices (``nM`` must divide by
          the mesh's spin extent), the simulation runs shard-local (the
          Pallas fast path included, via shard_map), and the waveform
          gradients psum over the spin axis each iteration — the only
          collective in the loop.
    Outputs:
        - ``(pulse, losses)``: designed Pulse and per-iteration loss array.
    """
    from mrphy_tpu.models.mobjs import Pulse

    if cfg is None:
        cfg = DesignConfig(dt=float(jnp.asarray(pulse.dt).reshape(-1)[0]))
    if loc_ is None:
        loc_ = spinarray.loc_
    if df_ is None:
        df_ = getattr(spinarray, 'df_', None)

    # jit the whole constrained->unconstrained preamble: run eagerly it
    # is dozens of tiny dispatches, which on a remote-attached device
    # cost ~1 s each (70+ s measured); module-level jits so repeated
    # calls reuse the compiled executables
    params = _init_params_jit(pulse.rf, pulse.gr, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    if sarQ_ is None:
        sarQr_ = sarQi_ = None
    elif isinstance(sarQ_, (tuple, list)):
        sarQr_, sarQi_ = (jnp.asarray(sarQ_[0]),
                          None if sarQ_[1] is None else
                          jnp.asarray(sarQ_[1]))
    else:
        sarQr_, sarQi_ = jnp.asarray(sarQ_), None

    step_args = (spinarray.M_, loc_, Mtgt_, spinarray.T1_, spinarray.T2_,
                 spinarray.gam_, df_, b1Map_,
                 None if w_ is None else jnp.asarray(w_),
                 None if girf_ is None else jnp.asarray(girf_),
                 sarQr_, sarQi_)

    if mesh is not None:
        # pre-place spin-indexed arrays on the mesh (the shard_map inside
        # the loss re-asserts these shardings; placing them up front
        # avoids a resharding transfer on the first iteration), using the
        # same by-shape rule as the engine (parallel.mesh.spin_pspec)
        from jax.sharding import NamedSharding
        from mrphy_tpu.parallel.mesh import SPIN_AXIS, spin_pspec
        N, nM = step_args[0].shape[0], step_args[0].shape[1]
        sp = mesh.shape[SPIN_AXIS]
        # check divisibility BEFORE device_put: otherwise an indivisible
        # nM surfaces as an opaque sharding error instead of this hint
        assert nM % sp == 0, (
            f'nM={nM} not divisible by the mesh spin extent {sp}; pad '
            f'the compact attrs first (see mrphy_tpu.parallel.pad_spins)')

        def put(x):
            if (x is not None and hasattr(x, 'ndim') and x.ndim >= 2
                    and x.shape[1] == nM):
                return jax.device_put(
                    x, NamedSharding(mesh, spin_pspec(x, N, nM)))
            return x
        # the trailing entries — girf_ (3, nH) and the SAR VOP matrices
        # (nVOP, nCoils, nCoils) — are never spin-indexed; keep them out
        # of the by-shape placement rule (only M0_..w_ may carry nM)
        step_args = tuple(put(x) for x in step_args[:9]) \
            + step_args[9:]

    if verbose:
        losses = []
        for it in range(cfg.niter):
            params, opt_state, loss, _ = _design_step_jit(
                params, opt_state, cfg, *step_args, doRelax=doRelax,
                mesh=mesh)
            losses.append(loss)
            if it % max(1, cfg.niter // 10) == 0:
                print(f'iter {it:4d}  loss {float(loss):.6e}')
        losses = jnp.stack(losses)
    elif checkpoint is not None:
        from mrphy_tpu.design.checkpoint import run_checkpointed
        params, losses = run_checkpointed(
            _design_scan, params, opt_state, cfg, step_args, doRelax,
            mesh, checkpoint)
    else:
        params, _, losses = _design_scan(params, opt_state, cfg,
                                         *step_args, doRelax=doRelax,
                                         mesh=mesh)

    rf, gr = _params2pulse_jit(params, cfg)
    out = Pulse(rf, gr, dt=cfg.dt, rfmax=_rfmax_arr(cfg), smax=cfg.smax,
                gmax=cfg.gmax,
                desc=f'{pulse.desc} + designed({cfg.niter} iters)',
                dtype=pulse.dtype)
    return out, losses


def design_multiscale(spinarray, pulse, Mtgt_, *, dts, niters,
                      cfg: Optional[DesignConfig] = None, **kw):
    r"""Coarse-to-fine joint design: the README's multi-scale strategy
    (``/root/reference/README.md:27-36``) as one call.

    Designs at dwell time ``dts[0]`` for ``niters[0]`` iterations,
    resamples the result to ``dts[1]`` via on-device
    :meth:`~mrphy_tpu.models.mobjs.Pulse.interpT`, continues, and so on.
    Coarse stages cost ``dt_fine/dt_coarse``-times fewer simulation steps
    per iteration, so most of the optimization happens cheaply before the
    final-resolution polish. Stages reuse compiled executables across
    calls (the design scan is keyed on the stage's ``DesignConfig``).

    Inputs:
        - ``spinarray``/``pulse``/``Mtgt_``: as :func:`design_pulse`.
        - ``dts``: sequence of dwell times, "Sec", coarse → fine.
        - ``niters``: iterations per stage (same length as ``dts``).
    Optionals:
        - ``cfg``: base :class:`DesignConfig`; each stage overrides its
          ``dt``/``niter``. Remaining kwargs forward to
          :func:`design_pulse` (``loc_``, ``df_``, ``b1Map_``, ``w_``,
          ``mesh``, ``doRelax``, ``verbose``).
    Outputs:
        - ``(pulse, losses)``: final fine-dt Pulse and the per-stage list
          of loss arrays.
    """
    assert len(dts) == len(niters) and len(dts) >= 1
    cfg = DesignConfig() if cfg is None else cfg
    p, losses = pulse, []
    for dt_s, ni in zip(dts, niters):
        dt_s = float(dt_s)
        dt_all = jnp.asarray(p.dt).reshape(-1)
        # the resample decision is global; a per-batch dt array with
        # differing values would be silently mishandled
        assert float(jnp.ptp(dt_all)) == 0.0, (
            'design_multiscale requires a scalar/uniform pulse dt, got '
            f'{dt_all}')
        if abs(float(dt_all[0]) - dt_s) > 1e-12:
            p = p.interpT(jnp.asarray(dt_s))
        cfg_s = dataclasses.replace(cfg, dt=dt_s, niter=int(ni))
        p, loss = design_pulse(spinarray, p, Mtgt_, cfg=cfg_s, **kw)
        losses.append(loss)
    return p, losses
