r"""k-space signal acquisition (encoding) and its adjoint — on the MXU.

Closed-form receiver model for a readout: starting from the transverse
magnetization a simulator produced, each spin accrues phase under the
readout gradients (``k``-space trajectory), its own off-resonance, and
T2* decay, and the coil signal is the sensitivity-weighted sum

.. math::
   s_c(t) = \sum_m \mathrm{sens}_{c,m}\, m_{xy,m}\,
            e^{-t_t/T2^*_m}\, e^{-i 2\pi (k(t)\cdot x_m + \Delta f_m t_t)}

This is exactly what :func:`mrphy_tpu.ops.slowsims.blochsim` computes
step-by-step when driven with the readout gradient (no RF, no T1) and
summed over spins — asserted in ``tests/test_signal.py`` — but in a
form XLA maps onto the MXU: the per-spin phase is ONE `(nM, 4) @
(4, nT)` matmul (``[loc | df] @ [-2πk ; -2πt]``), and the spin
reduction is a pair of `(nC·2, nM) @ (nM, nT)` matmuls on the
cos/sin factor matrices. Spins are processed in VMEM-sized chunks via
``lax.scan`` (the `(chunk, nT)` factor matrices never materialize at
`(nM, nT)`), so memory is O(chunk·nT) for any number of spins.

Sign conventions follow the simulator (not a convention choice — the
framework's Bloch rotation is clockwise for positive fields, so
``m_{xy}(t) = m_{xy}(0)·e^{-i2π(k·x + Δf·t)}`` with ``k`` from
:func:`mrphy_tpu.utils.g2k` with ``isTx=False``; sample times are
``t_t = (t+1)·dt``, matching the Rx cumsum including the current
sample).

The adjoint (:func:`signal_adjoint`) is the conjugate-phase /
SENSE-style gridding-free reconstruction operator — the exact linear
adjoint of :func:`signal` in the spin magnetization (dot-product
identity asserted against ``jax.vjp`` in the tests).

The reference framework stops at the magnetization (`SURVEY.md` §2 has
no acquisition component); this extends the same object model through
signal encoding so pulse design, acquisition, and toy reconstruction
run in one differentiable graph.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from mrphy_tpu import dt0, pi
from mrphy_tpu._kwalias import kwalias
from mrphy_tpu.utils._shapes import rshape

__all__ = ['signal', 'signal_adjoint']

_PH = jax.lax.Precision.HIGHEST


def _factors(loc_, ktraj, df, T2s, dt, nT, dtype):
    r"""Per-(spin, sample) cos/sin/decay factor matrices for one batch:
    ``C = E·cos ψ``, ``S = E·sin ψ`` with
    ``ψ = −2π(k·x + Δf·t)``, ``E = exp(−t/T2*)``; `(nM, nT)` each."""
    t = (jnp.arange(nT, dtype=dtype) + 1) * dt            # (nT,)
    rows = [-2 * pi * ktraj, (-2 * pi * t)[None]]         # (3,nT),(1,nT)
    enc = jnp.concatenate(rows, 0)                        # (4, nT)
    df_col = (jnp.zeros((loc_.shape[0], 1), dtype) if df is None
              else jnp.broadcast_to(df, loc_.shape[:1]).astype(dtype)
              [:, None])
    ext = jnp.concatenate([loc_, df_col], 1)              # (nM, 4)
    # HIGHEST: the TPU default multiplies in bf16 — a ~4e-3 relative
    # phase error is O(1) RADIAN at |psi| ~ 250 rad (CLAUDE.md trap)
    psi = jnp.matmul(ext, enc.astype(dtype), precision=_PH)
    psi = lax.convert_element_type(psi, dtype)
    C, S = jnp.cos(psi), jnp.sin(psi)
    if T2s is not None:
        E = jnp.exp(-t[None] / jnp.broadcast_to(
            T2s, loc_.shape[:1]).astype(dtype)[:, None])  # (nM, nT)
        C, S = C * E, S * E
    return C, S


def _weights(M, sens, dtype):
    r"""Coil-weighted complex transverse magnetization: `(nC, nM)` re/im
    pair — ``w = sens · (Mx + i·My)`` (``sens=None`` ⇒ one uniform
    coil)."""
    mx, my = M[:, 0].astype(dtype), M[:, 1].astype(dtype)
    if sens is None:
        return mx[None], my[None]
    sr, si = (sens[:, 0].T.astype(dtype), sens[:, 1].T.astype(dtype))
    return sr * mx[None] - si * my[None], sr * my[None] + si * mx[None]


def _pick_chunk(nM: int, nT: int) -> int:
    r"""Spin-chunk size: bound the `(chunk, nT)` factor matrices near
    ~32 MB of f32 while keeping lane-friendly multiples of 256."""
    target = max(256, (8 << 20) // max(nT, 1) // 4 * 4)
    return min(nM, (target // 256) * 256 or 256)


@kwalias(**{'Δf': 'df'})
def signal(M, loc_, ktraj, *, sens=None, df=None, T2s=None, dt=dt0,
           chunk: Optional[int] = None, mesh=None,
           backend: str = 'xla', _pallas_interpret: bool = False):
    r"""Acquired k-space signal of a spin ensemble over a readout.

    Inputs:
        - ``M``: `(N, nM, xyz)` spins at readout start (compact layout;
          use :meth:`SpinArray.extract <mrphy_tpu.models.mobjs.SpinArray
          .extract>` / the ``_``-suffixed attrs). Only ``Mx``/``My``
          contribute.
        - ``loc_``: `(N ⊻ 1, nM, xyz)`, "cm", spin locations.
        - ``ktraj``: `(N ⊻ 1, xyz, nT)`, "cycle/cm" — Rx k-space, i.e.
          :func:`mrphy_tpu.utils.g2k` of the readout gradient with
          ``isTx=False``.
    Optionals:
        - ``sens``: `(N ⊻ 1, nM, xy, nC)` receive sensitivities as
          re/im pairs (the shape rule of the reference's ``b1Map_``);
          ``None`` ⇒ a single uniform coil.
        - ``df`` (alias ``Δf``): `()` ⊻ `(N ⊻ 1, nM)`, "Hz",
          off-resonance during the readout.
        - ``T2s``: `()` ⊻ `(N ⊻ 1, nM)`, "Sec", T2* decay (envelope
          ``exp(−t/T2s)``); ``None`` ⇒ no decay.
        - ``dt``: `()`, "Sec", dwell time.
        - ``chunk``: spins per scan step (default: sized to ~32 MB of
          factor matrices).
        - ``mesh``: a ``(batch, spins)`` :class:`jax.sharding.Mesh` —
          each chip encodes its spin shard, one ``psum`` combines the
          coil signals (the collective rides ICI).
        - ``backend``: ``'xla'`` (default) ⊻ ``'pallas'`` — the fused
          TPU kernel (:mod:`mrphy_tpu.ops.signal_pallas`): ~2–3×
          faster (the factor matrices never hit HBM) and FULLY
          differentiable — the VJP is one fused kernel emitting the
          exact ``M``/``sens`` linear adjoint AND the phase-chain
          ``loc_``/``ktraj``/``df``/``T2s`` cotangents (trajectory
          optimization at kernel speed; parity vs the XLA grads pinned
          in ``tests/test_signal.py`` and on-chip by ``tpu_checks``).
    Outputs:
        - ``s``: `(N, nC, nT, 2)` signal as re/im pairs ("complex" is
          unsupported on this TPU runtime).
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import signal_sharded_traceable
        return signal_sharded_traceable(mesh, M, loc_, ktraj, sens=sens,
                                        df=df, T2s=T2s, dt=dt,
                                        chunk=chunk, backend=backend,
                                        _pallas_interpret=_pallas_interpret)
    M, loc_, ktraj = (jnp.asarray(x) for x in (M, loc_, ktraj))
    N, nM, nT = M.shape[0], M.shape[1], ktraj.shape[-1]
    dtype = jnp.result_type(M.dtype, loc_.dtype)
    chunk = _pick_chunk(nM, nT) if chunk is None else min(chunk, nM)

    def one(M1, loc1, k1, sens1, df1, T2s1):
        wr, wi = _weights(M1, sens1, dtype)                # (nC, nM)
        nC = wr.shape[0]
        pad = (-nM) % chunk
        if pad:
            z = ((0, 0), (0, pad))
            wr, wi = jnp.pad(wr, z), jnp.pad(wi, z)        # zero spins
            loc1 = jnp.pad(loc1, ((0, pad), (0, 0)))
            df1 = None if df1 is None else jnp.pad(
                jnp.broadcast_to(df1, (nM,)), (0, pad))
            T2s1 = None if T2s1 is None else jnp.pad(
                jnp.broadcast_to(T2s1, (nM,)), (0, pad), mode='edge')
        nMp = nM + pad
        splits = nMp // chunk

        def body(acc, xs):
            wr_c, wi_c, loc_c, df_c, t2_c = xs
            C, S = _factors(loc_c, k1, df_c, t2_c, dt, nT, dtype)
            sr = jnp.matmul(wr_c, C, precision=_PH) \
                - jnp.matmul(wi_c, S, precision=_PH)
            si = jnp.matmul(wr_c, S, precision=_PH) \
                + jnp.matmul(wi_c, C, precision=_PH)
            return (acc[0] + sr, acc[1] + si), None

        def csplit(x):
            return (None if x is None
                    else x.reshape((splits, chunk) + x.shape[1:]))

        xs = (wr.T.reshape(splits, chunk, nC).transpose(0, 2, 1),
              wi.T.reshape(splits, chunk, nC).transpose(0, 2, 1),
              csplit(loc1), csplit(df1), csplit(T2s1))
        z = jnp.zeros((nC, nT), dtype)
        (sr, si), _ = lax.scan(body, (z, z), xs)
        return jnp.stack([sr, si], -1)                     # (nC, nT, 2)

    df_b = None if df is None else jnp.broadcast_to(
        rshape(df, 2), (N, nM))
    T2s_b = None if T2s is None else jnp.broadcast_to(
        rshape(T2s, 2), (N, nM))
    sens_b = None if sens is None else jnp.broadcast_to(
        jnp.asarray(sens), (N,) + jnp.asarray(sens).shape[1:])
    loc_b = jnp.broadcast_to(loc_, (N,) + loc_.shape[1:])
    k_b = jnp.broadcast_to(ktraj, (N,) + ktraj.shape[1:])
    if backend == 'pallas':
        from mrphy_tpu.ops import signal_pallas
        nC = 1 if sens is None else jnp.asarray(sens).shape[-1]
        assert _pallas_interpret or signal_pallas.is_available(
            dtype=dtype, nC=nC), (
            "backend='pallas' needs a TPU, f32 inputs, and 2*nC <= 128")
        return _signal_pallas_vjp(M, loc_b, k_b, sens_b, df_b, T2s_b,
                                  float(dt), _pallas_interpret)
    assert backend == 'xla', backend
    return jax.vmap(one)(M, loc_b, k_b, sens_b, df_b, T2s_b)


def _w2(M1, sens1, dtype):
    wr, wi = _weights(M1, sens1, dtype)
    return jnp.concatenate([wr, wi], 0)                   # (2nC, nM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _signal_pallas_vjp(M, loc_b, k_b, sens_b, df_b, T2s_b, dt,
                       interpret):
    r"""Fused-kernel forward; the VJP is the fused full-gradient kernel
    (see :func:`_sig_pl_bwd`)."""
    from mrphy_tpu.ops import signal_pallas
    N = M.shape[0]
    dtype = jnp.float32
    outs = []
    for n in range(N):                   # static small batch
        w2 = _w2(M[n], None if sens_b is None else sens_b[n], dtype)
        nC = w2.shape[0] // 2
        U, V = signal_pallas.signal_fwd_planes(
            w2, loc_b[n], k_b[n],
            None if df_b is None else df_b[n],
            None if T2s_b is None else T2s_b[n], dt,
            interpret=interpret)
        outs.append(jnp.stack([U[:nC] - V[nC:], V[:nC] + U[nC:]], -1))
    return jnp.stack(outs)


def _sig_pl_fwd(M, loc_b, k_b, sens_b, df_b, T2s_b, dt, interpret):
    out = _signal_pallas_vjp(M, loc_b, k_b, sens_b, df_b, T2s_b, dt,
                             interpret)
    return out, (M, loc_b, k_b, sens_b, df_b, T2s_b)


def _sig_pl_bwd(dt, interpret, res, g):
    r"""Full VJP through the fused kernel (:func:`mrphy_tpu.ops.
    signal_pallas.signal_vjp_planes`): exact linear adjoint in ``M``/
    ``sens`` plus the phase-chain cotangents for ``loc_``/``ktraj``/
    ``df``/``T2s`` — trajectory optimization and field-map fitting run
    at kernel speed."""
    from mrphy_tpu.ops import signal_pallas
    M, loc_b, k_b, sens_b, df_b, T2s_b = res
    N, nM = M.shape[0], M.shape[1]
    f32 = jnp.float32
    gMs, gls, gks, gses, gdfs, gt2s = [], [], [], [], [], []
    for n in range(N):
        gn = g[n]                                         # (nC, nT, 2)
        g2 = jnp.concatenate([gn[..., 0], gn[..., 1]], 0)  # (2nC, nT)
        nC = gn.shape[0]
        sens1 = None if sens_b is None else sens_b[n]
        w2 = _w2(M[n], sens1, f32)
        T2s1 = None if T2s_b is None else T2s_b[n]
        XR, XS, dloc, dk, ddf, di2 = signal_pallas.signal_vjp_planes(
            g2, w2, loc_b[n], k_b[n],
            None if df_b is None else df_b[n], T2s1, dt,
            interpret=interpret)
        xr = XR[:, :nC] + XS[:, nC:]                      # dw_re (nM,nC)
        xi = XR[:, nC:] - XS[:, :nC]                      # dw_im
        mx, my = M[n][:, 0].astype(f32), M[n][:, 1].astype(f32)
        if sens1 is None:
            mr, mi = xr[:, 0], xi[:, 0]
        else:
            cr = sens1[:, 0].astype(f32)                  # (nM, nC)
            ci = sens1[:, 1].astype(f32)
            mr = (cr * xr + ci * xi).sum(-1)
            mi = (cr * xi - ci * xr).sum(-1)
            # w = sens ∘ (mx + i·my): product-rule sens cotangent
            dsr = xr * mx[:, None] + xi * my[:, None]
            dsi = xi * mx[:, None] - xr * my[:, None]
            gses.append(jnp.stack([dsr, dsi], 1))         # (nM, 2, nC)
        gMs.append(jnp.stack([mr, mi, jnp.zeros((nM,), mr.dtype)], -1))
        gls.append(dloc)
        gks.append(dk)
        if ddf is not None:
            gdfs.append(ddf)
        if di2 is not None:
            gt2s.append(-di2 / (T2s1.astype(f32) ** 2))
    gM = jnp.stack(gMs).astype(M.dtype)
    cast = lambda xs, ref: jnp.stack(xs).astype(        # noqa: E731
        jnp.asarray(ref).dtype)
    return (gM, cast(gls, loc_b), cast(gks, k_b),
            None if sens_b is None else cast(gses, sens_b),
            None if df_b is None else cast(gdfs, df_b),
            None if T2s_b is None else cast(gt2s, T2s_b))


_signal_pallas_vjp.defvjp(_sig_pl_fwd, _sig_pl_bwd)


@kwalias(**{'Δf': 'df'})
def signal_adjoint(s, loc_, ktraj, *, sens=None, df=None, T2s=None,
                   dt=dt0, chunk: Optional[int] = None, mesh=None,
                   backend: str = 'xla',
                   _pallas_interpret: bool = False):
    r"""Exact adjoint of :func:`signal` in the transverse magnetization:
    conjugate-phase, decay-weighted, coil-combined back-projection

    .. math::
       \hat m_{xy,m} = \sum_{c,t} \overline{\mathrm{sens}_{c,m}}\,
           e^{-t_t/T2^*_m}\, e^{+i 2\pi (k_t\cdot x_m + \Delta f_m t_t)}
           \, s_c(t)

    — the density-uncompensated conjugate-phase reconstruction (and the
    building block of iterative SENSE: ``A^H A x = A^H s`` with
    ``A =``:func:`signal`).

    Inputs:
        - ``s``: `(N, nC, nT, 2)` signal (re/im).
        - ``loc_``/``ktraj`` and optionals: exactly as :func:`signal`.
    Outputs:
        - ``mxy``: `(N, nM, 2)` re/im back-projected transverse
          magnetization.
    """
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import (
            signal_adjoint_sharded_traceable)
        return signal_adjoint_sharded_traceable(
            mesh, s, loc_, ktraj, sens=sens, df=df, T2s=T2s, dt=dt,
            chunk=chunk, backend=backend,
            _pallas_interpret=_pallas_interpret)
    s, loc_, ktraj = (jnp.asarray(x) for x in (s, loc_, ktraj))
    N, nM, nT = s.shape[0], loc_.shape[1], ktraj.shape[-1]
    dtype = jnp.result_type(s.dtype, loc_.dtype)
    chunk = _pick_chunk(nM, nT) if chunk is None else min(chunk, nM)

    def one(s1, loc1, k1, sens1, df1, T2s1):
        sr, si = s1[..., 0].astype(dtype), s1[..., 1].astype(dtype)
        pad = (-nM) % chunk
        loc_p = jnp.pad(loc1, ((0, pad), (0, 0))) if pad else loc1
        df_p = None if df1 is None else (jnp.pad(
            jnp.broadcast_to(df1, (nM,)), (0, pad)) if pad
            else jnp.broadcast_to(df1, (nM,)))
        T2_p = None if T2s1 is None else (jnp.pad(
            jnp.broadcast_to(T2s1, (nM,)), (0, pad), mode='edge')
            if pad else jnp.broadcast_to(T2s1, (nM,)))
        sens_p = None
        if sens1 is not None:
            sens_p = (jnp.pad(sens1, ((0, pad), (0, 0), (0, 0)))
                      if pad else sens1)                  # (nMp, 2, nC)
        nMp = nM + pad
        splits = nMp // chunk

        def body(_, xs):
            loc_c, df_c, t2_c, sens_c = xs
            C, S = _factors(loc_c, k1, df_c, t2_c, dt, nT, dtype)
            # Σ_{c,t} conj(sens)·e^{+iψ}·E·s  (note e^{−iψ} in fwd)
            xr = jnp.matmul(C, sr.T, precision=_PH) \
                + jnp.matmul(S, si.T, precision=_PH)      # (chunk, nC)
            xi = jnp.matmul(C, si.T, precision=_PH) \
                - jnp.matmul(S, sr.T, precision=_PH)
            if sens_c is None:
                mr, mi = xr.sum(-1), xi.sum(-1)
            else:
                cr, ci = sens_c[:, 0], sens_c[:, 1]       # (chunk, nC)
                mr = (cr * xr + ci * xi).sum(-1)
                mi = (cr * xi - ci * xr).sum(-1)
            return None, jnp.stack([mr, mi], -1)          # (chunk, 2)

        def csplit(x):
            return (None if x is None
                    else x.reshape((splits, chunk) + x.shape[1:]))

        xs = (csplit(loc_p), csplit(df_p), csplit(T2_p), csplit(sens_p))
        _, out = lax.scan(body, None, xs)                 # (splits,chunk,2)
        return out.reshape(nMp, 2)[:nM]

    df_b = None if df is None else jnp.broadcast_to(
        rshape(df, 2), (N, nM))
    T2s_b = None if T2s is None else jnp.broadcast_to(
        rshape(T2s, 2), (N, nM))
    sens_b = None if sens is None else jnp.broadcast_to(
        jnp.asarray(sens), (N,) + jnp.asarray(sens).shape[1:])
    loc_b = jnp.broadcast_to(loc_, (N,) + loc_.shape[1:])
    k_b = jnp.broadcast_to(ktraj, (N,) + ktraj.shape[1:])
    if backend == 'pallas':
        from mrphy_tpu.ops import signal_pallas
        nC = s.shape[1]
        assert _pallas_interpret or signal_pallas.is_available(
            dtype=dtype, nC=nC), (
            "backend='pallas' needs a TPU, f32 inputs, and 2*nC <= 128")
        outs = []
        for n in range(N):                   # static small batch
            sn = s[n].astype(jnp.float32)
            s2 = jnp.concatenate([sn[..., 0], sn[..., 1]], 0)
            XR, XS = signal_pallas.signal_adj_planes(
                s2, loc_b[n], k_b[n],
                None if df_b is None else df_b[n],
                None if T2s_b is None else T2s_b[n], float(dt),
                interpret=_pallas_interpret)
            xr = XR[:, :nC] + XS[:, nC:]
            xi = XR[:, nC:] - XS[:, :nC]
            if sens_b is None:
                mr, mi = xr[:, 0], xi[:, 0]
            else:
                cr = sens_b[n][:, 0].astype(jnp.float32)
                ci = sens_b[n][:, 1].astype(jnp.float32)
                mr = (cr * xr + ci * xi).sum(-1)
                mi = (cr * xi - ci * xr).sum(-1)
            outs.append(jnp.stack([mr, mi], -1))
        return jnp.stack(outs)
    assert backend == 'xla', backend
    return jax.vmap(one)(s, loc_b, k_b, sens_b, df_b, T2s_b)
