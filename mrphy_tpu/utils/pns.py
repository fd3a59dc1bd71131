r"""Peripheral-nerve-stimulation (PNS) prediction for gradient
waveforms — the chronaxie convolution model.

Gradient hardware limits are not only ``gmax``/``smax``: regulatory
PNS limits (IEC 60601-2-33) bound a *temporally filtered* slew rate.
The standard predictive model [Schulte & Noeske, MRM 68(5):1664,
2012; Hebrank & Gebhardt's SAFE is the multi-filter variant] convolves
each axis's slew rate with the nerve-stimulation impulse response

``h(u) = c / (c + u)²``  (chronaxie ``c``, ∫₀^∞ h du = 1)

and normalizes by the axis rheobase slew ``smin`` (the sustained slew
giving 100% stimulation threshold):

``PNS_a(t) = (100 / smin_a) · (h ⋆ |ds_a/dt|-signed)(t)``,
``PNS(t) = ‖PNS_xyz(t)‖₂``  — limit: e.g. 80% (normal mode).

TPU-native details: the kernel taps are the EXACT per-dwell integrals
``c·(1/(c+k·dt) − 1/(c+(k+1)·dt))`` (no quadrature error, and they
telescope so the truncated-tail mass is known in closed form and is
compensated multiplicatively); the causal convolution is one
``lax.conv_general_dilated`` over (axis-batched) waveforms — an MXU
op — and everything is differentiable, so PNS can be a design-loop
penalty (``DesignConfig.lam_pns``) like gmax/SAR.

The reference framework has no hardware-constraint models at all
beyond scalar clamps (SURVEY §2); this joins GIRF and SAR VOPs in the
beyond-reference hardware stack.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from mrphy_tpu import dt0

__all__ = ['pns_kernel', 'pns_predict', 'pns_max']

# IEC-flavored defaults: chronaxie 334 us; rheobase slew ~60 T/m/s =
# 6000 Gauss/cm/s per axis (vendor-calibrated in practice).
CHRONAXIE0 = 334e-6
SMIN0 = (6000.0, 6000.0, 6000.0)


def pns_kernel(dt: float, *, chronaxie: float = CHRONAXIE0,
               tail: float = 0.01):
    r"""Discrete nerve impulse-response taps (exact per-dwell
    integrals of ``c/(c+u)²``), truncated when the remaining tail mass
    drops below ``tail`` and rescaled to unit sum (the tail is a flat
    multiplicative under-response, so rescaling removes the bias for
    sustained slews while short events are unaffected).

    Outputs: ``h``: `(K,)` taps summing to exactly 1.

    ``dt`` must be CONCRETE (a float or an unambiguous array, e.g.
    ``Pulse.dt``): the kernel length is a static shape.
    """
    c = float(chronaxie)
    dt_all = np.asarray(dt, np.float64).reshape(-1)
    assert dt_all.size == 1 or np.ptp(dt_all) == 0.0, dt_all
    dt = float(dt_all[0])
    # mass covered by K taps = 1 − c/(c + K·dt)  ⇒  K for 1−tail
    K = int(np.ceil((c / tail - c) / dt))
    k = np.arange(K, dtype=np.float64)
    h = c * (1.0 / (c + k * dt) - 1.0 / (c + (k + 1) * dt))
    return jnp.asarray(h / h.sum())


def pns_predict(gr, dt=dt0, *, smin: Tuple[float, ...] = SMIN0,
                chronaxie: float = CHRONAXIE0, tail: float = 0.01):
    r"""Predicted PNS level over time for gradient waveforms.

    Inputs:
        - ``gr``: `(N, xyz, nT)`, "Gauss/cm".
        - ``dt``: `()`, "Sec", dwell.
    Optionals:
        - ``smin``: per-axis rheobase slew, "Gauss/cm/s" (sustained
          slew at which PNS = 100%).
        - ``chronaxie``: "Sec"; ``tail``: kernel truncation mass.
    Outputs:
        - ``pns``: `(N, nT)`, "%", the combined ``‖·‖₂`` over axes of
          the filtered per-axis slew (signed slew, magnitude taken
          after filtering — bipolar lobes partially cancel, as nerves
          do).
    """
    gr = jnp.asarray(gr)
    N, nax, nT = gr.shape
    dt = float(np.asarray(dt, np.float64).reshape(-1)[0])
    s = jnp.diff(gr, axis=-1, prepend=gr[..., :1]) / dt  # signed slew
    h = pns_kernel(dt, chronaxie=chronaxie, tail=tail).astype(gr.dtype)
    K = h.shape[0]
    # causal conv per (batch·axis) channel: feature dim = 1
    x = s.reshape(N * nax, 1, nT)
    out = lax.conv_general_dilated(
        x, h[None, None, ::-1], window_strides=(1,),
        padding=[(K - 1, 0)],
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=lax.Precision.HIGHEST)
    f = out.reshape(N, nax, nT)
    w = 100.0 / jnp.asarray(smin, gr.dtype).reshape(1, nax, 1)
    return jnp.sqrt(jnp.maximum(((w * f) ** 2).sum(1), 1e-30))


def pns_max(gr, dt=dt0, **kw):
    r"""Peak predicted PNS, `(N,)` "%"; ``< 80`` is the usual
    normal-operating-mode criterion."""
    return pns_predict(gr, dt, **kw).max(-1)
