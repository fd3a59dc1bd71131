r"""Gradient-system impulse response (GIRF) modeling.

Real gradient chains low-pass and distort the commanded waveform (amp
bandwidth, eddy currents, delays); what the spins see is the commanded
gradient convolved with the system's impulse response. Simulating —
and, more importantly, DESIGNING THROUGH — that response makes the
optimizer pre-compensate the hardware: the designed waveform is what to
command so the *played* gradient excites the target profile.

Everything here is differentiable (FFT convolution) and jit-friendly
(static lengths), so :func:`mrphy_tpu.design.design_pulse` accepts a
``girf_`` and back-propagates through the convolution each iteration.

The reference framework has no hardware-response modeling (its Bloch
engines consume the commanded ``gr`` directly, ``/root/reference/mrphy/
sims.py``); this is deployment-fidelity breadth beyond it.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ['apply_girf', 'exp_decay_girf']


def apply_girf(gr, girf, *, axis_dim: int = 1):
    r"""Causally convolve gradients with per-axis impulse responses.

    Inputs:
        - ``gr``: `(N, 3, nT)`, commanded gradients, "Gauss/cm".
        - ``girf``: `(3, nH)` ⊻ `(nH,)` per-axis (or shared) DISCRETE
          impulse response sampled at the same dwell time as ``gr``
          (the identity response is ``[1, 0, 0, ...]``; unit DC gain
          means ``sum(girf) == 1``).
    Outputs:
        - `(N, 3, nT)`, the played gradients: ``out[..., t] =
          Σ_k girf[k] · gr[..., t-k]`` (causal; the convolution tail
          beyond nT is dropped).
    """
    gr = jnp.asarray(gr)
    h = jnp.asarray(girf, gr.dtype)
    if h.ndim == 1:
        h = jnp.broadcast_to(h, (3, h.shape[-1]))
    assert h.ndim == 2 and h.shape[0] == 3, (
        f'girf must be (3, nH) or (nH,), got {h.shape}')
    nT, nH = gr.shape[-1], h.shape[-1]
    L = nT + nH - 1
    # next power of two: FFT lengths stay static under jit and fast
    Lf = 1 << (L - 1).bit_length()
    G = jnp.fft.rfft(gr, n=Lf, axis=-1)
    H = jnp.fft.rfft(h, n=Lf, axis=-1)           # (3, Lf//2+1)
    out = jnp.fft.irfft(G * H, n=Lf, axis=-1)[..., :nT]
    return out.astype(gr.dtype)


def exp_decay_girf(nH: int, dt: float, *, delay_samples: int = 0,
                   amps=(), taus=(), dtype=np.float64):
    r"""Build a canonical gradient-chain impulse response: a (possibly
    delayed) passthrough minus exponential eddy-current terms.

    ``h[t] = δ[t - delay] - Σ_i amps[i]·(dt/taus[i])·exp(-t·dt/taus[i])``

    for `t ≥ delay` (each eddy term integrates to ``amps[i]`` — the
    usual dimensionless eddy-current amplitude convention), normalized
    to unit DC gain so plateaus settle to the commanded value.

    Inputs:
        - ``nH``: response length in samples.
        - ``dt``: dwell time, "Sec".
    Optionals:
        - ``delay_samples``: group delay of the chain.
        - ``amps``/``taus``: eddy-current amplitudes (dimensionless)
          and time constants ("Sec"), equal lengths.
    Outputs:
        - `(nH,)` numpy array (pass straight to :func:`apply_girf`).
    """
    assert len(amps) == len(taus)
    h = np.zeros(nH, dtype)
    h[delay_samples] = 1.0
    t = np.arange(nH - delay_samples, dtype=dtype) * dt
    for a, tau in zip(amps, taus):
        h[delay_samples:] -= a * (dt / tau) * np.exp(-t / tau)
    return h / h.sum()
