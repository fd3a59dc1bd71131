r"""MRphy-TPU: a TPU-native (JAX/XLA/Pallas) differentiable MR-physics
framework.

A ground-up rebuild of the capabilities of ``MRphy.py``
(reference: ``/root/reference/mrphy/__init__.py``) designed TPU-first:

- arrays are immutable pytrees; the Bloch time loop is ``lax.scan``;
- the hand-derived explicit-Jacobian engine of the reference
  (``/root/reference/mrphy/sims.py:24-269``) becomes ``jax.custom_vjp``
  with a tile-aligned structure-of-arrays ``(xyz, nSpins/128, 128)``
  internal layout so the spin axis lands on the VPU (sublane, lane)
  tile with zero padding;
- the hot fused rotation+relaxation step ships as a Pallas TPU kernel
  with an XLA ``lax.scan`` fallback/oracle;
- multi-chip scaling is a ``jax.sharding`` mesh over ``(batch, spins)``
  (communication-free hot loop), not a port of any host-side machinery.

Shape grammar (same conventions as the reference,
``/root/reference/mrphy/__init__.py:23-50``):

- ``N``:   batch size
- ``nM``:  number of (compactly stored) spins
- ``Nd``:  spatial grid size tuple, e.g. ``(nx, ny, nz)``
- ``nT``:  number of time points
- ``xy``:  length-2 dim (real/imag RF)
- ``xyz``: length-3 dim
- A trailing ``_`` marks the compact form: ``X`` is ``(N, *Nd, ...)``,
  ``X_`` is ``(N, nM, ...)``.
- ``⊻`` (either-or): a function accepts at most one of the keywords,
  e.g. ``Δf ⊻ Δf_``.

Units: Gauss, Gauss/cm, Gauss/cm/Sec, Hz/Gauss, Sec, cm, cycle/cm.

ASCII-primary API with Unicode aliases: every Unicode name of the reference
API (``γH``, ``uϕrot``, ``rf2tρθ``, keyword ``γ=...``, ``Δf=...``) is
accepted, while primary spellings are ASCII (``gamH``, ``uphirot``,
``rf2trho_theta``, ``gam=...``, ``df=...``).
"""

from math import pi as π, inf  # noqa: F401,E741

pi = π

# -- Physical constants (values: /root/reference/mrphy/__init__.py:58-65) --
gamH = 4257.6      # Hz/Gauss, water proton gyromagnetic ratio
T1G = 1.47         # Sec, T1 of gray matter
T2G = 0.07         # Sec, T2 of gray matter

dt0 = 4e-6         # Sec, default dwell time
gmax0 = 5.0        # Gauss/cm, default max |gradient|
smax0 = 12e3       # Gauss/cm/Sec, default max |slew rate|
rfmax0 = 0.25      # Gauss, default max |RF|

# Unicode alias for reference-API compatibility
γH = gamH

_slice = slice(None)


def tpu_is_available() -> bool:
    r"""Return ``True`` iff a TPU device is visible to JAX.

    TPU-native analog of the reference's CUDA probe
    (``/root/reference/mrphy/__init__.py:70-85``); detection is by JAX
    device query rather than driver-library dlopen.
    """
    import jax
    try:
        return any(d.platform.startswith(('tpu', 'axon'))
                   for d in jax.devices())
    except RuntimeError:
        return False


from mrphy_tpu import utils                  # noqa: E402
from mrphy_tpu.ops import beffective         # noqa: E402
from mrphy_tpu.ops import sims               # noqa: E402
from mrphy_tpu.ops import slowsims           # noqa: E402
from mrphy_tpu.ops import epg                # noqa: E402
from mrphy_tpu.ops import ssfp               # noqa: E402
from mrphy_tpu.ops import mrf                # noqa: E402
from mrphy_tpu.ops import signal             # noqa: E402
from mrphy_tpu.ops import nufft              # noqa: E402
from mrphy_tpu.ops import dixon              # noqa: E402
from mrphy_tpu.ops import field              # noqa: E402
from mrphy_tpu.models import mobjs           # noqa: E402
from mrphy_tpu import parallel               # noqa: E402
from mrphy_tpu import design                 # noqa: E402
from mrphy_tpu.version import __version__    # noqa: F401,E402

# Make the reference's flat import paths work (`import mrphy_tpu.sims`,
# `from mrphy_tpu.beffective import *`) while the implementations live in
# the ops/models subpackages.
import sys as _sys                           # noqa: E402

for _name, _mod in (('beffective', beffective), ('sims', sims),
                    ('slowsims', slowsims), ('epg', epg),
                    ('ssfp', ssfp), ('mrf', mrf),
                    ('signal', signal), ('nufft', nufft),
                    ('dixon', dixon), ('field', field),
                    ('mobjs', mobjs)):
    _sys.modules[f'{__name__}.{_name}'] = _mod

__all__ = ['gamH', 'γH', 'T1G', 'T2G', 'dt0', 'gmax0', 'smax0', 'rfmax0',
           'utils', 'beffective', 'sims', 'slowsims', 'epg', 'ssfp',
           'mrf', 'signal', 'nufft', 'dixon', 'field', 'mobjs',
           'parallel', 'design', 'tpu_is_available']
