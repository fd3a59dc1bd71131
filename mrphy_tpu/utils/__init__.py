r"""MRphy-TPU utilities: indexing, conversions, reparametrizations, rotation.

Feature-parity surface of ``/root/reference/mrphy/utils.py`` with
ASCII-primary names plus Unicode aliases matching the reference API
(including both the U+03C6/``φ`` and U+03D5/``ϕ`` spellings — the reference
``__all__`` and function name disagree, ``utils.py:24`` vs ``:333``).
"""

from mrphy_tpu.utils.conversions import ctrsub, g2k, g2s, k2g, s2g
from mrphy_tpu.utils.rf import (rf_c2r, rf_r2c, rf2trho_theta,
                                trho_theta2rf, rf2lrho_theta,
                                lrho_theta2rf, rfclamp)
from mrphy_tpu.utils.slew import s2ts, ts2s, sclamp
from mrphy_tpu.utils.rotation import uphirot
from mrphy_tpu.utils.interp import interp_matrix, interp1d_apply
from mrphy_tpu.utils import timing  # noqa: F401  (timing/profiling harness)
from mrphy_tpu.utils.pulseq import pulse_to_seq, seq_to_pulse
from mrphy_tpu.utils.girf import apply_girf, exp_decay_girf
from mrphy_tpu.utils.sar import sar_vops, vop_compress
from mrphy_tpu.utils.traj import (spiral2d, epi, radial, radial3d,
                                  rosette, trapezoid, rewinder,
                                  mintime_gradient, traj_check)
from mrphy_tpu.utils.coils import (coil_compress, apply_ccmat,
                                   noise_whiten_mat, add_noise,
                                   adaptive_maps, espirit_maps,
                                   gfactor_sense, gfactor_replica,
                                   replica_std)
from mrphy_tpu.utils.grappa import (grappa_weights, grappa_apply,
                                    sg_weights, sg_apply)
from mrphy_tpu.utils.pf import pocs_pf
from mrphy_tpu.utils.pns import pns_kernel, pns_predict, pns_max
from mrphy_tpu.utils.shim import sh_basis, shim_fit, shim_apply
from mrphy_tpu.utils.export import (export_compiled, load_compiled,
                                    symbolic_dim, export_applypulse)
from mrphy_tpu.utils.biot import (ellipk, ellipe, loop_field, loop_b1,
                                  loop_ring)

# -- Unicode aliases (reference spellings) --
# Python NFKC-normalizes identifiers: source written as `uϕrot` (U+03D5,
# the reference's function name, utils.py:333) or `uφrot` (U+03C6, its
# __all__ spelling, utils.py:24) both resolve to the single normalized
# attribute 'uφrot'. __all__ strings are NOT normalized, so only the
# normalized spelling may appear there.
uφrot = uphirot          # covers both uϕrot / uφrot source spellings
rf2tρθ = rf2trho_theta   # /root/reference/mrphy/utils.py:196
tρθ2rf = trho_theta2rf   # /root/reference/mrphy/utils.py:313
rf2lρθ = rf2lrho_theta   # /root/reference/mrphy/utils.py:171
lρθ2rf = lrho_theta2rf   # /root/reference/mrphy/utils.py:114

__all__ = ['ctrsub', 'g2k', 'g2s', 'k2g', 'rf_c2r', 'rf_r2c',
           'rf2trho_theta', 'trho_theta2rf', 'rf2lrho_theta',
           'lrho_theta2rf', 'rfclamp', 's2g', 's2ts', 'sclamp', 'ts2s',
           'uphirot', 'interp_matrix', 'interp1d_apply',
           'pulse_to_seq', 'seq_to_pulse',
           'apply_girf', 'exp_decay_girf', 'sar_vops', 'vop_compress',
           'spiral2d', 'epi', 'radial', 'radial3d', 'rosette',
           'trapezoid', 'rewinder', 'mintime_gradient', 'traj_check',
           'coil_compress', 'apply_ccmat', 'noise_whiten_mat',
           'add_noise', 'adaptive_maps', 'espirit_maps',
           'gfactor_sense', 'gfactor_replica', 'replica_std',
           'grappa_weights', 'grappa_apply', 'sg_weights', 'sg_apply',
           'pocs_pf', 'pns_kernel', 'pns_predict', 'pns_max',
           'sh_basis', 'shim_fit', 'shim_apply',
           'export_compiled', 'load_compiled', 'symbolic_dim',
           'export_applypulse',
           'ellipk', 'ellipe', 'loop_field', 'loop_b1', 'loop_ring',
           # Unicode aliases (NFKC-normalized spellings)
           'uφrot', 'rf2tρθ', 'tρθ2rf', 'rf2lρθ', 'lρθ2rf']
