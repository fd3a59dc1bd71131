r"""Joint RF + gradient waveform design (the workload of the reference's
cited papers), as jitted optax optimization loops."""

from mrphy_tpu.design.joint import (DesignConfig, design_pulse,
                                    design_multiscale, design_step,
                                    init_params, make_optimizer,
                                    params2pulse)
from mrphy_tpu.design.checkpoint import DesignCheckpoint
from mrphy_tpu.design.sta import sta_design, sta_forward
from mrphy_tpu.design.slr import slr_design, slr_gr
from mrphy_tpu.design.adiabatic import (adiabatic_bir4, adiabatic_hypsec,
                                        adiabatic_wurst)
from mrphy_tpu.design.sms import sms_modulate, sms_phases
from mrphy_tpu.design.verse import verse_b1cap

__all__ = ['DesignConfig', 'DesignCheckpoint', 'design_pulse',
           'design_multiscale', 'design_step', 'init_params',
           'make_optimizer', 'params2pulse', 'sta_design', 'sta_forward',
           'slr_design', 'slr_gr', 'adiabatic_hypsec', 'adiabatic_bir4',
           'adiabatic_wurst',
           'sms_modulate', 'sms_phases', 'verse_b1cap']
