r"""Example smoke tests: every ``examples/*.py`` runs end-to-end (tiny
configs) on the CI platform. Each example carries its own physics
assertions (analytic T2*, banding nulls, CEST asymmetry, profile error
bounds, ...), so "it ran" means "its physics checks passed" too.
"""

import runpy
import sys
import pathlib

import pytest

EX = pathlib.Path(__file__).parent.parent / 'examples'

CASES = [
    ('design_3d.py', ['--n', '8', '--nt', '32', '--iters', '4',
                      '--seq', '/tmp/design3d_smoke.seq']),
    ('design_3d.py', ['--n', '8', '--nt', '32', '--iters', '4',
                      '--coarse']),
    ('design_3d.py', ['--n', '8', '--nt', '32', '--iters', '4',
                      '--init', 'sta']),
    ('slice_select.py', ['--nz', '64', '--dur', '0.002']),
    ('qmri_fit.py', ['--nvox', '16', '--iters', '120']),
    ('bolus_flow.py', ['--nspins', '16', '--nt', '64']),
    ('robust_design.py', ['--nz', '32', '--iters', '150']),
    ('t2star_fid.py', ['--K', '4096']),
    ('bssfp_banding.py', ['--nf', '13']),
    ('cest_zspectrum.py', ['--noffsets', '13', '--tsat', '0.5']),
    ('epg_multiparam_fit.py', ['--iters', '300']),
    ('mrf_dictionary.py', ['--ntr', '80', '--nt1', '12', '--nt2', '12',
                           '--iters', '200']),
    ('girf_preemphasis.py', ['--nt', '128', '--iters', '250']),
    ('ptx_sar_design.py', ['--n', '6', '--nt', '64', '--iters', '120']),
    # physical Biot-Savart loop-ring B1+ maps (utils.biot)
    ('ptx_sar_design.py', ['--n', '6', '--nt', '64', '--iters', '120',
                           '--maps', 'loops']),
    ('recon_sense.py', ['--n', '16', '--iters', '30']),
    ('dwi_adc_fit.py', ['--nvox', '16', '--iters', '400']),
    ('spectral_spatial.py', ['--nz', '24', '--ndf', '9']),
    ('bloch_siegert_b1map.py', ['--nb1', '24']),
    ('crlb_protocol.py', ['--ntr', '32', '--iters', '200']),
    ('scanner_pipeline.py', ['--n', '16']),
    ('fieldmap_recon.py', ['--n', '16', '--iters', '250', '--shim']),
    ('mwf_fit.py', ['--nvox', '12', '--iters', '600']),
    ('bssfp_fit.py', ['--nvox', '8', '--ntr', '80', '--iters', '250']),
    # (T1, T2, D) diffusion-MRF through the in-kernel spoiler
    # diffusion: two-crusher dictionary -> match -> refinement
    ('mrf_diffusion.py', ['--ntr', '60', '--nt1', '6', '--nt2', '6',
                          '--nd', '5', '--K', '16', '--iters', '150']),
    # variable-TR crusher schedule: per-step in-kernel attenuation
    ('mrf_diffusion.py', ['--ntr', '60', '--nt1', '6', '--nt2', '6',
                          '--nd', '5', '--K', '16', '--iters', '150',
                          '--vartr']),
    # exchange-MRF through the variable-TR two-pool train (round 4)
    ('mrfx_exchange.py', ['--ntr', '80', '--nt1', '6', '--nk', '5',
                          '--K', '12', '--iters', '150']),
    ('qmt_fit.py', ['--nvox', '6', '--iters', '300', '--ntr', '150']),
    ('pc_venc.py', ['--nspins', '16']),
    ('traj_optim.py', ['--iters', '100']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--noise',
                        '0.3']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--traj',
                        'radial', '--df', '30']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--op', 'nufft',
                        '--df', '40']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--op', 'nufft',
                        '--traj', 'radial', '--noise', '0.3']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--op', 'nufft',
                        '--toeplitz']),
    # self-calibrated: ESPIRiT maps from a Cartesian ACS acquisition
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--maps',
                        'espirit']),
    ('recon_sense.py', ['--n', '16', '--iters', '40', '--maps',
                        'espirit', '--noise', '0.02']),
    # k-space parallel imaging (GRAPPA) through the exact operator
    ('grappa_recon.py', ['--n', '32', '--nc', '6', '--acs', '12']),
    # water-fat separation / PDFF mapping (IDEAL, 6-peak fat)
    ('dixon_waterfat.py', ['--n', '24']),
    # SMS: physical CAIPI kz blips -> split-slice GRAPPA separation
    ('sms_recon.py', ['--n', '24', '--acs', '12']),
    # compressed sensing: TV-CP through the NUFFT at 24% Nyquist
    ('cs_recon.py', ['--n', '32', '--spokes', '12']),
    # QSM: dipole forward -> TKD + TV-regularized inversion
    ('qsm.py', ['--n', '24', '--iters', '150']),
    # T1rho dispersion: spin-lock exchange quantification (k_ex fit)
    ('t1rho_dispersion.py', ['--dt', '4e-5', '--iters', '800']),
    # gradient nonlinearity: distorted acquisition -> gradwarp
    ('gnl_gradwarp.py', []),
    # inter-shot motion -> phase-encode ghosts -> navigator fix
    ('motion_ghosting.py', []),
    # EPI timing skew -> N/2 ghost -> hybrid-space phase correction
    ('epi_ghost.py', []),
    # differentiable coil-array layout optimization (g-factor descent)
    ('coil_layout_optim.py', ['--n', '24', '--iters', '150']),
    # slice-profile-resolved EPG T2 mapping vs full Bloch train
    ('t2map_slice_profile.py', ['--nz', '48', '--nt', '96',
                                '--iters', '150']),
    # T2 shuffling: subspace echo-train recon via block-diagonal solve
    ('t2shuffling.py', ['--n', '32', '--ne', '16', '--shots', '4']),
    # MRF sequence optimization through the DIFFERENTIABLE fused
    # dictionary kernels (round-3 recompute-through-XLA VJP)
    ('mrf_seq_optim.py', ['--natoms', '64', '--ntr', '32', '--K', '10',
                          '--iters', '30']),
    # full canonical-schedule optimization: flips + TR train (fixed
    # total time) + inversion time, through zinit/ir_prep + vartr
    ('mrf_seq_optim.py', ['--natoms', '64', '--ntr', '32', '--K', '10',
                          '--iters', '30', '--schedule', 'full']),
    # k-space MRF end to end (round 5): spoke-per-TR acquisition ->
    # subspace CG recon -> compressed match -> refinement
    ('mrf_kspace.py', ['--n', '24', '--ntr', '60', '--iters', '6',
                       '--rank', '6', '--refine-iters', '12']),
    # multi-coil SENSE variant: coil-weighted acquisition + object
    # phase -> sens= normal equations -> jc-composed probes + m0
    # phase check
    ('mrf_kspace.py', ['--n', '24', '--ntr', '60', '--iters', '6',
                       '--rank', '6', '--refine-iters', '12',
                       '--coils', '3']),
    # golden-angle-rotated spiral interleaves (the Ma 2013 MRF
    # acquisition) through the same subspace pipeline
    ('mrf_kspace.py', ['--n', '24', '--ntr', '60', '--iters', '6',
                       '--rank', '6', '--refine-iters', '12',
                       '--traj', 'spiral', '--interleaves', '12']),
    # slice-profile-integrated dictionaries (round 5): SLR profile ->
    # b1-axis sub-slice integration; corrected-vs-naive bias
    ('mrf_sliceprofile.py', ['--ntr', '120', '--nsub', '7',
                             '--nsub-truth', '15', '--nprobe', '64',
                             '--K', '16']),
    # true-3D koosh-ball CG recon through the 3-D Pallas NUFFT
    ('recon3d.py', ['--n', '12', '--spokes', '120', '--iters', '8']),
    # deployment lifecycle: design -> AOT artifacts -> serve (bit-exact)
    ('serve_artifact.py', ['--n', '8', '--nt', '32', '--iters', '20']),
    # voxel-sharded variants on the 8-virtual-device CPU mesh
    ('recon_sense.py', ['--n', '16', '--iters', '30', '--df', '40',
                        '--mesh']),
    ('qmri_fit.py', ['--nvox', '16', '--iters', '120', '--mesh']),
    ('mwf_fit.py', ['--nvox', '16', '--iters', '500', '--mesh']),
    ('cest_zspectrum.py', ['--noffsets', '13', '--tsat', '0.5',
                           '--mesh']),
    # CEST quantification: kab/B0 maps by Adam through the fused
    # two-pool waveform engine (QUESP-style two saturation powers).
    # (--mesh variant not smoked here: engine-level sharded fwd+grad
    # parity is pinned at 1e-12 by test_parallel, and the 8-virtual-
    # device fit costs ~12 min of single-CPU suite time for no new
    # coverage.)
    ('cest_fit.py', ['--nvox', '6', '--noffsets', '12', '--tsat',
                     '0.4', '--iters', '150']),
]


# the heaviest fits (minutes each on one vCPU) form the slow tier —
# their physics assertions still run in the full tier (`-m ""`)
_SLOW = {'cest_fit.py', 'spectral_spatial.py', 'qmt_fit.py',
         'traj_optim.py', 'fieldmap_recon.py', 't2map_slice_profile.py'}


def _case(n, a):
    # --coils: the SENSE physics is fast-tier-covered by
    # tests/test_mrf.py; the example composition is slow-tier
    marks = ([pytest.mark.slow]
             if (n in _SLOW or '--mesh' in a or '--coils' in a
                 or 'spiral' in a)
             else [])
    sfx = ('-coarse' if '--coarse' in a
           else '-coils' if '--coils' in a
           else '-spiral' if 'spiral' in a else '')
    return pytest.param(n, a, marks=marks, id=f'{n}{sfx}')


@pytest.mark.parametrize('name,args', [_case(n, a) for n, a in CASES])
def test_example_runs(name, args, monkeypatch):
    monkeypatch.setattr(sys, 'argv', [name] + args)
    try:
        runpy.run_path(str(EX / name), run_name='__main__')
    except SystemExit as e:  # some examples end with sys.exit(0)
        assert e.code in (0, None), e.code
