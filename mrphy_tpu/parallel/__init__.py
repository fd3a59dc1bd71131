r"""Multi-chip scaling: device meshes and spin-sharded simulation."""

from mrphy_tpu.parallel.mesh import (make_mesh, shard_spins,
                                     blochsim_sharded,
                                     blochsim_rfgr_sharded,
                                     rfgr_sharded_traceable, psum_loss,
                                     pad_spins, shard_spin_obj)

__all__ = ['make_mesh', 'shard_spins', 'blochsim_sharded',
           'blochsim_rfgr_sharded', 'rfgr_sharded_traceable', 'psum_loss',
           'pad_spins', 'shard_spin_obj']
