r"""Shared physics test scenario.

The canonical scenario of the reference tests
(`/root/reference/tests/test_slowsims.py:27-62`): 512-step cos/sin RF with
a single coil, unit x-gradient cancelling a linear off-resonance map, atan
z-gradient; golden magnetization values are physics facts independent of
framework.
"""

import numpy as np
import jax.numpy as jnp

from mrphy_tpu import gamH, dt0, pi


def pulse_arrays(nM=3, nT=512, dtype=jnp.float64):
    gam = jnp.asarray(gamH, dtype)
    dt = jnp.asarray(dt0, dtype)
    N = 1

    loc_x = jnp.linspace(-1., 1., nM, dtype=dtype).reshape(N, nM)
    loc_y = jnp.linspace(-1., 1., nM, dtype=dtype).reshape(N, nM)
    loc_z = jnp.ones((N, nM), dtype)
    loc = jnp.stack([loc_x, loc_y, loc_z], 2)          # (1, nM, xyz)

    df = -loc_x * gam                                  # gr_x==1 cancels df
    b1Map = jnp.asarray([1., 0.], dtype).reshape(N, 1, 2, 1)

    t = jnp.arange(nT, dtype=dtype).reshape(N, 1, nT)
    rf = 10 * jnp.concatenate([jnp.cos(t / nT * 2 * pi),
                               jnp.sin(t / nT * 2 * pi)], 1)[..., None]
    gr = jnp.concatenate([jnp.ones((N, 1, nT), dtype),
                          jnp.zeros((N, 1, nT), dtype),
                          10 * jnp.arctan(t - round(nT / 2)) / pi], 1)
    return dict(gam=gam, dt=dt, loc=loc, df=df, b1Map=b1Map, rf=rf, gr=gr)


# Golden values (physics facts; same constants as
# /root/reference/tests/test_slowsims.py:77-80 and test_mobjs.py:112-120)
MO_GOLD_RELAX = np.array(
    [[[0.559535641648385, 0.663342640621335, 0.416341441715101],
      [0.391994737048090, 0.210182892388552, -0.860954821972489],
      [-0.677062008711222, 0.673391604920576, -0.143262993311057]]])

MO_GOLD_NORELAX = np.array(
    [[[0.584337330324116, 0.686096989146395, 0.433382978292808],
      [0.404188676945936, 0.217027890590635, -0.888555236400348],
      [-0.703691265981316, 0.694384487290747, -0.150495136106067]]])

FREEPREC_GOLD = np.array(
    [[[0., -0.5, 0.5], [-0.5, 0., 0.5], [0., 0., 1.]]])
