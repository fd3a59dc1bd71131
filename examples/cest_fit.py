r"""CEST quantification: fit per-voxel exchange-rate and B0 maps by
gradient descent through the fused two-pool Bloch–McConnell engine.

The inverse problem behind APT/CEST imaging: given measured Z-spectra
Z(Δ) per voxel, recover the solute exchange rate ``kab`` (the contrast
of interest — it tracks pH and metabolite concentration) and the B0
offset ``df0`` (which shifts every spectrum and must be fit jointly or
it biases kab). The forward model is :func:`mrphy_tpu.ops.mc.
blochsim_mc_rfgr` — the fused waveform engine whose ``custom_vjp``
differentiates w.r.t. the tissue/exchange maps — so the fit is plain
Adam through the simulator, one jitted ``lax.scan`` over iterations.

TPU-shaped: all (voxel, offset) pairs live on the spin axis — one
engine call simulates every voxel's full Z-spectrum; per-voxel
parameters broadcast over the offset axis by construction. Whole-brain
scale is the same call with more voxels (see ``--mesh`` for multi-chip
voxel sharding; ``benchmarks/suite.py cest`` for the 512k-voxel
throughput).

Beyond-reference workload (the reference is single-pool and its fast
engine is not differentiable w.r.t. tissue parameters —
``/root/reference/mrphy/sims.py:149-150``).

Usage::

    python examples/cest_fit.py [--nvox 48] [--iters 400] [--noise 0.0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nvox', type=int, default=48)
    ap.add_argument('--noffsets', type=int, default=25)
    ap.add_argument('--iters', type=int, default=400)
    ap.add_argument('--lr', type=float, default=0.05)
    ap.add_argument('--noise', type=float, default=0.0,
                    help='Z-spectrum noise stddev')
    ap.add_argument('--b1', type=float, nargs='+',
                    default=[0.002, 0.006],
                    help='saturation amplitude(s), Gauss — two powers '
                         'disentangle kab from the pool size (QUESP '
                         'logic: the CEST dip saturates with B1 at a '
                         'rate set by the exchange rate)')
    ap.add_argument('--tsat', type=float, default=1.0)
    ap.add_argument('--mesh', action='store_true',
                    help='shard the (voxel, offset) axis over all '
                         'devices (shard_map)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops import mc

    mesh = None
    if args.mesh:
        from mrphy_tpu.parallel import make_mesh
        mesh = make_mesh()
        print(f'voxel-sharded over {len(jax.devices())} devices '
              f'({mesh.shape})')

    f32 = jnp.float32
    nV, nF = args.nvox, args.noffsets
    if mesh is not None:
        from mrphy_tpu.parallel.mesh import SPIN_AXIS
        sp = mesh.shape[SPIN_AXIS]
        assert (nV * nF) % sp == 0, (
            f'nvox*noffsets = {nV * nF} must divide the mesh spin '
            f'extent {sp}')
    rng = np.random.default_rng(11)

    # ground truth: amide-like solute pool, heterogeneous kab + B0 map
    T1a, T2a, T1b, T2b = 1.4, 0.08, 1.0, 0.01
    Ma0, Mb0, dfb = 1.0, 0.015, 750.0
    kab_true = jnp.asarray(rng.uniform(0.8, 4.0, nV), f32)
    df0_true = jnp.asarray(rng.uniform(-30.0, 30.0, nV), f32)

    offsets = jnp.asarray(np.linspace(-1.6 * dfb, 1.6 * dfb, nF), f32)
    dt = 5e-4
    nT = int(round(args.tsat / dt))
    # batch axis = saturation powers: one engine call simulates every
    # (power, voxel, offset) triple
    nP = len(args.b1)
    rf = jnp.stack([jnp.broadcast_to(
        jnp.asarray([b1, 0.0], f32)[:, None], (2, nT))
        for b1 in args.b1])                                # (nP, 2, nT)
    gr = jnp.zeros((nP, 3, nT), f32)

    # (voxel, offset) pairs on the spin axis: nM = nV*nF
    nM = nV * nF
    loc = jnp.zeros((nP, nM, 3), f32)
    Mia = jnp.broadcast_to(jnp.asarray([0., 0., Ma0], f32), (nP, nM, 3))
    Mib = jnp.broadcast_to(jnp.asarray([0., 0., Mb0], f32), (nP, nM, 3))
    off_pair = jnp.tile(offsets, nV)                       # (nM,)

    def zspectra(kab_v, df0_v):
        r"""(nV,), (nV,) → (nP, nV, nF) water-z Z-spectra."""
        kab = jnp.repeat(kab_v, nF)[None]                  # (1, nM)
        # detailed balance ties kba to the fitted kab
        kba = kab * (Ma0 / Mb0)
        df = (jnp.repeat(df0_v, nF) - off_pair)[None]      # (1, nM)
        Ma, _ = mc.blochsim_mc_rfgr(
            Mia, Mib, rf, gr, loc, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
            kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb, df=df,
            dt=dt, mesh=mesh)
        return Ma[:, :, 2].reshape(nP, nV, nF) / Ma0

    Zdata = zspectra(kab_true, df0_true)
    if args.noise:
        Zdata = Zdata + args.noise * jnp.asarray(
            rng.standard_normal((nP, nV, nF)), f32)

    # fit log-kab (positivity) + df0 by Adam through the simulator.
    # df0 is parametrized in units of DF_SCALE Hz so one Adam step moves
    # it O(lr·DF_SCALE) — unscaled, a ±30 Hz B0 error would need
    # thousands of iterations at lr=0.05.
    DF_SCALE = 20.0
    params0 = {'logk': jnp.zeros(nV, f32),                 # kab init 1.0
               'dfs': jnp.zeros(nV, f32)}

    def loss_fn(p):
        Z = zspectra(jnp.exp(p['logk']), DF_SCALE * p['dfs'])
        return jnp.mean((Z - Zdata) ** 2)

    opt = optax.adam(args.lr)

    @jax.jit
    def fit(p):
        st = opt.init(p)

        def step(carry, _):
            p, st = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            up, st = opt.update(g, st)
            return (optax.apply_updates(p, up), st), l

        (p, _), ls = jax.lax.scan(step, (p, st), None, length=args.iters)
        return p, ls

    p, losses = fit(params0)
    kab_fit = np.asarray(jnp.exp(p['logk']))
    df0_fit = np.asarray(DF_SCALE * p['dfs'])
    l0, l1 = float(losses[0]), float(losses[-1])
    kerr = float(np.max(np.abs(kab_fit - np.asarray(kab_true))
                        / np.asarray(kab_true)))
    ferr = float(np.max(np.abs(df0_fit - np.asarray(df0_true))))

    print(f'fit {nV} voxels x {nF} offsets x {nP} powers (nT={nT}, '
          f'{args.iters} Adam iters)')
    print(f'loss: {l0:.2e} -> {l1:.2e}')
    print(f'kab:  max rel err {kerr * 100:.2f}%')
    print(f'df0:  max abs err {ferr:.2f} Hz')
    assert l1 < l0 * 0.1, (l0, l1)
    if not args.noise:
        assert kerr < 0.05, kerr
        assert ferr < 2.0, ferr
    print('OK')


if __name__ == '__main__':
    main()
