r"""T1ρ dispersion quantification of chemical exchange (spin-lock MRI).

An on-resonance spin-lock pulse of amplitude ``ω1`` locks the
magnetization along its own axis; exchange between water and a shifted
solute pool contributes an extra rotating-frame relaxation

.. math:: R_{1\rho}(\omega_1) = R_{2,\mathrm{obs}} +
          \frac{p_a p_b\,\delta\omega^2\,k_{ex}}
               {k_{ex}^2 + \omega_1^2 + \delta\omega^2}

(the on-resonance Trott–Palmer exchange term [Trott & Palmer, JMR
154:157, 2002]; the spin-lock field quenches the exchange contribution
as ``ω1`` grows, so sweeping ``ω1`` — "dispersion" — reads out
``k_ex`` directly, the basis of T1ρ/CEST-SL pH and glycogen imaging).

This example:

1. simulates the spin-lock experiment with the two-pool
   Bloch–McConnell engine (:func:`mrphy_tpu.ops.slowsims.blochsim_mc`,
   exact exchange propagators) — all spin-lock amplitudes batched as
   voxels in ONE call per lock duration;
2. measures ``R1ρ(ω1)`` from two lock durations (ratio method, no
   fit), and checks it against the analytic Trott–Palmer curve;
3. recovers ``k_ex`` from the dispersion by a jitted Adam fit of
   ``(R∞, Φ, k_ex)`` through the closed-form model.

Asserts: sim-vs-analytic ``R1ρ`` within 5 % at every ``ω1`` (≤1 % in
the well-quenched regime), and ``k_ex`` recovered within 10 %.

Run:
    python examples/t1rho_dispersion.py [--dt 2e-5] [--iters 2000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dt', type=float, default=2e-5,
                    help='simulation dwell (s)')
    ap.add_argument('--iters', type=int, default=2000,
                    help='dispersion-fit Adam iterations')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from mrphy_tpu.ops.slowsims import blochsim_mc
    from mrphy_tpu import gamH

    # two-pool system: water (a) + 3 % solute (b) at +200 Hz
    T1a, T2a, T1b, T2b = 1.2, 0.08, 1.0, 0.02
    pb_frac, kex = 0.03, 3000.0
    kab, kba = kex * pb_frac, kex * (1 - pb_frac)
    Ma0, Mb0 = 1.0, pb_frac / (1 - pb_frac)   # detailed balance
    dfb = 200.0
    dw = 2 * np.pi * dfb
    pa = 1.0 / (1.0 + Mb0)
    pb = Mb0 / (1.0 + Mb0)

    f1s = np.asarray([100., 200., 400., 700., 1100., 1600., 2200.])
    w1 = 2 * np.pi * f1s
    b1 = f1s / gamH                            # Gauss
    nF = len(f1s)
    dt = args.dt

    R2obs = pa / T2a + pb / T2b
    rex = pa * pb * dw ** 2 * kex / (kex ** 2 + w1 ** 2 + dw ** 2)
    R_pred = R2obs + rex

    rdt = jnp.zeros(()).dtype

    def lock(t):
        # ideal 90°, then lock along x: Beff = [B1(ω1), 0, 0] for t
        nT = int(round(t / dt))
        Beff = jnp.zeros((1, nF, nT, 3), rdt).at[..., 0].set(
            jnp.asarray(b1, rdt)[None, :, None])
        Ma = jnp.tile(jnp.asarray([Ma0, 0., 0.], rdt), (1, nF, 1))
        Mb = jnp.tile(jnp.asarray([Mb0, 0., 0.], rdt), (1, nF, 1))
        Ma_, Mb_ = blochsim_mc(
            Ma, Mb, Beff, T1a=T1a, T2a=T2a, T1b=T1b, T2b=T2b,
            kab=kab, kba=kba, Ma0=Ma0, Mb0=Mb0, dfb=dfb, dt=dt)
        return np.asarray(Ma_[0, :, 0] + Mb_[0, :, 0])

    t1, t2 = 0.04, 0.12
    R_sim = -np.log(lock(t2) / lock(t1)) / (t2 - t1)

    rel = np.abs(R_sim - R_pred) / R_pred
    print('   f1/Hz   R1rho pred   R1rho sim     rel')
    for f, rp, rs, e in zip(f1s, R_pred, R_sim, rel):
        print(f'  {f:6.0f}   {rp:10.2f}   {rs:9.2f}   {e:6.2%}')

    # dispersion fit: R(ω1) = R∞ + Φ k / (k² + ω1² + δω²), jitted Adam
    # (δω known — the solute shift; log-k parametrization keeps k > 0)
    w1j = jnp.asarray(w1, rdt)
    Rj = jnp.asarray(R_sim, rdt)

    def model(p):
        k = jnp.exp(p[2])
        return p[0] + p[1] * 1e4 * k / (k * k + w1j ** 2 + dw ** 2)

    def loss_fn(p):
        return jnp.sum((model(p) - Rj) ** 2)

    opt = optax.adam(3e-2)

    @jax.jit
    def fit(p):
        st = opt.init(p)

        def body(carry, _):
            p, st = carry
            val, g = jax.value_and_grad(loss_fn)(p)
            upd, st = opt.update(g, st)
            return (p + upd, st), val

        (p, _), ls = jax.lax.scan(body, (p, st), None, length=args.iters)
        return p, ls

    p0 = jnp.asarray([10.0, 1.0, np.log(1500.0)], rdt)
    p, losses = fit(p0)
    kex_hat = float(jnp.exp(p[2]))
    kerr = abs(kex_hat - kex) / kex
    print(f'  fit: loss {float(losses[0]):.3f} -> {float(losses[-1]):.2e}'
          f'   k_ex = {kex_hat:.0f} /s (true {kex:.0f}, {kerr:.2%})')

    assert rel.max() < 0.05, rel
    assert rel[-2:].max() < 0.01, rel     # well-quenched regime
    assert kerr < 0.10, kex_hat
    print('t1rho_dispersion: OK')


if __name__ == '__main__':
    main()
