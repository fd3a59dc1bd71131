r"""Direct numerical parity against the reference implementation.

Runs the actual PyTorch reference (read-only at /root/reference) side by
side with this framework on identical random inputs and compares outputs
and gradients at 1e-9 (f64) — stronger evidence than the shared golden
constants. Skipped when the reference or torch is unavailable.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrphy_tpu import dt0, gamH
from mrphy_tpu.ops import beffective, sims
from mrphy_tpu import utils

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')
mrphy_ref = pytest.importorskip('mrphy')

DTYPE = jnp.float64
ATOL = 1e-9
TKW = {'dtype': torch.float64}


def _t(x):
    return torch.tensor(np.asarray(x), **TKW)


@pytest.fixture(scope='module')
def scenario():
    rng = np.random.default_rng(42)
    nM, nT, nC = 24, 96, 2
    return dict(
        M0=rng.random((1, nM, 3)),
        loc=rng.random((1, nM, 3)) * 2 - 1,
        df=rng.normal(size=(1, nM)) * 40,
        b1=rng.normal(size=(1, nM, 2, nC)) * 0.3 + 0.5,
        rf=rng.random((1, 2, nT, nC)),
        gr=rng.normal(size=(1, 3, nT)),
        T1=[[1.0]], T2=[[4e-2]],
    )


class TestReferenceParity:

    def test_utils_conversions(self, scenario):
        g = scenario['gr']
        dt = _t(dt0)
        gam = _t(gamH)
        k_ref = mrphy_ref.utils.g2k(_t(g), True, dt=dt, γ=gam).numpy()
        k_jax = utils.g2k(jnp.asarray(g, DTYPE), True,
                          dt=jnp.asarray(dt0, DTYPE), gam=gamH)
        np.testing.assert_allclose(k_jax, k_ref, atol=ATOL)

        s_ref = mrphy_ref.utils.g2s(_t(g), dt=dt).numpy()
        np.testing.assert_allclose(
            utils.g2s(jnp.asarray(g, DTYPE), jnp.asarray(dt0, DTYPE)),
            s_ref, atol=ATOL)

    def test_rf_reparametrizations(self, scenario):
        rf = scenario['rf'][..., 0]
        rfmax = 2.0
        rf_c = utils.rfclamp(jnp.asarray(rf, DTYPE), rfmax)
        rf_c_ref = mrphy_ref.utils.rfclamp(_t(rf), _t(rfmax)).numpy()
        np.testing.assert_allclose(rf_c, rf_c_ref, atol=ATOL)

        trho, theta = utils.rf2trho_theta(rf_c, rfmax)
        trho_ref, theta_ref = mrphy_ref.utils.rf2tρθ(_t(np.asarray(rf_c)),
                                                     _t(rfmax))
        np.testing.assert_allclose(trho, trho_ref.numpy(), atol=1e-8)
        np.testing.assert_allclose(theta, theta_ref.numpy(), atol=ATOL)

    def test_rfgr2beff(self, scenario):
        sc = scenario
        beff_ref = mrphy_ref.beffective.rfgr2beff(
            _t(sc['rf']), _t(sc['gr']), _t(sc['loc']), Δf=_t(sc['df']),
            b1Map=_t(sc['b1']), γ=_t(gamH)).numpy()
        beff_jax = beffective.rfgr2beff(
            jnp.asarray(sc['rf'], DTYPE), jnp.asarray(sc['gr'], DTYPE),
            jnp.asarray(sc['loc'], DTYPE), df=jnp.asarray(sc['df'], DTYPE),
            b1Map=jnp.asarray(sc['b1'], DTYPE), gam=gamH)
        np.testing.assert_allclose(beff_jax, beff_ref, atol=ATOL)

    def test_blochsim_forward_and_grads(self, scenario):
        sc = scenario
        # reference forward + grads through its explicit-Jacobian engine
        beff_t = mrphy_ref.beffective.rfgr2beff(
            _t(sc['rf']), _t(sc['gr']), _t(sc['loc']), Δf=_t(sc['df']),
            b1Map=_t(sc['b1']), γ=_t(gamH))
        M0_t = _t(sc['M0']).requires_grad_(True)
        beff_t = beff_t.detach().requires_grad_(True)
        Mo_t = mrphy_ref.sims.blochsim(M0_t, beff_t, T1=_t(sc['T1']),
                                       T2=_t(sc['T2']), γ=_t(gamH),
                                       dt=_t(dt0))
        torch.sum(Mo_t ** 2).backward()

        # ours, same inputs
        beff_j = jnp.asarray(beff_t.detach().numpy(), DTYPE)
        M0_j = jnp.asarray(sc['M0'], DTYPE)
        T1 = jnp.asarray(sc['T1'], DTYPE)
        T2 = jnp.asarray(sc['T2'], DTYPE)
        Mo_j = sims.blochsim(M0_j, beff_j, T1=T1, T2=T2, gam=gamH, dt=dt0,
                             backend='xla')
        np.testing.assert_allclose(Mo_j, Mo_t.detach().numpy(), atol=ATOL)

        g_j = jax.grad(lambda m, b: jnp.sum(sims.blochsim(
            m, b, T1=T1, T2=T2, gam=gamH, dt=dt0, backend='xla') ** 2),
            argnums=(0, 1))(M0_j, beff_j)
        np.testing.assert_allclose(g_j[0], M0_t.grad.numpy(), atol=ATOL)
        np.testing.assert_allclose(g_j[1], beff_t.grad.numpy(), atol=ATOL)

    def test_blochsim_rfgr_grads_vs_reference_chain(self, scenario):
        r"""Our fused waveform engine's rf/gr gradients equal the
        reference's autodiff chain rfgr2beff → blochsim."""
        sc = scenario
        rf_t = _t(sc['rf']).requires_grad_(True)
        gr_t = _t(sc['gr']).requires_grad_(True)
        beff_t = mrphy_ref.beffective.rfgr2beff(
            rf_t, gr_t, _t(sc['loc']), Δf=_t(sc['df']),
            b1Map=_t(sc['b1']), γ=_t(gamH))
        Mo_t = mrphy_ref.sims.blochsim(_t(sc['M0']), beff_t,
                                       T1=_t(sc['T1']), T2=_t(sc['T2']),
                                       γ=_t(gamH), dt=_t(dt0))
        torch.sum(Mo_t ** 2).backward()

        g_j = jax.grad(lambda r, g: jnp.sum(sims.blochsim_rfgr(
            jnp.asarray(sc['M0'], DTYPE), r, g,
            jnp.asarray(sc['loc'], DTYPE),
            T1=jnp.asarray(sc['T1'], DTYPE),
            T2=jnp.asarray(sc['T2'], DTYPE),
            df=jnp.asarray(sc['df'], DTYPE),
            b1Map=jnp.asarray(sc['b1'], DTYPE), gam=gamH, dt=dt0) ** 2),
            argnums=(0, 1))(jnp.asarray(sc['rf'], DTYPE),
                            jnp.asarray(sc['gr'], DTYPE))
        np.testing.assert_allclose(g_j[0], rf_t.grad.numpy(), atol=ATOL)
        np.testing.assert_allclose(g_j[1], gr_t.grad.numpy(), atol=ATOL)

    def test_freeprec(self, scenario):
        sc = scenario
        dur = 0.37
        Mo_ref = mrphy_ref.sims.freeprec(
            _t(sc['M0']), _t(dur), T1=_t(sc['T1']), T2=_t(sc['T2']),
            Δf=_t(sc['df'])).detach().numpy()
        Mo_j = sims.freeprec(jnp.asarray(sc['M0'], DTYPE),
                             jnp.asarray(dur, DTYPE),
                             T1=jnp.asarray(sc['T1'], DTYPE),
                             T2=jnp.asarray(sc['T2'], DTYPE),
                             df=jnp.asarray(sc['df'], DTYPE))
        np.testing.assert_allclose(Mo_j, Mo_ref, atol=ATOL)

    def test_beff2ab(self, scenario):
        sc = scenario
        beff = np.asarray(beffective.rfgr2beff(
            jnp.asarray(sc['rf'], DTYPE), jnp.asarray(sc['gr'], DTYPE),
            jnp.asarray(sc['loc'], DTYPE), gam=gamH))
        E1_t = torch.exp(-_t(dt0) / _t(sc['T1']))
        E2_t = torch.exp(-_t(dt0) / _t(sc['T2']))
        A_ref, B_ref = mrphy_ref.beffective.beff2ab(
            _t(beff), E1=E1_t, E2=E2_t, γ=_t(gamH), dt=_t(dt0))
        E1 = jnp.exp(-dt0 / jnp.asarray(sc['T1'], DTYPE))
        E2 = jnp.exp(-dt0 / jnp.asarray(sc['T2'], DTYPE))
        A, B = beffective.beff2ab(jnp.asarray(beff, DTYPE), E1=E1, E2=E2,
                                  gam=gamH, dt=dt0)
        np.testing.assert_allclose(A, A_ref.numpy(), atol=ATOL)
        np.testing.assert_allclose(B, B_ref.numpy(), atol=ATOL)
