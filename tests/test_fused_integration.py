"""Fused-kernel auto-detection and end-to-end sampling (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import (
    BernoulliLikelihood,
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    Prelu,
    Sigmoid,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.ops.fused_mlp import try_build_fused_main_vg
from tensorbnn_tpu.sampler.potential import flatten_state, make_potentials


def _flat(model, lik):
    params, hypers = model.init(jax.random.key(0))
    return flatten_state(params, hypers, lik.init_hypers())


def test_detection_accepts_flagship_and_rejects_others():
    x = np.zeros((5, 1), np.float32)
    y = np.zeros((5,), np.float32)

    flagship = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                           GaussianDenseLayer(10, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    flat = _flat(flagship, lik)
    assert try_build_fused_main_vg(
        flagship, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, interpret=True) is not None

    # learned-sd Gaussian also matches
    lik2 = GaussianLikelihood(sd=0.1)
    flat2 = _flat(flagship, lik2)
    assert try_build_fused_main_vg(
        flagship, lik2, flat2.unravel_theta, flat2.unravel_eta, x, y,
        eta_dim=flat2.eta.size, interpret=True) is not None

    # Bernoulli -> no
    lik3 = BernoulliLikelihood()
    sig = Sequential([GaussianDenseLayer(1, 4), Sigmoid()])
    flat3 = _flat(sig, lik3)
    assert try_build_fused_main_vg(
        sig, lik3, flat3.unravel_theta, flat3.unravel_eta, x, y,
        eta_dim=max(flat3.eta.size, 1), interpret=True) is None

    # Prelu in the stack -> no (sampled activation params)
    pre = Sequential([GaussianDenseLayer(1, 4), Prelu(4),
                      GaussianDenseLayer(4, 1)])
    flat4 = _flat(pre, lik)
    assert try_build_fused_main_vg(
        pre, lik, flat4.unravel_theta, flat4.unravel_eta, x, y,
        eta_dim=flat4.eta.size, interpret=True) is None


def test_fused_vg_matches_xla_potential():
    """Fused likelihood+XLA prior == the vmapped XLA main_vg."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(11, 1)).astype(np.float32)
    y = rng.normal(size=(11,)).astype(np.float32)
    model = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 1)])
    lik = GaussianLikelihood(sd=0.1)
    flat = _flat(model, lik)

    fused = try_build_fused_main_vg(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=4, interpret=True)
    pots = make_potentials(model, lik, jnp.asarray(x), jnp.asarray(y),
                           flat.unravel_theta, flat.unravel_eta)
    xla_vg = jax.vmap(pots.main_vg)

    c = 4
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))

    lv_f, g_f = fused(thetas, etas)
    lv_x, g_x = xla_vg(thetas, etas)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=1e-3, atol=1e-3)


def test_sampling_with_fused_kernel_runs():
    from tensorbnn_tpu.network import Network
    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=2)
    net.add(GaussianDenseLayer(1, 6)).add(Tanh())
    net.add(GaussianDenseLayer(6, 1))
    net.setup_mcmc(step_size_start=1e-3, leapfrog_start=8, leapfrog_min=4,
                   leapfrog_max=16, burnin=10, averaging_steps=5,
                   hyper_leapfrog=4, random_steps=1)
    res = net.train(30, 4, FixedGaussianLikelihood(sd=0.1), n_chains=4,
                    verbose=False, use_fused=True)
    assert np.isfinite(res.theta_samples).all()
    assert 0 < res.main_accept.mean() <= 1.0
