"""Statistical validation (stage-8 parity milestone, SURVEY.md #7).

The TF reference cannot run in this image (no tensorflow_probability), so
parity is statistical (SURVEY.md #2.3.8): the posterior predictive must fit
the bundled regression target near the likelihood noise floor, acceptance
rates must sit in a healthy band, chains must mix (R-hat near 1), and the
hyper chain must adapt toward its 0.95 dual-averaging target.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, Tanh
from tensorbnn_tpu.network import Network
from tensorbnn_tpu.utils.diagnostics import multichain_ess, split_rhat


def trig(x):
    return np.sin(x * math.pi * 2) * x - np.cos(x * math.pi)


@pytest.fixture(scope="module")
def posterior_run():
    # denser 31-point design (as in extendedRegression) so the posterior
    # noise floor is identifiable in a short run
    train_in = np.linspace(-2, 2, num=31)
    net = Network(jnp.float32, 1, train_in, trig(train_in),
                  train_in, trig(train_in), seed=7)
    net.add(GaussianDenseLayer(1, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 1))
    net.setup_mcmc(step_size_start=1e-3, step_size_min=1e-4,
                   step_size_max=1e-2, step_size_options=40,
                   leapfrog_start=100, leapfrog_min=20, leapfrog_max=400,
                   leapfrog_increment=5, hyper_step_size=1e-3,
                   hyper_leapfrog=30, burnin=300, averaging_steps=10,
                   random_steps=5)
    result = net.train(900, 10, FixedGaussianLikelihood(sd=0.1),
                       n_chains=4, chain_jitter=0.02, verbose=False)
    return net, result, train_in


def test_posterior_fits_near_noise_floor(posterior_run):
    net, result, train_in = posterior_run
    x = jnp.asarray(train_in[:, None], jnp.float32)
    target = trig(train_in)

    # posterior-mean prediction over all pooled samples
    import jax
    from tensorbnn_tpu.sampler.potential import flatten_state
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers, {})
    pooled = jnp.asarray(result.theta_pooled)
    preds = jax.vmap(
        lambda th: net.model.apply(flat.unravel_theta(th), x))(pooled)
    mean = np.asarray(preds).mean(axis=0)[:, 0]
    rmse = float(np.sqrt(np.mean((mean - target) ** 2)))
    # the likelihood sd is 0.1; the posterior mean should fit to ~that level
    assert rmse < 0.25, rmse

    # predictive spread is non-degenerate (a real posterior, not a point)
    sd = np.asarray(preds).std(axis=0).mean()
    assert sd > 1e-3


def test_acceptance_rates_healthy(posterior_run):
    _, result, _ = posterior_run
    main_acc = result.main_accept[300:].mean()
    hyper_acc = result.hyper_accept[300:].mean()
    assert 0.2 < main_acc <= 1.0, main_acc
    # dual averaging drives the hyper chain toward 0.95
    # (reference network.py:241)
    assert abs(hyper_acc - 0.95) < 0.15, hyper_acc


def test_chains_mix(posterior_run):
    _, result, _ = posterior_run
    # R-hat on the flat state coordinates: use a stable scalar summary
    # (the per-draw state norm) to avoid per-weight multimodality
    summary = np.linalg.norm(result.theta_samples, axis=-1)  # (S, C)
    rhat = split_rhat(summary)
    assert rhat < 1.6, rhat  # generous: short chains, multimodal posterior
    ess = multichain_ess(summary[:, :, None])
    assert ess > 8, ess
