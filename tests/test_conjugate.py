"""Exact-posterior validation on a conjugate model.

A single dense layer with no activation under a fixed-sd Gaussian
likelihood and fixed hypers is Bayesian linear regression: with prior
w ~ N(mu0, tau^2 I) (the reference-exact layer prior at fixed hypers is
proportional to an iid Gaussian; the normalization constant doesn't affect
the posterior) and likelihood y ~ N(Xw, sigma^2 I), the posterior is
Gaussian with precision A = X^T X / sigma^2 + I/tau^2 and mean
A^{-1} (X^T y / sigma^2 + mu0/tau^2). The sampler's draws must recover the
analytic mean and marginal sds — a correctness check no amount of
reference parity provides.
"""

import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer
from tensorbnn_tpu.network import Network


def test_sampler_recovers_conjugate_posterior():
    rng = np.random.default_rng(0)
    n, d = 40, 3
    sigma = 0.3
    x = rng.normal(size=(n, d)).astype(np.float32)
    w_true = np.asarray([0.5, -1.0, 0.8], np.float32)
    y = x @ w_true + sigma * rng.normal(size=n).astype(np.float32)

    # GaussianDenseLayer prior at init hypers: loc 0, sd = 1**2 = 1
    tau = 1.0

    net = Network(jnp.float32, d, x, y, x, y, seed=4)
    net.add(GaussianDenseLayer(d, 1))
    net.setup_mcmc(step_size_start=5e-2, step_size_min=1e-2,
                   step_size_max=2e-1, step_size_options=20,
                   leapfrog_start=12, leapfrog_min=4, leapfrog_max=24,
                   leapfrog_increment=2, hyper_step_size=1e-3,
                   hyper_leapfrog=5, burnin=300, averaging_steps=10,
                   random_steps=4)
    res = net.train(2300, 2, FixedGaussianLikelihood(sd=sigma),
                    adjust_hypers=False, n_chains=8, chain_jitter=0.3,
                    verbose=False)

    # analytic posterior over [w; b] with design [X, 1]
    xb = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)
    a = xb.T @ xb / sigma ** 2 + np.eye(d + 1) / tau ** 2
    cov = np.linalg.inv(a)
    mean = cov @ (xb.T @ y / sigma ** 2)

    # samples: flat layout is [b, w] (ravel_pytree sorts dict keys)
    pooled = res.theta_pooled  # (S*C, d+1)
    assert pooled.shape[0] >= 4000
    got_b = pooled[:, 0]
    got_w = pooled[:, 1:]

    got_mean = np.concatenate([got_w.mean(axis=0), [got_b.mean()]])
    got_sd = np.concatenate([got_w.std(axis=0), [got_b.std()]])
    want_sd = np.sqrt(np.diag(cov))

    np.testing.assert_allclose(got_mean, mean, atol=0.05)
    np.testing.assert_allclose(got_sd, want_sd, rtol=0.25)


def test_acceptance_exact_on_gaussian_target():
    """With the conjugate (quadratic) target, leapfrog energy errors are
    tiny and acceptance should be near 1 at small step sizes."""
    rng = np.random.default_rng(1)
    n, d = 20, 2
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (x @ np.asarray([1.0, -0.5], np.float32)).astype(np.float32)

    net = Network(jnp.float32, d, x, y, x, y, seed=5)
    net.add(GaussianDenseLayer(d, 1))
    net.setup_mcmc(step_size_start=1e-2, step_size_min=5e-3,
                   step_size_max=2e-2, step_size_options=10,
                   leapfrog_start=10, leapfrog_min=5, leapfrog_max=20,
                   leapfrog_increment=5, burnin=40, averaging_steps=10,
                   random_steps=2, hyper_leapfrog=5)
    res = net.train(120, 5, FixedGaussianLikelihood(sd=0.2),
                    adjust_hypers=False, verbose=False)
    assert res.main_accept.mean() > 0.95


def test_conjugate_posterior_with_adapter_groups():
    """The per-chain-group (eps, L) path (n_adapters) must sample the same
    posterior: chain groups on different trajectories still recover the
    analytic conjugate mean/sd — correctness of the mask-frozen wave-front
    integrator in situ, not just against the XLA oracle."""
    rng = np.random.default_rng(2)
    n, d = 40, 3
    sigma = 0.3
    x = rng.normal(size=(n, d)).astype(np.float32)
    w_true = np.asarray([0.5, -1.0, 0.8], np.float32)
    y = x @ w_true + sigma * rng.normal(size=n).astype(np.float32)
    tau = 1.0

    net = Network(jnp.float32, d, x, y, x, y, seed=6)
    net.add(GaussianDenseLayer(d, 1))
    net.setup_mcmc(step_size_start=5e-2, step_size_min=1e-2,
                   step_size_max=2e-1, step_size_options=20,
                   leapfrog_start=12, leapfrog_min=4, leapfrog_max=24,
                   leapfrog_increment=2, hyper_step_size=1e-3,
                   hyper_leapfrog=5, burnin=300, averaging_steps=10,
                   random_steps=4)
    res = net.train(2300, 2, FixedGaussianLikelihood(sd=sigma),
                    adjust_hypers=False, n_chains=8, n_adapters=4,
                    chain_jitter=0.3, verbose=False)

    xb = np.concatenate([x, np.ones((n, 1), np.float32)], axis=1)
    a = xb.T @ xb / sigma ** 2 + np.eye(d + 1) / tau ** 2
    cov = np.linalg.inv(a)
    mean = cov @ (xb.T @ y / sigma ** 2)

    pooled = res.theta_pooled
    got_b = pooled[:, 0]
    got_w = pooled[:, 1:]
    got_mean = np.concatenate([got_w.mean(axis=0), [got_b.mean()]])
    got_sd = np.concatenate([got_w.std(axis=0), [got_b.std()]])
    want_sd = np.sqrt(np.diag(cov))

    np.testing.assert_allclose(got_mean, mean, atol=0.05)
    np.testing.assert_allclose(got_sd, want_sd, rtol=0.25)
