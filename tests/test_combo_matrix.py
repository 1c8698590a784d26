"""Cross-feature smoke matrix: layer stacks x likelihoods x compute paths.

The targeted oracle tests pin each feature against a reference; this
sweep guards the *combinations* (e.g. Cauchy priors + learned-sd
likelihood + trajectory kernel + multichain) — every cell must sample
finite states with sane acceptance, and the fused paths must agree with
XLA when both apply.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    BernoulliLikelihood,
    CategoricalLikelihood,
    CauchyDenseLayer,
    Elu,
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    LeakyRelu,
    Prelu,
    Relu,
    Sigmoid,
    Softmax,
    SquarePrelu,
    Tanh,
)
from tensorbnn_tpu.network import Network


def _data(kind, n=10, d_in=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    if kind == "binary":
        y = (x.sum(axis=1) > 0).astype(np.float32)
    elif kind == "classes":
        y = rng.integers(0, 3, size=n).astype(np.float32)
    else:
        y = np.sin(x.sum(axis=1)).astype(np.float32)
    return x, y


CASES = [
    # (id, layer stack factory, likelihood, y kind)
    ("gauss-tanh-fixed",
     lambda: [GaussianDenseLayer(2, 6), Tanh(), GaussianDenseLayer(6, 1)],
     FixedGaussianLikelihood(sd=0.1), "reg"),
    ("cauchy-elu-learned",
     lambda: [CauchyDenseLayer(2, 6), Elu(), CauchyDenseLayer(6, 1)],
     GaussianLikelihood(sd=0.2), "reg"),
    ("cauchy-proper-relu-fixed",
     lambda: [CauchyDenseLayer(2, 5, proper=True), Relu(),
              GaussianDenseLayer(5, 1)],
     FixedGaussianLikelihood(sd=0.1), "reg"),
    ("prelu-leaky-learned",
     lambda: [GaussianDenseLayer(2, 5), Prelu(5),
              GaussianDenseLayer(5, 5), LeakyRelu(),
              GaussianDenseLayer(5, 1)],
     GaussianLikelihood(sd=0.2), "reg"),
    ("sqprelu-sigmoid-bern",
     lambda: [GaussianDenseLayer(2, 5), SquarePrelu(5),
              GaussianDenseLayer(5, 1), Sigmoid()],
     BernoulliLikelihood(), "binary"),
    ("cauchy-softmax-categorical",
     lambda: [CauchyDenseLayer(2, 6), Tanh(),
              GaussianDenseLayer(6, 3), Softmax()],
     CategoricalLikelihood(), "classes"),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("use_fused", [False, True],
                         ids=["xla", "fused"])
def test_combo_samples_finite(case, use_fused):
    _, layers, lik, ykind = case
    x, y = _data(ykind)

    net = Network(jnp.float32, 2, x, y, x, y, seed=7)
    for layer in layers():
        net.add(layer)
    net.setup_mcmc(step_size_start=3e-3, step_size_min=1e-3,
                   step_size_max=1e-2, step_size_options=5,
                   leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                   leapfrog_increment=2, hyper_step_size=1e-3,
                   hyper_leapfrog=4, burnin=16, averaging_steps=4,
                   random_steps=2)
    res = net.train(48, 4, lik, n_chains=2, n_adapters=2,
                    chain_jitter=0.02, use_fused=use_fused, verbose=False)

    assert np.all(np.isfinite(res.theta_samples))
    assert np.all(np.isfinite(res.eta_samples))
    acc = res.main_accept.mean()
    assert 0 < acc <= 1.0, acc
    if lik.main_probs_in_hypers or any(
            h for h in res.hyper_samples):
        assert np.all(np.isfinite(res.hyper_accept))


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_combo_fused_matches_xla(case):
    """Where a fused path applies, identical PRNG streams must give the
    same samples as XLA (within float drift); where it doesn't, the
    driver must silently fall back rather than fail."""
    _, layers, lik, ykind = case
    x, y = _data(ykind, seed=1)

    def run(use_fused):
        net = Network(jnp.float32, 2, x, y, x, y, seed=9)
        for layer in layers():
            net.add(layer)
        net.setup_mcmc(step_size_start=3e-3, step_size_min=1e-3,
                       step_size_max=1e-2, step_size_options=5,
                       leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                       leapfrog_increment=2, hyper_step_size=1e-3,
                       hyper_leapfrog=4, burnin=16, averaging_steps=4,
                       random_steps=2)
        return net.train(40, 4, lik, n_chains=2, use_fused=use_fused,
                         verbose=False)

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("use_fused", [False, True],
                         ids=["xla", "fused"])
def test_combo_tempered_samples_finite(case, use_fused):
    """Every stack x likelihood cell again under a 3-rung tempered fleet
    (rungs own the adapter groups), on both compute paths — the fused
    cells run the trajectory kernel's power-posterior program across
    every prior kind and likelihood tail it supports."""
    _, layers, lik, ykind = case
    x, y = _data(ykind)

    net = Network(jnp.float32, 2, x, y, x, y, seed=7)
    for layer in layers():
        net.add(layer)
    net.setup_mcmc(step_size_start=3e-3, step_size_min=1e-3,
                   step_size_max=1e-2, step_size_options=5,
                   leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                   leapfrog_increment=2, hyper_step_size=1e-3,
                   hyper_leapfrog=4, burnin=16, averaging_steps=4,
                   random_steps=2)
    res = net.train(48, 4, lik, n_chains=2, tempering=3,
                    tempering_beta_min=0.1, chain_jitter=0.02,
                    use_fused=use_fused, verbose=False)

    assert res.theta_samples.shape[1] == 2      # cold chains only
    assert np.all(np.isfinite(res.theta_samples))
    assert np.all(np.isfinite(res.eta_samples))
    acc = res.main_accept.mean()
    assert 0 < acc <= 1.0, acc
    assert res.swap_accept is not None
    assert np.all((res.swap_accept >= 0) & (res.swap_accept <= 1))
