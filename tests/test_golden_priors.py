"""Golden-value tests for trainable-activation priors and likelihoods
against NumPy oracles of the reference math (SURVEY.md #4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    BernoulliLikelihood,
    FixedGaussianLikelihood,
    GaussianLikelihood,
    Prelu,
    SquarePrelu,
)
from tests.test_distributions import ref_multivariate_log_prob


def _normal_logpdf(x, loc, scale):
    return (-0.5 * ((x - loc) / scale) ** 2
            - math.log(scale) - 0.5 * math.log(2 * math.pi))


def test_prelu_priors_golden():
    """Prelu: exponential(rate) prior over slopes; exponential(0.3)
    hyperprior over the rate; |slopes| in the hyper conditional
    (reference activationFunctions.py:161-220)."""
    layer = Prelu(in_dim=3, alpha=0.2)
    params = {"slopes": jnp.asarray([0.5, -0.1, 0.3])}
    hypers = {"rate": jnp.asarray(0.4)}

    got = float(layer.log_prior(hypers, params))
    want = sum(-0.4 * s + math.log(0.4) for s in [0.5, -0.1, 0.3])
    assert got == pytest.approx(want, rel=1e-5)

    got_h = float(layer.log_hyper_prior(hypers, params))
    want_h = -0.3 * 0.4 + math.log(0.3)
    want_h += sum(-0.4 * abs(s) + math.log(0.4) for s in [0.5, -0.1, 0.3])
    assert got_h == pytest.approx(want_h, rel=1e-5)


def test_squareprelu_priors_golden():
    """SquarePrelu: Gaussian prior over raw slopes in the main chain but
    over squared slopes in the hyper chain; N(0,.3)/N(.3,.1) hyperpriors
    (reference activationFunctions.py:329-382)."""
    layer = SquarePrelu(in_dim=2, alpha=0.2)
    slopes = np.asarray([0.6, -0.4], np.float32)
    params = {"slopes": jnp.asarray(slopes)}
    hypers = {"loc": jnp.asarray(0.1), "scale": jnp.asarray(0.5)}

    got = float(layer.log_prior(hypers, params))
    want = ref_multivariate_log_prob(0.5, 0.1, slopes)
    assert got == pytest.approx(want, rel=1e-4)

    got_h = float(layer.log_hyper_prior(hypers, params))
    want_h = ref_multivariate_log_prob(0.5, 0.1, slopes ** 2)
    want_h += _normal_logpdf(0.1, 0.0, 0.3)
    want_h += _normal_logpdf(0.5, 0.3, 0.1)
    assert got_h == pytest.approx(want_h, rel=1e-4)


def test_gaussian_likelihood_squared_sd_golden():
    """GaussianLikelihood: effective sd = sd_root**2, initialized at
    sqrt(sd) (reference likelihood.py:66, 88)."""
    lik = GaussianLikelihood(sd=0.1)
    h = lik.init_hypers()
    assert float(h["sd_root"]) == pytest.approx(math.sqrt(0.1), rel=1e-6)

    preds = np.asarray([[0.5], [1.0]], np.float32)
    y = np.asarray([0.4, 1.3], np.float32)
    got = float(lik.log_likelihood(jnp.asarray(preds), jnp.asarray(y), h))
    sd = math.sqrt(0.1) ** 2
    want = ref_multivariate_log_prob(np.full_like(preds, sd), preds,
                                     y.reshape(2, 1))
    assert got == pytest.approx(want, rel=1e-4)


def test_fixed_gaussian_uses_sd_directly():
    lik = FixedGaussianLikelihood(sd=0.2)
    preds = np.asarray([[0.0]], np.float32)
    y = np.asarray([0.3], np.float32)
    got = float(lik.log_likelihood(jnp.asarray(preds), jnp.asarray(y), {}))
    want = ref_multivariate_log_prob(np.asarray([[0.2]]), preds,
                                     y.reshape(1, 1))
    assert got == pytest.approx(want, rel=1e-4)


def test_bernoulli_likelihood_golden():
    lik = BernoulliLikelihood()
    p = np.asarray([[0.8], [0.3]], np.float32)
    y = np.asarray([1.0, 0.0], np.float32)
    got = float(lik.log_likelihood(jnp.asarray(p), jnp.asarray(y), {}))
    want = math.log(0.8) + math.log(0.7)
    assert got == pytest.approx(want, rel=1e-5)


def test_hyper_chain_excludes_likelihood_when_fixed():
    """FixedGaussianLikelihood has mainProbsInHypers=False: the hyper
    target must not include the data term (reference network.py:435-438)."""
    from tensorbnn_tpu import GaussianDenseLayer
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.sampler.potential import flatten_state, \
        make_potentials

    model = Sequential([GaussianDenseLayer(1, 1)])
    params, hypers = model.init(jax.random.key(0))
    x = jnp.zeros((4, 1))
    y = jnp.zeros((4,))

    fixed = FixedGaussianLikelihood(sd=0.1)
    flat = flatten_state(params, hypers, fixed.init_hypers())
    pots = make_potentials(model, fixed, x, y, flat.unravel_theta,
                           flat.unravel_eta)
    want = float(model.log_hyper_prior(hypers, params))
    got = float(pots.hyper(flat.eta, flat.theta))
    assert got == pytest.approx(want, rel=1e-5)

    learned = GaussianLikelihood(sd=0.1)
    flat2 = flatten_state(params, hypers, learned.init_hypers())
    pots2 = make_potentials(model, learned, x, y, flat2.unravel_theta,
                            flat2.unravel_eta)
    got2 = float(pots2.hyper(flat2.eta, flat2.theta))
    assert got2 != pytest.approx(want, rel=1e-3)  # includes the data term
