"""Unit tests for the log-prob primitives vs scipy and a NumPy oracle of the
reference math (SURVEY.md #4 test strategy)."""

import math

import numpy as np
import pytest
import scipy.stats

from tensorbnn_tpu import distributions as d


def ref_multivariate_log_prob(sigma, mu, x):
    """NumPy oracle re-deriving reference BNN_functions.py:7-34."""
    sigma = np.clip(np.asarray(sigma, np.float64), 1e-8, 1e8)
    log_det = 2.0 * np.sum(np.log(sigma))
    k = sigma.size
    dif = (np.asarray(x, np.float64) - mu) / sigma
    return -0.5 * (log_det + np.sum(dif * dif) + k * math.log(2 * math.pi))


def test_gaussian_scalar_sigma_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5)).astype(np.float32)
    got = float(d.gaussian_logprob(0.7, 0.1, x))
    want = ref_multivariate_log_prob(0.7, 0.1, x)
    assert got == pytest.approx(want, rel=1e-5)


def test_gaussian_broadcast_sigma_is_proper_product_density():
    """With sigma broadcast to x.shape the reference formula equals the sum
    of independent normal log-pdfs — the likelihood call site."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(11, 1)).astype(np.float32)
    mu = rng.normal(size=(11, 1)).astype(np.float32)
    sd = 0.1
    got = float(d.gaussian_logprob(np.full_like(x, sd), mu, x))
    want = scipy.stats.norm(mu, sd).logpdf(x).sum()
    assert got == pytest.approx(want, rel=1e-4)


def test_gaussian_sigma_clamping():
    x = np.array([1.0], np.float32)
    tiny = float(d.gaussian_logprob(0.0, 0.0, x))
    clamped = ref_multivariate_log_prob(1e-8, 0.0, x)
    assert tiny == pytest.approx(clamped, rel=1e-5)


def test_normal_logprob_vs_scipy():
    x = np.linspace(-3, 3, 13)
    got = np.asarray(d.normal_logprob(x, 0.5, 0.1))
    want = scipy.stats.norm(0.5, 0.1).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cauchy_logprob_vs_scipy():
    x = np.linspace(-5, 5, 17)
    got = np.asarray(d.cauchy_logprob(0.7, 0.2, x))
    want = scipy.stats.cauchy(0.2, 0.7).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cauchy_compat_reproduces_reference_sign_flip():
    """compat = proper with the log1p term's sign flipped
    (reference BNN_functions.py:51-55, SURVEY.md #2.3.1)."""
    x = np.linspace(-5, 5, 17)
    gamma, x0 = 0.7, 0.2
    compat = np.asarray(d.cauchy_logprob_compat(gamma, x0, x))
    oracle = np.log(1 + ((x - x0) / gamma) ** 2) - math.log(math.pi * gamma)
    np.testing.assert_allclose(compat, oracle, rtol=1e-5)
    # compat grows with |x|: it rewards outliers, unlike the true density
    assert compat[0] > compat[len(x) // 2]


def test_exponential_logprob():
    x = np.array([0.1, 1.0, 2.5])
    got = np.asarray(d.exponential_logprob(0.3, x))
    want = scipy.stats.expon(scale=1 / 0.3).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # reference uses |rate| rather than constraining it
    neg = np.asarray(d.exponential_logprob(-0.3, x))
    np.testing.assert_allclose(neg, want, rtol=1e-5)


def test_bernoulli_logprob_vs_scipy():
    p = np.array([0.2, 0.8, 0.5])
    y = np.array([1.0, 0.0, 1.0])
    got = np.asarray(d.bernoulli_logprob(p, y))
    want = scipy.stats.bernoulli(p).logpmf(y.astype(int))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bernoulli_clips_extreme_probs():
    got = np.asarray(d.bernoulli_logprob(np.array([0.0, 1.0]),
                                         np.array([1.0, 0.0])))
    assert np.all(np.isfinite(got))
    assert got[0] == pytest.approx(math.log(1e-8), rel=1e-5)
