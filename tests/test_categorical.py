"""Multiclass classification: CategoricalLikelihood + Softmax head +
MulticlassAccuracy (new capability beyond the reference's binary
Bernoulli path — reference ships Softmax, activationFunctions.py:79-89,
but no multiclass likelihood)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from tensorbnn_tpu import (
    CategoricalLikelihood,
    GaussianDenseLayer,
    Softmax,
    Tanh,
)
from tensorbnn_tpu.distributions import categorical_logprob
from tensorbnn_tpu.metrics import MulticlassAccuracy
from tensorbnn_tpu.network import Network


def test_categorical_logprob_matches_scipy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(7, 4))
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    labels = rng.integers(0, 4, size=7)

    got = np.asarray(categorical_logprob(p, labels))
    want = np.array([stats.multinomial.logpmf(
        np.eye(4)[k], n=1, p=row) for row, k in zip(p, labels)])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # one-hot labels give the same values
    got_oh = np.asarray(categorical_logprob(p, np.eye(4)[labels]))
    np.testing.assert_allclose(got_oh, got, rtol=1e-6)


def test_categorical_logprob_clip_floor():
    """A zero probability at the observed class is floored, not -inf."""
    p = np.asarray([[1.0, 0.0, 0.0]])
    val = float(categorical_logprob(p, np.asarray([1]))[0])
    assert np.isfinite(val)
    np.testing.assert_allclose(val, np.log(1e-8), rtol=1e-6)


def test_likelihood_sums_rows():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(5, 3))
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    labels = rng.integers(0, 3, size=5).astype(np.float32)
    lik = CategoricalLikelihood()
    got = float(lik.log_likelihood(jnp.asarray(p, jnp.float32),
                                   jnp.asarray(labels), {}))
    want = float(np.sum(np.asarray(categorical_logprob(p, labels))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multiclass_accuracy_metric():
    preds = jnp.asarray([[0.7, 0.2, 0.1],
                         [0.1, 0.8, 0.1],
                         [0.3, 0.3, 0.4]])
    labels = jnp.asarray([0.0, 1.0, 0.0])   # last one wrong
    m = MulticlassAccuracy()
    m.calculate(preds, preds, labels, labels)
    np.testing.assert_allclose(m.train, 2 / 3, rtol=1e-6)
    assert "accuracy" in m.display()

    onehot = jnp.asarray(np.eye(3)[[0, 1, 0]])
    m.calculate(preds, preds, onehot, onehot)
    np.testing.assert_allclose(m.train, 2 / 3, rtol=1e-6)


@pytest.mark.parametrize("use_fused", [False])
def test_three_class_sampling_end_to_end(use_fused):
    """A 3-class toy problem: the sampled ensemble separates the clusters
    (posterior-mean argmax accuracy) and the run stays finite."""
    rng = np.random.default_rng(2)
    n_per, k = 30, 3
    centers = np.asarray([[0.0, 2.0], [-2.0, -1.0], [2.0, -1.0]])
    x = np.concatenate([c + 0.4 * rng.normal(size=(n_per, 2))
                        for c in centers]).astype(np.float32)
    y = np.repeat(np.arange(k), n_per).astype(np.float32)

    net = Network(jnp.float32, 2, x, y, x, y, seed=8)
    net.add(GaussianDenseLayer(2, 12)).add(Tanh())
    net.add(GaussianDenseLayer(12, k)).add(Softmax())
    net.setup_mcmc(step_size_start=4e-3, step_size_min=1e-3,
                   step_size_max=2e-2, step_size_options=10,
                   leapfrog_start=15, leapfrog_min=5, leapfrog_max=30,
                   leapfrog_increment=5, hyper_step_size=1e-3,
                   hyper_leapfrog=10, burnin=150, averaging_steps=10,
                   random_steps=3)
    res = net.train(550, 5, CategoricalLikelihood(),
                    metric_list=[MulticlassAccuracy()],
                    n_chains=2, use_fused=use_fused, verbose=False)
    assert np.all(np.isfinite(res.theta_samples))
    assert 0 < res.main_accept[150:].mean() <= 1.0

    # posterior-mean predictions classify the training clusters well
    from tensorbnn_tpu.sampler.potential import flatten_state
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers, {})
    preds = jax.jit(jax.vmap(
        lambda th: net.model.apply(flat.unravel_theta(th),
                                   jnp.asarray(x))))(
        jnp.asarray(res.theta_pooled))
    mean_pred = np.asarray(preds).mean(axis=0)
    acc = float((mean_pred.argmax(axis=1) == y.astype(int)).mean())
    assert acc > 0.9, acc


def test_categorical_logprob_column_ids():
    """(N, 1)-shaped integer class ids (a common dataframe export shape)
    must be treated as ids, not broadcast as one-hot."""
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(5, 3))
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    ids = rng.integers(0, 3, size=5)

    flat = np.asarray(categorical_logprob(p, ids))
    col = np.asarray(categorical_logprob(p, ids[:, None]))
    np.testing.assert_allclose(col, flat, rtol=1e-6)


def test_multiclass_accuracy_column_ids():
    preds = jnp.asarray([[0.7, 0.2, 0.1],
                         [0.1, 0.8, 0.1],
                         [0.3, 0.3, 0.4]])
    ids = np.asarray([0.0, 1.0, 0.0])
    m = MulticlassAccuracy()
    m.calculate(preds, preds, ids[:, None], ids[:, None])
    np.testing.assert_allclose(m.train, 2 / 3, rtol=1e-6)
