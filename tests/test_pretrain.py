"""Pretraining warm starts, incl. trained activation slopes (VERDICT
round-1 #6: (weights, biases, activations) must match the reference's
contract, BNN_functions.py:166-180)."""

import math

import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.training.pretrain import (
    dense_warm_start,
    prelu_warm_start,
    squareprelu_warm_start,
    train_basic_regression,
)


def _toy():
    x = np.linspace(-2, 2, 40)
    y = np.sin(x * math.pi) * x
    return x, y


def test_returns_all_three_with_shapes():
    x, y = _toy()
    w, b, a = train_basic_regression(2, 1, 1, 6, 1, 15, 0.1,
                                     x, y, x, y, seed=0)
    assert len(w) == 3 and len(b) == 3 and len(a) == 2
    assert w[0].shape == (6, 1) and b[0].shape == (6, 1)  # reference layout
    assert a[0].shape == (6,)
    # untrained slopes are the constant alpha vectors
    np.testing.assert_allclose(a[0], 0.1)


def test_trained_slopes_move_and_fit_improves():
    x, y = _toy()
    w, b, a = train_basic_regression(2, 1, 1, 8, 1, 60, 0.1,
                                     x, y, x, y, seed=1,
                                     train_slopes=True)
    assert len(a) == 2 and a[0].shape == (8,)
    # jointly-trained slopes actually moved off the init
    assert np.abs(np.concatenate(a) - 0.1).max() > 1e-4

    # and the MAP fit is sane: reconstruct the net and check train MSE
    def apply(xv):
        h = xv.reshape(-1, 1)
        for i in range(3):
            h = h @ np.asarray(w[i]).T + np.asarray(b[i]).reshape(-1)
            if i < 2:
                h = np.where(h < 0, a[i] * h, h)
        return h[:, 0]

    mse = np.mean((apply(x) - y) ** 2)
    assert mse < 0.25


def test_warm_start_converters():
    x, y = _toy()
    w, b, a = train_basic_regression(1, 1, 1, 4, 1, 10, 0.1,
                                     x, y, x, y, seed=2, train_slopes=True)
    d = dense_warm_start(w, b, 0)
    assert d["w"].shape == (1, 4) and d["b"].shape == (4,)
    p = prelu_warm_start(a, 0)
    np.testing.assert_allclose(p["slopes"], np.asarray(a[0]).reshape(-1))
    s = squareprelu_warm_start(a, 0)
    # squared parameter reproduces the (floored) effective slope
    np.testing.assert_allclose(s["slopes"] ** 2,
                               np.maximum(a[0], 1e-4), rtol=1e-6)


def test_prelu_warm_start_end_to_end():
    """The warm-started slopes appear verbatim in the chain's initial state
    and the sampler runs (exercises Network.add(parameters=...) for a
    trainable activation — the path the shim's Prelu(activation=...) uses)."""
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Prelu
    from tensorbnn_tpu.network import Network

    x, y = _toy()
    w, b, a = train_basic_regression(1, 1, 1, 5, 1, 20, 0.1,
                                     x, y, x, y, seed=3, train_slopes=True)
    net = Network(jnp.float32, 1, x, y, x, y, seed=0)
    net.add(GaussianDenseLayer(1, 5), parameters=dense_warm_start(w, b, 0))
    net.add(Prelu(5), parameters=prelu_warm_start(a, 0))
    net.add(GaussianDenseLayer(5, 1), parameters=dense_warm_start(w, b, 1))

    params, _ = net.init_state()
    np.testing.assert_allclose(np.asarray(params[1]["slopes"]),
                               np.asarray(a[0]), rtol=1e-6)

    net.setup_mcmc(step_size_start=1e-3, leapfrog_start=8, leapfrog_min=4,
                   leapfrog_max=16, burnin=10, averaging_steps=5,
                   hyper_leapfrog=4, random_steps=1)
    res = net.train(20, 4, FixedGaussianLikelihood(sd=0.1), verbose=False)
    assert np.isfinite(res.theta_samples).all()


def test_shim_activation_warm_start():
    """Reference-style script: tensorBNN shim Prelu(activation=...) feeds
    the pretrained slopes through (ClassificationExample.md:110-126)."""
    from tensorBNN.activationFunctions import Prelu as ShimPrelu
    from tensorBNN.layer import DenseLayer
    from tensorBNN.likelihood import FixedGaussianLikelihood
    from tensorBNN.network import network

    x, y = _toy()
    w, b, a = train_basic_regression(1, 1, 1, 5, 1, 15, 0.1,
                                     x, y, x, y, seed=4, train_slopes=True)
    net = network(jnp.float32, 1, x, y, x, y)
    net.add(DenseLayer(1, 5, weights=w[0], biases=b[0]))
    net.add(ShimPrelu(5, activation=a[0]))
    net.add(DenseLayer(5, 1, weights=w[1], biases=b[1]))
    params, _ = net.init_state()
    np.testing.assert_allclose(np.asarray(params[1]["slopes"]),
                               np.asarray(a[0]).reshape(-1), rtol=1e-6)
