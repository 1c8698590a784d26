"""The tensorBNN compatibility shim: a user script written against the
reference's API (its import paths, constructor signatures, camelCase
kwargs, and TF dtype objects) runs unmodified on the TPU-native core."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def shim_run(tmp_path_factory):
    # written exactly as a reference user would write it
    from tensorBNN.activationFunctions import Tanh
    from tensorBNN.layer import GaussianDenseLayer
    from tensorBNN.networkFinal import network      # [sic] reference import
    from tensorBNN.likelihood import FixedGaussianLikelihood
    from tensorBNN.metrics import SquaredError, PercentError

    trainIn = np.linspace(-2, 2, num=11)
    valIn = np.linspace(-2 + 2 / 30, 2.0 - 2 / 30, num=30)
    trainOut = np.sin(trainIn * math.pi * 2) * trainIn \
        - np.cos(trainIn * math.pi)
    valOut = np.sin(valIn * math.pi * 2) * valIn - np.cos(valIn * math.pi)

    try:
        import tensorflow as tf
        dtype = tf.float32
    except ImportError:
        dtype = np.float32

    likelihood = FixedGaussianLikelihood(sd=0.1)
    metricList = [SquaredError(mean=0, sd=1), PercentError(mean=0, sd=1)]

    neuralNet = network(dtype, 1, trainIn, trainOut.T, valIn, valOut.T)
    seed = 1000
    neuralNet.add(GaussianDenseLayer(1, 10, seed=seed, dtype=dtype))
    neuralNet.add(Tanh())
    neuralNet.add(GaussianDenseLayer(10, 10, seed=seed + 1000, dtype=dtype))
    neuralNet.add(Tanh())
    neuralNet.add(GaussianDenseLayer(10, 1, seed=seed + 2000, dtype=dtype))

    neuralNet.setupMCMC(
        stepSizeStart=1e-3, stepSizeMin=1e-4, stepSizeMax=1e-2,
        stepSizeOptions=20, leapfrogStart=30, leapfogMin=10,
        leapFrogMax=60, leapfrogIncrement=2, hyperStepSize=0.001,
        hyperLeapfrog=15, burnin=40, cores=4, averagingSteps=5,
        randomSteps=3)

    folder = str(tmp_path_factory.mktemp("shim") / "TrigRegression")
    neuralNet.train(
        120, 4, likelihood, metricList=metricList, adjustHypers=True,
        folderName=folder, networksPerFile=10, displaySkip=60)
    return folder, trainIn


def test_reference_style_training_script_runs(shim_run):
    folder, _ = shim_run
    import os
    assert os.path.exists(os.path.join(folder, "summary.txt"))
    assert os.path.exists(os.path.join(folder, "architecture.txt"))


def test_reference_style_predictor(shim_run):
    folder, trainIn = shim_run
    from tensorBNN.likelihood import FixedGaussianLikelihood
    from tensorBNN.predictor import predictor

    pred = predictor(folder + "/", likelihood=FixedGaussianLikelihood(
        sd=0.1))
    results = pred.predict(trainIn[:, None], n=1)
    assert isinstance(results, list)            # reference returns a list
    assert results[0].shape == (1, 11)          # (outputDims, batch)
    assert np.isfinite(np.stack(results)).all()

    tau = pred.autoCorrelationLength(trainIn[:, None], 50)
    assert np.isfinite(tau)
    mats = pred.extractParameters()
    assert mats[0].shape[1:] == (10, 1)         # reference (out, in) layout
    means, sds = pred.parameterStatistics()
    assert means[0].shape == (10, 1)


def test_shim_warm_start_and_pretraining():
    from tensorBNN.BNN_functions import trainBasicRegression
    from tensorBNN.layer import GaussianDenseLayer
    from tensorBNN.network import network

    x = np.linspace(-1, 1, 20)
    y = np.sin(x * math.pi)
    weights, biases, _ = trainBasicRegression(
        1, 1, 1, 5, 1, 10, 0.1, x, y, x, y, name=None)
    assert weights[0].shape == (5, 1)           # reference (out, in)

    net = network(None, 1, x, y, x, y)
    net.add(GaussianDenseLayer(1, 5, weights=weights[0], biases=biases[0]))
    params, _ = net.init_state()
    np.testing.assert_allclose(np.asarray(params[0]["w"]),
                               np.asarray(weights[0]).T, rtol=1e-6)
