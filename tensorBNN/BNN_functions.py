"""Shim for ``tensorBNN.BNN_functions`` (reference BNN_functions.py):
log-prob helpers plus the camelCase pretraining entry points."""

import jax.numpy as jnp

from tensorbnn_tpu.distributions import cauchy_logprob_compat, \
    gaussian_logprob
from tensorbnn_tpu.training.pretrain import train_basic_classification, \
    train_basic_regression


def multivariateLogProb(sigmaIn, mu, x, dtype=None):
    del dtype
    return gaussian_logprob(jnp.asarray(sigmaIn), jnp.asarray(mu),
                            jnp.asarray(x))


def cauchyLogProb(gamma, x0, x, dtype=None):
    del dtype
    return cauchy_logprob_compat(gamma, x0, jnp.asarray(x))


def trainBasicRegression(hidden, inputDims, outputDims, width, cycles,
                         epochs, alpha, trainIn, trainOut, valIn, valOut,
                         name=None, callbacks=True,
                         callbackMetric="val_loss", patience=10):
    del callbackMetric
    return train_basic_regression(hidden, inputDims, outputDims, width,
                                  cycles, epochs, alpha, trainIn, trainOut,
                                  valIn, valOut, name=name,
                                  callbacks=callbacks, patience=patience)


def trainBasicClassification(hidden, inputDims, outputDims, width, cycles,
                             epochs, alpha, trainIn, trainOut, valIn,
                             valOut, name=None, callbacks=True,
                             callbackMetric="val_loss", patience=10):
    del callbackMetric
    return train_basic_classification(hidden, inputDims, outputDims, width,
                                      cycles, epochs, alpha, trainIn,
                                      trainOut, valIn, valOut, name=name,
                                      callbacks=callbacks,
                                      patience=patience)
