"""Shim for ``tensorBNN.likelihood`` (reference likelihood.py:63-243)."""

from tensorbnn_tpu.likelihoods import (  # noqa: F401
    BernoulliLikelihood,
    FixedGaussianLikelihood,
    GaussianLikelihood,
    Likelihood,
)
