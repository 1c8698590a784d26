"""Output likelihoods (L2 probabilistic model, SURVEY.md #1).

Each likelihood is an immutable spec with its own (possibly empty) hyper
pytree, mirroring the reference protocol (/root/reference/tensorBNN/
likelihood.py:9-60) as pure functions: ``log_likelihood(preds, y, hypers)``
returns the scalar data log-likelihood given batch-major predictions.

``main_probs_in_hypers`` marks likelihoods whose hypers couple the data term
into the hyperparameter chain (reference likelihood.py:18, network.py:435-438).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

from tensorbnn_tpu.distributions import bernoulli_logprob, gaussian_logprob

Hypers = Dict[str, jax.Array]


class Likelihood:
    """Base likelihood spec."""

    main_probs_in_hypers: bool = False
    n_ref_hyper_scalars: int = 0

    def init_hypers(self, dtype=jnp.float32) -> Hypers:
        del dtype
        return {}

    def log_likelihood(self, preds, y, hypers: Hypers) -> jax.Array:
        raise NotImplementedError

    def display(self, hypers: Hypers) -> str:
        del hypers
        return ""


@dataclasses.dataclass(frozen=True)
class GaussianLikelihood(Likelihood):
    """Gaussian likelihood with a learned noise scale.

    The noise hyper is stored as sqrt(sd) so the effective sd is hyper**2,
    exactly as the reference (likelihood.py:66, 88). The hyper has a *flat*
    prior: the reference's hyper-chain target includes only layer hyperpriors
    plus this likelihood term (network.py:417-440). ``gaussian_logprob`` is
    broadcast over the full prediction array, giving the proper product
    density over all points.
    """

    sd: float = 0.1
    main_probs_in_hypers: bool = True
    n_ref_hyper_scalars: int = 1

    def init_hypers(self, dtype=jnp.float32):
        return {"sd_root": jnp.asarray(math.sqrt(self.sd), dtype)}

    def log_likelihood(self, preds, y, hypers):
        sd = hypers["sd_root"] ** 2
        sigma = jnp.ones_like(preds) * sd
        y = jnp.reshape(y, preds.shape)
        return gaussian_logprob(sigma, preds, y)

    def display(self, hypers):
        return f"Loss Standard Deviation: {float(hypers['sd_root']) ** 2}"


@dataclasses.dataclass(frozen=True)
class FixedGaussianLikelihood(Likelihood):
    """Gaussian likelihood with a fixed noise scale.

    Mirrors reference ``FixedGaussianLikelihood`` (likelihood.py:136-202):
    no hypers, sd used as-is (not squared).
    """

    sd: float = 0.1
    main_probs_in_hypers: bool = False
    n_ref_hyper_scalars: int = 0

    def log_likelihood(self, preds, y, hypers):
        del hypers
        sigma = jnp.ones_like(preds) * self.sd
        y = jnp.reshape(y, preds.shape)
        return gaussian_logprob(sigma, preds, y)


@dataclasses.dataclass(frozen=True)
class BernoulliLikelihood(Likelihood):
    """Bernoulli likelihood over probability-valued predictions.

    Mirrors reference ``BernoulliLikelihood`` (likelihood.py:205-243),
    including the [1e-8, 1-1e-7] probability clip. The model's final layer
    must output probabilities (e.g. end with ``Sigmoid()``).
    """

    main_probs_in_hypers: bool = False
    n_ref_hyper_scalars: int = 0

    def log_likelihood(self, preds, y, hypers):
        del hypers
        y = jnp.reshape(y, preds.shape)
        return jnp.sum(bernoulli_logprob(preds, y))


@dataclasses.dataclass(frozen=True)
class CategoricalLikelihood(Likelihood):
    """Categorical likelihood over probability-valued rows (multiclass).

    New capability beyond the reference (which ships a Softmax activation,
    activationFunctions.py:79-89, but only a binary Bernoulli likelihood):
    the model's final layer must output a probability row per example
    (e.g. end with ``Softmax()``); ``y`` holds integer class ids or
    one-hot rows. No hypers; like the other classification likelihood it
    does not couple into the hyper chain.
    """

    main_probs_in_hypers: bool = False
    n_ref_hyper_scalars: int = 0

    def log_likelihood(self, preds, y, hypers):
        del hypers
        from tensorbnn_tpu.distributions import categorical_logprob
        return jnp.sum(categorical_logprob(preds, y))
