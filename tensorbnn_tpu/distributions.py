"""Pure-jnp log-probability primitives.

These are the L0 math layer of the framework (SURVEY.md #1). They re-derive,
from scratch, the behavior of the reference's log-prob helpers
(/root/reference/tensorBNN/BNN_functions.py:7-57) so that posterior densities
match the reference within tolerance, while being written as pure functions
ready for `jax.grad` / `vmap` / `pjit`.

Two deliberate compatibility decisions (SURVEY.md #2.3):

* ``gaussian_logprob`` reproduces the reference's ``multivariateLogProb``
  normalization exactly: the log-determinant term counts each *element of
  sigma* once (``k = sigma.size``), while the quadratic form sums over every
  element of ``x``. When sigma is a scalar (layer priors) this undercounts the
  normalizer relative to a proper iid Gaussian; when sigma is broadcast to
  ``x.shape`` (likelihoods) it is the proper product density. Both call sites
  rely on this, so the function is kept reference-exact and a proper variant
  is provided separately.

* ``cauchy_logprob_compat`` reproduces the reference's sign-flipped Cauchy
  "log prob" (BNN_functions.py:51-55), which *rewards* outliers. The correct
  density is ``cauchy_logprob``. ``CauchyDenseLayer`` defaults to the compat
  form for statistical parity with the reference and exposes a flag to use the
  proper one.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)

_SIGMA_MIN = 1e-8
_SIGMA_MAX = 1e8


def gaussian_logprob(sigma, mu, x):
    """Reference-exact Gaussian log probability.

    Mirrors ``multivariateLogProb`` (reference BNN_functions.py:7-34):
    sigma is clamped to [1e-8, 1e8]; the normalizer counts ``sigma.size``
    dimensions while the quadratic form reduces over all elements of ``x``.

    Returns a scalar.
    """
    sigma = jnp.asarray(sigma)
    mu = jnp.asarray(mu)
    x = jnp.asarray(x)
    sigma = jnp.clip(sigma, _SIGMA_MIN, _SIGMA_MAX)
    log_det = 2.0 * jnp.sum(jnp.log(sigma))
    k = jnp.asarray(sigma.size, dtype=x.dtype)
    dif = (x - mu) / sigma
    quad = jnp.sum(dif * dif)
    return -0.5 * (log_det + quad + k * LOG_2PI)


def normal_logprob(x, loc, scale):
    """Proper elementwise univariate normal log-density.

    Used for hyperpriors, matching ``tfd.MultivariateNormalDiag.log_prob`` on
    1-element events (reference layer.py:137-153, 318-334).
    """
    x = jnp.asarray(x)
    z = (x - loc) / scale
    return -0.5 * (z * z) - jnp.log(scale) - 0.5 * LOG_2PI


def cauchy_logprob(gamma, x0, x):
    """Proper elementwise Cauchy log-density."""
    x = jnp.asarray(x)
    z = (x - x0) / gamma
    return -jnp.log1p(z * z) - jnp.log(math.pi * gamma)


def cauchy_logprob_compat(gamma, x0, x):
    """Reference-compatible sign-flipped Cauchy "log prob".

    Reproduces ``cauchyLogProb`` (reference BNN_functions.py:37-57), whose
    first term has the opposite sign of the true log-density (SURVEY.md
    #2.3.1). Kept so Cauchy-prior chains match the reference statistically.
    """
    x = jnp.asarray(x)
    z = (x - x0) / gamma
    return jnp.log1p(z * z) - jnp.log(math.pi * gamma)


def exponential_logprob(rate, x):
    """Elementwise exponential log-density with |rate|.

    Mirrors ``Prelu.exponentialLogProb`` (reference activationFunctions.py:
    161-175): the rate is passed through abs() rather than constrained.
    """
    rate = jnp.abs(rate)
    return -rate * jnp.asarray(x) + jnp.log(rate)


def bernoulli_logprob(probs, y):
    """Elementwise Bernoulli log pmf with the reference's probability clip.

    Mirrors ``BernoulliLikelihood.makeResponseLikelihood`` (reference
    likelihood.py:225-237): probs are clipped to [1e-8, 1 - 1e-7].
    """
    p = jnp.clip(jnp.asarray(probs), 1e-8, 1.0 - 1e-7)
    y = jnp.asarray(y)
    return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)


def categorical_logprob(probs, labels):
    """Per-row categorical log pmf over probability-valued rows.

    ``probs`` is (..., k) (e.g. a Softmax head's output), ``labels`` either
    integer class ids (...,) or one-hot (..., k). Probabilities are clipped
    below at 1e-8, matching the Bernoulli clip's floor (reference
    likelihood.py:225-237; the reference has no multiclass likelihood —
    this extends its classification family beyond binary).
    """
    p = jnp.clip(jnp.asarray(probs), 1e-8, 1.0)
    labels = jnp.asarray(labels)
    # one-hot only when the trailing axis matches the class count — an
    # (N, 1) column of class ids must NOT be broadcast as one-hot (it
    # would yield label_id * sum(log p), a silent wrong posterior)
    if labels.ndim == p.ndim and labels.shape[-1] == p.shape[-1]:
        return jnp.sum(labels * jnp.log(p), axis=-1)
    labels = jnp.reshape(labels, p.shape[:-1])
    return jnp.log(jnp.take_along_axis(
        p, labels[..., None].astype(jnp.int32), axis=-1))[..., 0]
