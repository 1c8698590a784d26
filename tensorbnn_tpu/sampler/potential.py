"""Log-posterior assembly: pure flat-vector targets for the two HMC blocks.

Replaces the closures the reference rebuilds inside its jitted step functions
(/root/reference/tensorBNN/network.py:370-392 main block, 417-440 hyper block)
with a single factory that flattens the model's pytrees once and returns two
pure ``f(flat_vector) -> scalar`` targets, ready for ``jax.grad`` inside the
HMC kernel.

Data-parallel likelihoods: pass ``axis_name`` when the target runs inside a
``shard_map`` whose mesh axis shards the data batch — the likelihood term
(and, through ``jax.grad``, its gradient) is ``psum``'d over that axis while
the prior terms are computed on replicated state. This is the build's
NCCL-equivalent (SURVEY.md #2.2): collectives authored via ``jax.lax.psum``
and compiled by XLA onto the ICI.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential


class FlatModelState(NamedTuple):
    """Flat vectors plus the static unflatten closures."""
    theta: jax.Array                 # flat main-chain state (params)
    eta: jax.Array                   # flat hyper-chain state (hypers incl. likelihood's)
    unravel_theta: Callable
    unravel_eta: Callable


def flatten_state(params, hypers, lik_hypers) -> FlatModelState:
    """Flattens (params) -> theta and (hypers, lik_hypers) -> eta."""
    theta, unravel_theta = ravel_pytree(params)
    eta, unravel_eta = ravel_pytree((hypers, lik_hypers))
    return FlatModelState(theta, eta, unravel_theta, unravel_eta)


class Potentials(NamedTuple):
    #: log_post_main(theta, eta) -> scalar: prior + likelihood (main block)
    main: Callable
    #: log_post_hyper(eta, theta) -> scalar: hyperpriors (+ likelihood when
    #: the likelihood's hypers couple in, reference network.py:435-438)
    hyper: Callable


def make_potentials(model: Sequential, likelihood: Likelihood,
                    x: jax.Array, y: jax.Array,
                    unravel_theta: Callable, unravel_eta: Callable,
                    axis_name: Optional[str] = None) -> Potentials:
    """Builds the two log-posterior targets over flat vectors.

    ``x`` and ``y`` are closed over (they are device-resident constants for
    the whole run, like the reference's ``self.trainX`` — network.py:41-51).
    With ``axis_name`` set, ``x``/``y`` are the *local shards* and the
    likelihood sum is a cross-device ``psum``.
    """

    def _loglik(params, lik_hypers):
        preds = model.apply(params, x)
        ll = likelihood.log_likelihood(preds, y, lik_hypers)
        if axis_name is not None:
            ll = lax.psum(ll, axis_name)
        return ll

    def log_post_main(theta, eta):
        params = unravel_theta(theta)
        hypers, lik_hypers = unravel_eta(eta)
        return model.log_prior(hypers, params) + _loglik(params, lik_hypers)

    def log_post_hyper(eta, theta):
        params = unravel_theta(theta)
        hypers, lik_hypers = unravel_eta(eta)
        lp = model.log_hyper_prior(hypers, params)
        if likelihood.main_probs_in_hypers:
            lp = lp + _loglik(params, lik_hypers)
        return lp

    return Potentials(log_post_main, log_post_hyper)
