"""Log-posterior assembly: pure flat-vector targets for the two HMC blocks.

Replaces the closures the reference rebuilds inside its jitted step functions
(/root/reference/tensorBNN/network.py:370-392 main block, 417-440 hyper block)
with a single factory that flattens the model's pytrees once and returns two
pure targets, each exposing both ``f(z) -> scalar`` and an explicit
``value_and_grad`` — the quantity the leapfrog loop actually consumes.

Data-parallel likelihoods: pass ``axis_name`` when the target runs inside a
``shard_map`` whose mesh axis shards the data batch. The likelihood *value
and gradient* are computed on the local shard and ``psum``'d together in one
fused collective, while the prior terms are computed on replicated state.
This is deliberate: differentiating *through* a ``psum`` under
``shard_map(check_rep=False)`` does not re-sum the cotangent across shards,
so the gradient must be summed explicitly. One psum of the (value, grad)
tuple per leapfrog step is also the minimal-traffic layout — a single fused
all-reduce over the ICI (SURVEY.md #2.2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.hmc import _kahan_add


class FlatModelState(NamedTuple):
    """Flat vectors plus the static unflatten closures."""
    theta: jax.Array                 # flat main-chain state (params)
    eta: jax.Array                   # flat hyper-chain state
    unravel_theta: Callable
    unravel_eta: Callable


def flatten_state(params, hypers, lik_hypers) -> FlatModelState:
    """Flattens (params) -> theta and (hypers, lik_hypers) -> eta."""
    theta, unravel_theta = ravel_pytree(params)
    eta, unravel_eta = ravel_pytree((hypers, lik_hypers))
    return FlatModelState(theta, eta, unravel_theta, unravel_eta)


def host_unraveler(example_pytree) -> Callable:
    """Pure-numpy unravel for host-side consumers (the streaming writer
    unravels one vector per network per chain — routing that through the
    jnp ``ravel_pytree`` closure costs a JAX dispatch per leaf per call).

    Leaf order matches ``ravel_pytree``'s (both are ``tree_flatten``
    order; all leaves share one dtype here so no promotion reordering),
    which the fused-kernel layout contract already pins down
    (ops/fused_mlp.verify_theta_layout).
    """
    import numpy as np

    leaves, treedef = jax.tree.flatten(example_pytree)
    shapes = [np.shape(leaf) for leaf in leaves]
    sizes = [int(np.size(leaf)) for leaf in leaves]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    def unravel(vec):
        vec = np.asarray(vec).reshape(-1)
        return jax.tree.unflatten(treedef, [
            vec[offsets[i]:offsets[i + 1]].reshape(shapes[i])
            for i in range(len(shapes))])

    return unravel


def host_batch_unraveler(example_pytree) -> Callable:
    """Vectorized pure-numpy unravel: ``(N, D)`` matrix of flat rows ->
    the example pytree with an ``(N,) + leaf.shape`` array per leaf.

    The driver's end-of-run sample stacking previously routed the pooled
    ``(S*C, D)`` posterior through ``jax.vmap(unravel_theta)`` — through
    the axon tunnel that is two fresh remote XLA compiles (5-460s class,
    uncacheable across processes) plus a full device round-trip of the
    posterior stack, all for a pure reshaping. Same leaf-order caveat as
    :func:`host_unraveler` (``tree_flatten`` order, single shared dtype).
    """
    import numpy as np

    leaves, treedef = jax.tree.flatten(example_pytree)
    shapes = [np.shape(leaf) for leaf in leaves]
    sizes = [int(np.size(leaf)) for leaf in leaves]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    def unravel(mat):
        mat = np.asarray(mat)
        n = mat.shape[0]
        return jax.tree.unflatten(treedef, [
            np.ascontiguousarray(
                mat[:, offsets[i]:offsets[i + 1]]).reshape(
                (n,) + shapes[i])
            for i in range(len(shapes))])

    return unravel


class Potentials(NamedTuple):
    #: log_post_main(theta, eta) -> scalar: prior + likelihood (main block)
    main: Callable
    #: log_post_hyper(eta, theta) -> scalar: hyperpriors (+ likelihood when
    #: the likelihood's hypers couple in, reference network.py:435-438)
    hyper: Callable
    #: main_vg(theta, eta) -> (value, grad wrt theta), collective-correct
    main_vg: Callable
    #: hyper_vg(eta, theta) -> (value, grad wrt eta)
    hyper_vg: Callable
    #: tempered targets for parallel tempering (sampler/tempering.py):
    #: the *likelihood* term is raised to the inverse temperature beta
    #: (a power posterior: prior + beta * loglik), priors untempered so
    #: every rung's target stays proper. main_vg_t(theta, eta, beta),
    #: hyper_vg_t(eta, theta, beta); loglik(theta, eta) -> scalar is the
    #: raw (psum'd) data log-likelihood the replica-swap accept consumes.
    main_vg_t: Optional[Callable] = None
    hyper_vg_t: Optional[Callable] = None
    loglik: Optional[Callable] = None


def _chunked_loglik(model, likelihood, x, y,
                    data_chunk: Optional[int]) -> Optional[Callable]:
    """Returns ``f(params, lik_hypers) -> scalar`` accumulating the
    row-additive likelihood over ``data_chunk``-row chunks, or None when
    chunking is off. See ``make_potentials``."""
    if not data_chunk:
        return None
    n_rows = int(x.shape[0])
    if n_rows % data_chunk:
        raise ValueError(
            f"data_chunk ({data_chunk}) must divide the (local) training "
            f"rows ({n_rows}); pad the dataset or pick a divisor")
    n_chunks = n_rows // data_chunk
    if n_chunks == 1:
        return None
    xs = x.reshape((n_chunks, data_chunk) + x.shape[1:])
    ys = y.reshape((n_chunks, data_chunk) + y.shape[1:])

    @jax.checkpoint
    def one_chunk(params, lik_hypers, xc, yc):
        preds = model.apply(params, xc)
        return likelihood.log_likelihood(preds, yc, lik_hypers)

    def total(params, lik_hypers):
        # Kahan-compensated carry (sampler/hmc.py:_kahan_add): the plain
        # sequential carry loses ~ulp(|total|)/2 per chunk — at 1M-point
        # log-likelihood magnitudes (|LL| ~ 1e5-1e6, ulp ~ 0.01-0.1 nats)
        # that is a per-evaluation pseudo-noise the MH test pays twice
        # per transition. Two extra scalar ops per chunk; the symbolic
        # derivative of the compensation cancels exactly, so the VJP's
        # gradient accumulation is structurally unchanged.
        def body(carry, xy):
            acc, comp = carry
            xc, yc = xy
            acc, comp = _kahan_add(acc, comp,
                                   one_chunk(params, lik_hypers, xc, yc))
            return (acc, comp), None
        zero = jnp.zeros((), x.dtype)
        (out, _), _ = lax.scan(body, (zero, zero), (xs, ys))
        return out

    return total


def _combine(local_fn: Callable, rep_fn: Callable,
             axis_name: Optional[str]):
    """Builds value and value_and_grad for ``rep_fn(z) + sum_shards
    local_fn(z)``, differentiating each part separately so the collective
    sums both the value and the gradient."""

    def value(z, other):
        v = rep_fn(z, other) + (lax.psum(local_fn(z, other), axis_name)
                                if axis_name else local_fn(z, other))
        return v

    def value_and_grad(z, other):
        lv, lg = jax.value_and_grad(local_fn)(z, other)
        if axis_name:
            lv, lg = lax.psum((lv, lg), axis_name)
        rv, rg = jax.value_and_grad(rep_fn)(z, other)
        return lv + rv, lg + rg

    return value, value_and_grad


def make_potentials(model: Sequential, likelihood: Likelihood,
                    x: jax.Array, y: jax.Array,
                    unravel_theta: Callable, unravel_eta: Callable,
                    axis_name: Optional[str] = None,
                    data_chunk: Optional[int] = None) -> Potentials:
    """Builds the two log-posterior targets over flat vectors.

    ``x`` and ``y`` are closed over (device-resident constants for the whole
    run, like the reference's ``self.trainX`` — network.py:41-51). With
    ``axis_name`` set they are the *local shards*.

    ``data_chunk`` enables exact chunked gradient accumulation: the
    likelihood value/grad runs as a ``lax.scan`` over row chunks with a
    rematerialized body, so activation HBM is bounded by
    ``chains x data_chunk x width`` instead of the full dataset — the
    single-chip answer to wide chain fleets over big-data likelihoods
    (the 1M-point surrogate stores ~590MB of activations per chain
    un-chunked, capping one 16GB chip at ~16 chains). Exact because every
    shipped likelihood is row-additive (Gaussian normalizers count
    elements, Bernoulli/Categorical sum rows); only float association
    changes. Gradients accumulate in the scan carry; ``jax.checkpoint``
    on the body makes the backward recompute each chunk's activations
    chunk-by-chunk instead of storing them all.
    """
    chunked = _chunked_loglik(model, likelihood, x, y, data_chunk)

    def loglik_main(theta, eta):
        params = unravel_theta(theta)
        _, lik_hypers = unravel_eta(eta)
        if chunked is not None:
            return chunked(params, lik_hypers)
        preds = model.apply(params, x)
        return likelihood.log_likelihood(preds, y, lik_hypers)

    def prior_main(theta, eta):
        params = unravel_theta(theta)
        hypers, _ = unravel_eta(eta)
        return model.log_prior(hypers, params)

    main, main_vg = _combine(loglik_main, prior_main, axis_name)

    def hyper_rep(eta, theta):
        params = unravel_theta(theta)
        hypers, _ = unravel_eta(eta)
        return model.log_hyper_prior(hypers, params)

    if likelihood.main_probs_in_hypers:
        def hyper_local(eta, theta):
            params = unravel_theta(theta)
            _, lik_hypers = unravel_eta(eta)
            if chunked is not None:
                return chunked(params, lik_hypers)
            preds = model.apply(params, x)
            return likelihood.log_likelihood(preds, y, lik_hypers)
    else:
        def hyper_local(eta, theta):
            del theta
            return jnp.zeros((), eta.dtype)

    hyper, hyper_vg = _combine(hyper_local, hyper_rep, axis_name)

    # -- tempered variants (power posterior: prior + beta * loglik) ----------
    # built from the same local/replicated split so the collective rule
    # holds: the likelihood value+grad is psum'd BEFORE the beta scaling
    # (beta is replicated per chain, so the order is equivalence, but the
    # explicit psum of (value, grad) stays the single fused collective)
    def main_vg_t(theta, eta, beta):
        lv, lg = jax.value_and_grad(loglik_main)(theta, eta)
        if axis_name:
            lv, lg = lax.psum((lv, lg), axis_name)
        rv, rg = jax.value_and_grad(prior_main)(theta, eta)
        return rv + beta * lv, rg + beta * lg

    def hyper_vg_t(eta, theta, beta):
        rv, rg = jax.value_and_grad(hyper_rep)(eta, theta)
        if likelihood.main_probs_in_hypers:
            lv, lg = jax.value_and_grad(hyper_local)(eta, theta)
            if axis_name:
                lv, lg = lax.psum((lv, lg), axis_name)
            rv, rg = rv + beta * lv, rg + beta * lg
        return rv, rg

    def loglik_value(theta, eta):
        v = loglik_main(theta, eta)
        return lax.psum(v, axis_name) if axis_name else v

    return Potentials(main, hyper, main_vg, hyper_vg,
                      main_vg_t=main_vg_t, hyper_vg_t=hyper_vg_t,
                      loglik=loglik_value)
