"""Multi-chain HMC: vmapped chains sharded over a (chains, data) mesh.

The scaling design SURVEY.md #2.2 calls for (new capability — the reference
is strictly single-chain, single-device):

* chains are **vmapped** inside each device — the per-chain flat states
  batch into a ``(C, D)`` matrix so every leapfrog update is one large
  VPU/MXU-friendly op;
* chain groups are **shard_map'd** across the mesh's ``chains`` axis — no
  collective ever crosses it;
* the likelihood (and its gradient, via ``jax.grad`` through the ``psum``)
  is data-parallel over the ``data`` axis: each device computes its shard's
  log-likelihood term and XLA compiles the ``psum`` onto the ICI.

Adaptation design decision (SURVEY.md #7 hard part 3): by default the
GP-UCB adapter is *shared* across chains — it consumes the cross-chain mean
SJD — while the hyper chain's dual-averaging state is *per chain* (each
chain carries its own ``(hyper_step, log_eps_bar, h)``). A shared (eps, L)
keeps every chain on the same wave front. The driver's ``n_adapters``
option instead runs one adapter per chain group with per-chain (eps, L)
vectors (``per_chain_adapt``); the integrators mask-freeze chains that
finish early, so the batch pays the longest group's trajectory. Per-chain
dual averaging costs nothing because it lives in the vmapped carry.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS, DATA_AXIS
from tensorbnn_tpu.sampler.gibbs import ChainState, EpochTrace, make_epoch_fn


def init_multichain_state(theta, eta, key, hyper_step_size, n_chains: int,
                          dtype=jnp.float32, jitter: float = 0.0,
                          ) -> ChainState:
    """Builds a batched ChainState of ``n_chains`` chains.

    All chains start from the same (theta, eta) unless ``jitter`` > 0, in
    which case each chain's theta is perturbed with N(0, jitter) noise —
    overdispersed starts for R-hat style diagnostics.
    """
    keys = jax.random.split(key, n_chains + 1)
    chain_keys, jitter_key = keys[:n_chains], keys[-1]
    theta = jnp.broadcast_to(jnp.asarray(theta, dtype),
                             (n_chains,) + jnp.shape(theta)).copy()
    if jitter > 0:
        theta = theta + jitter * jax.random.normal(jitter_key, theta.shape,
                                                   dtype)
    eta = jnp.broadcast_to(jnp.asarray(eta, dtype),
                           (n_chains,) + jnp.shape(eta)).copy()
    zeros = jnp.zeros((n_chains,), dtype)
    return ChainState(
        theta=theta, eta=eta, key=chain_keys,
        hyper_step=jnp.full((n_chains,), hyper_step_size, dtype),
        log_eps_bar=zeros, h=zeros, epoch=zeros)


def make_multichain_chunk_runner(model: Sequential, likelihood: Likelihood,
                                 x, y, unravel_theta, unravel_eta, *,
                                 adjust_hypers: bool,
                                 hyper_leapfrog: int,
                                 burnin: float,
                                 hyper_step_size_init: float,
                                 mesh: Optional[Mesh] = None,
                                 donate: bool = True,
                                 batched_main_vg=None,
                                 batched_main_traj=None,
                                 batched_hyper_traj=None,
                                 state_layout: str = "flat",
                                 per_chain_adapt: bool = False,
                                 data_chunk=None,
                                 step_scale=None,
                                 traced_step_scale: bool = False,
                                 record_uturn: bool = False,
                                 per_epoch_leapfrog: bool = False,
                                 compensated: bool = False,
                                 tempering_beta=None):
    """Builds ``run_chunk(carry, x, y, step_size, leapfrog, n_epochs)`` over
    batched chains.

    Without a mesh this is a plain vmap over the chain axis (single-device
    many-chain mode — the bench configuration for one TPU chip). With a mesh,
    the body runs under ``shard_map``: chains split over the ``chains`` axis,
    the data batch over the ``data`` axis, likelihood psum'd.

    Unlike the single-chain runner, ``x``/``y`` are arguments rather than
    closure constants so shard_map can annotate their shardings.

    With ``per_chain_adapt`` (the driver's ``n_adapters > 1`` mode) the
    ``step_size``/``leapfrog`` arguments are per-chain ``(C,)`` vectors and,
    under a mesh, shard with the chains axis; every device in a data-axis
    group holds the same chain shard, so the masked leapfrog's trip count —
    and therefore its psum schedule — stays identical within each collective
    group.

    ``step_scale`` is the per-coordinate ``(D,)`` diagonal-metric step
    multiplier. With ``traced_step_scale`` the returned runner takes it as
    a *traced argument* — ``run_chunk(carry, x, y, step_size, leapfrog,
    step_scale, n_epochs)`` — so the driver's windowed metric
    re-estimation swaps in a fresh scale vector every burn-in window
    without retracing (one compile per run instead of one per window; a
    remote compile through the axon tunnel costs 5-460s). Without it the
    closure constant ``step_scale`` is baked in (the single-estimate
    legacy path).

    ``compensated`` opts the main-block integrator into Kahan-compensated
    accumulation (sampler/hmc.py) — for big-data posteriors whose stable
    step size sits within a few ulps of the state magnitude.

    ``record_uturn`` threads the per-epoch first-U-turn step into the
    trace (sampler/hmc.py). ``per_epoch_leapfrog`` makes the ``leapfrog``
    argument an ``(n_epochs,)`` vector consumed as the epoch scan's
    ``xs`` — each epoch integrates its own trajectory length, the
    NUTS-style dynamic-length mode (the whole fleet still shares one
    wave front per epoch; lengths stay traced, so drawing fresh ones
    every chunk never recompiles).
    """
    if tempering_beta is not None and (
            (mesh is not None and mesh.shape[CHAIN_AXIS] > 1)
            or state_layout == "tree"):
        # replica swaps pair rung blocks across the chain axis; under a
        # chain-SHARDED mesh those pairs straddle shard boundaries (a
        # ppermute extension), and the tree layout's big-data runs are
        # out of tempering's small-multimodal-model scope. A pure
        # data-parallel mesh (chains axis 1) IS supported: every data
        # shard holds the whole replica fleet, the psum'd
        # log-likelihood and replicated per-chain keys make the swap
        # decisions identical on every shard, and the likelihood
        # value+grad rides the data-axis collective like any other run
        raise ValueError("tempering requires the mesh chains axis to be "
                         "1 (data-parallel only) and the flat state "
                         "layout")
    mu = math.log(100.0 * hyper_step_size_init)

    from jax.flatten_util import ravel_pytree
    from tensorbnn_tpu.sampler.gibbs import make_tree_epoch_fn

    unravel_b = jax.vmap(unravel_theta)
    ravel_b = jax.vmap(lambda p: ravel_pytree(p)[0])

    def make_body(axis_name):
        """Builds the chunk body; the flat (C, D) interface at the boundary
        is identical for both state layouts, so the shard_map wrapper below
        serves either. ``scale`` is the per-coordinate step multiplier —
        a traced argument in ``traced_step_scale`` mode, else the closure
        constant (possibly None)."""
        if state_layout == "tree":
            def body(carry, x_shard, y_shard, step_size, leapfrog, scale,
                     n_epochs: int):
                epoch_fn = make_tree_epoch_fn(
                    model, likelihood, x_shard, y_shard, unravel_eta,
                    adjust_hypers=adjust_hypers,
                    hyper_leapfrog=hyper_leapfrog,
                    burnin=burnin, mu=mu,
                    unravel_theta=unravel_theta,
                    theta_dim=carry.theta.shape[-1],
                    axis_name=axis_name,
                    eta_dim=carry.eta.shape[-1],
                    data_chunk=data_chunk,
                    step_scale=scale,
                    record_uturn=record_uturn,
                    compensated=compensated)
                tree_carry = carry._replace(theta=unravel_b(carry.theta))

                def step(c, leap):
                    c2, trace = epoch_fn(c, step_size, leap)
                    return c2, trace._replace(theta=ravel_b(trace.theta))

                if per_epoch_leapfrog:
                    final, traces = lax.scan(step, tree_carry, xs=leapfrog)
                else:
                    final, traces = lax.scan(
                        lambda c, _: step(c, leapfrog), tree_carry,
                        xs=None, length=n_epochs)
                return final._replace(theta=ravel_b(final.theta)), traces
            return body

        def body(carry, x_shard, y_shard, step_size, leapfrog, scale,
                 n_epochs: int):
            epoch_fn = make_epoch_fn(
                model, likelihood, x_shard, y_shard,
                unravel_theta, unravel_eta,
                adjust_hypers=adjust_hypers,
                hyper_leapfrog=hyper_leapfrog,
                burnin=burnin, mu=mu, axis_name=axis_name,
                batched_main_vg=batched_main_vg,
                batched_main_traj=batched_main_traj,
                batched_hyper_traj=batched_hyper_traj,
                eta_dim=carry.eta.shape[-1],
                data_chunk=data_chunk,
                step_scale=scale,
                record_uturn=record_uturn,
                compensated=compensated,
                tempering_beta=tempering_beta)

            if per_epoch_leapfrog:
                return lax.scan(
                    lambda c, leap: epoch_fn(c, step_size, leap),
                    carry, xs=leapfrog)
            return lax.scan(lambda c, _: epoch_fn(c, step_size, leapfrog),
                            carry, xs=None, length=n_epochs)
        return body

    if mesh is None:
        body = make_body(None)

        if traced_step_scale:
            @functools.partial(jax.jit, static_argnums=(6,),
                               donate_argnums=(0,) if donate else ())
            def run_chunk(carry, x_in, y_in, step_size, leapfrog, scale,
                          n_epochs):
                return body(carry, x_in, y_in, step_size, leapfrog, scale,
                            n_epochs)
        else:
            @functools.partial(jax.jit, static_argnums=(5,),
                               donate_argnums=(0,) if donate else ())
            def run_chunk(carry, x_in, y_in, step_size, leapfrog, n_epochs):
                return body(carry, x_in, y_in, step_size, leapfrog,
                            step_scale, n_epochs)

        return run_chunk

    body = make_body(DATA_AXIS)

    chain_state_spec = ChainState(
        theta=P(CHAIN_AXIS), eta=P(CHAIN_AXIS), key=P(CHAIN_AXIS),
        hyper_step=P(CHAIN_AXIS), log_eps_bar=P(CHAIN_AXIS),
        h=P(CHAIN_AXIS), epoch=P(CHAIN_AXIS))
    # scan stacks a leading epoch axis onto every per-chain trace leaf
    epoch_trace_spec = EpochTrace(
        theta=P(None, CHAIN_AXIS), eta=P(None, CHAIN_AXIS),
        sjd=P(None, CHAIN_AXIS), main_accept=P(None, CHAIN_AXIS),
        hyper_accept=P(None, CHAIN_AXIS), uturn=P(None, CHAIN_AXIS),
        # tempered runs emit the per-chain swap indicator; None (an
        # empty subtree) otherwise, matching the body's output pytree
        swap_accept=(P(None, CHAIN_AXIS) if tempering_beta is not None
                     else None))

    adapt_spec = P(CHAIN_AXIS) if per_chain_adapt else P()
    # per-epoch leapfrog vectors are (n_epochs,), shared by every chain
    leap_spec = P() if per_epoch_leapfrog else adapt_spec

    if traced_step_scale:
        # the (D,) scale is replicated: the chain axis shards chains, not
        # coordinates, and every data-axis peer integrates the same metric
        @functools.partial(jax.jit, static_argnums=(6,),
                           donate_argnums=(0,) if donate else ())
        def run_chunk(carry, x_in, y_in, step_size, leapfrog, scale,
                      n_epochs):
            fn = shard_map(
                functools.partial(body, n_epochs=n_epochs),
                mesh=mesh,
                in_specs=(chain_state_spec, P(DATA_AXIS), P(DATA_AXIS),
                          adapt_spec, leap_spec, P()),
                out_specs=(chain_state_spec, epoch_trace_spec),
                check_vma=False)
            return fn(carry, x_in, y_in, step_size, leapfrog, scale)

        return run_chunk

    @functools.partial(jax.jit, static_argnums=(5,),
                       donate_argnums=(0,) if donate else ())
    def run_chunk(carry, x_in, y_in, step_size, leapfrog, n_epochs):
        fn = shard_map(
            functools.partial(body, scale=step_scale, n_epochs=n_epochs),
            mesh=mesh,
            in_specs=(chain_state_spec, P(DATA_AXIS), P(DATA_AXIS),
                      adapt_spec, leap_spec),
            out_specs=(chain_state_spec, epoch_trace_spec),
            check_vma=False)
        return fn(carry, x_in, y_in, step_size, leapfrog)

    return run_chunk
