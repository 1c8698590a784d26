"""Two-block Gibbs-within-HMC epoch step, scanned on-device in chunks.

The reference crosses the Python<->device boundary twice per epoch and runs
its GP adapter eagerly on host every epoch (SURVEY.md #3.1). Here a whole
*chunk* of epochs — one GP-adapter cycle — runs as a single ``lax.scan``
dispatch: main-chain HMC step, hyper-chain HMC step, and the hyper chain's
dual-averaging step-size update (reference network.py:457-469 constants:
target 0.95, gamma 0.4, t0 10, kappa 0.75, frozen after 80% of burn-in) all
stay device-resident. Squared-jumping distances for the GP-UCB adapter are
computed in the scan and returned as a per-epoch vector, so the host adapter
(:mod:`tensorbnn_tpu.sampler.adapter`) replays them with zero extra traffic.

The step size and leapfrog count enter as *traced* scalars: changing them
between chunks never recompiles (the reference retraces on every leapfrog
change, SURVEY.md #7 hard part 1).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.hmc import hmc_step
from tensorbnn_tpu.sampler.potential import make_potentials

# Dual-averaging constants, matching reference network.py:241-248.
DA_TARGET = 0.95
DA_GAMMA = 0.4
DA_T0 = 10.0
DA_KAPPA = 0.75


class ChainState(NamedTuple):
    """Device-resident carry of the epoch scan."""
    theta: jax.Array         # flat main-chain state (params), (D,)
    eta: jax.Array           # flat hyper-chain state, (H,)
    key: jax.Array           # PRNG key
    hyper_step: jax.Array    # current hyper-chain step size
    log_eps_bar: jax.Array   # dual-averaging log step average
    h: jax.Array             # dual-averaging error accumulator
    epoch: jax.Array         # global epoch counter (float, 0-based)


class EpochTrace(NamedTuple):
    """Per-epoch scan outputs."""
    theta: jax.Array         # state after the epoch, (n_epochs, D)
    eta: jax.Array           # hyper state after the epoch, (n_epochs, H)
    sjd: jax.Array           # squared jumping distance / sqrt(L)
    main_accept: jax.Array   # main-chain accept probability
    hyper_accept: jax.Array  # hyper-chain accept probability


def init_chain_state(theta, eta, key, hyper_step_size,
                     dtype=jnp.float32) -> ChainState:
    zero = jnp.asarray(0.0, dtype)
    return ChainState(
        theta=jnp.asarray(theta, dtype),
        eta=jnp.asarray(eta, dtype),
        key=key,
        hyper_step=jnp.asarray(hyper_step_size, dtype),
        log_eps_bar=zero,
        h=zero,
        epoch=zero,
    )


def make_epoch_fn(model: Sequential, likelihood: Likelihood, x, y,
                  unravel_theta, unravel_eta, *,
                  adjust_hypers: bool,
                  hyper_leapfrog: int,
                  burnin: float,
                  mu: float,
                  axis_name: Optional[str] = None):
    """Builds ``epoch_fn(carry, step_size, leapfrog) -> (carry, trace_row)``.

    ``mu`` is the dual-averaging anchor log(100 * initial hyper step size)
    (reference network.py:248).
    """
    potentials = make_potentials(model, likelihood, x, y,
                                 unravel_theta, unravel_eta,
                                 axis_name=axis_name)

    def epoch_fn(carry: ChainState, step_size, leapfrog):
        key, k_main, k_hyper = jax.random.split(carry.key, 3)
        eta = carry.eta

        # -- main block: HMC over params given current hypers ----------------
        main = hmc_step(k_main, carry.theta,
                        lambda th: potentials.main(th, eta),
                        step_size, leapfrog,
                        value_and_grad_fn=lambda th: potentials.main_vg(
                            th, eta))
        theta = main.position

        # SJD scaled by L^(-1/2) (reference paramAdapter.py:219-222)
        dif = theta - carry.theta
        sjd = jnp.sum(dif * dif) / jnp.sqrt(
            jnp.asarray(leapfrog, theta.dtype))

        hyper_step = carry.hyper_step
        log_eps_bar = carry.log_eps_bar
        h = carry.h
        hyper_accept = jnp.asarray(0.0, theta.dtype)

        if adjust_hypers:
            # -- hyper block: HMC over hypers given new params ---------------
            hyper = hmc_step(k_hyper, eta,
                             lambda e: potentials.hyper(e, theta),
                             hyper_step, hyper_leapfrog,
                             value_and_grad_fn=lambda e: potentials.hyper_vg(
                                 e, theta))
            eta = hyper.position
            hyper_accept = hyper.accept_prob

            # -- dual averaging (reference network.py:457-469) ---------------
            m = carry.epoch + 1.0
            h = (1.0 - 1.0 / (m + DA_T0)) * h + \
                (1.0 / (m + DA_T0)) * (DA_TARGET - hyper_accept)
            log_eps = mu - h * jnp.sqrt(m) / DA_GAMMA
            log_eps_bar = (1.0 - m ** (-DA_KAPPA)) * log_eps_bar + \
                m ** (-DA_KAPPA) * log_eps
            hyper_step = jnp.where(m < burnin * 0.8,
                                   jnp.exp(log_eps_bar), hyper_step)

        new_carry = ChainState(theta=theta, eta=eta, key=key,
                               hyper_step=hyper_step,
                               log_eps_bar=log_eps_bar, h=h,
                               epoch=carry.epoch + 1.0)
        trace = EpochTrace(theta=theta, eta=eta, sjd=sjd,
                           main_accept=main.accept_prob,
                           hyper_accept=hyper_accept)
        return new_carry, trace

    return epoch_fn


def make_chunk_runner(model: Sequential, likelihood: Likelihood, x, y,
                      unravel_theta, unravel_eta, *,
                      adjust_hypers: bool,
                      hyper_leapfrog: int,
                      burnin: float,
                      hyper_step_size_init: float,
                      axis_name: Optional[str] = None,
                      donate: bool = True):
    """Builds a jitted ``run_chunk(carry, step_size, leapfrog, n_epochs)``.

    ``n_epochs`` is static (one compile per distinct chunk length — the
    driver uses at most three: the first adapter cycle, the steady cycle, and
    the remainder); ``step_size``/``leapfrog`` are traced.
    """
    mu = math.log(100.0 * hyper_step_size_init)
    epoch_fn = make_epoch_fn(model, likelihood, x, y,
                             unravel_theta, unravel_eta,
                             adjust_hypers=adjust_hypers,
                             hyper_leapfrog=hyper_leapfrog,
                             burnin=burnin, mu=mu, axis_name=axis_name)

    @functools.partial(jax.jit, static_argnums=(3,),
                       donate_argnums=(0,) if donate else ())
    def run_chunk(carry: ChainState, step_size, leapfrog, n_epochs: int):
        def body(c, _):
            return epoch_fn(c, step_size, leapfrog)
        return lax.scan(body, carry, xs=None, length=n_epochs)

    return run_chunk
