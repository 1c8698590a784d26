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

The epoch step is *natively chain-batched*: every carry leaf has a leading
chain axis and the HMC kernel runs on the whole ``(C, D)`` block as fused
vector ops (``hmc_step_batched``). This keeps the value-and-grad oracle
batched too — the shape a fused Pallas potential kernel consumes — instead
of hiding the chain axis under ``vmap``.

The step size and leapfrog count enter as *traced* scalars: changing them
between chunks never recompiles (the reference retraces on every leapfrog
change, SURVEY.md #7 hard part 1).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.hmc import HMCResult, hmc_step_batched
from tensorbnn_tpu.sampler.potential import make_potentials

# Dual-averaging constants, matching reference network.py:241-248.
DA_TARGET = 0.95
DA_GAMMA = 0.4
DA_T0 = 10.0
DA_KAPPA = 0.75


class ChainState(NamedTuple):
    """Device-resident carry of the epoch scan. All leaves have a leading
    chain axis C."""
    theta: jax.Array         # flat main-chain states, (C, D)
    eta: jax.Array           # flat hyper-chain states, (C, H)
    key: jax.Array           # per-chain PRNG keys, (C,)
    hyper_step: jax.Array    # per-chain hyper step sizes, (C,)
    log_eps_bar: jax.Array   # dual-averaging log step average, (C,)
    h: jax.Array             # dual-averaging error accumulator, (C,)
    epoch: jax.Array         # global epoch counter (float), (C,)


class EpochTrace(NamedTuple):
    """Per-epoch scan outputs (per chain)."""
    theta: jax.Array         # (n_epochs, C, D)
    eta: jax.Array           # (n_epochs, C, H)
    sjd: jax.Array           # (n_epochs, C)
    main_accept: jax.Array   # (n_epochs, C)
    hyper_accept: jax.Array  # (n_epochs, C)
    #: first U-turn step of each main-block trajectory (int32; 0 = none
    #: within L, or U-turn recording off) — feeds the driver's
    #: NUTS-style dynamic trajectory-length adaptation
    uturn: jax.Array = None  # (n_epochs, C)
    #: replica-swap indicator per chain (1.0 = this chain exchanged state
    #: this epoch; None when tempering is off) — sampler/tempering.py
    swap_accept: jax.Array = None  # (n_epochs, C)


def make_epoch_fn(model: Sequential, likelihood: Likelihood, x, y,
                  unravel_theta, unravel_eta, *,
                  adjust_hypers: bool,
                  hyper_leapfrog: int,
                  burnin: float,
                  mu: float,
                  axis_name: Optional[str] = None,
                  batched_main_vg: Optional[Callable] = None,
                  batched_main_traj: Optional[Callable] = None,
                  batched_hyper_traj: Optional[Callable] = None,
                  eta_dim: Optional[int] = None,
                  data_chunk: Optional[int] = None,
                  step_scale=None,
                  record_uturn: bool = False,
                  compensated: bool = False,
                  tempering_beta=None):
    """Builds ``epoch_fn(carry, step_size, leapfrog) -> (carry, trace_row)``
    over a chain-batched carry.

    ``mu`` is the dual-averaging anchor log(100 * initial hyper step size)
    (reference network.py:248). ``batched_main_vg`` optionally overrides the
    main-block value-and-grad with a natively batched oracle (e.g. a fused
    Pallas kernel): ``f(thetas (C, D), etas (C, H), x, y) -> ((C,), (C, D))``
    — it receives this epoch fn's (possibly shard-local) data and handles
    its own ``axis_name`` psum. ``batched_main_traj`` goes further: a full
    leapfrog-trajectory oracle ``f(thetas, etas, momenta, x, y, eps, L) ->
    (q, v, lp0, lp1)`` (the fused trajectory kernel); the MH accept stays
    here, drawing the identical PRNG stream as ``hmc_step_batched``.
    ``batched_hyper_traj`` is the hyper-block analogue (the fused hyper
    trajectory kernel, ops/fused_hyper.py): ``f(etas (C, H), stats,
    momenta, eps (C,)) -> (q, v, lp0, lp1)`` — it consumes the stats
    potential's sufficient statistics, so it only engages when the stats
    form applies.

    ``compensated``: Kahan-compensated main-block integrator
    accumulation (sampler/hmc.py) for targets whose stable step size
    sits within a few ulps of the state magnitude. Main block only: the
    hyper chain's state is O(1) with step sizes >= ~1e-6, two orders of
    magnitude clear of the f32 quantization regime. Incompatible with
    the fused trajectory kernel (the kernel integrates in-program; the
    driver simply does not build it for compensated runs).

    ``tempering_beta``: per-chain ``(C,)`` inverse temperatures for
    parallel tempering (sampler/tempering.py; rung-major over the chain
    axis). When set, both HMC blocks target the power posterior
    ``prior + beta * loglik`` and every epoch ends with an even/odd
    replica-swap move (parity from the epoch counter). The trajectory
    kernel supports tempering natively (built with ``tempered=True``,
    beta as a traced lane vector); the per-step potential kernel
    (``batched_main_vg``) bakes the untempered posterior, so the driver
    never passes it for tempered runs.
    """
    if compensated and batched_main_traj is not None:
        raise ValueError("compensated leapfrog is handled by the XLA "
                         "kernels; build without batched_main_traj")
    potentials = make_potentials(model, likelihood, x, y,
                                 unravel_theta, unravel_eta,
                                 axis_name=axis_name,
                                 data_chunk=data_chunk)
    tempered = tempering_beta is not None
    if tempered:
        # (n_rungs, per-rung betas already repeated per chain rung-major)
        n_rungs, beta_full = tempering_beta
        beta_np = np.asarray(beta_full, np.float32)
        beta_c = jnp.asarray(beta_np)                  # (C,)
        main_vg_bt = jax.vmap(potentials.main_vg_t, in_axes=(0, 0, 0))
        hyper_vg_bt = jax.vmap(potentials.hyper_vg_t, in_axes=(0, 0, 0))
        loglik_b = jax.vmap(potentials.loglik)
        from tensorbnn_tpu.sampler.tempering import make_swap_fn
        ladder = jnp.asarray(beta_np.reshape(n_rungs, -1)[:, 0])
        swap_fn = make_swap_fn(ladder, n_rungs)
    if batched_main_vg is not None:
        main_vg_b = lambda ths, etas: batched_main_vg(ths, etas, x, y)  # noqa: E731
    else:
        main_vg_b = jax.vmap(potentials.main_vg)
    hyper_vg_b = jax.vmap(potentials.hyper_vg)

    # sufficient-stats hyper potential: theta is fixed during the hyper
    # block, so its quadratic reductions (and the coupled likelihood's
    # full-data term) are computed once per epoch instead of once per
    # hyper leapfrog step (sampler/hyper_stats.py; exact, not approximate)
    stats_pair = None
    if adjust_hypers and eta_dim is not None:
        from tensorbnn_tpu.sampler.hyper_stats import make_stats_hyper
        stats_pair = make_stats_hyper(model, likelihood, x, y,
                                      unravel_eta, eta_dim,
                                      axis_name=axis_name,
                                      data_chunk=data_chunk)
    unravel_theta_b = jax.vmap(unravel_theta)

    def epoch_fn(carry: ChainState, step_size, leapfrog):
        n_keys = 4 if tempered else 3
        keys2 = jax.vmap(lambda k: jax.random.split(k, n_keys))(carry.key)
        key, k_main, k_hyper = keys2[:, 0], keys2[:, 1], keys2[:, 2]
        k_swap = keys2[:, 3] if tempered else None
        eta = carry.eta

        # -- main block: HMC over params given current hypers ----------------
        # (the trajectory kernel takes a scalar eps in SMEM; the driver
        # never combines it with a per-coordinate step_scale)
        main_uturn = None
        if batched_main_traj is not None:
            # same per-chain PRNG substreams as hmc_step_batched
            km2 = jax.vmap(lambda k: jax.random.split(k))(k_main)
            key_mom, key_mh = km2[:, 0], km2[:, 1]
            momenta = jax.vmap(
                lambda k: jax.random.normal(k, carry.theta.shape[1:],
                                            carry.theta.dtype))(key_mom)
            # tempered runs ride the kernel's power-posterior program
            # (built with tempered=True by the driver): beta is one more
            # traced lane vector
            t_args = (carry.theta, eta, momenta, x, y, step_size,
                      leapfrog) + ((beta_c,) if tempered else ())
            if record_uturn:
                # the kernel records the U-turn step in-program (built
                # with record_uturn=True by the driver)
                q_new, v_new, lp0, lp1, main_uturn = batched_main_traj(
                    *t_args)
            else:
                q_new, v_new, lp0, lp1 = batched_main_traj(*t_args)
            kinetic0 = 0.5 * jnp.sum(momenta * momenta, axis=-1)
            kinetic1 = 0.5 * jnp.sum(v_new * v_new, axis=-1)
            lar = (lp1 - lp0) + (kinetic0 - kinetic1)
            lar = jnp.where(jnp.isnan(lar), -jnp.inf, lar)
            accept_prob = jnp.minimum(1.0, jnp.exp(lar))
            log_u = jnp.log(jax.vmap(
                lambda k: jax.random.uniform(k, (), carry.theta.dtype))(
                key_mh))
            accepted = log_u < lar
            new_theta = jnp.where(accepted[:, None], q_new, carry.theta)
            main = HMCResult(new_theta, jnp.where(accepted, lp1, lp0),
                             accept_prob, accepted, uturn=main_uturn)
        else:
            if tempered:
                main_vg_fn = lambda ths: main_vg_bt(ths, eta, beta_c)  # noqa: E731
            else:
                main_vg_fn = lambda ths: main_vg_b(ths, eta)  # noqa: E731
            main = hmc_step_batched(
                k_main, carry.theta, main_vg_fn,
                step_size, leapfrog, step_scale=step_scale,
                record_uturn=record_uturn, compensated=compensated)
        theta = main.position

        # SJD scaled by L^(-1/2) (reference paramAdapter.py:219-222)
        dif = theta - carry.theta
        sjd = jnp.sum(dif * dif, axis=-1) / jnp.sqrt(
            jnp.asarray(leapfrog, theta.dtype))

        hyper_step = carry.hyper_step
        log_eps_bar = carry.log_eps_bar
        h = carry.h
        hyper_accept = jnp.zeros_like(sjd)

        if adjust_hypers:
            # -- hyper block: HMC over hypers given new params ---------------
            # (tempered + likelihood-coupled hypers run the stats
            # potential's TEMPERED variant — beta scales only the
            # coupled likelihood term, so hyper leapfrog stays data-free
            # per step; the fused hyper kernel bakes beta=1 and is
            # bypassed for that combination only)
            tempered_coupled = tempered and likelihood.main_probs_in_hypers
            stats = None
            if stats_pair is not None:
                stats_f, hyper_vg_stats, hyper_vg_stats_t = stats_pair
                stats = stats_f(unravel_theta_b(theta))
            if (batched_hyper_traj is not None and stats is not None
                    and not tempered_coupled):
                # fused hyper-trajectory kernel; identical PRNG
                # substreams and MH as hmc_step_batched
                kh2 = jax.vmap(lambda k: jax.random.split(k))(k_hyper)
                kh_mom, kh_mh = kh2[:, 0], kh2[:, 1]
                h_mom = jax.vmap(
                    lambda k: jax.random.normal(k, eta.shape[1:],
                                                eta.dtype))(kh_mom)
                hq, hv, hlp0, hlp1 = batched_hyper_traj(
                    eta, stats, h_mom, hyper_step)
                hk0 = 0.5 * jnp.sum(h_mom * h_mom, axis=-1)
                hk1 = 0.5 * jnp.sum(hv * hv, axis=-1)
                hlar = (hlp1 - hlp0) + (hk0 - hk1)
                hlar = jnp.where(jnp.isnan(hlar), -jnp.inf, hlar)
                hyper_accept = jnp.minimum(1.0, jnp.exp(hlar))
                h_log_u = jnp.log(jax.vmap(
                    lambda k: jax.random.uniform(k, (), eta.dtype))(
                    kh_mh))
                eta = jnp.where((h_log_u < hlar)[:, None], hq, eta)
            else:
                if stats is not None and tempered_coupled:
                    hyper_vg_fn = lambda es: hyper_vg_stats_t(es, stats, beta_c)  # noqa: E731
                elif stats is not None:
                    hyper_vg_fn = lambda es: hyper_vg_stats(es, stats)  # noqa: E731
                elif tempered:
                    hyper_vg_fn = lambda es: hyper_vg_bt(es, theta, beta_c)  # noqa: E731
                else:
                    hyper_vg_fn = lambda es: hyper_vg_b(es, theta)  # noqa: E731
                hyper = hmc_step_batched(
                    k_hyper, eta, hyper_vg_fn,
                    hyper_step[:, None], hyper_leapfrog)
                eta = hyper.position
                hyper_accept = hyper.accept_prob

            # -- dual averaging (reference network.py:457-469), per chain ----
            m = carry.epoch + 1.0
            h = (1.0 - 1.0 / (m + DA_T0)) * h + \
                (1.0 / (m + DA_T0)) * (DA_TARGET - hyper_accept)
            log_eps = mu - h * jnp.sqrt(m) / DA_GAMMA
            log_eps_bar = (1.0 - m ** (-DA_KAPPA)) * log_eps_bar + \
                m ** (-DA_KAPPA) * log_eps
            hyper_step = jnp.where(m < burnin * 0.8,
                                   jnp.exp(log_eps_bar), hyper_step)

        swapped = None
        if tempered:
            # -- replica swap (even/odd rung pairing by epoch parity) --------
            # SJD above is already computed from the HMC move alone, so
            # the adapter never sees a swap as a "jump"
            ll = loglik_b(theta, eta)
            parity = jnp.asarray(carry.epoch[0], jnp.int32)
            theta, eta, swapped = swap_fn(k_swap, theta, eta, ll, parity)

        new_carry = ChainState(theta=theta, eta=eta, key=key,
                               hyper_step=hyper_step,
                               log_eps_bar=log_eps_bar, h=h,
                               epoch=carry.epoch + 1.0)
        trace = EpochTrace(theta=theta, eta=eta, sjd=sjd,
                           main_accept=main.accept_prob,
                           hyper_accept=hyper_accept,
                           uturn=(main.uturn if main.uturn is not None
                                  else jnp.zeros_like(sjd, jnp.int32)),
                           swap_accept=swapped)
        return new_carry, trace

    return epoch_fn


def make_tree_epoch_fn(model: Sequential, likelihood: Likelihood, x, y,
                       unravel_eta, *,
                       adjust_hypers: bool,
                       hyper_leapfrog: int,
                       burnin: float,
                       mu: float,
                       unravel_theta=None,
                       theta_dim: int = None,
                       axis_name: Optional[str] = None,
                       eta_dim: Optional[int] = None,
                       data_chunk: Optional[int] = None,
                       step_scale=None,
                       record_uturn: bool = False,
                       compensated: bool = False):
    """Tree-state epoch step for wide models.

    The main-chain state lives as a stacked params pytree (leaves (C, ...))
    — no ravel/unravel inside the leapfrog loop, which costs 2-7x on wide
    models and big datasets (benchmarks/PERF_NOTES.md). The hyper state
    stays flat (it is tiny). ``carry.theta`` is the pytree; the chunk runner
    converts to/from the flat layout at chunk boundaries only.

    With ``axis_name``, ``x``/``y`` are data shards and the likelihood value
    and gradient tree are ``psum``'d (explicitly — same collective-
    correctness rule as the flat potentials).
    """
    from jax import lax
    from tensorbnn_tpu.sampler.hmc import hmc_step_tree
    from tensorbnn_tpu.sampler.potential import _chunked_loglik

    chunked = _chunked_loglik(model, likelihood, x, y, data_chunk)

    # diagonal-metric preconditioner: per-coordinate step multipliers as a
    # params-shaped tree (leaves without the chain axis — broadcast over
    # chains inside the integrator)
    scale_tree = None
    if step_scale is not None:
        if unravel_theta is None:
            raise ValueError("step_scale needs unravel_theta")
        scale_tree = unravel_theta(jnp.asarray(step_scale))

    def loglik(params, eta):
        _, lik_hypers = unravel_eta(eta)
        if chunked is not None:
            return chunked(params, lik_hypers)
        preds = model.apply(params, x)
        return likelihood.log_likelihood(preds, y, lik_hypers)

    def main_prior(params, eta):
        hypers, _ = unravel_eta(eta)
        return model.log_prior(hypers, params)

    lik_vg = jax.vmap(jax.value_and_grad(loglik))
    prior_vg = jax.vmap(jax.value_and_grad(main_prior))

    def main_vg(params, eta):
        lv, lg = lik_vg(params, eta)
        if axis_name is not None:
            lv, lg = lax.psum((lv, lg), axis_name)
        pv, pg = prior_vg(params, eta)
        return lv + pv, jax.tree.map(jnp.add, lg, pg)

    def hyper_rep(eta, params):
        hypers, _ = unravel_eta(eta)
        return model.log_hyper_prior(hypers, params)

    hyper_rep_vg = jax.vmap(jax.value_and_grad(hyper_rep))
    if likelihood.main_probs_in_hypers:
        hyper_lik_vg = jax.vmap(jax.value_and_grad(
            lambda eta, params: loglik(params, eta)))

    def hyper_vg(eta, params):
        rv, rg = hyper_rep_vg(eta, params)
        if likelihood.main_probs_in_hypers:
            lv, lg = hyper_lik_vg(eta, params)
            if axis_name is not None:
                lv, lg = lax.psum((lv, lg), axis_name)
            rv, rg = rv + lv, rg + lg
        return rv, rg

    # sufficient-stats hyper potential (see make_epoch_fn) — the big win
    # here: for coupled likelihoods over big data the full-data forward
    # runs once per epoch, not once per hyper leapfrog step
    stats_pair = None
    if adjust_hypers and eta_dim is not None:
        from tensorbnn_tpu.sampler.hyper_stats import make_stats_hyper
        stats_pair = make_stats_hyper(model, likelihood, x, y,
                                      unravel_eta, eta_dim,
                                      axis_name=axis_name,
                                      data_chunk=data_chunk)

    momentum_fn = None
    if unravel_theta is not None and theta_dim is not None:
        # draw the flat (C, D) momentum then unravel: identical PRNG
        # stream to the flat layout (bitwise-comparable runs)
        def momentum_fn(key_mom):
            flat_mom = jax.vmap(
                lambda k: jax.random.normal(k, (theta_dim,)))(key_mom)
            return jax.vmap(unravel_theta)(flat_mom)

    def epoch_fn(carry: ChainState, step_size, leapfrog):
        keys2 = jax.vmap(lambda k: jax.random.split(k, 3))(carry.key)
        key, k_main, k_hyper = keys2[:, 0], keys2[:, 1], keys2[:, 2]
        eta = carry.eta

        main = hmc_step_tree(k_main, carry.theta,
                             lambda p: main_vg(p, eta),
                             step_size, leapfrog,
                             momentum_fn=momentum_fn,
                             scale_tree=scale_tree,
                             record_uturn=record_uturn,
                             compensated=compensated)
        theta = main.position

        # SJD scaled by L^(-1/2), tree-reduced per chain
        sjd = None
        for new, old in zip(jax.tree.leaves(theta),
                            jax.tree.leaves(carry.theta)):
            d = new - old
            s = jnp.sum(d * d, axis=tuple(range(1, d.ndim)))
            sjd = s if sjd is None else sjd + s
        sjd = sjd / jnp.sqrt(jnp.asarray(leapfrog, sjd.dtype))

        hyper_step = carry.hyper_step
        log_eps_bar = carry.log_eps_bar
        h = carry.h
        hyper_accept = jnp.zeros_like(sjd)

        if adjust_hypers:
            from tensorbnn_tpu.sampler.hmc import hmc_step_batched
            if stats_pair is not None:
                # tree layout never tempers (driver-rejected), so the
                # untempered stats variant is the only one used here
                stats_f, hyper_vg_stats, _ = stats_pair
                stats = stats_f(theta)
                hyper_vg_fn = lambda es: hyper_vg_stats(es, stats)  # noqa: E731
            else:
                hyper_vg_fn = lambda es: hyper_vg(es, theta)  # noqa: E731
            hyper = hmc_step_batched(
                k_hyper, eta, hyper_vg_fn,
                hyper_step[:, None], hyper_leapfrog)
            eta = hyper.position
            hyper_accept = hyper.accept_prob

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
                           hyper_accept=hyper_accept,
                           uturn=(main.uturn if main.uturn is not None
                                  else jnp.zeros_like(sjd, jnp.int32)))
        return new_carry, trace

    return epoch_fn
