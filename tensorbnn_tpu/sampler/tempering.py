"""Parallel tempering (replica exchange) over the batched chain axis.

Beyond the reference: the reference runs one chain at one temperature
(/root/reference/tensorBNN/network.py:359-507 — a single tfp HMC kernel on
the untempered posterior), so multimodal BNN posteriors (every tanh/relu
network has sign-flip/permutation mode copies) mix only as fast as one HMC
chain tunnels between modes — effectively never once the modes separate.

This module is the TPU-native redesign of replica exchange for that gap:

* the fleet is widened rung-major to ``K * C`` states — rung 0 holds the
  ``C`` cold chains (``beta = 1``, the posterior), rung ``K-1`` the
  hottest (``beta = beta_min``, likelihood nearly off, prior-dominated,
  free to cross between modes). All rungs integrate as ONE ``(K*C, D)``
  HMC wave front — tempering costs a wider batch, not more dispatches,
  which is exactly the axis a TPU's lanes are built for;
* each epoch ends with a *replica swap*: chain ``i`` of rung ``r``
  proposes to exchange its full state ``(theta, eta)`` with chain ``i``
  of rung ``r+1`` (even/odd rung pairing alternating per epoch, the
  classic deterministic-even-odd scheme — every rung participates every
  epoch, and the pairing needs no host control flow). Because the priors
  are untempered (a *power posterior*: ``prior + beta * loglik``), the
  Metropolis swap ratio reduces to ``exp((beta_a - beta_b) *
  (loglik_b - loglik_a))`` — one data log-likelihood evaluation per
  epoch, computed in the same scan, no host round-trip;
* rung-major layout makes each rung a contiguous chain group, so the
  driver reuses the grouped-adaptation machinery unchanged: every rung
  gets its own GP-UCB adapter and its own traced ``(step size,
  leapfrog)`` — hot rungs naturally learn the long steps their flat
  targets allow (the whole point of the ladder).

Detailed balance: each epoch composes (a) per-rung HMC kernels that leave
their tempered targets invariant and (b) an even/odd swap move whose
acceptance is the exact Metropolis ratio for the product target
``prod_r pi_{beta_r}``; both members of a pair share one uniform draw, so
the exchange is symmetric. The cold marginal is the posterior.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_ladder(n_rungs: int, beta_min: float = 0.1) -> np.ndarray:
    """Geometric inverse-temperature ladder, cold first.

    ``beta_r = beta_min ** (r / (K-1))``: rung 0 is the posterior
    (``beta = 1``), rung ``K-1`` the hottest (``beta = beta_min``).
    Geometric spacing equalizes the expected log-likelihood gap between
    neighbors when the likelihood scale is itself geometric in beta —
    the standard default (e.g. Earl & Deem 2005 review).
    """
    if n_rungs < 2:
        raise ValueError(f"n_rungs must be >= 2, got {n_rungs}")
    if not (0.0 < beta_min < 1.0):
        raise ValueError(f"beta_min must be in (0, 1), got {beta_min}")
    r = np.arange(n_rungs, dtype=np.float64)
    return (beta_min ** (r / (n_rungs - 1))).astype(np.float32)


def make_swap_fn(beta: jnp.ndarray, n_rungs: int) -> Callable:
    """Builds the even/odd replica-swap move over a rung-major fleet.

    ``beta``: ``(K,)`` rung inverse temperatures (device constant).
    Returns ``swap(keys, theta, eta, ll, parity) -> (theta, eta,
    swapped)`` where ``theta (K*C, D)``, ``eta (K*C, H)``, ``ll (K*C,)``
    is the raw data log-likelihood at each replica's state, ``keys`` are
    the per-chain PRNG keys ``(K*C,)`` (one uniform drawn per chain; a
    pair consumes the LOW rung member's draw so both sides decide
    identically), and ``parity`` (traced int) selects which rung pairs
    propose this epoch: parity 0 pairs (0,1), (2,3), ...; parity 1 pairs
    (1,2), (3,4), ... ``swapped`` is a ``(K*C,)`` float32 indicator of
    chains that exchanged state this epoch (0 for rungs without a
    partner under this parity).
    """
    k = n_rungs
    rungs = jnp.arange(k)

    def swap(keys, theta, eta, ll, parity):
        c = theta.shape[0] // k
        th = theta.reshape(k, c, -1)
        et = eta.reshape(k, c, -1)
        lv = ll.reshape(k, c)

        is_lo = (rungs % 2) == (parity % 2)
        partner = jnp.where(is_lo, rungs + 1, rungs - 1)
        in_range = (partner >= 0) & (partner <= k - 1)
        partner = jnp.clip(partner, 0, k - 1)
        valid = in_range & (partner != rungs)            # (K,)

        # Metropolis log-ratio for exchanging states between rungs r and
        # partner(r): (beta_r - beta_p) * (ll_p - ll_r). Symmetric in the
        # pair, so both members compute the same number.
        lr = (beta[rungs] - beta[partner])[:, None] * (lv[partner] - lv)

        # one uniform per chain slot; a pair shares the LOW member's draw
        u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(keys)
        u = u.reshape(k, c)
        pair_lo = jnp.minimum(rungs, partner)
        log_u = jnp.log(u[pair_lo])

        accept = (log_u < lr) & valid[:, None]           # (K, C)

        th_new = jnp.where(accept[:, :, None], th[partner], th)
        et_new = jnp.where(accept[:, :, None], et[partner], et)
        return (th_new.reshape(theta.shape), et_new.reshape(eta.shape),
                accept.astype(jnp.float32).reshape(-1))

    return swap
