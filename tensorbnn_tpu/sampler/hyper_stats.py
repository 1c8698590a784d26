"""Sufficient-statistics hyper-chain potential.

During the hyper block, theta is FIXED (two-block Gibbs, reference
network.py:414-440) — yet the generic hyper potential re-reduces the full
parameter arrays (and, when the likelihood couples in via
``main_probs_in_hypers``, re-runs the full-data forward pass) at every
hyper leapfrog step. For Gaussian-prior dense stacks every theta-dependent
term is quadratic, so the whole hyper potential collapses to a function of
per-layer sufficient statistics computed ONCE per epoch:

* per dense block (weights, biases): ``S1 = sum(x)``, ``S2 = sum(x^2)``
  give ``sum((x - loc)^2) = S2 - 2 loc S1 + k loc^2``;
* for the learned-sd Gaussian likelihood: ``R = sum((y - preds)^2)``
  (preds depend on theta only) and the static row count.

Each hyper leapfrog step then costs a few dozen scalar ops per chain
instead of parameter/data-sized reductions — exact to float-association,
not an approximation (verified against the generic potential in
tests/test_hyper_stats.py).

Data-parallel runs psum the R statistic once per epoch instead of once per
hyper leapfrog step (the same collective contract as sampler/potential.py).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LOG_2PI = math.log(2.0 * math.pi)


def _clip_sd(s):
    return jnp.clip(s, 1e-8, 1e8)


def probe_stats_layout(model, likelihood, unravel_eta, eta_dim: int):
    """Probes whether the sufficient-statistics hyper potential applies.

    Returns ``(dense_layers, coupled, sd_idx)`` — ``dense_layers`` a list
    of ``(layer_index, eta-idx dict, k_w, k_b)`` in model order — or None
    when out of scope. The stats row contract shared by ``make_stats_hyper``
    and the fused hyper-trajectory kernel (ops/fused_hyper.py): four rows
    per dense block in this order ``(S1_w, S2_w, S1_b, S2_b)``, then, when
    ``coupled``, the residual power ``R`` and the event count ``K``.

    Scope: every hyper-carrying layer is a GaussianDenseLayer; likelihood
    is FixedGaussian/Bernoulli/Categorical (no coupling) or the learned-sd
    Gaussian (couples through R). Cauchy priors and sampled activation
    slopes are not quadratic in theta and fall back to the generic
    potential.
    """
    from tensorbnn_tpu.likelihoods import BernoulliLikelihood, \
        CategoricalLikelihood, FixedGaussianLikelihood, GaussianLikelihood
    from tensorbnn_tpu.models.layers import GaussianDenseLayer

    # flat-index probe, trace-safe (the chunk runner builds the epoch fn
    # inside a jit/shard_map trace, so unravel_eta on a real array would
    # return tracers): ravel_pytree concatenates leaves in tree-flatten
    # order, so leaf values of unravel(arange) are just cumulative offsets
    shapes = jax.eval_shape(unravel_eta,
                            jax.ShapeDtypeStruct((eta_dim,), jnp.float32))
    leaves, treedef = jax.tree.flatten(shapes)
    idx_leaves, off = [], 0
    for leaf in leaves:
        size = int(np.prod(leaf.shape, dtype=int))
        idx_leaves.append(
            np.arange(off, off + size).reshape(leaf.shape))
        off += size
    probe_h, probe_l = jax.tree.unflatten(treedef, idx_leaves)

    dense_layers = []  # (layer_index, eta idx dict, k_w, k_b)
    for i, (layer, h) in enumerate(zip(model.layers, probe_h)):
        if not h:
            continue
        if not isinstance(layer, GaussianDenseLayer):
            return None
        if set(h) != {"b_loc", "b_scale", "w_loc", "w_scale"}:
            return None
        idx = {k: int(np.asarray(v)) for k, v in h.items()}
        dense_layers.append((i, idx, layer.in_dim * layer.out_dim,
                             layer.out_dim))
    if not dense_layers:
        return None

    coupled = False
    sd_idx = None
    if isinstance(likelihood, GaussianLikelihood):
        if "sd_root" not in probe_l:
            return None
        coupled = True
        sd_idx = int(np.asarray(probe_l["sd_root"]))
    elif not isinstance(likelihood, (FixedGaussianLikelihood,
                                     BernoulliLikelihood,
                                     CategoricalLikelihood)):
        return None
    if likelihood.main_probs_in_hypers != coupled:
        return None  # unexpected coupling contract
    return dense_layers, coupled, sd_idx


def make_stats_hyper(model, likelihood, x, y, unravel_eta,
                     eta_dim: int,
                     axis_name: Optional[str] = None,
                     data_chunk: Optional[int] = None
                     ) -> Optional[Tuple[Callable, Callable]]:
    """Builds ``(stats_fn, hyper_vg, hyper_vg_t)`` or None when out of
    scope.

    * ``stats_fn(params_tree_batched) -> stats (C, S)`` — per-chain
      sufficient statistics (call once per epoch, after the main block).
    * ``hyper_vg(etas (C, H), stats) -> ((C,), (C, H))`` — value and grad
      of the hyper potential, exactly matching
      ``sampler.potential.Potentials.hyper_vg``.
    * ``hyper_vg_t(etas, stats, betas (C,))`` — the tempered variant
      (power posterior: only the coupled likelihood term scales by beta;
      priors and hyperpriors stay untempered), matching ``hyper_vg_t``.
      For uncoupled likelihoods it equals ``hyper_vg`` for any beta.

    Scope: see :func:`probe_stats_layout`.
    """
    layout = probe_stats_layout(model, likelihood, unravel_eta, eta_dim)
    if layout is None:
        return None
    dense_layers, coupled, sd_idx = layout

    # likelihood event count: rows x final output width (gaussian_logprob's
    # k counts every element of the broadcast sigma, likelihoods.py:63-67)
    n_local = int(np.shape(x)[0]) * int(
        model.layers[dense_layers[-1][0]].out_dim)

    # R = sum(resid^2) over the full dataset, once per epoch. With
    # data_chunk set, accumulate it over row chunks (forward-only scan:
    # nothing is differentiated through stats_fn, so the per-chunk
    # activations are freed as the scan advances — same HBM bound as the
    # chunked potential in sampler/potential.py)
    if data_chunk and int(np.shape(x)[0]) % data_chunk == 0 \
            and int(np.shape(x)[0]) // data_chunk > 1:
        n_ch = int(np.shape(x)[0]) // data_chunk
        xs = jnp.reshape(x, (n_ch, data_chunk) + jnp.shape(x)[1:])
        ys = jnp.reshape(jnp.asarray(y), (n_ch, data_chunk)
                         + jnp.shape(y)[1:])

        def resid_sq(params):
            def body(acc, xy):
                xc, yc = xy
                preds = model.apply(params, xc)
                r = jnp.reshape(jnp.asarray(yc, preds.dtype),
                                preds.shape) - preds
                return acc + jnp.sum(r * r), None
            out, _ = lax.scan(body, jnp.zeros((), x.dtype), (xs, ys))
            return out
    else:
        def resid_sq(params):
            preds = model.apply(params, x)
            resid = jnp.reshape(jnp.asarray(y, preds.dtype),
                                preds.shape) - preds
            return jnp.sum(resid * resid)

    def stats_one(params):
        """Per-chain stats from one params pytree."""
        parts = []
        for i, _, _, _ in dense_layers:
            w = params[i]["w"]
            b = params[i]["b"]
            parts.extend([jnp.sum(w), jnp.sum(w * w),
                          jnp.sum(b), jnp.sum(b * b)])
        if coupled:
            parts.append(resid_sq(params))
        return jnp.stack(parts)

    def stats_fn(params_batched):
        stats = jax.vmap(stats_one)(params_batched)          # (C, S)
        if coupled:
            # append the total row count; only the data-dependent R column
            # (and the count) cross shards — prior stats come from
            # replicated theta
            c = stats.shape[0]
            k = jnp.full((c, 1), float(n_local), stats.dtype)
            if axis_name is not None:
                r = lax.psum(stats[:, -1], axis_name)
                stats = jnp.concatenate([stats[:, :-1], r[:, None]],
                                        axis=1)
                k = lax.psum(k, axis_name)
            stats = jnp.concatenate([stats, k], axis=1)
        return stats

    def hyper_logp(eta, stats, beta):
        lp = jnp.asarray(0.0, eta.dtype)
        for j, (i, idx, k_w, k_b) in enumerate(dense_layers):
            w_loc = eta[idx["w_loc"]]
            w_scale = eta[idx["w_scale"]]
            b_loc = eta[idx["b_loc"]]
            b_scale = eta[idx["b_scale"]]
            s1w, s2w, s1b, s2b = (stats[4 * j], stats[4 * j + 1],
                                  stats[4 * j + 2], stats[4 * j + 3])
            # hyperpriors (GaussianDenseLayer.log_hyper_prior,
            # models/layers.py:207-215): N(0, .1) on locs, N(1, .1) on the
            # squared scales
            for v, m in ((w_loc, 0.0), (w_scale ** 2, 1.0),
                         (b_loc, 0.0), (b_scale ** 2, 1.0)):
                z = (v - m) / 0.1
                lp += -0.5 * z * z - jnp.log(0.1) - 0.5 * LOG_2PI
            # conditional priors, reference-exact gaussian_logprob with a
            # scalar sigma (k=1): quad via sufficient stats
            for loc, scale, s1, s2, k in ((w_loc, w_scale, s1w, s2w, k_w),
                                          (b_loc, b_scale, s1b, s2b, k_b)):
                sd = _clip_sd(scale ** 2)
                quad = (s2 - 2.0 * loc * s1 + k * loc * loc) / (sd * sd)
                lp += -0.5 * (2.0 * jnp.log(sd) + quad + LOG_2PI)
        if coupled:
            sd = _clip_sd(eta[sd_idx] ** 2)
            r, k = stats[-2], stats[-1]
            lp += beta * (-0.5 * (2.0 * k * jnp.log(sd) + r / (sd * sd)
                                  + k * LOG_2PI))
        return lp

    hyper_vg = jax.vmap(
        jax.value_and_grad(lambda e, s: hyper_logp(e, s, 1.0)),
        in_axes=(0, 0))
    hyper_vg_t = jax.vmap(jax.value_and_grad(hyper_logp),
                          in_axes=(0, 0, 0))
    return stats_fn, hyper_vg, hyper_vg_t
