"""Hamiltonian Monte Carlo kernel as a jitted leapfrog integrator.

This replaces the reference's per-epoch construction of
``tfp.mcmc.HamiltonianMonteCarlo`` kernels inside ``stepMCMC``
(/root/reference/tensorBNN/network.py:394-408) with a from-scratch,
TPU-native kernel:

* The integrator runs as a ``lax.while_loop`` with a *traced* leapfrog count,
  so the GP-UCB adapter can change L every cycle without triggering a
  recompile — the reference retraces its jitted step every time the leapfrog
  count changes (SURVEY.md #7 hard part 1).
* The state is a single flat vector (callers flatten their pytrees once with
  ``ravel_pytree``), so every leapfrog update is one fused VPU-friendly
  vector op instead of a tree of tiny kernels, and chains batch cleanly under
  ``vmap`` into ``(chains, D)`` arrays that tile onto the TPU.
* The gradient oracle is pluggable (``value_and_grad_fn``): data-parallel
  potentials supply a collective-correct value-and-grad that ``psum``s the
  likelihood term over the mesh's data axis (see sampler/potential.py).
* Metropolis accept probability matches the reference's reporting:
  ``min(1, exp(log_accept_ratio))`` (network.py:410-411).

Gradients do not flow through the sampler (the reference sets
``state_gradients_are_stopped=True``, network.py:266-446; in JAX nothing is
differentiated through the kernel to begin with).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _kahan_add(s, c, d):
    """One compensated accumulation step (Kahan 1965): returns the new
    rounded running sum and carried rounding error, tracking the true sum
    to ~twice the working precision using only working-precision ops —
    the TPU-native alternative to f64 state (no native f64 on the VPU).

    Why the integrator needs it: a plain f32 drift ``q + eps*v`` loses
    ``ulp(|q|)`` per step. Once ``|eps*v|`` falls within a few ulps of
    ``|q|`` the integration error per step is tens of percent, and below
    one ulp the position silently freezes. Measured on the 1M-point
    surrogate (benchmarks/PERF_NOTES.md round 4): its posterior widths
    force ``eps ~ 1e-7`` against ``|theta| ~ 0.1`` — ulp(0.1) = 7.5e-9 —
    so the U-turn controller's step-size search walked straight into the
    quantization regime (acceptance 0.05 at eps 3.8e-8, paradoxically
    *rising* as eps shrank further: classic quantized-drift signature).
    Two extra vector ops per step is free next to a 1M-point gradient.
    """
    y = d - c
    t = s + y
    return t, (t - s) - y


class HMCResult(NamedTuple):
    position: jax.Array      # new flat position, (D,)
    log_prob: jax.Array      # log target density at the new position
    accept_prob: jax.Array   # min(1, exp(log_accept_ratio))
    accepted: jax.Array      # bool, whether the proposal was accepted
    #: first leapfrog step where the trajectory U-turned away from its
    #: start (0 = no U-turn within the executed length); only populated
    #: by the batched/tree kernels when ``record_uturn`` is requested
    uturn: Optional[jax.Array] = None


def leapfrog(log_prob_fn: Callable, position: jax.Array,
             momentum: jax.Array, step_size, n_steps,
             value_and_grad_fn: Optional[Callable] = None) -> tuple:
    """Runs ``n_steps`` leapfrog steps; ``n_steps`` may be a traced scalar.

    Uses the standard half-kick / full-drift formulation: one initial half
    momentum kick, then n position drifts each followed by a full kick, with
    the final kick corrected back to a half step. Total gradient evaluations:
    ``n_steps + 1``.

    Returns ``(position, momentum, log_prob, grad)`` at the endpoint.
    """
    vg = value_and_grad_fn or jax.value_and_grad(log_prob_fn)

    lp0, g0 = vg(position)
    # initial half kick
    momentum = momentum + 0.5 * step_size * g0

    def cond(carry):
        i, *_ = carry
        return i < n_steps

    def body(carry):
        i, q, v, _lp, _g = carry
        q = q + step_size * v
        lp, g = vg(q)
        v = v + step_size * g
        return (i + 1, q, v, lp, g)

    _, q, v, lp, g = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), position, momentum, lp0, g0))
    # the loop applied a full kick after the last drift; pull it back to half
    v = v - 0.5 * step_size * g
    return q, v, lp, g


def hmc_step(key, position: jax.Array, log_prob_fn: Callable,
             step_size, n_leapfrog, current_log_prob=None,
             value_and_grad_fn: Optional[Callable] = None) -> HMCResult:
    """One HMC transition on a flat state vector.

    Arguments:
        * key: PRNG key for momentum and the MH coin.
        * position: flat state, shape (D,).
        * log_prob_fn: scalar log target density of a flat state.
        * step_size: leapfrog step size (traced scalar ok).
        * n_leapfrog: leapfrog step count (traced scalar ok — no recompiles).
        * current_log_prob: optional cached log density at ``position``.
        * value_and_grad_fn: optional collective-correct (value, grad)
          oracle; defaults to ``jax.value_and_grad(log_prob_fn)``.
    """
    key_mom, key_mh = jax.random.split(key)
    momentum = jax.random.normal(key_mom, position.shape, position.dtype)

    if current_log_prob is None:
        current_log_prob = log_prob_fn(position)

    kinetic0 = 0.5 * jnp.sum(momentum * momentum)
    q_new, v_new, lp_new, _ = leapfrog(
        log_prob_fn, position, momentum, step_size, n_leapfrog,
        value_and_grad_fn=value_and_grad_fn)
    kinetic1 = 0.5 * jnp.sum(v_new * v_new)

    log_accept_ratio = (lp_new - current_log_prob) + (kinetic0 - kinetic1)
    # guard against NaN proposals (diverged trajectories): always reject
    log_accept_ratio = jnp.where(jnp.isnan(log_accept_ratio),
                                 -jnp.inf, log_accept_ratio)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept_ratio))

    log_u = jnp.log(jax.random.uniform(key_mh, (), position.dtype))
    accepted = log_u < log_accept_ratio

    position = jnp.where(accepted, q_new, position)
    log_prob = jnp.where(accepted, lp_new, current_log_prob)
    return HMCResult(position, log_prob, accept_prob, accepted)


def leapfrog_batched(vg_fn: Callable, positions: jax.Array,
                     momenta: jax.Array, step_size, n_steps,
                     record_uturn: bool = False,
                     uturn_inv_scale=None,
                     compensated: bool = False) -> tuple:
    """Chain-batched leapfrog: positions (C, D), vg_fn (C, D) -> ((C,), (C, D)).

    ``step_size`` is a traced scalar or a per-chain ``(C, 1)`` column;
    ``n_steps`` a traced scalar or a per-chain ``(C,)`` vector (the
    ``n_adapters`` per-chain-group adaptation mode). With a shared step
    count the batch runs as single fused (C, D) vector ops — no per-chain
    vmap overhead, and the value-and-grad oracle sees the whole chain block
    at once (the shape a fused Pallas potential kernel wants). With
    per-chain counts the loop runs to ``max(n_steps)`` with finished chains
    mask-frozen: one wave-front batch still beats per-chain programs, but
    every chain pays the longest trajectory's wall clock.

    ``record_uturn``: additionally returns a per-chain ``(C,)`` int32 of
    the first step index (1-based) where the trajectory turned back
    toward its start — ``(q_i - q_0) . v_i < 0``, the NUTS stopping
    criterion applied to a single forward trajectory (eHMC, Wu et al.
    2018) — or 0 if it never U-turned within the executed length. One
    elementwise multiply+reduce per step, negligible next to the gradient
    evaluation. ``uturn_inv_scale`` (``(D,)``): with a diagonal-metric
    preconditioner the check runs in the *transformed* space where
    momenta are isotropic — the displacement is divided by the metric
    scale (pass ``1/step_scale``).

    ``compensated``: Kahan-compensated drift and kick accumulation (see
    ``_kahan_add``) — opt in for targets whose stable step size is tiny
    relative to the state magnitude (big-data posteriors: the 1M-point
    surrogate needs eps within a few ulps of ``|theta|``, where the
    plain f32 update quantizes or freezes). Off by default: the plain
    path compiles the exact same program as before the option existed.
    """
    lp0, g0 = vg_fn(positions)
    momenta = momenta + 0.5 * step_size * g0
    q0 = positions

    def uturn_proj(q, v):
        d = q - q0
        if uturn_inv_scale is not None:
            d = d * jnp.reshape(uturn_inv_scale, (1, -1))
        return jnp.sum(d * v, axis=-1)

    if jnp.ndim(n_steps) == 0:
        def cond(carry):
            i, *_ = carry
            return i < n_steps

        if compensated:
            def body(carry):
                i, q, cq, v, cv, _lp, _g, ut = carry
                q, cq = _kahan_add(q, cq, step_size * v)
                lp, g = vg_fn(q)
                v, cv = _kahan_add(v, cv, step_size * g)
                if record_uturn:
                    ut = jnp.where((ut == 0) & (uturn_proj(q, v) < 0),
                                   i + 1, ut)
                return (i + 1, q, cq, v, cv, lp, g, ut)
        else:
            def body(carry):
                i, q, v, _lp, _g, ut = carry
                q = q + step_size * v
                lp, g = vg_fn(q)
                v = v + step_size * g
                if record_uturn:
                    ut = jnp.where((ut == 0) & (uturn_proj(q, v) < 0),
                                   i + 1, ut)
                return (i + 1, q, v, lp, g, ut)
    else:
        n_vec = jnp.reshape(n_steps, (-1,))
        cap = jnp.max(n_vec)

        def cond(carry):
            i, *_ = carry
            return i < cap

        if compensated:
            def body(carry):
                # frozen chains keep (q, cq, v, cv) untouched — gating
                # the *outputs* rather than zeroing the increment, so a
                # pending compensation never leaks into a frozen chain
                i, q, cq, v, cv, _lp, _g, ut = carry
                act = (i < n_vec)[:, None]
                qn, cqn = _kahan_add(q, cq, step_size * v)
                q = jnp.where(act, qn, q)
                cq = jnp.where(act, cqn, cq)
                lp, g = vg_fn(q)
                vn, cvn = _kahan_add(v, cv, step_size * g)
                v = jnp.where(act, vn, v)
                cv = jnp.where(act, cvn, cv)
                if record_uturn:
                    ut = jnp.where((ut == 0) & act[:, 0]
                                   & (uturn_proj(q, v) < 0), i + 1, ut)
                return (i + 1, q, cq, v, cv, lp, g, ut)
        else:
            def body(carry):
                # frozen chains (i >= their L) drift/kick by zero; vg_fn
                # re-evaluates at the unchanged position, so the endpoint
                # (lp, g) they carry out stays exact
                i, q, v, _lp, _g, ut = carry
                act = (i < n_vec)[:, None]
                q = q + jnp.where(act, step_size * v, 0.0)
                lp, g = vg_fn(q)
                v = v + jnp.where(act, step_size * g, 0.0)
                if record_uturn:
                    ut = jnp.where((ut == 0) & act[:, 0]
                                   & (uturn_proj(q, v) < 0), i + 1, ut)
                return (i + 1, q, v, lp, g, ut)

    uturn0 = jnp.zeros(positions.shape[0], jnp.int32)
    if compensated:
        zeros = jnp.zeros_like(positions)
        _, q, _cq, v, _cv, lp, g, uturn = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), positions, zeros,
                         momenta, zeros, lp0, g0, uturn0))
    else:
        _, q, v, lp, g, uturn = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), positions, momenta,
                         lp0, g0, uturn0))
    v = v - 0.5 * step_size * g
    if record_uturn:
        return q, v, lp, g, uturn
    return q, v, lp, g


def hmc_step_batched(keys, positions: jax.Array, vg_fn: Callable,
                     step_size, n_leapfrog,
                     current_log_prob=None,
                     step_scale=None,
                     record_uturn: bool = False,
                     compensated: bool = False) -> HMCResult:
    """One HMC transition over a (C, D) chain batch with per-chain keys.

    All per-chain quantities (momenta, energies, MH coins, accepts) are
    vectors; the integrator is shared. Matches ``vmap(hmc_step)`` draws
    exactly (same per-chain PRNG substreams) while compiling to plain
    batched ops. ``step_size`` may be a scalar, ``(C,)`` or ``(C, 1)``;
    ``n_leapfrog`` a scalar or ``(C,)`` (see ``leapfrog_batched``).

    ``step_scale`` (optional, ``(D,)``): per-coordinate step multiplier —
    the diagonal-metric preconditioner. Leapfrog with
    ``eps_i = eps * s_i`` under unit-normal momenta is exactly HMC with
    diagonal mass ``m_i = 1/s_i^2`` (Neal 2011 §4.1 / Stan's diag_e
    metric): momenta and kinetic energy stay standard normal, so the MH
    correction is unchanged and detailed balance holds.

    ``record_uturn``: populate ``HMCResult.uturn`` with each chain's
    first U-turn step (see ``leapfrog_batched``; the check runs in the
    metric-transformed space when ``step_scale`` is given).

    ``compensated``: Kahan-compensated integrator accumulation for
    tiny-eps regimes (see ``leapfrog_batched``). Detailed balance is
    untouched — compensation only changes *how accurately* the
    deterministic leapfrog map is evaluated in f32, not the map being
    approximated, and the MH correction already absorbs integrator
    error of either size.
    """
    if jnp.ndim(step_size) == 1:
        step_size = step_size[:, None]
    inv_scale = None
    if step_scale is not None:
        step_size = step_size * jnp.reshape(step_scale, (1, -1))
        if record_uturn:
            inv_scale = 1.0 / jnp.reshape(step_scale, (-1,))
    keys2 = jax.vmap(lambda k: jax.random.split(k))(keys)   # (C, 2)
    key_mom, key_mh = keys2[:, 0], keys2[:, 1]
    momenta = jax.vmap(
        lambda k: jax.random.normal(k, positions.shape[1:],
                                    positions.dtype))(key_mom)

    if current_log_prob is None:
        current_log_prob, _ = vg_fn(positions)

    kinetic0 = 0.5 * jnp.sum(momenta * momenta, axis=-1)
    uturn = None
    if record_uturn:
        q_new, v_new, lp_new, _, uturn = leapfrog_batched(
            vg_fn, positions, momenta, step_size, n_leapfrog,
            record_uturn=True, uturn_inv_scale=inv_scale,
            compensated=compensated)
    else:
        q_new, v_new, lp_new, _ = leapfrog_batched(
            vg_fn, positions, momenta, step_size, n_leapfrog,
            compensated=compensated)
    kinetic1 = 0.5 * jnp.sum(v_new * v_new, axis=-1)

    log_accept_ratio = (lp_new - current_log_prob) + (kinetic0 - kinetic1)
    log_accept_ratio = jnp.where(jnp.isnan(log_accept_ratio),
                                 -jnp.inf, log_accept_ratio)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept_ratio))

    log_u = jnp.log(jax.vmap(
        lambda k: jax.random.uniform(k, (), positions.dtype))(key_mh))
    accepted = log_u < log_accept_ratio

    positions = jnp.where(accepted[:, None], q_new, positions)
    log_prob = jnp.where(accepted, lp_new, current_log_prob)
    return HMCResult(positions, log_prob, accept_prob, accepted,
                     uturn=uturn)


# -- pytree-state variant ------------------------------------------------------
# For wide models the flat-vector layout pays a ravel/unravel round-trip per
# gradient evaluation (~1.8x on a 10x256 MLP, benchmarks/PERF_NOTES.md);
# these tree-native kernels keep the chain state as a stacked params pytree
# (every leaf (C, ...)) and never flatten inside the leapfrog loop.

def _tree_randn_like(keys, tree):
    """Per-chain, per-leaf standard normals (keys: (C,) chain keys)."""
    leaves, treedef = jax.tree.flatten(tree)
    outs = []
    for i, leaf in enumerate(leaves):
        leaf_keys = jax.vmap(lambda k, i=i: jax.random.fold_in(k, i))(keys)
        outs.append(jax.vmap(
            lambda k, s=leaf.shape[1:], d=leaf.dtype:
            jax.random.normal(k, s, d))(leaf_keys))
    return jax.tree.unflatten(treedef, outs)


def _tree_sum_sq(tree):
    """Per-chain sum of squares over all leaves -> (C,)."""
    total = None
    for leaf in jax.tree.leaves(tree):
        s = jnp.sum(leaf * leaf, axis=tuple(range(1, leaf.ndim)))
        total = s if total is None else total + s
    return total


def _tree_axpy(a, x_tree, y_tree, scale_tree=None):
    """y + a * x, leafwise (a scalar or (C,) broadcast over leaf dims).

    ``scale_tree`` optionally multiplies each leaf elementwise (leaves
    shaped like the state without the chain axis — the per-coordinate
    step preconditioner)."""
    def upd(y, x, s=None):
        scale = a
        if jnp.ndim(a) == 1:
            scale = a.reshape((-1,) + (1,) * (y.ndim - 1))
        return y + scale * x if s is None else y + scale * (s * x)
    if scale_tree is None:
        return jax.tree.map(upd, y_tree, x_tree)
    return jax.tree.map(upd, y_tree, x_tree, scale_tree)


def _tree_axpy_kahan(a, x_tree, y_tree, c_tree, scale_tree=None,
                     act=None):
    """Compensated leafwise ``y += a * x`` (see ``_kahan_add``): returns
    the updated sum tree and carried-error tree. ``act`` (``(C,)`` bool)
    optionally freezes chains — their sum AND error leaves pass through
    untouched, so pending compensation never leaks into a frozen chain."""
    ys, treedef = jax.tree.flatten(y_tree)
    cs = jax.tree.leaves(c_tree)
    xs = jax.tree.leaves(x_tree)
    ss = (jax.tree.leaves(scale_tree) if scale_tree is not None
          else [None] * len(ys))
    new_y, new_c = [], []
    for y, c, x, s in zip(ys, cs, xs, ss):
        scale = a
        if jnp.ndim(a) == 1:
            scale = a.reshape((-1,) + (1,) * (y.ndim - 1))
        d = scale * x if s is None else scale * (s * x)
        t, cn = _kahan_add(y, c, d)
        if act is not None:
            m = act.reshape((-1,) + (1,) * (y.ndim - 1))
            t = jnp.where(m, t, y)
            cn = jnp.where(m, cn, c)
        new_y.append(t)
        new_c.append(cn)
    return (jax.tree.unflatten(treedef, new_y),
            jax.tree.unflatten(treedef, new_c))


def leapfrog_tree(vg_fn: Callable, positions, momenta, step_size,
                  n_steps, scale_tree=None,
                  record_uturn: bool = False,
                  compensated: bool = False) -> tuple:
    """Tree-state chain-batched leapfrog. ``vg_fn(tree) -> ((C,), tree)``.

    ``step_size`` may be a scalar or a per-chain ``(C,)`` vector;
    ``n_steps`` likewise (per-chain counts mask-freeze finished chains,
    as in ``leapfrog_batched``). ``scale_tree`` is the per-coordinate
    diagonal-metric preconditioner (see ``hmc_step_batched``): every
    drift and kick uses ``eps * s_i``; momenta stay unit-normal.

    ``record_uturn``: additionally returns the per-chain first-U-turn
    step (see ``leapfrog_batched``; with ``scale_tree`` the projection
    divides displacements by the metric scale leafwise).

    ``compensated``: Kahan-compensated drift/kick accumulation for
    tiny-eps regimes (see ``leapfrog_batched``); off by default, and the
    plain path compiles the exact program it did before the option.
    """
    lp0, g0 = vg_fn(positions)
    momenta = _tree_axpy(0.5 * step_size, g0, momenta, scale_tree)
    q0 = positions
    inv_scale_tree = (None if scale_tree is None else
                      jax.tree.map(lambda s: 1.0 / s, scale_tree))

    def uturn_proj(q, v):
        total = None
        invs = (jax.tree.leaves(inv_scale_tree)
                if inv_scale_tree is not None else None)
        for idx, (ql, q0l, vl) in enumerate(zip(
                jax.tree.leaves(q), jax.tree.leaves(q0),
                jax.tree.leaves(v))):
            d = ql - q0l
            if invs is not None:
                d = d * invs[idx]
            s = jnp.sum(d * vl, axis=tuple(range(1, d.ndim)))
            total = s if total is None else total + s
        return total

    if jnp.ndim(n_steps) == 0:
        def cond(carry):
            i, *_ = carry
            return i < n_steps

        if compensated:
            def body(carry):
                i, q, cq, v, cv, _lp, _g, ut = carry
                q, cq = _tree_axpy_kahan(step_size, v, q, cq, scale_tree)
                lp, g = vg_fn(q)
                v, cv = _tree_axpy_kahan(step_size, g, v, cv, scale_tree)
                if record_uturn:
                    ut = jnp.where((ut == 0) & (uturn_proj(q, v) < 0),
                                   i + 1, ut)
                return (i + 1, q, cq, v, cv, lp, g, ut)
        else:
            def body(carry):
                i, q, v, _lp, _g, ut = carry
                q = _tree_axpy(step_size, v, q, scale_tree)
                lp, g = vg_fn(q)
                v = _tree_axpy(step_size, g, v, scale_tree)
                if record_uturn:
                    ut = jnp.where((ut == 0) & (uturn_proj(q, v) < 0),
                                   i + 1, ut)
                return (i + 1, q, v, lp, g, ut)
    else:
        n_vec = jnp.reshape(n_steps, (-1,))
        cap = jnp.max(n_vec)
        eps_vec = jnp.broadcast_to(jnp.asarray(step_size), n_vec.shape)

        def cond(carry):
            i, *_ = carry
            return i < cap

        if compensated:
            def body(carry):
                i, q, cq, v, cv, _lp, _g, ut = carry
                act = i < n_vec
                q, cq = _tree_axpy_kahan(eps_vec, v, q, cq, scale_tree,
                                         act=act)
                lp, g = vg_fn(q)
                v, cv = _tree_axpy_kahan(eps_vec, g, v, cv, scale_tree,
                                         act=act)
                if record_uturn:
                    ut = jnp.where((ut == 0) & act
                                   & (uturn_proj(q, v) < 0), i + 1, ut)
                return (i + 1, q, cq, v, cv, lp, g, ut)
        else:
            def body(carry):
                i, q, v, _lp, _g, ut = carry
                eff = jnp.where(i < n_vec, eps_vec, 0.0)
                q = _tree_axpy(eff, v, q, scale_tree)
                lp, g = vg_fn(q)
                v = _tree_axpy(eff, g, v, scale_tree)
                if record_uturn:
                    ut = jnp.where((ut == 0) & (i < n_vec)
                                   & (uturn_proj(q, v) < 0), i + 1, ut)
                return (i + 1, q, v, lp, g, ut)

    n_chains = jax.tree.leaves(positions)[0].shape[0]
    uturn0 = jnp.zeros(n_chains, jnp.int32)
    if compensated:
        zq = jax.tree.map(jnp.zeros_like, positions)
        zv = jax.tree.map(jnp.zeros_like, momenta)
        _, q, _cq, v, _cv, lp, g, uturn = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), positions, zq,
                         momenta, zv, lp0, g0, uturn0))
    else:
        _, q, v, lp, g, uturn = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), positions, momenta,
                         lp0, g0, uturn0))
    v = _tree_axpy(-0.5 * step_size, g, v, scale_tree)
    if record_uturn:
        return q, v, lp, g, uturn
    return q, v, lp, g


def hmc_step_tree(keys, positions, vg_fn: Callable, step_size,
                  n_leapfrog, momentum_fn: Optional[Callable] = None,
                  scale_tree=None,
                  record_uturn: bool = False,
                  compensated: bool = False) -> HMCResult:
    """One HMC transition over a stacked-pytree chain batch.

    ``momentum_fn(chain_keys) -> tree`` optionally overrides momentum
    sampling — the tree chunk runner passes a flat-draw-then-unravel
    sampler so tree- and flat-layout runs consume identical PRNG streams
    (bitwise-comparable trajectories). ``scale_tree`` is the diagonal-
    metric preconditioner (see ``leapfrog_tree``). ``record_uturn``
    populates ``HMCResult.uturn`` (see ``hmc_step_batched``).
    ``compensated``: Kahan-compensated integrator accumulation (see
    ``leapfrog_batched``)."""
    keys2 = jax.vmap(lambda k: jax.random.split(k))(keys)
    key_mom, key_mh = keys2[:, 0], keys2[:, 1]
    momenta = (momentum_fn(key_mom) if momentum_fn is not None
               else _tree_randn_like(key_mom, positions))

    current_log_prob, _ = vg_fn(positions)
    kinetic0 = 0.5 * _tree_sum_sq(momenta)
    uturn = None
    if record_uturn:
        q_new, v_new, lp_new, _, uturn = leapfrog_tree(
            vg_fn, positions, momenta, step_size, n_leapfrog,
            scale_tree=scale_tree, record_uturn=True,
            compensated=compensated)
    else:
        q_new, v_new, lp_new, _ = leapfrog_tree(
            vg_fn, positions, momenta, step_size, n_leapfrog,
            scale_tree=scale_tree, compensated=compensated)
    kinetic1 = 0.5 * _tree_sum_sq(v_new)

    log_accept_ratio = (lp_new - current_log_prob) + (kinetic0 - kinetic1)
    log_accept_ratio = jnp.where(jnp.isnan(log_accept_ratio),
                                 -jnp.inf, log_accept_ratio)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept_ratio))

    log_u = jnp.log(jax.vmap(
        lambda k: jax.random.uniform(k, ()))(key_mh))
    accepted = log_u < log_accept_ratio

    def pick(a, b):
        mask = accepted.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, a, b)

    positions = jax.tree.map(pick, q_new, positions)
    log_prob = jnp.where(accepted, lp_new, current_log_prob)
    return HMCResult(positions, log_prob, accept_prob, accepted,
                     uturn=uturn)
