"""Fused Pallas kernels: MLP potential value+grad and full HMC trajectories
over chain blocks.

The sampler's hot op is the full-data log-likelihood gradient of a *small*
dense MLP, evaluated once per leapfrog step for every chain (SURVEY.md #7
hard part 4). XLA lowers this as dozens of tiny ops whose shapes put the
10-wide feature dimensions on the TPU's 128-lane axis — single-digit
utilization. These kernels flip the layout: **chains on lanes**. Every
activation plane is an ``(N, d, C)`` array whose minor axis is the chain
block, so each multiply-add saturates the VPU regardless of how narrow the
MLP is. Two kernels share the machinery:

* the **per-step potential** (``try_build_fused_main_vg``): one program
  per gradient evaluation, forward+backward with all intermediates in
  VMEM; composes with ``shard_map`` (the caller psums its value+grad);
* the **full-trajectory kernel** (``try_build_fused_trajectory``): ALL L
  leapfrog steps of one HMC transition in a single program — position,
  momentum and gradients never leave VMEM, priors are evaluated in closed
  form in-kernel, and (eps, L) are traced SMEM scalars so adapter retunes
  never recompile.

Scope (benchmark-gated, enabled when the model matches and the working set
fits VMEM): stacks of dense layers with tanh / relu / sigmoid / elu / exp /
leaky-relu activations plus the *sampled* Prelu / SquarePrelu slopes
(reference activationFunctions.py:117-433), under a Gaussian (fixed or
learned sd) or Bernoulli likelihood (reference likelihood.py:63-243), or
a Softmax head fused with the multiclass CategoricalLikelihood (logits-
space logsumexp with the closed-form ``onehot - p`` gradient).
Priors are cheap in theta and stay in XLA, fused into the surrounding scan.
Everything else falls back to the vmapped XLA potential.

Data-parallel use: the built ``vg`` takes the data batch as *arguments*, so
under ``shard_map`` it consumes the local shard; ``try_build_fused_main_vg``
accepts ``axis_name`` and psums the kernel's (value, grad) pair once per
evaluation — the same collective contract as ``sampler.potential._combine``.

Layout contract: the flat state enters transposed as ``theta_T (D, C)``.
Row order must match ``ravel_pytree`` of the params tuple — per dense layer,
bias rows then row-major (in, out) weight rows; per trainable activation,
its slope rows — which the builder verifies against the caller's
``unravel_theta``.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = math.log(2.0 * math.pi)
#: Bernoulli probability clip, reference likelihood.py:225-231
BERN_LO, BERN_HI = 1e-8, 1.0 - 1e-7

#: categorical probability floor (matches distributions.categorical_logprob)
CAT_LO = 1e-8


def _categorical_tail(out, yb):
    """(ll (BC,), d ll / d logits) for the fused softmax+categorical head.

    ``out`` holds the final dense layer's logits (N, k, BC); ``yb`` the
    one-hot labels broadcast to the same shape. Equals
    ``sum log(clip(softmax(z)_y, 1e-8, 1))`` with gradient
    ``onehot - softmax(z)`` (zeroed where the observed-class probability
    is clipped, mirroring the Bernoulli in_range convention)."""
    # stay 3-D throughout: Mosaic rejects the relayout of a 2-D (N, BC)
    # intermediate produced by dropping the class axis ("non-singleton
    # logical dimension is replicated..."), so class-axis reductions keep
    # dims and the final sum collapses (0, 1) like the Gaussian tail
    zmax = jnp.max(out, axis=1, keepdims=True)
    ez = jnp.exp(out - zmax)
    p = ez / jnp.sum(ez, axis=1, keepdims=True)
    py = jnp.sum(yb * p, axis=1, keepdims=True)                # (N, 1, BC)
    ll = jnp.sum(jnp.log(jnp.maximum(py, CAT_LO)), axis=(0, 1))  # (BC,)
    g = jnp.where(py > CAT_LO, yb - p, 0.0)
    return ll, g


def _prep_labels(y, n: int, dk: int, lik: str):
    """y as the kernel's (n, dk) plane; categorical class-id labels
    one-hot encode to the logits width (one-hot input passes through)."""
    y = jnp.asarray(y)
    if lik == "categorical" and y.size == n and dk > 1:
        return jax.nn.one_hot(
            jnp.reshape(y, (n,)).astype(jnp.int32), dk, dtype=jnp.float32)
    return jnp.asarray(y, jnp.float32).reshape(n, dk)


#: VMEM working-set budget for the kernel (the hardware stack limit is
#: 16MB/core; the estimate below is tile-padding-aware, so a 12MB budget
#: leaves headroom for allocator slack)
VMEM_LIMIT_BYTES = 12 * 1024 * 1024
#: per-dense-layer temporary budget above which the kernel switches from
#: statically-unrolled input-row loops (fastest for tiny MLPs — no loop
#: dependencies, deep VPU pipelining) to a fori_loop that reuses one
#: (N, d, BC) temporary (Mosaic's stack allocator keeps every unrolled
#: temporary live simultaneously, observed 41MB for a 3x20 MLP at N=128)
UNROLL_TEMP_BYTES = 4 * 1024 * 1024


# --------------------------------------------------------------------------
# Op program: a linear pipeline of (kind, ...) tuples
#
#   ("dense", d_in, d_out)    rows: d_out bias + d_in*d_out weights
#   ("tanh"|"relu"|"sigmoid"|"elu"|"exp", d)
#   ("leakyrelu", d, alpha)   fixed slope, no rows
#   ("prelu", d)              rows: d sampled slopes
#   ("sqprelu", d)            rows: d sampled slopes (effective slope s**2)
# --------------------------------------------------------------------------

def _op_rows(op) -> int:
    if op[0] == "dense":
        return op[2] + op[1] * op[2]
    if op[0] in ("prelu", "sqprelu"):
        return op[1]
    return 0


def _program_dims(ops) -> Tuple[int, int, int]:
    """Returns (d0, d_final, total theta rows)."""
    d0 = ops[0][1] if ops[0][0] == "dense" else ops[0][1]
    d = d0
    for op in ops:
        if op[0] == "dense":
            d = op[2]
    return d0, d, sum(_op_rows(op) for op in ops)


def _fixed_act(name: str):
    """Forward + derivative-from-output for parameter-free activations."""
    if name == "tanh":
        return jnp.tanh, lambda h: 1.0 - h * h
    if name == "relu":
        return (lambda a: jnp.maximum(a, 0.0),
                lambda h: (h > 0.0).astype(h.dtype))
    if name == "sigmoid":
        return jax.nn.sigmoid, lambda h: h * (1.0 - h)
    if name == "exp":
        return jnp.exp, lambda h: h
    raise ValueError(f"unsupported fused activation: {name}")


def _fori_dense_dims(ops, n: int, block_c: int):
    """d_in of every dense op that takes the fori (buffer-reusing) path."""
    return [op[1] for op in ops
            if op[0] == "dense"
            and 4 * op[1] * n * op[2] * block_c > UNROLL_TEMP_BYTES]


def _potential_kernel(ops, n_data: int, lik: str,
                      theta_ref, x_ref, y_ref, sd_ref, ll_ref, grad_ref,
                      *scratch):
    """Single chain-block program: forward + manual backward, all in VMEM.

    theta_ref: (D, BC); x_ref: (N, d0); y_ref: (N, dK); sd_ref: (1, BC);
    ll_ref out: (1, BC); grad_ref out: (D, BC). ``scratch`` holds two
    (N, max_fori_d_in, BC) VMEM buffers when any dense layer takes the
    fori path (Mosaic supports dynamic slicing on refs, not value arrays,
    so the input plane is staged through scratch and the loop reads
    ``pl.ds`` slices of it — and of theta_ref for the weight rows).
    """
    bc = theta_ref.shape[1]
    n = n_data
    d0, _, _ = _program_dims(ops)
    h_s = scratch[0] if scratch else None
    gp_s = scratch[1] if scratch else None

    # -- forward: planes (N, d, BC); record backward residuals per op --------
    x = x_ref[:]                                               # (N, d0)
    h = jnp.broadcast_to(x[:, :, None], (n, d0, bc))
    store = []
    off = 0
    for op in ops:
        kind = op[0]
        if kind == "dense":
            d_in, d_out = op[1], op[2]
            b = theta_ref[pl.ds(off, d_out), :]                # (d_out, BC)
            w = theta_ref[pl.ds(off + d_out, d_in * d_out), :]
            w = w.reshape(d_in, d_out, bc)
            store.append(("dense", h, w, off, d_in, d_out))
            a = jnp.broadcast_to(b[None, :, :], (n, d_out, bc))
            if 4 * d_in * n * d_out * bc <= UNROLL_TEMP_BYTES:
                for i in range(d_in):
                    a = a + h[:, i:i + 1, :] * w[i][None, :, :]
            else:
                h_s[:, 0:d_in, :] = h

                def fwd_body(i, acc, off=off, d_out=d_out):
                    h_i = h_s[:, pl.ds(i, 1), :]               # (N, 1, BC)
                    w_i = theta_ref[pl.ds(off + d_out + i * d_out,
                                          d_out), :]           # (d_out, BC)
                    return acc + h_i * w_i[None, :, :]
                a = lax.fori_loop(0, d_in, fwd_body, a)
            h = a
            off += d_out + d_in * d_out
        elif kind == "leakyrelu":
            alpha = op[2]
            h = jnp.where(h < 0.0, alpha * h, h)
            store.append(("leakyrelu", h, alpha))
        elif kind == "elu":
            x_in = h
            h = jnp.where(x_in > 0.0, x_in, jnp.exp(x_in) - 1.0)
            store.append(("elu", x_in))
        elif kind in ("prelu", "sqprelu"):
            d = op[1]
            s = theta_ref[pl.ds(off, d), :]                    # (d, BC)
            eff = s * s if kind == "sqprelu" else s
            x_in = h
            h = jnp.where(x_in < 0.0, eff[None, :, :] * x_in, x_in)
            store.append((kind, x_in, s, off, d))
            off += d
        else:
            fwd, _ = _fixed_act(kind)
            h = fwd(h)
            store.append((kind, h))

    # -- likelihood tail ------------------------------------------------------
    out = h                                                    # (N, dK, BC)
    y = jnp.broadcast_to(y_ref[:][:, :, None], out.shape)
    if lik == "gaussian":
        # same clamp as distributions.gaussian_logprob (reference
        # BNN_functions.py:23-24): keeps fused == XLA if the noise scale
        # collapses
        sd = jnp.clip(sd_ref[0, :], 1e-8, 1e8)                 # (BC,)
        inv_sd = 1.0 / sd
        resid = (y - out) * inv_sd[None, None, :]
        quad = jnp.sum(resid * resid, axis=(0, 1))             # (BC,)
        k = float(out.shape[0] * out.shape[1])
        ll_ref[0, :] = -0.5 * (quad + 2.0 * k * jnp.log(sd) + k * LOG_2PI)
        # d ll / d out = (y - out) / sd^2
        g = (y - out) * (inv_sd * inv_sd)[None, None, :]
    elif lik == "bernoulli":
        p = jnp.clip(out, BERN_LO, BERN_HI)
        ll_ref[0, :] = jnp.sum(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p),
                               axis=(0, 1))
        in_range = (out > BERN_LO) & (out < BERN_HI)
        g = jnp.where(in_range, y / p - (1.0 - y) / (1.0 - p), 0.0)
    elif lik == "categorical":
        ll, g = _categorical_tail(out, y)
        ll_ref[0, :] = ll
    else:
        raise ValueError(f"unsupported fused likelihood: {lik}")

    # -- backward --------------------------------------------------------------
    for rec in reversed(store):
        kind = rec[0]
        if kind == "dense":
            _, h_prev, w, off, d_in, d_out = rec
            first = rec is store[0]
            # db = sum_n g ; dw[i, j] = sum_n h_prev[:, i] * g[:, j]
            grad_ref[pl.ds(off, d_out), :] = jnp.sum(g, axis=0)
            if 4 * d_in * n * d_out * bc <= UNROLL_TEMP_BYTES:
                for i in range(d_in):
                    dw_i = jnp.sum(h_prev[:, i:i + 1, :] * g, axis=0)
                    grad_ref[pl.ds(off + d_out + i * d_out, d_out), :] = \
                        dw_i
                if not first:
                    # g_prev[:, i] = sum_j g[:, j] * w[i, j]
                    g_prev = [
                        jnp.sum(g * w[i][None, :, :], axis=1,
                                keepdims=True)
                        for i in range(d_in)
                    ]
                    g = jnp.concatenate(g_prev, axis=1)        # (N, d_in, BC)
            else:
                h_s[:, 0:d_in, :] = h_prev

                def bwd_body(i, _, g=g, off=off, d_out=d_out, first=first):
                    h_i = h_s[:, pl.ds(i, 1), :]               # (N, 1, BC)
                    dw_i = jnp.sum(h_i * g, axis=0)            # (d_out, BC)
                    grad_ref[pl.ds(off + d_out + i * d_out, d_out), :] = \
                        dw_i
                    if not first:
                        w_i = theta_ref[pl.ds(off + d_out + i * d_out,
                                              d_out), :]
                        gp_s[:, pl.ds(i, 1), :] = jnp.sum(
                            g * w_i[None, :, :], axis=1, keepdims=True)
                    return 0
                lax.fori_loop(0, d_in, bwd_body, 0)
                if not first:
                    g = gp_s[:, 0:d_in, :]
        elif kind == "leakyrelu":
            _, h_out, alpha = rec
            g = g * jnp.where(h_out < 0.0, alpha, 1.0)
        elif kind == "elu":
            _, x_in = rec
            g = g * jnp.where(x_in > 0.0, 1.0, jnp.exp(x_in))
        elif kind in ("prelu", "sqprelu"):
            _, x_in, s, off, d = rec
            neg_x = jnp.where(x_in < 0.0, x_in, 0.0)
            d_eff = jnp.sum(neg_x * g, axis=0)                 # (d, BC)
            if kind == "sqprelu":
                grad_ref[pl.ds(off, d), :] = 2.0 * s * d_eff
                eff = s * s
            else:
                grad_ref[pl.ds(off, d), :] = d_eff
                eff = s
            g = g * jnp.where(x_in < 0.0, eff[None, :, :], 1.0)
        else:
            _, h_out = rec
            _, bwd = _fixed_act(kind)
            g = g * bwd(h_out)


# --------------------------------------------------------------------------
# Full-trajectory kernel: the WHOLE leapfrog integration of one HMC step in
# a single Pallas program (SURVEY.md #7 hard part 4, "a fused full leapfrog
# step for tiny nets"). The position/momentum state stays VMEM-resident
# across all L gradient evaluations — no kernel-boundary HBM round-trips of
# the (C, D) state per step, no per-step XLA glue. Scope: statically
# unrolled dense stacks with parameter-free activations, Gaussian priors
# (folded in as per-row (mu, 1/sigma^2) planes computed once from eta),
# Gaussian or Bernoulli likelihood, single shard (a psum cannot run inside
# a Mosaic kernel, so data-parallel meshes keep the per-step potential).
# --------------------------------------------------------------------------

def _likelihood_value_vg(ops, n: int, lik: str, q, x, y, sd):
    """Value-level forward+backward of the likelihood: q (D, BC) -> (ll
    (BC,), grad (D, BC)). Unrolled layers only (no scratch refs)."""
    bc = q.shape[1]
    d0, _, _ = _program_dims(ops)
    h = jnp.broadcast_to(x[:, :, None], (n, d0, bc))
    store = []
    off = 0
    for op in ops:
        kind = op[0]
        if kind == "dense":
            d_in, d_out = op[1], op[2]
            b = q[off:off + d_out]
            w = q[off + d_out:off + d_out + d_in * d_out].reshape(
                d_in, d_out, bc)
            store.append(("dense", h, w, off, d_in, d_out))
            # sequential accumulate, deliberately: a pairwise-tree sum
            # (log-depth dependency chain) measured 5.31M vs 5.67M
            # flagship steps/sec — Mosaic pipelines the serial adds fine
            # and the tree's extra live temporaries cost more than the
            # shorter chain saves
            a = jnp.broadcast_to(b[None, :, :], (n, d_out, bc))
            for i in range(d_in):
                a = a + h[:, i:i + 1, :] * w[i][None, :, :]
            h = a
            off += d_out + d_in * d_out
        elif kind == "leakyrelu":
            h = jnp.where(h < 0.0, op[2] * h, h)
            store.append(("leakyrelu", h, op[2]))
        elif kind == "elu":
            x_in = h
            h = jnp.where(x_in > 0.0, x_in, jnp.exp(x_in) - 1.0)
            store.append(("elu", x_in))
        elif kind in ("prelu", "sqprelu"):
            d = op[1]
            s = q[off:off + d]                                 # (d, BC)
            eff = s * s if kind == "sqprelu" else s
            x_in = h
            h = jnp.where(x_in < 0.0, eff[None, :, :] * x_in, x_in)
            store.append((kind, x_in, s, off, d))
            off += d
        else:
            fwd, _ = _fixed_act(kind)
            h = fwd(h)
            store.append((kind, h))

    out = h
    yb = jnp.broadcast_to(y[:, :, None], out.shape)
    if lik == "gaussian":
        inv_sd = 1.0 / sd
        resid = (yb - out) * inv_sd[None, None, :]
        quad = jnp.sum(resid * resid, axis=(0, 1))
        k = float(out.shape[0] * out.shape[1])
        ll = -0.5 * (quad + 2.0 * k * jnp.log(sd) + k * LOG_2PI)
        g = (yb - out) * (inv_sd * inv_sd)[None, None, :]
    elif lik == "bernoulli":
        p = jnp.clip(out, BERN_LO, BERN_HI)
        ll = jnp.sum(yb * jnp.log(p) + (1.0 - yb) * jnp.log1p(-p),
                     axis=(0, 1))
        in_range = (out > BERN_LO) & (out < BERN_HI)
        g = jnp.where(in_range, yb / p - (1.0 - yb) / (1.0 - p), 0.0)
    else:  # categorical (softmax head fused on logits)
        ll, g = _categorical_tail(out, yb)

    blocks = {}
    for rec in reversed(store):
        kind = rec[0]
        if kind == "dense":
            _, h_prev, w, off, d_in, d_out = rec
            parts = [jnp.sum(g, axis=0)]                       # db
            for i in range(d_in):
                parts.append(jnp.sum(h_prev[:, i:i + 1, :] * g, axis=0))
            blocks[off] = jnp.concatenate(parts, axis=0)
            if rec is not store[0]:
                g_prev = [
                    jnp.sum(g * w[i][None, :, :], axis=1, keepdims=True)
                    for i in range(d_in)
                ]
                g = jnp.concatenate(g_prev, axis=1)
        elif kind == "leakyrelu":
            g = g * jnp.where(rec[1] < 0.0, rec[2], 1.0)
        elif kind == "elu":
            g = g * jnp.where(rec[1] > 0.0, 1.0, jnp.exp(rec[1]))
        elif kind in ("prelu", "sqprelu"):
            _, x_in, s, off, d = rec
            neg_x = jnp.where(x_in < 0.0, x_in, 0.0)
            d_eff = jnp.sum(neg_x * g, axis=0)                 # (d, BC)
            if kind == "sqprelu":
                blocks[off] = 2.0 * s * d_eff
                eff = s * s
            else:
                blocks[off] = d_eff
                eff = s
            g = g * jnp.where(x_in < 0.0, eff[None, :, :], 1.0)
        else:
            _, bwd = _fixed_act(kind)
            g = g * bwd(rec[1])
    grad = jnp.concatenate([blocks[o] for o in sorted(blocks)], axis=0)
    return ll, grad


def _trajectory_kernel(ops, n: int, lik: str, prior_rows, sd_idx,
                       sd_const: float, per_chain: bool,
                       record_uturn: bool, tempered: bool,
                       theta_ref, mom_ref, eta_ref, x_ref, y_ref,
                       eps_ref, L_ref, *rest):
    """One full HMC trajectory per chain block, all in VMEM.

    theta/mom refs: (D, BC); eta_ref: (H, BC). (eps, L) are traced —
    changing them never recompiles — and come in two static modes:
    shared-adapter runs (``per_chain=False``) read them as (1, 1) SMEM
    scalars (the throughput-measured default program); the
    per-chain-group ``n_adapters`` mode reads (1, BC) VMEM rows plus a
    (1, 1) SMEM ``max(L)`` loop bound, with per-lane kick/drift masks.
    Outputs: final position/momentum (D, BC) and the log posterior at the
    start/end points (1, BC) for the caller's MH accept. ``prior_rows``
    lists ``(kind, rows, loc_eta_idx, scale_eta_idx, sign)`` prior blocks
    covering the whole flat state in row order — "gauss"
    (reference-exact gaussian_logprob, sd = scale_hyper**2 clamped,
    distributions.py:39-56) or "cauchy" (gamma = scale_hyper**2;
    ``sign`` +1 reproduces the reference's flipped cauchyLogProb, -1 the
    proper density — distributions.py:70-86).
    """
    bc = theta_ref.shape[1]
    ut_out = None
    if record_uturn:
        *rest, ut_out = rest
    beta_v = None
    if tempered:
        # per-chain inverse temperature lanes (parallel tempering's
        # power posterior: prior + beta * loglik — sampler/tempering.py)
        beta_ref, *rest = rest
        beta_v = beta_ref[0, :]                                # (BC,)
    if per_chain:
        lmax_ref, q_out, v_out, lp0_out, lp1_out = rest
        eps_v = eps_ref[0, :]                                  # (BC,)
        l_v = L_ref[0, :]                                      # (BC,) i32
        l_max = lmax_ref[0, 0]
    else:
        q_out, v_out, lp0_out, lp1_out = rest
        eps_v = eps_ref[0, 0]
        l_v = L_ref[0, 0]
        l_max = l_v
    x = x_ref[:]
    y = y_ref[:]
    eta = eta_ref[:]                                           # (H, BC)

    if sd_idx is not None:
        sd = jnp.clip(eta[sd_idx] * eta[sd_idx], 1e-8, 1e8)
    else:
        sd = jnp.full((bc,), jnp.float32(sd_const))

    # Negative result (measured): folding an all-Gaussian prior into two
    # precomputed (D, BC) planes (value = const - 0.5 sum(dif^2 * iv),
    # grad = -dif * iv; one fused elementwise pass per kick instead of
    # per-block ops + an n-way gradient concat) is a dead heat — 9.82M
    # vs 9.82M steps/sec at 64 chains and 32.69M vs 32.70M at 512 on the
    # flagship. The per-block prior ops ride in the serial dense chain's
    # pipeline bubbles; the kernel is latency-bound on that chain, not
    # prior-op-count-bound (same finding as the tree-reduction
    # experiment below). Not worth the two extra pinned VMEM planes.
    def prior_vg(qv):
        lp = jnp.zeros((bc,), jnp.float32)
        g_parts = []
        off = 0
        for kind, rows, i_loc, i_scale, sign in prior_rows:
            blk = qv[off:off + rows]                           # (rows, BC)
            if kind == "exp":
                # Prelu slopes: exponential_logprob(rate, s) = -|rate| s
                # + log|rate| per element (distributions.py:89-96;
                # reference activationFunctions.py:161-175)
                rate = jnp.abs(eta[i_loc])
                lp = lp - rate * jnp.sum(blk, axis=0) \
                    + rows * jnp.log(rate)
                g_parts.append(jnp.broadcast_to(-rate[None, :],
                                                (rows, blk.shape[1])))
                off += rows
                continue
            loc = eta[i_loc][None, :]
            dif = blk - loc
            if kind in ("gauss", "gauss_raw"):
                # "gauss": dense-layer prior, sd = scale_hyper**2;
                # "gauss_raw": SquarePrelu slopes, sigma = scale hyper
                # directly (reference activationFunctions.py:381-399)
                s = eta[i_scale]
                sig = jnp.clip(s * s if kind == "gauss" else s,
                               1e-8, 1e8)
                iv = 1.0 / (sig * sig)
                lp = lp - 0.5 * (jnp.sum(dif * dif, axis=0) * iv
                                 + 2.0 * jnp.log(sig) + LOG_2PI)
                g_parts.append(-dif * iv[None, :])
            else:  # cauchy
                gam = eta[i_scale] * eta[i_scale]
                z2 = (dif * dif) / (gam * gam)[None, :]
                lp = lp + sign * jnp.sum(jnp.log1p(z2), axis=0) \
                    - rows * jnp.log(math.pi * gam)
                denom = (gam * gam)[None, :] + dif * dif
                g_parts.append(sign * 2.0 * dif / denom)
            off += rows
        return lp, jnp.concatenate(g_parts, axis=0)

    def vg(qv):
        ll, g = _likelihood_value_vg(ops, n, lik, qv, x, y, sd)
        plp, pg = prior_vg(qv)
        if tempered:
            return beta_v * ll + plp, beta_v[None, :] * g + pg
        return ll + plp, g + pg

    # single-inline leapfrog: one vg graph instance in the program (a
    # separate pre-loop eval doubles the Mosaic stack footprint — see
    # trajectory_vmem_bytes). Iteration i evaluates vg at the current q,
    # applies a half kick on each chain's first/last iterations and a full
    # kick between, and drifts except after the final half kick:
    #   i=0:        g(q0); v += eps/2 g; q += eps v
    #   0<i<L_c:    g(qi); v += eps  g; q += eps v
    #   i=L_c:      g(qL); v += eps/2 g        (no drift)
    #   i>L_c:      frozen (kick = drift = 0); vg re-evaluates at the
    #               unchanged q, so lp carries the chain's endpoint value
    # == the standard half-kick/full-drift leapfrog with L_c drifts per
    # chain, run as one wave front to the block's max(L).
    zero = jnp.zeros((bc,), jnp.float32)
    q0 = theta_ref[:] if record_uturn else None

    def body(i, carry):
        if record_uturn:
            q, v, lp0, _lp, ut = carry
        else:
            q, v, lp0, _lp = carry
        lp, g = vg(q)
        lp0 = jnp.where(i == 0, lp, lp0)
        kick = jnp.where(i < l_v, eps_v, 0.0)
        kick = jnp.where((i == 0) | (i == l_v), 0.5 * eps_v, kick)
        drift = jnp.where(i < l_v, eps_v, 0.0)
        if per_chain:
            kick, drift = kick[None, :], drift[None, :]
        v = v + kick * g
        if record_uturn:
            # U-turn check pairing the post-drift position of the
            # previous iteration with this iteration's full-kick
            # momentum — at i == L the kernel's kick is the final half
            # kick, so the other half is added back for the projection,
            # matching leapfrog_batched's in-loop (q_i, v_{i+1/2})
            # pairing (sampler/hmc.py); recorded step j covers
            # j = 1..L_c, 0 = censored
            half_fix = jnp.where(i == l_v, 0.5 * eps_v, 0.0)
            if per_chain:
                half_fix = half_fix[None, :]
            v_rec = v + half_fix * g
            proj = jnp.sum((q - q0) * v_rec, axis=0)           # (BC,)
            ut = jnp.where((i >= 1) & (i <= l_v) & (ut == 0)
                           & (proj < 0), i, ut)
        q = q + drift * v
        if record_uturn:
            return (q, v, lp0, lp, ut)
        return (q, v, lp0, lp)

    init = (theta_ref[:], mom_ref[:], zero, zero)
    if record_uturn:
        init = init + (jnp.zeros((bc,), jnp.int32),)
        q, v, lp0, lp, ut = lax.fori_loop(0, l_max + 1, body, init)
        ut_out[0, :] = ut
    else:
        q, v, lp0, lp = lax.fori_loop(0, l_max + 1, body, init)

    q_out[:] = q
    v_out[:] = v
    lp0_out[0, :] = lp0
    lp1_out[0, :] = lp


def trajectory_vmem_bytes(ops, n: int, block_c: int,
                          record_uturn: bool = False,
                          tempered: bool = False) -> int:
    """Trajectory kernel working set, calibrated against measured Mosaic
    stack footprints: the stack allocator keeps the vg graph's residual
    planes and every layer's unrolled input-row temporaries live
    simultaneously (measured ~8.5MB per inlined graph instance for a 3x10
    stack at N=31; the kernel is structured so exactly ONE instance exists
    — a masked kick-drift-kick loop instead of a separate pre-loop eval),
    plus the double-buffered (q, v) carry and prior/grad-assembly
    temporaries (~14 (D, BC) planes)."""
    d0, dk, d_total = _program_dims(ops)
    bc = _pad(block_c, 128)

    def plane(d):
        return n * _pad(d, 8) * bc

    planes = plane(d0)
    temps = 0
    max_d = d0
    d = d0
    for op in ops:
        if op[0] == "dense":
            d_in, d_out = op[1], op[2]
            if 4 * d_in * n * d_out * block_c > UNROLL_TEMP_BYTES:
                temps += plane(d_out) + 2 * plane(d_in)
            else:
                temps += d_in * plane(d_out)
            d = d_out
        planes += plane(d)
        max_d = max(max_d, d)
    per_vg = planes + temps + 2 * plane(max_d)   # residuals + temps + g
    carry_planes = 14
    if record_uturn:
        # pinned start position + the (q - q0) * v_rec projection temps
        carry_planes += 3
    if tempered:
        # the beta_v[None, :] * g broadcast temporary (+ the beta input
        # row, sub-plane-sized)
        carry_planes += 2
    floats = (per_vg                             # one inlined vg graph
              + carry_planes * _pad(d_total, 8) * bc
              + n * (_pad(d0, 128) + _pad(dk, 128)))
    return 4 * floats


def make_fused_trajectory(ops, n_rows: int, *, lik: str, prior_rows,
                          sd_idx, sd_const: float, eta_dim: int,
                          block_c: int = 512, interpret: bool = False,
                          record_uturn: bool = False,
                          tempered: bool = False):
    """Builds ``traj(thetas (C,D), etas (C,H), momenta (C,D), x, y, eps,
    L) -> (q (C,D), v (C,D), lp0 (C,), lp1 (C,))`` — plus a trailing
    ``uturn (C,) int32`` output with ``record_uturn`` (first U-turn step,
    0 = censored; bitwise-matches ``leapfrog_batched``'s recording).

    ``tempered=True`` builds the power-posterior program for parallel
    tempering (sampler/tempering.py): ``traj`` takes a trailing ``betas
    (C,)`` argument of per-chain inverse temperatures and integrates
    ``prior + beta * loglik`` — the whole rung-major replica fleet rides
    the single-program kernel, with beta as one more traced lane vector
    (zero recompiles across ladders)."""
    ops = tuple(ops)
    n = int(n_rows)
    d0, dk, d_total = _program_dims(ops)

    def traj(thetas, etas, momenta, x, y, eps, n_leapfrog, betas=None):
        if tempered and betas is None:
            raise TypeError("tempered trajectory kernel requires betas")
        c = thetas.shape[0]
        bc = choose_block_c(c, block_c)
        x2 = jnp.asarray(x, jnp.float32).reshape(n, d0)
        y2 = _prep_labels(y, n, dk, lik)
        # (eps, L) stay traced in both modes; per-chain vectors (the
        # n_adapters mode) switch to a statically distinct program with
        # per-lane masks — shared-adapter runs keep the scalar-SMEM
        # program (measured ~10% faster at the flagship config)
        per_chain = (jnp.ndim(eps) > 0) or (jnp.ndim(n_leapfrog) > 0)
        kernel = functools.partial(
            _trajectory_kernel, ops, n, lik, tuple(prior_rows), sd_idx,
            float(sd_const), per_chain, record_uturn, tempered)

        grid = (c // bc,)
        block = lambda r: pl.BlockSpec((r, bc), lambda i: (0, i),  # noqa: E731
                                       memory_space=pltpu.VMEM)
        full = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i: (0, 0),  # noqa: E731
                                            memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),  # noqa: E731
                                    memory_space=pltpu.SMEM)
        if per_chain:
            eps_arr = jnp.broadcast_to(
                jnp.asarray(eps, jnp.float32).reshape(-1),
                (c,)).reshape(1, c)
            l_arr = jnp.broadcast_to(
                jnp.asarray(n_leapfrog, jnp.int32).reshape(-1),
                (c,)).reshape(1, c)
            extra_in = [jnp.max(l_arr).reshape(1, 1)]
            el_specs = [block(1), block(1)]
            extra_specs = [smem()]
        else:
            eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)
            l_arr = jnp.asarray(n_leapfrog, jnp.int32).reshape(1, 1)
            extra_in = []
            el_specs = [smem(), smem()]
            extra_specs = []
        if tempered:
            beta_in = [jnp.broadcast_to(
                jnp.asarray(betas, jnp.float32).reshape(-1),
                (c,)).reshape(1, c)]
            beta_specs = [block(1)]
        else:
            beta_in, beta_specs = [], []
        out_specs = [block(d_total), block(d_total), block(1), block(1)]
        out_shape = [
            jax.ShapeDtypeStruct((d_total, c), jnp.float32),
            jax.ShapeDtypeStruct((d_total, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ]
        if record_uturn:
            out_specs = out_specs + [block(1)]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((1, c), jnp.int32)]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block(d_total), block(d_total), block(eta_dim),
                      full(n, d0), full(n, dk)] + el_specs + beta_specs
                     + extra_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(thetas.T, momenta.T, etas.T, x2, y2, eps_arr, l_arr,
          *beta_in, *extra_in)
        if record_uturn:
            q_t, v_t, lp0, lp1, ut = outs
            return q_t.T, v_t.T, lp0[0], lp1[0], ut[0]
        q_t, v_t, lp0, lp1 = outs
        return q_t.T, v_t.T, lp0[0], lp1[0]

    return traj


def try_build_fused_trajectory(model, likelihood, unravel_theta,
                               unravel_eta, x, y, eta_dim: int,
                               block_c: int = 512,
                               interpret: bool = False,
                               n_rows: Optional[int] = None,
                               require_profitable: bool = False,
                               record_uturn: bool = False,
                               tempered: bool = False,
                               ) -> Optional[Callable]:
    """Pattern-matches (model, likelihood) for the full-trajectory kernel.

    Scope on top of the per-step kernel's: every parameterized layer must
    have a closed-form prior value+grad in the kernel — Gaussian or Cauchy
    dense layers, Prelu (exponential slope prior) and SquarePrelu
    (Gaussian slope prior) — every dense layer small enough to unroll, and
    the whole working set incl. the trajectory carry must fit VMEM.
    Returns None otherwise.
    """
    from tensorbnn_tpu.likelihoods import BernoulliLikelihood, \
        CategoricalLikelihood, FixedGaussianLikelihood, GaussianLikelihood
    from tensorbnn_tpu.models.layers import CauchyDenseLayer, \
        GaussianDenseLayer

    matched = _model_program(model, likelihood)
    if matched is None:
        return None
    ops, lik = matched
    if not verify_theta_layout(unravel_theta, ops):
        return None

    n = int(n_rows if n_rows is not None else x.shape[0])
    if require_profitable and not fused_profitable(ops, n):
        return None
    while trajectory_vmem_bytes(ops, n, block_c,
                                record_uturn=record_uturn,
                                tempered=tempered) \
            > VMEM_LIMIT_BYTES:
        if block_c <= 128:
            return None
        block_c = max(128, (block_c - 1) // 128 * 128)
    if _fori_dense_dims(ops, n, block_c):
        return None  # large layers need the scratch-staged per-step kernel

    # prior blocks, in flat row order, with eta indices probed from the
    # caller's layout
    probe_h, probe_l = unravel_eta(jnp.arange(eta_dim, dtype=jnp.float32))
    prior_rows = []
    from tensorbnn_tpu.models.layers import Prelu, SquarePrelu
    for layer, h in zip(model.layers, probe_h):
        if not h:
            continue
        if isinstance(layer, (GaussianDenseLayer, CauchyDenseLayer)):
            if isinstance(layer, GaussianDenseLayer):
                kind, sign = "gauss", 0.0
            else:
                # sign +1 = the reference's flipped cauchyLogProb (the
                # compat default); -1 = the proper density (proper=True)
                kind, sign = "cauchy", (-1.0 if layer.proper else 1.0)
            if set(h) != {"b_loc", "b_scale", "w_loc", "w_scale"}:
                return None
            prior_rows.append((kind, layer.out_dim,
                               int(np.asarray(h["b_loc"])),
                               int(np.asarray(h["b_scale"])), sign))
            prior_rows.append((kind, layer.in_dim * layer.out_dim,
                               int(np.asarray(h["w_loc"])),
                               int(np.asarray(h["w_scale"])), sign))
        elif isinstance(layer, Prelu):
            if set(h) != {"rate"}:
                return None
            i_rate = int(np.asarray(h["rate"]))
            prior_rows.append(("exp", layer.in_dim, i_rate, i_rate, 0.0))
        elif isinstance(layer, SquarePrelu):
            if set(h) != {"loc", "scale"}:
                return None
            prior_rows.append(("gauss_raw", layer.in_dim,
                               int(np.asarray(h["loc"])),
                               int(np.asarray(h["scale"])), 0.0))
        else:
            return None

    sd_idx = None
    sd_const = 1.0
    if isinstance(likelihood, GaussianLikelihood):
        if "sd_root" not in probe_l:
            return None
        sd_idx = int(np.asarray(probe_l["sd_root"]))
    elif isinstance(likelihood, FixedGaussianLikelihood):
        sd_const = float(likelihood.sd)
    elif not isinstance(likelihood, (BernoulliLikelihood,
                                     CategoricalLikelihood)):
        return None

    return make_fused_trajectory(
        ops, n, lik=lik, prior_rows=prior_rows, sd_idx=sd_idx,
        sd_const=sd_const, eta_dim=eta_dim, block_c=block_c,
        interpret=interpret, record_uturn=record_uturn,
        tempered=tempered)


def verify_theta_layout(unravel_theta, ops) -> bool:
    """Checks the flat layout matches the kernel's row contract."""
    _, _, d_total = _program_dims(ops)
    try:
        probe = unravel_theta(jnp.arange(d_total, dtype=jnp.float32))
    except ValueError:
        return False
    row_ops = [op for op in ops if _op_rows(op)]
    off = 0
    oi = 0
    for layer_params in probe:
        if not layer_params:
            continue
        if oi >= len(row_ops):
            return False
        op = row_ops[oi]
        if op[0] == "dense":
            d_in, d_out = op[1], op[2]
            if set(layer_params) != {"b", "w"}:
                return False
            b = np.asarray(layer_params["b"])
            w = np.asarray(layer_params["w"])
            if b.shape != (d_out,) or w.shape != (d_in, d_out):
                return False
            if not np.array_equal(b, np.arange(off, off + d_out)):
                return False
            want_w = np.arange(
                off + d_out,
                off + d_out + d_in * d_out).reshape(d_in, d_out)
            if not np.array_equal(w, want_w):
                return False
        else:
            d = op[1]
            if set(layer_params) != {"slopes"}:
                return False
            s = np.asarray(layer_params["slopes"])
            if s.shape != (d,) or not np.array_equal(
                    s, np.arange(off, off + d)):
                return False
        off += _op_rows(op)
        oi += 1
    return oi == len(row_ops) and off == d_total


def choose_block_c(c: int, cap: int) -> int:
    """Largest Mosaic-legal chain block <= cap: the lane (minor) dimension
    must be a multiple of 128 or equal to the full array dim, and must
    divide the chain count.

    When no 128-multiple divides ``c`` the only legal block is ``c`` itself
    and the cap cannot be honored (chain counts that are multiples of 128
    avoid this; the driver's block heuristic only caps at 512-multiples,
    where a legal divisor always exists)."""
    if cap >= c:
        return c
    k = (cap // 128) * 128
    while k >= 128:
        if c % k == 0:
            return k
        k -= 128
    return c


def _pad(v: int, m: int) -> int:
    return -(-v // m) * m


def fused_profitable(ops, n_rows: int) -> bool:
    """Whether the chains-on-lanes kernel is expected to beat XLA.

    The kernel wins in the latency-bound tiny regime where XLA's op-by-op
    lowering puts ~10-wide features on the 128-lane axis (measured 1.3-2.9x
    on the 3x10/11-point flagship). Once the data x width product grows,
    XLA's batched-matmul formulation uses the hardware better (measured
    0.71x at 64 rows x width 16), so ``auto`` mode falls back to XLA above
    this threshold; ``use_fused=True`` still forces the kernel.
    """
    d0, _, _ = _program_dims(ops)
    max_d = d0
    for op in ops:
        if op[0] == "dense":
            max_d = max(max_d, op[2])
    return n_rows * max_d <= 512


def kernel_vmem_bytes(ops, n: int, block_c: int) -> int:
    """Estimated f32 VMEM working set of one kernel program,
    **tile-padding-aware**: every buffer's minor dim pads to 128 lanes and
    its second-minor to 8 sublanes (so 64-chain blocks cost 128 lanes of
    VMEM — measured 17.0MB real vs a 6.5MB naive estimate on a 3x20 MLP
    at N=128, BC=64).

    Residual planes (input + every op output, all live through backward)
    plus the gradient plane plus the worst single layer's temporaries:
    Mosaic's stack allocator keeps each statically-unrolled input-row
    temporary live simultaneously, so an unrolled dense layer costs
    ``d_in`` extra (N, d_out, BC) planes; above ``UNROLL_TEMP_BYTES`` the
    kernel switches to a fori_loop costing one plane plus the (N, d_in, BC)
    staging/accumulation buffers.
    """
    d0, dk, d_total = _program_dims(ops)
    bc = _pad(block_c, 128)

    def plane(d):                  # one (N, d, BC) activation plane
        return n * _pad(d, 8) * bc

    planes = plane(d0)             # the broadcast input plane
    max_d = d0
    d = d0
    max_temp = 0                   # worst single-layer temporary floats
    for op in ops:
        if op[0] == "dense":
            d_in, d_out = op[1], op[2]
            if 4 * d_in * n * d_out * block_c > UNROLL_TEMP_BYTES:
                temp = plane(d_out) + 2 * plane(d_in)  # acc + 2x scratch
            else:
                temp = d_in * plane(d_out)             # unrolled temps
            max_temp = max(max_temp, temp)
            d = d_out
        planes += plane(d)         # this op's output plane
        max_d = max(max_d, d)
    floats = (2 * _pad(d_total, 8) * bc        # theta + grad blocks
              + n * (_pad(d0, 128) + _pad(dk, 128))  # x + y
              + planes + 2 * plane(max_d)      # residuals + g + y bcast
              + max_temp)
    return 4 * floats


def make_fused_potential_vg(ops, n_rows: int, *, lik: str = "gaussian",
                            block_c: int = 512, interpret: bool = False):
    """Builds ``vg(theta (C, D), sd (C,), x (N, d0), y (N,|N, dK)) ->
    (ll (C,), grad (C, D))`` from an op program.

    ``x``/``y`` are call arguments (not closure constants) so the same
    compiled kernel consumes the *local shard* under ``shard_map``; their row
    count must equal the static ``n_rows``. ``sd`` is the per-chain Gaussian
    noise scale (broadcast a fixed scalar; ignored for Bernoulli).
    """
    ops = tuple(ops)
    n = int(n_rows)
    d0, dk, d_total = _program_dims(ops)
    kernel = functools.partial(_potential_kernel, ops, n, lik)

    def vg(thetas: jax.Array, sd, x: jax.Array, y: jax.Array):
        c = thetas.shape[0]
        bc = choose_block_c(c, block_c)
        theta_t = thetas.T                          # (D, C)
        x2 = jnp.asarray(x, jnp.float32).reshape(n, d0)
        y2 = _prep_labels(y, n, dk, lik)
        sd_row = jnp.broadcast_to(
            jnp.asarray(sd, jnp.float32), (c,))[None]

        fori_dins = _fori_dense_dims(ops, n, bc)
        scratch_shapes = (
            [pltpu.VMEM((n, max(fori_dins), bc), jnp.float32)] * 2
            if fori_dins else [])
        grid = (c // bc,)
        ll, grad_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((d_total, bc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, d0), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, dk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_total, bc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((d_total, c), jnp.float32),
            ],
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(theta_t, x2, y2, sd_row)
        return ll[0], grad_t.T

    return vg


def make_fused_likelihood_vg(dims: Sequence[int], acts: Sequence[str],
                             x: jax.Array, y: jax.Array,
                             block_c: int = 512,
                             interpret: bool = False):
    """Plain dense-stack builder closing over (x, y) — the single-device
    Gaussian configuration (kept as the kernel-test surface).

    ``dims`` are the dense widths (d0, ..., dK); ``acts`` the activation
    after each dense layer ("tanh"/"relu"/"none", the last usually "none").
    """
    ops = []
    for i, a in enumerate(acts):
        ops.append(("dense", int(dims[i]), int(dims[i + 1])))
        if a not in ("none", "identity"):
            ops.append((a, int(dims[i + 1])))
    vg = make_fused_potential_vg(ops, x.shape[0], lik="gaussian",
                                 block_c=block_c, interpret=interpret)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    return lambda thetas, sd: vg(thetas, sd, x, y)


def _model_program(model, likelihood) -> Optional[Tuple[tuple, str]]:
    """Pattern-matches (model, likelihood) to an op program, or None.

    A trailing ``Softmax`` head under ``CategoricalLikelihood`` is fused
    into the likelihood itself (lik = "categorical" operates on the last
    dense layer's logits via logsumexp — numerically tighter than
    softmax-then-log and with the closed-form ``onehot - p`` gradient);
    a softmax anywhere else is out of scope.
    """
    from tensorbnn_tpu.likelihoods import BernoulliLikelihood, \
        CategoricalLikelihood, FixedGaussianLikelihood, GaussianLikelihood
    from tensorbnn_tpu.models.layers import Activation, CauchyDenseLayer, \
        GaussianDenseLayer, LeakyRelu, Prelu, SquarePrelu

    if isinstance(likelihood, (FixedGaussianLikelihood, GaussianLikelihood)):
        lik = "gaussian"
    elif isinstance(likelihood, BernoulliLikelihood):
        lik = "bernoulli"
    elif isinstance(likelihood, CategoricalLikelihood):
        lik = "categorical"
    else:
        return None

    ops: List[tuple] = []
    d = None
    for layer in model.layers:
        if isinstance(layer, (GaussianDenseLayer, CauchyDenseLayer)):
            if getattr(layer, "compute_dtype", None) is not None:
                return None
            if d is not None and d != layer.in_dim:
                return None
            ops.append(("dense", int(layer.in_dim), int(layer.out_dim)))
            d = int(layer.out_dim)
        elif isinstance(layer, Activation):
            if d is None:
                return None
            name = {"Exp": "exp"}.get(layer.name, layer.name)
            if name not in ("tanh", "relu", "sigmoid", "elu", "exp",
                            "softmax"):
                return None
            ops.append((name, d))
        elif isinstance(layer, LeakyRelu):
            if d is None:
                return None
            ops.append(("leakyrelu", d, float(layer.alpha)))
        elif isinstance(layer, (Prelu, SquarePrelu)):
            if d is None or layer.in_dim != d:
                return None
            kind = "sqprelu" if isinstance(layer, SquarePrelu) else "prelu"
            ops.append((kind, d))
        else:
            return None
    if d is None:
        return None
    if lik == "categorical":
        # the softmax head folds into the likelihood; logits stay the
        # program's output
        if not ops or ops[-1][0] != "softmax":
            return None
        ops = ops[:-1]
        if not ops:
            return None
    if any(op[0] == "softmax" for op in ops):
        return None
    return tuple(ops), lik


def try_build_fused_main_vg(model, likelihood, unravel_theta, unravel_eta,
                            x, y, eta_dim: int,
                            block_c: int = 512,
                            interpret: bool = False,
                            axis_name: Optional[str] = None,
                            n_rows: Optional[int] = None,
                            require_profitable: bool = False,
                            ) -> Optional[Callable]:
    """Pattern-matches the model and returns a fused batched main_vg, or
    None when the model/likelihood falls outside the kernel's scope, the
    working set exceeds the VMEM budget, or (with ``require_profitable``,
    the driver's ``auto`` mode) the shape is outside the regime where the
    kernel beats XLA.

    The returned oracle has signature ``f(thetas (C, D), etas (C, H),
    x, y) -> ((C,), (C, D))``. The likelihood value+grad comes from the
    Pallas kernel (psum'd over ``axis_name`` when given — x/y are then the
    local shards, of ``n_rows`` rows); the prior terms (cheap in theta) stay
    in XLA and fuse into the surrounding scan.
    """
    from tensorbnn_tpu.likelihoods import FixedGaussianLikelihood, \
        GaussianLikelihood

    matched = _model_program(model, likelihood)
    if matched is None:
        return None
    ops, lik = matched

    if not verify_theta_layout(unravel_theta, ops):
        return None

    n = int(n_rows if n_rows is not None else x.shape[0])
    if require_profitable and not fused_profitable(ops, n):
        return None
    # VMEM-fit gate. Mosaic only allows chain blocks that are multiples of
    # 128 (or the full chain count), so shrink the cap in 128 steps; when
    # even a 128-chain block (or the requested full block) cannot fit, fall
    # back to the XLA potential — big-data configs belong there.
    if kernel_vmem_bytes(ops, n, min(block_c, 128)) > VMEM_LIMIT_BYTES:
        return None
    while block_c > 128 and \
            kernel_vmem_bytes(ops, n, block_c) > VMEM_LIMIT_BYTES:
        # step down in whole 128-lane tiles (a 129..255 cap costs the same
        # VMEM as 256, so jump straight to the next tile boundary)
        block_c = max(128, (block_c - 1) // 128 * 128)

    learned_sd = isinstance(likelihood, GaussianLikelihood)
    if learned_sd:
        # the sd_root hyper must be the last flat-eta coordinate
        probe = unravel_eta(jnp.arange(eta_dim, dtype=jnp.float32))
        lik_hypers = probe[1]
        if "sd_root" not in lik_hypers or \
                int(np.asarray(lik_hypers["sd_root"])) != eta_dim - 1:
            return None

    fused = make_fused_potential_vg(ops, n, lik=lik, block_c=block_c,
                                    interpret=interpret)

    def prior_fn(theta, eta):
        params = unravel_theta(theta)
        hypers, _ = unravel_eta(eta)
        return model.log_prior(hypers, params)

    prior_vg = jax.vmap(jax.value_and_grad(prior_fn))

    if learned_sd:
        def sd_of(etas):
            return etas[:, -1] ** 2
    elif isinstance(likelihood, FixedGaussianLikelihood):
        sd_fixed = float(likelihood.sd)

        def sd_of(etas):
            return sd_fixed
    else:
        def sd_of(etas):
            return 1.0  # unused by the Bernoulli/categorical tails

    def batched_main_vg(thetas, etas, x_in, y_in):
        lv, lg = fused(thetas, sd_of(etas), x_in, y_in)
        if axis_name is not None:
            lv, lg = lax.psum((lv, lg), axis_name)
        pv, pg = prior_vg(thetas, etas)
        return lv + pv, lg + pg

    return batched_main_vg


def reference_likelihood_vg(dims, acts, x, y):
    """Pure-JAX oracle of the plain dense-stack Gaussian computation."""
    ops = []
    for i, a in enumerate(acts):
        ops.append(("dense", int(dims[i]), int(dims[i + 1])))
        if a not in ("none", "identity"):
            ops.append((a, int(dims[i + 1])))
    vg = reference_potential_vg(tuple(ops), x, y, lik="gaussian")
    return vg


def reference_potential_vg(ops, x, y, lik: str = "gaussian"):
    """Pure-JAX oracle of the fused kernel, for tests."""
    d0, dk, _ = _program_dims(ops)
    x = jnp.asarray(x, jnp.float32).reshape(-1, d0)
    y = jnp.asarray(y, jnp.float32).reshape(-1, dk)
    n = x.shape[0]

    def single(theta, sd):
        off = 0
        h = x
        for op in ops:
            kind = op[0]
            if kind == "dense":
                d_in, d_out = op[1], op[2]
                b = theta[off:off + d_out]
                w = theta[off + d_out:off + d_out + d_in * d_out].reshape(
                    d_in, d_out)
                off += d_out + d_in * d_out
                h = h @ w + b
            elif kind == "leakyrelu":
                h = jnp.where(h < 0.0, op[2] * h, h)
            elif kind == "elu":
                h = jnp.where(h > 0.0, h, jnp.exp(h) - 1.0)
            elif kind in ("prelu", "sqprelu"):
                d = op[1]
                s = theta[off:off + d]
                off += d
                eff = s * s if kind == "sqprelu" else s
                h = jnp.where(h < 0.0, eff[None, :] * h, h)
            else:
                fwd, _ = _fixed_act(kind)
                h = fwd(h)
        if lik == "gaussian":
            sd = jnp.clip(sd, 1e-8, 1e8)
            resid = (y - h) / sd
            k = n * dk
            return -0.5 * (jnp.sum(resid * resid) + 2.0 * k * jnp.log(sd)
                           + k * LOG_2PI)
        p = jnp.clip(h, BERN_LO, BERN_HI)
        return jnp.sum(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))

    def vg(thetas, sd):
        sd = jnp.broadcast_to(jnp.asarray(sd, jnp.float32),
                              (thetas.shape[0],))
        return jax.vmap(jax.value_and_grad(single))(thetas, sd)

    return vg
