"""Fused Pallas kernel: Gaussian-likelihood MLP value+grad over chain blocks.

The sampler's hot op is the full-data log-likelihood gradient of a *small*
dense MLP, evaluated once per leapfrog step for every chain (SURVEY.md #7
hard part 4). XLA lowers this as dozens of tiny ops whose shapes put the
10-wide feature dimensions on the TPU's 128-lane axis — single-digit
utilization. This kernel flips the layout: **chains on lanes**. Every
activation plane is an ``(N, d, C)`` array whose minor axis is the chain
block, so each multiply-add saturates the VPU regardless of how narrow the
MLP is, and the whole forward+backward runs as ONE kernel per grad eval with
all intermediates resident in VMEM.

Scope (benchmark-gated, enabled when the model matches): stacks of dense
layers with tanh/relu/identity activations and a Gaussian likelihood
(fixed or learned sd). Priors are quadratic in theta and stay in XLA, fused
into the surrounding scan. Everything else falls back to the vmapped XLA
potential.

Layout contract: the flat state enters transposed as ``theta_T (D, C)``.
Row order must match ``ravel_pytree`` of the params tuple — per dense layer,
bias rows then row-major (in, out) weight rows — which the builder verifies
against the caller's ``unravel_theta``.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = math.log(2.0 * math.pi)


def _activation_fns(name: str):
    if name == "tanh":
        return jnp.tanh, lambda h: 1.0 - h * h          # d/da via h=f(a)
    if name == "relu":
        return (lambda a: jnp.maximum(a, 0.0),
                lambda h: (h > 0.0).astype(h.dtype))
    if name in ("none", "identity"):
        return (lambda a: a, lambda h: jnp.ones_like(h))
    raise ValueError(f"unsupported fused activation: {name}")


def _mlp_kernel(dims: Tuple[int, ...], acts: Tuple[str, ...], n_data: int,
                theta_ref, x_ref, y_ref, sd_ref, ll_ref, grad_ref):
    """Single chain-block program: forward + manual backward, all in VMEM.

    theta_ref: (D, BC); x_ref: (N, d0); y_ref: (N, dK); sd_ref: (1, BC);
    ll_ref out: (1, BC); grad_ref out: (D, BC).
    """
    n_layers = len(dims) - 1
    bc = theta_ref.shape[1]
    n = n_data

    # -- slice weights out of the flat block (rows: b then w per layer) ------
    offs, bs, ws = [], [], []
    off = 0
    for l in range(n_layers):
        d_in, d_out = dims[l], dims[l + 1]
        b = theta_ref[pl.ds(off, d_out), :]                    # (d_out, BC)
        w = theta_ref[pl.ds(off + d_out, d_in * d_out), :]     # (d_in*d_out, BC)
        offs.append(off)
        bs.append(b)
        ws.append(w.reshape(d_in, d_out, bc))
        off += d_out + d_in * d_out

    # -- forward: planes (N, d, BC) -------------------------------------------
    x = x_ref[:]                                               # (N, d0)
    h = jnp.broadcast_to(x[:, :, None], (n, dims[0], bc))
    hs = [h]
    for l in range(n_layers):
        d_in, d_out = dims[l], dims[l + 1]
        a = jnp.broadcast_to(bs[l][None, :, :], (n, d_out, bc))
        for i in range(d_in):
            a = a + h[:, i:i + 1, :] * ws[l][i][None, :, :]
        fwd, _ = _activation_fns(acts[l])
        h = fwd(a)
        hs.append(h)

    # -- Gaussian likelihood (reference-exact normalization, see
    #    distributions.gaussian_logprob: sigma broadcast over preds) ---------
    sd = sd_ref[0, :]                                          # (BC,)
    out = hs[-1]                                               # (N, dK, BC)
    y = jnp.broadcast_to(y_ref[:][:, :, None], out.shape)
    inv_sd = 1.0 / sd
    resid = (y - out) * inv_sd[None, None, :]
    quad = jnp.sum(resid * resid, axis=(0, 1))                 # (BC,)
    k = float(n * dims[-1])
    ll = -0.5 * (quad + 2.0 * k * jnp.log(sd) + k * LOG_2PI)
    ll_ref[0, :] = ll

    # -- backward --------------------------------------------------------------
    # d ll / d out = (y - out) / sd^2
    g = (y - out) * (inv_sd * inv_sd)[None, None, :]
    for l in range(n_layers - 1, -1, -1):
        d_in, d_out = dims[l], dims[l + 1]
        _, bwd = _activation_fns(acts[l])
        g = g * bwd(hs[l + 1])
        h_prev = hs[l]
        # db = sum_n g ; dw[i, j] = sum_n h_prev[:, i] * g[:, j]
        db = jnp.sum(g, axis=0)                                # (d_out, BC)
        grad_ref[pl.ds(offs[l], d_out), :] = db
        for i in range(d_in):
            dw_i = jnp.sum(h_prev[:, i:i + 1, :] * g, axis=0)  # (d_out, BC)
            grad_ref[pl.ds(offs[l] + d_out + i * d_out, d_out), :] = dw_i
        if l > 0:
            # g_prev[:, i] = sum_j g[:, j] * w[i, j]
            g_prev = [
                jnp.sum(g * ws[l][i][None, :, :], axis=1, keepdims=True)
                for i in range(d_in)
            ]
            g = jnp.concatenate(g_prev, axis=1)                # (N, d_in, BC)


def verify_theta_layout(unravel_theta, dims: Sequence[int]) -> bool:
    """Checks the flat layout matches the kernel's row contract."""
    d_total = sum(dims[i] * dims[i + 1] + dims[i + 1]
                  for i in range(len(dims) - 1))
    try:
        probe = unravel_theta(jnp.arange(d_total, dtype=jnp.float32))
    except ValueError:
        return False
    off = 0
    li = 0
    for layer_params in probe:
        if not layer_params:
            continue
        if set(layer_params) != {"b", "w"}:
            return False
        d_in, d_out = dims[li], dims[li + 1]
        b = np.asarray(layer_params["b"])
        w = np.asarray(layer_params["w"])
        if b.shape != (d_out,) or w.shape != (d_in, d_out):
            return False
        if not np.array_equal(b, np.arange(off, off + d_out)):
            return False
        want_w = np.arange(off + d_out,
                           off + d_out + d_in * d_out).reshape(d_in, d_out)
        if not np.array_equal(w, want_w):
            return False
        off += d_out + d_in * d_out
        li += 1
    return li == len(dims) - 1 and off == d_total


def make_fused_likelihood_vg(dims: Sequence[int], acts: Sequence[str],
                             x: jax.Array, y: jax.Array,
                             block_c: int = 512,
                             interpret: bool = False):
    """Builds ``vg(theta (C, D), sd (C,)) -> (ll (C,), grad (C, D))``.

    ``dims`` are the dense widths (d0, ..., dK); ``acts`` the activation
    after each dense layer ("tanh"/"relu"/"none", the last usually "none").
    ``sd`` is the per-chain Gaussian noise scale (broadcast a fixed scalar).
    """
    dims = tuple(int(d) for d in dims)
    acts = tuple(acts)
    n = int(x.shape[0])
    d_total = sum(dims[i] * dims[i + 1] + dims[i + 1]
                  for i in range(len(dims) - 1))
    x = jnp.asarray(x, jnp.float32).reshape(n, dims[0])
    y = jnp.asarray(y, jnp.float32).reshape(n, dims[-1])

    kernel = functools.partial(_mlp_kernel, dims, acts, n)

    def vg(thetas: jax.Array, sd: jax.Array):
        c = thetas.shape[0]
        bc = min(block_c, c)
        if c % bc:
            raise ValueError(f"chain count {c} must divide block {bc}")
        theta_t = thetas.T                          # (D, C)
        sd_row = jnp.broadcast_to(jnp.asarray(sd, jnp.float32), (c,))[None]

        grid = (c // bc,)
        ll, grad_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((d_total, bc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, dims[0]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, dims[-1]), lambda i: (0, 0),
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
            interpret=interpret,
        )(theta_t, x, y, sd_row)
        return ll[0], grad_t.T

    return vg


def try_build_fused_main_vg(model, likelihood, unravel_theta, unravel_eta,
                            x, y, eta_dim: int,
                            block_c: int = 512,
                            interpret: bool = False) -> Optional[Callable]:
    """Pattern-matches the model and returns a fused batched main_vg, or
    None when the model/likelihood falls outside the kernel's scope.

    Applies when the model is a stack of plain f32 dense layers with
    tanh/relu activations (identity tail) under a (Fixed)Gaussian
    likelihood. The likelihood value+grad comes from the Pallas kernel; the
    prior terms (quadratic in theta) stay in XLA and fuse into the
    surrounding scan.
    """
    from tensorbnn_tpu.likelihoods import FixedGaussianLikelihood, \
        GaussianLikelihood
    from tensorbnn_tpu.models.layers import Activation, CauchyDenseLayer, \
        GaussianDenseLayer

    if not isinstance(likelihood, (FixedGaussianLikelihood,
                                   GaussianLikelihood)):
        return None

    dims: List[int] = []
    acts: List[str] = []
    for layer in model.layers:
        if isinstance(layer, (GaussianDenseLayer, CauchyDenseLayer)):
            if getattr(layer, "compute_dtype", None) is not None:
                return None
            if acts and acts[-1] == "_pending":
                acts[-1] = "none"  # dense followed dense directly
            if dims and dims[-1] != layer.in_dim:
                return None
            if not dims:
                dims.append(layer.in_dim)
            dims.append(layer.out_dim)
            acts.append("_pending")
        elif isinstance(layer, Activation):
            if not acts or acts[-1] != "_pending":
                return None  # leading or doubled activation
            if layer.name in ("tanh", "relu"):
                acts[-1] = layer.name
            else:
                return None
        else:
            return None
    if not dims:
        return None
    acts = ["none" if a == "_pending" else a for a in acts]

    if not verify_theta_layout(unravel_theta, dims):
        return None

    learned_sd = isinstance(likelihood, GaussianLikelihood)
    if learned_sd:
        # the sd_root hyper must be the last flat-eta coordinate
        probe = unravel_eta(jnp.arange(eta_dim, dtype=jnp.float32))
        lik_hypers = probe[1]
        if "sd_root" not in lik_hypers or \
                int(np.asarray(lik_hypers["sd_root"])) != eta_dim - 1:
            return None

    fused = make_fused_likelihood_vg(dims, acts, x, y, block_c=block_c,
                                     interpret=interpret)

    def prior_fn(theta, eta):
        params = unravel_theta(theta)
        hypers, _ = unravel_eta(eta)
        return model.log_prior(hypers, params)

    prior_vg = jax.vmap(jax.value_and_grad(prior_fn))

    if learned_sd:
        def batched_main_vg(thetas, etas):
            sd = etas[:, -1] ** 2
            lv, lg = fused(thetas, sd)
            pv, pg = prior_vg(thetas, etas)
            return lv + pv, lg + pg
    else:
        sd_fixed = float(likelihood.sd)

        def batched_main_vg(thetas, etas):
            lv, lg = fused(thetas, sd_fixed)
            pv, pg = prior_vg(thetas, etas)
            return lv + pv, lg + pg

    return batched_main_vg


def reference_likelihood_vg(dims, acts, x, y):
    """Pure-JAX oracle of the same computation, for kernel tests."""
    x = jnp.asarray(x, jnp.float32).reshape(-1, dims[0])
    y = jnp.asarray(y, jnp.float32).reshape(-1, dims[-1])
    n = x.shape[0]

    def single(theta, sd):
        off = 0
        h = x
        for l in range(len(dims) - 1):
            d_in, d_out = dims[l], dims[l + 1]
            b = theta[off:off + d_out]
            w = theta[off + d_out:off + d_out + d_in * d_out].reshape(
                d_in, d_out)
            off += d_out + d_in * d_out
            a = h @ w + b
            fwd, _ = _activation_fns(acts[l])
            h = fwd(a)
        resid = (y - h) / sd
        k = n * dims[-1]
        return -0.5 * (jnp.sum(resid * resid) + 2.0 * k * jnp.log(sd)
                       + k * LOG_2PI)

    def vg(thetas, sd):
        sd = jnp.broadcast_to(jnp.asarray(sd, jnp.float32),
                              (thetas.shape[0],))
        return jax.vmap(jax.value_and_grad(single))(thetas, sd)

    return vg
