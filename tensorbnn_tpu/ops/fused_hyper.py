"""Fused hyper-chain trajectory kernel (Pallas/Mosaic, TPU).

The hyper block integrates the (C, H) hyper-parameter chain for
``hyper_leapfrog`` leapfrog steps per epoch (reference network.py:414-440
runs it as a tfp HMC kernel over the hyper variables). With the
sufficient-statistics potential (sampler/hyper_stats.py) each step is a
few dozen scalar ops per chain — but under XLA those execute as hundreds
of tiny latency-bound fusions inside a ``while_loop`` (H ~ 10-20 rows,
C ~ 64 lanes: far below any TPU unit's occupancy). This kernel runs the
WHOLE hyper trajectory as one Mosaic program: eta/momentum planes live in
VMEM registers shaped (H, BC) with chains on lanes, the closed-form
value-and-grad of the stats potential is ~15 VPU ops per dense block, and
the ``L``-step loop never leaves the core.

Scope = exactly the stats potential's scope (probe_stats_layout):
Gaussian dense layers only, likelihood uncoupled or the learned-sd
Gaussian. The per-chain step size (dual-averaged by the driver) enters as
a (1, BC) VMEM row — traced, so dual-averaging updates never recompile.
``hyper_leapfrog`` is static (a config constant, fixed for a run — unlike
the GP-adapted main-chain (eps, L), which must stay traced).

Value/grad parity with ``jax.value_and_grad`` of the stats potential is
tested to f32 tolerance (tests/test_fused_hyper.py); the MH accept stays
in XLA, drawing the identical PRNG stream as ``hmc_step_batched``.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorbnn_tpu.ops.fused_mlp import choose_block_c

LOG_2PI = math.log(2.0 * math.pi)
SD_LO, SD_HI = 1e-8, 1e8


def _stats_vg(dense_blocks, coupled, sd_idx, h_dim, eta, stats):
    """Closed-form value+grad of the stats hyper potential on planes.

    ``eta``: (H, BC); ``stats``: (S, BC) in probe_stats_layout row order.
    Returns ``(lp (BC,), grad (H, BC))``. Mirrors
    hyper_stats.make_stats_hyper.hyper_logp term for term (which itself
    mirrors the generic potential; reference BNN_functions.py normal
    log-prob + network.py:414-440 hyper priors).
    """
    bc = eta.shape[1]
    lp = jnp.zeros((bc,), jnp.float32)
    g_rows = {}

    def add_g(row, val):
        g_rows[row] = g_rows[row] + val if row in g_rows else val

    for j, (idx, k_w, k_b) in enumerate(dense_blocks):
        s1w, s2w = stats[4 * j], stats[4 * j + 1]
        s1b, s2b = stats[4 * j + 2], stats[4 * j + 3]
        for loc_row, scale_row, s1, s2, k in (
                (idx["w_loc"], idx["w_scale"], s1w, s2w, float(k_w)),
                (idx["b_loc"], idx["b_scale"], s1b, s2b, float(k_b))):
            loc = eta[loc_row]
            s = eta[scale_row]
            u = s * s
            # hyperpriors: N(0, .1) on loc, N(1, .1) on the squared scale
            z_loc = loc / 0.1
            z_u = (u - 1.0) / 0.1
            lp = lp - 0.5 * (z_loc * z_loc + z_u * z_u) \
                - 2.0 * (jnp.float32(math.log(0.1)) + 0.5 * LOG_2PI)
            add_g(loc_row, -loc / 0.01)
            g_scale = (-(u - 1.0) / 0.01) * (2.0 * s)
            # conditional prior via sufficient stats: sd = clip(scale^2),
            # quad = (S2 - 2 loc S1 + k loc^2) / sd^2, one sigma.size=1
            # normalizer per block (the reference quirk,
            # distributions.py:39-56)
            in_range = (u >= SD_LO) & (u <= SD_HI)
            sd = jnp.clip(u, SD_LO, SD_HI)
            quad_num = s2 - 2.0 * loc * s1 + k * loc * loc
            inv_sd2 = 1.0 / (sd * sd)
            lp = lp - 0.5 * (2.0 * jnp.log(sd) + quad_num * inv_sd2
                             + LOG_2PI)
            add_g(loc_row, (s1 - k * loc) * inv_sd2)
            d_sd = -1.0 / sd + quad_num * inv_sd2 / sd
            g_scale = g_scale + jnp.where(in_range, d_sd * 2.0 * s, 0.0)
            add_g(scale_row, g_scale)

    if coupled:
        e = eta[sd_idx]
        u = e * e
        in_range = (u >= SD_LO) & (u <= SD_HI)
        sd = jnp.clip(u, SD_LO, SD_HI)
        r, k = stats[-2], stats[-1]
        inv_sd2 = 1.0 / (sd * sd)
        lp = lp - 0.5 * (2.0 * k * jnp.log(sd) + r * inv_sd2 + k * LOG_2PI)
        d_sd = -k / sd + r * inv_sd2 / sd
        add_g(sd_idx, jnp.where(in_range, d_sd * 2.0 * e, 0.0))

    zero = jnp.zeros((bc,), jnp.float32)
    grad = jnp.stack([g_rows.get(i, zero) for i in range(h_dim)], axis=0)
    return lp, grad


def _hyper_traj_kernel(dense_blocks, coupled, sd_idx, n_steps: int,
                       h_dim: int,
                       eta_ref, mom_ref, stats_ref, eps_ref,
                       q_out, v_out, lp0_out, lp1_out):
    """All ``n_steps`` hyper leapfrog steps of one epoch in one program.

    Same masked kick-drift loop structure as the main trajectory kernel
    (ops/fused_mlp.py:_trajectory_kernel): iteration ``i`` evaluates
    vg(q), applies a half kick at i in {0, L} and a full kick otherwise,
    then drifts while i < L — so the final vg evaluation is at the end
    position and its value is lp1.
    """
    bc = eta_ref.shape[1]
    stats = stats_ref[:]
    eps = eps_ref[0, :]                                     # (BC,)
    n = jnp.int32(n_steps)

    def vg(qv):
        return _stats_vg(dense_blocks, coupled, sd_idx, h_dim, qv, stats)

    zero = jnp.zeros((bc,), jnp.float32)

    def body(i, carry):
        q, v, lp0, _lp = carry
        lp, g = vg(q)
        lp0 = jnp.where(i == 0, lp, lp0)
        kick = jnp.where((i == 0) | (i == n), 0.5 * eps, eps)
        drift = jnp.where(i < n, eps, 0.0)
        v = v + kick[None, :] * g
        q = q + drift[None, :] * v
        return (q, v, lp0, lp)

    q, v, lp0, lp = lax.fori_loop(
        0, n_steps + 1, body, (eta_ref[:], mom_ref[:], zero, zero))
    q_out[:] = q
    v_out[:] = v
    lp0_out[0, :] = lp0
    lp1_out[0, :] = lp


def make_fused_hyper_trajectory(dense_blocks, coupled, sd_idx,
                                eta_dim: int, n_stats: int,
                                n_steps: int, block_c: int = 512,
                                interpret: bool = False) -> Callable:
    """Builds ``traj(etas (C,H), stats (C,S), momenta (C,H), eps (C,))
    -> (q (C,H), v (C,H), lp0 (C,), lp1 (C,))``."""
    blocks = tuple((dict(idx), int(kw), int(kb))
                   for _, idx, kw, kb in dense_blocks)
    kernel = functools.partial(_hyper_traj_kernel, blocks, coupled,
                               sd_idx, int(n_steps), int(eta_dim))

    def traj(etas, stats, momenta, eps):
        c = etas.shape[0]
        bc = choose_block_c(c, block_c)
        grid = (c // bc,)
        block = lambda r: pl.BlockSpec((r, bc), lambda i: (0, i),  # noqa: E731
                                       memory_space=pltpu.VMEM)
        eps_arr = jnp.broadcast_to(
            jnp.asarray(eps, jnp.float32).reshape(-1), (c,)).reshape(1, c)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block(eta_dim), block(eta_dim), block(n_stats),
                      block(1)],
            out_specs=[block(eta_dim), block(eta_dim), block(1), block(1)],
            out_shape=[
                jax.ShapeDtypeStruct((eta_dim, c), jnp.float32),
                jax.ShapeDtypeStruct((eta_dim, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.asarray(etas, jnp.float32).T,
          jnp.asarray(momenta, jnp.float32).T,
          jnp.asarray(stats, jnp.float32).T, eps_arr)
        q_t, v_t, lp0, lp1 = outs
        return q_t.T, v_t.T, lp0[0], lp1[0]

    return traj


def try_build_fused_hyper_trajectory(model, likelihood, unravel_eta,
                                     eta_dim: int, n_steps: int,
                                     block_c: int = 512,
                                     interpret: bool = False
                                     ) -> Optional[Callable]:
    """Pattern-matches the model for the fused hyper-trajectory kernel.

    Scope identical to the stats hyper potential's
    (hyper_stats.probe_stats_layout) — the kernel consumes that
    potential's stats rows. Returns None when out of scope.
    """
    from tensorbnn_tpu.sampler.hyper_stats import probe_stats_layout

    layout = probe_stats_layout(model, likelihood, unravel_eta, eta_dim)
    if layout is None:
        return None
    dense_layers, coupled, sd_idx = layout
    n_stats = 4 * len(dense_layers) + (2 if coupled else 0)
    return make_fused_hyper_trajectory(
        dense_layers, coupled, sd_idx, eta_dim, n_stats, n_steps,
        block_c=block_c, interpret=interpret)
