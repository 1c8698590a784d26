"""Fused hyper-trajectory Pallas kernel vs the XLA hyper block.

The kernel integrates all ``hyper_leapfrog`` steps of the stats-potential
hyper chain in one Mosaic program (ops/fused_hyper.py); it must reproduce
``leapfrog_batched`` over the stats potential's ``hyper_vg`` (the same
potential the reference's hyper tfp kernel targets, network.py:414-440)
on identical inputs, and the driver integration must sample the same
posterior as the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import (
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.ops.fused_hyper import try_build_fused_hyper_trajectory
from tensorbnn_tpu.sampler.hmc import leapfrog_batched
from tensorbnn_tpu.sampler.hyper_stats import make_stats_hyper
from tensorbnn_tpu.sampler.potential import flatten_state


def _setup(lik, n=9, width=5, c=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    model = Sequential([GaussianDenseLayer(2, width), Tanh(),
                        GaussianDenseLayer(width, 1)])
    params, hypers = model.init(jax.random.key(seed))
    flat = flatten_state(params, hypers, lik.init_hypers())

    stats_f, hyper_vg, _ = make_stats_hyper(
        model, lik, jnp.asarray(x), jnp.asarray(y), flat.unravel_eta,
        flat.eta.size)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    stats = stats_f(jax.vmap(flat.unravel_theta)(thetas))

    # perturbed per-chain etas so locs/scales differ chain to chain
    etas = jnp.asarray(
        np.tile(np.asarray(flat.eta)[None], (c, 1))
        + 0.05 * rng.normal(size=(c, flat.eta.size)), jnp.float32)

    traj = try_build_fused_hyper_trajectory(
        model, lik, flat.unravel_eta, flat.eta.size, n_steps=7,
        block_c=c, interpret=True)
    assert traj is not None
    return model, flat, stats, hyper_vg, etas, traj


def _compare(lik, seed=0):
    c = 4
    model, flat, stats, hyper_vg, etas, traj = _setup(lik, c=c, seed=seed)
    rng = np.random.default_rng(seed + 1)
    momenta = jnp.asarray(rng.normal(size=etas.shape), jnp.float32)
    eps = jnp.asarray(0.01 + 0.01 * rng.random(c), jnp.float32)

    q_f, v_f, lp0_f, lp1_f = traj(etas, stats, momenta, eps)

    vg = lambda es: hyper_vg(es, stats)  # noqa: E731
    lp0_x, _ = vg(etas)
    q_x, v_x, lp1_x, _ = leapfrog_batched(
        vg, etas, momenta, eps[:, None], jnp.asarray(7, jnp.int32))

    np.testing.assert_allclose(np.asarray(lp0_f), np.asarray(lp0_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp1_f), np.asarray(lp1_x),
                               rtol=1e-4, atol=1e-3)


def test_matches_xla_leapfrog_uncoupled():
    _compare(FixedGaussianLikelihood(sd=0.1))


def test_matches_xla_leapfrog_coupled():
    # learned-sd Gaussian: the likelihood couples into the hyper chain
    # through the residual power R and the event count
    _compare(GaussianLikelihood(sd=0.15), seed=3)


def test_vg_closed_form_matches_autodiff():
    # the kernel's hand-derived grad vs jax.value_and_grad of the stats
    # potential, including the sd clip mask
    from tensorbnn_tpu.ops.fused_hyper import _stats_vg
    from tensorbnn_tpu.sampler.hyper_stats import probe_stats_layout

    lik = GaussianLikelihood(sd=0.15)
    model, flat, stats, hyper_vg, etas, _ = _setup(lik, c=4, seed=1)
    layout = probe_stats_layout(model, lik, flat.unravel_eta,
                                flat.eta.size)
    dense_layers, coupled, sd_idx = layout
    blocks = tuple((dict(idx), int(kw), int(kb))
                   for _, idx, kw, kb in dense_layers)

    lp_k, g_k = _stats_vg(blocks, coupled, sd_idx, flat.eta.size,
                          jnp.asarray(etas).T, jnp.asarray(stats).T)
    lp_x, g_x = hyper_vg(etas, stats)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k).T, np.asarray(g_x),
                               rtol=1e-5, atol=1e-4)


def test_out_of_scope_returns_none():
    from tensorbnn_tpu import CauchyDenseLayer

    lik = FixedGaussianLikelihood(sd=0.1)
    model = Sequential([CauchyDenseLayer(2, 3), Tanh(),
                        GaussianDenseLayer(3, 1)])
    params, hypers = model.init(jax.random.key(0))
    flat = flatten_state(params, hypers, lik.init_hypers())
    assert try_build_fused_hyper_trajectory(
        model, lik, flat.unravel_eta, flat.eta.size, n_steps=5,
        interpret=True) is None


def test_epoch_fn_integration_matches_xla_path():
    """The gibbs wiring: one epoch through make_epoch_fn with the fused
    hyper kernel vs the XLA hyper block, identical carry and identical
    PRNG stream — post-epoch etas and hyper acceptance must agree to f32
    tolerance (a full-run comparison is chaotic: one borderline MH flip
    compounds, so the single-epoch check is the discriminating one)."""
    import math as _math
    from tensorbnn_tpu.sampler.gibbs import ChainState, make_epoch_fn

    lik = GaussianLikelihood(sd=0.15)
    c = 4
    model, flat, stats, hyper_vg, etas, traj = _setup(lik, c=c, seed=6)
    rng = np.random.default_rng(7)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(9, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(9,)), jnp.float32)

    def one_epoch(hyper_traj):
        fn = make_epoch_fn(
            model, lik, x, y, flat.unravel_theta, flat.unravel_eta,
            adjust_hypers=True, hyper_leapfrog=7, burnin=100.0,
            mu=_math.log(100.0 * 1e-2), batched_hyper_traj=hyper_traj,
            eta_dim=flat.eta.size)
        carry = ChainState(
            theta=thetas, eta=etas,
            key=jax.random.split(jax.random.key(3), c),
            hyper_step=jnp.full((c,), 1e-2, jnp.float32),
            log_eps_bar=jnp.zeros((c,), jnp.float32),
            h=jnp.zeros((c,), jnp.float32),
            epoch=jnp.zeros((c,), jnp.float32))
        new_carry, trace = fn(carry, jnp.asarray(1e-3, jnp.float32),
                              jnp.asarray(5, jnp.int32))
        return new_carry, trace

    c_f, t_f = one_epoch(traj)
    c_x, t_x = one_epoch(None)
    np.testing.assert_allclose(np.asarray(t_f.hyper_accept),
                               np.asarray(t_x.hyper_accept),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_f.eta), np.asarray(c_x.eta),
                               rtol=1e-4, atol=1e-5)
    # the main block is untouched by the hyper kernel
    np.testing.assert_array_equal(np.asarray(c_f.theta),
                                  np.asarray(c_x.theta))
