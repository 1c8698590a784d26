"""Sufficient-statistics hyper potential == the generic hyper potential.

The stats form (sampler/hyper_stats.py) must reproduce the generic
``Potentials.hyper_vg`` exactly (float-association tolerance): same
hyperpriors, same reference-exact gaussian_logprob normalization, same
coupled-likelihood term.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    BernoulliLikelihood,
    CauchyDenseLayer,
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    Prelu,
    Sigmoid,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.hyper_stats import make_stats_hyper
from tensorbnn_tpu.sampler.potential import flatten_state, make_potentials


def _setup(model, lik, n=13, d_in=2, seed=0, c=4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d_in)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    params, hypers = model.init(jax.random.key(seed))
    flat = flatten_state(params, hypers, lik.init_hypers())
    thetas = jnp.asarray(
        0.4 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.asarray(
        flat.eta[None] + 0.1 * rng.normal(size=(c, flat.eta.size)),
        jnp.float32)
    return x, y, flat, thetas, etas


@pytest.mark.parametrize("lik", [
    FixedGaussianLikelihood(sd=0.1),
    GaussianLikelihood(sd=0.15),
    BernoulliLikelihood(),
])
def test_stats_hyper_matches_generic(lik):
    model = Sequential([GaussianDenseLayer(2, 7), Tanh(),
                        GaussianDenseLayer(7, 1), Sigmoid()])
    x, y, flat, thetas, etas = _setup(model, lik)
    if isinstance(lik, BernoulliLikelihood):
        y = (y > 0).astype(jnp.float32)

    built = make_stats_hyper(model, lik, x, y, flat.unravel_eta,
                             flat.eta.size)
    assert built is not None
    stats_fn, hyper_vg_stats, hyper_vg_stats_t = built
    params_b = jax.vmap(flat.unravel_theta)(thetas)
    stats = stats_fn(params_b)

    pots = make_potentials(model, lik, x, y, flat.unravel_theta,
                           flat.unravel_eta)
    v_g, g_g = jax.vmap(pots.hyper_vg)(etas, thetas)
    v_s, g_s = hyper_vg_stats(etas, stats)

    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_g),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               rtol=1e-4, atol=1e-4)


def test_stats_hyper_scope_rejections():
    x = jnp.zeros((5, 1), jnp.float32)
    y = jnp.zeros((5,), jnp.float32)
    lik = FixedGaussianLikelihood(sd=0.1)

    # Cauchy priors are not quadratic in theta
    cauchy = Sequential([CauchyDenseLayer(1, 4)])
    p, h = cauchy.init(jax.random.key(0))
    flat = flatten_state(p, h, {})
    assert make_stats_hyper(cauchy, lik, x, y, flat.unravel_eta,
                            flat.eta.size) is None

    # Prelu carries its own (exponential) hyperprior
    pre = Sequential([GaussianDenseLayer(1, 4), Prelu(4),
                      GaussianDenseLayer(4, 1)])
    p2, h2 = pre.init(jax.random.key(0))
    flat2 = flatten_state(p2, h2, {})
    assert make_stats_hyper(pre, lik, x, y, flat2.unravel_eta,
                            flat2.eta.size) is None


def test_stats_hyper_under_mesh_matches_single_device():
    """Sharded stats (R psum'd once) reproduce the full-data coupled
    hyper potential."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tensorbnn_tpu.parallel.mesh import DATA_AXIS, make_mesh

    model = Sequential([GaussianDenseLayer(2, 5), Tanh(),
                        GaussianDenseLayer(5, 1)])
    lik = GaussianLikelihood(sd=0.1)
    x, y, flat, thetas, etas = _setup(model, lik, n=16)

    mesh = make_mesh(n_chain_devices=2, n_data_devices=4,
                     devices=jax.devices()[:8])

    def sharded_vg(thetas_in, etas_in, x_in, y_in):
        built = make_stats_hyper(model, lik, x_in, y_in,
                                 flat.unravel_eta, flat.eta.size,
                                 axis_name=DATA_AXIS)
        stats_fn, hyper_vg_stats, hyper_vg_stats_t = built
        params_b = jax.vmap(flat.unravel_theta)(thetas_in)
        return hyper_vg_stats(etas_in, stats_fn(params_b))

    v_s, g_s = shard_map(
        sharded_vg, mesh=mesh,
        in_specs=(P("chains"), P("chains"), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P("chains"), P("chains")),
        check_vma=False)(thetas, etas, x, y)

    pots = make_potentials(model, lik, x, y, flat.unravel_theta,
                           flat.unravel_eta)
    v_g, g_g = jax.vmap(pots.hyper_vg)(etas, thetas)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_g),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               rtol=1e-4, atol=1e-4)


def test_sampling_with_stats_hyper_matches_generic_path():
    """End-to-end: the driver run with the stats hyper potential equals a
    run with it disabled (same PRNG; values equal to float association)."""
    import math

    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.sampler import hyper_stats

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)

    def run(enabled):
        orig = hyper_stats.make_stats_hyper
        if not enabled:
            hyper_stats.make_stats_hyper = lambda *a, **k: None
        try:
            net = Network(jnp.float32, 1, x, y, x, y, seed=21)
            net.add(GaussianDenseLayer(1, 6)).add(Tanh())
            net.add(GaussianDenseLayer(6, 1))
            net.setup_mcmc(step_size_start=1e-3, leapfrog_start=8,
                           leapfrog_min=4, leapfrog_max=16, burnin=10,
                           averaging_steps=5, hyper_leapfrog=6,
                           random_steps=1)
            return net.train(30, 4, GaussianLikelihood(sd=0.1),
                             n_chains=2, verbose=False)
        finally:
            hyper_stats.make_stats_hyper = orig

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(a.eta_samples, b.eta_samples,
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("lik", [
    GaussianLikelihood(sd=0.15),       # coupled: beta scales the R term
    FixedGaussianLikelihood(sd=0.1),   # uncoupled: beta is a no-op
])
def test_stats_hyper_tempered_matches_generic(lik):
    """The tempered stats variant == Potentials.hyper_vg_t: only the
    coupled likelihood term scales by beta (power posterior), priors and
    hyperpriors untempered."""
    model = Sequential([GaussianDenseLayer(2, 7), Tanh(),
                        GaussianDenseLayer(7, 1)])
    x, y, flat, thetas, etas = _setup(model, lik)

    built = make_stats_hyper(model, lik, x, y, flat.unravel_eta,
                             flat.eta.size)
    stats_fn, hyper_vg_stats, hyper_vg_stats_t = built
    params_b = jax.vmap(flat.unravel_theta)(thetas)
    stats = stats_fn(params_b)
    betas = jnp.asarray([1.0, 0.4, 0.1, 0.02], jnp.float32)

    pots = make_potentials(model, lik, x, y, flat.unravel_theta,
                           flat.unravel_eta)
    v_g, g_g = jax.vmap(pots.hyper_vg_t, in_axes=(0, 0, 0))(
        etas, thetas, betas)
    v_s, g_s = hyper_vg_stats_t(etas, stats, betas)

    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_g),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               rtol=1e-4, atol=1e-4)
    if isinstance(lik, FixedGaussianLikelihood):
        # uncoupled: the tempered variant must equal the plain one
        v_p, g_p = hyper_vg_stats(etas, stats)
        np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_p))
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_p))
