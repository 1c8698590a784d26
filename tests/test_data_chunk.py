"""Exact chunked likelihood accumulation (``data_chunk``).

The chunked path reshapes the data into row chunks and accumulates the
row-additive likelihood (and its gradient) in a rematerialized lax.scan —
activation memory bounded by chunk size, values exact up to float
association (sampler/potential.py). These tests pin value+grad equality
against the un-chunked potentials for every likelihood family, the
sufficient-stats R accumulation, and an end-to-end driver run.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    BernoulliLikelihood,
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    Sigmoid,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.potential import flatten_state, make_potentials


def _problem(likelihood, head=None, n=24, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    if isinstance(likelihood, BernoulliLikelihood):
        y = (x.sum(axis=1) > 0).astype(np.float32)
    else:
        y = np.sin(x.sum(axis=1)).astype(np.float32)
    layers = [GaussianDenseLayer(2, 5), Tanh(), GaussianDenseLayer(5, 1)]
    if head is not None:
        layers.append(head)
    model = Sequential(layers)
    params, hypers = model.init(jax.random.key(seed))
    flat = flatten_state(params, hypers, likelihood.init_hypers())
    return model, flat, jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("lik,head", [
    (FixedGaussianLikelihood(sd=0.1), None),
    (GaussianLikelihood(sd=0.1), None),
    (BernoulliLikelihood(), Sigmoid()),
])
def test_chunked_potentials_match_unchunked(lik, head):
    model, flat, x, y = _problem(lik, head)
    plain = make_potentials(model, lik, x, y,
                            flat.unravel_theta, flat.unravel_eta)
    chunked = make_potentials(model, lik, x, y,
                              flat.unravel_theta, flat.unravel_eta,
                              data_chunk=6)

    rng = np.random.default_rng(1)
    theta = jnp.asarray(flat.theta
                        + 0.1 * rng.normal(size=flat.theta.shape),
                        jnp.float32)
    eta = jnp.asarray(flat.eta, jnp.float32)

    v0, g0 = jax.jit(plain.main_vg)(theta, eta)
    v1, g1 = jax.jit(chunked.main_vg)(theta, eta)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)

    hv0, hg0 = jax.jit(plain.hyper_vg)(eta, theta)
    hv1, hg1 = jax.jit(chunked.hyper_vg)(eta, theta)
    np.testing.assert_allclose(np.asarray(hv1), np.asarray(hv0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hg1), np.asarray(hg0),
                               rtol=1e-4, atol=1e-5)


def test_chunk_must_divide_rows():
    lik = FixedGaussianLikelihood(sd=0.1)
    model, flat, x, y = _problem(lik)
    with pytest.raises(ValueError, match="data_chunk"):
        make_potentials(model, lik, x, y,
                        flat.unravel_theta, flat.unravel_eta,
                        data_chunk=7)


def test_single_chunk_falls_back_to_plain_path():
    """data_chunk == n_rows compiles the plain (scan-free) program."""
    from tensorbnn_tpu.sampler.potential import _chunked_loglik
    lik = FixedGaussianLikelihood(sd=0.1)
    model, flat, x, y = _problem(lik)
    assert _chunked_loglik(model, lik, x, y, int(x.shape[0])) is None
    assert _chunked_loglik(model, lik, x, y, None) is None


def test_stats_hyper_chunked_r_matches():
    """The sufficient-stats hyper potential accumulates R over chunks to
    the same value as the full-batch forward."""
    from tensorbnn_tpu.sampler.hyper_stats import make_stats_hyper

    lik = GaussianLikelihood(sd=0.1)
    model, flat, x, y = _problem(lik)
    params, hypers = model.init(jax.random.key(0))

    full = make_stats_hyper(model, lik, x, y, flat.unravel_eta,
                            flat.eta.size)
    chunked = make_stats_hyper(model, lik, x, y, flat.unravel_eta,
                               flat.eta.size, data_chunk=8)
    assert full is not None and chunked is not None

    batched = jax.tree.map(lambda v: jnp.asarray(v)[None], params)
    s_full = np.asarray(jax.jit(full[0])(batched))
    s_chunk = np.asarray(jax.jit(chunked[0])(batched))
    np.testing.assert_allclose(s_chunk, s_full, rtol=1e-5, atol=1e-6)


def test_driver_runs_with_data_chunk():
    """End-to-end: the driver samples a healthy posterior with the chunked
    likelihood (tree and flat layouts)."""
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 24)
    y = np.sin(x * math.pi)
    for layout in ("flat", "tree"):
        net = Network(jnp.float32, 1, x, y, x, y, seed=3)
        net.add(GaussianDenseLayer(1, 4)).add(Tanh())
        net.add(GaussianDenseLayer(4, 1))
        net.setup_mcmc(step_size_start=5e-3, step_size_min=1e-3,
                       step_size_max=1e-2, step_size_options=5,
                       leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                       leapfrog_increment=2, hyper_leapfrog=4, burnin=20,
                       averaging_steps=5, random_steps=2)
        res = net.train(80, 4, GaussianLikelihood(sd=0.1),
                        n_chains=2, data_chunk=8, use_fused=False,
                        state_layout=layout, verbose=False)
        assert np.isfinite(res.theta_samples).all()
        assert res.main_accept.mean() > 0.05
