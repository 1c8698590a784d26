"""Fused Pallas MLP potential kernel vs the pure-JAX oracle (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu.ops import fused_mlp


@pytest.mark.parametrize("dims,acts", [
    ((1, 10, 10, 10, 1), ("tanh", "tanh", "tanh", "none")),
    ((3, 8, 1), ("relu", "none")),
    ((2, 5, 4), ("tanh", "none")),
])
def test_fused_matches_oracle(dims, acts):
    rng = np.random.default_rng(0)
    n, c = 11, 8
    x = rng.normal(size=(n, dims[0])).astype(np.float32)
    y = rng.normal(size=(n, dims[-1])).astype(np.float32)
    d = sum(dims[i] * dims[i + 1] + dims[i + 1]
            for i in range(len(dims) - 1))
    thetas = 0.5 * rng.normal(size=(c, d)).astype(np.float32)
    sd = 0.1

    fused = fused_mlp.make_fused_likelihood_vg(dims, acts, x, y,
                                               block_c=c, interpret=True)
    oracle = fused_mlp.reference_likelihood_vg(dims, acts, x, y)

    ll_f, g_f = fused(jnp.asarray(thetas), sd)
    ll_o, g_o = oracle(jnp.asarray(thetas), sd)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-3, atol=1e-4)


def test_fused_per_chain_sd():
    rng = np.random.default_rng(1)
    dims, acts = (1, 6, 1), ("tanh", "none")
    n, c = 7, 4
    x = rng.normal(size=(n, 1)).astype(np.float32)
    y = rng.normal(size=(n, 1)).astype(np.float32)
    d = 1 * 6 + 6 + 6 * 1 + 1
    thetas = rng.normal(size=(c, d)).astype(np.float32)
    sd = np.asarray([0.05, 0.1, 0.2, 0.4], np.float32)

    fused = fused_mlp.make_fused_likelihood_vg(dims, acts, x, y,
                                               block_c=c, interpret=True)
    oracle = fused_mlp.reference_likelihood_vg(dims, acts, x, y)
    ll_f, g_f = fused(jnp.asarray(thetas), jnp.asarray(sd))
    ll_o, g_o = oracle(jnp.asarray(thetas), jnp.asarray(sd))
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-3, atol=1e-4)


def test_layout_verifier():
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.sampler.potential import flatten_state

    model = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                        GaussianDenseLayer(10, 1)])
    params, hypers = model.init(jax.random.key(0))
    flat = flatten_state(params, hypers, {})
    assert fused_mlp.verify_theta_layout(flat.unravel_theta, (1, 10, 1))
    assert not fused_mlp.verify_theta_layout(flat.unravel_theta, (1, 9, 1))
