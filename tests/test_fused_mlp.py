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
    good = (("dense", 1, 10), ("tanh", 10), ("dense", 10, 1))
    bad = (("dense", 1, 9), ("tanh", 9), ("dense", 9, 1))
    assert fused_mlp.verify_theta_layout(flat.unravel_theta, good)
    assert not fused_mlp.verify_theta_layout(flat.unravel_theta, bad)


def test_layout_verifier_with_slopes():
    from tensorbnn_tpu import GaussianDenseLayer, SquarePrelu
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.sampler.potential import flatten_state

    model = Sequential([GaussianDenseLayer(2, 6), SquarePrelu(6),
                        GaussianDenseLayer(6, 1)])
    params, hypers = model.init(jax.random.key(0))
    flat = flatten_state(params, hypers, {})
    good = (("dense", 2, 6), ("sqprelu", 6), ("dense", 6, 1))
    assert fused_mlp.verify_theta_layout(flat.unravel_theta, good)
    # wrong slope count
    bad = (("dense", 2, 6), ("sqprelu", 5), ("dense", 6, 1))
    assert not fused_mlp.verify_theta_layout(flat.unravel_theta, bad)


@pytest.mark.parametrize("kind", ["prelu", "sqprelu", "leakyrelu", "elu",
                                  "sigmoid", "exp"])
def test_fused_activation_ops_match_oracle(kind):
    """Every activation op's forward+backward agrees with jax.grad of the
    same math (incl. trainable slope rows)."""
    rng = np.random.default_rng(3)
    n, c, d = 9, 4, 5
    op = {"leakyrelu": ("leakyrelu", d, 0.3)}.get(kind, (kind, d))
    ops = (("dense", 2, d), op, ("dense", d, 1))
    d_total = sum(fused_mlp._op_rows(o) for o in ops)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = rng.normal(size=(n, 1)).astype(np.float32)
    thetas = 0.5 * rng.normal(size=(c, d_total)).astype(np.float32)

    fused = fused_mlp.make_fused_potential_vg(ops, n, lik="gaussian",
                                              block_c=c, interpret=True)
    oracle = fused_mlp.reference_potential_vg(ops, x, y, lik="gaussian")
    ll_f, g_f = fused(jnp.asarray(thetas), 0.1, x, y)
    ll_o, g_o = oracle(jnp.asarray(thetas), 0.1)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-3, atol=1e-4)


def test_fused_bernoulli_matches_oracle():
    rng = np.random.default_rng(4)
    n, c = 13, 4
    ops = (("dense", 3, 6), ("sqprelu", 6), ("dense", 6, 1),
           ("sigmoid", 1))
    d_total = sum(fused_mlp._op_rows(o) for o in ops)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    y = (rng.uniform(size=(n, 1)) > 0.5).astype(np.float32)
    thetas = 0.7 * rng.normal(size=(c, d_total)).astype(np.float32)

    fused = fused_mlp.make_fused_potential_vg(ops, n, lik="bernoulli",
                                              block_c=c, interpret=True)
    oracle = fused_mlp.reference_potential_vg(ops, x, y, lik="bernoulli")
    ll_f, g_f = fused(jnp.asarray(thetas), 1.0, x, y)
    ll_o, g_o = oracle(jnp.asarray(thetas), 1.0)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-3, atol=1e-4)


def test_fori_path_matches_oracle(monkeypatch):
    """Large dense layers take the fori_loop (buffer-reusing) path; force
    it on a small config and check it agrees with the oracle."""
    monkeypatch.setattr(fused_mlp, "UNROLL_TEMP_BYTES", 0)
    rng = np.random.default_rng(5)
    n, c = 11, 4
    ops = (("dense", 3, 7), ("tanh", 7), ("dense", 7, 2))
    d_total = sum(fused_mlp._op_rows(o) for o in ops)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    y = rng.normal(size=(n, 2)).astype(np.float32)
    thetas = 0.5 * rng.normal(size=(c, d_total)).astype(np.float32)

    fused = fused_mlp.make_fused_potential_vg(ops, n, lik="gaussian",
                                              block_c=c, interpret=True)
    oracle = fused_mlp.reference_potential_vg(ops, x, y, lik="gaussian")
    ll_f, g_f = fused(jnp.asarray(thetas), 0.1, x, y)
    ll_o, g_o = oracle(jnp.asarray(thetas), 0.1)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-3, atol=1e-4)


def test_vmem_gate():
    """Big-data configs must be rejected (fall back to XLA) rather than
    compiled into a VMEM-overflowing kernel; the estimate is tile-padding
    aware (lanes pad to 128, sublanes to 8)."""
    ops = (("dense", 19, 50), ("tanh", 50), ("dense", 50, 1))
    big = fused_mlp.kernel_vmem_bytes(ops, 1_000_000, 8)
    assert big > fused_mlp.VMEM_LIMIT_BYTES
    # the flagship config (3x10 tanh, 11 points) comfortably fits even at
    # wide chain blocks
    flagship = (("dense", 1, 10), ("tanh", 10), ("dense", 10, 10),
                ("tanh", 10), ("dense", 10, 10), ("tanh", 10),
                ("dense", 10, 1))
    assert fused_mlp.kernel_vmem_bytes(flagship, 11, 512) < \
        fused_mlp.VMEM_LIMIT_BYTES
    # the classification bench config (3x16, 64 points) fits; the same
    # stack at N=128 width 20 measured 17MB real and must be rejected
    cls16 = (("dense", 10, 16), ("sqprelu", 16), ("dense", 16, 16),
             ("sqprelu", 16), ("dense", 16, 1), ("sigmoid", 1))
    cls20 = (("dense", 10, 20), ("sqprelu", 20), ("dense", 20, 20),
             ("sqprelu", 20), ("dense", 20, 1), ("sigmoid", 1))
    assert fused_mlp.kernel_vmem_bytes(cls16, 64, 128) < \
        fused_mlp.VMEM_LIMIT_BYTES
    assert fused_mlp.kernel_vmem_bytes(cls20, 128, 64) > \
        fused_mlp.VMEM_LIMIT_BYTES
