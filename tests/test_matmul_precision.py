"""matmul_precision knob (models/layers.py) + Kahan chunk carry
(sampler/potential.py).

On TPU the *default* f32 matmul rounds its operands to bf16 on the MXU,
which turns a big-data log posterior into a staircase in theta: the
density only moves when a weight crosses a bf16 rounding boundary, and
each crossing jumps the 1M-row log likelihood by O(nats) — a ΔH noise
floor the MH test pays no matter how exact the integrator is
(benchmarks/PERF_NOTES.md round 4; diagnosed by the `potential_noise`
bench). ``matmul_precision="highest"`` evaluates the f32 matmul exactly.
CPU matmuls are exact f32 either way, so these tests cover the plumbing
(values unchanged, gradients flow, fingerprint scoping, validation);
the staircase itself is measured on the TPU by the bench.

The reference has no analogue of either knob: its TF f32 matmuls are
exact on GPU/CPU, so the failure mode only exists on MXU-class hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, Tanh
from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.layers import CauchyDenseLayer
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.potential import _chunked_loglik, flatten_state
from tensorbnn_tpu.sampler.driver import MCMCConfig, _run_fingerprint


def _model(precision=None):
    return Sequential([GaussianDenseLayer(3, 4, matmul_precision=precision),
                       Tanh(),
                       GaussianDenseLayer(4, 1,
                                          matmul_precision=precision)])


def test_precision_values_match_on_cpu():
    # CPU f32 matmuls are exact at every precision setting: the knob must
    # be a numerical no-op here (it only changes MXU pass counts on TPU)
    m0, m1 = _model(None), _model("highest")
    params, _ = m0.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(m0.apply(params, x)),
                                  np.asarray(m1.apply(params, x)))


def test_precision_gradients_flow():
    m = _model("highest")
    params, _ = m.init(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)),
                    jnp.float32)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(leaf)) for leaf in jax.tree.leaves(g))
    assert any(np.any(leaf != 0) for leaf in jax.tree.leaves(g))


def test_precision_and_compute_dtype_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        GaussianDenseLayer(3, 4, compute_dtype="bfloat16",
                           matmul_precision="highest")
    with pytest.raises(ValueError, match="mutually exclusive"):
        CauchyDenseLayer(3, 4, compute_dtype="bfloat16",
                         matmul_precision="high")


def test_fingerprint_scopes_compute_settings():
    # off-default layer compute settings change the evaluated density, so
    # resuming across them must be rejected; defaults keep the exact
    # pre-existing fingerprint value (old checkpoints stay resumable)
    cfg = MCMCConfig()
    lik = FixedGaussianLikelihood(sd=0.1)

    def fp(precision=None, cdtype=None):
        if cdtype is not None:
            m = Sequential([GaussianDenseLayer(3, 4, compute_dtype=cdtype)])
        else:
            m = Sequential([GaussianDenseLayer(3, 4,
                                               matmul_precision=precision)])
        params, hypers = m.init(jax.random.key(0))
        flat = flatten_state(params, hypers, lik.init_hypers())
        return _run_fingerprint(cfg, m, lik, flat, 2, 1, jnp.float32)

    base, hi = fp(), fp(precision="highest")
    assert base != hi
    assert "GaussianDenseLayer(3,4)" in base["layers"]
    assert "GaussianDenseLayer(3,4)@prec=highest" in hi["layers"]
    bf16 = fp(cdtype="bfloat16")
    assert "GaussianDenseLayer(3,4)@bfloat16" in bf16["layers"]


class _SumYLikelihood(Likelihood):
    """Per-chunk log-"likelihood" = sum(y): makes the chunk-scan carry's
    arithmetic directly controllable from the data."""

    def log_likelihood(self, preds, y, hypers):
        del preds, hypers
        return jnp.sum(y)


def test_chunk_scan_carry_is_compensated():
    # chunk 0 contributes 2^24 (f32 ulp = 2 there); each of the remaining
    # 63 chunks contributes exactly 1.0 — below ulp/2, so a plain
    # sequential f32 carry drops every one of them (ties round to even).
    # The Kahan carry recovers the true sum to ulp/2.
    n_chunks, chunk = 64, 8
    y = np.zeros((n_chunks, chunk), np.float32)
    y[0, 0] = np.float32(2.0 ** 24)
    y[1:, 0] = 1.0
    y = y.reshape(-1)
    x = np.zeros((n_chunks * chunk, 1), np.float32)

    m = Sequential([GaussianDenseLayer(1, 1)])
    params, _ = m.init(jax.random.key(0))
    total_fn = _chunked_loglik(m, _SumYLikelihood(), jnp.asarray(x),
                               jnp.asarray(y), chunk)
    total = float(total_fn(params, {}))
    true = 2.0 ** 24 + 63.0
    assert abs(total - true) <= 2.0, total      # ulp/2 at 2^24 is 1.0
    # and the plain carry provably loses it on this input
    plain = np.float32(0.0)
    for c in y.reshape(n_chunks, chunk):
        plain = np.float32(plain + np.float32(c.sum()))
    assert plain == np.float32(2.0 ** 24)


def test_chunk_scan_gradients_unchanged_by_compensation():
    # the compensation's symbolic derivative cancels exactly: gradients
    # through the chunked total equal the unchunked likelihood's
    rng = np.random.default_rng(3)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    y = rng.normal(size=(32,)).astype(np.float32)
    m = _model(None)
    params, _ = m.init(jax.random.key(2))
    lik = FixedGaussianLikelihood(sd=0.1)

    total_fn = _chunked_loglik(m, lik, jnp.asarray(x), jnp.asarray(y), 8)

    def whole(p):
        return lik.log_likelihood(m.apply(p, jnp.asarray(x)),
                                  jnp.asarray(y), {})

    g_chunked = jax.grad(lambda p: total_fn(p, {}))(params)
    g_whole = jax.grad(whole)(params)
    for a, b in zip(jax.tree.leaves(g_chunked), jax.tree.leaves(g_whole)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
