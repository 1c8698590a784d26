"""Tests for convergence diagnostics and the run tracer."""

import numpy as np

from tensorbnn_tpu.utils.autocorr import (
    autocorr_function_1d,
    effective_sample_size,
    integrated_time,
)
from tensorbnn_tpu.utils.diagnostics import multichain_ess, split_rhat
from tensorbnn_tpu.utils.tracing import RunTracer


def test_autocorr_iid_has_tau_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4000)
    tau = integrated_time(x, quiet=True)
    assert abs(tau - 1.0) < 0.3
    ess = effective_sample_size(x)
    assert ess > 2000


def test_autocorr_ar1_tau_matches_theory():
    """AR(1) with coefficient rho has tau = (1+rho)/(1-rho)."""
    rng = np.random.default_rng(1)
    rho = 0.9
    n = 200_000
    x = np.empty(n)
    x[0] = 0.0
    eps = rng.normal(size=n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    tau = integrated_time(x, quiet=True)
    want = (1 + rho) / (1 - rho)  # = 19
    assert abs(tau - want) / want < 0.25, (tau, want)


def test_autocorr_function_normalized():
    rng = np.random.default_rng(2)
    acf = autocorr_function_1d(rng.normal(size=512))
    assert acf[0] == 1.0
    assert np.all(np.abs(acf[1:]) < 1.0)


def test_constant_chain_gives_nan():
    tau = integrated_time(np.ones(100), quiet=True)
    assert np.isnan(tau)


def test_split_rhat_iid_near_one():
    rng = np.random.default_rng(3)
    samples = rng.normal(size=(500, 4))  # (draws, chains)
    rhat = split_rhat(samples)
    assert abs(float(rhat) - 1.0) < 0.05


def test_split_rhat_detects_nonmixing():
    rng = np.random.default_rng(4)
    samples = rng.normal(size=(500, 4))
    samples[:, 0] += 10.0  # one chain stuck elsewhere
    assert float(split_rhat(samples)) > 2.0


def test_multichain_ess_pools():
    rng = np.random.default_rng(5)
    samples = rng.normal(size=(1000, 4, 1))
    ess = multichain_ess(samples)
    assert ess > 1500  # ~4000 iid draws, windowing loses some


def test_run_tracer_counts():
    t = RunTracer()
    t.start_chunk()
    t.end_chunk(epochs=10, leapfrog=100, n_chains=64)
    t.start_chunk()
    t.end_chunk(epochs=5, leapfrog=50, n_chains=64)
    assert t.total_leapfrog_steps == 10 * 100 * 64 + 5 * 50 * 64
    s = t.summary()
    assert s["chunks"] == 2 and s["epochs"] == 15
    assert s["leapfrog_steps_per_sec"] > 0


def test_integrated_time_batch_matches_scalar():
    """Batched taus are row-for-row identical to per-row integrated_time,
    including a constant (NaN) row and an IID row."""
    from tensorbnn_tpu.utils.autocorr import (
        effective_sample_size_batch,
        integrated_time,
        integrated_time_batch,
    )

    rng = np.random.default_rng(0)
    n = 600
    rows = []
    for phi in (0.0, 0.5, 0.9):     # IID and two AR(1) strengths
        e = rng.normal(size=n)
        x = np.empty(n)
        x[0] = e[0]
        for t in range(1, n):
            x[t] = phi * x[t - 1] + e[t]
        rows.append(x)
    rows.append(np.full(n, 3.0))    # constant -> NaN tau
    batch = np.stack(rows)

    taus = integrated_time_batch(batch)
    for i, row in enumerate(batch):
        want = integrated_time(row, quiet=True)
        if np.isnan(want):
            assert np.isnan(taus[i])
        else:
            np.testing.assert_allclose(taus[i], want, rtol=1e-12)

    total = effective_sample_size_batch(batch)
    want_total = sum(n / max(integrated_time(r, quiet=True), 1.0)
                     for r in batch[:3])
    np.testing.assert_allclose(total, want_total, rtol=1e-12)


def test_runresult_diagnostics_methods():
    """RunResult exposes split_rhat / multichain_ess over its raw stacks."""
    import math

    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import (FixedGaussianLikelihood, GaussianDenseLayer,
                               Tanh)
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=3)
    net.add(GaussianDenseLayer(1, 4)).add(Tanh())
    net.add(GaussianDenseLayer(4, 1))
    net.setup_mcmc(step_size_start=5e-3, step_size_min=1e-3,
                   step_size_max=1e-2, step_size_options=5,
                   leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                   leapfrog_increment=2, hyper_leapfrog=4, burnin=20,
                   averaging_steps=5, random_steps=2)
    res = net.train(120, 2, FixedGaussianLikelihood(sd=0.1),
                    n_chains=4, chain_jitter=0.05, verbose=False)

    rhat = res.split_rhat()
    assert rhat.shape == (res.theta_samples.shape[-1],)
    assert np.all(np.isfinite(rhat) | np.isnan(rhat))
    ess = res.multichain_ess()
    assert ess > 0
