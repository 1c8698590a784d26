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
