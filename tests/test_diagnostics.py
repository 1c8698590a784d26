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


def test_multichain_ess_catches_slow_coordinate():
    """Coordinate 0 mixes fast (IID) while coordinate 1 is a strongly
    autocorrelated AR(1): the per-parameter min must be dragged down by
    the slow coordinate (the old single-coordinate estimator looked only
    at coordinate 0 and would report the fast figure)."""
    rng = np.random.default_rng(6)
    n, c = 2000, 4
    fast = rng.normal(size=(n, c))
    rho = 0.95                      # tau ~ (1+rho)/(1-rho) = 39
    eps = rng.normal(size=(n, c))
    slow = np.empty((n, c))
    slow[0] = eps[0]
    for t in range(1, n):
        slow[t] = rho * slow[t - 1] + eps[t]
    samples = np.stack([fast, slow], axis=-1)   # (n, c, 2)

    ess = multichain_ess(samples)
    per = ess.per_param
    assert per.shape == (2,)
    assert per[0] > 4000                        # ~8000 iid pooled draws
    assert per[1] < per[0] / 5                  # slow coord far below
    assert float(ess) == per.min()              # scalar = worst coordinate
    assert ess.argmin == 1
    assert ess.median >= float(ess)


def test_multichain_ess_subsamples_wide_states():
    """States wider than max_params are examined on an evenly-strided
    subsample that always includes the first and last coordinate."""
    rng = np.random.default_rng(7)
    samples = rng.normal(size=(300, 2, 1000))
    ess = multichain_ess(samples, max_params=64)
    assert ess.per_param.shape[0] <= 64
    assert ess.param_index[0] == 0 and ess.param_index[-1] == 999
    assert float(ess) > 0


def test_multichain_ess_constant_coordinate_is_nan_not_min():
    """A constant coordinate (tau NaN in every chain) must not report 0
    effective samples as the minimum — it is excluded as NaN."""
    rng = np.random.default_rng(8)
    samples = rng.normal(size=(500, 3, 2))
    samples[:, :, 1] = 7.0
    ess = multichain_ess(samples)
    assert np.isnan(ess.per_param[1])
    assert float(ess) > 100                     # min comes from coord 0


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


def test_run_tracer_grouped_mean_leapfrog():
    """Grouped-adaptation chunks record the mean executed L per chain
    (mask-frozen chains do not kick), not the straggler group's max."""
    t = RunTracer()
    t.start_chunk()
    # 2 groups of 32 chains at L=100 and L=50 -> mean executed L = 75
    t.end_chunk(epochs=10, leapfrog=75.0, n_chains=64)
    assert t.total_leapfrog_steps == 10 * 75 * 64


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


def test_summary_table_values_and_rendering():
    from tensorbnn_tpu.utils.diagnostics import summary

    rng = np.random.default_rng(0)
    n, c, d = 400, 4, 6
    samples = rng.normal(size=(n, c, d)) * np.arange(1, d + 1) + 10.0

    s = summary(samples)
    assert s.param_index.shape == (d,)
    pooled = samples.reshape(n * c, d)
    np.testing.assert_allclose(s.mean, pooled.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(s.sd, pooled.std(axis=0, ddof=1),
                               rtol=1e-12)
    # IID draws: R-hat ~ 1, pooled ESS ~ n*c per coordinate
    assert np.all(np.abs(s.rhat - 1.0) < 0.02)
    assert s.min_ess > 0.5 * n * c
    assert abs(s.max_rhat - 1.0) < 0.02
    text = str(s)
    assert "rhat" in text and "ess" in text
    assert len(text.splitlines()) == d + 1          # header + d rows

    # wide stacks render the worst-ESS subset
    wide = rng.normal(size=(100, 2, 50))
    text_w = str(summary(wide))
    assert "worst by ESS" in text_w


def test_runresult_summary_method():
    import math

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
    s = res.summary()
    assert s.param_index.size == res.theta_samples.shape[-1]
    assert s.min_ess == float(res.multichain_ess())
    assert str(s)
