"""HMC kernel tests: deterministic integrator properties and statistical
correctness on analytically tractable targets (SURVEY.md #4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.sampler.hmc import hmc_step, leapfrog


def gaussian_logprob_target(mu, var):
    def lp(q):
        return -0.5 * jnp.sum((q - mu) ** 2 / var)
    return lp


def test_leapfrog_energy_conservation():
    """Small-step leapfrog on a quadratic potential conserves H."""
    lp = gaussian_logprob_target(0.0, 1.0)
    q0 = jnp.asarray(np.random.default_rng(0).normal(size=8), jnp.float32)
    v0 = jnp.asarray(np.random.default_rng(1).normal(size=8), jnp.float32)
    h0 = -lp(q0) + 0.5 * jnp.sum(v0 ** 2)
    q1, v1, lp1, _ = leapfrog(lp, q0, v0, 0.01, jnp.asarray(100))
    h1 = -lp1 + 0.5 * jnp.sum(v1 ** 2)
    assert abs(float(h1 - h0)) < 1e-3


def test_leapfrog_reversibility():
    """Integrating forward then backward (negated momentum) returns to the
    start, up to float32 roundoff."""
    lp = gaussian_logprob_target(0.5, 2.0)
    q0 = jnp.asarray([0.3, -1.2, 0.8], jnp.float32)
    v0 = jnp.asarray([1.0, 0.2, -0.7], jnp.float32)
    q1, v1, _, _ = leapfrog(lp, q0, v0, 0.05, jnp.asarray(37))
    q2, v2, _, _ = leapfrog(lp, q1, -v1, 0.05, jnp.asarray(37))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(-v2), np.asarray(v0), atol=1e-4)


def test_traced_leapfrog_count_no_recompile():
    """The leapfrog count is a traced argument: one jitted callable serves
    every L without retracing (the reference retraces per L change)."""
    lp = gaussian_logprob_target(0.0, 1.0)
    traces = []

    @jax.jit
    def step(key, q, eps, L):
        traces.append(1)
        return hmc_step(key, q, lp, eps, L)

    q = jnp.zeros(4)
    key = jax.random.key(0)
    for L in (3, 17, 64):
        step(key, q, 0.1, jnp.asarray(L, jnp.int32))
    assert len(traces) == 1


def test_hmc_samples_standard_normal():
    """Chain moments match a 1-D standard normal within MC error."""
    lp = gaussian_logprob_target(0.0, 1.0)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(key, q0, n):
        def body(carry, k):
            q, lp_q = carry
            # trajectory length eps*L ~ pi/2 (quarter period) mixes a
            # Gaussian target near-iid; ~pi would be the classic
            # antiperiodic pathology.
            res = hmc_step(k, q, lp, 0.2, jnp.asarray(8, jnp.int32),
                           current_log_prob=lp_q)
            return (res.position, res.log_prob), (res.position,
                                                  res.accept_prob)
        keys = jax.random.split(key, n)
        (_, _), (qs, accepts) = jax.lax.scan(body, (q0, lp(q0)), keys)
        return qs, accepts

    qs, accepts = run(jax.random.key(42), jnp.zeros(1), 6000)
    samples = np.asarray(qs)[1000:, 0]
    assert abs(samples.mean()) < 0.1
    assert abs(samples.std() - 1.0) < 0.1
    assert float(np.mean(np.asarray(accepts))) > 0.8


def test_hmc_exact_acceptance_symplectic():
    """On a Gaussian target with moderate step size, accept probabilities are
    strictly within (0, 1] and mostly near 1 (symplectic integrator error is
    bounded)."""
    lp = gaussian_logprob_target(0.0, 1.0)
    key = jax.random.key(7)
    accepts = []
    q = jnp.asarray(np.random.default_rng(3).normal(size=16), jnp.float32)
    for i in range(20):
        key, k = jax.random.split(key)
        res = hmc_step(k, q, lp, 0.1, jnp.asarray(20, jnp.int32))
        q = res.position
        accepts.append(float(res.accept_prob))
    accepts = np.asarray(accepts)
    assert np.all(accepts > 0) and np.all(accepts <= 1.0)
    assert accepts.mean() > 0.95


def test_hmc_rejects_nan_proposals():
    """Divergent trajectories (NaN energies) are rejected, not propagated."""
    def lp(q):
        # steep quartic well: big steps diverge to inf -> NaN
        return -jnp.sum(q ** 4) * 1e6

    q0 = jnp.asarray([1.0, 1.0], jnp.float32)
    res = hmc_step(jax.random.key(0), q0, lp, 10.0,
                   jnp.asarray(50, jnp.int32))
    assert np.all(np.isfinite(np.asarray(res.position)))
    np.testing.assert_allclose(np.asarray(res.position),
                               np.asarray(q0), rtol=1e-6)
    assert float(res.accept_prob) == 0.0
