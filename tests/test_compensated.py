"""Kahan-compensated leapfrog accumulation (sampler/hmc.py).

Big-data posteriors force step sizes within a few ulps of the parameter
magnitude (the 1M-point surrogate needs eps ~ 1e-7 against |theta| ~ 0.1,
ulp(0.1) = 7.5e-9): the plain f32 drift ``q + eps*v`` then quantizes —
tens of percent of integration error per step — and below one ulp the
position freezes entirely while the sampler keeps reporting plausible
acceptance numbers. ``compensated=True`` carries the rounding error of
every drift and kick (Kahan 1965), tracking the exact f64 leapfrog map to
~twice f32 precision with two extra vector ops per step. The reference
has no analogue (single chain, f32 tfp kernels, small-data examples).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from tensorbnn_tpu.sampler.hmc import (leapfrog_batched, leapfrog_tree,
                                       _kahan_add)


def _free_vg(q):
    return jnp.zeros(q.shape[0], q.dtype), jnp.zeros_like(q)


def test_plain_drift_freezes_below_ulp_compensated_moves():
    # eps*v = 1e-8 < ulp(1.0)/2 ~ 6e-8: the plain update rounds to
    # nothing every step; compensation accumulates it exactly
    q0 = jnp.ones((2, 4), jnp.float32)
    v0 = jnp.ones((2, 4), jnp.float32)
    eps = jnp.float32(1e-8)
    n = jnp.asarray(1000, jnp.int32)

    q_plain, *_ = leapfrog_batched(_free_vg, q0, v0, eps, n)
    q_comp, *_ = leapfrog_batched(_free_vg, q0, v0, eps, n,
                                  compensated=True)

    np.testing.assert_array_equal(np.asarray(q_plain), np.ones((2, 4),
                                                               np.float32))
    np.testing.assert_allclose(np.asarray(q_comp),
                               1.0 + 1000 * 1e-8, rtol=1e-4)


def _np_leapfrog_f64(q, v, eps, n, center):
    """Float64 oracle replicating the kernel's half-kick structure for
    the harmonic log-density -0.5*(q - center)^2 (grad = -(q - center))."""
    q = q.astype(np.float64).copy()
    v = v.astype(np.float64).copy()
    g = -(q - center)
    v = v + 0.5 * eps * g
    for _ in range(n):
        q = q + eps * v
        g = -(q - center)
        v = v + eps * g
    v = v - 0.5 * eps * g
    return q, v


def test_compensated_tracks_f64_in_quantization_regime():
    # |q| ~ 1000 with eps ~ 1 ulp of q (ulp(1000) = 6.1e-5): every plain
    # drift rounds by up to 50% of itself — the integration error is a
    # large fraction of the total motion; compensation recovers the f64
    # trajectory to ulp level (the stored f32 position cannot be closer
    # than ulp/2 ~ 3e-5 by representation alone)
    center = 1000.0
    q0 = np.full((1, 1), 1000.5, np.float32)
    v0 = np.full((1, 1), 1.0, np.float32)
    eps, n = 6e-5, 300

    def vg(q):
        d = q - jnp.float32(center)
        return -0.5 * jnp.sum(d * d, axis=-1), -d

    q_ref, _ = _np_leapfrog_f64(q0, v0, eps, n, center)
    q_plain, *_ = leapfrog_batched(vg, jnp.asarray(q0), jnp.asarray(v0),
                                   jnp.float32(eps),
                                   jnp.asarray(n, jnp.int32))
    q_comp, *_ = leapfrog_batched(vg, jnp.asarray(q0), jnp.asarray(v0),
                                  jnp.float32(eps),
                                  jnp.asarray(n, jnp.int32),
                                  compensated=True)
    err_plain = abs(float(q_plain[0, 0]) - q_ref[0, 0])
    err_comp = abs(float(q_comp[0, 0]) - q_ref[0, 0])
    assert err_comp < 1e-4, (err_comp, err_plain)
    assert err_comp < err_plain / 3, (err_comp, err_plain)


def test_compensated_matches_plain_at_healthy_eps():
    # far from the quantization edge the two paths integrate the same
    # trajectory (compensation only mops up sub-ulp dust)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)

    def vg(q):
        return -0.5 * jnp.sum(q * q, axis=-1), -q

    args = (vg, q0, v0, jnp.float32(0.05), jnp.asarray(20, jnp.int32))
    q_plain, v_plain, *_ = leapfrog_batched(*args)
    q_comp, v_comp, *_ = leapfrog_batched(*args, compensated=True)
    np.testing.assert_allclose(np.asarray(q_comp), np.asarray(q_plain),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_comp), np.asarray(v_plain),
                               rtol=1e-5, atol=1e-6)


def test_compensated_per_chain_mask_freezes_chains():
    # grouped-adaptation mode: chains with fewer steps freeze while the
    # straggler finishes — the compensated path must gate both the sum
    # and the carried error, or pending compensation leaks into frozen
    # chains
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)

    def vg(q):
        return -0.5 * jnp.sum(q * q, axis=-1), -q

    eps = jnp.float32(0.05)
    n_vec = jnp.asarray([3, 7], jnp.int32)
    q_m, v_m, *_ = leapfrog_batched(vg, q0, v0, eps, n_vec,
                                    compensated=True)
    # chain 0 run alone for 3 steps must land at the same endpoint
    q_s, v_s, *_ = leapfrog_batched(vg, q0[:1], v0[:1], eps,
                                    jnp.asarray(3, jnp.int32),
                                    compensated=True)
    # the masked run's final half-kick pullback uses the shared scalar
    # eps and chain 0's own (frozen) last gradient, as in the plain path
    np.testing.assert_allclose(np.asarray(q_m[0]), np.asarray(q_s[0]),
                               rtol=1e-6, atol=1e-7)


def test_tree_compensated_drift_below_ulp():
    q0 = {"a": jnp.ones((2, 3), jnp.float32),
          "b": jnp.full((2, 2), 4.0, jnp.float32)}
    v0 = jax.tree.map(jnp.ones_like, q0)

    def vg(q):
        return (jnp.zeros(2, jnp.float32),
                jax.tree.map(jnp.zeros_like, q))

    eps = jnp.float32(1e-8)
    n = jnp.asarray(1000, jnp.int32)
    q_plain, *_ = leapfrog_tree(vg, q0, v0, eps, n)
    q_comp, *_ = leapfrog_tree(vg, q0, v0, eps, n, compensated=True)
    # leaf "a" (|q|=1): plain freezes, compensated moves ~1e-5
    np.testing.assert_array_equal(np.asarray(q_plain["a"]),
                                  np.ones((2, 3), np.float32))
    np.testing.assert_allclose(np.asarray(q_comp["a"]), 1.0 + 1e-5,
                               rtol=1e-4)
    # leaf "b" (|q|=4, ulp 4.8e-7): plain freezes there too
    np.testing.assert_array_equal(np.asarray(q_plain["b"]),
                                  np.full((2, 2), 4.0, np.float32))
    np.testing.assert_allclose(np.asarray(q_comp["b"]), 4.0 + 1e-5,
                               rtol=1e-4)


def test_kahan_add_recovers_below_ulp_increments():
    s = jnp.float32(1.0)
    c = jnp.float32(0.0)
    for _ in range(100):
        s, c = _kahan_add(s, c, jnp.float32(1e-8))
    assert abs(float(s) - float(c) - (1.0 + 1e-6)) < 1e-9


def test_driver_compensated_end_to_end():
    # the full two-block driver with compensated=True: runs, produces
    # finite samples and in-range acceptance, and keeps the identical
    # PRNG stream structure (the option only changes integrator
    # arithmetic, never the draws)
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=7)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                   step_size_max=5e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    res = net.train(80, 4, FixedGaussianLikelihood(sd=0.1),
                    n_chains=4, chain_jitter=0.05, compensated=True,
                    verbose=False)
    assert np.all(np.isfinite(res.theta_samples))
    acc = float(res.main_accept.mean())
    assert 0.0 < acc <= 1.0
    # at this config's healthy step sizes the compensated trajectory
    # stays statistically indistinguishable from the plain one
    net2 = Network(jnp.float32, 1, x, y, x, y, seed=7)
    net2.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net2.add(GaussianDenseLayer(5, 1))
    net2.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                    step_size_max=5e-2, step_size_options=8,
                    leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                    leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                    averaging_steps=5, random_steps=2, adapter_seed=0)
    res2 = net2.train(80, 4, FixedGaussianLikelihood(sd=0.1),
                      n_chains=4, chain_jitter=0.05, verbose=False)
    assert abs(acc - float(res2.main_accept.mean())) < 0.2


def test_compensated_mesh_matches_vmap():
    # the Kahan carries are per-chain vector state inside the epoch body:
    # they shard with the chains axis and the psum'd potential feeds the
    # compensated kick unchanged — a (chains=2, data=4) mesh run must
    # reproduce the plain vmap run (up to reduction-order roundoff)
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.parallel import mesh as mesh_lib
    from tensorbnn_tpu.parallel.chains import (init_multichain_state,
                                               make_multichain_chunk_runner)
    from tensorbnn_tpu.sampler.potential import flatten_state

    rng = np.random.default_rng(5)
    x = rng.normal(size=(16, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    model = Sequential([GaussianDenseLayer(2, 4), Tanh(),
                        GaussianDenseLayer(4, 1)])
    likelihood = FixedGaussianLikelihood(sd=0.1)
    params, hypers = model.init(jax.random.key(0))
    flat = flatten_state(params, hypers, likelihood.init_hypers())

    dev_mesh = mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4)
    kwargs = dict(adjust_hypers=True, hyper_leapfrog=5, burnin=50.0,
                  hyper_step_size_init=1e-3, donate=False,
                  compensated=True)
    run_plain = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=None, **kwargs)
    run_mesh = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=dev_mesh, **kwargs)

    carry0 = init_multichain_state(flat.theta, flat.eta, jax.random.key(7),
                                   1e-3, 4, jitter=0.01)
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    eps = jnp.asarray(5e-4, jnp.float32)
    lf = jnp.asarray(8, jnp.int32)
    c_plain, t_plain = run_plain(carry0, xs, ys, eps, lf, 3)
    c_mesh, t_mesh = run_mesh(carry0, xs, ys, eps, lf, 3)
    np.testing.assert_allclose(np.asarray(c_mesh.theta),
                               np.asarray(c_plain.theta),
                               rtol=5e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(t_mesh.main_accept),
                               np.asarray(t_plain.main_accept),
                               rtol=5e-2, atol=5e-3)


def _tiny_eps_net(seed):
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    # force the adapter grid into the quantization regime: eps ~ 1e-9
    # against |theta| ~ 0.5 (16 ulps ~ 1e-6)
    net.setup_mcmc(step_size_start=1e-9, step_size_min=1e-10,
                   step_size_max=5e-9, step_size_options=4,
                   leapfrog_start=4, leapfrog_min=2, leapfrog_max=8,
                   leapfrog_increment=2, hyper_leapfrog=4, burnin=20,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    return net


def test_numerics_advisory_fires_in_quantization_regime():
    # the driver warns once when the tuned step size sits within ~16 ulps
    # of the parameter magnitude and compensated is off — the silent
    # failure mode the 1M-point surrogate hit (PERF_NOTES round 4)
    import warnings as _w

    import pytest
    from tensorbnn_tpu import FixedGaussianLikelihood

    net = _tiny_eps_net(11)
    with pytest.warns(RuntimeWarning, match="quantize or freeze"):
        net.train(30, 4, FixedGaussianLikelihood(sd=0.1),
                  n_chains=4, verbose=False)

    # compensated=True is the documented fix: no advisory
    net2 = _tiny_eps_net(11)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        net2.train(30, 4, FixedGaussianLikelihood(sd=0.1),
                   n_chains=4, compensated=True, verbose=False)
    assert not [w for w in rec if "quantize or freeze" in str(w.message)]


def test_compensated_uturn_mode():
    # compensated composes with the U-turn trajectory mode (the surrogate
    # configuration that motivated the feature)
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=9)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                   step_size_max=5e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    res = net.train(80, 4, FixedGaussianLikelihood(sd=0.1),
                    n_chains=4, chain_jitter=0.05, trajectory="uturn",
                    compensated=True, verbose=False)
    assert np.all(np.isfinite(res.theta_samples))
    assert 0.0 < float(res.main_accept.mean()) <= 1.0


def _tiny_net(seed=7, **mcmc):
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    base = dict(step_size_start=2e-3, step_size_min=1e-5,
                step_size_max=5e-2, step_size_options=8,
                leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                averaging_steps=5, random_steps=2, adapter_seed=0)
    net.setup_mcmc(**{**base, **mcmc})
    return net


def test_exact_numerics_model_replaces_dense_precision():
    import dataclasses

    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.models.layers import CauchyDenseLayer
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.sampler.driver import exact_numerics_model

    model = Sequential([GaussianDenseLayer(1, 5), Tanh(),
                        CauchyDenseLayer(5, 1)])
    exact = exact_numerics_model(model)
    assert exact.layers[0].matmul_precision == "highest"
    assert exact.layers[2].matmul_precision == "highest"
    # activations pass through untouched; the original model is untouched
    assert exact.layers[1] is model.layers[1]
    assert model.layers[0].matmul_precision is None
    # an explicit per-layer request survives
    model2 = Sequential([GaussianDenseLayer(1, 5,
                                            matmul_precision="high")])
    assert exact_numerics_model(model2).layers[0].matmul_precision == "high"
    # bf16 compute asks for the opposite -> loud error
    model3 = Sequential([dataclasses.replace(GaussianDenseLayer(1, 5),
                                             compute_dtype="bfloat16")])
    try:
        exact_numerics_model(model3)
    except ValueError as e:
        assert "compute_dtype" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_numerics_exact_preset_matches_manual_flags():
    # numerics="exact" == compensated=True + matmul_precision="highest"
    # on every dense layer: same seeds -> bit-identical trajectories
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    net = _tiny_net()
    res = net.train(80, 4, FixedGaussianLikelihood(sd=0.1),
                    n_chains=4, chain_jitter=0.05, numerics="exact",
                    verbose=False)
    assert np.all(np.isfinite(res.theta_samples))
    assert 0.0 < float(res.main_accept.mean()) <= 1.0

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net2 = Network(jnp.float32, 1, x, y, x, y, seed=7)
    net2.add(GaussianDenseLayer(1, 5, matmul_precision="highest"))
    net2.add(Tanh())
    net2.add(GaussianDenseLayer(5, 1, matmul_precision="highest"))
    net2.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                    step_size_max=5e-2, step_size_options=8,
                    leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                    leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                    averaging_steps=5, random_steps=2, adapter_seed=0)
    res2 = net2.train(80, 4, FixedGaussianLikelihood(sd=0.1),
                      n_chains=4, chain_jitter=0.05, compensated=True,
                      verbose=False)
    np.testing.assert_array_equal(res.theta_samples, res2.theta_samples)
    np.testing.assert_array_equal(res.main_accept, res2.main_accept)


def test_numerics_validation():
    import pytest

    from tensorbnn_tpu import FixedGaussianLikelihood

    net = _tiny_net()
    with pytest.raises(ValueError, match="numerics"):
        net.train(10, 2, FixedGaussianLikelihood(sd=0.1),
                  numerics="fast", verbose=False)


def test_uturn_probe_default_is_alternate():
    # round-4 measurement: alternate is quality-equivalent and at most as
    # expensive everywhere (PERF_NOTES round 4) -> the shipped default
    import inspect

    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.sampler.driver import sample_posterior

    assert (inspect.signature(sample_posterior)
            .parameters["uturn_probe"].default == "alternate")
    assert (inspect.signature(Network.train)
            .parameters["uturn_probe"].default == "alternate")
