"""Parallel tempering (sampler/tempering.py): swap-move unit invariants,
statistical agreement with the plain sampler on a unimodal target, the
multimodal-mixing win a single-temperature chain cannot deliver (the
reference runs exactly one chain at one temperature,
/root/reference/tensorBNN/network.py:359-507), and resume equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, Tanh
from tensorbnn_tpu.network import Network
from tensorbnn_tpu.sampler.tempering import make_ladder, make_swap_fn


# ---------------------------------------------------------------------------
# ladder
# ---------------------------------------------------------------------------

def test_ladder_endpoints_and_monotonicity():
    lad = make_ladder(5, beta_min=0.05)
    assert lad.shape == (5,)
    assert lad[0] == pytest.approx(1.0)
    assert lad[-1] == pytest.approx(0.05)
    assert np.all(np.diff(lad) < 0)  # cold first, strictly decreasing
    # geometric: constant ratio between neighbors
    ratios = lad[1:] / lad[:-1]
    assert np.allclose(ratios, ratios[0], rtol=1e-5)


def test_ladder_validation():
    with pytest.raises(ValueError):
        make_ladder(1)
    with pytest.raises(ValueError):
        make_ladder(4, beta_min=1.0)
    with pytest.raises(ValueError):
        make_ladder(4, beta_min=0.0)


# ---------------------------------------------------------------------------
# swap move
# ---------------------------------------------------------------------------

def _keys(n, seed=0):
    return jax.vmap(jax.random.key)(jnp.arange(seed, seed + n))


def test_swap_equal_beta_always_accepts_and_permutes():
    """With all betas equal the Metropolis log-ratio is exactly 0, so every
    paired rung swaps (log u < 0 a.s.); the fleet is a permutation."""
    k_rungs, c = 4, 3
    d, h = 5, 2
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(k_rungs * c, d)).astype(np.float32))
    eta = jnp.asarray(rng.normal(size=(k_rungs * c, h)).astype(np.float32))
    ll = jnp.asarray(rng.normal(size=(k_rungs * c,)).astype(np.float32))
    beta = jnp.ones((k_rungs,), jnp.float32)
    swap = make_swap_fn(beta, k_rungs)

    th2, et2, acc = swap(_keys(k_rungs * c), theta, eta, ll, 0)
    acc = np.asarray(acc).reshape(k_rungs, c)
    # parity 0 pairs (0,1) and (2,3): everyone participates and swaps
    assert np.all(acc == 1.0)
    t_old = np.asarray(theta).reshape(k_rungs, c, d)
    t_new = np.asarray(th2).reshape(k_rungs, c, d)
    for a, b in ((0, 1), (2, 3)):
        np.testing.assert_array_equal(t_new[a], t_old[b])
        np.testing.assert_array_equal(t_new[b], t_old[a])
    # eta exchanged with the same pattern (full-state swap)
    e_old = np.asarray(eta).reshape(k_rungs, c, h)
    e_new = np.asarray(et2).reshape(k_rungs, c, h)
    np.testing.assert_array_equal(e_new[0], e_old[1])

    # parity 1 pairs (1,2); rungs 0 and 3 have no partner
    th3, _, acc1 = swap(_keys(k_rungs * c), theta, eta, ll, 1)
    acc1 = np.asarray(acc1).reshape(k_rungs, c)
    assert np.all(acc1[0] == 0.0) and np.all(acc1[3] == 0.0)
    assert np.all(acc1[1] == 1.0) and np.all(acc1[2] == 1.0)
    t3 = np.asarray(th3).reshape(k_rungs, c, d)
    np.testing.assert_array_equal(t3[0], t_old[0])
    np.testing.assert_array_equal(t3[1], t_old[2])


def test_swap_rejects_hopeless_ratio():
    """A strongly negative log-ratio (hot replica vastly worse likelihood)
    never swaps: lr = (beta_lo - beta_hi)(ll_hi - ll_lo) << 0."""
    k_rungs, c, d = 2, 4, 3
    theta = jnp.zeros((k_rungs * c, d))
    eta = jnp.zeros((k_rungs * c, 1))
    # cold rung ll = 0, hot rung ll = -1e6; beta = (1.0, 0.1)
    ll = jnp.concatenate([jnp.zeros(c), jnp.full(c, -1e6)])
    swap = make_swap_fn(jnp.asarray([1.0, 0.1], jnp.float32), k_rungs)
    _, _, acc = swap(_keys(k_rungs * c), theta, eta, ll, 0)
    assert np.all(np.asarray(acc) == 0.0)


def test_swap_accept_is_pair_symmetric():
    """Both members of a pair decide from one shared uniform, so the swap
    indicator is identical across the pair — states are exchanged, never
    duplicated or lost (multiset of rows preserved under any ll/beta)."""
    k_rungs, c, d = 3, 8, 4
    rng = np.random.default_rng(3)
    theta = jnp.asarray(rng.normal(size=(k_rungs * c, d)).astype(np.float32))
    eta = jnp.asarray(rng.normal(size=(k_rungs * c, 2)).astype(np.float32))
    ll = jnp.asarray((10 * rng.normal(size=(k_rungs * c,))).astype(
        np.float32))
    swap = make_swap_fn(jnp.asarray(make_ladder(k_rungs, 0.2)), k_rungs)
    for parity in (0, 1):
        th2, et2, acc = swap(_keys(k_rungs * c, seed=7), theta, eta, ll,
                             parity)
        acc = np.asarray(acc).reshape(k_rungs, c)
        # pair symmetry: rung r swapped iff its partner swapped
        if parity == 0:
            assert np.array_equal(acc[0], acc[1])
        else:
            assert np.array_equal(acc[1], acc[2])
        # multiset of rows preserved
        old_rows = np.sort(np.asarray(theta), axis=0)
        new_rows = np.sort(np.asarray(th2), axis=0)
        np.testing.assert_allclose(new_rows, old_rows)


# ---------------------------------------------------------------------------
# driver integration
# ---------------------------------------------------------------------------

def _trig_net(seed=0, warm=None):
    x = np.linspace(-1, 1, 8)
    y = 2.0 * np.tanh(3.0 * x)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 1),
            parameters=warm[0] if warm else None).add(Tanh())
    net.add(GaussianDenseLayer(1, 1),
            parameters=warm[1] if warm else None)
    net.setup_mcmc(step_size_start=5e-3, step_size_min=1e-3,
                   step_size_max=5e-2, step_size_options=10,
                   leapfrog_start=5, leapfrog_min=2, leapfrog_max=10,
                   leapfrog_increment=1, hyper_step_size=1e-2,
                   hyper_leapfrog=5, burnin=20, averaging_steps=5,
                   random_steps=2)
    return net


def test_tempered_run_shapes_and_swap_trace():
    net = _trig_net()
    res = net.train(40, 2, FixedGaussianLikelihood(sd=0.1), n_chains=4,
                    tempering=3, chain_jitter=0.1, verbose=False)
    # recorded samples cover the cold chains only
    assert res.theta_samples.shape[1] == 4
    assert res.swap_accept is not None and res.swap_accept.shape == (40,)
    assert 0.0 <= float(res.swap_accept.mean()) <= 1.0
    # some swaps must actually happen on this easy target
    assert float(res.swap_accept.sum()) > 0.0
    # per-rung attribution: (n_epochs, K); equal chains per rung makes
    # the fleet mean the rung-mean of the per-rung rates
    assert res.swap_accept_rung is not None
    assert res.swap_accept_rung.shape == (40, 3)
    np.testing.assert_allclose(res.swap_accept_rung.mean(axis=1),
                               res.swap_accept, rtol=0, atol=1e-12)
    # an exchange has two ends: the fleetwide swapped mass per epoch is
    # even, so each rung's overall rate is bounded by its partners'
    assert np.all(res.swap_accept_rung >= 0.0)
    assert np.all(res.swap_accept_rung <= 1.0)


def test_tempering_validation():
    net = _trig_net()
    lik = FixedGaussianLikelihood(sd=0.1)
    with pytest.raises(ValueError, match="n_adapters"):
        net.train(10, 2, lik, n_chains=4, tempering=2, n_adapters=2,
                  verbose=False)
    with pytest.raises(ValueError, match="uturn"):
        net.train(10, 2, lik, n_chains=4, tempering=2, trajectory="uturn",
                  verbose=False)
    with pytest.raises(ValueError, match="precondition"):
        net.train(10, 2, lik, n_chains=8, tempering=2, precondition=5,
                  verbose=False)
    # use_fused=True is ALLOWED with tempering: the trajectory kernel's
    # power-posterior program covers the fleet (beta as a traced lane
    # vector; test_fused_trajectory.py::test_tempered_sampling_*), and
    # only the per-step potential kernel is suppressed by the driver
    with pytest.raises(ValueError, match=">= 1"):
        net.train(10, 2, lik, n_chains=4, tempering=0, verbose=False)


def test_tempered_posterior_matches_plain_on_unimodal_target():
    """On a unimodal posterior the cold rung must reproduce the plain
    sampler's posterior (tempering is a mixing accelerator, not a
    different target): compare predictive posterior means."""
    x = np.linspace(-1, 1, 12)
    y = 0.8 * x + 0.1

    def build(seed):
        net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
        net.add(GaussianDenseLayer(1, 1))  # linear: unimodal posterior
        net.setup_mcmc(step_size_start=1e-2, step_size_min=2e-3,
                       step_size_max=8e-2, step_size_options=10,
                       leapfrog_start=5, leapfrog_min=2, leapfrog_max=10,
                       leapfrog_increment=1, hyper_step_size=1e-2,
                       hyper_leapfrog=5, burnin=60, averaging_steps=10,
                       random_steps=3)
        return net

    lik = FixedGaussianLikelihood(sd=0.1)
    res_plain = build(1).train(400, 2, lik, n_chains=8, chain_jitter=0.1,
                               verbose=False)
    res_temp = build(2).train(400, 2, lik, n_chains=8, tempering=3,
                              chain_jitter=0.1, verbose=False)

    def predictive_mean(net_seed, res):
        # posterior mean of (w, b) — the linear model's full summary
        th = res.theta_samples.reshape(-1, res.theta_samples.shape[-1])
        return th.mean(axis=0), th.std(axis=0)

    m_p, s_p = predictive_mean(1, res_plain)
    m_t, s_t = predictive_mean(2, res_temp)
    np.testing.assert_allclose(m_t, m_p, atol=0.08)
    np.testing.assert_allclose(s_t, s_p, atol=0.08)


def test_tempering_crosses_modes_plain_hmc_cannot():
    """The capability test: a 1-hidden-unit tanh BNN has exact sign-flip
    mode copies (w1,b1,w2) -> (-w1,-b1,-w2). Warm-started in the positive
    mode, the plain sampler never leaves it (the likelihood wall between
    the modes is ~220 nats here — e^-220 tunneling probability); the
    tempered fleet's hottest rung sees the wall scaled to ~2 nats
    (beta_min = 0.01), crosses freely, and — because the mirrored mode is
    EXACTLY as deep — swaps the opposite-sign states down the ladder at
    high acceptance into the cold chains."""
    x = np.linspace(-1, 1, 8)
    y = 1.5 * np.tanh(2.0 * x)
    warm = ({"w": np.full((1, 1), 2.0, np.float32),
             "b": np.zeros((1,), np.float32)},
            {"w": np.full((1, 1), 1.5, np.float32),
             "b": np.zeros((1,), np.float32)})
    lik = FixedGaussianLikelihood(sd=0.15)

    def build():
        net = Network(jnp.float32, 1, x, y, x, y, seed=5)
        net.add(GaussianDenseLayer(1, 1), parameters=warm[0]).add(Tanh())
        net.add(GaussianDenseLayer(1, 1), parameters=warm[1])
        # grid wide enough for the hot rungs' long free steps; each
        # rung's own GP adapter finds its scale within it
        net.setup_mcmc(step_size_start=1e-2, step_size_min=1e-3,
                       step_size_max=0.2, step_size_options=15,
                       leapfrog_start=8, leapfrog_min=2, leapfrog_max=20,
                       leapfrog_increment=2, hyper_step_size=1e-2,
                       hyper_leapfrog=5, burnin=50, averaging_steps=10,
                       random_steps=3)
        return net

    res_p = build().train(600, 2, lik, n_chains=4, chain_jitter=0.0,
                          verbose=False)
    # theta layout is [b1, w1, b2, w2] (ravel_pytree sorts dict keys);
    # w1 — the hidden kernel — carries the mode's sign
    w1_plain = res_p.theta_samples[..., 1]
    assert np.all(w1_plain > 0), "plain HMC unexpectedly crossed modes"

    res_t = build().train(600, 2, lik, n_chains=4, tempering=6,
                          tempering_beta_min=0.01, chain_jitter=0.0,
                          verbose=False)
    w1_cold = res_t.theta_samples[..., 1]
    assert np.any(w1_cold < 0), (
        "tempered cold chains never visited the mirrored mode")
    assert np.any(w1_cold > 0)


def test_tempered_resume_equivalence(tmp_path):
    """A tempered run interrupted at a checkpoint and resumed reproduces
    the uninterrupted run's samples exactly (full fleet in the carry,
    per-rung adapters in the host state)."""
    lik = FixedGaussianLikelihood(sd=0.1)

    def run(ckpt, epochs):
        net = _trig_net(seed=9)
        return net.train(epochs, 2, lik, n_chains=4, tempering=3,
                         chain_jitter=0.1, checkpoint_dir=ckpt,
                         checkpoint_every=1, verbose=False)

    full = run(str(tmp_path / "a"), 40)

    half_dir = str(tmp_path / "b")
    run_half = _trig_net(seed=9)
    run_half.train(25, 2, lik, n_chains=4, tempering=3, chain_jitter=0.1,
                   checkpoint_dir=half_dir, checkpoint_every=1,
                   verbose=False)
    resumed = _trig_net(seed=9)
    res2 = resumed.train(40, 2, lik, n_chains=4, tempering=3,
                         chain_jitter=0.1, checkpoint_dir=half_dir,
                         checkpoint_every=1, verbose=False)
    np.testing.assert_allclose(res2.theta_samples, full.theta_samples,
                               rtol=1e-5, atol=1e-6)


def test_tempering_fingerprint_mismatch_raises(tmp_path):
    lik = FixedGaussianLikelihood(sd=0.1)
    ckpt = str(tmp_path / "c")
    _trig_net(seed=9).train(25, 2, lik, n_chains=4, tempering=3,
                            chain_jitter=0.1, checkpoint_dir=ckpt,
                            checkpoint_every=1, verbose=False)
    with pytest.raises(ValueError, match="tempering"):
        _trig_net(seed=9).train(40, 2, lik, n_chains=4, tempering=4,
                                chain_jitter=0.1, checkpoint_dir=ckpt,
                                checkpoint_every=1, verbose=False)


def test_tempering_data_parallel_mesh_matches_single_device():
    """A tempered run over a pure data-parallel mesh (chains axis 1, data
    axis 8) reproduces the single-device run: every data shard holds the
    whole replica fleet, the psum'd log-likelihood makes the swap
    decisions shard-consistent, and only reduction-order roundoff
    differs. Chain-sharded meshes are rejected (swap pairs would
    straddle shards)."""
    from tensorbnn_tpu.parallel import mesh as mesh_lib

    lik = FixedGaussianLikelihood(sd=0.1)

    def run(dev_mesh):
        net = _trig_net(seed=7)
        return net.train(60, 2, lik, n_chains=4, tempering=3,
                         chain_jitter=0.1, mesh=dev_mesh, verbose=False)

    res_one = run(None)
    res_dp = run(mesh_lib.make_mesh(n_chain_devices=1, n_data_devices=8))

    np.testing.assert_allclose(res_dp.theta_samples, res_one.theta_samples,
                               rtol=5e-2, atol=5e-4)
    # swap decisions are discrete: roundoff-insensitive here, and they
    # must agree exactly for the trajectories above to match at all
    np.testing.assert_array_equal(res_dp.swap_accept, res_one.swap_accept)
    assert np.isfinite(res_dp.swap_accept).all()

    with pytest.raises(ValueError, match="chains axis"):
        run(mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4))


def test_tempered_coupled_stats_hyper_matches_generic_path():
    """Tempered + learned-sd (coupled) hypers run the stats potential's
    tempered variant (hyper leapfrog data-free per step); disabling the
    stats path must not change the sampled chains beyond float drift."""
    from tensorbnn_tpu import GaussianLikelihood
    from tensorbnn_tpu.sampler import hyper_stats

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * np.pi)

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
                             n_chains=2, tempering=3,
                             tempering_beta_min=0.05, verbose=False)
        finally:
            hyper_stats.make_stats_hyper = orig

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(a.eta_samples, b.eta_samples,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(a.swap_accept, b.swap_accept)
