"""NUTS-style dynamic trajectory lengths (trajectory="uturn").

The TPU-first redesign of dynamic trajectories (sampler/uturn.py): U-turn
steps recorded inside the batched leapfrog (the NUTS stopping criterion on
a single forward trajectory, eHMC-style), Robbins-Monro step-size control
toward 0.8 acceptance, and post-burn-in lengths drawn from the learned
U-turn distribution. The reference has no counterpart (its tfp kernel runs
a fixed leapfrog count per epoch, network.py:394-408) — these tests pin
the kernel-level criterion against closed-form Gaussian dynamics, the
adapter's control behavior, and the driver mode end to end.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu.sampler.hmc import (
    hmc_step_batched,
    hmc_step_tree,
    leapfrog_batched,
)
from tensorbnn_tpu.sampler.uturn import UTurnAdapter


def _iso_vg(positions):
    return -0.5 * jnp.sum(positions ** 2, axis=-1), -positions


def test_uturn_step_matches_gaussian_half_period():
    """On a standard Gaussian, leapfrog motion is (discretized) harmonic:
    the trajectory first turns back toward its start after about half an
    orbit, pi/eps steps."""
    rng = np.random.default_rng(0)
    c, d = 16, 6
    q = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    eps = 0.1
    *_, uturn = leapfrog_batched(
        _iso_vg, q, v + 0.5 * eps * _iso_vg(q)[1] * 0,  # plain momenta
        jnp.asarray(eps), jnp.asarray(100, jnp.int32), record_uturn=True)
    ut = np.asarray(uturn)
    # the exact first-U-turn step depends on the start's phase in its
    # orbit (between ~pi/2 and ~3pi/2 of arc), but the fleet's median
    # sits at the half period pi/eps ~ 31, and no chain can go a full
    # period without turning back
    assert (ut > 0).all()
    assert (ut < 2 * math.pi / eps).all(), ut
    assert abs(float(np.median(ut)) - math.pi / eps) < 10, ut


def test_uturn_censored_when_l_too_short():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    *_, uturn = leapfrog_batched(
        _iso_vg, q, v, jnp.asarray(0.05), jnp.asarray(5, jnp.int32),
        record_uturn=True)
    assert (np.asarray(uturn) == 0).all()  # half period ~63 steps


def test_uturn_scale_invariant_under_preconditioner():
    """With the exact metric, the U-turn check runs in the transformed
    (isotropic) space: an anisotropic Gaussian preconditioned by its own
    scales reports the same U-turn steps as the isotropic target."""
    sds = np.array([0.01, 0.1, 1.0, 10.0], np.float32)

    def aniso_vg(positions):
        inv2 = 1.0 / sds ** 2
        return (-0.5 * jnp.sum(positions ** 2 * inv2, axis=-1),
                -positions * inv2)

    rng = np.random.default_rng(2)
    c = 8
    z = rng.normal(size=(c, 4)).astype(np.float32)
    keys = jax.random.split(jax.random.key(3), c)
    eps = jnp.asarray(0.1, jnp.float32)
    n = jnp.asarray(100, jnp.int32)

    res_iso = hmc_step_batched(keys, jnp.asarray(z), _iso_vg, eps, n,
                               record_uturn=True)
    res_pre = hmc_step_batched(keys, jnp.asarray(z * sds), aniso_vg,
                               eps, n, step_scale=jnp.asarray(sds),
                               record_uturn=True)
    np.testing.assert_array_equal(np.asarray(res_iso.uturn),
                                  np.asarray(res_pre.uturn))


def test_tree_uturn_matches_flat():
    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(4)
    tree = {"a": jnp.asarray(rng.normal(size=(3, 2)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    flat0, unravel = ravel_pytree(tree)
    d = flat0.size
    c = 4

    def vg_flat(p):
        return -0.5 * jnp.sum(p ** 2, axis=-1), -p

    def vg_tree(pt):
        lp = sum(jnp.sum(x * x, axis=tuple(range(1, x.ndim)))
                 for x in jax.tree.leaves(pt))
        return -0.5 * lp, jax.tree.map(lambda x: -x, pt)

    keys = jax.random.split(jax.random.key(5), c)
    pos_flat = jnp.tile(flat0[None], (c, 1))
    pos_tree = jax.vmap(unravel)(pos_flat)

    def momentum_fn(key_mom):
        m = jax.vmap(lambda k: jax.random.normal(k, (d,)))(key_mom)
        return jax.vmap(unravel)(m)

    rf = hmc_step_batched(keys, pos_flat, vg_flat, jnp.asarray(0.1),
                          jnp.asarray(40), record_uturn=True)
    rt = hmc_step_tree(keys, pos_tree, vg_tree, jnp.asarray(0.1),
                       jnp.asarray(40), momentum_fn=momentum_fn,
                       record_uturn=True)
    np.testing.assert_array_equal(np.asarray(rf.uturn),
                                  np.asarray(rt.uturn))


# -- adapter unit behavior -----------------------------------------------------

def _adapter(**kw):
    args = dict(step_size_start=1e-2, step_size_min=1e-6,
                step_size_max=1.0, leapfrog_start=10, leapfrog_min=2,
                leapfrog_max=1000, burnin=100, seed=0)
    args.update(kw)
    return UTurnAdapter(**args)


def test_rm_controller_converges_to_target():
    """Synthetic acceptance response alpha(eps) = exp(-eps/eps0): the
    controller settles where alpha ~ 0.8."""
    ua = _adapter(burnin=400)
    it = 0
    while it < 400:
        eps, leaps = ua.plan_chunk(it, 10)
        alpha = math.exp(-eps / 0.05)
        ua.observe(it, np.full(10, alpha),
                   np.ones((10, 8), np.int64), leaps)
        it += 10
    assert ua.frozen
    assert 0.7 < math.exp(-ua.eps / 0.05) < 0.9


def test_censored_trajectories_grow_probe_length():
    ua = _adapter(leapfrog_start=4)
    l0 = ua.plan_chunk(0, 4)[1][0]
    for it in range(0, 40, 4):
        _, leaps = ua.plan_chunk(it, 4)
        ua.observe(it, np.full(4, 0.8),
                   np.zeros((4, 8), np.int64), leaps)  # all censored
    assert ua.l_hat > l0 * 2  # geometric ratchet via the median


def test_sampling_draws_come_from_reservoir():
    ua = _adapter(burnin=20)
    for it in range(0, 20, 10):
        _, leaps = ua.plan_chunk(it, 10)
        ut = np.full((10, 8), 7, np.int64)
        ua.observe(it, np.full(10, 0.8), ut, leaps)
    _, draws = ua.plan_chunk(20, 50)
    assert set(np.unique(draws)) <= {7}
    assert ua.frozen


def test_alternate_probe_halves_burnin_work():
    """The "alternate" schedule interleaves exploit chunks run at l_hat
    between probe chunks at ceil(l_hat*GROW), cutting the burn-in probe
    tax roughly in half while the reservoir still only sees probe-chunk
    (uncensored) observations."""
    ua = _adapter(probe="always", leapfrog_start=10, burnin=80)
    ub = _adapter(probe="alternate", leapfrog_start=10, burnin=80)
    work_a = work_b = 0
    for it in range(0, 80, 10):
        _, la = ua.plan_chunk(it, 10)
        _, lb = ub.plan_chunk(it, 10)
        work_a += int(la.sum())
        work_b += int(lb.sum())
        ut = np.full((10, 8), 9, np.int64)   # true U-turn at 9 steps
        ua.observe(it, np.full(10, 0.8), ut, la)
        ub.observe(it, np.full(10, 0.8), ut, lb)
    assert work_b < work_a
    # both learned the same length distribution
    assert ua.l_hat == ub.l_hat == 9
    # exploit chunks run at l_hat, probe chunks above it
    assert ub.probe == "alternate"


def test_alternate_probe_reservoir_skips_exploit_censoring():
    """Censored entries from exploit chunks (executed == l_hat) must not
    enter the reservoir — they would anchor the median to itself."""
    ua = _adapter(probe="alternate", leapfrog_start=4, burnin=40)
    for it in range(0, 40, 4):
        _, leaps = ua.plan_chunk(it, 4)
        ua.observe(it, np.full(4, 0.8),
                   np.zeros((4, 8), np.int64), leaps)   # all censored
    # probe chunks alone still ratchet l_hat up geometrically
    assert ua.l_hat > 8
    # every reservoir entry came from a probe chunk (> l_hat at entry
    # time, i.e. none equals a bare exploit length of 4)
    assert min(ua.reservoir) >= 6   # ceil(4 * 1.5)


def test_probe_mode_validation():
    with pytest.raises(ValueError, match="probe"):
        _adapter(probe="sometimes")


@pytest.mark.parametrize("probe", ["always", "alternate"])
def test_adapter_state_roundtrip(probe):
    ua = _adapter(probe=probe)
    for it in range(0, 60, 10):
        _, leaps = ua.plan_chunk(it, 10)
        ua.observe(it, np.full(10, 0.5),
                   np.full((10, 4), 9, np.int64), leaps)
    ub = _adapter(probe=probe)
    ub.load_state_dict(ua.state_dict())
    # identical future behavior, including the RNG stream
    for it in (100, 150):
        ea, la = ua.plan_chunk(it, 20)
        eb, lb = ub.plan_chunk(it, 20)
        assert ea == eb
        np.testing.assert_array_equal(la, lb)


# -- driver mode ---------------------------------------------------------------

def _make_net(seed=5):
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                   step_size_max=5e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=2, leapfrog_max=64,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=60,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    return net, FixedGaussianLikelihood(sd=0.1)


def test_driver_uturn_mode_calibrates():
    net, lik = _make_net()
    res = net.train(160, 4, lik, n_chains=8, chain_jitter=0.05,
                    trajectory="uturn", verbose=False)
    assert np.isfinite(res.theta_samples).all()
    acc = res.main_accept[60:].mean()
    assert 0.55 < acc <= 1.0, acc
    # lengths were learned, not left at the start value
    assert res.final_leapfrog != 8 or res.final_step_size != 2e-3


def test_driver_uturn_alternate_probe():
    net, lik = _make_net(seed=11)
    res = net.train(160, 4, lik, n_chains=8, chain_jitter=0.05,
                    trajectory="uturn", uturn_probe="alternate",
                    verbose=False)
    assert np.isfinite(res.theta_samples).all()
    acc = res.main_accept[60:].mean()
    assert 0.5 < acc <= 1.0, acc


def test_driver_uturn_guards():
    net, lik = _make_net()
    with pytest.raises(ValueError, match="n_adapters"):
        net.train(80, 4, lik, n_chains=8, n_adapters=2,
                  trajectory="uturn", verbose=False)
    net2, lik2 = _make_net()
    with pytest.raises(ValueError, match="trajectory"):
        net2.train(80, 4, lik2, trajectory="nuts", verbose=False)


def test_driver_uturn_resume_roundtrip(tmp_path):
    from tensorbnn_tpu.sampler.driver import sample_posterior

    def go(epochs, ckpt):
        net, lik = _make_net(seed=7)
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=epochs,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=4, adjust_hypers=True, verbose=False,
            n_chains=8, chain_jitter=0.05, trajectory="uturn",
            checkpoint_dir=ckpt, checkpoint_every=1)

    ckpt = str(tmp_path / "ckpt")
    go(30, ckpt)                      # interrupt mid-burn-in
    res = go(160, ckpt)
    full = go(160, str(tmp_path / "ckpt2"))
    assert res.theta_samples.shape == full.theta_samples.shape
    np.testing.assert_allclose(res.theta_samples, full.theta_samples,
                               rtol=2e-4, atol=1e-5)


def test_driver_uturn_fingerprint_rejects_mode_switch(tmp_path):
    from tensorbnn_tpu.sampler.driver import sample_posterior

    def go(ckpt, trajectory):
        net, lik = _make_net(seed=8)
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=80,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=4, adjust_hypers=True, verbose=False,
            n_chains=8, trajectory=trajectory,
            checkpoint_dir=ckpt, checkpoint_every=1)

    ckpt = str(tmp_path / "ckpt")
    go(ckpt, "uturn")
    with pytest.raises(ValueError, match="trajectory"):
        go(ckpt, "adapter")


def test_driver_uturn_under_mesh():
    """uturn mode shards over the 8-device mesh: per-epoch lengths are
    replicated, chains split, likelihood psum'd."""
    from tensorbnn_tpu.parallel import mesh as mesh_lib

    net, lik = _make_net(seed=9)
    dev_mesh = mesh_lib.make_mesh(n_chain_devices=4, n_data_devices=2)
    res = net.train(120, 4, lik, n_chains=8, chain_jitter=0.05,
                    trajectory="uturn", mesh=dev_mesh, verbose=False)
    assert np.isfinite(res.theta_samples).all()
    assert 0.3 < res.main_accept[60:].mean() <= 1.0
