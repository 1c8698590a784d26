"""Diagonal-metric preconditioning (per-coordinate leapfrog step scaling).

Leapfrog with ``eps_i = eps * s_i`` under unit-normal momenta is exactly
HMC with diagonal mass ``1/s_i^2`` (Neal 2011 §4.1; Stan's diag_e) —
detailed balance holds with the standard kinetic energy. These tests pin:
(1) the scaled integrator's acceptance advantage on an anisotropic
Gaussian whose scales span 100x; (2) posterior correctness of the scaled
kernel; (3) flat-vs-tree layout equivalence with a scale; (4) the
driver's auto-estimation, its resume round-trip, and its guards.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu.sampler.hmc import hmc_step_batched, hmc_step_tree


SDS = np.array([0.01, 0.1, 1.0, 1.0], np.float32)  # 100x anisotropy


def _aniso_vg(positions):
    """Anisotropic Gaussian: logp = -0.5 sum((x_i / sd_i)^2)."""
    inv2 = 1.0 / SDS ** 2
    lp = -0.5 * jnp.sum(positions ** 2 * inv2, axis=-1)
    grad = -positions * inv2
    return lp, grad


def _run_chain(step_scale, eps, n=400, c=8, seed=0):
    keys = jax.random.split(jax.random.key(seed), c)
    # start at stationarity so moments/jump comparisons are clean
    pos = SDS * jax.random.normal(jax.random.key(seed + 100),
                                  (c, len(SDS)), jnp.float32)
    accepts = []
    draws = []

    @jax.jit
    def step(keys, pos):
        keys2 = jax.vmap(lambda k: jax.random.split(k))(keys)
        res = hmc_step_batched(keys2[:, 1], pos, _aniso_vg,
                               jnp.asarray(eps, jnp.float32),
                               jnp.asarray(10, jnp.int32),
                               step_scale=step_scale)
        return keys2[:, 0], res.position, res.accept_prob

    for _ in range(n):
        keys, pos, acc = step(keys, pos)
        accepts.append(np.asarray(acc))
        draws.append(np.asarray(pos))
    return np.stack(draws), np.mean(accepts)


def test_preconditioned_explores_all_scales():
    """With the exact scale vector, one global eps moves every coordinate
    at its own scale; unscaled HMC at the same eps barely moves the wide
    coordinates per trajectory (it must respect the narrowest one)."""
    # each sampler at its own stability-limited global eps: unscaled must
    # respect the sd=0.01 coordinate (eps ~ 5e-3); with the exact scale
    # the transformed target is isotropic and eps ~ 0.5 is stable
    plain, acc_plain = _run_chain(None, 0.5e-2, n=100)
    scaled, acc_scaled = _run_chain(jnp.asarray(SDS), 0.5, n=100)

    assert acc_plain > 0.8 and acc_scaled > 0.6, (acc_plain, acc_scaled)
    # mean per-draw jump of the widest coordinate: preconditioned jumps
    # are O(its sd = 1) per trajectory, unscaled jumps are O(eps * L)
    jump_plain = np.abs(np.diff(plain[:, :, 2], axis=0)).mean()
    jump_scaled = np.abs(np.diff(scaled[:, :, 2], axis=0)).mean()
    assert jump_scaled > 5 * jump_plain, (jump_scaled, jump_plain)


def test_preconditioned_posterior_is_correct():
    """Scaled HMC still targets the right distribution: per-coordinate
    moments of the anisotropic Gaussian are recovered."""
    draws, acc = _run_chain(jnp.asarray(SDS), 0.5, n=1200, c=16, seed=1)
    burn = 200
    flat = draws[burn:].reshape(-1, len(SDS))
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.06)
    np.testing.assert_allclose(flat.std(axis=0), SDS, rtol=0.15)
    assert 0.5 < acc <= 1.0


def test_tree_layout_matches_flat_with_scale():
    """Flat and tree integrators produce identical trajectories under the
    same scale (same PRNG via momentum_fn)."""
    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(2)
    tree = {"a": jnp.asarray(rng.normal(size=(3, 2)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    flat0, unravel = ravel_pytree(tree)
    d = flat0.size
    c = 4
    scale = jnp.asarray(np.linspace(0.3, 2.0, d), jnp.float32)

    def vg_flat(positions):          # (C, D)
        lp = -0.5 * jnp.sum(positions ** 2, axis=-1)
        return lp, -positions

    def vg_tree(ptree):
        leaves = jax.tree.leaves(ptree)
        lp = sum(jnp.sum(x * x, axis=tuple(range(1, x.ndim)))
                 for x in leaves)
        return -0.5 * lp, jax.tree.map(lambda x: -x, ptree)

    keys = jax.random.split(jax.random.key(3), c)
    pos_flat = jnp.tile(flat0[None], (c, 1))
    pos_tree = jax.vmap(unravel)(pos_flat)

    def momentum_fn(key_mom):
        flat_mom = jax.vmap(lambda k: jax.random.normal(k, (d,)))(key_mom)
        return jax.vmap(unravel)(flat_mom)

    res_flat = hmc_step_batched(keys, pos_flat, vg_flat,
                                jnp.asarray(0.1), jnp.asarray(7),
                                step_scale=scale)
    res_tree = hmc_step_tree(keys, pos_tree, vg_tree,
                             jnp.asarray(0.1), jnp.asarray(7),
                             momentum_fn=momentum_fn,
                             scale_tree=unravel(scale))
    flat_from_tree = jax.vmap(lambda p: ravel_pytree(p)[0])(
        res_tree.position)
    np.testing.assert_allclose(np.asarray(flat_from_tree),
                               np.asarray(res_flat.position),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_tree.accept_prob),
                               np.asarray(res_flat.accept_prob),
                               rtol=1e-5, atol=1e-6)


def _make_net(seed=5):
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=5e-4,
                   step_size_max=1e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=4, leapfrog_max=16,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    return net, FixedGaussianLikelihood(sd=0.1)


def test_driver_preconditions_and_samples():
    net, lik = _make_net()
    res = net.train(160, 4, lik, n_chains=8, chain_jitter=0.05,
                    precondition=True, use_fused=False, verbose=False)
    assert np.isfinite(res.theta_samples).all()
    assert 0.05 < res.main_accept[40:].mean() <= 1.0


def test_driver_precondition_guards():
    import pytest

    net, lik = _make_net()
    with pytest.raises(ValueError, match="n_chains"):
        net.train(80, 4, lik, n_chains=2, precondition=True,
                  verbose=False)
    net2, lik2 = _make_net()
    with pytest.raises(ValueError, match="use_fused"):
        net2.train(80, 4, lik2, n_chains=8, precondition=True,
                   use_fused=True, verbose=False)


def test_precondition_resume_roundtrip(tmp_path):
    """A preconditioned run that checkpoints after activation resumes
    with the same scale vector and matches the uninterrupted run."""
    from tensorbnn_tpu.sampler.driver import sample_posterior

    def go(epochs, ckpt):
        net, lik = _make_net()
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=epochs,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=4, adjust_hypers=True, verbose=False,
            n_chains=8, chain_jitter=0.05, precondition=True,
            use_fused=False,
            checkpoint_dir=ckpt, checkpoint_every=1)

    ckpt = str(tmp_path / "ckpt")
    go(100, ckpt)                     # interrupt at 100 (past burnin/2=20)
    res = go(160, ckpt)               # resume to 160

    ckpt2 = str(tmp_path / "ckpt2")
    full = go_full = go(160, ckpt2)   # uninterrupted
    assert res.theta_samples.shape == go_full.theta_samples.shape
    np.testing.assert_allclose(res.theta_samples, full.theta_samples,
                               rtol=2e-4, atol=1e-5)


def test_driver_windowed_reestimation(capsys):
    """precondition_windows > 1 re-estimates the metric during burn-in
    (Stan-style windows) without retracing: the verbose log shows every
    window firing and the run stays healthy."""
    net, lik = _make_net(seed=11)
    res = net.train(160, 4, lik, n_chains=8, chain_jitter=0.05,
                    precondition=10, precondition_windows=3,
                    use_fused=False, verbose=True)
    out = capsys.readouterr().out
    assert "preconditioner estimate 1/3" in out
    assert "preconditioner estimate 3/3" in out
    assert np.isfinite(res.theta_samples).all()
    assert 0.05 < res.main_accept[40:].mean() <= 1.0


def test_precondition_clip_kwarg():
    """A custom clip range reaches the estimator (scales land inside it)
    and a degenerate range raises."""
    net, lik = _make_net(seed=12)
    res = net.train(120, 4, lik, n_chains=8, chain_jitter=0.05,
                    precondition=True, precondition_clip=(0.5, 2.0),
                    use_fused=False, verbose=False)
    assert np.isfinite(res.theta_samples).all()
    net2, lik2 = _make_net(seed=12)
    with pytest.raises(ValueError, match="precondition_clip"):
        net2.train(120, 4, lik2, n_chains=8, precondition=True,
                   precondition_clip=(2.0, 0.5), verbose=False)
    net3, lik3 = _make_net(seed=12)
    with pytest.raises(ValueError, match="precondition_windows"):
        net3.train(120, 4, lik3, n_chains=8, precondition=True,
                   precondition_windows=0, verbose=False)


def test_windowed_precondition_resume_roundtrip(tmp_path):
    """Windowed runs resume mid-schedule: the fired-window count persists
    so already-passed windows don't re-fire, and the resumed trajectory
    matches the uninterrupted one."""
    from tensorbnn_tpu.sampler.driver import sample_posterior

    def go(epochs, ckpt):
        net, lik = _make_net(seed=13)
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=epochs,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=4, adjust_hypers=True, verbose=False,
            n_chains=8, chain_jitter=0.05, precondition=5,
            precondition_windows=4, use_fused=False,
            checkpoint_dir=ckpt, checkpoint_every=1)

    ckpt = str(tmp_path / "ckpt")
    go(20, ckpt)                      # interrupt mid-window-schedule
    res = go(160, ckpt)
    full = go(160, str(tmp_path / "ckpt2"))
    assert res.theta_samples.shape == full.theta_samples.shape
    np.testing.assert_allclose(res.theta_samples, full.theta_samples,
                               rtol=2e-4, atol=1e-5)


def test_windowed_fingerprint_rejects_mismatch(tmp_path):
    """A checkpoint written under one window/clip config refuses to resume
    under another (the kernel schedule would differ)."""
    from tensorbnn_tpu.sampler.driver import sample_posterior

    def go(ckpt, windows):
        net, lik = _make_net(seed=14)
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=60,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=4, adjust_hypers=True, verbose=False,
            n_chains=8, chain_jitter=0.05, precondition=5,
            precondition_windows=windows, use_fused=False,
            checkpoint_dir=ckpt, checkpoint_every=1)

    ckpt = str(tmp_path / "ckpt")
    go(ckpt, windows=3)
    with pytest.raises(ValueError, match="precondition"):
        go(ckpt, windows=2)


def test_precondition_with_adapter_groups():
    """Per-chain (C,) step sizes (n_adapters > 1) compose with the (D,)
    preconditioner: the flat path broadcasts (C,1)x(1,D), the masked
    wave-front integrator included."""
    net, lik = _make_net(seed=9)
    res = net.train(160, 4, lik, n_chains=8, n_adapters=2,
                    chain_jitter=0.05, precondition=True,
                    use_fused=False, verbose=False)
    assert np.isfinite(res.theta_samples).all()
    assert 0.05 < res.main_accept[40:].mean() <= 1.0


def test_precondition_with_adapter_groups_tree_layout():
    net, lik = _make_net(seed=10)
    res = net.train(120, 4, lik, n_chains=8, n_adapters=2,
                    chain_jitter=0.05, precondition=True,
                    use_fused=False, state_layout="tree", verbose=False)
    assert np.isfinite(res.theta_samples).all()
    assert 0.05 < res.main_accept[40:].mean() <= 1.0
