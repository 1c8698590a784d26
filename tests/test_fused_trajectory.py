"""Full-trajectory Pallas kernel vs the XLA leapfrog (interpret mode).

The trajectory kernel runs the WHOLE leapfrog integration of one HMC step
in a single Pallas program; it must reproduce the XLA integrator
(hmc.leapfrog_batched over the XLA potentials) on identical inputs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import (
    BernoulliLikelihood,
    CauchyDenseLayer,
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    GaussianLikelihood,
    Sigmoid,
    Softmax,
    SquarePrelu,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.ops.fused_mlp import try_build_fused_trajectory
from tensorbnn_tpu.sampler.hmc import leapfrog_batched
from tensorbnn_tpu.sampler.potential import flatten_state, make_potentials


def _setup(model, lik, n=11, d_in=1, seed=0, n_classes=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    if isinstance(lik, BernoulliLikelihood):
        y = (y > 0).astype(np.float32)
    elif n_classes is not None:
        y = rng.integers(0, n_classes, size=n).astype(np.float32)
    params, hypers = model.init(jax.random.key(seed))
    flat = flatten_state(params, hypers, lik.init_hypers())
    return x, y, flat


def _compare(model, lik, n=11, d_in=1, L=13, eps=1e-2, c=4, seed=0,
             n_classes=None):
    x, y, flat = _setup(model, lik, n, d_in, seed, n_classes=n_classes)
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=c, interpret=True)
    assert traj is not None

    rng = np.random.default_rng(seed + 1)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))
    momenta = jnp.asarray(
        rng.normal(size=thetas.shape), jnp.float32)

    eps_in = jnp.asarray(eps, jnp.float32)   # scalar or per-chain (C,)
    l_in = jnp.asarray(L, jnp.int32)
    q_f, v_f, lp0_f, lp1_f = traj(thetas, etas, momenta, x, y,
                                  eps_in, l_in)

    pots = make_potentials(model, lik, jnp.asarray(x), jnp.asarray(y),
                           flat.unravel_theta, flat.unravel_eta)
    vg = jax.vmap(pots.main_vg)
    lp0_x, _ = vg(thetas, etas)
    eps_x = eps_in[:, None] if eps_in.ndim == 1 else eps_in
    q_x, v_x, lp1_x, _ = leapfrog_batched(
        lambda ths: vg(ths, etas), thetas, momenta, eps_x, l_in)

    np.testing.assert_allclose(np.asarray(lp0_f), np.asarray(lp0_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lp1_f), np.asarray(lp1_x),
                               rtol=1e-4, atol=1e-2)


def test_trajectory_matches_xla_fixed_gaussian():
    model = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 1)])
    _compare(model, FixedGaussianLikelihood(sd=0.1))


def test_trajectory_matches_xla_learned_sd():
    model = Sequential([GaussianDenseLayer(2, 8), Tanh(),
                        GaussianDenseLayer(8, 1)])
    _compare(model, GaussianLikelihood(sd=0.2), d_in=2, L=7)


def test_trajectory_matches_xla_bernoulli():
    model = Sequential([GaussianDenseLayer(2, 6), Tanh(),
                        GaussianDenseLayer(6, 1), Sigmoid()])
    _compare(model, BernoulliLikelihood(), d_in=2, L=9, eps=5e-2)


def test_trajectory_leapfrog_count_is_traced():
    """Different L through the same built trajectory — both match XLA."""
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    for L in (3, 17):
        _compare(model, FixedGaussianLikelihood(sd=0.1), L=L)


def test_trajectory_matches_xla_cauchy_compat():
    """The reference's default DenseLayer (Cauchy prior, sign-flipped
    compat form) through the trajectory kernel."""
    model = Sequential([CauchyDenseLayer(1, 8), Tanh(),
                        CauchyDenseLayer(8, 1)])
    _compare(model, FixedGaussianLikelihood(sd=0.1), L=9, eps=5e-3)


def test_trajectory_matches_xla_cauchy_proper():
    model = Sequential([CauchyDenseLayer(2, 6, proper=True), Tanh(),
                        CauchyDenseLayer(6, 1, proper=True)])
    _compare(model, FixedGaussianLikelihood(sd=0.1), d_in=2, L=7)


def test_trajectory_matches_xla_mixed_priors():
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        CauchyDenseLayer(6, 1)])
    _compare(model, FixedGaussianLikelihood(sd=0.1), L=5)


def test_trajectory_matches_xla_squareprelu_bernoulli():
    """The reference's classification stack (SquarePrelu + sigmoid +
    Bernoulli) through the trajectory kernel."""
    model = Sequential([GaussianDenseLayer(2, 6), SquarePrelu(6),
                        GaussianDenseLayer(6, 1), Sigmoid()])
    _compare(model, BernoulliLikelihood(), d_in=2, L=7, eps=2e-2)


def test_trajectory_matches_xla_prelu():
    from tensorbnn_tpu import Prelu
    model = Sequential([GaussianDenseLayer(1, 5), Prelu(5),
                        GaussianDenseLayer(5, 1)])
    _compare(model, FixedGaussianLikelihood(sd=0.1), L=6, eps=5e-3)


def test_trajectory_scope_rejections():
    x = np.zeros((5, 1), np.float32)
    y = np.zeros((5,), np.float32)
    lik = FixedGaussianLikelihood(sd=0.1)

    # big data rejected by the VMEM gate
    ok = Sequential([GaussianDenseLayer(1, 4), Tanh(),
                     GaussianDenseLayer(4, 1)])
    p3, h3 = ok.init(jax.random.key(0))
    flat3 = flatten_state(p3, h3, {})
    assert try_build_fused_trajectory(
        ok, lik, flat3.unravel_theta, flat3.unravel_eta, x, y,
        eta_dim=flat3.eta.size, interpret=True,
        n_rows=5_000_000) is None


def test_sampling_with_trajectory_matches_potential_path():
    """Full driver runs: trajectory kernel vs per-step fused potential vs
    XLA, identical PRNG streams -> identical chains (within float drift)."""
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.ops import fused_mlp

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)

    def run(traj_on):
        orig = fused_mlp.try_build_fused_trajectory
        if not traj_on:
            drv_patch = lambda *a, **k: None  # noqa: E731
            fused_mlp.try_build_fused_trajectory = drv_patch
        try:
            net = Network(jnp.float32, 1, x, y, x, y, seed=11)
            net.add(GaussianDenseLayer(1, 6)).add(Tanh())
            net.add(GaussianDenseLayer(6, 1))
            net.setup_mcmc(step_size_start=1e-3, leapfrog_start=8,
                           leapfrog_min=4, leapfrog_max=16, burnin=10,
                           averaging_steps=5, hyper_leapfrog=4,
                           random_steps=1)
            return net.train(30, 4, FixedGaussianLikelihood(sd=0.1),
                             n_chains=2, verbose=False, use_fused=True)
        finally:
            fused_mlp.try_build_fused_trajectory = orig

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=2e-3, atol=2e-4)
    assert 0 < a.main_accept.mean() <= 1.0


def test_trajectory_per_chain_eps_and_L():
    """Per-chain (eps, L) vectors (the n_adapters mode) through the same
    built trajectory kernel match the masked XLA integrator per chain."""
    model = Sequential([GaussianDenseLayer(1, 8), Tanh(),
                        GaussianDenseLayer(8, 1)])
    _compare(model, FixedGaussianLikelihood(sd=0.1),
             eps=np.asarray([5e-3, 1e-2, 2e-2, 8e-3], np.float32),
             L=np.asarray([3, 11, 7, 5], np.int32))


def test_trajectory_per_chain_matches_independent_runs():
    """A per-chain (eps, L) batch equals each chain run alone with its
    scalar (eps, L) — the mask-freeze wave front changes nothing."""
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    x, y, flat = _setup(model, lik)
    c = 4
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=c, interpret=True)
    rng = np.random.default_rng(3)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))
    momenta = jnp.asarray(rng.normal(size=thetas.shape), jnp.float32)
    eps = np.asarray([4e-3, 1.5e-2, 9e-3, 2e-2], np.float32)
    L = np.asarray([9, 2, 6, 4], np.int32)

    q_b, v_b, lp0_b, lp1_b = traj(thetas, etas, momenta, x, y,
                                  jnp.asarray(eps), jnp.asarray(L))

    # single-chain kernels pad the lane axis; compare against a block
    # where every lane carries chain i's scalar (eps, L)
    for i in range(c):
        th_i = jnp.tile(thetas[i:i + 1], (c, 1))
        mo_i = jnp.tile(momenta[i:i + 1], (c, 1))
        q_i, v_i, _, lp1_i = traj(th_i, etas, mo_i, x, y,
                                  jnp.asarray(float(eps[i]), jnp.float32),
                                  jnp.asarray(int(L[i]), jnp.int32))
        np.testing.assert_allclose(np.asarray(q_b[i]), np.asarray(q_i[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(lp1_b[i]), float(lp1_i[0]),
                                   rtol=1e-4, atol=1e-3)


def test_trajectory_uturn_matches_xla():
    """record_uturn=True: the kernel's in-program first-U-turn step equals
    leapfrog_batched's recording (same (q_i, v_{i+1/2}) pairing) on a
    trajectory long enough to actually U-turn."""
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    x, y, flat = _setup(model, lik)
    c = 4
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=c, interpret=True,
        record_uturn=True)
    assert traj is not None

    rng = np.random.default_rng(7)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))
    momenta = jnp.asarray(rng.normal(size=thetas.shape), jnp.float32)
    eps, L = 5e-3, 60   # stable trajectory; U-turns at ~step 17, one
    # chain censored within L (probed)

    q_f, v_f, lp0_f, lp1_f, ut_f = traj(
        thetas, etas, momenta, x, y,
        jnp.asarray(eps, jnp.float32), jnp.asarray(L, jnp.int32))

    pots = make_potentials(model, lik, jnp.asarray(x), jnp.asarray(y),
                           flat.unravel_theta, flat.unravel_eta)
    vg = jax.vmap(pots.main_vg)
    q_x, v_x, lp1_x, _, ut_x = leapfrog_batched(
        lambda ths: vg(ths, etas), thetas, momenta,
        jnp.asarray(eps), jnp.asarray(L, jnp.int32), record_uturn=True)

    ut_x = np.asarray(ut_x)
    assert (ut_x > 0).any() and (ut_x == 0).any()   # turns + censoring
    np.testing.assert_array_equal(np.asarray(ut_f), ut_x)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x),
                               rtol=1e-3, atol=1e-4)


def test_trajectory_uturn_per_chain():
    """record_uturn with per-chain (eps, L): frozen chains stay censored
    past their own L and the recording matches the masked XLA path."""
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    x, y, flat = _setup(model, lik)
    c = 4
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=c, interpret=True,
        record_uturn=True)
    rng = np.random.default_rng(9)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))
    momenta = jnp.asarray(rng.normal(size=thetas.shape), jnp.float32)
    eps = np.asarray([2e-2, 4e-2, 3e-2, 2.5e-2], np.float32)
    L = np.asarray([50, 8, 30, 3], np.int32)

    *_, ut_f = traj(thetas, etas, momenta, x, y,
                    jnp.asarray(eps), jnp.asarray(L))

    pots = make_potentials(model, lik, jnp.asarray(x), jnp.asarray(y),
                           flat.unravel_theta, flat.unravel_eta)
    vg = jax.vmap(pots.main_vg)
    *_, ut_x = leapfrog_batched(
        lambda ths: vg(ths, etas), thetas, momenta,
        jnp.asarray(eps)[:, None], jnp.asarray(L), record_uturn=True)

    ut_f, ut_x = np.asarray(ut_f), np.asarray(ut_x)
    np.testing.assert_array_equal(ut_f, ut_x)
    # a recorded U-turn never exceeds the chain's own executed length
    assert ((ut_f == 0) | (ut_f <= L)).all()


def test_sampling_uturn_with_trajectory_matches_potential_path():
    """trajectory='uturn' driver runs: fused trajectory kernel (in-program
    U-turn recording) vs the XLA path, identical PRNG streams -> the host
    UTurnAdapter sees identical observations and the chains match."""
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.ops import fused_mlp

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)

    def run(traj_on):
        orig = fused_mlp.try_build_fused_trajectory
        if not traj_on:
            fused_mlp.try_build_fused_trajectory = lambda *a, **k: None
        try:
            net = Network(jnp.float32, 1, x, y, x, y, seed=11)
            net.add(GaussianDenseLayer(1, 6)).add(Tanh())
            net.add(GaussianDenseLayer(6, 1))
            net.setup_mcmc(step_size_start=5e-3, leapfrog_start=8,
                           leapfrog_min=2, leapfrog_max=64, burnin=12,
                           averaging_steps=4, hyper_leapfrog=4,
                           random_steps=1)
            return net.train(28, 4, FixedGaussianLikelihood(sd=0.1),
                             n_chains=2, trajectory="uturn",
                             verbose=False, use_fused=True)
        finally:
            fused_mlp.try_build_fused_trajectory = orig

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=2e-3, atol=2e-4)
    assert 0 < a.main_accept.mean() <= 1.0


def test_trajectory_matches_xla_softmax_categorical():
    """Multiclass head (Softmax + CategoricalLikelihood) through the
    trajectory kernel: the fused logits-space tail matches the XLA
    softmax-then-clip-log potential across a whole trajectory."""
    from tensorbnn_tpu import CategoricalLikelihood
    model = Sequential([GaussianDenseLayer(2, 6), Tanh(),
                        GaussianDenseLayer(6, 3), Softmax()])
    _compare(model, CategoricalLikelihood(), d_in=2, L=7, eps=2e-2,
             n_classes=3)


def _tempered_compare(eps, L, seed=0):
    """Tempered kernel program vs the XLA tempered potential
    (power posterior: prior + beta * loglik) across one trajectory."""
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    x, y, flat = _setup(model, lik, seed=seed)
    c = 4
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=c, interpret=True, tempered=True)
    assert traj is not None

    rng = np.random.default_rng(seed + 1)
    thetas = jnp.asarray(
        0.3 * rng.normal(size=(c, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (c, 1))
    momenta = jnp.asarray(rng.normal(size=thetas.shape), jnp.float32)
    betas = jnp.asarray([1.0, 0.3, 0.06, 0.01], jnp.float32)

    eps_in = jnp.asarray(eps, jnp.float32)
    l_in = jnp.asarray(L, jnp.int32)
    q_f, v_f, lp0_f, lp1_f = traj(thetas, etas, momenta, x, y,
                                  eps_in, l_in, betas)

    pots = make_potentials(model, lik, jnp.asarray(x), jnp.asarray(y),
                           flat.unravel_theta, flat.unravel_eta)
    vg_t = jax.vmap(pots.main_vg_t, in_axes=(0, 0, 0))
    lp0_x, _ = vg_t(thetas, etas, betas)
    eps_x = eps_in[:, None] if eps_in.ndim == 1 else eps_in
    q_x, v_x, lp1_x, _ = leapfrog_batched(
        lambda ths: vg_t(ths, etas, betas), thetas, momenta, eps_x, l_in)

    np.testing.assert_allclose(np.asarray(lp0_f), np.asarray(lp0_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lp1_f), np.asarray(lp1_x),
                               rtol=1e-4, atol=1e-2)


def test_trajectory_tempered_matches_xla():
    _tempered_compare(eps=1e-2, L=13)


def test_trajectory_tempered_per_chain_eps_and_L():
    """Tempered program combined with per-chain (eps, L) — the rung-major
    tempered fleet always runs per-rung adapters, so this is the product
    configuration."""
    _tempered_compare(eps=np.asarray([5e-3, 1e-2, 2e-2, 8e-3], np.float32),
                      L=np.asarray([3, 11, 7, 5], np.int32))


def test_trajectory_tempered_requires_betas():
    model = Sequential([GaussianDenseLayer(1, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    lik = FixedGaussianLikelihood(sd=0.1)
    x, y, flat = _setup(model, lik)
    traj = try_build_fused_trajectory(
        model, lik, flat.unravel_theta, flat.unravel_eta, x, y,
        eta_dim=flat.eta.size, block_c=4, interpret=True, tempered=True)
    rng = np.random.default_rng(1)
    thetas = jnp.asarray(rng.normal(size=(4, flat.theta.size)), jnp.float32)
    etas = jnp.tile(flat.eta[None], (4, 1))
    import pytest
    with pytest.raises(TypeError, match="betas"):
        traj(thetas, etas, thetas, x, y,
             jnp.asarray(1e-2, jnp.float32), jnp.asarray(3, jnp.int32))


def test_tempered_sampling_fused_matches_xla_path():
    """Full tempered driver run: fused trajectory kernel (interpret) vs
    the XLA tempered potential path, identical PRNG streams -> identical
    chains (within float drift), including the replica swaps."""
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.ops import fused_mlp

    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)

    def run(traj_on):
        orig = fused_mlp.try_build_fused_trajectory
        if not traj_on:
            fused_mlp.try_build_fused_trajectory = lambda *a, **k: None
        try:
            net = Network(jnp.float32, 1, x, y, x, y, seed=11)
            net.add(GaussianDenseLayer(1, 6)).add(Tanh())
            net.add(GaussianDenseLayer(6, 1))
            net.setup_mcmc(step_size_start=1e-3, leapfrog_start=8,
                           leapfrog_min=4, leapfrog_max=16, burnin=10,
                           averaging_steps=5, hyper_leapfrog=4,
                           random_steps=1)
            return net.train(30, 4, FixedGaussianLikelihood(sd=0.1),
                             n_chains=2, tempering=3,
                             tempering_beta_min=0.05, verbose=False,
                             use_fused=True)
        finally:
            fused_mlp.try_build_fused_trajectory = orig

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a.theta_samples, b.theta_samples,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(a.swap_accept, b.swap_accept,
                               rtol=0, atol=0)
    assert 0 < a.main_accept.mean() <= 1.0
