"""Multi-chain / multi-device tests on the 8-device virtual CPU mesh
(SURVEY.md #4: the JAX-native fake multi-node backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
    GaussianLikelihood, Tanh
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.parallel import mesh as mesh_lib
from tensorbnn_tpu.parallel.chains import (
    init_multichain_state,
    make_multichain_chunk_runner,
)
from tensorbnn_tpu.sampler.potential import flatten_state, make_potentials


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    model = Sequential([GaussianDenseLayer(3, 8), Tanh(),
                        GaussianDenseLayer(8, 1)])
    params, hypers = model.init(jax.random.key(0))
    likelihood = GaussianLikelihood(sd=0.1)
    lik_hypers = likelihood.init_hypers()
    flat = flatten_state(params, hypers, lik_hypers)
    return model, likelihood, x, y, flat


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_likelihood_matches_single_device(problem):
    """psum'd data-parallel log posterior == single-device value, and so do
    its gradients (the quantity inside the leapfrog loop)."""
    model, likelihood, x, y, flat = problem
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dev_mesh = mesh_lib.make_mesh(n_chain_devices=1, n_data_devices=8)

    pots_local = make_potentials(model, likelihood,
                                 jnp.asarray(x), jnp.asarray(y),
                                 flat.unravel_theta, flat.unravel_eta)
    want = float(pots_local.main(flat.theta, flat.eta))
    want_grad = np.asarray(jax.grad(pots_local.main)(flat.theta, flat.eta))

    def sharded_main(theta, eta, xs, ys):
        pots = make_potentials(model, likelihood, xs, ys,
                               flat.unravel_theta, flat.unravel_eta,
                               axis_name=mesh_lib.DATA_AXIS)
        return pots.main(theta, eta)

    fn = shard_map(
        sharded_main, mesh=dev_mesh,
        in_specs=(P(), P(), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
        out_specs=P(), check_vma=False)
    got = float(jax.jit(fn)(flat.theta, flat.eta,
                            jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)

    # the gradient must go through the collective-correct value_and_grad
    # (main_vg): grad *through* a psum under check_vma=False loses the
    # cross-shard sum
    grad_fn = shard_map(
        lambda th, e, xs, ys: make_potentials(
            model, likelihood, xs, ys,
            flat.unravel_theta, flat.unravel_eta,
            axis_name=mesh_lib.DATA_AXIS).main_vg(th, e)[1],
        mesh=dev_mesh,
        in_specs=(P(), P(), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
        out_specs=P(), check_vma=False)
    got_grad = np.asarray(jax.jit(grad_fn)(flat.theta, flat.eta,
                                           jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got_grad, want_grad, rtol=2e-3, atol=1e-4)


def test_mesh_run_matches_vmap_run(problem):
    """A (chains=2, data=4) shard_map run reproduces the plain vmap run:
    same keys -> same trajectories (up to reduction-order roundoff)."""
    model, likelihood, x, y, flat = problem
    dev_mesh = mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4)
    n_chains = 4

    kwargs = dict(adjust_hypers=True, hyper_leapfrog=5, burnin=50.0,
                  hyper_step_size_init=1e-3, donate=False)
    run_plain = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=None, **kwargs)
    run_mesh = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=dev_mesh, **kwargs)

    carry0 = init_multichain_state(flat.theta, flat.eta, jax.random.key(7),
                                   1e-3, n_chains, jitter=0.01)
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    eps = jnp.asarray(5e-4, jnp.float32)
    L = jnp.asarray(8, jnp.int32)

    c_plain, t_plain = run_plain(carry0, xs, ys, eps, L, 3)
    c_mesh, t_mesh = run_mesh(carry0, xs, ys, eps, L, 3)

    np.testing.assert_allclose(np.asarray(c_mesh.theta),
                               np.asarray(c_plain.theta),
                               rtol=5e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(t_mesh.main_accept),
                               np.asarray(t_plain.main_accept),
                               rtol=5e-2, atol=5e-3)
    assert np.isfinite(np.asarray(t_mesh.sjd)).all()


def test_vmapped_chains_differ_and_are_finite(problem):
    model, likelihood, x, y, flat = problem
    run = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=None, adjust_hypers=True, hyper_leapfrog=5, burnin=50.0,
        hyper_step_size_init=1e-3, donate=False)
    carry0 = init_multichain_state(flat.theta, flat.eta, jax.random.key(1),
                                   1e-3, 8)
    carry, trace = run(carry0, jnp.asarray(x), jnp.asarray(y),
                       jnp.asarray(1e-3, jnp.float32),
                       jnp.asarray(5, jnp.int32), 4)
    thetas = np.asarray(carry.theta)
    assert thetas.shape[0] == 8
    assert np.isfinite(thetas).all()
    # distinct PRNG keys -> distinct chains
    assert np.std(thetas, axis=0).max() > 0


def test_multichain_through_network_facade(problem):
    """n_chains through the public API pools samples chain-major."""
    import math
    from tensorbnn_tpu.network import Network
    train_in = np.linspace(-1, 1, 9)
    train_out = np.sin(train_in * math.pi)
    net = Network(jnp.float32, 1, train_in, train_out, train_in, train_out,
                  seed=3)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=1e-3, leapfrog_start=10, leapfrog_min=5,
                   leapfrog_max=30, burnin=20, averaging_steps=5,
                   hyper_leapfrog=5, random_steps=2)
    res = net.train(60, 5, FixedGaussianLikelihood(sd=0.1), n_chains=4,
                    chain_jitter=0.01, verbose=False)
    assert res.theta_samples.shape[:2] == (8, 4)  # (S, C, D)
    pooled = res.theta_pooled
    assert pooled.shape[0] == 32
    # pooled samples cover all chains (chain-major: first S rows = chain 0)
    np.testing.assert_allclose(pooled[:8], res.theta_samples[:, 0],
                               rtol=1e-6)
    w = np.asarray(res.param_samples[0]["w"])
    assert w.shape[0] == 32


def test_tree_layout_matches_flat(problem):
    """The wide-model pytree state layout reproduces the flat layout's
    draws bit-for-bit (shared PRNG stream via flat momentum draws)."""
    model, likelihood, x, y, flat = problem
    kw = dict(adjust_hypers=True, hyper_leapfrog=5, burnin=50.0,
              hyper_step_size_init=1e-3, donate=False)
    run_f = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        state_layout="flat", **kw)
    run_t = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        state_layout="tree", **kw)
    carry = init_multichain_state(flat.theta, flat.eta, jax.random.key(5),
                                  1e-3, 4, jitter=0.01)
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    eps = jnp.asarray(1e-3, jnp.float32)
    L = jnp.asarray(6, jnp.int32)
    cf, tf_ = run_f(carry, xs, ys, eps, L, 3)
    ct, tt = run_t(carry, xs, ys, eps, L, 3)
    np.testing.assert_allclose(np.asarray(ct.theta), np.asarray(cf.theta),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ct.eta), np.asarray(cf.eta),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(tt.theta), np.asarray(tf_.theta),
                               rtol=1e-6, atol=1e-7)


def test_tree_layout_on_mesh_matches_plain(problem):
    """Tree layout + (chains, data) mesh: psum'd tree gradients reproduce
    the single-device tree run."""
    model, likelihood, x, y, flat = problem
    dev_mesh = mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4)
    kw = dict(adjust_hypers=True, hyper_leapfrog=5, burnin=50.0,
              hyper_step_size_init=1e-3, donate=False, state_layout="tree")
    run_plain = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=None, **kw)
    run_mesh = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        mesh=dev_mesh, **kw)
    carry = init_multichain_state(flat.theta, flat.eta, jax.random.key(9),
                                  1e-3, 4, jitter=0.01)
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    eps = jnp.asarray(5e-4, jnp.float32)
    L = jnp.asarray(6, jnp.int32)
    cp, tp = run_plain(carry, xs, ys, eps, L, 3)
    cm, tm = run_mesh(carry, xs, ys, eps, L, 3)
    np.testing.assert_allclose(np.asarray(cm.theta), np.asarray(cp.theta),
                               rtol=5e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(tm.main_accept),
                               np.asarray(tp.main_accept),
                               rtol=5e-2, atol=5e-3)


def test_predictor_mesh_sharded_inference(tmp_path):
    """Ensemble inference sharded over the mesh (networks on the chains
    axis, batch on data) == single-device predictions, incl. padding for
    non-divisible ensemble and batch sizes."""
    from tensorbnn_tpu.io import checkpoint
    from tensorbnn_tpu.predictor import Predictor

    model = Sequential([GaussianDenseLayer(2, 6), Tanh(),
                        GaussianDenseLayer(6, 1)])
    params, hypers = model.init(jax.random.key(1))
    flat = flatten_state(params, hypers, {})

    # 11 networks exercise ensemble padding on the 2-device chains axis;
    # 13 rows exercise batch padding on the 4-device data axis
    n_nets = 11
    rng = np.random.default_rng(2)
    thetas = jnp.asarray(
        flat.theta[None] + 0.1 * rng.normal(size=(n_nets, flat.theta.size)),
        jnp.float32)
    param_samples = jax.tree.map(np.asarray,
                                 jax.vmap(flat.unravel_theta)(thetas))
    hyper_samples = tuple(
        jax.tree.map(lambda v, n=n_nets: np.broadcast_to(
            np.asarray(v), (n,) + np.shape(v)).copy(), h)
        for h in hypers)

    d = str(tmp_path / "run")
    checkpoint.save_samples(d, param_samples, hyper_samples, {})
    with open(f"{d}/architecture.txt", "w") as f:
        for name in model.layer_names:
            f.write(name + "\n")

    x = rng.normal(size=(13, 2)).astype(np.float32)
    dev_mesh = mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4)

    plain = Predictor(d, likelihood=FixedGaussianLikelihood(sd=0.1))
    base = plain.predict(x)

    sharded = Predictor(d, likelihood=FixedGaussianLikelihood(sd=0.1),
                        mesh=dev_mesh)
    out = sharded.predict(x)
    assert out.shape == base.shape == (n_nets, 13, 1)
    np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-6)

    # per-call mesh on a plain Predictor + cache reuse on a second call
    out2 = plain.predict(x, mesh=dev_mesh)
    np.testing.assert_allclose(out2, base, rtol=1e-5, atol=1e-6)
    m, sd = sharded.predict_mean_sd(x)
    np.testing.assert_allclose(m, base.mean(axis=0), rtol=1e-5, atol=1e-6)


def test_precondition_and_data_chunk_under_mesh(tmp_path):
    """The diagonal-metric preconditioner and chunked likelihood compose
    with the sharded driver: the step-scale constant replicates into the
    shard_map body, the chunked value/grad still psums over the data
    axis, and the run produces finite, moving samples."""
    import math

    from tensorbnn_tpu.network import Network

    mesh = mesh_lib.make_mesh(n_chain_devices=4, n_data_devices=2)
    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=6)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=5e-4,
                   step_size_max=1e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=4, leapfrog_max=16,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    res = net.train(120, 4, FixedGaussianLikelihood(sd=0.1),
                    n_chains=8, chain_jitter=0.05, mesh=mesh,
                    precondition=True, data_chunk=4, use_fused=False,
                    verbose=False)
    assert np.isfinite(res.theta_samples).all()
    assert 0.05 < res.main_accept[40:].mean() <= 1.0
    # the chain actually moved post-activation
    assert np.std(res.theta_samples[:, 0, 0]) > 0
