"""Per-chain-group adaptation (``n_adapters``): SURVEY.md #7 hard part 3's
"one adapter per chain-group" option.

Covers: masked per-chain (eps, L) batched kernels vs independent runs,
driver runs with chain groups on distinct (eps, L) trajectories, the
shared-adapter default staying bitwise-unchanged, mesh composition, and
resume roundtrips incl. the fingerprint guard.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    FixedGaussianLikelihood,
    GaussianDenseLayer,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.driver import MCMCConfig, sample_posterior
from tensorbnn_tpu.sampler.hmc import hmc_step_batched, hmc_step_tree


def _gauss_vg(ths):
    return -0.5 * jnp.sum(ths * ths, axis=-1), -ths


def test_batched_per_chain_eps_l_matches_independent():
    """(C,) eps + (C,) L through one batched call == per-chain scalar
    calls with the same keys (mask-freeze changes nothing)."""
    c, d = 5, 7
    keys = jax.random.split(jax.random.key(0), c)
    pos = jax.random.normal(jax.random.key(1), (c, d))
    eps = jnp.asarray([0.05, 0.1, 0.2, 0.15, 0.08])
    lls = jnp.asarray([3, 9, 5, 1, 7], jnp.int32)

    batch = hmc_step_batched(keys, pos, _gauss_vg, eps, lls)
    for i in range(c):
        solo = hmc_step_batched(keys[i:i + 1], pos[i:i + 1], _gauss_vg,
                                float(eps[i]), int(lls[i]))
        np.testing.assert_allclose(np.asarray(batch.position[i]),
                                   np.asarray(solo.position[0]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(batch.accept_prob[i]),
                                   float(solo.accept_prob[0]), rtol=1e-6)


def test_tree_per_chain_eps_l_matches_independent():
    c, d = 3, 6
    keys = jax.random.split(jax.random.key(2), c)
    pos_flat = jax.random.normal(jax.random.key(3), (c, d))
    tree = {"a": pos_flat[:, :4], "b": pos_flat[:, 4:]}

    def vg_tree(t):
        flat = jnp.concatenate([t["a"], t["b"]], axis=-1)
        lp, g = _gauss_vg(flat)
        return lp, {"a": g[:, :4], "b": g[:, 4:]}

    eps = jnp.asarray([0.04, 0.12, 0.2])
    lls = jnp.asarray([6, 2, 4], jnp.int32)
    batch = hmc_step_tree(keys, tree, vg_tree, eps, lls)
    for i in range(c):
        sub = {"a": tree["a"][i:i + 1], "b": tree["b"][i:i + 1]}
        solo = hmc_step_tree(keys[i:i + 1], sub, vg_tree,
                             float(eps[i]), int(lls[i]))
        np.testing.assert_allclose(np.asarray(batch.position["a"][i]),
                                   np.asarray(solo.position["a"][0]),
                                   rtol=1e-6, atol=1e-7)


def _toy_problem():
    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)
    model = Sequential([GaussianDenseLayer(1, 5), Tanh(),
                        GaussianDenseLayer(5, 1)])
    params, hypers = model.init(jax.random.key(0))
    lik = FixedGaussianLikelihood(sd=0.1)
    return model, lik, x[:, None], y, params, hypers


def _config(**over):
    base = dict(step_size_start=5e-3, step_size_min=1e-3,
                step_size_max=1e-2, step_size_options=5,
                leapfrog_start=6, leapfrog_min=2, leapfrog_max=12,
                burnin=10, averaging_steps=5, hyper_leapfrog=4,
                random_steps=2)
    base.update(over)
    return MCMCConfig(**base)


def test_driver_n_adapters_runs_and_groups_diverge():
    """Chain groups follow their own adapter trajectories: the run
    completes, samples are produced, and (being seeded with distinct
    random phases) groups see different (eps, L) at some point."""
    model, lik, x, y, params, hypers = _toy_problem()
    res = sample_posterior(
        model, lik, x, y, config=_config(), params=params, hypers=hypers,
        key=jax.random.key(7), epochs=30, sampling_step=4,
        n_chains=4, n_adapters=2, verbose=False)
    assert res.theta_samples.shape[0] == 5      # (30-10)/4
    assert res.n_chains == 4
    assert np.all(np.isfinite(res.theta_samples))
    assert 0 < res.main_accept.mean() <= 1.0


def test_n_adapters_one_is_bitwise_shared_path():
    """n_adapters=1 must be byte-identical to the pre-feature behavior
    (scalar (eps, L) dispatch, one adapter)."""
    model, lik, x, y, params, hypers = _toy_problem()

    def run(**kw):
        return sample_posterior(
            model, lik, x, y, config=_config(), params=params,
            hypers=hypers, key=jax.random.key(3), epochs=25,
            sampling_step=5, n_chains=2, verbose=False, **kw)

    a = run()
    b = run(n_adapters=1)
    np.testing.assert_array_equal(a.theta_samples, b.theta_samples)
    np.testing.assert_array_equal(a.sjd, b.sjd)


def test_n_adapters_validation():
    model, lik, x, y, params, hypers = _toy_problem()
    with pytest.raises(ValueError, match="n_adapters"):
        sample_posterior(
            model, lik, x, y, config=_config(), params=params,
            hypers=hypers, key=jax.random.key(0), epochs=10,
            sampling_step=2, n_chains=4, n_adapters=3, verbose=False)


def test_n_adapters_under_mesh():
    """Per-chain (eps, L) shard with the chains axis; the psum'd
    likelihood still matches: the run completes with finite samples."""
    from tensorbnn_tpu.parallel import mesh as mesh_lib
    dev_mesh = mesh_lib.make_mesh(n_chain_devices=2, n_data_devices=4)
    model, lik, x, y, params, hypers = _toy_problem()
    # pad data rows to the mesh's data axis
    xr = np.concatenate([x, x[:3]])
    yr = np.concatenate([y, y[:3]])
    res = sample_posterior(
        model, lik, xr, yr, config=_config(), params=params,
        hypers=hypers, key=jax.random.key(9), epochs=20, sampling_step=4,
        n_chains=8, n_adapters=4, mesh=dev_mesh, verbose=False)
    assert np.all(np.isfinite(res.theta_samples))
    assert res.theta_samples.shape[1] == 8


def test_resume_roundtrip_with_adapter_groups(tmp_path):
    """Interrupted n_adapters=2 run resumes bit-exactly (same samples as
    the uninterrupted run), incl. per-group adapter + (eps, L) state."""
    model, lik, x, y, params, hypers = _toy_problem()
    kw = dict(config=_config(), params=params, hypers=hypers,
              epochs=30, sampling_step=4, n_chains=4, n_adapters=2,
              verbose=False)

    full = sample_posterior(model, lik, x, y, key=jax.random.key(5), **kw)

    ck = str(tmp_path / "ck")
    partial_kw = dict(kw, epochs=15)
    sample_posterior(model, lik, x, y, key=jax.random.key(5),
                     checkpoint_dir=ck, **partial_kw)
    resumed = sample_posterior(model, lik, x, y, key=jax.random.key(5),
                               checkpoint_dir=ck, **kw)
    np.testing.assert_array_equal(full.theta_samples,
                                  resumed.theta_samples)


def test_resume_rejects_changed_n_adapters(tmp_path):
    model, lik, x, y, params, hypers = _toy_problem()
    kw = dict(config=_config(), params=params, hypers=hypers,
              epochs=12, sampling_step=4, n_chains=4, verbose=False)
    ck = str(tmp_path / "ck")
    sample_posterior(model, lik, x, y, key=jax.random.key(5),
                     checkpoint_dir=ck, n_adapters=2, **kw)
    with pytest.raises(ValueError, match="n_adapters"):
        sample_posterior(model, lik, x, y, key=jax.random.key(5),
                         checkpoint_dir=ck, n_adapters=1, **kw)


def test_legacy_checkpoint_adapter_count_mismatch_raises(tmp_path):
    """A checkpoint without a fingerprint (legacy) resumed under a
    different n_adapters gets a clear adapter-count error, not a shape
    error from partially-loaded state."""
    import json
    import os

    model, lik, x, y, params, hypers = _toy_problem()
    ck = str(tmp_path / "ck")
    sample_posterior(model, lik, x, y, config=_config(), params=params,
                     hypers=hypers, key=jax.random.key(5), epochs=12,
                     sampling_step=4, n_chains=4, n_adapters=1,
                     checkpoint_dir=ck, verbose=False)
    # strip the fingerprint, emulating a pre-fingerprint checkpoint
    p = os.path.join(ck, "resume.json")
    with open(p) as f:
        host = json.load(f)
    host.pop("fingerprint", None)
    with open(p, "w") as f:
        json.dump(host, f)

    with pytest.raises(ValueError, match="adapter state"):
        sample_posterior(model, lik, x, y, config=_config(),
                         params=params, hypers=hypers,
                         key=jax.random.key(5), epochs=24,
                         sampling_step=4, n_chains=4, n_adapters=2,
                         checkpoint_dir=ck, verbose=False)
