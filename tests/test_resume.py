"""Mid-chain checkpoint/resume: an interrupted run continues bit-exactly
(new capability vs. the reference, which persists only samples —
SURVEY.md #5)."""

import math

import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, Tanh
from tensorbnn_tpu.network import Network


def _make_net(seed=5):
    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=1e-3, leapfrog_start=10, leapfrog_min=5,
                   leapfrog_max=30, burnin=20, averaging_steps=5,
                   hyper_leapfrog=5, random_steps=2, adapter_seed=0)
    return net


def test_resume_matches_uninterrupted_run(tmp_path):
    lik = FixedGaussianLikelihood(sd=0.1)

    # uninterrupted 80-epoch run
    full = _make_net().train(80, 5, lik, verbose=False)

    # interrupted: 40 epochs with checkpointing, then resume to 80.
    # Both runs must consume identical PRNG streams: Network.train splits
    # its key per call, so drive sample_posterior directly for the resumed
    # pair.
    from tensorbnn_tpu.sampler.driver import sample_posterior
    import jax

    ckpt = str(tmp_path / "ckpt")
    net = _make_net()
    params, hypers = net.init_state()
    key = jax.random.split(net.key)[1]  # mimic train()'s split

    common = dict(config=net.config, params=params, hypers=hypers, key=key,
                  sampling_step=5, adjust_hypers=True, verbose=False,
                  checkpoint_dir=ckpt, checkpoint_every=1)
    sample_posterior(net.model, lik, net.train_x, net.train_y,
                     epochs=40, **common)
    res = sample_posterior(net.model, lik, net.train_x, net.train_y,
                           epochs=80, **common)

    assert res.n_epochs == 80
    assert res.theta_samples.shape == full.theta_samples.shape
    np.testing.assert_allclose(res.theta_samples, full.theta_samples,
                               rtol=2e-4, atol=1e-5)
    assert res.final_leapfrog == full.final_leapfrog
    assert res.final_step_size == full.final_step_size
