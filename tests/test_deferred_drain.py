"""Deferred sample materialization (sampler/driver.py): sample rows stay
on device as per-chunk slices and stream to host on a background worker
in batched device_gets, overlapped with later dispatches (round-5 fix
for the flagship's per-chunk fetch wall — VERDICT r4 #1).

Invariant under test: the drain *batching boundary* is invisible — the
returned sample history is bit-identical whether everything lands in a
single end-of-run batch or one batch per chunk (forced here by shrinking
the module's `_DRAIN_SUBMIT_BYTES` threshold), because the single-worker
executor preserves FIFO submit order. The reference has no analogue (it
materializes per-epoch host-side); the invariant is this design's own.
"""

import math

import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, Tanh
from tensorbnn_tpu.network import Network
from tensorbnn_tpu.sampler import driver as driver_mod


def _make_net(seed=7):
    x = np.linspace(-1, 1, 9)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=1e-3, leapfrog_start=10, leapfrog_min=5,
                   leapfrog_max=30, burnin=20, averaging_steps=5,
                   hyper_leapfrog=5, random_steps=2, adapter_seed=0)
    return net


def test_submit_granularity_is_invisible(monkeypatch):
    lik = FixedGaussianLikelihood(sd=0.1)

    base = _make_net().train(80, 5, lik, n_chains=3, verbose=False)

    # 1-byte threshold -> _submit_pending fires after every chunk, so the
    # drain worker sees many small batches instead of one big one
    monkeypatch.setattr(driver_mod, "_DRAIN_SUBMIT_BYTES", 1)
    tiny = _make_net().train(80, 5, lik, n_chains=3, verbose=False)

    assert base.theta_samples.shape == tiny.theta_samples.shape
    assert base.theta_samples.shape[0] > 1   # several drained rows
    np.testing.assert_array_equal(base.theta_samples, tiny.theta_samples)
    np.testing.assert_array_equal(base.eta_samples, tiny.eta_samples)


def test_tiny_batches_with_checkpoints(monkeypatch, tmp_path):
    """Checkpoint saves force mid-run drains (_save_checkpoint calls
    _drain_pending); interleaving those with per-chunk submits must not
    reorder or duplicate rows either."""
    lik = FixedGaussianLikelihood(sd=0.1)

    base = _make_net().train(80, 5, lik, verbose=False)

    monkeypatch.setattr(driver_mod, "_DRAIN_SUBMIT_BYTES", 1)
    ck = _make_net().train(80, 5, lik, verbose=False,
                           checkpoint_dir=str(tmp_path / "ck"),
                           checkpoint_every=2)

    assert base.theta_samples.shape == ck.theta_samples.shape
    np.testing.assert_array_equal(base.theta_samples, ck.theta_samples)
    np.testing.assert_array_equal(base.eta_samples, ck.eta_samples)
