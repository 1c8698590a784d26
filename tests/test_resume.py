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


def test_resume_with_changed_config_raises(tmp_path):
    """Resuming under a different MCMCConfig or model silently produces a
    wrong trajectory; the persisted fingerprint must reject it
    (VERDICT round-1 weak #3)."""
    import jax
    import pytest

    from tensorbnn_tpu.sampler.driver import sample_posterior

    lik = FixedGaussianLikelihood(sd=0.1)
    ckpt = str(tmp_path / "ckpt")
    net = _make_net()
    params, hypers = net.init_state()
    key = jax.random.split(net.key)[1]
    common = dict(params=params, hypers=hypers, key=key,
                  sampling_step=5, adjust_hypers=True, verbose=False,
                  checkpoint_dir=ckpt, checkpoint_every=1)
    sample_posterior(net.model, lik, net.train_x, net.train_y,
                     epochs=40, config=net.config, **common)

    # different burnin -> different adaptation schedule -> refuse
    bad = _make_net()
    bad.setup_mcmc(step_size_start=1e-3, leapfrog_start=10, leapfrog_min=5,
                   leapfrog_max=30, burnin=35, averaging_steps=5,
                   hyper_leapfrog=5, random_steps=2, adapter_seed=0)
    with pytest.raises(ValueError, match="config"):
        sample_posterior(net.model, lik, net.train_x, net.train_y,
                         epochs=80, config=bad.config, **common)

    # different architecture -> refuse
    import jax.numpy as jnp2
    x = np.asarray(net.train_x)[:, 0]
    other = Network(jnp2.float32, 1, x, np.asarray(net.train_y),
                    x, np.asarray(net.train_y), seed=5)
    other.add(GaussianDenseLayer(1, 7)).add(Tanh())
    other.add(GaussianDenseLayer(7, 1))
    other.setup_mcmc(step_size_start=1e-3, leapfrog_start=10,
                     leapfrog_min=5, leapfrog_max=30, burnin=20,
                     averaging_steps=5, hyper_leapfrog=5, random_steps=2,
                     adapter_seed=0)
    p2, h2 = other.init_state()
    with pytest.raises(ValueError, match="layers|theta_dim"):
        sample_posterior(other.model, lik, other.train_x, other.train_y,
                         epochs=80, config=other.config,
                         params=p2, hypers=h2, key=key, sampling_step=5,
                         adjust_hypers=True, verbose=False,
                         checkpoint_dir=ckpt, checkpoint_every=1)

    # same config resumes fine
    res = sample_posterior(net.model, lik, net.train_x, net.train_y,
                           epochs=80, config=net.config, **common)
    assert res.n_epochs == 80


def test_discarding_samples_without_folder_raises():
    """keep_samples=False with no folder would silently lose the posterior
    (ADVICE round-1 medium)."""
    import pytest

    lik = FixedGaussianLikelihood(sd=0.1)
    net = _make_net()
    with pytest.raises(ValueError, match="keep_samples"):
        net.train(80, 5, lik, verbose=False, keep_samples=False)


def test_streamed_run_resumes_and_matches_uninterrupted(tmp_path):
    """Streaming writes (keep_samples=False) now compose with
    checkpoint/resume: the interrupted run truncates its stream files
    back to the checkpoint and continues — the final on-disk ensemble
    equals the uninterrupted streamed run's, byte for byte."""
    import os

    import jax

    from tensorbnn_tpu.sampler.driver import sample_posterior

    lik = FixedGaussianLikelihood(sd=0.1)

    def run_streamed(folder, interrupt):
        net = _make_net()
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        ckpt = str(tmp_path / f"ckpt_{interrupt}")
        common = dict(config=net.config, params=params, hypers=hypers,
                      key=key, sampling_step=5, adjust_hypers=True,
                      verbose=False, keep_samples=False,
                      folder_name=folder, networks_per_file=3,
                      n_chains=2,
                      checkpoint_dir=ckpt, checkpoint_every=1)
        if interrupt:
            sample_posterior(net.model, lik, net.train_x, net.train_y,
                             epochs=45, **common)
            # the 45-epoch stop streamed past the last checkpoint only if
            # chunks straddle sampling epochs; resume must reconcile
        return sample_posterior(net.model, lik, net.train_x, net.train_y,
                                epochs=80, **common)

    d_full = str(tmp_path / "full")
    d_resumed = str(tmp_path / "resumed")
    run_streamed(d_full, interrupt=False)
    run_streamed(d_resumed, interrupt=True)

    names = sorted(n for n in os.listdir(d_full)
                   if n.endswith(".txt"))
    assert names == sorted(n for n in os.listdir(d_resumed)
                           if n.endswith(".txt"))
    for n in names:
        with open(os.path.join(d_full, n), "rb") as f:
            a = f.read()
        with open(os.path.join(d_resumed, n), "rb") as f:
            b = f.read()
        assert a == b, f"stream file {n} differs after resume"


def test_fresh_streamed_run_clears_stale_files(tmp_path):
    """A new streaming run into a folder holding an older run's stream
    files must not append to them."""
    import jax

    from tensorbnn_tpu.predictor import Predictor
    from tensorbnn_tpu.sampler.driver import sample_posterior

    lik = FixedGaussianLikelihood(sd=0.1)
    folder = str(tmp_path / "run")

    def go():
        net = _make_net()
        params, hypers = net.init_state()
        key = jax.random.split(net.key)[1]
        return sample_posterior(
            net.model, lik, net.train_x, net.train_y, epochs=60,
            config=net.config, params=params, hypers=hypers, key=key,
            sampling_step=5, adjust_hypers=True, verbose=False,
            keep_samples=False, folder_name=folder, networks_per_file=4)

    go()
    go()  # second run into the same folder
    pred = Predictor(folder, likelihood=lik)
    # 60 epochs, burnin 20, step 5 -> 8 networks, 2 complete files of 4
    assert pred.n_networks == 8


def test_writer_state_dict_flushes_to_disk(tmp_path):
    """Checkpointing the writer must leave every claimed network durably
    on disk (a crash right after a checkpoint is the resume scenario)."""
    import os

    import jax

    from tensorbnn_tpu.io.reference_format import RunWriter
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer
    from tensorbnn_tpu.models.sequential import Sequential

    model = Sequential([GaussianDenseLayer(1, 3)])
    params, hypers = model.init(jax.random.key(0))
    d = str(tmp_path / "w")
    w = RunWriter(d, model, FixedGaussianLikelihood(sd=0.1),
                  networks_per_file=10)
    for _ in range(4):
        w.append(params, hypers, {})
    state = w.state_dict()
    assert state["n_written"] == 4
    # the stream file must hold all 4 networks' rows right now — not in
    # a Python buffer
    with open(os.path.join(d, "0.0.txt"), "rb") as f:
        n_lines = len(f.readlines())
    rows_per_net = state["shapes"][0][0]
    assert n_lines == 4 * rows_per_net


def test_restore_before_first_sample_clears_stale_summary(tmp_path):
    """A checkpoint taken before any network streamed (n_hyper_scalars
    None) must also remove a crashed run's stale summary.txt/chains.txt —
    otherwise load_run on the folder reports networks whose stream files
    the restore just deleted."""
    import os

    import jax

    from tensorbnn_tpu.io.reference_format import RunWriter
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer
    from tensorbnn_tpu.models.sequential import Sequential

    model = Sequential([GaussianDenseLayer(1, 3)])
    params, hypers = model.init(jax.random.key(0))
    lik = FixedGaussianLikelihood(sd=0.1)
    d = str(tmp_path / "w")

    w = RunWriter(d, model, lik, networks_per_file=2)
    pre_sample_state = w.state_dict()          # nothing streamed yet
    assert pre_sample_state["n_hyper_scalars"] is None
    for _ in range(4):                         # crashed run: 2 rotations
        w.append(params, hypers, {})
    assert os.path.exists(os.path.join(d, "summary.txt"))

    RunWriter(d, model, lik, networks_per_file=2,
              resume_state=pre_sample_state)
    for name in ("summary.txt", "chains.txt", "0.0.txt"):
        assert not os.path.exists(os.path.join(d, name)), name


def test_checkpoint_writes_are_incremental(tmp_path):
    """Each checkpoint persists only the samples accumulated since the
    previous one (O(new) I/O, VERDICT round-2 weak #4): the history lives
    in bounded resume_seg{i}.npz segments, resume.npz carries no sample
    stacks, and the segments concatenate to exactly the run's samples."""
    import os

    import jax

    from tensorbnn_tpu.io import checkpoint
    from tensorbnn_tpu.sampler.driver import sample_posterior

    lik = FixedGaussianLikelihood(sd=0.1)
    ckpt = str(tmp_path / "ckpt")
    net = _make_net()
    params, hypers = net.init_state()
    key = jax.random.split(net.key)[1]
    res = sample_posterior(net.model, lik, net.train_x, net.train_y,
                           epochs=80, config=net.config, params=params,
                           hypers=hypers, key=key, sampling_step=5,
                           adjust_hypers=True, verbose=False,
                           checkpoint_dir=ckpt, checkpoint_every=1)

    segs = sorted(n for n in os.listdir(ckpt) if n.startswith("resume_seg"))
    assert len(segs) >= 2, segs  # many checkpoints -> many small segments

    with np.load(os.path.join(ckpt, "resume.npz")) as data:
        assert "theta_samples" not in data.files

    # segments cover the run's samples exactly, in order, and each one is
    # bounded by the largest adapter cycle (checkpoint_every=1 chunk)
    import json
    with open(os.path.join(ckpt, "resume.json")) as f:
        n_segments = json.load(f)["n_segments"]
    thetas, etas = checkpoint.load_sample_segments(ckpt, n_segments)
    np.testing.assert_array_equal(np.stack(thetas), res.theta_samples)
    np.testing.assert_array_equal(np.stack(etas), res.eta_samples)
    max_per_cycle = -(-net.config.averaging_steps // 5)  # sampling_step=5
    for name in segs[:n_segments]:
        with np.load(os.path.join(ckpt, name)) as data:
            assert data["theta"].shape[0] <= max_per_cycle


def test_torn_checkpoint_detected(tmp_path):
    """resume.npz and resume.json from different saves (crash between the
    two renames) must raise, not silently resume a wrong trajectory."""
    import os

    import pytest

    from tensorbnn_tpu.io import checkpoint

    d = str(tmp_path / "ckpt")
    checkpoint.save_resume(d, carry_arrays={"x": np.zeros(3)},
                           host_state={"iter": 1})
    # keep save 1's json, overwrite with save 2's npz (the torn state)
    js = os.path.join(d, "resume.json")
    os.rename(js, js + ".keep")
    checkpoint.save_resume(d, carry_arrays={"x": np.ones(3)},
                           host_state={"iter": 2})
    os.replace(js + ".keep", js)

    with pytest.raises(ValueError, match="torn"):
        checkpoint.load_resume(d)


def test_legacy_checkpoint_upgrades_without_losing_history(tmp_path):
    """A pre-segment checkpoint (whole history inside resume.npz) must
    carry its history into the first segmented checkpoint on resume —
    not just the post-resume samples."""
    import os

    import jax

    from tensorbnn_tpu.io import checkpoint
    from tensorbnn_tpu.sampler.driver import sample_posterior

    lik = FixedGaussianLikelihood(sd=0.1)
    ckpt = str(tmp_path / "ckpt")
    net = _make_net()
    params, hypers = net.init_state()
    key = jax.random.split(net.key)[1]
    common = dict(config=net.config, params=params, hypers=hypers, key=key,
                  sampling_step=5, adjust_hypers=True, verbose=False,
                  checkpoint_dir=ckpt, checkpoint_every=1)
    sample_posterior(net.model, lik, net.train_x, net.train_y,
                     epochs=45, **common)

    # rewrite the checkpoint in the legacy layout: history in resume.npz,
    # no segments referenced
    arrays, host = checkpoint.load_resume(ckpt)
    import json as _json
    with open(os.path.join(ckpt, "resume.json")) as f:
        host_raw = _json.load(f)
    n_seg = host_raw.pop("n_segments")
    thetas, etas = checkpoint.load_sample_segments(ckpt, n_seg)
    arrays["theta_samples"] = np.stack(thetas)
    arrays["eta_samples"] = np.stack(etas)
    host_raw.pop("__pair_token__", None)
    checkpoint.save_resume(ckpt, carry_arrays=arrays, host_state=host_raw)
    for i in range(n_seg):
        os.remove(os.path.join(ckpt, f"resume_seg{i}.npz"))

    # resume from the legacy checkpoint and finish the run
    res = sample_posterior(net.model, lik, net.train_x, net.train_y,
                           epochs=80, **common)
    # uninterrupted reference run (fresh PRNG path identical to above)
    net2 = _make_net()
    p2, h2 = net2.init_state()
    key2 = jax.random.split(net2.key)[1]
    full = sample_posterior(net2.model, lik, net2.train_x, net2.train_y,
                            epochs=80, config=net2.config, params=p2,
                            hypers=h2, key=key2, sampling_step=5,
                            adjust_hypers=True, verbose=False)
    assert res.theta_samples.shape == full.theta_samples.shape
    np.testing.assert_allclose(res.theta_samples, full.theta_samples,
                               rtol=2e-4, atol=1e-5)
    # and the post-upgrade checkpoint's segments reproduce the FULL
    # history (the legacy prefix was not dropped)
    _, host2 = checkpoint.load_resume(ckpt)
    t2, _ = checkpoint.load_sample_segments(ckpt, host2["n_segments"])
    np.testing.assert_allclose(np.stack(t2), full.theta_samples,
                               rtol=2e-4, atol=1e-5)


def test_legacy_tokenless_checkpoint_loads(tmp_path):
    """Checkpoints written before the pairing token existed (no
    __pair_token__ in either file) must load unchanged."""
    import json as _json
    import os

    from tensorbnn_tpu.io import checkpoint

    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    np.savez(os.path.join(d, "resume.npz"), x=np.arange(3.0))
    with open(os.path.join(d, "resume.json"), "w") as f:
        _json.dump({"iter": 7}, f)
    arrays, host = checkpoint.load_resume(d)
    assert host == {"iter": 7}
    np.testing.assert_array_equal(arrays["x"], np.arange(3.0))
