"""Chain-aware Predictor autocorrelation (VERDICT r3 weak #4).

For multichain stores the sample axis is a chain-major concatenation
(predictor.py:_load_reference); a tau estimated over that pooled series
treats between-chain mean differences as autocorrelation and inflates the
estimate. The Predictor must estimate per-chain taus/ACFs and average.
Single-chain stores (the reference's only case, reference
predictor.py:275-312) must be bit-unchanged.
"""

import numpy as np
import pytest

from tensorbnn_tpu.predictor import Predictor
from tensorbnn_tpu.utils import autocorr


def _make_pred(series: np.ndarray, chain_index):
    """A Predictor shell whose predict() returns the given (S,) series for
    one test point — enough to drive the diagnostics paths."""
    p = Predictor.__new__(Predictor)
    p.chain_index = chain_index
    p.predict = lambda x, n=1: series[:, None, None]
    return p


def test_multichain_tau_not_inflated_by_mean_shift():
    rng = np.random.default_rng(0)
    n = 512
    c0 = rng.normal(0.0, 1.0, n)
    c1 = rng.normal(10.0, 1.0, n)   # same dynamics, different mode
    series = np.concatenate([c0, c1])
    idx = np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])

    p = _make_pred(series, idx)
    tau = p.autocorrelation_length(None, n_max=1000)
    # per-chain IID noise: theory tau = 1
    assert 0.5 < tau < 2.0

    # the chain-blind pooled estimate on the same data is inflated — this
    # is the defect the per-chain split removes
    pooled = float(autocorr.integrated_time_batch(series[None, :])[0])
    assert pooled > 10 * tau

    acf = p.autocorrelation(None, n_max=16)
    assert acf[0] == pytest.approx(1.0, abs=1e-6)
    # IID per chain: every nonzero lag near 0 (pooled ACF would sit ~0.5)
    assert np.all(np.abs(acf[1:]) < 0.2)


def test_single_chain_store_matches_pooled_reference_path():
    rng = np.random.default_rng(1)
    series = np.cumsum(rng.normal(size=256)) * 0.1 + rng.normal(size=256)

    blind = _make_pred(series, None)
    aware = _make_pred(series, np.zeros(256, np.int64))  # one chain id

    tau_blind = blind.autocorrelation_length(None, n_max=1000)
    tau_aware = aware.autocorrelation_length(None, n_max=1000)
    assert tau_aware == pytest.approx(tau_blind, rel=0, abs=0)

    np.testing.assert_array_equal(
        blind.autocorrelation(None, n_max=32),
        aware.autocorrelation(None, n_max=32))


def test_chain_blocks_split():
    p = Predictor.__new__(Predictor)
    p.chain_index = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    assert p._chain_blocks() == [(0, 3), (3, 5), (5, 9)]
    p.chain_index = np.zeros(5, np.int64)
    assert p._chain_blocks() is None
    p.chain_index = None
    assert p._chain_blocks() is None
