"""Cross-chain convergence diagnostics.

New capability enabled by multi-chain sampling (the reference is single-chain
and has no convergence diagnostics beyond the predictor's autocorrelation):
split-R-hat (Gelman-Rubin) and cross-chain ESS over the pooled sample stacks
produced by :func:`tensorbnn_tpu.sampler.driver.sample_posterior`.
"""

from __future__ import annotations

import numpy as np

from tensorbnn_tpu.utils.autocorr import integrated_time


def split_rhat(samples: np.ndarray) -> np.ndarray:
    """Split-R-hat over a (draws, chains, ...) sample stack.

    Each chain is split in half (guarding against within-chain trends),
    giving 2C sequences; R-hat = sqrt(var_plus / W). Values near 1 indicate
    convergence; > 1.01 is suspect.
    """
    samples = np.asarray(samples, np.float64)
    n, c = samples.shape[:2]
    half = n // 2
    if half < 2:
        raise ValueError("need at least 4 draws per chain for split R-hat")
    halves = np.concatenate([samples[:half], samples[half:2 * half]], axis=1)
    m = halves.shape[1]          # 2C sequences
    k = half                     # draws per sequence

    chain_means = halves.mean(axis=0)            # (m, ...)
    chain_vars = halves.var(axis=0, ddof=1)      # (m, ...)
    w = chain_vars.mean(axis=0)
    b = k * chain_means.var(axis=0, ddof=1)
    var_plus = (k - 1) / k * w + b / k
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.sqrt(var_plus / w)


def multichain_ess(samples: np.ndarray) -> float:
    """Crude pooled ESS: sum over chains of n/tau on the flattened series."""
    samples = np.asarray(samples, np.float64)
    n, c = samples.shape[:2]
    flat = samples.reshape(n, c, -1)
    total = 0.0
    for ci in range(c):
        series = flat[:, ci, 0]
        tau = integrated_time(series, quiet=True)
        if np.isnan(tau) or tau <= 0:
            continue
        total += n / max(tau, 1.0)
    return total
