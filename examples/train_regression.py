"""Trig regression example — the TPU-native clone of the reference's
Examples/trainRegression.py (its de-facto integration test, SURVEY.md #4):
1-D trig target, 3 hidden tanh layers of width 10, FixedGaussianLikelihood
(sd=0.1), adaptive two-block HMC.

Run on TPU as-is; pass --cpu for a quick CPU run; pass --smoke for a short
sanity run.
"""

import argparse

import os as _os
import sys as _sys
# runnable from anywhere: the package lives at the repo root
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="short run for sanity checking")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--folder", default="TrigRegression")
    ap.add_argument("--chains", type=int, default=1,
                    help="parallel chains (reference is single-chain; 64 "
                         "saturates a TPU chip at ~no extra wall-clock)")
    ap.add_argument("--adapters", type=int, default=1,
                    help="GP-adapter groups: chains split into this many "
                         "groups, each on its own (step size, leapfrog) "
                         "trajectory (must divide --chains)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.metrics import PercentError, SquaredError
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.predictor import Predictor

    start = time.time()

    train_in = np.linspace(-2, 2, num=11)
    val_in = np.linspace(-2 + 2 / 30, 2.0 - 2 / 30, num=30)
    train_out = np.sin(train_in * math.pi * 2) * train_in \
        - np.cos(train_in * math.pi)
    val_out = np.sin(val_in * math.pi * 2) * val_in \
        - np.cos(val_in * math.pi)

    width, hidden = 10, 3
    likelihood = FixedGaussianLikelihood(sd=0.1)
    metrics = [SquaredError(), PercentError()]

    net = Network(jnp.float32, 1, train_in, train_out, val_in, val_out,
                  seed=1000)
    net.add(GaussianDenseLayer(1, width)).add(Tanh())
    for _ in range(hidden - 1):
        net.add(GaussianDenseLayer(width, width)).add(Tanh())
    net.add(GaussianDenseLayer(width, 1))

    if args.smoke:
        net.setup_mcmc(step_size_start=1e-3, step_size_min=1e-4,
                       step_size_max=1e-2, step_size_options=40,
                       leapfrog_start=100, leapfrog_min=20,
                       leapfrog_max=500, leapfrog_increment=5,
                       hyper_step_size=0.001, hyper_leapfrog=30,
                       burnin=200, averaging_steps=10, random_steps=5)
        epochs, sampling = args.epochs or 800, 10
    else:
        # the reference example's config (trainRegression.py:87-109)
        net.setup_mcmc(step_size_start=1e-3, step_size_min=1e-4,
                       step_size_max=1e-2, step_size_options=100,
                       leapfrog_start=1000, leapfrog_min=100,
                       leapfrog_max=10000, leapfrog_increment=10,
                       hyper_step_size=0.001, hyper_leapfrog=100,
                       burnin=1000, averaging_steps=10)
        epochs, sampling = args.epochs or 6001, 10

    result = net.train(epochs, sampling, likelihood, metric_list=metrics,
                       adjust_hypers=True, folder_name=args.folder,
                       networks_per_file=50, n_chains=args.chains,
                       n_adapters=args.adapters,
                       chain_jitter=0.01 if args.chains > 1 else 0.0,
                       display_skip=max(epochs // 20, 1))

    print(f"\nSampled {result.theta_samples.shape[0]} networks; "
          f"mean main acceptance {result.main_accept.mean():.3f}")

    pred = Predictor(args.folder, likelihood=likelihood)
    mean, sd = pred.predict_mean_sd(val_in[:, None])
    rmse = float(np.sqrt(np.mean((mean[:, 0] - val_out) ** 2)))
    print(f"posterior predictive val RMSE: {rmse:.4f}; "
          f"mean predictive sd: {sd.mean():.4f}")
    tau = pred.autocorrelation_length(val_in[:, None], n_max=200)
    print(f"integrated autocorrelation time: {tau:.2f} "
          f"(ESS ~ {pred.n_networks / max(tau, 1e-9):.1f})")
    print("Total time elapsed (seconds):", time.time() - start)


if __name__ == "__main__":
    main()
