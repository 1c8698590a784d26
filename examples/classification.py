"""Binary classification example with a Bernoulli likelihood.

TPU-native counterpart of the reference's classification tutorial
(docs/ClassificationExample.md: MNIST 3-vs-8 with SquarePrelu activations, a
sigmoid head, Bernoulli likelihood, accuracy/percent-error metrics). This
environment has no dataset egress, so a synthetic two-moons task stands in —
the model/likelihood/metric stack is identical.
"""

import argparse

import os as _os
import sys as _sys
# runnable from anywhere: the package lives at the repo root
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def two_moons(n, noise=0.15, seed=0):
    rng = np.random.default_rng(seed)
    n2 = n // 2
    t = rng.uniform(0, np.pi, n2)
    a = np.stack([np.cos(t), np.sin(t)], 1)
    b = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1)
    x = np.concatenate([a, b]) + rng.normal(0, noise, (2 * n2, 2))
    y = np.concatenate([np.zeros(n2), np.ones(n2)])
    perm = rng.permutation(len(x))
    return x[perm].astype(np.float32), y[perm].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--folder", default="MoonsClassification")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tensorbnn_tpu import BernoulliLikelihood, GaussianDenseLayer, \
        Sigmoid, SquarePrelu
    from tensorbnn_tpu.metrics import Accuracy
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.predictor import Predictor
    from tensorbnn_tpu.training.pretrain import dense_warm_start, \
        squareprelu_warm_start, train_basic_classification

    start = time.time()
    x_train, y_train = two_moons(200, seed=0)
    x_val, y_val = two_moons(100, seed=1)

    width, hidden = 16, 2
    cycles, pre_epochs = (1, 30) if args.smoke else (2, 80)

    # pretraining returns all three warm starts; train_slopes=True makes the
    # activation slope vectors genuinely trained (reference
    # BNN_functions.py:166-180 contract, ClassificationExample.md:68-126)
    weights, biases, activations = train_basic_classification(
        hidden, 2, 1, width, cycles, pre_epochs, alpha=0.1,
        train_in=x_train, train_out=y_train,
        val_in=x_val, val_out=y_val, train_slopes=True)

    net = Network(jnp.float32, 2, x_train, y_train, x_val, y_val, seed=42)
    net.add(GaussianDenseLayer(2, width),
            parameters=dense_warm_start(weights, biases, 0))
    net.add(SquarePrelu(width, alpha=0.55),
            parameters=squareprelu_warm_start(activations, 0))
    net.add(GaussianDenseLayer(width, width),
            parameters=dense_warm_start(weights, biases, 1))
    net.add(SquarePrelu(width, alpha=0.55),
            parameters=squareprelu_warm_start(activations, 1))
    net.add(GaussianDenseLayer(width, 1),
            parameters=dense_warm_start(weights, biases, 2))
    net.add(Sigmoid())

    if args.smoke:
        net.setup_mcmc(step_size_start=5e-4, step_size_min=1e-5,
                       step_size_max=5e-3, step_size_options=40,
                       leapfrog_start=50, leapfrog_min=10,
                       leapfrog_max=200, leapfrog_increment=5,
                       hyper_step_size=0.001, hyper_leapfrog=30,
                       burnin=150, averaging_steps=10, random_steps=4)
        epochs = 500
    else:
        net.setup_mcmc(step_size_start=5e-4, step_size_min=1e-5,
                       step_size_max=5e-3, step_size_options=100,
                       leapfrog_start=500, leapfrog_min=50,
                       leapfrog_max=2000, leapfrog_increment=10,
                       hyper_step_size=0.001, hyper_leapfrog=100,
                       burnin=1000, averaging_steps=10)
        epochs = 4000

    likelihood = BernoulliLikelihood()
    net.train(epochs, 10, likelihood,
              metric_list=[Accuracy()],
              adjust_hypers=True, folder_name=args.folder,
              networks_per_file=50, display_skip=max(epochs // 10, 1))

    pred = Predictor(args.folder, likelihood=likelihood)
    probs = pred.predict(x_val, n=1).mean(axis=0)[:, 0]
    acc = float(np.mean((probs > 0.5) == (y_val > 0.5)))
    print(f"posterior-ensemble validation accuracy: {acc:.3f}")
    print("Total time elapsed (seconds):", time.time() - start)


if __name__ == "__main__":
    main()
