"""Real-data binary classification: digits 3-vs-8.

The reference's classification acceptance spec is MNIST 3-vs-8 with
pretraining -> SquarePrelu/sigmoid BNN -> 2500-epoch HMC
(/root/reference/docs/ClassificationExample.md:40-163). This environment
has no dataset egress, so MNIST itself cannot be downloaded; scikit-learn's
bundled 8x8 handwritten-digit scans (1,797 images, the classic UCI
optdigits test set) are the same task on real image data. This example
mirrors the tutorial step for step on those digits:

* select classes 3 and 8, relabel {0, 1}, scale pixels to [0, 1]
  (ClassificationExample.md:44-58; MNIST divides by 256, these 4-bit
  pixels divide by 16);
* 80-20 train/validation split with ``random_state=21`` (md:60-64);
* Keras-style pretraining with 2 hidden layers of width 20, leaky-relu
  slope 0.1, lr-decade cycles (md:68-84 -> training/pretrain.py);
* BNN: Dense(warm-started) + SquarePrelu(alpha=sqrt(0.1)) x2, Dense +
  Sigmoid head (md:85-146);
* ``setupMCMC`` with the tutorial's exact parameters (md:149-163) and a
  2500-epoch training run saving every 10th network, 25 per file
  (md:150-157), Bernoulli likelihood, accuracy metric.

The reference warns this config takes "several hours ... to several days"
(md:174); see benchmarks/PERF_NOTES.md for the measured wall time here.
"""

import argparse
import os as _os
import sys as _sys

# runnable from anywhere: the package lives at the repo root
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import time

import numpy as np


def digits_3v8():
    try:
        from sklearn.datasets import load_digits
        from sklearn.model_selection import train_test_split
    except ImportError as e:  # keep the package scikit-learn-free
        raise SystemExit(
            "this example needs scikit-learn for its bundled digits "
            "dataset; examples/classification.py is the dependency-free "
            "synthetic variant") from e

    d = load_digits()
    mask = np.isin(d.target, (3, 8))
    x = (d.data[mask] / 16.0).astype(np.float32)   # 4-bit pixels -> [0, 1]
    y = (d.target[mask] == 8).astype(np.float32)   # 3 -> 0, 8 -> 1
    return train_test_split(x, y, test_size=0.20, random_state=21)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="shortened config for CI-style runs")
    ap.add_argument("--folder", default="DigitsBNN")
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
    x_train, x_val, y_train, y_val = digits_3v8()
    input_dims = x_train.shape[1]                  # 64 pixels
    width, hidden = 20, 2                          # md:91-94
    alpha = 0.1                                    # leaky-relu/SquarePrelu

    cycles, pre_epochs = (1, 10) if args.smoke else (3, 10)
    weights, biases, activations = train_basic_classification(
        hidden, input_dims, 1, width, cycles, pre_epochs, alpha=alpha,
        train_in=x_train, train_out=y_train,
        val_in=x_val, val_out=y_val, train_slopes=True,
        callbacks=True, patience=10)

    net = Network(jnp.float32, input_dims, x_train, y_train,
                  x_val, y_val, seed=0)
    net.add(GaussianDenseLayer(input_dims, width),
            parameters=dense_warm_start(weights, biases, 0))
    net.add(SquarePrelu(width, alpha=alpha ** 0.5),
            parameters=squareprelu_warm_start(activations, 0))
    for n in range(hidden - 1):
        net.add(GaussianDenseLayer(width, width),
                parameters=dense_warm_start(weights, biases, n + 1))
        net.add(SquarePrelu(width, alpha=alpha ** 0.5),
                parameters=squareprelu_warm_start(activations, n + 1))
    net.add(GaussianDenseLayer(width, 1),
            parameters=dense_warm_start(weights, biases, -1))
    net.add(Sigmoid())

    if args.smoke:
        net.setup_mcmc(step_size_start=0.001, step_size_min=0.0005,
                       step_size_max=0.002, step_size_options=20,
                       leapfrog_start=50, leapfrog_min=10,
                       leapfrog_max=200, leapfrog_increment=5,
                       hyper_step_size=1e-5, hyper_leapfrog=30,
                       burnin=50, averaging_steps=2, random_steps=4)
        epochs = 300
    else:
        # the tutorial's exact setupMCMC arguments (md:149-163)
        net.setup_mcmc(step_size_start=0.001, step_size_min=0.0005,
                       step_size_max=0.002, step_size_options=100,
                       leapfrog_start=500, leapfrog_min=100,
                       leapfrog_max=2000, leapfrog_increment=1,
                       hyper_step_size=1e-5, hyper_leapfrog=30,
                       burnin=50, averaging_steps=2)
        epochs = 2500

    likelihood = BernoulliLikelihood()
    # Accuracy only: PercentError divides by the raw {0,1} labels and is
    # non-finite on the 0 class (kept reference quirk, metrics.py)
    net.train(epochs, 10, likelihood,
              metric_list=[Accuracy()],
              adjust_hypers=True, folder_name=args.folder,
              networks_per_file=25, display_skip=max(epochs // 10, 1))

    pred = Predictor(args.folder, likelihood=likelihood)
    probs = pred.predict(x_val, n=1).mean(axis=0)[:, 0]
    acc = float(np.mean((probs > 0.5) == (y_val > 0.5)))
    print(f"posterior-ensemble validation accuracy: {acc:.3f} "
          f"({len(y_val)} held-out digits)")
    print("Total time elapsed (seconds):", time.time() - start)


if __name__ == "__main__":
    main()
