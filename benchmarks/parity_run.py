"""Executable parity dossier: our side of the measured-TF comparison.

docs/parity.md §4 defines the ±2% acceptance-parity recipe against a
tensorflow_probability-capable environment. This script produces the
tensorbnn_tpu side of that comparison in one command: N seeds of the
reference's bundled regression configuration
(/root/reference/Examples/trainRegression.py:33-109 — 3x10 tanh,
FixedGaussianLikelihood(sd=0.1), 6001 epochs, burn-in 1000, sample every
10, GP-UCB + dual-averaging adaptation), reporting per-seed and pooled
post-burn-in acceptance, predictive RMSE at the train points, and the
ensemble's integrated autocorrelation time.

Prints ONE JSON line. A TF-capable environment runs the reference's own
script over the same number of seeds and compares means per the recipe
(main acceptance within 0.02; hyper acceptance inside our 0.95 +/- 0.15
dual-averaging band).

Usage: python benchmarks/parity_run.py [--seeds N] [--smoke]
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def one_seed(seed: int, epochs: int, burnin: int):
    import jax.numpy as jnp

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.utils.autocorr import integrated_time

    # the reference example's exact data and architecture
    train_in = np.linspace(-2, 2, num=11)
    target = (np.sin(train_in * math.pi * 2) * train_in
              - np.cos(train_in * math.pi))
    net = Network(jnp.float32, 1, train_in, target, train_in, target,
                  seed=seed)
    net.add(GaussianDenseLayer(1, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 1))
    # trainRegression.py:85-101's setupMCMC arguments
    net.setup_mcmc(step_size_start=1e-3, step_size_min=1e-4,
                   step_size_max=1e-2, step_size_options=100,
                   leapfrog_start=1000, leapfrog_min=100,
                   leapfrog_max=10000, leapfrog_increment=1,
                   hyper_step_size=1e-2, hyper_leapfrog=100,
                   burnin=burnin, averaging_steps=10, random_steps=10)
    t0 = time.perf_counter()
    res = net.train(epochs, 10, FixedGaussianLikelihood(sd=0.1),
                    verbose=False)
    dt = time.perf_counter() - t0

    import jax
    from tensorbnn_tpu.sampler.potential import flatten_state
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers, {})
    xq = jnp.asarray(train_in[:, None], jnp.float32)
    preds = np.asarray(jax.jit(jax.vmap(
        lambda th: net.model.apply(flat.unravel_theta(th), xq)[:, 0]))(
        jnp.asarray(res.theta_pooled)))
    rmse = float(np.sqrt(np.mean((preds.mean(axis=0) - target) ** 2)))
    tau = float(integrated_time(preds.mean(axis=1), quiet=True))
    out = {
        "seed": seed,
        "main_accept": round(float(res.main_accept[burnin:].mean()), 4),
        "hyper_accept": round(float(res.hyper_accept[burnin:].mean()), 4),
        "predictive_rmse": round(rmse, 4),
        "tau": round(tau, 3),
        "n_networks": int(preds.shape[0]),
        "wall_seconds": round(dt, 1),
    }
    log(f"seed {seed}: {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--smoke", action="store_true",
                    help="short config for CI-style validation")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the JSON artifact to this path "
                         "(machine-readable comparison target for the "
                         "TF-side recipe), flushed after every seed so an "
                         "interrupted capture still leaves a valid file")
    ap.add_argument("--resume", action="store_true",
                    help="load --out if it exists and run only the seeds "
                         "it does not already contain (a timed-out 10-seed "
                         "capture continues where it stopped; each full "
                         "seed is ~12 min of TPU wall)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    epochs, burnin = (801, 200) if args.smoke else (6001, 1000)

    def artifact(runs):
        main_acc = [r["main_accept"] for r in runs]
        hyper_acc = [r["hyper_accept"] for r in runs]
        return {
            "metric": f"acceptance-parity dossier ({len(runs)} seeds, "
                      f"reference trainRegression config, {epochs} epochs)",
            "value": round(float(np.mean(main_acc)), 4),
            "unit": "mean post-burn-in main acceptance",
            "main_accept_mean": round(float(np.mean(main_acc)), 4),
            "main_accept_sd": round(float(np.std(main_acc)), 4),
            "hyper_accept_mean": round(float(np.mean(hyper_acc)), 4),
            "hyper_accept_sd": round(float(np.std(hyper_acc)), 4),
            "hyper_in_da_band": bool(abs(np.mean(hyper_acc) - 0.95) < 0.15),
            "predictive_rmse_mean": round(float(np.mean(
                [r["predictive_rmse"] for r in runs])), 4),
            "per_seed": runs,
            "recipe": "docs/parity.md section 4: run the reference's "
                      "Examples/trainRegression.py over the same seeds in a "
                      "tensorflow_probability environment and compare means "
                      "(main within 0.02; hyper inside 0.95 +/- 0.15)",
        }

    runs = []
    done = set()
    if args.resume and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        runs = list(prior.get("per_seed", []))
        done = {int(r["seed"]) for r in runs}
        log(f"resume: {len(done)} seeds already in {args.out}: "
            f"{sorted(done)}")
    for s in range(args.seeds):
        if s in done:
            continue
        runs.append(one_seed(s, epochs, burnin))
        if args.out:
            tmp = args.out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(artifact(runs), f, indent=1)
            os.replace(tmp, args.out)
    print(json.dumps(artifact(runs)))


if __name__ == "__main__":
    main()
