"""Large-dataset physics-surrogate regression (BASELINE.json config 5).

A 1M-point synthetic detector-response dataset fit with a Bayesian MLP under
a learned-noise Gaussian likelihood. The full-batch log-likelihood and its
gradient are evaluated every leapfrog step; with a mesh, the batch shards
over the ``data`` axis and the (value, grad) psum rides the ICI.

Run single-chip: python examples/surrogate_regression.py --smoke
Multi-chip:      pass --data-devices N (requires N devices).

Single-chip quality configuration (the measured best for the full
1M-point run, benchmarks/PERF_NOTES.md round 5): ``--chains 32
--data-chunk 125000`` — a 32-chain fleet whose activation HBM is
bounded by exact chunked gradient accumulation, under the default
``numerics="exact"`` preset. Leave ``--precondition`` OFF here: the
cross-chain metric estimate on this MAP-started fleet is either
near-identity (no effect) or corrupted by the adapter's random-phase
exploration (collapses acceptance to 0 — measured, PERF_NOTES round 5);
the identity metric matches the measured stability boundary.
"""

import argparse

import os as _os
import sys as _sys
# runnable from anywhere: the package lives at the repo root
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def detector_response(x, rng):
    """Synthetic smooth nonlinear response with heteroscedastic-ish shape."""
    r = np.sin(x[:, 0] * 2) * np.cos(x[:, 1]) + 0.5 * np.tanh(x[:, 2:].sum(1))
    return (r + 0.05 * rng.normal(size=len(x))).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--data-devices", type=int, default=1)
    ap.add_argument("--chains", type=int, default=1,
                    help="vmapped chains on one chip (try 32)")
    ap.add_argument("--data-chunk", type=int, default=0,
                    help="likelihood rows per chunk (exact accumulation; "
                         "bounds activation HBM for wide fleets)")
    ap.add_argument("--precondition", action="store_true",
                    help="diagonal-metric step preconditioner "
                         "(needs --chains >= 8). Not recommended on "
                         "this target: the cross-chain estimate is "
                         "near-identity or corrupted here (PERF_NOTES "
                         "round 5)")
    ap.add_argument("--default-numerics", action="store_true",
                    help="opt OUT of the numerics='exact' preset (Kahan "
                         "integration + exact-f32 matmuls). Big-data "
                         "posteriors tune their step size into the f32 "
                         "quantization / MXU-staircase regime, where "
                         "default numerics silently stop sampling "
                         "(benchmarks/PERF_NOTES.md round 4)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianDenseLayer, GaussianLikelihood, Tanh
    from tensorbnn_tpu.metrics import SquaredError
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.parallel.mesh import make_mesh

    start = time.time()
    n = args.points if not args.smoke else min(args.points, 100_000)
    d_in, width = 8, 64
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    y = detector_response(x, rng)
    x_val = rng.normal(size=(4096, d_in)).astype(np.float32)
    y_val = detector_response(x_val, rng)

    mesh = None
    n_chains = args.chains
    if args.data_devices > 1:
        n_chain_dev = len(jax.devices()) // args.data_devices
        mesh = make_mesh(n_chain_devices=n_chain_dev,
                         n_data_devices=args.data_devices)
        n_chains = n_chain_dev  # one chain per chain-axis device
        assert n % args.data_devices == 0

    net = Network(jnp.float32, d_in, x, y, x_val, y_val, seed=3)
    net.add(GaussianDenseLayer(d_in, width)).add(Tanh())
    net.add(GaussianDenseLayer(width, width)).add(Tanh())
    net.add(GaussianDenseLayer(width, 1))

    epochs, burnin = (60, 20) if args.smoke else (600, 200)
    net.setup_mcmc(step_size_start=2e-5, step_size_min=1e-6,
                   step_size_max=1e-4, step_size_options=40,
                   leapfrog_start=30, leapfrog_min=10, leapfrog_max=100,
                   leapfrog_increment=5, hyper_step_size=1e-4,
                   hyper_leapfrog=10, burnin=burnin, averaging_steps=10,
                   random_steps=3)
    res = net.train(epochs, 5, GaussianLikelihood(sd=0.05),
                    metric_list=[SquaredError()], mesh=mesh,
                    n_chains=n_chains,
                    # positional jitter collapses acceptance on sharp
                    # big-data posteriors; momenta decorrelate the fleet
                    chain_jitter=0.0,
                    data_chunk=args.data_chunk or None,
                    precondition=args.precondition,
                    numerics=("default" if args.default_numerics
                              else "exact"),
                    display_skip=max(epochs // 5, 1))

    print(f"\n{res.theta_samples.shape[0]} samples, "
          f"main accept {res.main_accept.mean():.3f}, "
          f"learned sd ~ {float(np.mean(res.eta_samples[:, :, -1] ** 2)):.4f}"
          if res.theta_samples.size else "no samples")
    print("Total time elapsed (seconds):", time.time() - start)


if __name__ == "__main__":
    main()
