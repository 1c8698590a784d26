"""Benchmark suite for the BASELINE.json configurations.

Each benchmark prints one JSON line. The repo-root ``bench.py`` is the
headline (trainRegression config); this suite covers the scale-out configs:

* ``wide_deep``  — 10 layers x 256 MLP, 64 vmapped chains on one chip
  (BASELINE.json config 4); reports leapfrog steps/sec and effective
  TFLOP/s through the MXU. ``wide_deep_bf16`` re-measures at batch 1024
  in bfloat16 vs float32 (round-1 PERF_NOTES gap 2).
* ``surrogate``  — 1M-point synthetic detector-response regression,
  full-batch likelihood (BASELINE.json config 5); single-chip here, the
  data-parallel multi-chip path is exercised by ``__graft_entry__.
  dryrun_multichip`` and tests/test_parallel.py. ``surrogate_quality``
  runs the same config through the full adaptive driver so acceptance
  lands in a healthy band and reports ESS/sec (the BASELINE metric is
  steps/sec *at equal ESS*; round-1 PERF_NOTES gap 4).
* ``classification`` — the reference's classification stack (SquarePrelu +
  sigmoid + Bernoulli, docs/ClassificationExample.md) with 64 chains,
  fused Pallas potential vs XLA.

Usage: python benchmarks/run_benchmarks.py
       [wide_deep|wide_deep_bf16|surrogate|surrogate_quality|
        surrogate_eps_ladder|classification|ess|all]
"""

import json
import os
import sys
import time

import numpy as np

# runnable from anywhere: the package lives at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --out FILE: flush the (possibly partial) result object to FILE as each
# row lands. Long TPU sweeps run for many minutes through the axon tunnel;
# if the process dies (session end, relay outage, worker kill) a buffered
# stdout JSON line is lost with it — the artifact file is not. Parsed and
# stripped from argv by main().
_OUT = None


def emit(obj, final=True):
    """Write ``obj`` to the --out artifact (if any); print on final."""
    if _OUT:
        tmp = _OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
            f.write("\n")
        os.replace(tmp, _OUT)
    if final:
        print(json.dumps(obj), flush=True)


def _bench_sampler(model, x, y, *, n_chains, leapfrog, hyper_leapfrog,
                   chunk, n_chunks, seed=0, jitter=0.01, step_size=1e-4,
                   state_layout="flat", dtype=None, likelihood=None,
                   use_fused=False):
    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianLikelihood
    from tensorbnn_tpu.parallel.chains import (
        init_multichain_state,
        make_multichain_chunk_runner,
    )
    from tensorbnn_tpu.sampler.potential import flatten_state

    dtype = dtype or jnp.float32
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    likelihood = likelihood or GaussianLikelihood(sd=0.1)
    params, hypers = model.init(jax.random.key(seed), dtype=dtype)
    flat = flatten_state(params, hypers, likelihood.init_hypers(dtype))

    batched_main_vg = None
    batched_main_traj = None
    if use_fused == "traj":
        from tensorbnn_tpu.ops.fused_mlp import try_build_fused_trajectory
        batched_main_traj = try_build_fused_trajectory(
            model, likelihood, flat.unravel_theta, flat.unravel_eta,
            x, y, eta_dim=flat.eta.size, block_c=min(n_chains, 512),
            interpret=jax.default_backend() != "tpu")
        if batched_main_traj is None:
            raise RuntimeError("trajectory kernel did not match")
    elif use_fused:
        from tensorbnn_tpu.ops.fused_mlp import try_build_fused_main_vg
        batched_main_vg = try_build_fused_main_vg(
            model, likelihood, flat.unravel_theta, flat.unravel_eta,
            x, y, eta_dim=flat.eta.size, block_c=min(n_chains, 512),
            interpret=jax.default_backend() != "tpu")
        if batched_main_vg is None:
            raise RuntimeError("fused kernel did not match this config")

    run = make_multichain_chunk_runner(
        model, likelihood, x, y, flat.unravel_theta, flat.unravel_eta,
        adjust_hypers=True, hyper_leapfrog=hyper_leapfrog, burnin=1e9,
        hyper_step_size_init=1e-4, mesh=None, donate=False,
        state_layout=state_layout, batched_main_vg=batched_main_vg,
        batched_main_traj=batched_main_traj)

    carry = init_multichain_state(flat.theta, flat.eta,
                                  jax.random.key(seed + 1), 1e-4,
                                  n_chains, jitter=jitter)
    eps = jnp.asarray(step_size, jnp.float32)
    L = jnp.asarray(leapfrog, jnp.int32)

    carry, _ = run(carry, x, y, eps, L, chunk)       # compile
    float(jnp.sum(carry.theta))             # materialize

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        carry, trace = run(carry, x, y, eps, L, chunk)
    float(jnp.sum(carry.theta))
    dt = time.perf_counter() - t0
    steps = n_chunks * chunk * leapfrog * n_chains
    acc = float(np.asarray(trace.main_accept).mean())
    return steps, dt, acc, flat.theta.size


def bench_wide_deep():
    import jax
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.models.sequential import Sequential

    width, depth, batch, n_chains = 256, 10, 128, 64
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, width)).astype(np.float32)
    y = rng.normal(size=(batch, 1)).astype(np.float32)

    layers = []
    for i in range(depth - 1):
        layers += [GaussianDenseLayer(width, width), Tanh()]
    layers += [GaussianDenseLayer(width, 1)]
    model = Sequential(layers)

    leapfrog = 20
    steps, dt, acc, n_params = _bench_sampler(
        model, x, y, n_chains=n_chains, leapfrog=leapfrog,
        hyper_leapfrog=5, chunk=5, n_chunks=3, step_size=1e-5,
        state_layout="tree")  # the driver's auto choice for 592k params

    rate = steps / dt
    # forward ~2*B*W^2 per hidden layer; grad ~3x forward
    flops_per_step = 6 * batch * width * width * (depth - 1) * n_chains
    tflops = flops_per_step * (steps / n_chains) / dt / 1e12
    log(f"wide_deep: {steps} steps in {dt:.2f}s, accept {acc:.3f}, "
        f"{n_params} params/chain, ~{tflops:.2f} TFLOP/s")
    emit({
        "metric": "wide_deep leapfrog steps/sec/chip "
                  "(10x256 MLP, 64 chains)",
        "value": round(rate, 1),
        "unit": "leapfrog steps/sec",
        "approx_tflops": round(tflops, 2),
        "mean_accept": round(acc, 4),
        "potential": "xla-tree",
    })


def bench_wide_deep_bf16(batches=(128, 1024, 4096)):
    """Wide-deep efficiency diagnosis (VERDICT round-2 #4): batch x dtype
    sweep on the 10x256 config.

    Two quantities explain the "28% of f32 peak" observation: (a) the
    leapfrog *state* traffic — theta/momentum/gradient are (64, 592k) f32
    = 151MB each, and every leapfrog step must stream several passes of
    them regardless of batch size (a fixed per-step cost the batch
    amortizes); (b) the activation/cast traffic of the round-2 bf16 path,
    which cast every plane back to f32 per matmul. Fitting
    t_iter = a + b*batch across the sweep separates the fixed state cost
    ``a`` from the per-row matmul cost ``b``; bf16 end-to-end activations
    (round-3 _DenseCompute) should now cut ``b`` roughly in half at
    MXU-bound batch sizes.
    """
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.models.sequential import Sequential

    width, depth, n_chains = 256, 10, 64
    rng = np.random.default_rng(0)
    results = {}
    for batch in batches:
        x = rng.normal(size=(batch, width)).astype(np.float32)
        y = rng.normal(size=(batch, 1)).astype(np.float32)
        for cd in (None, "bfloat16"):
            layers = []
            for i in range(depth - 1):
                layers += [GaussianDenseLayer(width, width,
                                              compute_dtype=cd), Tanh()]
            layers += [GaussianDenseLayer(width, 1, compute_dtype=cd)]
            model = Sequential(layers)
            steps, dt, acc, n_params = _bench_sampler(
                model, x, y, n_chains=n_chains, leapfrog=20,
                hyper_leapfrog=5, chunk=5, n_chunks=3, step_size=1e-5,
                state_layout="tree")
            rate = steps / dt
            # one "iteration" = one leapfrog step of all 64 chains
            ms_per_iter = 1e3 * dt / (steps / n_chains)
            results[(batch, cd or "float32")] = (rate, ms_per_iter)
            log(f"wide_deep batch={batch} "
                f"compute_dtype={cd or 'float32'}: {rate:,.0f} steps/sec "
                f"({ms_per_iter:.2f} ms/iter)")

    # fixed-vs-batch-linear split from the two extreme f32 points
    b_lo, b_hi = min(batches), max(batches)
    t_lo = results[(b_lo, "float32")][1]
    t_hi = results[(b_hi, "float32")][1]
    per_row_ms = (t_hi - t_lo) / (b_hi - b_lo)
    fixed_ms = t_lo - b_lo * per_row_ms
    speedups = {b: round(results[(b, "bfloat16")][0]
                         / results[(b, "float32")][0], 3)
                for b in batches}
    log(f"fixed per-iter cost ~{fixed_ms:.2f} ms "
        f"(state streaming) + {1e3 * per_row_ms:.2f} us/row; "
        f"bf16 speedups {speedups}")
    emit({
        "metric": "wide_deep bf16-vs-f32 leapfrog steps/sec "
                  f"(10x256 MLP, batch sweep {list(batches)}, 64 chains)",
        "value": round(results[(max(batches), "bfloat16")][0], 1),
        "unit": "leapfrog steps/sec",
        "bf16_speedup_by_batch": speedups,
        "f32_ms_per_iter_by_batch": {
            b: round(results[(b, "float32")][1], 3) for b in batches},
        "bf16_ms_per_iter_by_batch": {
            b: round(results[(b, "bfloat16")][1], 3) for b in batches},
        "fixed_ms_per_iter_f32": round(fixed_ms, 3),
        "us_per_row_f32": round(1e3 * per_row_ms, 3),
        "potential": "xla-tree",
    })


def bench_classification():
    """The reference's classification stack (SquarePrelu + sigmoid +
    Bernoulli, docs/ClassificationExample.md:110-163) at 64 chains —
    fused Pallas potential vs XLA (VERDICT round-1 #4)."""
    import jax

    from tensorbnn_tpu import BernoulliLikelihood, GaussianDenseLayer, \
        Sigmoid, SquarePrelu
    from tensorbnn_tpu.models.sequential import Sequential

    # (width, n_data) chosen so the fused kernel's VMEM working set fits
    # (the kernel targets small-data many-chain configs; big data goes to
    # XLA); chains set to a full 128-lane block
    width, n_data, n_chains = 16, 64, 128
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n_data, 10)).astype(np.float32)
    y = (x.sum(axis=1) > 0).astype(np.float32)
    model = Sequential([
        GaussianDenseLayer(10, width), SquarePrelu(width),
        GaussianDenseLayer(width, width), SquarePrelu(width),
        GaussianDenseLayer(width, 1), Sigmoid(),
    ])

    on_tpu = jax.default_backend() == "tpu"
    rates = {}
    for mode in (("traj", True, False) if on_tpu else (False,)):
        name = {True: "fused", False: "xla", "traj": "trajectory"}[mode]
        try:
            steps, dt, acc, _ = _bench_sampler(
                model, x, y, n_chains=n_chains, leapfrog=50,
                hyper_leapfrog=10, chunk=10, n_chunks=5, step_size=5e-4,
                likelihood=BernoulliLikelihood(), use_fused=mode)
        except RuntimeError as e:
            log(f"classification {name}: skipped ({e})")
            continue
        rates[name] = steps / dt
        log(f"classification {name}: "
            f"{steps / dt:,.0f} steps/sec, accept {acc:.3f}")

    from tensorbnn_tpu.ops.fused_mlp import _model_program, fused_profitable
    ops, _ = _model_program(model, BernoulliLikelihood())
    auto_pick = "fused" if fused_profitable(ops, n_data) else "xla"
    best = max(rates, key=rates.get)
    emit({
        "metric": "classification leapfrog steps/sec/chip "
                  f"(SquarePrelu+sigmoid+Bernoulli, 3x{width} MLP, "
                  f"{n_chains} chains)",
        "value": round(rates[best], 1),
        "unit": "leapfrog steps/sec",
        "potential": best,
        "driver_auto_picks": auto_pick,
        **({"xla_value": round(rates["xla"], 1),
            "fused_speedup": round(rates["fused"] / rates["xla"], 3)}
           if "fused" in rates and "xla" in rates else {}),
    })


def bench_multiclass():
    """Multiclass classification (Softmax head + CategoricalLikelihood,
    new beyond the reference's binary path) at a tiny latency-bound
    shape: trajectory kernel vs XLA."""
    import jax

    from tensorbnn_tpu import CategoricalLikelihood, GaussianDenseLayer, \
        Softmax, Tanh
    from tensorbnn_tpu.models.sequential import Sequential

    k, width, n_data, n_chains = 3, 8, 16, 128
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n_data, 2)).astype(np.float32)
    y = rng.integers(0, k, size=n_data).astype(np.float32)
    model = Sequential([GaussianDenseLayer(2, width), Tanh(),
                        GaussianDenseLayer(width, k), Softmax()])

    on_tpu = jax.default_backend() == "tpu"
    rates = {}
    for mode in (("traj", False) if on_tpu else (False,)):
        name = {False: "xla", "traj": "trajectory"}[mode]
        try:
            steps, dt, acc, _ = _bench_sampler(
                model, x, y, n_chains=n_chains, leapfrog=20,
                hyper_leapfrog=5, chunk=10, n_chunks=5, step_size=1e-2,
                likelihood=CategoricalLikelihood(), use_fused=mode)
        except RuntimeError as e:
            log(f"multiclass {name}: skipped ({e})")
            continue
        rates[name] = steps / dt
        log(f"multiclass {name}: "
            f"{steps / dt:,.0f} steps/sec, accept {acc:.3f}")

    best = max(rates, key=rates.get)
    emit({
        "metric": "multiclass leapfrog steps/sec/chip "
                  f"(Softmax+Categorical, {k} classes, {n_chains} chains)",
        "value": round(rates[best], 1),
        "unit": "leapfrog steps/sec",
        "potential": best,
        **({"xla_value": round(rates["xla"], 1),
            "trajectory_speedup": round(
                rates["trajectory"] / rates["xla"], 3)}
           if "trajectory" in rates and "xla" in rates else {}),
    })


def bench_surrogate():
    import jax
    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.models.sequential import Sequential

    n_points, d_in, width = 1_000_000, 8, 64
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n_points, d_in)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)

    model = Sequential([
        GaussianDenseLayer(d_in, width), Tanh(),
        GaussianDenseLayer(width, width), Tanh(),
        GaussianDenseLayer(width, 1),
    ])

    leapfrog = 10
    steps, dt, acc, n_params = _bench_sampler(
        model, x, y, n_chains=1, leapfrog=leapfrog, hyper_leapfrog=2,
        chunk=2, n_chunks=3, jitter=0.0, step_size=1e-6,
        state_layout="tree")

    rate = steps / dt
    grad_evals_per_sec = rate  # 1 chain: steps == grad evals
    points_per_sec = grad_evals_per_sec * n_points
    log(f"surrogate: {steps} full-batch leapfrog steps over 1M points in "
        f"{dt:.2f}s, accept {acc:.3f}")
    emit({
        "metric": "surrogate full-data leapfrog steps/sec "
                  "(1M-point likelihood, single chip)",
        "value": round(rate, 2),
        "unit": "leapfrog steps/sec",
        "likelihood_point_grads_per_sec": round(points_per_sec, 0),
        "mean_accept": round(acc, 4),
        "potential": "xla-tree",
    })


def _surrogate_net(matmul_precision=None, n_points: int = 1_000_000,
                   pretrain_epochs: int = 4):
    """Builds the 1M-point surrogate posterior shared by the quality and
    eps-ladder benches: synthetic detector-response data (BASELINE.json
    config 5), MAP warm start via big-batch pretrain, 3-layer width-64
    tanh network. Returns ``(net, x, y)`` with ``x``/``y`` as host numpy.

    ``matmul_precision="highest"`` removes the MXU default-precision
    staircase: TPU's default f32 matmul rounds operands to bf16, so at
    this posterior's eps (~1e-8 against bf16-ulp(|theta|) ~ 4e-4) the
    evaluated density is locally piecewise-constant in theta with
    O(nats) jumps at weight rounding boundaries — a ΔH pseudo-noise
    floor the MH test pays regardless of integrator accuracy
    (diagnosed by ``potential_noise``; PERF_NOTES round 4).

    ``n_points``/``pretrain_epochs`` exist so tests can smoke the wiring
    at toy scale; benchmarks use the defaults.
    """
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianDenseLayer, Tanh
    from tensorbnn_tpu.network import Network

    d_in, width = 8, 64
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n_points, d_in)).astype(np.float32)
    y = (np.sin(x.sum(axis=1)) + 0.1 * rng.normal(
        size=n_points)).astype(np.float32)

    # MAP warm start (big-batch pretrain on TPU) so burn-in starts near the
    # mode and the adapter's step search is about curvature, not transit
    from tensorbnn_tpu.training.pretrain import dense_warm_start, \
        train_basic_regression
    # the MAP pretrain is bit-deterministic for a fixed config (attempt
    # 2/3 of the round-5 grid capture reproduced identical sampling
    # trajectories from independently-run pretrains), so the full-scale
    # benches cache it on disk: each wedge-kill-resume and each bench in
    # a campaign would otherwise re-pay ~10 min of remote compiles +
    # ~500 tunnel dispatches for the exact same weights
    cache_file = None
    if n_points == 1_000_000:
        cache_file = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "captures",
            f"surrogate_pretrain_e{pretrain_epochs}.npz")
    if cache_file and os.path.exists(cache_file):
        z = np.load(cache_file)
        n_l = int(z["n_layers"])
        w = [z[f"w{i}"] for i in range(n_l)]
        b = [z[f"b{i}"] for i in range(n_l)]
        log(f"surrogate: pretrain warm start loaded from {cache_file}")
    else:
        log("surrogate: data built, pretraining (silent, remote "
            "compiles + ~500 tunnel dispatches — takes minutes)...")
        w, b, _ = train_basic_regression(
            2, d_in, 1, width, cycles=1, epochs=pretrain_epochs, alpha=0.1,
            train_in=x, train_out=y, val_in=x[:4096], val_out=y[:4096],
            batch_size=min(8192, n_points), callbacks=False,
            hidden_activation="tanh")
        if cache_file:
            arrs = {f"w{i}": np.asarray(a) for i, a in enumerate(w)}
            arrs.update({f"b{i}": np.asarray(a) for i, a in enumerate(b)})
            np.savez(cache_file, n_layers=len(w), **arrs)

    net = Network(jnp.float32, d_in, x, y, x[:256], y[:256], seed=3)
    net.add(GaussianDenseLayer(d_in, width,
                               matmul_precision=matmul_precision),
            parameters=dense_warm_start(w, b, 0)).add(Tanh())
    net.add(GaussianDenseLayer(width, width,
                               matmul_precision=matmul_precision),
            parameters=dense_warm_start(w, b, 1)).add(Tanh())
    net.add(GaussianDenseLayer(width, 1,
                               matmul_precision=matmul_precision),
            parameters=dense_warm_start(w, b, 2))
    return net, x, y


def bench_surrogate_quality(n_chains: int = 32, precondition: bool = False,
                            windows: int = 1, clip=(1e-2, 1e2),
                            uturn: bool = False,
                            uturn_probe: str = "always",
                            compensated: bool = False,
                            matmul_precision=None,
                            numerics: str = "default",
                            eps_max_override=None,
                            leapfrog_max_override=None,
                            uturn_step_start=None,
                            epochs_override=None):
    """The surrogate config as a *posterior*, not just a throughput number
    (round-1 PERF_NOTES gap 4): run the full adaptive driver with a step
    grid at the ~1e-7 scale this 1M-point target needs, assert acceptance
    lands in a healthy band, and report ESS/sec of a predictive summary.

    ``n_chains`` vmapped chains share the full-batch likelihood (VERDICT
    round-2 #2 — the chains lever was never applied here). Every chain
    starts at the MAP with no positional jitter: on a 1M-point posterior
    the mode is so sharp that even 0.01-sd jitter collapses acceptance to
    ~0.07 (measured round 3); per-chain momentum draws decorrelate the
    fleet instead. HBM budget at width 64 over 1M points: un-chunked, each
    stored forward plane is C x 1M x 64 f32 = 256MB x C and the backward
    pass keeps ~2 tanh activations live, capping one 16GB chip at ~16
    chains (measured: 16 chains ~ 9.4GB). ``data_chunk=125_000`` bounds
    activations to C x chunk x 64 x ~2.5 planes via exact chunked
    gradient accumulation (sampler/potential.py), which is what lets the
    chain fleet scale past the un-chunked ceiling (probe at 64 chains:
    fits, 6.5ms per chain-leapfrog incl. ~1.6x remat overhead).

    Config rationale (measured round 3): this posterior is compute-bound
    per leapfrog (4.1ms/chain-step un-chunked), so
    ESS/sec ~ C / (tau * thinning * (fixed + C*L*step_cost)) — once C
    amortizes the ~1s/epoch fixed cost, quality throughput is set by
    tau*L, NOT by more chains. The GP adapter maximizes SJD/sqrt(L),
    which happily buys 50-step sweeps whose wall cost dwarfs their
    mixing gain (L=50 run: 1137s for 161 ESS); capping the grid at
    L<=15 keeps it in the short-trajectory regime where round-2 runs
    measured tau ~ 1-2.
    """
    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianLikelihood
    from tensorbnn_tpu.sampler.potential import flatten_state

    if numerics == "exact":
        # the driver's single-switch preset (compensated + exact-f32
        # matmuls); mirrored into the local flags so the grid-ceiling
        # logic and the emitted config echo stay truthful
        compensated = True
        matmul_precision = "highest"

    net, x, y = _surrogate_net(matmul_precision)
    burnin = 200
    # step grid capped at 1e-6: the GP adapter maximizes SJD, whose
    # optimum on this target sits at eps ~ 2e-6 with acceptance ~ 0.05
    # (measured) — rare huge jumps. Capping the grid pins the adapter in
    # the calibrated-acceptance regime the bench asserts on (the
    # reference's users tune these grids the same way). The 2e-5
    # preconditioned ceiling dates from the round-3 staircase-corrupted
    # kernels; the round-5 identity-metric capture showed the real
    # ceiling raise came from the exact-numerics fix, not the metric
    # (PERF_NOTES round 5), so these two legacy values only apply to
    # non-exact numerics
    eps_max = 2e-5 if precondition else 1e-6
    if (compensated and matmul_precision == "highest"
            and eps_max_override is None):
        # full-numerics default: the fixed-eps ladder measured the
        # exact-numerics stability boundary in [5e-5, 8e-5) with 5e-5 the
        # sweet spot (accept 0.49, 3.3x the SJD of the binding 2e-5
        # ceiling — benchmarks/captures/r4_surr_eps_ladder.json, VERDICT
        # round-4 #3). The 2e-5 ceiling was calibrated on the
        # staircase-corrupted kernels and binds the exact-numerics runs
        # at acceptance 0.95+. The boundary is an *identity-metric*
        # property: the ladder's own metric estimate was near-flat
        # ([0.56, 1.50]), and the round-5 identity-metric adaptive run
        # settled at 3.2e-5 / accept 0.70 under this ceiling while the
        # preconditioned one collapsed on a corrupted epoch-63 estimate
        # (r5_surr_grid_exact_np.json vs r5_surr_grid_exact.json) — so
        # the ceiling applies with or without `precondition`.
        eps_max = 5e-5
    if eps_max_override is not None:
        # the 2e-5 ceiling was calibrated on the staircase-corrupted
        # kernels, where larger steps bought rare-huge-jump SJD at
        # acceptance ~0.05; under exact numerics (kahan + "highest")
        # both round-4 grid captures tuned INTO this ceiling at
        # acceptance 0.95+, i.e. the grid top — not the posterior — had
        # become the binding constraint. The override lets the adapter
        # explore past it.
        eps_max = eps_max_override
    if uturn:
        # the RM controller explores the step range continuously toward
        # 0.8 acceptance (no grid) and the U-turn criterion picks the
        # trajectory length — bounds are guards, not a search space
        # leapfrog_max=64 was sized for ungoverned dispatches (axon kills
        # ~60-90s executions); under the dispatch governor longer
        # trajectories split into bounded sub-dispatches, so the guard
        # can be raised to let the U-turn criterion actually resolve
        # (VERDICT round-4 #5: the 64 guard pinned L and froze eps
        # mid-climb at 0.036 ESS/sec)
        # step_size_start defaults to the conservative 5e-7; the r5
        # governed capture measured the RM controller still mid-climb at
        # burn-in end (eps frozen 2.06e-6 at accept 0.957 vs the 0.8
        # target — r5_surr_uturn_exact.attempt1.log) at a climb rate
        # (~x1.8/100 epochs) too slow for ANY seed far below target to
        # converge in 200 burn-in epochs. The decisive seed is the grid
        # path's measured equilibrium region (grid settled at 3.2e-5 /
        # accept 0.70 — r5_surr_grid_exact_np.json): seed just below it
        # (2e-5) and let burn-in refine in place; if dynamic trajectories
        # cannot compete from there, the retire decision is airtight
        net.setup_mcmc(step_size_start=float(uturn_step_start or 5e-7),
                       step_size_min=1e-9,
                       step_size_max=1e-4, leapfrog_start=10,
                       leapfrog_min=2,
                       leapfrog_max=int(leapfrog_max_override or 64),
                       hyper_step_size=1e-6, hyper_leapfrog=5,
                       burnin=burnin, averaging_steps=10)
    else:
        net.setup_mcmc(step_size_start=5e-7, step_size_min=1e-8,
                       step_size_max=eps_max, step_size_options=40,
                       leapfrog_start=10, leapfrog_min=5, leapfrog_max=15,
                       leapfrog_increment=5, hyper_step_size=1e-6,
                       hyper_leapfrog=5, burnin=burnin, averaging_steps=10,
                       random_steps=5)

    log("surrogate_quality: pretrain done, sampling...")
    # epochs_override trades post-burn-in window (ESS resolution) for a
    # bounded wall clock — used when a governed uturn run must complete
    # inside a campaign slot (worst case ~12s/epoch at the 2e-6/L-41
    # regime, r5_surr_uturn_exact.attempt1.log); ESS/sec is a rate, so
    # a shorter window stays comparable for keep/retire decisions
    epochs, sampling_step = int(epochs_override or 600), 2
    # checkpoint next to the --out artifact: three round-5 attempts at
    # this 40-minute capture died to axon tunnel wedges / killed
    # sessions with zero salvage; with incremental checkpoints a wedge
    # costs kill+relaunch (fingerprint-validated resume) instead of the
    # whole run. Removed on a clean finish so a fresh invocation of the
    # same bench never resumes stale state.
    ckpt_dir = (_OUT + ".ckpt") if _OUT else None
    resume_epoch = 0
    if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "resume.json")):
        try:
            # the carry's epoch counter is per-chain (C,); all chains
            # share the global epoch — read lane 0
            resume_epoch = int(np.asarray(np.load(
                os.path.join(ckpt_dir, "resume.npz"))["epoch"]).reshape(-1)[0])
        except Exception:
            resume_epoch = -1   # resuming, epoch unreadable
        log(f"surrogate_quality: resuming from checkpoint at epoch "
            f"{resume_epoch}")
    t0 = time.perf_counter()
    res = net.train(epochs, sampling_step, GaussianLikelihood(sd=0.1),
                    n_chains=n_chains, chain_jitter=0.0,
                    data_chunk=125_000,
                    checkpoint_dir=ckpt_dir,
                    checkpoint_every=4 if ckpt_dir else 0,
                    # progress lines every 50 epochs: a timed-out run
                    # still leaves its pace + acceptance in the log
                    display_skip=50,
                    precondition=60 if precondition else False,
                    precondition_windows=windows,
                    precondition_clip=clip,
                    trajectory="uturn" if uturn else "adapter",
                    uturn_probe=uturn_probe,
                    # Kahan-compensated integrator: this target's stable
                    # eps sits within a few ulps of |theta| (PERF_NOTES
                    # round 4), where the plain f32 drift quantizes
                    compensated=compensated,
                    # axon kills the worker when one XLA execution runs
                    # ~60-90s+; uturn's ratcheting lengths over the 1M-point
                    # chunked likelihood cross that without the governor
                    max_dispatch_seconds=25.0,
                    verbose=True)
    dt_proc = time.perf_counter() - t0
    # a resumed process only paid wall for the post-resume epochs;
    # extrapolate the full-run sampling wall at this process's measured
    # pace (one compiled program serves every chunk, so per-epoch cost
    # is stable) — ESS/sec quoted from a wedge-kill-resume capture then
    # reflects the pace a clean run would have had, not a discounted
    # wall. Both raw and extrapolated values land in the artifact.
    if resume_epoch > 0 and epochs > resume_epoch:
        dt = dt_proc * epochs / (epochs - resume_epoch)
    else:
        dt = dt_proc

    acc = float(res.main_accept[burnin:].mean())
    # insurance partial: the post-train ESS extraction pays 2-3 fresh
    # remote compiles (minutes, and the tunnel can wedge — the first
    # r5 noprecond attempt lost 30 minutes of samples to a killed
    # process with no artifact); flush the cheap host-side facts first
    emit({"partial": True, "phase": "train_done",
          "mean_accept_post_burnin": round(acc, 4),
          "accept_in_band": bool(0.2 <= acc <= 0.99),
          "wall_seconds": round(dt, 1),
          "wall_seconds_this_process": round(dt_proc, 1),
          "resume_epoch": resume_epoch,
          "final_step_size": res.final_step_size,
          "final_leapfrog": res.final_leapfrog,
          "compile_wall_seconds": round(res.compile_wall_estimate, 1),
          "trajectory": "uturn" if uturn else "adapter",
          "precondition": bool(precondition),
          "numerics": numerics, "eps_max": eps_max}, final=False)
    # pooled ESS of the predictive mean at a probe point across all chains
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers,
                         GaussianLikelihood(sd=0.1).init_hypers())
    xq = jnp.asarray(x[:1])
    series = np.asarray(jax.jit(jax.vmap(jax.vmap(
        lambda th: net.model.apply(flat.unravel_theta(th), xq)[0, 0])))(
        jnp.asarray(res.theta_samples)))           # (S, C)
    from tensorbnn_tpu.utils.autocorr import effective_sample_size_batch
    ess = effective_sample_size_batch(series.T)
    param_ess = res.multichain_ess(max_params=64)

    log(f"surrogate_quality: accept {acc:.3f} (target band 0.2-0.99), "
        f"{series.shape[0]} draws x {n_chains} chains, ESS {ess:.1f} "
        f"(min-param {float(param_ess):.1f}), {dt:.0f}s wall, "
        f"final eps {res.final_step_size:.2e}, L {res.final_leapfrog}")
    emit({
        "metric": f"surrogate ESS/sec (1M-point likelihood, adaptive "
                  f"two-block driver, {n_chains} chains"
                  f"{', diag-metric preconditioned' if precondition else ''}"
                  f", single chip)",
        "value": round(ess / dt, 4),
        "unit": "effective samples/sec",
        "ess_per_sec_warm_est": round(
            ess / max(dt - res.compile_wall_estimate, 1e-9), 4),
        "compile_wall_seconds": round(res.compile_wall_estimate, 1),
        "mean_accept_post_burnin": round(acc, 4),
        "accept_in_band": bool(0.2 <= acc <= 0.99),
        "ess": round(ess, 1),
        "min_param_ess": round(float(param_ess), 1),
        "n_chains": n_chains,
        "wall_seconds": round(dt, 1),
        "wall_seconds_this_process": round(dt_proc, 1),
        "resume_epoch": resume_epoch,
        "final_step_size": res.final_step_size,
        "final_leapfrog": res.final_leapfrog,
        "precond_windows": windows if precondition else 0,
        "precond_clip": list(clip) if precondition else None,
        "trajectory": "uturn" if uturn else "adapter",
        "uturn_probe": uturn_probe if uturn else None,
        "compensated": compensated,
        "matmul_precision": matmul_precision,
        "numerics": numerics,
        "eps_max": eps_max,
        "epochs": epochs,
        "leapfrog_max": (int(leapfrog_max_override or 64) if uturn
                         else None),
        "uturn_step_start": (float(uturn_step_start or 5e-7) if uturn
                             else None),
        "dispatch_first_walls": [[round(k, 1), round(w, 3)]
                                 for k, w in res.dispatch_first_walls],
        "dispatch_warm_walls": [[round(k, 1), round(w, 3)]
                                for k, w in res.dispatch_warm_walls],
        "dispatch_wall_seconds": round(res.dispatch_wall_total, 2),
        "trace_fetch_wall_seconds": round(res.trace_fetch_wall, 2),
        "untracked_wall_seconds": round(res.untracked_wall, 2),
        "potential": "xla-tree",
    })
    if ckpt_dir and os.path.isdir(ckpt_dir):
        # clean finish: drop the wedge-insurance checkpoints so a fresh
        # invocation of this bench never resumes a completed run's state
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def bench_surrogate_eps_ladder(eps_list=(2e-5, 3.2e-5, 5e-5, 8e-5, 1.25e-4),
                               n_chains: int = 32, leapfrog: int = 15,
                               matmul_precision="highest",
                               compensated: bool = True,
                               n_points: int = 1_000_000,
                               data_chunk: int = 125_000,
                               pretrain_epochs: int = 4,
                               settle_chunks: int = 8,
                               epochs_per_chunk: int = 8):
    """Fixed-(eps, L) acceptance ladder on the 1M-point surrogate — brackets
    the exact-numerics stability boundary the adaptive grid's ceiling sits
    against.

    Both round-4 exact-numerics grid captures (kahan + exact-f32 matmuls)
    tuned INTO the 2e-5 grid ceiling at acceptance 0.95+, so the ceiling —
    calibrated on the staircase-corrupted kernels — had become the binding
    constraint. Campaign r4h raised it 8x to 1.6e-4 and the adapter's
    random phase opened at the grid top: main acceptance 0.0 through 100+
    epochs (benchmarks/captures/r4_surr_grid_kahan_hp_wide.log; the run
    died at round end without an artifact). The open question is where
    between 2e-5 (accept ~0.95) and ~1.3e-4 (accept 0.0) the boundary
    sits. A full adaptive run per candidate ceiling costs ~21 min; this
    probe answers it in one run: (eps, L) are *traced* scalars
    (architecture invariant), so a single compiled chunk program serves
    the entire ladder — each rung is two governed dispatches.

    Procedure: MAP warm start (shared ``_surrogate_net`` pretrain), a
    settle phase at the adaptive run's eps floor so per-chain momentum
    draws decorrelate the fleet, then the driver's own diag-metric recipe
    (cross-chain std, median-normalized, clipped to [1e-2, 1e2] —
    sampler/driver.py) — then, ascending so a zero-acceptance rung leaves
    the state untouched for the next, two measurement chunks per eps at
    fixed L recording per-chunk mean acceptance and SJD.
    """
    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianLikelihood
    from tensorbnn_tpu.parallel.chains import (
        init_multichain_state,
        make_multichain_chunk_runner,
    )
    from tensorbnn_tpu.sampler.potential import flatten_state

    # validate before the expensive pretrain/settle phases: the ladder
    # must be non-empty and ascending (a zero-acceptance rung leaves the
    # state untouched for the next only if rungs ascend)
    eps_list = tuple(float(e) for e in eps_list)
    if not eps_list:
        raise ValueError("eps_list must be non-empty")
    if any(b <= a for a, b in zip(eps_list, eps_list[1:])):
        raise ValueError(f"eps_list must be strictly ascending: {eps_list}")

    net, x, y = _surrogate_net(matmul_precision, n_points=n_points,
                               pretrain_epochs=pretrain_epochs)
    likelihood = GaussianLikelihood(sd=0.1)
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers, likelihood.init_hypers())
    xd, yd = jnp.asarray(x), jnp.asarray(y)

    t0 = time.perf_counter()
    run = make_multichain_chunk_runner(
        net.model, likelihood, xd, yd, flat.unravel_theta,
        flat.unravel_eta, adjust_hypers=True, hyper_leapfrog=5,
        # the whole probe stays in "burn-in" mode for the hyper block's
        # dual averaging (matching the adaptive run's early phase)
        burnin=10_000.0, hyper_step_size_init=1e-6, mesh=None,
        donate=False, data_chunk=data_chunk, traced_step_scale=True,
        compensated=compensated)
    # MAP start, no positional jitter (the mode is sharp at 1M points —
    # same rationale as surrogate_quality); momenta decorrelate the fleet
    carry = init_multichain_state(flat.theta, flat.eta, jax.random.key(7),
                                  1e-6, n_chains, jitter=0.0)
    ones = jnp.ones((flat.theta.size,), jnp.float32)

    def chunk(carry, eps, leap, scale):
        carry, tr = run(carry, xd, yd, jnp.asarray(eps, jnp.float32),
                        jnp.asarray(int(leap), jnp.int32), scale,
                        epochs_per_chunk)
        return carry, (float(np.asarray(tr.main_accept).mean()),
                       float(np.asarray(tr.sjd).mean()))

    # settle at the adaptive run's start point (5e-7, L=10): acceptance
    # ~1, the fleet spreads enough for the cross-chain metric estimate
    for i in range(settle_chunks):
        carry, (acc, _) = chunk(carry, 5e-7, 10, ones)
        if i in (0, settle_chunks - 1):
            log(f"eps_ladder settle {i + 1}/{settle_chunks}: "
                f"accept {acc:.3f} ({time.perf_counter() - t0:.0f}s)")

    # the driver's own diag-metric recipe (shared helper, so this ladder
    # cannot silently diverge from what adaptive runs actually do)
    from tensorbnn_tpu.sampler.driver import estimate_step_scale
    step_scale = jnp.asarray(estimate_step_scale(carry.theta))
    log(f"eps_ladder: metric estimated, scale range "
        f"[{float(step_scale.min()):.3g}, {float(step_scale.max()):.3g}]")
    # two preconditioned settle chunks at a known-good step so the ladder
    # starts from a preconditioned-typical state
    for _ in range(2):
        carry, (acc, _) = chunk(carry, 1e-5, leapfrog, step_scale)
    log(f"eps_ladder: preconditioned settle accept {acc:.3f}")

    rows = []
    for eps in eps_list:
        accs, sjds = [], []
        for _ in range(2):
            carry, (acc, sjd) = chunk(carry, eps, leapfrog, step_scale)
            accs.append(round(acc, 4))
            sjds.append(sjd)
        rows.append({"eps": eps, "leapfrog": leapfrog,
                     "accept": round(float(np.mean(accs)), 4),
                     "accept_chunks": accs, "sjd_mean": float(np.mean(sjds))})
        log(f"eps_ladder: eps {eps:.2e} -> accept {rows[-1]['accept']:.3f} "
            f"(chunks {accs}, sjd {rows[-1]['sjd_mean']:.3e}, "
            f"{time.perf_counter() - t0:.0f}s)")
        emit({"partial": True, "ladder": rows}, final=False)

    dt = time.perf_counter() - t0
    emit({
        "metric": f"surrogate fixed-eps acceptance ladder ({n_points}-point "
                  "likelihood, diag-metric preconditioned, "
                  f"{n_chains} chains, L={leapfrog}, single chip)",
        "value": rows[-1]["accept"],
        "unit": "mean acceptance at the top rung",
        "ladder": rows,
        "n_chains": n_chains,
        "epochs_per_chunk": epochs_per_chunk,
        "scale_range": [float(step_scale.min()), float(step_scale.max())],
        "compensated": compensated,
        "matmul_precision": matmul_precision,
        "wall_seconds": round(dt, 1),
    })
    return rows


def bench_potential_noise():
    """Measures the 1M-point potential's evaluation-noise floor in theta —
    the quantity that caps MH acceptance once the integrator is exact.

    Two suspects, measured separately:

    1. **MXU default-precision staircase**: TPU's default f32 matmul
       rounds operands to bf16 (one MXU pass), so the evaluated log
       posterior only changes when a weight crosses a bf16 rounding
       boundary (ulp(|w| ~ 0.1) = 3.9e-4 — 5 decades above this
       posterior's eps). Each crossing jumps the 1M-row log likelihood
       by ~(dLL/dw) x ulp_bf16 = O(nats). Diagnostic: walk theta along a
       momentum-like ray, theta(t) = theta0 + t*u with per-coordinate
       displacement t, and record lp(t) - lp(0) at default vs
       precision="highest" (exact f32 matmul). Default shows flat
       segments punctuated by nat-scale jumps; highest tracks the smooth
       directional derivative.

    2. **f32 summation rounding** across the chunked reduction — bounded
       by the Kahan chunk carry (sampler/potential.py) + XLA's in-chunk
       tree reduce; expected sub-0.1-nat. The highest-precision curve's
       residual vs t * <g, u> measures what's left of it.

    Also times value+grad at default / high / highest under the sampler's
    chain batching (C=32), so the staircase fix's cost is measured, not
    assumed. Runs on the real TPU; emits one JSON row of raw curves.
    """
    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import GaussianDenseLayer, GaussianLikelihood, Tanh
    from tensorbnn_tpu.network import Network
    from tensorbnn_tpu.sampler.potential import flatten_state, \
        make_potentials

    n_points, d_in, width = 1_000_000, 8, 64
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n_points, d_in)).astype(np.float32)
    y = (np.sin(x.sum(axis=1)) + 0.1 * rng.normal(
        size=n_points)).astype(np.float32)

    from tensorbnn_tpu.training.pretrain import dense_warm_start, \
        train_basic_regression
    log("potential_noise: data built, pretraining to the MAP "
        "(same config as surrogate_quality)...")
    w, b, _ = train_basic_regression(
        2, d_in, 1, width, cycles=1, epochs=4, alpha=0.1,
        train_in=x, train_out=y, val_in=x[:4096], val_out=y[:4096],
        batch_size=8192, callbacks=False, hidden_activation="tanh")

    lik = GaussianLikelihood(sd=0.1)

    def build(precision):
        net = Network(jnp.float32, d_in, x, y, x[:256], y[:256], seed=3)
        net.add(GaussianDenseLayer(d_in, width, matmul_precision=precision),
                parameters=dense_warm_start(w, b, 0)).add(Tanh())
        net.add(GaussianDenseLayer(width, width,
                                   matmul_precision=precision),
                parameters=dense_warm_start(w, b, 1)).add(Tanh())
        net.add(GaussianDenseLayer(width, 1, matmul_precision=precision),
                parameters=dense_warm_start(w, b, 2))
        params, hypers = net.init_state()
        flat = flatten_state(params, hypers, lik.init_hypers())
        pots = make_potentials(net.model, lik, jnp.asarray(x),
                               jnp.asarray(y), flat.unravel_theta,
                               flat.unravel_eta, data_chunk=125_000)
        return flat, pots

    flat0, pots_def = build(None)
    _, pots_hi = build("highest")
    _, pots_h3 = build("high")
    theta0 = jnp.asarray(flat0.theta)
    eta0 = jnp.asarray(flat0.eta)
    d_dim = int(theta0.size)

    # momentum-like ray: per-coordinate N(0,1), so t is directly the
    # per-coordinate displacement scale — comparable to the sampler's eps
    u = jnp.asarray(np.random.default_rng(7).normal(
        size=d_dim).astype(np.float32))

    val_def = jax.jit(lambda t: pots_def.main(theta0 + t * u, eta0))
    val_hi = jax.jit(lambda t: pots_hi.main(theta0 + t * u, eta0))
    # directional derivative at the exact-matmul potential: the smooth
    # truth the curves are judged against
    g_hi = jax.jit(jax.grad(lambda th: pots_hi.main(th, eta0)))(theta0)
    slope = float(jnp.vdot(g_hi, u))

    # grid floor 1e-8: below that the f32 *position* can't represent the
    # displacement at all (theta0 + t*u == theta0 bitwise for
    # |theta| ~ 0.1 coordinates) — that is the integrator-representation
    # floor, a different wall from the matmul staircase this measures
    ts = [0.0] + [float(t) for t in np.logspace(-8, -4.5, 15)]
    rows = []
    lp0_def = lp0_hi = None
    for t in ts:
        ld = float(val_def(jnp.float32(t)))
        lh = float(val_hi(jnp.float32(t)))
        if t == 0.0:
            lp0_def, lp0_hi = ld, lh
            continue
        rows.append({"t": t,
                     "dlp_default": round(ld - lp0_def, 6),
                     "dlp_highest": round(lh - lp0_hi, 6),
                     "dlp_linear": round(slope * t, 6)})
        log(f"potential_noise: t={t:.3e}  default {ld - lp0_def:+.4f}  "
            f"highest {lh - lp0_hi:+.4f}  linear {slope * t:+.4f}")

    # staircase amplitude: departure of the default curve from the
    # exact-matmul curve, over the eps decades the sampler lives in
    small = [r for r in rows if r["t"] <= 1e-6]
    stair = [abs(r["dlp_default"] - r["dlp_highest"]) for r in small]
    resid = [abs(r["dlp_highest"] - r["dlp_linear"]) for r in small]

    # cost of the fix under sampler conditions: C=32 batched value+grad
    C = 32
    thb = jnp.tile(theta0[None], (C, 1))
    etb = jnp.tile(eta0[None], (C, 1))
    costs = {}
    for name, pots in (("default", pots_def), ("high", pots_h3),
                       ("highest", pots_hi)):
        vg = jax.jit(jax.vmap(lambda th, et, p=pots: (
            lambda v, g: v + jnp.sum(g))(*p.main_vg(th, et))))
        float(jnp.sum(vg(thb, etb)))  # compile + warm
        reps, t0 = 5, time.perf_counter()
        for _ in range(reps):
            s = vg(thb, etb)
        float(jnp.sum(s))
        costs[name] = round((time.perf_counter() - t0) / reps, 4)
        log(f"potential_noise: value+grad C={C} {name}: {costs[name]}s")

    emit({
        "metric": "potential evaluation noise (1M-point surrogate, "
                  "default vs highest matmul precision)",
        "value": round(float(np.median(stair)), 4),
        "unit": "nats (median |default - highest| dlp, t <= 1e-6)",
        "staircase_max_nats": round(float(np.max(stair)), 4),
        "highest_residual_max_nats": round(float(np.max(resid)), 4),
        "directional_slope": round(slope, 4),
        "curves": rows,
        "vg_cost_c32_seconds": costs,
        "theta_dim": d_dim,
        "lp0_default": round(lp0_def, 4),
        "lp0_highest": round(lp0_hi, 4),
    })


def ess_run(n_chains: int = 64, n_adapters: int = 1,
            epochs: int = 1300, trajectory: str = "adapter",
            tempering: int = 1, tempering_beta_min: float = 0.1,
            uturn_probe: str = "always",
            max_dispatch_seconds=None) -> dict:
    """The flagship config through the full adaptive driver, measured as
    quality-adjusted throughput. Returns a result dict (shared with the
    repo-root ``bench.py``, which embeds it in the driver-captured
    artifact so the north-star "at equal ESS" evidence is machine-read,
    not hand-run — VERDICT round-2 #1)."""
    import math

    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    burnin = 300
    train_in = np.linspace(-2, 2, num=11)
    target = (np.sin(train_in * math.pi * 2) * train_in
              - np.cos(train_in * math.pi))
    net = Network(jnp.float32, 1, train_in, target, train_in, target,
                  seed=11)
    net.add(GaussianDenseLayer(1, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 10)).add(Tanh())
    net.add(GaussianDenseLayer(10, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=5e-4,
                   step_size_max=2e-2, step_size_options=40,
                   leapfrog_start=50, leapfrog_min=20, leapfrog_max=200,
                   leapfrog_increment=5, hyper_step_size=1e-3,
                   hyper_leapfrog=30, burnin=burnin, averaging_steps=10,
                   random_steps=5)
    from tensorbnn_tpu.utils.tracing import RunTracer
    tracer = RunTracer()
    t0 = time.perf_counter()
    res = net.train(epochs, 2, FixedGaussianLikelihood(sd=0.1),
                    n_chains=n_chains, n_adapters=n_adapters,
                    chain_jitter=0.05, tracer=tracer,
                    trajectory=trajectory, uturn_probe=uturn_probe,
                    tempering=tempering,
                    tempering_beta_min=tempering_beta_min,
                    max_dispatch_seconds=max_dispatch_seconds,
                    verbose=False)
    dt = time.perf_counter() - t0

    # ESS of a predictive summary (mean prediction at x=0.5) per chain
    from tensorbnn_tpu.sampler.potential import flatten_state
    params, hypers = net.init_state()
    flat = flatten_state(params, hypers, {})
    xq = jnp.asarray([[0.5]], jnp.float32)
    series = jax.jit(jax.vmap(jax.vmap(
        lambda th: net.model.apply(flat.unravel_theta(th), xq)[0, 0])))(
        jnp.asarray(res.theta_samples))            # (S, C)
    series = np.asarray(series)
    from tensorbnn_tpu.utils.autocorr import effective_sample_size_batch
    total_ess = effective_sample_size_batch(series.T)
    # the conservative companion: worst-coordinate pooled parameter ESS
    # (per-parameter batched-FFT taus; a slow-mixing weight cannot hide
    # behind a fast predictive summary)
    param_ess = res.multichain_ess(max_params=256)
    return {
        "n_chains": n_chains,
        "n_adapters": n_adapters,
        "trajectory": trajectory,
        "tempering": tempering,
        "tempering_beta_min": (tempering_beta_min if tempering > 1
                               else None),
        "epochs": epochs,
        "ess_per_sec": round(total_ess / dt, 2),
        # compile-adjusted companion: axon cannot cache compiles across
        # processes (5-460s per shape, high variance), so the cold
        # ess_per_sec swings with remote-compile temperature while the
        # sampler itself is deterministic. The driver estimates the
        # compile-attributed wall (first-of-shape dispatch excess over
        # warm cost) so the artifact carries the steady-state figure too.
        "ess_per_sec_warm_est": round(
            total_ess / max(dt - res.compile_wall_estimate, 1e-9), 2),
        "compile_wall_seconds": round(res.compile_wall_estimate, 1),
        "n_dispatch_compiles": res.n_dispatch_compiles,
        # raw (work, wall) pairs behind the compile-wall attribution —
        # auditable from the artifact (round-3 VERDICT weak #7)
        "dispatch_first_walls": [[round(k, 1), round(w, 3)]
                                 for k, w in res.dispatch_first_walls],
        "dispatch_warm_walls": [[round(k, 1), round(w, 3)]
                                for k, w in res.dispatch_warm_walls],
        # the three wall buckets: dispatch (device work + compile),
        # trace fetch (device->host materialization over the tunnel),
        # and the remainder (host adapter algebra, writer IO, backend
        # session overhead — tunnel warmup dominates first-in-process
        # runs). Round 4 measured runs whose wall was dominated by the
        # untracked bucket; these fields make that attributable from
        # the artifact.
        "dispatch_wall_seconds": round(res.dispatch_wall_total, 2),
        "trace_fetch_wall_seconds": round(res.trace_fetch_wall, 2),
        "untracked_wall_seconds": round(res.untracked_wall, 2),
        # replica-swap acceptance (None unless tempering > 1): attributes
        # a tempered win/loss to swaps firing vs. a mistuned ladder
        "swap_accept_mean": (round(float(np.mean(res.swap_accept)), 4)
                             if res.swap_accept is not None else None),
        # per-rung swap rates (mean over epochs): a ladder gap that never
        # fires shows as adjacent rungs both ~0 — attributes a tempered
        # win/loss to swaps firing vs a mistuned ladder from the artifact
        "swap_accept_rung": (
            [round(float(v), 4)
             for v in np.asarray(res.swap_accept_rung).mean(axis=0)]
            if res.swap_accept_rung is not None else None),
        "total_ess": round(total_ess, 1),
        "min_param_ess": round(float(param_ess), 1),
        "median_param_ess": round(param_ess.median, 1),
        "accept_post_burnin": round(float(
            res.main_accept[burnin:].mean()), 4),
        "hyper_accept_post_burnin": round(float(
            res.hyper_accept[burnin:].mean()), 4),
        "wall_seconds": round(dt, 1),
        # mean executed L / straggler-paid L (1.0 when G=1): the grouped-
        # adaptation overhead the sweep's docstring promises
        "straggler_efficiency": round(tracer.straggler_efficiency, 4),
        "final_leapfrog": int(res.final_leapfrog),
        "final_step_size": float(res.final_step_size),
    }


def bench_ess(n_chains: int = 64, n_adapters: int = 1):
    """ESS/sec on the flagship config — the BASELINE quality-adjusted
    throughput metric (leapfrog throughput is meaningless if the chain
    doesn't decorrelate). ``n_chains`` scales the fleet: chains decorrelate
    independently, so ESS grows linearly while wall time grows sublinearly
    until the chain blocks fill the 128-lane axis."""
    r = ess_run(n_chains, n_adapters)
    log(f"ess: {r['total_ess']} effective samples across {n_chains} "
        f"chains in {r['wall_seconds']}s wall (incl. compile); "
        f"min-param ESS {r['min_param_ess']}")
    emit({
        "metric": f"ESS/sec (predictive summary, {n_chains} chains, "
                  f"{n_adapters} adapter group(s), flagship MLP)",
        "value": r["ess_per_sec"],
        "unit": "effective samples/sec",
        "total_ess": r["total_ess"],
        "min_param_ess": r["min_param_ess"],
        "median_param_ess": r["median_param_ess"],
        "mean_accept": r["accept_post_burnin"],
    })


def bench_ess_group_sweep(n_chains: int = 512,
                          groups=(1, 2, 4, 8, 16)) -> None:
    """Adapter-group sweep at a fixed fleet size (VERDICT round-2 #7):
    turns the two-point group-count evidence into a defensible default.
    Reports, per G: total ESS, wall, ESS/sec, and the straggler overhead
    (mean executed L / max L across groups per epoch — chains in short-L
    groups mask-freeze while the longest group finishes)."""
    rows = []
    for g in groups:
        r = ess_run(n_chains, g)
        log(f"G={g}: {r['total_ess']} ESS in {r['wall_seconds']}s "
            f"-> {r['ess_per_sec']}/s, accept {r['accept_post_burnin']}")
        rows.append({"n_adapters": g, **{k: r[k] for k in (
            "ess_per_sec", "ess_per_sec_warm_est", "compile_wall_seconds",
            "total_ess", "min_param_ess",
            "accept_post_burnin", "wall_seconds",
            "straggler_efficiency")}})
        emit({"metric": "adapter-group sweep (partial)", "sweep": rows},
             final=False)
    best = max(rows, key=lambda r: r["ess_per_sec"])
    emit({
        "metric": f"adapter-group sweep ESS/sec ({n_chains} chains, "
                  f"G in {list(groups)}, flagship MLP)",
        "value": best["ess_per_sec"],
        "unit": "effective samples/sec",
        "best_n_adapters": best["n_adapters"],
        "sweep": rows,
    })


def bench_predict():
    """Posterior-ensemble inference throughput: the Predictor's vmapped
    apply over the stacked sample axis (the reference loops networks one
    forward pass at a time, predictor.py:142-154)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.io import checkpoint
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.predictor import Predictor
    from tensorbnn_tpu.sampler.potential import flatten_state

    model = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 1)])
    params, hypers = model.init(jax.random.key(0))
    flat = flatten_state(params, hypers, {})

    n_nets, batch = 2000, 4096
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(flat.theta[None]
                         + 0.05 * rng.normal(size=(n_nets, flat.theta.size)),
                         jnp.float32)
    param_samples = jax.tree.map(np.asarray,
                                 jax.vmap(flat.unravel_theta)(thetas))
    hyper_samples = tuple(
        jax.tree.map(lambda v, n=n_nets: np.broadcast_to(
            np.asarray(v), (n,) + np.shape(v)), h)
        for h in hypers)

    with tempfile.TemporaryDirectory() as d:
        checkpoint.save_samples(d, param_samples, hyper_samples, {})
        with open(f"{d}/architecture.txt", "w") as f:
            for name in model.layer_names:
                f.write(name + "\n")
        pred = Predictor(d, likelihood=FixedGaussianLikelihood(sd=0.1))
        x = rng.normal(size=(batch, 1)).astype(np.float32)

        pred.predict(x, n=1)                     # compile + warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = pred.predict(x, n=1)
        dt = time.perf_counter() - t0
    net_points = reps * n_nets * batch
    log(f"predict: {n_nets} nets x {batch} points x {reps} reps in "
        f"{dt:.2f}s (incl. host transfer of {out.nbytes / 1e6:.0f}MB/rep)")
    emit({
        "metric": "posterior-ensemble prediction throughput "
                  f"({n_nets}-network 3x10 MLP ensemble)",
        "value": round(net_points / dt, 0),
        "unit": "network-predictions/sec",
        "batch": batch,
    })


def bench_tempering(n_chains: int = 16, rungs: int = 8,
                    epochs: int = 600):
    """Parallel tempering on the sign-flip bimodal BNN (the
    tests/test_tempering.py capability target: a 1-hidden-unit tanh net
    whose posterior has exact mirrored mode copies behind a ~220-nat
    likelihood wall — plain HMC never crosses; e^-220 tunneling).

    Measures the three numbers that justify tempering's TPU-native
    design (rung-major replicas on the *batched chain axis*,
    sampler/tempering.py): (1) cold-chain mode coverage — both signs
    visited, with the balance fraction; (2) the in-scan even/odd swap
    acceptance; (3) the marginal wall of the rung axis — K x C replicas
    pack the same 128-lane vector blocks a C-chain fleet under-fills,
    so a K-rung ladder should cost far less than K x the plain wall
    (the reference has no tempering at all; a per-replica-process
    implementation pays K x by construction)."""
    import jax.numpy as jnp

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 8)
    y = 1.5 * np.tanh(2.0 * x)
    warm = ({"w": np.full((1, 1), 2.0, np.float32),
             "b": np.zeros((1,), np.float32)},
            {"w": np.full((1, 1), 1.5, np.float32),
             "b": np.zeros((1,), np.float32)})
    lik = FixedGaussianLikelihood(sd=0.15)

    def build():
        net = Network(jnp.float32, 1, x, y, x, y, seed=5)
        net.add(GaussianDenseLayer(1, 1), parameters=warm[0]).add(Tanh())
        net.add(GaussianDenseLayer(1, 1), parameters=warm[1])
        net.setup_mcmc(step_size_start=1e-2, step_size_min=1e-3,
                       step_size_max=0.2, step_size_options=15,
                       leapfrog_start=8, leapfrog_min=2, leapfrog_max=20,
                       leapfrog_increment=2, hyper_step_size=1e-2,
                       hyper_leapfrog=5, burnin=50, averaging_steps=10,
                       random_steps=3)
        return net

    t0 = time.perf_counter()
    res_p = build().train(epochs, 2, lik, n_chains=n_chains,
                          chain_jitter=0.0, verbose=False)
    wall_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    res_t = build().train(epochs, 2, lik, n_chains=n_chains,
                          tempering=rungs, tempering_beta_min=0.01,
                          chain_jitter=0.0, verbose=False)
    wall_temp = time.perf_counter() - t0

    # theta layout [b1, w1, b2, w2] (ravel_pytree sorts keys); w1 carries
    # the mode's sign
    w1_plain = res_p.theta_samples[..., 1]
    w1_cold = res_t.theta_samples[..., 1]
    neg_frac_plain = float((w1_plain < 0).mean())
    neg_frac_temp = float((w1_cold < 0).mean())
    swap = float(np.mean(res_t.swap_accept))
    # warm-adjusted marginal cost of the rung axis: compile walls differ
    # between the two programs (the tempered runner compiles the swap
    # phase too), so compare steady-state walls
    plain_warm = wall_plain - res_p.compile_wall_estimate
    temp_warm = wall_temp - res_t.compile_wall_estimate
    log(f"tempering: plain neg-mode frac {neg_frac_plain:.3f} "
        f"(expected 0.0), tempered {neg_frac_temp:.3f} (ideal ~0.5), "
        f"swap accept {swap:.3f}, wall plain {wall_plain:.1f}s "
        f"({plain_warm:.1f}s warm) vs {rungs}-rung {wall_temp:.1f}s "
        f"({temp_warm:.1f}s warm)")
    emit({
        "metric": f"parallel-tempering rung-axis cost ({rungs} rungs x "
                  f"{n_chains} chains, bimodal sign-flip BNN)",
        "value": round(temp_warm / max(plain_warm, 1e-9), 3),
        "unit": f"x plain-HMC wall (per-replica-process would pay "
                f"{rungs}x)",
        "neg_mode_fraction_plain": round(neg_frac_plain, 4),
        "neg_mode_fraction_tempered": round(neg_frac_temp, 4),
        "crossed_modes": bool((w1_cold < 0).any() and (w1_cold > 0).any()),
        "swap_accept_mean": round(swap, 4),
        "wall_plain_seconds": round(wall_plain, 1),
        "wall_tempered_seconds": round(wall_temp, 1),
        "wall_plain_warm_seconds": round(plain_warm, 1),
        "wall_tempered_warm_seconds": round(temp_warm, 1),
        "rungs": rungs,
        "n_chains": n_chains,
        "epochs": epochs,
    })


def bench_writer(n_chains: int = 512):
    """Streaming-writer throughput at the wide-fleet configuration where
    streaming is mandatory (~2GB in-memory cutoff): RunWriter.append for
    one sampling epoch of the flagship model across ``n_chains`` chains
    (VERDICT round-2 #6). Host-side only — runs the same on any backend."""
    import tempfile

    import jax

    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.io import fast_text
    from tensorbnn_tpu.io.reference_format import RunWriter
    from tensorbnn_tpu.models.sequential import Sequential

    model = Sequential([GaussianDenseLayer(1, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 10), Tanh(),
                        GaussianDenseLayer(10, 1)])
    params, hypers = model.init(jax.random.key(0))
    params = jax.tree.map(np.asarray, params)
    hypers = jax.tree.map(np.asarray, hypers)
    lik = FixedGaussianLikelihood(sd=0.1)

    reps = 4
    with tempfile.TemporaryDirectory() as d:
        w = RunWriter(d, model, lik, networks_per_file=1000)
        w.append(params, hypers, {}, chain=0)      # open files/shapes
        t0 = time.perf_counter()
        for _ in range(reps):
            for c in range(n_chains):
                w.append(params, hypers, {}, chain=c)
        for f in w._files:
            f.flush()
        dt = time.perf_counter() - t0
        w.close()
    nets_per_sec = reps * n_chains / dt
    log(f"writer: {reps * n_chains} networks in {dt:.2f}s -> "
        f"{nets_per_sec:,.0f} networks/sec "
        f"(native formatter: {fast_text.native_available()})")
    emit({
        "metric": f"streaming-writer throughput (flagship 3x10 MLP, "
                  f"{n_chains} chains/epoch, reference text format)",
        "value": round(nets_per_sec, 1),
        "unit": "networks/sec",
        "seconds_per_epoch_at_512_chains": round(512 / nets_per_sec, 3),
        "native_formatter": fast_text.native_available(),
    })


def _parse_eps_arg(arg: str) -> tuple:
    """The surrogate_eps_ladder CLI's eps-list contract: comma-separated
    floats (validated ascending/non-empty by the bench itself)."""
    return tuple(float(s) for s in arg.split(","))


def main():
    global _OUT
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        _OUT = os.path.abspath(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("wide_deep", "all"):
        bench_wide_deep()
    if which in ("wide_deep_bf16", "all"):
        bench_wide_deep_bf16()
    if which in ("surrogate", "all"):
        bench_surrogate()
    if which in ("surrogate_quality", "all"):
        bench_surrogate_quality()
    if which == "surrogate_quality_precond":
        # optional extra args: windows, clip_lo (the burn-in window/clip
        # ablation — see PERF_NOTES "windowed metric" table), matmul
        # precision ("high"/"highest" — the MXU staircase fix), "kahan"
        # (compensated integrator — keeps the adapter's SJD signal
        # meaningful below the f32 drift-quantization floor)
        windows = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        clip_lo = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-2
        mprec = sys.argv[4] if len(sys.argv) > 4 else None
        compd = len(sys.argv) > 5 and sys.argv[5] == "kahan"
        eps_max_arg = float(sys.argv[6]) if len(sys.argv) > 6 else None
        bench_surrogate_quality(precondition=True, windows=windows,
                                clip=(clip_lo, 1e2),
                                matmul_precision=mprec,
                                compensated=compd,
                                eps_max_override=eps_max_arg)
    if which == "surrogate_quality_exact":
        # the numerics="exact" preset through the grid path at the
        # measured 5e-5 stability-boundary ceiling (kahan + exact
        # matmuls — the recommended big-data configuration).
        # optional args: eps ceiling override, windows, metric mode.
        # Default is the identity metric ("noprecond"): the r4 ladder's
        # boundary was measured under a near-identity metric estimate
        # ([0.56, 1.50] — r4_surr_eps_ladder.json); the round-5
        # identity-metric run held accept 0.70 at eps 3.2e-5
        # (r5_surr_grid_exact_np.json) while the preconditioned 5e-5 run
        # collapsed because its epoch-63 estimate ([0.42, 7.69], taken
        # from a fleet spread by grid-top random-phase jumps) pushed
        # stiff coordinates past the boundary (r5_surr_grid_exact.json).
        # Pass "precond" to reproduce the r4-style preconditioned runs.
        eps_arg = float(sys.argv[2]) if len(sys.argv) > 2 else None
        windows = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        precond = len(sys.argv) > 4 and sys.argv[4] == "precond"
        bench_surrogate_quality(precondition=precond,
                                windows=windows,
                                numerics="exact",
                                eps_max_override=eps_arg)
    if which == "surrogate_uturn_exact":
        # governed dynamic-trajectory run under full numerics with the
        # U-turn guard sized for the governor (VERDICT round-4 #5).
        # optional args: leapfrog_max (default 256), probe schedule,
        # RM step_size_start seed (default 5e-7), metric mode. Default
        # is the identity metric ("noprecond"): attempt 1's estimate was
        # near-flat anyway ([0.603, 1.47]), and a seeded run spreads the
        # fleet fast enough by epoch 60 to hit the corrupted-estimate
        # hazard measured on the grid path (r5_surr_grid_exact.json).
        # Pass "precond" to restore the diag-metric estimate.
        lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        probe = sys.argv[3] if len(sys.argv) > 3 else "alternate"
        eps0 = float(sys.argv[4]) if len(sys.argv) > 4 else None
        precond = len(sys.argv) > 5 and sys.argv[5] == "precond"
        n_epochs = int(sys.argv[6]) if len(sys.argv) > 6 else None
        bench_surrogate_quality(precondition=precond, uturn=True,
                                uturn_probe=probe, numerics="exact",
                                leapfrog_max_override=lmax,
                                uturn_step_start=eps0,
                                epochs_override=n_epochs)
    if which == "surrogate_quality_uturn":
        precond = len(sys.argv) > 2 and sys.argv[2] == "precond"
        windows = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        probe = sys.argv[4] if len(sys.argv) > 4 else "always"
        compd = len(sys.argv) > 5 and sys.argv[5] == "kahan"
        mprec = sys.argv[6] if len(sys.argv) > 6 else None
        bench_surrogate_quality(precondition=precond, uturn=True,
                                windows=windows, uturn_probe=probe,
                                compensated=compd,
                                matmul_precision=mprec)
    if which == "surrogate_eps_ladder":
        # fixed-(eps, L) acceptance ladder under the full numerics fix:
        # brackets the exact-numerics stability boundary the grid ceiling
        # sits against (campaign r4h's 8x ceiling raise overshot it).
        # optional args: comma-separated eps list, leapfrog
        eps_arg = (_parse_eps_arg(sys.argv[2]) if len(sys.argv) > 2
                   else (2e-5, 3.2e-5, 5e-5, 8e-5, 1.25e-4))
        leap_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 15
        bench_surrogate_eps_ladder(eps_list=eps_arg, leapfrog=leap_arg)
    if which == "potential_noise":
        # ΔH noise-floor diagnostic: the MXU default-precision staircase
        # vs exact-f32 matmuls on the 1M-point target (PERF_NOTES round 4)
        bench_potential_noise()
    if which in ("classification", "all"):
        bench_classification()
    if which in ("multiclass", "all"):
        bench_multiclass()
    if which in ("ess", "all"):
        bench_ess()
    if which == "ess512":
        bench_ess(512)
    if which == "ess_groups":
        # per-chain-group adaptation (n_adapters): groups explore
        # distinct (eps, L); each epoch costs the largest group's L
        bench_ess(64, n_adapters=8)
    if which == "ess512_groups":
        bench_ess(512, n_adapters=8)
    if which == "ess1024_groups":
        bench_ess(1024, n_adapters=8)
    if which == "ess_group_sweep":
        bench_ess_group_sweep()
    if which == "ess_tempered":
        # the temperature axis as lane-level parallelism: at 64 chains the
        # flagship fills half of the 128-lane block, so a K=2 geometric
        # ladder (128 replicas) rides lanes that would otherwise idle —
        # swap-boosted mixing for near-zero marginal wall. Run the plain
        # 64-chain config and the K=2 ladder back to back for the
        # same-session comparison (cold compiles hit both equally).
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        beta_min = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
        if k < 2:
            sys.exit("usage: ess_tempered [n_chains] [k_rungs>=2] "
                     "[beta_min] — "
                     "k=1 would compare the untempered config to itself")
        rows = []
        for temper in (1, k):
            r = ess_run(n, 1, tempering=temper,
                        tempering_beta_min=beta_min)
            log(f"tempering={temper}: {r['total_ess']} ESS in "
                f"{r['wall_seconds']}s -> {r['ess_per_sec']}/s "
                f"(warm est {r['ess_per_sec_warm_est']}/s), "
                f"accept {r['accept_post_burnin']}, "
                f"swap accept {r['swap_accept_mean']}, "
                f"min-param ESS {r['min_param_ess']}")
            rows.append({k2: r[k2] for k2 in (
                "tempering", "tempering_beta_min",
                "ess_per_sec", "ess_per_sec_warm_est",
                "total_ess", "min_param_ess", "accept_post_burnin",
                "swap_accept_mean", "swap_accept_rung",
                "wall_seconds", "compile_wall_seconds")})
            emit({"metric": "ess_tempered (partial)", "sweep": rows},
                 final=False)
        emit({
            "metric": f"tempered-lane ESS/sec ({n} chains, K=1 vs K={k} "
                      f"rung ladder @ beta_min={beta_min:g}, "
                      f"flagship MLP)",
            "value": rows[-1]["ess_per_sec"],
            "unit": "effective samples/sec",
            "sweep": rows,
        })
    if which == "ess_uturn":
        # flagship fleet under NUTS-style dynamic lengths; runs through
        # the fused trajectory kernel's record_uturn variant (the kernel
        # records each chain's first U-turn step in-program). Optional
        # argv[3]: burn-in probe schedule ("always"|"alternate").
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        probe = sys.argv[3] if len(sys.argv) > 3 else "always"
        r = ess_run(n, 1, trajectory="uturn", uturn_probe=probe)
        log(f"ess_uturn[{probe}]: {r['total_ess']} ESS in "
            f"{r['wall_seconds']}s "
            f"-> {r['ess_per_sec']}/s, accept {r['accept_post_burnin']}, "
            f"final L {r['final_leapfrog']}")
        emit({
            "metric": f"ESS/sec (predictive summary, {n} chains, "
                      f"uturn dynamic trajectories, probe={probe}, "
                      f"flagship MLP)",
            "value": r["ess_per_sec"],
            "unit": "effective samples/sec",
            "uturn_probe": probe,
            **{k: r[k] for k in ("total_ess", "min_param_ess",
                                 "accept_post_burnin", "wall_seconds",
                                 "ess_per_sec_warm_est",
                                 "compile_wall_seconds",
                                 "final_leapfrog", "final_step_size")},
        })
    if which == "ess_governed":
        # governor overhead on the flagship (round-3 VERDICT weak #5):
        # max_dispatch_seconds=25 on vs off, back to back. The governed
        # run pays (a) the 2-dispatch bootstrap and (b) extra piece-size
        # compiles; steady-state (warm) walls should agree within ~5%.
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        rows = []
        for governed in (None, 25.0):
            r = ess_run(n, 1, max_dispatch_seconds=governed)
            label = "governed@25s" if governed else "ungoverned"
            log(f"{label}: {r['total_ess']} ESS in {r['wall_seconds']}s "
                f"({r['compile_wall_seconds']}s compiles) -> "
                f"{r['ess_per_sec']}/s cold, "
                f"{r['ess_per_sec_warm_est']}/s warm")
            rows.append({"governed": bool(governed), **{k2: r[k2] for k2 in (
                "ess_per_sec", "ess_per_sec_warm_est", "total_ess",
                "accept_post_burnin", "wall_seconds",
                "compile_wall_seconds", "n_dispatch_compiles",
                "dispatch_first_walls", "dispatch_warm_walls")}})
            emit({"metric": "ess_governed (partial)", "sweep": rows},
                 final=False)
        warm = [r["wall_seconds"] - r["compile_wall_seconds"] for r in rows]
        emit({
            "metric": f"dispatch-governor warm-wall overhead ({n} chains, "
                      f"flagship MLP, budget 25s vs off)",
            "value": round(warm[1] / max(warm[0], 1e-9), 4),
            "unit": "x ungoverned warm wall",
            "sweep": rows,
        })
    if which == "ess_uturn_probe":
        # the uturn probe-tax measurement (round-3 VERDICT weak #6):
        # probe=always (every burn-in chunk at ceil(l_hat*1.5)) vs
        # probe=alternate (interleaved exploit chunks at l_hat),
        # back-to-back in one session so compiles hit both equally
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        rows = []
        for probe in ("always", "alternate"):
            r = ess_run(n, 1, trajectory="uturn", uturn_probe=probe)
            log(f"probe={probe}: {r['total_ess']} ESS in "
                f"{r['wall_seconds']}s -> {r['ess_per_sec']}/s "
                f"(warm est {r['ess_per_sec_warm_est']}/s), "
                f"accept {r['accept_post_burnin']}, "
                f"final L {r['final_leapfrog']}")
            rows.append({"uturn_probe": probe, **{k2: r[k2] for k2 in (
                "ess_per_sec", "ess_per_sec_warm_est", "total_ess",
                "min_param_ess", "accept_post_burnin", "wall_seconds",
                "compile_wall_seconds", "final_leapfrog",
                # raw per-dispatch (work, wall) pairs: the probe-tax
                # anatomy (burn-in probe work vs dispatch overhead) is
                # auditable from the artifact alone
                "dispatch_first_walls", "dispatch_warm_walls")}})
            emit({"metric": "ess_uturn_probe (partial)", "sweep": rows},
                 final=False)
        emit({
            "metric": f"uturn probe-tax sweep ({n} chains, "
                      f"probe always vs alternate, flagship MLP)",
            "value": rows[-1]["ess_per_sec"],
            "unit": "effective samples/sec",
            "sweep": rows,
        })
    if which == "tempering":
        # optional args: rungs, chains
        rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        chains = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        bench_tempering(n_chains=chains, rungs=rungs)
    if which in ("writer", "all"):
        bench_writer()
    if which in ("predict", "all"):
        bench_predict()


if __name__ == "__main__":
    main()
