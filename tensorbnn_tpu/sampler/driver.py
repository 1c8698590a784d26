"""Training driver: chunked device dispatch + host adapter orchestration.

The reference's training loop round-trips Python<->device twice per epoch and
runs its GP adapter eagerly between dispatches (SURVEY.md #3.1). This driver
instead dispatches one *adapter cycle* of epochs per device call (a
``lax.scan`` built by :mod:`tensorbnn_tpu.parallel.chains`), then replays the
returned per-epoch SJD scalars through the host-side GP-UCB adapter to pick
the next cycle's (step size, leapfrog count). Chunk boundaries land exactly
on the epochs where the adapter may change its proposal (reference
paramAdapter.py:231), so the adaptation trajectory matches the reference's
per-epoch schedule.

Because step size and leapfrog count are traced arguments, the whole run
compiles at most a handful of times (distinct chunk lengths), versus the
reference's retrace on every leapfrog change.

Chains always run through the batched multi-chain path (a single chain is
just C=1): states batch as (C, D) matrices and, when a mesh is given, chain
groups shard over the ``chains`` axis with the likelihood psum'd over
``data`` (SURVEY.md #2.2). Adaptation granularity (hard part 3) is a
recorded, user-facing choice: by default ONE GP adapter consumes the
cross-chain mean SJD (every chain shares (eps, L) — one wave-front batch,
no straggler chains), while ``n_adapters=G`` runs one adapter per chain
group, each fed its group's mean SJD, with per-chain (eps, L) vectors
threading into mask-frozen integrators (sampler/hmc.py, the trajectory
kernel). Dual averaging for the hyper chain is per chain inside the carry
either way.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.io import checkpoint, reference_format
from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.parallel.chains import (
    init_multichain_state,
    make_multichain_chunk_runner,
)
from tensorbnn_tpu.parallel.mesh import DATA_AXIS, chain_sharding, \
    data_sharding
from tensorbnn_tpu.sampler.adapter import ParamAdapter
from tensorbnn_tpu.sampler.potential import flatten_state, \
    host_batch_unraveler, host_unraveler

# Deferred sample rows accumulate on device up to this many bytes before
# being handed to the background drain worker as one batched device_get
# (bounds device-side retention so deferral cannot OOM a long run; the
# 32MB batch amortizes the tunnel's per-transfer setup at its measured
# 21-36MB/s large-transfer rate — benchmarks/tunnel_probe.py). Module
# constant so tests can force tiny batches and exercise multi-submit
# FIFO ordering (tests/test_deferred_drain.py).
_DRAIN_SUBMIT_BYTES = 32 << 20


def exact_numerics_model(model: Sequential) -> Sequential:
    """The ``numerics="exact"`` preset's model half: every dense layer
    evaluated with exact-f32 matmuls (``matmul_precision="highest"``).

    TPU's *default* f32 matmul rounds operands to bf16 on the MXU, which
    turns a big-data log posterior into a staircase in theta (measured:
    78-nat steps on the 1M-point surrogate vs 0.065-nat smoothness at
    exact precision — benchmarks/PERF_NOTES.md round 4). Layers without
    a ``matmul_precision`` field (activations) pass through; layers that
    already request a precision keep it.
    """
    new_layers = []
    for layer in model.layers:
        if getattr(layer, "compute_dtype", None):
            raise ValueError(
                f"numerics='exact' conflicts with layer {layer.name!r} "
                f"compute_dtype={layer.compute_dtype!r}: exact numerics "
                "needs exact-f32 matmuls, bf16 compute asks for the "
                "opposite")
        if (hasattr(layer, "matmul_precision")
                and layer.matmul_precision is None):
            layer = dataclasses.replace(layer, matmul_precision="highest")
        new_layers.append(layer)
    return Sequential(new_layers)


def estimate_step_scale(theta, clip_lo: float = 1e-2,
                        clip_hi: float = 1e2) -> np.ndarray:
    """The driver's diag-metric recipe: per-coordinate step scale from the
    fleet's cross-chain spread, median-normalized and clipped.

    The std is computed device-side so only the ``(D,)`` vector crosses
    the tunnel, not the ``(C, D)`` fleet. Posterior anisotropy on
    data-constrained problems spans orders of magnitude (stiff likelihood
    directions vs prior-only ones) — a narrow clip neuters the metric
    (measured on the 1M-point surrogate: [0.2, 5] forced the global eps
    to the grid floor for a +20% gain; [1e-2, 1e2] lets the stiff
    directions shrink out of the stability limit). The bounds still guard
    against degenerate cross-chain estimates on unmixed coordinates.

    Shared with the surrogate eps-ladder bench
    (benchmarks/run_benchmarks.py) so the ladder cannot silently diverge
    from the driver's own recipe.
    """
    sd = np.asarray(jnp.std(theta, axis=0), np.float64)
    pos = sd[sd > 0]
    med = float(np.median(pos)) if pos.size else 1.0
    scale = np.where(sd > 0, sd / max(med, 1e-12), 1.0)
    return np.clip(scale, clip_lo, clip_hi).astype(np.float32)


@dataclasses.dataclass
class MCMCConfig:
    """Sampler configuration, mirroring reference ``setupMCMC`` kwargs
    (network.py:193-259)."""

    step_size_start: float = 1e-3
    step_size_min: float = 1e-4
    step_size_max: float = 1e-2
    step_size_options: int = 40
    leapfrog_start: int = 1000
    leapfrog_min: int = 100
    leapfrog_max: int = 10000
    leapfrog_increment: int = 1
    hyper_step_size: float = 1e-2
    hyper_leapfrog: int = 100
    burnin: int = 1000
    averaging_steps: int = 10
    a: float = 4.0
    delta: float = 0.1
    max_strikes: int = 50
    random_steps: int = 10
    adapter_seed: int = 0

    def __post_init__(self):
        if self.averaging_steps < 1:
            raise ValueError(
                f"averaging_steps must be >= 1, got {self.averaging_steps}")
        for name in ("leapfrog_start", "leapfrog_min", "leapfrog_max",
                     "hyper_leapfrog"):
            if getattr(self, name) < 1:
                raise ValueError(
                    f"{name} must be >= 1, got {getattr(self, name)}")
        for name in ("step_size_start", "step_size_min", "step_size_max",
                     "hyper_step_size"):
            if getattr(self, name) <= 0:
                raise ValueError(
                    f"{name} must be > 0, got {getattr(self, name)}")

    def make_adapter(self, seed: Optional[int] = None) -> ParamAdapter:
        return ParamAdapter(
            e1=self.step_size_start, L1=self.leapfrog_start,
            el=self.step_size_min, eu=self.step_size_max,
            e_number=self.step_size_options,
            Ll=self.leapfrog_min, Lu=self.leapfrog_max,
            l_step=self.leapfrog_increment,
            m=self.averaging_steps,
            k=self.burnin / self.averaging_steps,
            a=self.a, delta=self.delta,
            max_strikes=self.max_strikes,
            random_steps=self.random_steps,
            seed=self.adapter_seed if seed is None else seed)


@dataclasses.dataclass
class RunResult:
    """Outcome of a sampling run."""

    #: stacked posterior samples pooled over chains (leading axis = sample,
    #: chain-major: all of chain 0's samples first)
    param_samples: tuple
    hyper_samples: tuple
    lik_hyper_samples: dict
    #: per-epoch diagnostics, shape (epochs,) — cross-chain means
    sjd: np.ndarray
    main_accept: np.ndarray
    hyper_accept: np.ndarray
    #: final values for introspection / resume
    final_step_size: float
    final_leapfrog: int
    final_hyper_step: float
    n_epochs: int
    n_chains: int
    wall_time: float
    #: raw flat sample stacks: (S, C, D) / (S, C, H)
    theta_samples: np.ndarray = None
    eta_samples: np.ndarray = None
    #: per-epoch replica-swap rate (fleet mean; None unless tempering > 1)
    swap_accept: np.ndarray = None
    #: per-epoch per-rung replica-swap rate, shape ``(n_epochs, K)``
    #: (mean over the rung's chains; None unless tempering > 1). Rung
    #: ``r``'s rate counts exchanges with either neighbor (the even/odd
    #: pairing alternates per epoch), so a ladder gap that never fires
    #: shows up as adjacent rungs both near zero — the attribution the
    #: fleet mean cannot give (a mistuned ladder vs swaps firing).
    swap_accept_rung: np.ndarray = None
    #: wall seconds attributed to XLA compiles of the chunk runner (each
    #: distinct dispatch shape compiles once; estimated as the excess of
    #: every first-of-shape dispatch wall over the warm cost of the same
    #: work). 0.0 when no warm dispatch exists to calibrate against.
    #: ``wall_time - compile_wall_estimate`` approximates the steady-state
    #: wall a warm process would pay — the honest denominator for
    #: throughput metrics on backends where compiles cannot be cached
    #: across processes (axon: 5-460s per shape, CLAUDE.md).
    compile_wall_estimate: float = 0.0
    #: number of first-of-shape (compiling) dispatches observed
    n_dispatch_compiles: int = 0
    #: raw ``(work_units, wall_seconds)`` pairs behind
    #: ``compile_wall_estimate`` — every first-of-shape dispatch and every
    #: warm dispatch, in execution order — so the attribution is auditable
    #: from the artifact rather than taken on faith
    dispatch_first_walls: tuple = ()
    dispatch_warm_walls: tuple = ()
    #: wall seconds spent materializing device traces on the host
    #: (diagnostics + sample rows crossing the tunnel) — the third wall
    #: bucket next to dispatch and compile. ``wall_time`` minus
    #: ``dispatch_wall_total`` minus this is the run's untracked host
    #: time (adapter algebra, writer IO, backend/session overhead) —
    #: attributable from the artifact instead of guessed.
    trace_fetch_wall: float = 0.0

    @property
    def dispatch_wall_total(self) -> float:
        """Sum of every recorded dispatch wall (first-of-shape + warm)."""
        return (sum(w for _, w in self.dispatch_first_walls)
                + sum(w for _, w in self.dispatch_warm_walls))

    @property
    def untracked_wall(self) -> float:
        """``wall_time`` not covered by dispatches or trace fetches:
        host-side adapter algebra, writer IO, and backend/session
        overhead (tunnel warmup dominates first-in-process runs)."""
        return self.wall_time - self.dispatch_wall_total \
            - self.trace_fetch_wall

    @property
    def theta_pooled(self) -> np.ndarray:
        """(S*C, D), chain-major."""
        s, c, d = self.theta_samples.shape
        return np.transpose(self.theta_samples, (1, 0, 2)).reshape(-1, d)

    def split_rhat(self) -> np.ndarray:
        """Per-parameter split R-hat over the raw (S, C, D) stack
        (utils.diagnostics; values near 1 indicate convergence)."""
        from tensorbnn_tpu.utils.diagnostics import split_rhat
        return split_rhat(self.theta_samples)

    def multichain_ess(self, max_params: int = 256):
        """Per-parameter pooled cross-chain ESS of the parameter traces.

        Returns a :class:`~tensorbnn_tpu.utils.diagnostics.PooledEss` —
        a float equal to the worst (minimum) coordinate's pooled ESS,
        carrying ``per_param``/``median``/``argmin`` for the breakdown.
        """
        from tensorbnn_tpu.utils.diagnostics import multichain_ess
        return multichain_ess(self.theta_samples, max_params=max_params)

    def summary(self, max_params: int = 256):
        """Per-parameter convergence table (mean, sd, pooled cross-chain
        ESS, split R-hat) over the raw parameter traces — printable
        (:class:`~tensorbnn_tpu.utils.diagnostics.Summary`)."""
        from tensorbnn_tpu.utils.diagnostics import summary
        return summary(self.theta_samples, max_params=max_params)

    @property
    def eta_pooled(self) -> np.ndarray:
        s, c, h = self.eta_samples.shape
        return np.transpose(self.eta_samples, (1, 0, 2)).reshape(-1, h)


def _plan_dispatch_pieces(work: np.ndarray, cost: float,
                          budget: float) -> list:
    """Splits a chunk of per-epoch work into dispatch pieces predicted to
    stay under ``budget`` seconds at ``cost`` seconds per work unit.

    Returns ``[(offset, n_epochs), ...]`` covering ``len(work)`` epochs in
    order. A piece is either a whole in-budget remainder or a power of
    two, so the distinct piece sizes a run can produce — each a separate
    static-shape compile of the chunk runner — stay O(log chunk). Pieces
    never go below one epoch: a single over-budget epoch is dispatched
    anyway (the governor cannot split inside the epoch scan).
    """
    n_total = len(work)
    pieces = []
    off = 0
    while off < n_total:
        rem = n_total - off
        if cost * float(np.sum(work[off:])) <= budget:
            pieces.append((off, rem))
            break
        n = 1 << (rem.bit_length() - 1)
        while n > 1 and cost * float(np.sum(work[off:off + n])) > budget:
            n >>= 1
        pieces.append((off, n))
        off += n
    return pieces


def sample_posterior(model: Sequential, likelihood: Likelihood,
                     x_train, y_train, *,
                     config: MCMCConfig,
                     params: tuple, hypers: tuple,
                     key,
                     epochs: int,
                     sampling_step: int,
                     adjust_hypers: bool = True,
                     metric_list: Sequence = (),
                     x_validate=None, y_validate=None,
                     display_skip: int = 0,
                     folder_name: Optional[str] = None,
                     networks_per_file: int = 1000,
                     dtype=jnp.float32,
                     n_chains: int = 1,
                     n_adapters: int = 1,
                     chain_jitter: float = 0.0,
                     mesh=None,
                     checkpoint_dir: Optional[str] = None,
                     checkpoint_every: int = 0,
                     tracer=None,
                     use_fused: str = "auto",
                     state_layout: str = "auto",
                     data_chunk: Optional[int] = None,
                     precondition=False,
                     precondition_clip=(1e-2, 1e2),
                     precondition_windows: int = 1,
                     compensated: bool = False,
                     numerics: str = "default",
                     trajectory: str = "adapter",
                     uturn_probe: str = "alternate",
                     tempering: int = 1,
                     tempering_beta_min: float = 0.1,
                     donate: bool = False,
                     keep_samples="auto",
                     max_dispatch_seconds: Optional[float] = None,
                     verbose: bool = True) -> RunResult:
    """Runs the two-block adaptive HMC sampler.

    Argument semantics mirror reference ``network.train`` (network.py:
    509-670): epochs of main-HMC + hyper-HMC steps; posterior networks are
    recorded every ``sampling_step`` epochs after ``config.burnin``;
    ``display_skip`` controls metric printing (0 disables). New vs. the
    reference: ``n_chains`` parallel chains (vmapped; sharded over
    ``mesh``'s chain axis when given), a data-parallel likelihood over the
    mesh's data axis, and true mid-chain resume — with ``checkpoint_dir``
    set, the full sampler state (device carry, adapter, RNG, collected
    samples) is persisted every ``checkpoint_every`` chunks and a fresh call
    continues exactly where the interrupted run stopped (the reference can
    only persist samples, SURVEY.md #5).

    ``n_adapters`` splits the chains into that many equal groups, each with
    its own GP-UCB adapter (distinct random phases via ``adapter_seed + g``)
    and its own (step size, leapfrog) trajectory — SURVEY.md #7 hard part
    3's "one adapter per chain-group" option. Groups decorrelate the fleet's
    exploration, at the cost that each epoch's batch runs to the largest
    group's leapfrog count (finished chains mask-freeze inside the
    integrator). ``n_adapters=1`` (default) is the shared-adapter design:
    one adapter fed the cross-chain mean SJD.

    ``data_chunk``: when set, the likelihood value/grad accumulates over
    row chunks of that size (exact — all shipped likelihoods are
    row-additive; see sampler/potential.py), bounding activation HBM to
    ``chains x data_chunk x width``. This is how wide chain fleets run
    over big-data likelihoods on one chip (e.g. 64 chains x 1M points).

    ``precondition``: ``True`` (estimate at burnin/2) or an epoch number.
    At the first chunk boundary past the threshold, per-coordinate
    posterior scales are estimated from the cross-chain spread of theta,
    normalized to median 1 and clipped to ``precondition_clip``, then
    applied as per-coordinate leapfrog step multipliers — a
    diagonal-metric (Stan ``diag_e``) preconditioner (sampler/hmc.py).
    The GP adapter keeps tuning the global step size on top. Opt-in,
    beyond the reference; requires ``n_chains >= 8``; bypasses the
    Pallas kernels.

    ``precondition_windows``: number of metric (re-)estimations, evenly
    spread between the ``precondition`` epoch and ``config.burnin``
    (Stan's windowed warmup, simplified: each window replaces the scale
    vector with a fresh cross-chain estimate, so coordinates that mix
    only after the metric first engages get re-measured at their true
    posterior spread). The scale is a traced argument of the compiled
    chunk runner, so re-estimation costs no recompile. Estimation never
    happens after burn-in (windows collapse onto the threshold epoch if
    it is past ``burnin``), keeping the post-burn-in kernel fixed.

    ``trajectory``: ``"adapter"`` (default) tunes (step size, leapfrog)
    with the reference's GP-UCB adapter. ``"uturn"`` instead runs
    NUTS-style dynamic trajectory lengths redesigned for the batched TPU
    wave front (sampler/uturn.py): burn-in trajectories record their
    first U-turn step, the step size is dual-averaged toward 0.8
    acceptance (Stan's warmup), and after burn-in each epoch draws its
    length from the learned U-turn distribution — lengths and step size
    stay traced, so the dynamics never recompile. Beyond the reference;
    requires ``n_adapters == 1``; runs through the fused trajectory
    kernel's U-turn-recording program variant when the kernel engages.

    ``uturn_probe``: burn-in probing schedule for ``trajectory="uturn"``.
    ``"alternate"`` (default since round 5) interleaves probe chunks
    (run at ``ceil(l_hat * GROW)`` so U-turns are observed, not
    censored) with exploit chunks run at ``l_hat`` (~25% probe tax);
    only probe chunks feed the length reservoir, so exploit-chunk
    censoring never biases the distribution down (sampler/uturn.py).
    ``"always"`` probes every burn-in chunk (~50% tax). Round 4 measured
    the schedules statistically equivalent in quality with ``alternate``
    at most as expensive everywhere (benchmarks/PERF_NOTES.md round 4
    "probe tax"), which is why it is the default; trajectories are NOT
    bit-identical across schedules (version-scoped determinism policy).

    ``numerics``: ``"exact"`` is the single-switch big-data preset the
    round-4 measurements decided: Kahan-compensated integration
    (``compensated=True``) plus exact-f32 matmuls on every dense layer
    (:func:`exact_numerics_model`). Use it whenever the tuned step size
    approaches the f32 ulp of the parameter magnitude — the regime the
    one-shot runtime advisory warns about — instead of assembling the
    three flags by hand. ``"default"`` changes nothing.

    ``compensated``: Kahan-compensated main-block leapfrog accumulation
    (sampler/hmc.py) — opt in for big-data posteriors whose stable step
    size sits within a few ulps of the parameter magnitude, where the
    plain f32 drift quantizes (measured on the 1M-point surrogate:
    eps ~ 4e-8 against |theta| ~ 0.1 leaves ~3-ulp drifts, 30% per-step
    integration error) or freezes entirely. Two extra vector ops per
    leapfrog step; runs on the XLA integrators (bypasses the Pallas
    kernels, whose tiny-data regime never needs it). Off by default —
    existing runs compile the exact same programs as before.

    ``tempering``: number of parallel-tempering rungs (1 = off). With
    ``K > 1`` the fleet widens rung-major to ``K * n_chains`` replicas
    integrating as one HMC wave front; rung 0 holds the ``n_chains``
    posterior (cold) chains whose draws are the ones recorded, rung
    ``K-1`` runs at ``beta = tempering_beta_min`` (likelihood nearly
    off). Each epoch ends with an in-scan even/odd replica-swap move
    (sampler/tempering.py), and every rung gets its own GP-UCB adapter
    (the grouped-adaptation machinery with one group per rung) so hot
    rungs learn the long steps their flat targets allow. This is the
    multimodal-mixing lever — BNN posteriors carry sign-flip/permutation
    mode copies a single-temperature chain cannot tunnel between (the
    reference runs exactly one chain at one temperature). Composes with
    data parallelism — a mesh whose chains axis is 1 holds the whole
    replica fleet on every data shard, the psum'd log-likelihood keeps
    swap decisions shard-consistent, and the big-data likelihood rides
    the data-axis collective (chain-SHARDED meshes would straddle swap
    pairs; ppermute extension path documented in parallel/chains.py).
    Requires the flat state layout,
    and is incompatible with ``trajectory='uturn'``, ``precondition``,
    and ``n_adapters > 1`` (rungs own the groups). The whole replica
    fleet rides the fused trajectory kernel's power-posterior program
    when it engages (beta as a traced lane vector); only the per-step
    potential kernel — which bakes the untempered posterior — is
    excluded.

    ``max_dispatch_seconds``: wall-time budget for a single dispatched
    chunk execution. Some runtimes kill a device worker whose single XLA
    execution runs too long (the axon-tunneled TPU in this environment
    faults somewhere between ~60 and ~90 seconds — measured with a
    content-free matmul loop); long-trajectory big-data chunks (e.g.
    NUTS-style lengths over a chunked 1M-point likelihood) can cross
    that. When set, the driver learns the warm per-leapfrog-epoch cost
    from measured dispatch walls and splits any chunk predicted to
    exceed the budget into power-of-two sub-dispatches (so the set of
    distinct static chunk sizes — and therefore remote compiles — stays
    O(log chunk)). The split changes only the dispatch pattern: every
    epoch runs the same (step size, leapfrog) and the carry evolves
    through the same scan steps, so results are bit-identical to an
    ungoverned run. Cost learning uses only warm walls (a
    first-of-size dispatch includes its compile, which would corrupt
    the estimate); until the first warm wall lands, chunks are
    dispatched one epoch at a time — an unguarded full chunk could
    already exceed the budget (the uturn censoring ratchet can inflate
    trajectory lengths within the very first chunks).
    """
    t_start = time.time()
    if numerics not in ("default", "exact"):
        raise ValueError(
            f"numerics must be 'default' or 'exact', got {numerics!r}")
    if numerics == "exact":
        # the single-switch big-data preset: Kahan integration + exact-f32
        # matmuls (the round-4 measured recommendation — PERF_NOTES)
        compensated = True
        model = exact_numerics_model(model)
    if n_adapters < 1 or n_chains % n_adapters:
        raise ValueError(
            f"n_adapters ({n_adapters}) must be >= 1 and divide "
            f"n_chains ({n_chains})")
    if trajectory not in ("adapter", "uturn"):
        raise ValueError(
            f"trajectory must be 'adapter' or 'uturn', got {trajectory!r}")
    traj_uturn = trajectory == "uturn"
    if traj_uturn and n_adapters != 1:
        raise ValueError(
            "trajectory='uturn' shares one dynamic length schedule "
            "across the fleet (one wave front); it is incompatible with "
            "n_adapters > 1")
    if tempering < 1:
        raise ValueError(f"tempering must be >= 1, got {tempering}")
    tempering_beta = None
    fleet_chains = n_chains
    if tempering > 1:
        if mesh is not None:
            from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS as _CA
            if mesh.shape[_CA] > 1:
                raise ValueError(
                    "tempering requires the mesh chains axis to be 1: "
                    "replica swaps pair rung blocks across the chain "
                    "axis and would straddle chain shards (ppermute "
                    "extension path documented in parallel/chains.py). "
                    "Data-parallel tempering (chains axis 1, data axis "
                    "> 1) is supported — replicas are whole on every "
                    "data shard and the psum'd log-likelihood makes "
                    "swap decisions shard-consistent")
        if traj_uturn:
            raise ValueError(
                "tempering is incompatible with trajectory='uturn' (the "
                "shared U-turn schedule would mix feedback across "
                "temperatures; each rung needs its own trajectory tuning, "
                "which the per-rung GP adapters provide)")
        if n_adapters != 1:
            raise ValueError(
                "tempering assigns one adapter group per rung; it is "
                "incompatible with an explicit n_adapters > 1")
        if precondition is not False and precondition is not None:
            raise ValueError(
                "tempering is incompatible with precondition: the "
                "cross-chain spread mixes temperatures, and the diagonal "
                "metric was measured to hurt multimodal targets "
                "(benchmarks/PERF_NOTES.md)")
        if state_layout == "tree":
            raise ValueError(
                "tempering requires the flat state layout")
        state_layout = "flat"
        from tensorbnn_tpu.sampler.tempering import make_ladder
        ladder = make_ladder(tempering, tempering_beta_min)
        fleet_chains = n_chains * tempering
        tempering_beta = (tempering, np.repeat(ladder, n_chains))
    x_train = jnp.asarray(x_train, dtype)
    y_train = jnp.asarray(y_train, dtype)

    if mesh is not None:
        n_data = mesh.shape[DATA_AXIS]
        if x_train.shape[0] % n_data:
            raise ValueError(
                f"training rows {x_train.shape[0]} must divide the data "
                f"axis ({n_data}); pad the dataset")
        from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS
        n_chain_dev = mesh.shape[CHAIN_AXIS]
        if n_chains % n_chain_dev:
            raise ValueError(
                f"n_chains ({n_chains}) must be a multiple of the mesh "
                f"chains axis ({n_chain_dev})")
        x_train = jax.device_put(x_train, data_sharding(mesh))
        y_train = jax.device_put(y_train, data_sharding(mesh))

    lik_hypers = likelihood.init_hypers(dtype)
    flat = flatten_state(params, hypers, lik_hypers)
    # host-side unravel for the streaming writer (numpy, no JAX dispatch
    # in the per-network loop)
    unravel_theta_np = host_unraveler(params)
    unravel_eta_np = host_unraveler((hypers, lik_hypers))

    # Fused Pallas potential (chains-on-lanes likelihood value+grad) when
    # the model matches the kernel's scope and fits VMEM. "auto" enables it
    # on TPU only; use_fused=True forces it (interpret mode off-TPU, for
    # tests). Under a mesh the kernel consumes the local data shard and its
    # (value, grad) pair is psum'd over the data axis (VERDICT round-1 #2).
    # diagonal-metric preconditioning (opt-in, beyond the reference):
    # `precondition=True` (or an epoch number) estimates per-coordinate
    # posterior scales from the cross-chain spread at the first chunk
    # boundary past the threshold and folds them into the leapfrog as
    # per-coordinate step multipliers (exactly Stan's diag_e metric; see
    # sampler/hmc.py). Needs a fleet to estimate from, and bypasses the
    # scalar-eps Pallas kernels.
    precond_at = None
    if precondition is not False and precondition is not None:
        # (explicit False/None test: precondition=0 is a valid epoch
        # threshold meaning "estimate at the first chunk boundary")
        if n_chains < 8:
            raise ValueError(
                f"precondition needs n_chains >= 8 to estimate "
                f"per-coordinate scales from the cross-chain spread "
                f"(got {n_chains})")
        precond_at = (config.burnin // 2 if precondition is True
                      else int(precondition))
        if use_fused is True:
            raise ValueError(
                "precondition is incompatible with use_fused=True (the "
                "Pallas kernels take a scalar step size); use "
                "use_fused='auto' or False")
        use_fused = False
    if compensated:
        if use_fused is True:
            raise ValueError(
                "compensated is incompatible with use_fused=True (the "
                "Pallas kernels integrate in-program without the "
                "compensation carries); use use_fused='auto' or False")
        # the fused kernels only engage in the tiny-data regime, where
        # eps sits orders of magnitude clear of the f32 quantization
        # edge — compensated runs are big-data runs on the XLA path
        use_fused = False
    clip_lo, clip_hi = (float(precondition_clip[0]),
                        float(precondition_clip[1]))
    if not (0 < clip_lo <= clip_hi):
        raise ValueError(
            f"precondition_clip must satisfy 0 < lo <= hi, got "
            f"({clip_lo}, {clip_hi})")
    if precondition_windows < 1:
        raise ValueError(
            f"precondition_windows must be >= 1, got "
            f"{precondition_windows}")
    # estimation epochs: evenly spaced from the threshold to burnin (the
    # kernel must be fixed once sampling starts, so no window lands past
    # burnin — if the threshold itself is past burnin, a single estimate
    # fires there, preserving the documented single-window behavior)
    precond_epochs: List[int] = []
    if precond_at is not None:
        span = max(config.burnin - precond_at, 0)
        precond_epochs = sorted(
            {precond_at + (k * span) // precondition_windows
             for k in range(precondition_windows)})
    windows_fired = 0

    batched_main_vg = None
    batched_main_traj = None
    tempered_run = tempering > 1
    on_tpu = jax.default_backend() == "tpu"
    if use_fused is True or (use_fused == "auto" and on_tpu):
        from tensorbnn_tpu.ops.fused_mlp import try_build_fused_main_vg
        if mesh is None:
            local_chains = fleet_chains
            local_rows = int(x_train.shape[0])
            axis_name = None
        else:
            from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS
            # fleet_chains == n_chains except under tempering, where the
            # rung-major replica fleet (chains axis pinned to 1) widens
            # the per-device chain block
            local_chains = fleet_chains // mesh.shape[CHAIN_AXIS]
            local_rows = int(x_train.shape[0]) // mesh.shape[DATA_AXIS]
            axis_name = DATA_AXIS
        block_c = local_chains if (local_chains <= 512
                                   or local_chains % 512) else 512
        auto = use_fused == "auto"
        if not tempered_run:
            # the per-step potential kernel bakes the untempered
            # posterior; tempered fleets use the trajectory kernel's
            # power-posterior program below or fall back to XLA
            batched_main_vg = try_build_fused_main_vg(
                model, likelihood, flat.unravel_theta, flat.unravel_eta,
                x_train, y_train, eta_dim=flat.eta.size,
                block_c=block_c, interpret=not on_tpu,
                axis_name=axis_name, n_rows=local_rows,
                require_profitable=auto)
        if mesh is None or mesh.shape[DATA_AXIS] == 1:
            # whole-trajectory kernel: all L leapfrog steps in one Pallas
            # program. A psum cannot run inside it, so it needs the full
            # data batch on every device — true single-chip AND on
            # chain-only meshes (data axis 1: each chain shard holds the
            # whole dataset, the production chain-parallel fleet layout).
            # uturn mode builds the kernel's U-turn-recording program
            # variant, so dynamic trajectories keep the fast path
            from tensorbnn_tpu.ops.fused_mlp import \
                try_build_fused_trajectory
            batched_main_traj = try_build_fused_trajectory(
                model, likelihood, flat.unravel_theta, flat.unravel_eta,
                x_train, y_train, eta_dim=flat.eta.size,
                block_c=block_c, interpret=not on_tpu,
                n_rows=local_rows, require_profitable=auto,
                record_uturn=traj_uturn, tempered=tempered_run)
        if verbose:
            if batched_main_traj is not None:
                print("fused Pallas trajectory kernel enabled")
            elif batched_main_vg is not None:
                print("fused Pallas potential kernel enabled")

    # state layout: wide-model and big-data runs skip the per-leapfrog
    # ravel round-trip by keeping the chain state as a pytree inside the
    # scan — measured 2.1x on 10x256 and 7.5x on the 1M-point surrogate,
    # where the flat gradient concat blocks XLA's fusion of the data-sized
    # backward matmuls (benchmarks/PERF_NOTES.md)
    if state_layout == "auto":
        big_model = flat.theta.size >= 32768
        big_data = int(x_train.shape[0]) >= 65536
        state_layout = ("tree" if (batched_main_vg is None
                                   and batched_main_traj is None
                                   and (big_model or big_data))
                        else "flat")

    # fused hyper-trajectory kernel: all hyper_leapfrog steps of the
    # stats-potential hyper block in one Mosaic program (the XLA
    # while_loop runs them as hundreds of tiny latency-bound fusions on
    # (C, H)-sized planes). Scope = the stats potential's; flat layout
    # only (the tree layout keeps eta flat too, but its runs are
    # big-data bound where the hyper block is negligible next to the
    # likelihood).
    batched_hyper_traj = None
    if (adjust_hypers and state_layout == "flat"
            and (use_fused is True
                 or (use_fused == "auto" and on_tpu))):
        from tensorbnn_tpu.ops.fused_hyper import \
            try_build_fused_hyper_trajectory
        if mesh is None:
            block_ch = fleet_chains
        else:
            from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS
            block_ch = fleet_chains // mesh.shape[CHAIN_AXIS]
        block_ch = block_ch if (block_ch <= 512 or block_ch % 512) else 512
        batched_hyper_traj = try_build_fused_hyper_trajectory(
            model, likelihood, flat.unravel_eta, flat.eta.size,
            config.hyper_leapfrog, block_c=block_ch,
            interpret=not on_tpu)
        if verbose and batched_hyper_traj is not None:
            print("fused Pallas hyper-trajectory kernel enabled")

    def _build_runner(step_scale=None):
        return make_multichain_chunk_runner(
            model, likelihood, x_train, y_train,
            flat.unravel_theta, flat.unravel_eta,
            adjust_hypers=adjust_hypers,
            hyper_leapfrog=config.hyper_leapfrog,
            burnin=float(config.burnin),
            hyper_step_size_init=config.hyper_step_size,
            mesh=mesh,
            # buffer donation crashes the axon PJRT backend at runtime
            # (INVALID_ARGUMENT on the donated carry); opt-in only
            donate=donate,
            batched_main_vg=batched_main_vg,
            batched_main_traj=batched_main_traj,
            batched_hyper_traj=batched_hyper_traj,
            state_layout=state_layout,
            # exact chunked likelihood accumulation: bounds activation HBM
            # to chains x data_chunk x width for big-data runs (the fused
            # kernels, if any matched above, consume whole batches and are
            # unaffected — they only engage in the tiny-data regime anyway)
            data_chunk=data_chunk,
            step_scale=step_scale,
            compensated=compensated,
            # preconditioned runs take the scale as a traced argument so
            # each burn-in window's re-estimate swaps in for free (no
            # retrace — remote compiles cost 5-460s through axon)
            traced_step_scale=precond_at is not None,
            record_uturn=traj_uturn,
            per_epoch_leapfrog=traj_uturn,
            tempering_beta=tempering_beta,
            # rung-major tempering reuses the grouped (per-chain eps/L)
            # path: one adapter group per rung
            per_chain_adapt=n_adapters > 1 or tempering > 1)

    step_scale = None  # (D,) numpy once estimated/restored
    ones_scale = np.ones(flat.theta.size, np.float32)
    run_chunk = _build_runner()

    carry = init_multichain_state(flat.theta, flat.eta, key,
                                  config.hyper_step_size, fleet_chains,
                                  dtype, jitter=chain_jitter)
    if mesh is not None:
        carry = jax.device_put(carry, chain_sharding(mesh))
    n_grp = tempering if tempering > 1 else n_adapters
    grp_chains = fleet_chains // n_grp
    adapters = [config.make_adapter(seed=config.adapter_seed + g
                                    if n_grp > 1 else None)
                for g in range(n_grp)]
    uturn_ad = None
    if traj_uturn:
        from tensorbnn_tpu.sampler.uturn import UTurnAdapter
        uturn_ad = UTurnAdapter(
            step_size_start=config.step_size_start,
            step_size_min=config.step_size_min,
            step_size_max=config.step_size_max,
            leapfrog_start=config.leapfrog_start,
            leapfrog_min=config.leapfrog_min,
            leapfrog_max=config.leapfrog_max,
            burnin=config.burnin, seed=config.adapter_seed,
            probe=uturn_probe)

    step_sizes = np.full(n_grp, config.step_size_start, np.float64)
    leapfrogs = np.full(n_grp, config.leapfrog_start, np.int64)

    theta_samples: List[np.ndarray] = []
    eta_samples: List[np.ndarray] = []
    sjds: List[np.ndarray] = []
    main_accepts: List[np.ndarray] = []
    hyper_accepts: List[np.ndarray] = []
    swap_accepts: List[np.ndarray] = []  # tempering only
    swap_rung_accepts: List[np.ndarray] = []  # tempering only, (chunk, K)

    # memory policy: long wide multi-chain runs cannot buffer the whole
    # posterior on host (the reference streams to disk, network.py:647-663).
    # "auto" keeps samples in memory below ~2GB projected, else streams.
    n_expected = sum(1 for e in range(1, epochs + 1)
                     if e > config.burnin and e % sampling_step == 0)
    projected = n_expected * n_chains * (flat.theta.size
                                         + flat.eta.size) * 4
    if keep_samples == "auto":
        keep_samples = projected < (2 << 30)
    if not keep_samples and folder_name is None and n_expected > 0:
        raise ValueError(
            f"keep_samples=False (or 'auto' with a ~{projected / 1e9:.1f}GB "
            f"projected posterior) with folder_name=None would discard "
            f"every sampled network; pass folder_name= to stream to disk "
            f"or keep_samples=True to buffer in memory")
    # the streaming writer is created after the resume load below so an
    # interrupted streamed run can truncate its files back to the
    # checkpoint and continue appending (writer state lives in the
    # checkpoint's host_state)
    streaming = folder_name is not None and not keep_samples
    writer = None

    iter_ = 0  # completed epochs, reference 1-based bookkeeping
    # incremental checkpointing: samples already persisted in
    # resume_seg{i}.npz files (so each checkpoint writes O(new) bytes,
    # not the whole accumulated history)
    n_segments = 0
    samples_checkpointed = 0

    # identifies the run a checkpoint belongs to: resuming with a different
    # config/model/chain-count would silently produce a wrong trajectory,
    # so the fingerprint is persisted and validated on load
    # windows/clip at their defaults keep the round-3 fingerprint value
    # (a plain epoch int) so earlier preconditioned checkpoints resume
    fp_precond = precond_at
    if precond_at is not None and (precondition_windows != 1
                                   or (clip_lo, clip_hi) != (1e-2, 1e2)):
        fp_precond = (f"{precond_at}/w{precondition_windows}"
                      f"/clip{clip_lo:g},{clip_hi:g}")
    fingerprint = _run_fingerprint(config, model, likelihood, flat,
                                   n_chains, sampling_step, dtype,
                                   n_adapters=n_adapters,
                                   precondition=fp_precond,
                                   # off-default probe schedules / the
                                   # compensated integrator change the
                                   # trajectory -> fingerprinted
                                   trajectory=((f"{trajectory}:{uturn_probe}"
                                                if traj_uturn
                                                and uturn_probe != "always"
                                                else trajectory)
                                               + ("+kahan" if compensated
                                                  else "")),
                                   tempering=(
                                       f"{tempering}@{tempering_beta_min:g}"
                                       if tempering > 1 else None))

    # -- resume from a checkpoint if one exists ---------------------------------
    resumed = checkpoint.load_resume(checkpoint_dir) if checkpoint_dir \
        else None
    if resumed is not None:
        arrays, host = resumed
        saved_fp = host.get("fingerprint")
        if saved_fp is not None and saved_fp != fingerprint:
            diffs = sorted(k for k in set(fingerprint) | set(saved_fp)
                           if saved_fp.get(k) != fingerprint.get(k))
            raise ValueError(
                f"checkpoint in {checkpoint_dir} was written by a run with "
                f"a different {', '.join(diffs)}; resuming it under this "
                f"configuration would produce a wrong trajectory (delete "
                f"the checkpoint to start fresh)")
        from tensorbnn_tpu.sampler.gibbs import ChainState
        key_restored = jax.random.wrap_key_data(
            jnp.asarray(arrays["key"]))
        carry = ChainState(
            theta=jnp.asarray(arrays["theta"], dtype),
            eta=jnp.asarray(arrays["eta"], dtype),
            key=key_restored,
            hyper_step=jnp.asarray(arrays["hyper_step"], dtype),
            log_eps_bar=jnp.asarray(arrays["log_eps_bar"], dtype),
            h=jnp.asarray(arrays["h"], dtype),
            epoch=jnp.asarray(arrays["epoch"], dtype))
        if mesh is not None:
            carry = jax.device_put(carry, chain_sharding(mesh))
        saved_adapters = host["adapter"]
        if not isinstance(saved_adapters, list):
            saved_adapters = [saved_adapters]
        if len(saved_adapters) != n_grp:
            # fingerprinted checkpoints raise above; this catches legacy
            # ones (no fingerprint) resumed under a different n_adapters
            raise ValueError(
                f"checkpoint in {checkpoint_dir} holds "
                f"{len(saved_adapters)} adapter state(s) but this run has "
                f"n_adapters={n_grp}; resume with the original adapter "
                f"count (or delete the checkpoint to start fresh)")
        for a, st in zip(adapters, saved_adapters):
            a.load_state_dict(st)
        saved_scale = host.get("step_scale")
        if saved_scale is not None:
            step_scale = np.asarray(saved_scale, np.float32)
            if precond_at is None:
                # token-less legacy checkpoint resumed without
                # precondition= set: keep honoring its metric through the
                # baked-closure runner (fingerprinted checkpoints can't
                # get here — the mismatch raises above)
                run_chunk = _build_runner(step_scale)
        windows_fired = int(host.get(
            "precond_windows_fired",
            1 if saved_scale is not None else 0))
        if uturn_ad is not None and host.get("uturn_adapter") is not None:
            uturn_ad.load_state_dict(host["uturn_adapter"])
        iter_ = int(host["iter"])
        step_sizes = np.atleast_1d(
            np.asarray(host["step_size"], np.float64))
        leapfrogs = np.atleast_1d(np.asarray(host["leapfrog"], np.int64))
        n_segments = int(host.get("n_segments", 0))
        if n_segments:
            theta_samples, eta_samples = checkpoint.load_sample_segments(
                checkpoint_dir, n_segments)
            samples_checkpointed = len(theta_samples)
        else:
            # legacy checkpoints carried the whole history in resume.npz;
            # leave samples_checkpointed at 0 so the FIRST new-style
            # checkpoint persists that entire history into segment 0 —
            # otherwise the segment would hold only post-resume samples
            # and a later resume would silently drop the legacy prefix
            theta_samples = [a for a in arrays.get(
                "theta_samples", np.zeros((0, 1, 1)))]
            eta_samples = [a for a in arrays.get(
                "eta_samples", np.zeros((0, 1, 1)))]
        if streaming:
            writer = reference_format.RunWriter(
                folder_name, model, likelihood, networks_per_file,
                resume_state=host.get("writer"))
        if verbose:
            print(f"resumed from {checkpoint_dir} at epoch {iter_}")

    if streaming and writer is None:
        writer = reference_format.RunWriter(
            folder_name, model, likelihood, networks_per_file)
        if verbose:
            print(f"streaming samples to {folder_name} "
                  f"(~{projected / 1e9:.1f}GB posterior exceeds the "
                  f"in-memory budget; multichain disk order is time-major "
                  f"with per-network chain ids in chains.txt — the "
                  f"Predictor reorders to chain-major on load)")

    # Deferred sample materialization: without a streaming writer, the
    # bulk sample rows are consumed only at checkpoints and at the end of
    # the run — so mid-run they stay ON DEVICE as per-chunk cold-chain
    # slices and stream to host on a single background worker thread in
    # batched device_gets, overlapped with subsequent chunk dispatches
    # (measured: transfers and dispatches overlap through the tunnel —
    # serial 4.46s vs overlapped 2.94s on a 105MB fetch behind 6
    # dispatches; benchmarks/tunnel_probe.py. Large transfers run at only
    # ~21-36MB/s here, so the flagship's ~260MB posterior costs ~10s that
    # this hides. NOTE: copy_to_host_async() is NOT used — through axon
    # it wedges the transfer for ~4.5 minutes). Round 4 spent 41.3s of
    # the flagship quality block's 97.1s wall on per-chunk row fetches
    # (VERDICT r4 #1); pending bytes between submits are bounded so the
    # deferral cannot OOM a long run.
    defer_rows = bool(keep_samples)
    pending_theta: List = []   # device (k, C, D) slices, epoch-ordered
    pending_eta: List = []
    pending_bytes = 0
    pending_submit_bytes = _DRAIN_SUBMIT_BYTES
    drain_pool = None          # lazy single-thread executor (FIFO order)
    drain_futures: List = []

    def _submit_pending():
        """Hands the accumulated device slices to the drain worker."""
        nonlocal pending_bytes, pending_theta, pending_eta, drain_pool
        if not pending_theta:
            return
        if drain_pool is None:
            import concurrent.futures
            drain_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="sample-drain")
        drain_futures.append(
            drain_pool.submit(jax.device_get,
                              (pending_theta, pending_eta)))
        pending_theta, pending_eta = [], []
        pending_bytes = 0

    def _drain_pending():
        """Blocks until every submitted drain landed; appends rows in
        epoch order (single worker -> FIFO completion order)."""
        nonlocal fetch_wall
        _submit_pending()
        if not drain_futures:
            return
        t0 = time.perf_counter()
        for fut in drain_futures:
            got_th, got_et = fut.result()
            for th_c, et_c in zip(got_th, got_et):
                for i in range(th_c.shape[0]):
                    theta_samples.append(th_c[i])
                    eta_samples.append(et_c[i])
        drain_futures.clear()
        # only the blocking wait counts as fetch wall: the transfers
        # themselves ran behind earlier dispatches
        fetch_wall += time.perf_counter() - t0

    def _save_checkpoint():
        nonlocal n_segments, samples_checkpointed
        _drain_pending()
        # one batched device_get (single tunnel round-trip) per checkpoint
        arrays = jax.device_get({
            "theta": carry.theta,
            "eta": carry.eta,
            "key": jax.random.key_data(carry.key),
            "hyper_step": carry.hyper_step,
            "log_eps_bar": carry.log_eps_bar,
            "h": carry.h,
            "epoch": carry.epoch,
        })
        # only samples accumulated since the last checkpoint go to disk
        # (segment is written before resume.json references it, so a
        # crash in between leaves an ignored trailing file, not a
        # truncated history)
        if len(theta_samples) > samples_checkpointed:
            checkpoint.save_sample_segment(
                checkpoint_dir, n_segments,
                np.stack(theta_samples[samples_checkpointed:]),
                np.stack(eta_samples[samples_checkpointed:]))
            n_segments += 1
            samples_checkpointed = len(theta_samples)
        checkpoint.save_resume(
            checkpoint_dir,
            carry_arrays=arrays,
            host_state={
                "n_segments": n_segments,
                "adapter": (adapters[0].state_dict() if n_grp == 1
                            else [a.state_dict() for a in adapters]),
                "iter": iter_,
                "step_size": (float(step_sizes[0]) if n_grp == 1
                              else [float(s) for s in step_sizes]),
                "leapfrog": (int(leapfrogs[0]) if n_grp == 1
                             else [int(v) for v in leapfrogs]),
                "writer": (writer.state_dict() if writer is not None
                           else None),
                "step_scale": (None if step_scale is None
                               else [float(s) for s in step_scale]),
                "precond_windows_fired": windows_fired,
                "uturn_adapter": (uturn_ad.state_dict()
                                  if uturn_ad is not None else None),
                "fingerprint": fingerprint})

    chunks_done = 0
    # dispatch-time governor state (see max_dispatch_seconds above):
    # warm seconds per main-leapfrog-epoch, and the static chunk sizes
    # already compiled (their first walls include the compile and are
    # excluded from the estimate)
    disp_cost = None
    disp_sizes_seen = set()
    # per-dispatch (work, wall) split by compile temperature: a dispatch
    # size seen before runs warm; a first-of-size dispatch pays the
    # remote compile. Feeds RunResult.compile_wall_estimate.
    disp_first_walls = []
    disp_warm_walls = []
    # host materialization of device traces (diagnostics rows + sample
    # rows crossing the tunnel): the third wall bucket next to dispatch
    # and compile, so end-to-end wall gaps are attributable from the
    # artifact instead of guessed (measured round 4: a first-in-process
    # run logged 906s against ~17s of dispatch walls — the excess was
    # exactly this untracked host/tunnel time). Attribution caveat
    # through remote tunnels: block_until_ready can return before the
    # execution drains, so any execute tail the dispatch bucket missed
    # lands here with the first synchronous fetch.
    fetch_wall = 0.0
    # one-shot f32 numerics advisory (see check below)
    numerics_advised = compensated
    while iter_ < epochs:
        if (precond_at is not None and windows_fired < len(precond_epochs)
                and iter_ >= precond_epochs[windows_fired]):
            # (re-)estimate per-coordinate scales from the fleet's spread;
            # the scale is a traced runner argument, so no recompile
            step_scale = estimate_step_scale(carry.theta, clip_lo, clip_hi)
            # consume every window whose epoch has passed (one estimate
            # covers them all — a long adapter cycle can skip several)
            windows_fired = max(windows_fired + 1,
                                sum(1 for e in precond_epochs
                                    if e <= iter_))
            if verbose:
                print(f"preconditioner estimate "
                      f"{windows_fired}/{len(precond_epochs)} at epoch "
                      f"{iter_}: scale range [{step_scale.min():.3g}, "
                      f"{step_scale.max():.3g}]")
        if traj_uturn:
            # burn-in runs short chunks (tight dual-averaging cadence,
            # boundary landing exactly on the burn-in crossing so the
            # step size freezes cleanly); sampling runs long ones
            if iter_ < config.burnin:
                chunk = min(max(1, config.averaging_steps),
                            config.burnin - iter_, epochs - iter_)
            else:
                chunk = min(50, epochs - iter_)
            eps_now, leap_vec = uturn_ad.plan_chunk(iter_, chunk)
            step_sizes[0] = float(eps_now)
            leapfrogs[0] = int(np.median(leap_vec))
        else:
            chunk = min(min(a.epochs_until_next_change()
                            for a in adapters),
                        epochs - iter_)
        if tracer is not None:
            tracer.start_chunk()
        if traj_uturn:
            eps_arg = jnp.asarray(float(step_sizes[0]), dtype)
            leap_arg = jnp.asarray(leap_vec, jnp.int32)
        elif n_grp == 1:
            eps_arg = jnp.asarray(float(step_sizes[0]), dtype)
            leap_arg = jnp.asarray(int(leapfrogs[0]), jnp.int32)
        else:
            eps_arg = jnp.asarray(np.repeat(step_sizes, grp_chains), dtype)
            leap_arg = jnp.asarray(np.repeat(leapfrogs, grp_chains),
                                   jnp.int32)
        scale_arg = None
        if precond_at is not None:
            scale_arg = jnp.asarray(ones_scale if step_scale is None
                                    else step_scale)

        # per-epoch main-chain work units for the dispatch governor: the
        # straggler group's L is what the whole wave front pays
        if traj_uturn:
            disp_work = np.asarray(leap_vec, np.float64)
        else:
            disp_work = np.full(chunk, float(np.max(leapfrogs)))
        pieces = [(0, chunk)]
        bootstrapping = False
        if max_dispatch_seconds is not None:
            if disp_cost is not None:
                pieces = _plan_dispatch_pieces(disp_work, disp_cost,
                                               max_dispatch_seconds)
            elif chunk > 1:
                # bootstrap: no cost estimate exists yet, and an
                # unguarded full chunk can already exceed the budget —
                # the uturn censoring ratchet inflates trajectory
                # lengths within the very first chunks (observed: a
                # 10-epoch uturn chunk over the chunked 1M-point
                # likelihood ratcheted to L=64 ~ 64s, the axon worker
                # was killed mid-execution and the client hung forever).
                # Dispatch single epochs ONLY until a warm wall yields
                # the cost estimate — the second size-1 dispatch (or the
                # first, when size 1 compiled in an earlier chunk) —
                # then re-plan the chunk remainder at governed sizes.
                # Dispatching singly to the END of the chunk would
                # re-create the reference's per-epoch host round-trip
                # pattern for the whole first chunk (network.py:509-670).
                pieces = [(j, 1) for j in range(chunk)]
                bootstrapping = True
        # governed (multi-piece) chunks must block per piece: the cost
        # model learns from per-piece walls and an unbounded in-flight
        # queue is exactly what the governor exists to prevent. The
        # ungoverned single-piece path skips the extra block RPC — the
        # batched device_get right after the loop is the completion
        # marker (through axon every blocking call is a fresh ~25-55ms
        # round-trip; 130 chunks of them cost ~7s of the flagship wall),
        # and its end-time closes the dispatch wall instead.
        sync_pieces = len(pieces) > 1 or max_dispatch_seconds is not None
        deferred_piece = None   # (work, d_n, t_disp) for the async path
        sub_traces = []
        pending = list(pieces)
        while pending:
            d_off, d_n = pending.pop(0)
            d_leap = (leap_arg[d_off:d_off + d_n] if traj_uturn
                      else leap_arg)
            t_disp = time.perf_counter()
            if scale_arg is not None:
                carry, tr = run_chunk(carry, x_train, y_train, eps_arg,
                                      d_leap, scale_arg, d_n)
            else:
                carry, tr = run_chunk(carry, x_train, y_train, eps_arg,
                                      d_leap, d_n)
            work_d = float(np.sum(disp_work[d_off:d_off + d_n]))
            if not sync_pieces:
                deferred_piece = (work_d, d_n, t_disp)
                sub_traces.append(tr)
                continue
            jax.block_until_ready(tr.sjd)
            wall_d = time.perf_counter() - t_disp
            if d_n in disp_sizes_seen:
                # warm execution: the wall is pure device+transfer time
                # (a first-of-size call includes the compile, which
                # would corrupt the cost estimate)
                disp_warm_walls.append((work_d, wall_d))
                if max_dispatch_seconds is not None:
                    disp_cost = wall_d / max(work_d, 1.0)
            else:
                disp_first_walls.append((work_d, wall_d))
            disp_sizes_seen.add(d_n)
            sub_traces.append(tr)
            if bootstrapping and disp_cost is not None:
                done = d_off + d_n
                if done < chunk:
                    pending = [(done + o, n) for o, n in
                               _plan_dispatch_pieces(
                                   disp_work[done:], disp_cost,
                                   max_dispatch_seconds)]
                bootstrapping = False
        trace = (sub_traces[0] if len(sub_traces) == 1 else
                 jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                              *sub_traces))

        # rows the host needs, host-known before any fetch. Display rows
        # (chain 0 only — tiny) always join the per-chunk batched fetch;
        # sampling rows join it only when a streaming writer consumes
        # them mid-run, otherwise they accumulate on device (see
        # _drain_pending above). The full (chunk, C, D) trace never
        # crosses the tunnel.
        samp_rows, disp_rows = set(), set()
        for j in range(chunk):
            e = iter_ + j + 1
            if ((keep_samples or writer is not None)
                    and e > config.burnin and e % sampling_step == 0):
                samp_rows.add(j)
            if display_skip and e % display_skip == 0 and verbose:
                disp_rows.add(j)
        need_rows = disp_rows if defer_rows else (samp_rows | disp_rows)

        # ONE batched device->host materialization per chunk: every
        # host-needed output (diagnostics + sampled rows) crosses the
        # tunnel in a single jax.device_get, which starts async copies on
        # every leaf before awaiting any. The previous per-array
        # np.asarray pattern paid a fresh ~30-60ms round-trip each (4-7
        # per chunk; round 4 measured 41.3s of the flagship quality
        # block's 97.1s wall in this bucket — benchmarks/captures/
        # r4_bench_tempered.json, VERDICT round-4 #1).
        t_fetch = time.perf_counter()
        fetch_dev = {"sjd": trace.sjd,              # (chunk, C)
                     "m_acc": trace.main_accept,    # (chunk, C)
                     "h_acc": trace.hyper_accept}
        if tempering > 1 and trace.swap_accept is not None:
            fetch_dev["swap"] = trace.swap_accept   # (chunk, K*C)
        if traj_uturn:
            fetch_dev["uturn"] = trace.uturn
        if need_rows:
            # cold chains only (device-side slice: hot tempering replicas
            # never cross the tunnel); in deferred mode these are the
            # chain-0 display rows only
            idx = jnp.asarray(sorted(need_rows))
            width = 1 if defer_rows else n_chains
            fetch_dev["th_rows"] = trace.theta[idx, :width]
            fetch_dev["et_rows"] = trace.eta[idx, :width]
        if defer_rows and samp_rows:
            # device-side cold-chain slice held for a later batched drain
            s_idx = jnp.asarray(sorted(samp_rows))
            th_c = trace.theta[s_idx, :n_chains]
            et_c = trace.eta[s_idx, :n_chains]
            pending_theta.append(th_c)
            pending_eta.append(et_c)
            pending_bytes += th_c.nbytes + et_c.nbytes
        fetched = jax.device_get(fetch_dev)
        t_got = time.perf_counter()
        if deferred_piece is not None:
            # async single-piece path: the get doubles as the completion
            # marker, so dispatch-to-materialization is the chunk's
            # dispatch wall (the ~30ms get RTT rides inside it) and the
            # fetch bucket records only the sample-drain waits
            work_d, d_n, t_disp = deferred_piece
            wall_d = t_got - t_disp
            if d_n in disp_sizes_seen:
                disp_warm_walls.append((work_d, wall_d))
            else:
                disp_first_walls.append((work_d, wall_d))
            disp_sizes_seen.add(d_n)
        else:
            fetch_wall += t_got - t_fetch
        if pending_bytes >= pending_submit_bytes:
            _submit_pending()

        sjd = fetched["sjd"]
        m_acc = fetched["m_acc"]
        h_acc = fetched["h_acc"]
        if tracer is not None:
            # executed kicks per chain: in grouped mode each chain runs its
            # group's L (mask-frozen while the straggler group finishes), so
            # the chunk's work is the group-size-weighted mean L, not max L
            # (the max is recorded separately as the straggler-paid L)
            if traj_uturn:
                tracer.end_chunk(chunk, float(leap_vec.mean()), n_chains,
                                 float(leap_vec.max()))
            else:
                tracer.end_chunk(chunk, float(leapfrogs.mean()), n_chains,
                                 float(leapfrogs.max()))
        # per-group mean SJD feeds each group's adapter (full fleet; under
        # tempering the groups ARE the rungs)
        sjd_grp = sjd.reshape(chunk, n_grp, grp_chains).mean(axis=2)
        # recorded diagnostics cover the posterior (cold) chains only —
        # hot tempering replicas sample flattened targets, not the
        # posterior (no-op slice when tempering is off)
        sjd_mean = sjd[:, :n_chains].mean(axis=1)
        sjds.append(sjd_mean)
        main_accepts.append(m_acc[:, :n_chains].mean(axis=1))
        hyper_accepts.append(h_acc[:, :n_chains].mean(axis=1))
        if "swap" in fetched:
            swapped = fetched["swap"]                    # (chunk, K*C)
            swap_accepts.append(swapped.mean(axis=1))
            # rung-major fleet: per-rung rate attributes which ladder
            # gaps actually exchange (VERDICT r3 #2 attribution)
            swap_rung_accepts.append(
                swapped.reshape(chunk, tempering, n_chains).mean(axis=2))

        if traj_uturn:
            # replay the chunk through the U-turn schedule (DA step-size
            # updates + U-turn length reservoir, burn-in epochs only)
            uturn_ad.observe(iter_, m_acc.mean(axis=1),
                             fetched["uturn"], leap_vec)
            step_sizes[0] = float(uturn_ad.eps)
            leapfrogs[0] = int(uturn_ad.l_hat)

        rows = {}
        if need_rows:
            rows = {j: (fetched["th_rows"][k], fetched["et_rows"][k])
                    for k, j in enumerate(sorted(need_rows))}

        for j in range(chunk):
            iter_ += 1
            # the reference's first adapter call carries no SJD
            # (paramAdapter.py:216-219): previous_state starts as None
            if not traj_uturn:
                for g, a in enumerate(adapters):
                    e_g, l_g = a.update(
                        None if iter_ == 1 else float(sjd_grp[j, g]))
                    step_sizes[g] = float(np.clip(e_g, 1e-12, None))
                    leapfrogs[g] = int(l_g)

            if iter_ > config.burnin and iter_ % sampling_step == 0:
                if keep_samples and not defer_rows:
                    theta_samples.append(rows[j][0])
                    eta_samples.append(rows[j][1])
                if writer is not None:
                    for c in range(n_chains):
                        p_c = unravel_theta_np(rows[j][0][c])
                        h_c, lh_c = unravel_eta_np(rows[j][1][c])
                        writer.append(p_c, h_c, lh_c, chain=c)

            if display_skip and iter_ % display_skip == 0 and verbose:
                print(f"\niter:{iter_:>2}")
                print("step size", float(step_sizes[0]) if n_grp == 1
                      else list(step_sizes))
                print("hyper step size",
                      float(np.mean(np.asarray(carry.hyper_step))))
                print("leapfrog", int(leapfrogs[0]) if n_grp == 1
                      else [int(v) for v in leapfrogs])
                print("Main acceptance", float(m_acc[j, :n_chains].mean()))
                print("Hyper acceptance", float(h_acc[j, :n_chains].mean()))
                if swap_accepts:
                    print("Swap rate", float(swap_accepts[-1][j]))
                if metric_list:
                    p = flat.unravel_theta(jnp.asarray(rows[j][0][0]))
                    preds_train = model.apply(p, x_train)
                    preds_val = (model.apply(p, jnp.asarray(x_validate,
                                                            dtype))
                                 if x_validate is not None else preds_train)
                    real_val = (jnp.asarray(y_validate, dtype)
                                if y_validate is not None else y_train)
                    for metric in metric_list:
                        metric.calculate(preds_train, preds_val,
                                         y_train, real_val)
                        print(metric.display())
                msg = likelihood.display(
                    _lik_hypers_from_eta(flat, rows[j][1][0]))
                if msg:
                    print(msg)

        chunks_done += 1
        # f32 drift-quantization advisory (once per run): when the tuned
        # step size enters the regime where ``q + eps*v`` rounds away —
        # eps within ~16 ulps of the parameter magnitude — plain-f32
        # leapfrog drifts quantize (~30% per-step error a few ulps out)
        # or freeze outright, the controller sees garbage acceptance, and
        # the run silently stops sampling (measured on the 1M-point
        # surrogate: PERF_NOTES round 4 "f32 drift quantization").
        # The cheap eps pre-check keeps ordinary runs (eps >= 1e-4) free
        # of the device fetch; the rms fetch itself is one scalar.
        if not numerics_advised and float(np.min(step_sizes)) < 1e-4:
            rms = float(jnp.sqrt(jnp.mean(jnp.square(carry.theta))))
            ulp = float(jnp.finfo(dtype).eps) * rms
            if float(np.min(step_sizes)) < 16.0 * ulp:
                import warnings
                warnings.warn(
                    f"step size {float(np.min(step_sizes)):.3g} is within "
                    f"16 ulps of the parameter magnitude (rms |theta| "
                    f"{rms:.3g}, ulp {ulp:.3g}): plain f32 leapfrog drifts "
                    "quantize or freeze in this regime and acceptance "
                    "statistics become meaningless. Pass numerics='exact' "
                    "(the big-data preset: Kahan-compensated integrator + "
                    "exact-f32 matmuls; fixes both this and the MXU "
                    "default-precision staircase, whose signature is low "
                    "acceptance that *rises* as the step size shrinks — "
                    "diagnose with `run_benchmarks.py potential_noise`).",
                    RuntimeWarning, stacklevel=2)
                numerics_advised = True
        if checkpoint_dir and checkpoint_every and \
                chunks_done % checkpoint_every == 0:
            _save_checkpoint()

    if checkpoint_dir:
        _save_checkpoint()
    _drain_pending()
    if drain_pool is not None:
        drain_pool.shutdown(wait=True)

    # -- stack samples (pooled over chains, chain-major) ------------------------
    if theta_samples:
        theta_stack = np.stack(theta_samples)  # (S, C, D)
        eta_stack = np.stack(eta_samples)
        s, c, d = theta_stack.shape
        pooled_theta = np.transpose(theta_stack, (1, 0, 2)).reshape(s * c, d)
        pooled_eta = np.transpose(eta_stack, (1, 0, 2)).reshape(s * c, -1)
        # pure-numpy batched unravel: the samples are already host arrays,
        # and routing them through jax.vmap(unravel) costs two fresh
        # remote XLA compiles plus a full posterior-stack round-trip over
        # the ~200MB/s tunnel — for a reshape (VERDICT round-4 #1's
        # untracked-wall bucket)
        param_samples = host_batch_unraveler(params)(pooled_theta)
        hyper_samples, lik_hyper_samples = host_batch_unraveler(
            (hypers, lik_hypers))(pooled_eta)
    else:
        theta_stack = np.zeros((0, n_chains, flat.theta.shape[-1]))
        eta_stack = np.zeros((0, n_chains, flat.eta.shape[-1]))
        param_samples = tuple({} for _ in model.layers)
        hyper_samples = tuple({} for _ in model.layers)
        lik_hyper_samples = {}

    if writer is not None:
        writer.close()
    elif folder_name is not None and theta_samples:
        # reference text layout (cross-compatible with the reference's
        # predictor) plus the fast native npz store
        reference_format.save_run(
            folder_name, model, likelihood,
            param_samples, hyper_samples, lik_hyper_samples,
            networks_per_file)
        checkpoint.save_samples(
            folder_name, param_samples, hyper_samples, lik_hyper_samples)

    # compile-attributed wall: excess of each first-of-shape dispatch
    # over the warm cost of the same work (median warm sec/work-unit).
    # Needs at least one warm dispatch to calibrate; single-chunk runs
    # report 0.0 rather than guess.
    compile_wall = 0.0
    if disp_first_walls and disp_warm_walls:
        warm_cost = float(np.median(
            [w / max(k, 1.0) for k, w in disp_warm_walls]))
        compile_wall = float(sum(
            max(0.0, w - warm_cost * max(k, 1.0))
            for k, w in disp_first_walls))

    return RunResult(
        param_samples=param_samples,
        hyper_samples=hyper_samples,
        lik_hyper_samples=lik_hyper_samples,
        sjd=np.concatenate(sjds) if sjds else np.zeros(0),
        main_accept=np.concatenate(main_accepts) if main_accepts
        else np.zeros(0),
        hyper_accept=np.concatenate(hyper_accepts) if hyper_accepts
        else np.zeros(0),
        swap_accept=(np.concatenate(swap_accepts) if swap_accepts
                     else None),
        swap_accept_rung=(np.concatenate(swap_rung_accepts)
                          if swap_rung_accepts else None),
        final_step_size=float(np.mean(step_sizes)),
        final_leapfrog=int(round(float(np.mean(leapfrogs)))),
        final_hyper_step=float(np.mean(np.asarray(carry.hyper_step))),
        n_epochs=iter_,
        n_chains=n_chains,
        wall_time=time.time() - t_start,
        theta_samples=theta_stack,
        eta_samples=eta_stack,
        compile_wall_estimate=compile_wall,
        n_dispatch_compiles=len(disp_first_walls),
        dispatch_first_walls=tuple(
            (float(k), float(w)) for k, w in disp_first_walls),
        dispatch_warm_walls=tuple(
            (float(k), float(w)) for k, w in disp_warm_walls),
        trace_fetch_wall=float(fetch_wall),
    )


def _lik_hypers_from_eta(flat, eta_row):
    _, lik_hypers = flat.unravel_eta(jnp.asarray(eta_row))
    return lik_hypers


def _run_fingerprint(config: MCMCConfig, model, likelihood, flat,
                     n_chains: int, sampling_step: int, dtype,
                     n_adapters: int = 1, precondition=None,
                     trajectory: str = "adapter",
                     tempering: Optional[str] = None) -> dict:
    """JSON-safe identity of a sampling run, for resume validation."""
    layers = []
    for layer in model.layers:
        desc = type(layer).__name__
        if hasattr(layer, "in_dim") and hasattr(layer, "out_dim"):
            desc += f"({layer.in_dim},{layer.out_dim})"
        # off-default compute settings change the evaluated density ->
        # fingerprinted (markers absent at defaults, so pre-existing
        # checkpoints keep their fingerprint value)
        if getattr(layer, "compute_dtype", None):
            desc += f"@{layer.compute_dtype}"
        if getattr(layer, "matmul_precision", None):
            desc += f"@prec={layer.matmul_precision}"
        layers.append(desc)
    fp = {} if n_adapters == 1 else {"n_adapters": int(n_adapters)}
    if trajectory != "adapter":
        # key only present off-default, so pre-existing checkpoints keep
        # their fingerprint value
        fp = fp | {"trajectory": trajectory}
    if precondition is not None:
        # an int epoch for the default clip/window config, a composite
        # string otherwise (keeps round-3 checkpoints resumable)
        fp = fp | {"precondition": precondition
                   if isinstance(precondition, str)
                   else int(precondition)}
    if tempering is not None:
        # "K@beta_min"; key absent when off so earlier checkpoints keep
        # their fingerprint value
        fp = fp | {"tempering": tempering}
    return fp | {
        "config": dataclasses.asdict(config),
        "layers": layers,
        "likelihood": type(likelihood).__name__,
        "theta_dim": int(flat.theta.size),
        "eta_dim": int(flat.eta.size),
        "n_chains": int(n_chains),
        "sampling_step": int(sampling_step),
        "dtype": jnp.dtype(dtype).name,
    }
