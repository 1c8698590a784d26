"""Dispatch-time governor: long chunks split into bounded sub-dispatches.

Some runtimes kill a device worker whose single XLA execution runs too
long (the axon-tunneled TPU measured a kill threshold between ~60s and
~90s). ``max_dispatch_seconds`` makes the driver learn the warm
per-leapfrog-epoch cost and split over-budget chunks into power-of-two
sub-dispatches. The split must change only the dispatch pattern — results
bit-identical to an ungoverned run (the reference has no analogue: its
per-epoch Python loop never batches epochs into one device program,
network.py:509-670).
"""

import math

import numpy as np
import jax.numpy as jnp

from tensorbnn_tpu.sampler.driver import _plan_dispatch_pieces


def _check_cover(pieces, n):
    off = 0
    for p_off, p_n in pieces:
        assert p_off == off
        assert p_n >= 1
        off += p_n
    assert off == n


def test_plan_in_budget_single_piece():
    work = np.full(50, 10.0)
    pieces = _plan_dispatch_pieces(work, cost=1e-4, budget=30.0)
    assert pieces == [(0, 50)]


def test_plan_splits_to_powers_of_two():
    work = np.full(50, 10.0)          # 500 units; at cost 0.01 -> 5s total
    pieces = _plan_dispatch_pieces(work, cost=0.01, budget=1.0)
    _check_cover(pieces, 50)
    # every piece but a whole in-budget remainder is a power of two and
    # predicted within budget
    for i, (off, n) in enumerate(pieces):
        in_budget = 0.01 * work[off:off + n].sum() <= 1.0 + 1e-12
        if i < len(pieces) - 1:
            assert n & (n - 1) == 0, pieces
        assert in_budget or n == 1


def test_plan_single_overbudget_epoch_dispatches_anyway():
    work = np.asarray([1e6])
    pieces = _plan_dispatch_pieces(work, cost=1.0, budget=1.0)
    assert pieces == [(0, 1)]


def test_plan_variable_work_respects_budget():
    # ratcheting U-turn lengths: later epochs cost more
    work = np.asarray([2.0, 2.0, 2.0, 2.0, 50.0, 50.0, 50.0, 50.0])
    pieces = _plan_dispatch_pieces(work, cost=0.1, budget=6.0)
    _check_cover(pieces, 8)
    for off, n in pieces:
        assert 0.1 * work[off:off + n].sum() <= 6.0 + 1e-12 or n == 1


def test_plan_piece_sizes_bounded_variety():
    work = np.full(50, 1.0)
    pieces = _plan_dispatch_pieces(work, cost=1.0, budget=3.0)
    _check_cover(pieces, 50)
    distinct = {n for _, n in pieces}
    assert len(distinct) <= int(math.log2(50)) + 1


def _run(max_dispatch_seconds, trajectory, seed=11):
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=seed)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, step_size_min=1e-5,
                   step_size_max=5e-2, step_size_options=8,
                   leapfrog_start=8, leapfrog_min=2, leapfrog_max=32,
                   leapfrog_increment=4, hyper_leapfrog=4, burnin=40,
                   averaging_steps=5, random_steps=2, adapter_seed=0)
    res = net.train(100, 4, FixedGaussianLikelihood(sd=0.1),
                    n_chains=4, chain_jitter=0.05, trajectory=trajectory,
                    max_dispatch_seconds=max_dispatch_seconds,
                    verbose=False)
    return res


def test_governed_adapter_run_bit_identical():
    # a vanishing budget forces 1-epoch sub-dispatches once the cost is
    # learned (after the first repeated chunk size); the sampler output
    # must not change at all
    base = _run(None, "adapter")
    gov = _run(1e-9, "adapter")
    np.testing.assert_array_equal(base.theta_samples, gov.theta_samples)
    np.testing.assert_array_equal(base.eta_samples, gov.eta_samples)
    np.testing.assert_array_equal(base.main_accept, gov.main_accept)
    assert base.final_step_size == gov.final_step_size
    assert base.final_leapfrog == gov.final_leapfrog


def test_compile_wall_accounting():
    # each distinct dispatch shape compiles once; the driver attributes
    # the first-of-shape excess wall to compiles so throughput metrics
    # can report a warm-adjusted denominator (axon cannot cache compiles
    # across processes). The estimate needs a warm dispatch to calibrate
    # and can never exceed the run's wall.
    res = _run(None, "adapter")
    assert res.n_dispatch_compiles >= 1
    assert 0.0 <= res.compile_wall_estimate < res.wall_time


def test_bootstrap_bounded_after_warm_cost():
    # round-3 weak #5: with a budget set and no cost estimate, the old
    # bootstrap dispatched the ENTIRE first chunk epoch-by-epoch. Now it
    # pays at most two single-epoch dispatches (the second size-1 wall is
    # warm and calibrates the cost), then re-plans the chunk remainder at
    # governed sizes — with a huge budget, one more piece. Results stay
    # bit-identical.
    base = _run(None, "adapter")
    gov = _run(1e9, "adapter")
    np.testing.assert_array_equal(base.theta_samples, gov.theta_samples)
    np.testing.assert_array_equal(base.eta_samples, gov.eta_samples)
    n_base = len(base.dispatch_first_walls) + len(base.dispatch_warm_walls)
    n_gov = len(gov.dispatch_first_walls) + len(gov.dispatch_warm_walls)
    assert n_base < n_gov <= n_base + 2


def test_dispatch_wall_pairs_auditable():
    # the artifact carries the raw (work, wall) pairs so the
    # compile-wall attribution can be recomputed by a reader
    res = _run(1e9, "adapter")
    assert res.n_dispatch_compiles == len(res.dispatch_first_walls)
    assert res.dispatch_warm_walls, "warm dispatches expected in this run"
    warm_cost = float(np.median(
        [w / max(k, 1.0) for k, w in res.dispatch_warm_walls]))
    est = sum(max(0.0, w - warm_cost * max(k, 1.0))
              for k, w in res.dispatch_first_walls)
    assert abs(res.compile_wall_estimate - est) < 1e-9
    for k, w in res.dispatch_first_walls + res.dispatch_warm_walls:
        assert k >= 1.0 and w >= 0.0


def test_single_dispatch_reports_zero_compile_wall():
    # no warm dispatch exists to calibrate against -> the estimate is 0.0
    # (never a guess), and the raw pairs still record the one dispatch
    from tensorbnn_tpu import FixedGaussianLikelihood, GaussianDenseLayer, \
        Tanh
    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 16)
    y = np.sin(x * math.pi)
    net = Network(jnp.float32, 1, x, y, x, y, seed=3)
    net.add(GaussianDenseLayer(1, 5)).add(Tanh())
    net.add(GaussianDenseLayer(5, 1))
    net.setup_mcmc(step_size_start=2e-3, leapfrog_start=4, leapfrog_min=2,
                   leapfrog_max=8, hyper_leapfrog=2, burnin=50,
                   averaging_steps=10, random_steps=2, adapter_seed=0)
    res = net.train(2, 1, FixedGaussianLikelihood(sd=0.1),
                    n_chains=2, verbose=False)
    total = len(res.dispatch_first_walls) + len(res.dispatch_warm_walls)
    if len(res.dispatch_warm_walls) == 0:
        assert res.compile_wall_estimate == 0.0
    assert total >= 1


def test_wall_buckets_accounted():
    # round-4 finding: first-in-process TPU runs logged walls dominated
    # by time outside every recorded dispatch (tunnel/session overhead).
    # The driver now splits the wall into three auditable buckets:
    # dispatch (device work + compile), trace fetch (device->host
    # materialization), and the untracked remainder — so that
    # attribution is measured, not guessed.
    res = _run(None, "adapter")
    assert res.dispatch_wall_total > 0.0
    assert res.trace_fetch_wall >= 0.0
    # the buckets are disjoint sub-intervals of the run's wall
    assert (res.dispatch_wall_total + res.trace_fetch_wall
            <= res.wall_time + 0.05)
    assert abs(res.untracked_wall
               - (res.wall_time - res.dispatch_wall_total
                  - res.trace_fetch_wall)) < 1e-9
    # uturn mode fetches the U-turn trace too — the bucket must cover it
    res_u = _run(None, "uturn")
    assert res_u.trace_fetch_wall >= 0.0
    assert (res_u.dispatch_wall_total + res_u.trace_fetch_wall
            <= res_u.wall_time + 0.05)


def test_governed_uturn_run_bit_identical():
    # uturn mode slices the per-epoch leapfrog vector across sub-dispatches
    # and feeds the U-turn schedule one merged trace per planned chunk, so
    # the adaptation trajectory is identical too
    base = _run(None, "uturn")
    gov = _run(1e-9, "uturn")
    np.testing.assert_array_equal(base.theta_samples, gov.theta_samples)
    np.testing.assert_array_equal(base.main_accept, gov.main_accept)
    assert base.final_step_size == gov.final_step_size
