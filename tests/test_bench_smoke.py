"""Toy-scale smoke of the benchmark suite's surrogate eps-ladder path.

The ladder bench (benchmarks/run_benchmarks.py
``bench_surrogate_eps_ladder``) drives the chunk runner directly with
traced (eps, L, step_scale) — a different wiring than the driver-based
benches — so a CPU smoke at toy scale protects it from bit-rot: one
compiled program must serve every rung, a stable step must accept, an
unstable one must reject.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "benchmarks"))


def test_eps_ladder_smoke(tmp_path, monkeypatch):
    import run_benchmarks as rb

    # route the artifact to a temp file so the smoke also covers the
    # incremental --out flushing
    monkeypatch.setattr(rb, "_OUT", str(tmp_path / "ladder.json"))
    rows = rb.bench_surrogate_eps_ladder(
        eps_list=(1e-3, 1e-1), n_chains=8, leapfrog=3,
        n_points=2048, data_chunk=512, pretrain_epochs=1,
        settle_chunks=2, epochs_per_chunk=2)

    assert [r["eps"] for r in rows] == [1e-3, 1e-1]
    # a stable step accepts near 1, a wildly unstable one rejects flat —
    # the discrimination the ladder exists to measure
    assert rows[0]["accept"] > 0.8
    assert rows[1]["accept"] < 0.1
    # rejected rungs move nothing
    assert rows[1]["sjd_mean"] <= rows[0]["sjd_mean"]
    assert (tmp_path / "ladder.json").exists()


def test_eps_ladder_cli_parsing():
    """The CLI eps list is comma-separated floats — exercised through the
    actual parse helper main() dispatches with, not a re-implementation."""
    import run_benchmarks as rb

    parsed = rb._parse_eps_arg("2e-5,5e-5,1.25e-4")
    assert parsed == (2e-5, 5e-5, 1.25e-4)
    assert np.all(np.diff(parsed) > 0)


def test_eps_ladder_validates_eps_list():
    """Empty or non-ascending ladders fail at entry, before the expensive
    pretrain/settle phases."""
    import pytest

    import run_benchmarks as rb

    with pytest.raises(ValueError, match="non-empty"):
        rb.bench_surrogate_eps_ladder(eps_list=())
    with pytest.raises(ValueError, match="ascending"):
        rb.bench_surrogate_eps_ladder(eps_list=(5e-5, 2e-5))


def test_bench_line_stays_compact():
    """The repo-root bench's stdout artifact must stay ONE parseable JSON
    line under the round driver's ~2000-char tail capture (round 4's
    raw-pairs line hit 6,090 chars and BENCH_r04.json recorded
    parsed:null). Feed emit_line a quality dict bulkier than any real
    capture and bound the result."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench_root", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rng = np.random.default_rng(0)
    q = {
        "n_chains": 512, "n_adapters": 4, "trajectory": "adapter",
        "tempering": 4, "tempering_beta_min": 0.5, "epochs": 1300,
        "ess_per_sec": 1234.56, "ess_per_sec_warm_est": 2345.67,
        "compile_wall_seconds": 55.5, "n_dispatch_compiles": 9,
        # 400 dispatches across 60 distinct work sizes — far bulkier
        # than the ~130x4 of the round-4 capture that broke the line
        "dispatch_first_walls": [[float(k), 1.234] for k in range(9)],
        "dispatch_warm_walls": [
            [float(rng.integers(1, 60) * 50), round(float(rng.uniform(
                0.05, 0.2)), 3)] for _ in range(400)],
        "dispatch_wall_seconds": 45.39, "trace_fetch_wall_seconds": 47.2,
        "untracked_wall_seconds": 61.1, "swap_accept_mean": 0.5123,
        "swap_accept_rung": [0.3409, 0.6848, 0.6834, 0.3395],
        "total_ess": 166844.3, "min_param_ess": 41804.1,
        "median_param_ess": 60123.4, "accept_post_burnin": 0.4841,
        "hyper_accept_post_burnin": 0.9251, "wall_seconds": 153.7,
        "straggler_efficiency": 0.7992, "final_leapfrog": 200,
        "final_step_size": 0.002,
    }
    line = bench.emit_line(1.23e6, 1.0e4, q, q)
    assert "\n" not in line
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    # everything the round artifact needs survives the compaction
    assert parsed["value"] == 1230000.0
    assert parsed["vs_baseline"] == 123.0
    for block in (parsed["quality"], parsed["quality_tempered"]):
        assert block["ess_per_sec"] == 1234.56
        assert block["min_param_ess"] == 41804.1
        assert block["accept_post_burnin"] == 0.4841
        ws = block["dispatch_warm_summary"]
        assert ws["n"] == 400
        # 3 most frequent sizes + the folded tail
        assert len(ws["by_work"]) == 4
        assert ws["by_work"][-1][0] == "other"
    # error / skipped markers survive too (failure-contained blocks)
    err_line = bench.emit_line(1e6, 1e4, {"error": "X" * 80},
                               {"skipped": "wall budget (500s)"})
    assert len(err_line) < 1500
    assert json.loads(err_line)["quality"]["error"].startswith("X")
