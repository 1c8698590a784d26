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
    """The CLI eps list is comma-separated floats (regression guard for
    the argv contract documented in main())."""
    arg = "2e-5,5e-5,1.25e-4"
    parsed = tuple(float(s) for s in arg.split(","))
    assert parsed == (2e-5, 5e-5, 1.25e-4)
    assert np.all(np.diff(parsed) > 0)
