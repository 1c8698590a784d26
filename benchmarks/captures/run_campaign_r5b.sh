#!/bin/bash
# Round-5 follow-up: the 5e-5 grid ceiling collapsed once the run left
# the settle state (accept 0.61 at epoch 50 -> 0.0 from epoch 100;
# r5_surr_grid_exact.json: accept 0.025 out of band, eps frozen 3.2e-5).
# Two hypotheses, one run each:
# 1. stale/degenerate diag metric: the single window fires at epoch 60
#    from MAP-pinned chains with ~no cross-chain spread; the collapse
#    starts right after. windows=3 re-estimates at 60/106/153 as the
#    fleet spreads -> if the boundary re-opens, acceptance recovers
#    before the freeze and the 5e-5 harvest lands.
# 2. the equilibrium boundary is intrinsically inside (2e-5, 3.2e-5):
#    harvest the geometric midpoint 2.4e-5 as the safe in-band gain
#    over round 4's binding 2e-5 (accept 0.970 there).
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r5_${name}.json" \
    >> "$CAP/r5_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
  sleep 20
}
run surr_grid_exact_w3 3600 surrogate_quality_exact 5e-5 3
run surr_grid_exact_mid 3600 surrogate_quality_exact 2.4e-5
echo "CAMPAIGN R5B DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r5.log"
