#!/bin/bash
# Round-5 TPU capture campaign: harvest the measured stability boundary.
# 1. surrogate_quality_exact — the numerics="exact" grid path at the
#    5e-5 eps ceiling the round-4 fixed-eps ladder measured as the
#    sweet spot (accept 0.49, 3.3x SJD of the old binding 2e-5).
#    VERDICT r4 #3 target: acceptance in [0.2, 0.99], warm ESS/sec
#    >= 1.5 (3x round 4's 0.498).
# 2. surrogate_uturn_exact 256 — governed dynamic trajectories under
#    full numerics with the U-turn guard sized for the dispatch
#    governor (VERDICT r4 #5: the 64 guard pinned L and froze eps at
#    0.036 ESS/sec). Keep-or-retire decision from this number.
# TPU jobs need exclusive machine time — see CLAUDE.md.
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
run surr_grid_exact 3600 surrogate_quality_exact
run surr_uturn_exact 4500 surrogate_uturn_exact 256 alternate
echo "CAMPAIGN R5 DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r5.log"
