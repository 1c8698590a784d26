#!/bin/bash
# Round-5 campaign C (supersedes the killed tail of run_campaign_r5.sh
# and folds in run_campaign_r5b.sh):
# 1. surr_grid_exact_w3 — 5e-5 ceiling with windows=3: tests the
#    degenerate-early-metric hypothesis (the epoch-60 estimate from the
#    MAP-pinned zero-jitter fleet measured scale range [0.603, 1.47] —
#    near-identity on a posterior whose anisotropy spans decades;
#    r5_surr_uturn_exact.attempt1.log).
# 2. surr_grid_exact_mid — 2.4e-5 ceiling: the safe in-band harvest
#    inside the measured equilibrium boundary (2e-5, 3.2e-5).
# 3. surr_uturn_exact — governed uturn re-run seeded at the measured RM
#    landing zone (attempt 1 froze mid-climb at 2.06e-6/accept 0.957 at
#    burn-in end and would have outlived its 4500s timeout artifact-less
#    at ~12s/epoch x 400 post-burn-in epochs).
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
run surr_uturn_exact 9000 surrogate_uturn_exact 256 alternate 2e-6
echo "CAMPAIGN R5C DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r5.log"
