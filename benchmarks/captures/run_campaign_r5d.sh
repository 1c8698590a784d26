#!/bin/bash
# Round-5 campaign D (relaunch of the killed attempt-2 tail):
# 1. surr_grid_exact_np — the identity-metric 5e-5-ceiling harvest
#    (now the surrogate_quality_exact default). Attempt 1 timed out
#    wedged at epoch ~300 (axon stall, no artifact); attempt 2 was
#    healthy (accept 0.66-0.70 at eps 3.2e-5 through iter:150) but died
#    as a child of a restarted driver session. This script runs under
#    setsid so a session restart cannot kill it again.
# 2. surr_uturn_exact — governed uturn seeded at the measured RM
#    landing zone (2e-6), guard 256, alternate probe, identity metric,
#    450 epochs (200 burn-in + 250 post) so the worst-case ~12s/epoch
#    pace still completes inside the campaign slot.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
  timeout "$tmo" python -u benchmarks/run_benchmarks.py "$@" --out "$CAP/r5_${name}.json" \
    >> "$CAP/r5_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
  sleep 20
}
run surr_grid_exact_np 3600 surrogate_quality_exact
run surr_uturn_exact 7200 surrogate_uturn_exact 256 alternate 2e-6 noprecond 450
echo "CAMPAIGN R5D DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r5.log"
