#!/bin/bash
# Round-4 TPU capture campaign, part 4 (run AFTER campaign_r4c finishes):
# - surrogate uturn with probe=alternate: the flagship probe-tax sweep
#   (r4_ess_uturn_probe2.json) showed the GROW=1.5 tax is ~1% there
#   because the reservoir saturates at L_max; the surrogate is the
#   config where l_hat resolves BELOW the cap, so this is the capture
#   where the alternate schedule's halved tax should actually show.
#   Also the first artifact carrying the new three-bucket wall fields
#   (dispatch / trace-fetch / untracked).
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4d.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4d.log"
  sleep 5
}
run surr_uturn_precond_alt 5400 surrogate_quality_uturn precond 1 alternate
echo "CAMPAIGN R4D DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4d.log"
