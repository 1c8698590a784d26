#!/bin/bash
# Round-4 TPU capture campaign, part 2: the steps the first campaign did
# not reach before the session ended (surr_uturn was killed mid-sampling),
# plus a tighter-ladder K=4 tempered run (the K=2 @ beta_min=0.1 capture
# recorded swap_accept 0.0015 — the ladder was too wide for swaps to fire,
# so the mixing attribution needs a ladder where they do).
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4b.log"
  timeout 3000 python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4b.log"
  sleep 5
}
run surr_uturn        surrogate_quality_uturn
run ess_uturn_probe   ess_uturn_probe 512
run surr_uturn_precond surrogate_quality_uturn precond
run ess_tempered_k4   ess_tempered 64 4 0.5
echo "=== parity start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4b.log"
timeout 3000 python benchmarks/parity_run.py --seeds 10 --out benchmarks/PARITY_r04.json \
  >> "$CAP/r4_parity.log" 2>&1
echo "=== parity exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4b.log"
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4b.log"
