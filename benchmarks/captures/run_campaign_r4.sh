#!/bin/bash
# Round-4 TPU capture campaign: runs each pending measurement sequentially
# (TPU jobs need exclusive machine time — see CLAUDE.md). Each block writes
# an incremental --out artifact so a killed process never loses results.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4.log"
  timeout 3000 python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4.log"
  sleep 5
}
run ess_tempered      ess_tempered 64 2
run ess_governed      ess_governed 64
run surr_uturn        surrogate_quality_uturn
run ess_uturn_probe   ess_uturn_probe 512
run surr_uturn_precond surrogate_quality_uturn precond
echo "=== parity start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4.log"
timeout 3000 python benchmarks/parity_run.py --seeds 10 --out benchmarks/PARITY_r04.json \
  >> "$CAP/r4_parity.log" 2>&1
echo "=== parity exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4.log"
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4.log"
