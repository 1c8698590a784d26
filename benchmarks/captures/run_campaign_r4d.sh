#!/bin/bash
# Round-4 TPU capture campaign, part 4 (run AFTER campaign_r4c finishes):
# - surr_uturn_precond_kahan: identical config to r4c's
#   surr_uturn_precond but with the Kahan-compensated integrator.
#   r4c's live log showed the U-turn RM controller walking eps into the
#   f32 drift-quantization regime (eps 3.8e-8 against |theta| ~ 0.1 is
#   ~3 ulps per drift -> accept 0.05, then eps driven to 3e-9 where
#   positions freeze outright). Compensation removes that floor; this
#   capture measures what the controller finds when the integrator it
#   tunes is actually exact.
# - surr_uturn_precond_alt: probe=alternate on the surrogate — the
#   config where l_hat resolves below the L cap, so the probe tax the
#   flagship sweep measured at ~1% should actually show here. Runs with
#   kahan too (the honest comparison is against the kahan row above,
#   not the quantization-limited r4c row).
# All rows carry the new three-bucket wall fields (dispatch /
# trace-fetch / untracked).
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
run surr_uturn_precond_kahan 5400 surrogate_quality_uturn precond 1 always kahan
run surr_uturn_precond_alt   5400 surrogate_quality_uturn precond 1 alternate kahan
echo "CAMPAIGN R4D DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4d.log"
