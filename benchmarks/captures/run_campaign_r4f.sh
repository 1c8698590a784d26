#!/bin/bash
# Round-4 TPU capture campaign, part 6: r4e re-issued with realistic
# timeouts. The first r4e attempt at surr_uturn_kahan_hp paced to
# ~9.6s/epoch (600 epochs ~= 96 min + pretrain), overshooting its 5400s
# bound with no partial emit — killed at iter ~170 and restarted here
# with 3h20m. Its live log had already confirmed the staircase fix:
# eps 2.2e-6 (vs 4.5e-9 staircase-limited) at accept 0.97 and climbing
# toward the 0.8 target.
# - surr_uturn_kahan_hp: compensated integrator + exact-f32 matmuls on
#   the 1M-point uturn+precond config (the full numerics fix).
# - ess_tempered512: 512-chain tempered variant (VERDICT r3 #2), K=4 @
#   beta_min=0.5 — the ladder the 64-chain capture showed exchanging at
#   ~0.68/attempt on every gap.
# - surr_grid_precond_hp: round 3's grid-path 0.88 ESS/sec @ accept
#   0.200 row re-measured with exact matmuls (does the band-edge
#   acceptance recover?).
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4f.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4f.log"
  sleep 5
}
run surr_uturn_kahan_hp  12000 surrogate_quality_uturn precond 1 always kahan highest
run ess_tempered512       3600 ess_tempered 512 4 0.5
run surr_grid_precond_hp  9000 surrogate_quality_precond 1 1e-2 highest
echo "CAMPAIGN R4F DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4f.log"
