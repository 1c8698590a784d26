#!/bin/bash
# Round-4 TPU capture campaign, part 5 (run AFTER the r4d kahan run):
# - potential_noise: the ΔH noise-floor diagnostic. Hypothesis from the
#   kahan run's live log: with the integrator exact, acceptance still
#   sits at 0.03-0.08 and rises only slowly as eps shrinks — the
#   signature of the MXU default-precision staircase (default f32
#   matmuls round operands to bf16, so lp(theta) is piecewise-constant
#   with O(nats) jumps at weight rounding boundaries; crossings scale
#   ~linearly in eps, not eps^2). This measures the staircase directly:
#   lp along a momentum-like ray at default vs precision="highest",
#   plus the C=32 value+grad cost of the fix.
# - surr_uturn_kahan_hp: the full fix — compensated integrator AND
#   exact-f32 matmuls. If the staircase hypothesis is right, the RM
#   controller should now settle at the true stability edge with
#   in-band acceptance.
# - ess_tempered512: the 512-chain tempered variant (VERDICT r3 #2
#   asked for one); K=4 @ beta_min=0.5, the ladder the 64-chain capture
#   showed exchanging at ~0.68/attempt on every gap.
# - surr_grid_precond_hp: the non-uturn grid path with the staircase
#   fix — round 3's 0.88 ESS/sec @ accept 0.200 row re-measured with
#   exact matmuls (does the band-edge acceptance recover?).
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4e.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4e.log"
  sleep 5
}
run potential_noise      2700 potential_noise
run surr_uturn_kahan_hp  5400 surrogate_quality_uturn precond 1 always kahan highest
run ess_tempered512      3600 ess_tempered 512 4 0.5
run surr_grid_precond_hp 5400 surrogate_quality_precond 1 1e-2 highest
echo "CAMPAIGN R4E DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4e.log"
