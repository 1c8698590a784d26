#!/bin/bash
# Round-4 TPU capture campaign, part 3 (after campaign_r4 finished):
# - clean ess_uturn_probe re-capture: the first capture's probe=always
#   window overlapped concurrent TPU probes from a session restart
#   (campaign_r4.log 07:59-08:07 vs the probe retries in the transcript),
#   and the rows lacked the per-dispatch (work, wall) pairs needed to
#   audit the 6.3x wall gap. Re-run with exclusive machine time + pairs.
# - K=4 tighter-ladder tempering (beta_min=0.5): the K=2 @ 0.1 capture's
#   swap accept was 0.0015 (ladder too wide); this one measures swaps
#   actually firing, with per-rung rates in the artifact.
# - surr_uturn: the first attempt hit timeout 3000 while sharing the
#   machine with a dying session; retry with exclusive time + 4500s.
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4c.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4c.log"
  sleep 5
}
run ess_uturn_probe2  1800 ess_uturn_probe 512
run ess_tempered_k4   1800 ess_tempered 64 4 0.5
# finish the 10-seed parity dossier: campaign_r4's parity step covers
# ~4 seeds before its 3000s timeout (737s/seed); --resume appends the rest
echo "=== parity_resume start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4c.log"
timeout 5400 python benchmarks/parity_run.py --seeds 10 --resume \
  --out benchmarks/PARITY_r04.json >> "$CAP/r4_parity.log" 2>&1
echo "=== parity_resume exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4c.log"
sleep 5
# the governed uturn surrogate takes >50 min (two exit-124s at timeout
# 3000 in campaign_r4); 5400s each, precond first (VERDICT r3 #3's
# target config: acceptance off the 0.2 band edge + ESS/sec >= 1.5)
run surr_uturn_precond 5400 surrogate_quality_uturn precond
run surr_uturn        5400 surrogate_quality_uturn
echo "CAMPAIGN R4C DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4c.log"
