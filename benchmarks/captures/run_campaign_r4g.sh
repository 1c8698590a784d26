#!/bin/bash
# Round-4 TPU capture campaign, part 7: the grid-path surrogate with the
# FULL numerics fix (compensated integrator + exact-f32 matmuls). Job
# r4f/surr_grid_precond_hp showed exact matmuls alone recover in-band
# acceptance (0.970) but the plain-f32 adapter still detoured ~300
# burn-in epochs through the eps=1e-8 drift-quantization floor (the
# driver advisory fired) before strikes/halving rescued it to 1.59e-5.
# With kahan the SJD signal stays meaningful across the whole grid, so
# the adapter should tune without the detour — the config the docs
# recommend at this scale, captured end-to-end.
# TPU jobs need exclusive machine time — see CLAUDE.md.
set -u
cd /root/repo
CAP=benchmarks/captures
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4g.log"
  timeout "$tmo" python benchmarks/run_benchmarks.py "$@" --out "$CAP/r4_${name}.json" \
    >> "$CAP/r4_${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r4g.log"
  sleep 5
}
run surr_grid_kahan_hp 5400 surrogate_quality_precond 1 1e-2 highest kahan
echo "CAMPAIGN R4G DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r4g.log"
