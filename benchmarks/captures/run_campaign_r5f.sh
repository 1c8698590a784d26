#!/bin/bash
# Round-5 campaign F: wedge-tolerant captures. Three prior attempts at
# the 40-minute grid capture died (2 axon tunnel wedges, 1 session
# restart) with zero salvage. This script pairs the bench's new
# checkpoint/resume insurance (run_benchmarks.py: --out-adjacent .ckpt
# dir, pretrain cache) with a watchdog: if neither the checkpoint's
# resume.json nor the run log has moved for STALE seconds, the client is
# wedged (the axon failure mode: zero CPU, no RPC progress, never
# recovers) — kill it, probe the TPU back to life, relaunch; the bench
# resumes from the last checkpoint (<=40 epochs lost) and skips the
# cached pretrain. A run is DONE when its --out JSON exists without the
# "partial" marker.
set -u
cd /root/repo
CAP=benchmarks/captures

note() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"; }

probe_tpu() {
  for i in 1 2 3 4 5; do
    if timeout 300 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256)))))" >/dev/null 2>&1; then
      note "tpu probe ok (try $i)"; return 0
    fi
    note "tpu probe fail (try $i)"; sleep 20
  done
  return 1
}

is_final() {  # $1 = json path
  python - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
sys.exit(1 if d.get("partial") else 0)
EOF
}

run_durable() {
  name=$1; tmo=$2; stale=$3; shift 3
  out="$CAP/r5_${name}.json"; logf="$CAP/r5_${name}.log"
  for attempt in 1 2 3 4; do
    if is_final "$out"; then note "$name already final"; return 0; fi
    note "$name attempt $attempt start"
    timeout "$tmo" python -u benchmarks/run_benchmarks.py "$@" \
      --out "$out" >> "$logf" 2>&1 &
    pid=$!
    sleep 5
    cpid=$(pgrep -P "$pid" 2>/dev/null | head -1)   # the python under timeout
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      # latest activity across checkpoint, log, and artifact: the
      # partial emit at train-done means the run is in its post-train
      # ESS extraction, whose fresh remote compiles can legitimately
      # stall every file for many minutes -> longer grace there
      now=$(date +%s)
      newest=0
      for f in "$out.ckpt/resume.json" "$logf" "$out"; do
        m=$(stat -c %Y "$f" 2>/dev/null) || continue
        [ "$m" -gt "$newest" ] && newest=$m
      done
      if [ "$newest" -eq 0 ]; then age=0; else age=$(( now - newest )); fi
      eff_stale=$stale
      [ -f "$out" ] && eff_stale=1800
      if [ "$age" -ge "$eff_stale" ]; then
        note "$name watchdog: stale ${age}s (grace ${eff_stale}s), killing pid $pid"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        [ -n "$cpid" ] && kill -9 "$cpid" 2>/dev/null
        break
      fi
    done
    wait "$pid" 2>/dev/null; rc=$?
    note "$name attempt $attempt exit $rc"
    if is_final "$out"; then note "$name DONE"; return 0; fi
    sleep 20; probe_tpu || note "$name: tpu unreachable, pressing on"
  done
  note "$name FAILED after 4 attempts"
  return 1
}

probe_tpu
# grid: ~3s/epoch sampling + <=10 min pretrain (cached after attempt 1);
# checkpoints every ~40 epochs -> 700s staleness means wedged
run_durable surr_grid_exact_np 3300 700 surrogate_quality_exact
sleep 20
# governed uturn, seeded at the grid-equilibrium region (2e-5): epochs
# up to ~12s -> checkpoint gap up to ~8 min; 900s staleness
run_durable surr_uturn_exact 5400 900 \
  surrogate_uturn_exact 256 alternate 2e-5 noprecond 450
note "CAMPAIGN R5F DONE"
