#!/bin/bash
# Round-5 campaign E: governed-uturn handoff. Waits for the in-flight
# grid capture (pid passed as $1) to finish, probes the TPU (the grid
# client may have been timeout-killed mid-dispatch), then runs the
# governed uturn capture seeded at the grid path's measured equilibrium
# region (2e-5 — just below the grid's settled 3.2e-5/accept 0.70;
# the 2e-6 seed of the superseded r5d script could not reach the RM
# 0.8-acceptance target inside 200 burn-in epochs at the measured
# ~x1.8/100-epoch climb rate, see run_benchmarks.py surrogate_uturn_exact).
set -u
cd /root/repo
CAP=benchmarks/captures
GRID_PID=${1:?grid pid}

while kill -0 "$GRID_PID" 2>/dev/null; do sleep 15; done
echo "=== grid pid $GRID_PID gone $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
sleep 20
# probe until the TPU answers (recovery after a killed client can take minutes)
for i in 1 2 3 4 5; do
  if timeout 300 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256)))))" >/dev/null 2>&1; then
    echo "=== tpu probe ok (try $i) $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
    break
  fi
  echo "=== tpu probe fail (try $i) $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
  sleep 20
done

echo "=== surr_uturn_exact start $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
timeout 7200 python -u benchmarks/run_benchmarks.py \
  surrogate_uturn_exact 256 alternate 2e-5 noprecond 450 \
  --out "$CAP/r5_surr_uturn_exact.json" \
  >> "$CAP/r5_surr_uturn_exact.log" 2>&1
echo "=== surr_uturn_exact exit $? $(date -u +%H:%M:%S) ===" >> "$CAP/campaign_r5.log"
echo "CAMPAIGN R5E DONE $(date -u +%H:%M:%S)" >> "$CAP/campaign_r5.log"
