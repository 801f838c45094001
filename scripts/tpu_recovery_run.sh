#!/bin/bash
# One-shot hardware validation queue for after a TPU-tunnel outage:
#   1. verify_e2e (public-API drive on the real chip)
#   2. probe_pq_real (real-build IVF_PQ layout + per-stage timings +
#      fused device refine timing)
# Writes everything to /tmp/tpu_recovery.log. Run WITHOUT a timeout
# wrapper only when the tunnel is known up; otherwise wrap in timeout.
set -u
LOG=/tmp/tpu_recovery.log
: > "$LOG"
echo "=== tunnel probe $(date) ===" >> "$LOG"
timeout 120 env PYTHONPATH=/root/repo:/root/.axon_site python -u -c \
  "import jax; assert jax.default_backend()=='tpu'; print('tunnel up')" \
  >> "$LOG" 2>&1 || { echo "TUNNEL STILL DOWN" >> "$LOG"; exit 7; }
echo "=== verify_e2e $(date) ===" >> "$LOG"
timeout 1500 env PYTHONPATH=/root/repo:/root/.axon_site python -u \
  scripts/verify_e2e.py >> "$LOG" 2>&1
echo "verify_e2e exit=$?" >> "$LOG"
for CAP in 1.25 1.0; do
  echo "=== probe_pq_real cap=$CAP $(date) ===" >> "$LOG"
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    LANCEDB_TPU_BLOCK_CAP_FACTOR=$CAP python -u \
    scripts/probe_pq_real.py >> "$LOG" 2>&1
  echo "probe_pq_real cap=$CAP exit=$?" >> "$LOG"
done
echo "=== full bench $(date) ===" >> "$LOG"
cd /root/repo && timeout 5400 env PYTHONPATH=/root/repo:/root/.axon_site \
  python -u bench.py > /tmp/bench_headline.json 2>> "$LOG"
echo "bench exit=$? headline: $(cat /tmp/bench_headline.json)" >> "$LOG"
echo "=== done $(date) ===" >> "$LOG"
