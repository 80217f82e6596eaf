#!/bin/bash
# Round-5 chip session D: final precision-control row + headline bench
# with the ancestry production default and scripted-length realism.
# Log: /tmp/chip_r5d.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/chip_r5d.log
: > "$LOG"

probe() {
  timeout 90 python -c "import numpy as np, jax, jax.numpy as jnp; print('probe ok', float(np.asarray(jnp.sum(jnp.ones((8,8))))))" >>"$LOG" 2>&1
}

echo "=== PROBE loop ($(date +%T))" >>"$LOG"
ok=0
for i in $(seq 1 40); do
  if probe; then ok=1; echo "probe success on attempt $i ($(date +%T))" >>"$LOG"; break; fi
  echo "probe attempt $i failed ($(date +%T)); sleeping 45s" >>"$LOG"
  sleep 45
done
if [ "$ok" != 1 ]; then echo "TPU never answered; aborting" >>"$LOG"; exit 1; fi

echo "=== STEP 1: ab_reorder --check-only (incl. highest-precision control) ($(date +%T))" >>"$LOG"
timeout 3000 python scripts/ab_reorder.py --check-only --batch 384 >>"$LOG" 2>&1
echo "step1 rc=$?" >>"$LOG"

echo "=== STEP 2: bench.py (headline: ancestry + scripted lengths) ($(date +%T))" >>"$LOG"
CONETTE_BENCH_PROBE_ATTEMPTS=10 CONETTE_BENCH_PROBE_TIMEOUT=45 \
  timeout 4200 python bench.py >>"$LOG" 2>&1
echo "step2 rc=$?" >>"$LOG"

echo "=== DONE ($(date +%T))" >>"$LOG"
