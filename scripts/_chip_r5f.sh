#!/bin/bash
# Round-5 chip session F: headline bench after the stage-3 transpose flip.
# Log: /tmp/chip_r5f.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/chip_r5f.log
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

echo "=== STEP 1: bench.py (post stage-3 transpose flip) ($(date +%T))" >>"$LOG"
CONETTE_BENCH_PROBE_ATTEMPTS=10 CONETTE_BENCH_PROBE_TIMEOUT=45 \
  timeout 4200 python bench.py >>"$LOG" 2>&1
echo "step1 rc=$?" >>"$LOG"

echo "=== DONE ($(date +%T))" >>"$LOG"
