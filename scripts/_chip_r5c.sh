#!/bin/bash
# Round-5 chip session B: ancestry equality quantification, fixed roofline,
# TPU-side EOS-bias sweep. Log: /tmp/chip_r5c.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/chip_r5c.log
: > "$LOG"

probe() {
  timeout 90 python -c "import numpy as np, jax, jax.numpy as jnp; print('probe ok', float(np.asarray(jnp.sum(jnp.ones((8,8))))))" >>"$LOG" 2>&1
}

echo "=== PROBE loop ($(date +%T))" >>"$LOG"
ok=0
for i in $(seq 1 30); do
  if probe; then ok=1; echo "probe success on attempt $i ($(date +%T))" >>"$LOG"; break; fi
  echo "probe attempt $i failed ($(date +%T)); sleeping 45s" >>"$LOG"
  sleep 45
done
if [ "$ok" != 1 ]; then echo "TPU never answered; aborting" >>"$LOG"; exit 1; fi

echo "=== STEP 1: ab_reorder --check-only (bf16 + f32 equality stats) ($(date +%T))" >>"$LOG"
timeout 3000 python scripts/ab_reorder.py --check-only --batch 384 >>"$LOG" 2>&1
echo "step1 rc=$?" >>"$LOG"

echo "=== STEP 2: per-stage roofline (fixed anchors) ($(date +%T))" >>"$LOG"
timeout 3000 python scripts/roofline_stages.py --batch 128 --iters 5 >>"$LOG" 2>&1
echo "step2 rc=$?" >>"$LOG"

echo "=== STEP 3: skipped ($(date +%T))" >>"$LOG"


echo skipped
echo "step3 rc=$?" >>"$LOG"

echo "=== DONE ($(date +%T))" >>"$LOG"
