#!/bin/bash
# Round-5 chip session G: (1) ancestry read-time formulation A/B
# (scatter vs gather vs stacked, scripts/ab_reorder.py) and (2) stage-1
# LN lane-reduction share bound (scripts/ab_s1ln.py).
# Log: /tmp/chip_r5g.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/chip_r5g.log
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

echo "=== STEP 1: ab_reorder (ancestry impls) ($(date +%T))" >>"$LOG"
timeout 3600 python scripts/ab_reorder.py --batch 384 --iters 8 >>"$LOG" 2>&1
echo "step1 rc=$?" >>"$LOG"

echo "=== STEP 2: ab_s1ln ($(date +%T))" >>"$LOG"
timeout 2400 python scripts/ab_s1ln.py --batch 384 --iters 8 >>"$LOG" 2>&1
echo "step2 rc=$?" >>"$LOG"

echo "=== DONE ($(date +%T))" >>"$LOG"
