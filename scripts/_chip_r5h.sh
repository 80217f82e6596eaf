#!/bin/bash
# Round-5 chip session H: transposed-layout A/B for stages 4 and 2
# (the sub-8 MLP chunk plans admitted them; s3 is the r5 production
# winner). check-only first, then timed stage-only, then one e2e leg
# (auto now selects s2+s3+s4 — the e2e captures the combined effect).
# Log: /tmp/chip_r5h.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/chip_r5h.log
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

echo "=== STEP 1: ab_stage3 --stage 4 --check-only ($(date +%T))" >>"$LOG"
timeout 2400 python scripts/ab_stage3.py --stage 4 --check-only --batch 384 >>"$LOG" 2>&1
echo "step1 rc=$?" >>"$LOG"

echo "=== STEP 2: ab_stage3 --stage 4 timed + e2e ($(date +%T))" >>"$LOG"
timeout 3600 python scripts/ab_stage3.py --stage 4 --batch 384 --iters 8 >>"$LOG" 2>&1
echo "step2 rc=$?" >>"$LOG"

echo "=== STEP 3: ab_stage3 --stage 2 --check-only ($(date +%T))" >>"$LOG"
timeout 2400 python scripts/ab_stage3.py --stage 2 --check-only --batch 384 >>"$LOG" 2>&1
echo "step3 rc=$?" >>"$LOG"

echo "=== STEP 4: ab_stage3 --stage 2 timed (stage-only) ($(date +%T))" >>"$LOG"
timeout 3600 python scripts/ab_stage3.py --stage 2 --batch 384 --iters 8 --skip-e2e >>"$LOG" 2>&1
echo "step4 rc=$?" >>"$LOG"

echo "=== DONE ($(date +%T))" >>"$LOG"
