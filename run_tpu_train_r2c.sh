#!/bin/bash
# Chained after run_tpu_benches_r2b.sh: waits for its ALL-DONE (or process
# exit), then (1) hardware-smokes the round-2 Pallas kernels — the fused
# contextualization kernel failed Mosaic lowering on the first attempt and
# interpret mode can't catch that class — and (2) re-runs the training
# variant matrix that the lowering bug aborted. Same one-process discipline.
set -x
cd /root/repo

# wait for the r2b queue to drain (don't share the chip)
for i in $(seq 1 240); do
  if grep -q "ALL-DONE" /tmp/tpu_benches_r2b.log 2>/dev/null; then break; fi
  if ! pgrep -f run_tpu_benches_r2b.sh > /dev/null 2>&1; then break; fi
  sleep 15
done

healthy () {
  timeout 300 python - <<'PY'
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print("probe:", np.asarray((x @ x).sum()))
PY
}

run_step () {
  local t="$1"; shift
  if ! healthy; then echo "TUNNEL UNHEALTHY — skipping: $*"; return 1; fi
  date
  timeout "$t" "$@"
  local rc=$?
  date
  return $rc
}

# 1. kernel lowering + numerics smoke (fast; aborts the matrix if red)
run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

# 2. training-MFU variant matrix (VERDICT item 1), einsum baseline last
run_step 5400 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4,none:1:einsum --profile none:1 \
    --json bench_results/train_r2.json

# 3. softmax-variant A/Bs on the default variant
run_step 2400 env FLASH_EXP2=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_exp2_r2.json
run_step 2400 env FLASH_FIXEDMAX=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_fixedmax_r2.json

echo ALL-DONE-R2C
