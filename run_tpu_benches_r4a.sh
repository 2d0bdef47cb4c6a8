#!/bin/bash
# Round-4 wave a: validate + measure the dtype/flash-layout work.
#   1. hardware kernel smoke (the d=64 no-pad blocks are a Mosaic-lowering
#      change — smoke FIRST, as the r2 lowering failure taught)
#   2. headline decode repro (inference flash path shares _head_pad)
#   3. train A/B: new defaults vs the r3 configuration restored via env
#      (BACKPACKS_F32_LOGITS=1 BACKPACKS_F32_DENSE=1) — isolates the dtype
#      changes; the flash-layout changes ride in both sides
#   4. profile of the new-defaults variant (next-lever forensics)
#   5. staged-cache spec bench at batch 128 (skipped in r3g: tunnel)
set -x
cd /root/repo

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
  date; timeout "$t" "$@"; local rc=$?; date
  echo "STEP-RC=$rc :: $*"
  return $rc
}

run_step 1200 python tpu_smoke_kernels.py || { echo SMOKE-FAILED; exit 1; }

run_step 2400 python bench.py

run_step 4800 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_r4a.json

BACKPACKS_F32_LOGITS=1 BACKPACKS_F32_DENSE=1 \
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4a_f32ab.json

run_step 3000 python bench_spec_step.py --steps 160 --reps 2 --stage 64 \
    --batch 128 --json bench_results/spec_staged_b128_r4.json

echo ALL-DONE-R4A
