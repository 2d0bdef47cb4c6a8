#!/bin/bash
# Round-4 wave c: in-kernel softmax scale + packed-qkv flash path.
#   1. kernel smoke (scale is now an SMEM operand in every flash kernel)
#   2. flash microbench incl. model-shaped packed/unpacked + block A/Bs
#   3. train: new defaults (packed qkv, in-kernel scale) + profile
#   4. train A/B: 512x512 flash blocks (microbench says they now win)
#   5. batch-64 retry (r4b hit a remote-compile HTTP 500; maybe transient)
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
  local ok=0
  for i in 1 2 3 4 5 6; do
    if healthy; then ok=1; break; fi
    echo "probe $i unhealthy; sleeping 120s before: $*"; sleep 120
  done
  if [ "$ok" != 1 ]; then echo "TUNNEL STILL UNHEALTHY — skipping: $*"; return 1; fi
  date; timeout "$t" "$@"; local rc=$?; date
  echo "STEP-RC=$rc :: $*"
  return $rc
}

run_step 1200 python tpu_smoke_kernels.py || { echo SMOKE-FAILED; exit 1; }

run_step 4200 python bench_flash.py --json bench_results/flash_r4c.json

run_step 4800 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_r4c.json

FLASH_BLOCK_Q=512 FLASH_BLOCK_K=512 \
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4c_blk512.json

FLASH_BLOCK_Q=512 FLASH_BLOCK_K=512 FLASH_HEAD_GROUP=4 \
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4c_blk512_g4.json

FLASH_HEAD_GROUP=4 \
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4c_g4.json

run_step 4800 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --batch 64 --json bench_results/train_r4c_b64.json

echo ALL-DONE-R4C
