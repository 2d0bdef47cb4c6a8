#!/bin/bash
# Round-4 wave d: pick the final training defaults.
#   Standing results (batch 32, ms/step): unpacked/blk256/G1 212.7 (r4b),
#   packed/blk256/G1 216.9, packed/blk512/G1 209.9. This wave measures the
#   remaining corner (unpacked + blk512 + G4), then reruns the headline and
#   the batch-64 attempt on the winner. 512-block Mosaic compiles take
#   ~40min — budget accordingly.
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
  for i in $(seq 1 10); do
    if healthy; then ok=1; break; fi
    echo "probe $i unhealthy; sleeping 180s before: $*"; sleep 180
  done
  if [ "$ok" != 1 ]; then echo "TUNNEL STILL UNHEALTHY — skipping: $*"; return 1; fi
  date; timeout "$t" "$@"; local rc=$?; date
  echo "STEP-RC=$rc :: $*"
  return $rc
}

BACKPACKS_PACKED_QKV=0 FLASH_BLOCK_Q=512 FLASH_BLOCK_K=512 FLASH_HEAD_GROUP=4 \
run_step 6000 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4d_unpacked512g4.json

BACKPACKS_PACKED_QKV=0 FLASH_BLOCK_Q=512 FLASH_BLOCK_K=512 \
run_step 6000 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4d_unpacked512.json

run_step 2400 python bench.py

BACKPACKS_PACKED_QKV=0 FLASH_BLOCK_Q=512 FLASH_BLOCK_K=512 FLASH_HEAD_GROUP=4 \
run_step 6000 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --batch 64 --json bench_results/train_r4d_b64.json

echo ALL-DONE-R4D
