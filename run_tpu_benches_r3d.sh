#!/bin/bash
# Round-3 fourth-wave TPU queue — fired after r3c. The fused single-pass
# flash backward (FLASH_FUSED_BWD: one (s, mask, hash, exp) recompute per
# tile instead of two, 5 MXU dots instead of 7) A/B'd alone and stacked
# with the dropout-rounds and block-size knobs.
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

# kernel smoke first (now covers the fused single-pass bwd lowering)
run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

run_step 2400 env FLASH_FUSED_BWD=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_fusedbwd_r3.json
run_step 2400 env FLASH_FUSED_BWD=1 FLASH_DROPOUT_ROUNDS=1 \
    python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_fusedbwd_r1_r3.json
run_step 2400 env FLASH_FUSED_BWD=1 FLASH_BLOCK_Q=256 FLASH_BLOCK_K=256 \
    python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_fusedbwd_blk256_r3.json
run_step 2400 env FLASH_FUSED_BWD=1 FLASH_DROPOUT_ROUNDS=1 FLASH_BLOCK_Q=256 \
    FLASH_BLOCK_K=256 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --profile none:1 \
    --json bench_results/train_combo_r3.json

echo ALL-DONE-R3D
