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

# per-slot vs scalar decode-step cost (the r3c spec runs measured
# ~138ms/step on the per-slot cache — 50x the scalar-length headline; the
# scalar control inside bench_spec_step localizes it on-chip)
run_step 1800 python bench_spec_step.py --steps 160 --reps 2 \
    --json bench_results/spec_r3d.json

# r3c skipped these two on transient unhealthy probes:
# post-dropout-fix default re-measure + full profile, and the rounds A/B
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_r3c.json
run_step 2400 env FLASH_DROPOUT_ROUNDS=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_rounds1_r3.json
run_step 3600 python bench_window_buckets.py --batch 64 --steps 320 \
    --json bench_results/window_buckets_r3.json

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
