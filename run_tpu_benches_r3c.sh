#!/bin/bash
# Round-3 third-wave TPU queue — fired automatically after r3b finishes.
#   1. re-measure the default train variant after the dropout-mask-recompute
#      fix (expected: the ~8.5ms/step of stacked pred-mask DUS traffic gone)
#      with a fresh 100%-attribution profile digest
#   2. flash block-size matrix (FLASH_BLOCK_Q/K): at s=512 the default
#      512x512 single tile computes the dead causal upper triangle; smaller
#      tiles skip it via the causal loop bounds but pay grid+loop overhead
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

# 0. speculative benches — skipped in r3b on a tunnel blip (VERDICT item 2)
run_step 2400 python bench_spec_step.py --steps 448 --reps 2 \
    --json bench_results/spec_r3.json || \
run_step 1800 python bench_spec_step.py --steps 160 --reps 2 \
    --json bench_results/spec_r3.json
run_step 3600 python bench_spec_engine.py --workdir /tmp/runs/bp-mini-r3 \
    --corpus /tmp/bigram6m.npy --requests 32 --slots 16 \
    --json bench_results/spec_engine_r3.json

run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_r3c.json

# 1b. dropout-hash rounds A/B (token sites now hash instead of threefry;
#     1 round halves the mix cost — statistics tested either way)
run_step 2400 env FLASH_DROPOUT_ROUNDS=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_rounds1_r3.json

run_step 2400 env FLASH_BLOCK_Q=256 FLASH_BLOCK_K=256 python bench_train.py \
    --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_blk256_r3.json
run_step 2400 env FLASH_BLOCK_Q=128 FLASH_BLOCK_K=128 python bench_train.py \
    --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_blk128_r3.json
run_step 2400 env FLASH_BLOCK_Q=256 FLASH_BLOCK_K=512 python bench_train.py \
    --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_blk256x512_r3.json

# 2b. window-bucket ladder (r3b: worker crash at batch 128 — same tunnel
#     flake signature as the r3a spec run; the ladder only needs RELATIVE
#     per-window costs, so run lighter)
run_step 3600 python bench_window_buckets.py --batch 64 --steps 320 \
    --json bench_results/window_buckets_r3.json

# 3. XLA:TPU tuning knob: 4x scoped-VMEM headroom lets the fusion sizer
#    pick bigger tiles (the MLP/content GEMM fusions sit at ~58% MXU)
run_step 2400 env BACKPACKS_XLA_OPTS='{"xla_tpu_scoped_vmem_limit_kib":"65536"}' \
    python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_vmem64_r3.json

echo ALL-DONE-R3C
