#!/bin/bash
# Round-4 wave b: the scratch-accumulator fused backward + bf16 dgrad work.
#   1. hardware kernel smoke (scratch bwd is a new Mosaic lowering)
#   2. flash microbench — where do the ~52ms of flash time actually go
#      (fwd vs bwd, block sizes, fused/split, dropout, transpose cost)
#   3. train: new defaults, with profile (scratch bwd + bf16 dgrads/logits)
#   4. train A/B: FLASH_BWD_SCRATCH=0 isolates the scratch-bwd delta
#   5. train at batch 64 (the dtype work freed ~2GB of residuals; if
#      remat=none fits, larger batch is the cheapest MFU lever)
#   6. headline decode repro
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
  # r4a lost its two decisive train measurements to single-shot health
  # probes during a transient tunnel wobble: WAIT for health (up to ~35min)
  # instead of skipping.
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

run_step 3600 python bench_flash.py --json bench_results/flash_r4.json

run_step 4800 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_r4b.json

FLASH_BWD_SCRATCH=0 \
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4b_noscratch.json

run_step 4800 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --batch 64 --json bench_results/train_r4b_b64.json

run_step 2400 python bench.py

echo ALL-DONE-R4B
