#!/bin/bash
# Round-3 final measurement queue: everything at the NEW DEFAULTS
# (flash blocks 256, fused single-pass backward, 1-round dropout hash,
# hash-based token dropout, scatter-free per-slot writes, 128-aligned
# engine buckets, spec_tokens=4 adaptive).
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

run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

# final training number + full attribution at defaults
run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --profile none:1 --json bench_results/train_final_r3.json

# headline decode reproduction (prefill now uses 256 flash blocks)
run_step 3000 bash -c 'python bench.py | tee bench_results/headline_r3final.txt'

# per-slot serving step costs at defaults (scalar control + plain + verify)
run_step 1800 python bench_spec_step.py --steps 160 --reps 2 \
    --json bench_results/spec_final_r3.json

# engine-throughput ladder at serving batch (128-aligned buckets only)
run_step 3600 python bench_window_buckets.py --batch 128 --steps 320 \
    --json bench_results/window_buckets_b128_r3.json

echo ALL-DONE-R3E
