#!/bin/bash
# Round-3 wave g: staged-serving measurement (retry after the mid-edit
# crash + capacity/donation fixes) and the honest final train number at
# the reverted 2-round dropout-hash default.
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

run_step 3000 python bench_spec_step.py --steps 160 --reps 2 --stage 64 \
    --json bench_results/spec_staged_r3.json || \
run_step 2400 python bench_spec_step.py --steps 96 --reps 2 --stage 64 \
    --json bench_results/spec_staged_r3.json

run_step 3000 python bench_spec_step.py --steps 160 --reps 2 --stage 64 \
    --batch 128 --json bench_results/spec_staged_b128_r3.json

run_step 3600 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_final2_r3.json

echo ALL-DONE-R3G
