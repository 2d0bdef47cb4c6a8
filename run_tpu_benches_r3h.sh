#!/bin/bash
# Round-3 wave h: the one unmeasured training lever left — FULL scan unroll
# (none:12). unroll=4 lost (54.1k, train_r3.json) because a partial unroll
# keeps the while loop AND the stacked saves; unroll=n_layer removes the
# loop entirely so saved activations stay as separate values (no
# dynamic-update-slice stacking — the 18.2ms/step gpt.py:294 stream in
# train_combo_r3_profile.json). Plus the batch-128 staged-serving bench the
# r3g health probe skipped.
set -x
cd /root/repo

healthy () {
  timeout 600 python - <<'PY'
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

run_step 4800 python bench_train.py --steps 8 --reps 3 \
    --variants none:12,none:1 --json bench_results/train_unroll_r3.json

run_step 3000 python bench_spec_step.py --steps 96 --reps 2 --stage 64 \
    --batch 128 --json bench_results/spec_staged_b128_r3.json

echo ALL-DONE-R3H
