#!/bin/bash
# Round-5 wave 5: stacked-kernel smoke, the decisive headline A/B, and
# per-op attribution of the mixed-vs-int8 and engine-vs-scan gaps.
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
  local t=$1; shift
  for i in $(seq 1 12); do
    if healthy; then
      date; timeout "$t" "$@"; echo "STEP-RC=$? :: $*"; return 0
    fi
    echo "probe $i unhealthy; sleeping 180s"; sleep 180
  done
  echo "GAVE-UP :: $*"; return 1
}

mkdir -p bench_results

# 0. hardware preflight (now actually runs the r5 sections)
run_step 3600 bash -c 'python tpu_smoke_kernels.py 2>&1 | tail -30 | tee bench_results/smoke_r5e.txt'

# 1. headline: stacked kernels in the model path
run_step 7200 bash -c 'python bench.py | tee bench_results/headline_r5e.txt'

# 2. attribution: int8 vs mixed vs kv4 vs engine step profiles
run_step 6000 python bench_decode_profile.py \
    --json bench_results/decode_profile_r5.json

echo ALL-DONE-R5E
