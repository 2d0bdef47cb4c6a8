#!/bin/bash
# Trimmed sequential TPU bench session for the round-2 continuation:
# step 1 (VPU) already has results (bench_results/vpu_r2.json: exp2 wins
# 86.8 vs 76.9 Gelem/s); step 8 (2500-step mini train) doesn't fit this
# session's wall clock. Same one-process discipline as run_tpu_benches.sh.
set -x
cd /root/repo

healthy () {
  timeout 300 python - <<'PY'
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print("probe:", np.asarray((x @ x).sum()))
PY
}

run_step () {  # run_step <timeout_s> <cmd...>
  local t="$1"; shift
  if ! healthy; then echo "TUNNEL UNHEALTHY — skipping: $*"; return 1; fi
  date
  timeout "$t" "$@"
  local rc=$?
  date
  return $rc
}

# int8 stream-rate A/B (decode lever: bitcast-int32 reads)
run_step 2400 python bench_int8_stream.py --json bench_results/i8stream_r2.json

# MLP GEMM MXU isolation (training lever: 50%-MXU MLPs)
run_step 2400 python bench_mlp.py --json bench_results/mlp_r2.json

# speculative verification step cost
run_step 2400 python bench_spec_step.py --json bench_results/spec_r2.json

# training-MFU variant matrix (the 35%->50% push)
run_step 5400 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4,none:1:einsum --profile none:1 \
    --json bench_results/train_r2.json

# exp2-softmax kernel A/B on the default variant (VPU bench says exp2 wins)
run_step 2400 env FLASH_EXP2=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_exp2_r2.json

# fixed-max (VFA-style) softmax A/B
run_step 2400 env FLASH_FIXEDMAX=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_fixedmax_r2.json

# decode levers: batch x window-granularity
run_step 4800 python bench_decode_sweep.py --profile 128:64 \
    --configs 128:128,128:64,256:128,256:64 --json bench_results/decode_r2.json

# headline bench reproduction last (it's the driver's job anyway)
run_step 2400 python bench.py

echo ALL-DONE
