#!/bin/bash
# Train-matrix re-run after the lowering fix; trimmed to the 3 decisive
# variants (fused-ctx default, remat=dots, einsum-alpha baseline) to fit
# the remaining session wall clock. exp2/fixedmax A/Bs last — cut them
# with `touch /tmp/SKIP_TRAIN_BENCH` if time runs out.
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
  date
  timeout "$t" "$@"
  local rc=$?
  date
  return $rc
}

run_step 1200 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

run_step 4200 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,none:1:einsum --profile none:1 \
    --json bench_results/train_r2.json

run_step 2400 env FLASH_EXP2=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_exp2_r2.json
run_step 2400 env FLASH_FIXEDMAX=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_fixedmax_r2.json
run_step 2400 env BACKPACKS_FUSED_MLP=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_fusedmlp_r2.json

echo ALL-DONE-R2D
