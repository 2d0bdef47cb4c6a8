#!/bin/bash
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
  local ok=0
  for i in $(seq 1 10); do
    if healthy; then ok=1; break; fi
    echo "probe $i unhealthy; sleeping 180s before: $*"; sleep 180
  done
  if [ "$ok" != 1 ]; then echo "TUNNEL STILL UNHEALTHY — skipping: $*"; return 1; fi
  date; timeout "$t" "$@"; local rc=$?; date
  echo "STEP-RC=$rc :: $*"
  return $rc
}
FLASH_HEAD_GROUP=6 \
run_step 6000 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r4g_g6.json
echo ALL-DONE-R4G
