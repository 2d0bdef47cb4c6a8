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
for i in $(seq 1 12); do
  if healthy; then
    date; timeout 4800 python bench_flash.py --json bench_results/flash_r4_final.json
    echo "STEP-RC=$? :: bench_flash"; echo ALL-DONE-R4H3; exit 0
  fi
  echo "probe $i unhealthy; sleeping 180s"; sleep 180
done
echo GAVE-UP
