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
if ! healthy; then echo UNHEALTHY; exit 1; fi
date; timeout 4800 python bench_flash.py --json bench_results/flash_r4_final.json
echo "STEP-RC=$? :: bench_flash"
echo ALL-DONE-R4H2
