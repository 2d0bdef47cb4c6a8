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
for i in $(seq 1 10); do
  if healthy; then
    date; timeout 2400 python bench.py
    echo "STEP-RC=$? :: bench.py"; echo DONE-FINAL-CHECK; exit 0
  fi
  echo "probe $i unhealthy; sleeping 150s"; sleep 150
done
echo GAVE-UP
