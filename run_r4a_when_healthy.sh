#!/bin/bash
# Poll the axon tunnel; when a small matmul round-trips, fire the r4a wave.
# Probes every 5 min for up to 6 h.
cd /root/repo
for i in $(seq 1 72); do
  if timeout 300 python - <<'PY'
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print("probe:", np.asarray((x @ x).sum()))
PY
  then
    echo "TUNNEL HEALTHY at $(date) (attempt $i)"
    exec bash run_tpu_benches_r4a.sh
  fi
  echo "probe $i failed at $(date); sleeping 300s"
  sleep 300
done
echo "GAVE UP waiting for tunnel"
exit 1
