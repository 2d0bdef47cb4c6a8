#!/bin/bash
# Round-5 wave 4 (final): hardware preflight of the new kernels, the real
# headline A/B (int8 vs int4-KV vs mixed), mixed-mode gates, fixed engine
# bench, long-context rerun with the repaired flash backward.
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

# 0. hardware lowering preflight for every new kernel variant
run_step 3600 bash -c 'python tpu_smoke_kernels.py 2>&1 | tail -25 | tee bench_results/smoke_r5d.txt'

# 1. headline: bf16 / int8 / int4-KV hybrid / mixed
run_step 7200 bash -c 'python bench.py | tee bench_results/headline_r5d.txt'

# 2. mixed-mode cache gates (bits=4 now = int4 senses + int8 split ctx-K)
run_step 6000 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r5 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r5c.json'

# 3. engine on-chip throughput (segment fix), efficiency vs today's scan
SCANREF=$(python - <<'PY'
import json
try:
    txt = open("bench_results/headline_r5d.txt").read().strip().splitlines()[-1]
    print(json.loads(txt)["detail"]["int8_tokens_per_s"])
except Exception:
    print(43949)
PY
)
run_step 6000 python bench_engine.py --scan-ref "$SCANREF" \
    --json bench_results/engine_r5b.json

# 4. long-context rerun: flash bwd + the 8k training step (budget fix)
run_step 7200 python bench_longctx.py --json bench_results/longctx_r5b.json

# 5. kernel A/B incl. the mixed variants
run_step 4800 python bench_int4_kernels.py \
    --json bench_results/int4_kernels_r5c.json

echo ALL-DONE-R5D
