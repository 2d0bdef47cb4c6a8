#!/bin/bash
# Round-5 wave 1: int4 decode A/B + cache-precision quality gates.
# Pattern: wait-for-health probes between steps (the tunnel goes unhealthy
# for 20-60 min after heavy sessions; single-shot probes lose measurements).
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

# 1. kernel-level A/B: int8-flat vs int4-{xla,blockdiag} at model shapes
run_step 4800 python bench_int4_kernels.py \
    --json bench_results/int4_kernels_r5.json

# 2. end-to-end headline A/B: bf16 / int8 / int4 caches through bench.py
run_step 4800 bash -c 'python bench.py | tee bench_results/headline_r5a.txt'

# 3. trained mini for the quality gates (r3 artifacts did not survive /tmp)
if [ ! -f /tmp/bigram6m.npy ]; then
python - <<'PY'
import numpy as np
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
toks, floor = bigram_corpus(6_000_000, seed=0)
np.save("/tmp/bigram6m.npy", toks)
print("corpus ready, entropy floor ppl:", float(np.exp(floor)))
PY
fi
if [ ! -d /tmp/runs/bp-mini-r5 ]; then
run_step 9000 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-mini --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-mini-r5
fi

# 4. weight + CACHE precision gates (int8/int4/hybrid decode-path ppl)
run_step 4800 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r5 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r5.json'

echo ALL-DONE-R5A
