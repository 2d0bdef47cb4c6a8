#!/bin/bash
# Round-5 wave 2: int4 headline A/B, DALN bf16-saves train A/B, fixed
# kernel micro-A/B, long-context validation, then the mini train + gates.
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

# 1. end-to-end headline A/B: bf16 / int8 / int4 caches
run_step 6000 bash -c 'python bench.py | tee bench_results/headline_r5b.txt'

# 2. training A/B: DALN bf16-saves off vs on (shipped r4 config otherwise)
run_step 4800 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_r5_base.json
run_step 4800 env BACKPACKS_DALN_BF16_SAVES=1 python bench_train.py \
    --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r5_daln.json

# 3. kernel-level int4 A/B (per-variant fault isolation now)
run_step 4800 python bench_int4_kernels.py \
    --json bench_results/int4_kernels_r5.json

# 4. long-context: flash/blocksparse/einsum at 2k/4k/8k + 8k train step
run_step 7200 python bench_longctx.py --json bench_results/longctx_r5.json

# 5. trained mini for the quality gates (bwd VMEM fix landed)
if [ ! -f /tmp/bigram6m.npy ]; then
python - <<'PY'
import numpy as np
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
toks, floor = bigram_corpus(6_000_000, seed=0)
np.save("/tmp/bigram6m.npy", toks)
print("corpus ready, entropy floor ppl:", float(np.exp(floor)))
PY
fi
if [ ! -f /tmp/runs/bp-mini-r5/DONE ]; then
run_step 9000 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-mini --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-mini-r5 && touch /tmp/runs/bp-mini-r5/DONE
fi

# 6. weight + CACHE precision gates (int8/int4/hybrid decode-path ppl)
run_step 6000 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r5 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r5.json'

echo ALL-DONE-R5B
