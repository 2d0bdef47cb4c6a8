#!/bin/bash
# Round-3 TPU measurement queue — ONE sequential session (NOTES.md: no
# concurrent TPU work; a process killed mid-flight wedges the tunnel for
# 25min-2.5h). Encodes VERDICT.md round-3 items 1-3 + 7:
#   wave 1: smoke -> spec-step OOM dry-run (item 7) -> full train matrix
#           with 100%-coverage profile digest (item 1) -> exp2/fixedmax/
#           fused-mlp A/Bs (item 1) -> spec rel_cost (item 2) -> B=64 point
#   wave 2: backpack-mini 2500-step train + int8/int4 ppl gates (item 3)
#   wave 3: headline reproduction
# `touch /tmp/SKIP_TRAIN_BENCH` aborts queued bench_train steps cleanly.
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
  echo "STEP-RC=$rc :: $*"
  return $rc
}

# 0. kernel lowering + numerics smoke FIRST (interpret mode cannot catch
#    Mosaic lowering errors — one aborted the whole 2026-08-18 matrix)
run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

# 1. spec-step OOM dry-run (VERDICT item 7: verify the batch-64 retune
#    BEFORE the queue depends on it)
run_step 1500 python bench_spec_step.py --steps 8 --reps 1 \
    --json bench_results/spec_dryrun_r3.json

# 2. training-MFU variant matrix (default is einsum-alpha since 941ce80;
#    'fused' re-measures the Pallas ctx kernel as the non-default side).
#    Profile digest now covers 100% of the step (by_source/by_phase).
run_step 7200 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4,none:1:fused --profile none:1 \
    --json bench_results/train_r3.json

# 3. kernel A/Bs on the default variant (flip defaults on wins):
#    exp2 softmax (bench_vpu: +13% raw VPU rate), fixed-max softmax,
#    single-pass fused MLP forward (bench_mlp: fwd 45% MXU vs bwd 72%)
run_step 2400 env FLASH_EXP2=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_exp2_r3.json
run_step 2400 env FLASH_FIXEDMAX=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_fixedmax_r3.json
run_step 2400 env BACKPACKS_FUSED_MLP=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_fusedmlp_r3.json

# 3b. speculative verification rel_cost (sets the spec_tokens default)
run_step 2400 python bench_spec_step.py --json bench_results/spec_r3.json

# 3c. batch-64 data point (remat=dots fallback if plain OOMs)
run_step 2400 python bench_train.py --steps 8 --reps 3 --batch 64 \
    --variants none:1 --json bench_results/train_b64_r3.json || \
run_step 2400 python bench_train.py --steps 8 --reps 3 --batch 64 \
    --variants dots:1 --json bench_results/train_b64_r3.json

# 4. longer-trained backpack-mini on the synthetic corpus, then ppl gates
#    (int4 margin on a less trivial model than the r1 micro); the trained
#    workdir doubles as the engine-shaped spec-decode model for wave 3
if healthy; then
python - <<'PY'
import numpy as np
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
toks, floor = bigram_corpus(6_000_000, seed=0)
np.save("/tmp/bigram6m.npy", toks)
print("corpus ready, entropy floor ppl:", float(np.exp(floor)))
PY
run_step 9000 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-mini --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-mini-r3
run_step 2400 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r3 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r3.json'
fi

# 5. headline reproduction (r2: 43,996.7 tok/s int8)
run_step 3000 bash -c 'python bench.py | tee bench_results/headline_r3.txt'

echo ALL-DONE-R3
