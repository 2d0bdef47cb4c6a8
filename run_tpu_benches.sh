#!/bin/bash
# ONE sequential TPU bench session (NOTES.md: no concurrent TPU work; a
# process killed mid-compile/mid-flight wedges the tunnel for 25min-2.5h).
# Refreshed after the 2026-08-19 session: levers CLOSED by measurement are
# gone (64-granular windows LOSE 42.7k->35.6k — scan-segment overhead;
# batch 256 OOMs; int8-stream bitcast inconclusive and the XLA flat
# contraction already beats every Pallas decode variant). What remains is
# the training matrix + softmax/MLP kernel A/Bs and the quant-gate mini.
# Each step re-checks tunnel health; `touch /tmp/SKIP_TRAIN_BENCH` (or
# SKIP_DECODE_BENCH) makes queued steps exit cleanly mid-session.
# Run from /root/repo, NO PYTHONPATH:
#   nohup bash run_tpu_benches.sh > /tmp/tpu_benches.log 2>&1 &
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
  return $rc
}

# 0. kernel lowering + numerics smoke FIRST — interpret mode cannot catch
#    Mosaic lowering errors (one aborted the whole 2026-08-18 matrix)
run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

# 1. the official headline bench (sanity reproduction; r2: 43,996 tok/s)
run_step 3000 python bench.py

# 2. training-MFU variant matrix; einsum-alpha baseline is the riskiest
#    compile and deliberately last
run_step 6000 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4,none:1:einsum --profile none:1 \
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

# 3b. speculative verification rel_cost (batch 64 after the r2 OOM) —
#     sets the spec_tokens default + adaptive threshold
run_step 2400 python bench_spec_step.py --json bench_results/spec_r3.json

# 4. longer-trained backpack-mini on the synthetic corpus, then ppl gates
#    (int4 margin on a less trivial model than the r1 micro)
if healthy; then
python - <<'PY'
import numpy as np
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
toks, floor = bigram_corpus(6_000_000, seed=0)
np.save("/tmp/bigram6m.npy", toks)
print("corpus ready, entropy floor ppl:", float(np.exp(floor)))
PY
run_step 7200 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-mini --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-mini-r3
run_step 2400 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r3 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r3.json'
fi
echo ALL-DONE
