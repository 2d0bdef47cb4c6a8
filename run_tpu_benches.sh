#!/bin/bash
# ONE sequential TPU bench session (NOTES.md: no concurrent TPU work; a
# process killed mid-compile/mid-flight wedges the tunnel for 25min-2.5h).
# Each step re-checks tunnel health first: once a step times out (and its
# kill has likely re-wedged the terminal), later steps are SKIPPED instead
# of hanging into their own timeouts. Run from /root/repo, NO PYTHONPATH:
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

# Ordered so an arbitrarily short recovery window still yields the most
# information per minute: quick lever-closing diagnostics first, then the
# headline reproduction, then the long matrices, then the training run.

# 1. VPU exp vs exp2 rates — is the CUDA exp2-softmax rewrite worth
#    porting into the flash kernels?
run_step 2000 python bench_vpu.py --json bench_results/vpu_r2.json

# 2. int8 stream-rate A/B (NOTES decode lever: bitcast-int32 reads) —
#    answers whether a bitcast-reading decode kernel is worth building
run_step 3000 python bench_int8_stream.py --json bench_results/i8stream_r2.json

# 3. MLP GEMM MXU isolation (NOTES training lever: 50%-MXU MLPs) —
#    separates raw-GEMM efficiency from the fused-MLP custom_vjp's
run_step 3000 python bench_mlp.py --json bench_results/mlp_r2.json

# 4. speculative verification step cost (serving spec_tokens lever):
#    rel_cost = t_verify/t_plain sets the speculation speedup
#    (1 + acceptance*k)/rel_cost
run_step 3000 python bench_spec_step.py --json bench_results/spec_r2.json

# 5. the official headline bench (sanity reproduction)
run_step 3000 python bench.py

# 6. decode levers: batch x window-granularity (VERDICT item 3)
run_step 6000 python bench_decode_sweep.py --profile 128:64 \
    --configs 128:128,128:64,256:128,256:64 --json bench_results/decode_r2.json

# 7. training-MFU variant matrix (VERDICT next-round item 1); the riskiest
#    compile (einsum-alpha baseline) is deliberately the LAST variant.
run_step 6000 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4,none:1:einsum --profile none:1 \
    --json bench_results/train_r2.json

# 7b. exp2-softmax kernel A/B on the best variant (env-gated; see
#     ops/flash_attention._EXP2 and bench_vpu's verdict)
run_step 3000 env FLASH_EXP2=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_exp2_r2.json

# 7c. fixed-max (VFA-style) softmax A/B: drops the online-max chain from
#     the flash AND fused-contextualization forwards (FLASH_FIXEDMAX)
run_step 3000 env FLASH_FIXEDMAX=1 python bench_train.py --steps 8 --reps 3 \
    --variants none:1 --json bench_results/train_fixedmax_r2.json

# 8. longer-trained backpack-mini on the synthetic corpus, then ppl gates
#    (VERDICT r1 item 8: int4 margin on a less trivial model)
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
    --workdir /tmp/runs/bp-mini-r2
run_step 2400 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r2 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r2.json'
fi
echo ALL-DONE
