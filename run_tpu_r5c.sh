#!/bin/bash
# Round-5 wave 3: flash-bwd long-context diagnosis, int4 headline rerun
# (lane fix), engine on-chip number, FLATTEN_M train A/B, micro draft
# training + model-draft engine measurement.
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

# 1. flash backward at s=2048: capture the FULL compile error
run_step 2400 bash -c 'python - > bench_results/flashbwd_2k_diag.log 2>&1 <<"PY"
import jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.ops import flash_attention as fa
b, s, h, d = 8, 2048, 12, 64
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q, k, v, g = (jax.random.normal(kk, (b, s, h, d), jnp.bfloat16) for kk in ks)
def loss(q, k, v):
    o = fa.flash_attention(q, k, v, causal=True)
    return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))
try:
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    print("OK", [np.asarray(x).shape for x in grads])
except Exception as ex:
    print("FULL ERROR:\n", ex)
PY
tail -5 bench_results/flashbwd_2k_diag.log'

# 1b. gates rerun with the reverse-hybrid (int4-KV-only) arm
run_step 6000 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r5 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r5b.json'

# 2. int4 headline A/B (lane-fix in the kernel now; int4-KV hybrid arm)
run_step 6000 bash -c 'python bench.py | tee bench_results/headline_r5c.txt'

# 3. kernel micro A/B at the combine shapes
run_step 4800 python bench_int4_kernels.py \
    --json bench_results/int4_kernels_r5b.json

# 4. engine on-chip throughput, efficiency vs the scan headline
SCANREF=$(python - <<'PY'
import json, re
try:
    txt = open("bench_results/headline_r5c.txt").read().strip().splitlines()[-1]
    print(json.loads(txt)["detail"]["int8_tokens_per_s"])
except Exception:
    print(43949)
PY
)
run_step 6000 python bench_engine.py --scan-ref "$SCANREF" \
    --json bench_results/engine_r5.json

# 5. FLATTEN_M training A/B (on top of the now-default DALN saves)
run_step 4800 env BACKPACKS_FLATTEN_M=1 python bench_train.py \
    --steps 8 --reps 3 --variants none:1 \
    --json bench_results/train_r5_flatm.json

# 6. nano draft model (cache stream ~5% of the mini's: break-even ~6%
#    acceptance at k=4) + model-draft speculation measurement
if [ ! -f /tmp/runs/bp-nano-r5/DONE ]; then
run_step 7200 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-nano --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-nano-r5 && touch /tmp/runs/bp-nano-r5/DONE
fi
run_step 7200 python bench_spec_engine.py \
    --workdir /tmp/runs/bp-mini-r5 --model backpack-mini \
    --corpus /tmp/bigram6m.npy \
    --draft-workdir /tmp/runs/bp-nano-r5 --draft-model backpack-nano \
    --json bench_results/spec_engine_r5.json

echo ALL-DONE-R5C
