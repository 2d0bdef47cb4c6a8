#!/bin/bash
# Round-3 second-wave TPU queue — ONE sequential session (NOTES.md: no
# concurrent TPU work; killing a mid-flight process wedges the tunnel).
# Re-runs the r3a failures with their fixes + the new engine-shaped A/Bs:
#   1. kernel smoke (the fused-ctx backward was rewritten o_heads-free)
#   2. quant gates on the already-trained backpack-mini (r3a skipped it on
#      a tunnel blip; /tmp/runs/bp-mini-r3 + /tmp/bigram6m.npy exist)
#   3. spec-step rel_cost at full scan length (r3a worker crash, retry;
#      fall back to 160 steps) + engine-shaped acceptance A/B
#   4. fused-ctx training A/B (new backward saves no o_heads residual)
#   5. dropout-cost attribution (attn-only off, all off)
#   6. fused-MLP retry (scoped-VMEM fix: content net excluded, acc capped)
#   7. engine window-bucket ladder A/B
#   8. B=64 full-remat point (none/dots OOM'd at compile, r3a)
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

run_step 1800 python tpu_smoke_kernels.py || { echo SMOKE-RED; exit 1; }

# 1b. optimized-HLO dump of the train step (compile-only; feeds the offline
#     fusion autopsy of the ~90GB/s MLP-backward + scan-stacking fusions)
run_step 1800 python dump_train_hlo.py --out /tmp/train_step_hlo.txt

# 2. quant gates (backpack-mini, 2500-step bigram train from r3a)
run_step 2400 bash -c 'python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r3 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee bench_results/gates_mini_r3.json'

# 3. speculative decoding: rel_cost (long scan) then the engine A/B
run_step 2400 python bench_spec_step.py --steps 448 --reps 2 \
    --json bench_results/spec_r3.json || \
run_step 1800 python bench_spec_step.py --steps 160 --reps 2 \
    --json bench_results/spec_r3.json
run_step 3600 python bench_spec_engine.py --workdir /tmp/runs/bp-mini-r3 \
    --corpus /tmp/bigram6m.npy --requests 32 --slots 16 \
    --json bench_results/spec_engine_r3.json

# 4. fused-ctx training A/B (o_heads-free backward)
run_step 3600 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,none:1:fused --json bench_results/train_ctx_r3b.json

# 5. dropout-cost attribution on the default variant
run_step 2400 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --attn-pdrop 0 --json bench_results/train_nodropattn_r3.json
run_step 2400 python bench_train.py --steps 8 --reps 3 --variants none:1 \
    --pdrop 0 --json bench_results/train_nodrop_r3.json

# 6. fused-MLP retry after the scoped-VMEM fix
run_step 2400 env BACKPACKS_FUSED_MLP=1 python bench_train.py --steps 8 \
    --reps 3 --variants none:1 --json bench_results/train_fusedmlp_r3.json

# 7. engine window-bucket ladder A/B
run_step 3600 python bench_window_buckets.py \
    --json bench_results/window_buckets_r3.json

# 8. B=64 full-remat training point
run_step 2400 python bench_train.py --steps 8 --reps 3 --batch 64 \
    --variants full:1 --json bench_results/train_b64_r3.json

echo ALL-DONE-R3B
