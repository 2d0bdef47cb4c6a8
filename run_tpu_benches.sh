#!/bin/bash
# ONE sequential TPU bench session (NOTES.md: never run concurrent TPU work,
# never kill mid-flight). Run from /root/repo with NO PYTHONPATH:
#   nohup bash run_tpu_benches.sh > /tmp/tpu_benches.log 2>&1 &
set -x
cd /root/repo
date
# 1. training-MFU variant matrix (VERDICT next-round item 1)
timeout 10000 python bench_train.py --steps 8 --reps 3 \
    --variants none:1,dots:1,full:1,none:4 --profile none:1 \
    --json /tmp/bench_train_r2.json
date
# 2. decode levers: batch x window-granularity (VERDICT item 3)
timeout 10000 python bench_decode_sweep.py --profile 128:64 \
    --configs 128:128,128:64,256:128,256:64 --json /tmp/bench_decode_r2.json
date
# 3. the official headline bench (sanity reproduction)
timeout 6000 python bench.py
date
# 4. longer-trained backpack-mini on the synthetic corpus, then ppl gates
#    (VERDICT item 8: int4 margin on a less trivial model)
python - <<'PY'
import numpy as np
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
toks, floor = bigram_corpus(6_000_000, seed=0)
np.save("/tmp/bigram6m.npy", toks)
print("corpus ready, entropy floor ppl:", float(np.exp(floor)))
PY
timeout 10000 python -m backpacks_flash_attn_tpu.training.train_cli \
    --corpus /tmp/bigram6m.npy --model backpack-mini --steps 2500 \
    --batch-size 16 --seqlen 512 --warmup-steps 250 \
    --workdir /tmp/runs/bp-mini-r2
date
timeout 4000 python -m backpacks_flash_attn_tpu.eval.quant_gates \
    --workdir /tmp/runs/bp-mini-r2 --corpus /tmp/bigram6m.npy \
    --model backpack-mini | tee /tmp/gates_mini_r2.json
date
echo ALL-DONE
