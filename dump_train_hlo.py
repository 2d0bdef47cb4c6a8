"""Dump the OPTIMIZED (post-fusion) HLO of the backpack-small train step.

The r3 trace digest attributes ~55ms/step to the MLP custom_vjp with two
pathological ~90GB/s backward fusions (fusion.767, multiply_reduce_fusion.95)
and ~20ms to low-rate scan residual stacking — this dump lets those fusion
bodies be read offline (the axon terminal scrubs --xla_dump_to, but the
compiled executable's .as_text() comes back through the client).

Compile-only (the remote helper AOT-compiles chipless); writes
/tmp/train_step_hlo.txt (~10-50MB). Run from /root/repo, NO PYTHONPATH:
    timeout 1800 python dump_train_hlo.py [--out /tmp/train_step_hlo.txt]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.training import train as train_lib

from bench_train import build_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=512)
    args = ap.parse_args()

    cfg = backpack_small()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tx = train_lib.make_optimizer(params, warmup_steps=10, total_steps=1000)
    opt_state = jax.jit(tx.init)(params)
    state = train_lib.TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    batch = {"input_ids": jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (args.batch, args.seqlen + 1)), jnp.int32)}
    rng = jax.random.PRNGKey(1)

    fn = build_step(cfg, tx, remat=False, unroll=1, steps=8)
    compiled = fn.lower(state, batch, rng).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB of optimized HLO to {args.out}")
    try:
        stats = compiled.memory_analysis()
        print("memory_analysis:", stats)
    except Exception as e:  # plugin-dependent
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
