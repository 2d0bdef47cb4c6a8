"""Training-throughput variant matrix on the real chip — ONE sequential run.

Measures full train steps (fwd + bwd + AdamW) for backpack-small at
batch 32 x seq 512 in bf16 across rematerialization / scan-unroll variants,
reporting tokens/s, TFLOP/s and MFU (v5e bf16 peak 197 TFLOP/s). The round-1
baseline was 67.8k tok/s (~35% MFU) with remat=none, unroll=1, and the alpha
tensor materialized; round 2 adds the fused contextualization kernel
(ops/backpack_kernels.py), the "dots" checkpoint policy, and scan unrolling
(VERDICT.md "next round" item 1).

Methodology per NOTES.md / memory: params as jit ARGUMENTS (closure params
wedge the remote compiler), lax.scan over steps with donated state, best-of
reps, np.asarray fetch. Run from /root/repo with NO PYTHONPATH:

    timeout 10000 python bench_train.py [--steps 8] [--reps 3] \
        [--variants none:1,dots:1,full:1,none:12] [--profile none:1] \
        [--batch 32] [--json out.json]
"""

import argparse
import functools
import json
import os
import sys
import time

# Sentinel kill switch: the bench queue runs as one sequential background
# script whose steps must never be SIGKILLed mid-flight (a killed TPU
# process wedges the axon tunnel for 25min-2.5h — NOTES.md). touch(1) this
# file to make QUEUED bench_train invocations exit cleanly instead.
if os.path.exists("/tmp/SKIP_TRAIN_BENCH"):
    print("SKIP_TRAIN_BENCH sentinel present — skipping", file=sys.stderr)
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.training import train as train_lib

V5E_PEAK_BF16 = 197e12


def build_step(cfg, tx, remat, unroll, steps, fused_ctx=None):
    step_fn = train_lib.make_train_step(cfg, tx, model="backpack",
                                        use_flash=True, remat=remat,
                                        scan_unroll=unroll,
                                        fused_ctx=fused_ctx)

    def run(state, batch, rng):
        def body(s, _):
            s, metrics = step_fn(s, batch, rng)
            return s, metrics["loss"]
        return jax.lax.scan(body, state, None, length=steps)

    return jax.jit(run, donate_argnums=(0,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--variants", default="none:1,dots:1,full:1,none:12")
    ap.add_argument("--model", default="backpack-small",
                    help="backpack-small, or backpack-test for a CPU smoke")
    ap.add_argument("--profile", default="",
                    help="variant (e.g. none:1) to capture a jax trace for")
    ap.add_argument("--trace-dir", default="/tmp/train_trace")
    ap.add_argument("--json", default="")
    ap.add_argument("--attn-pdrop", type=float, default=None,
                    help="override cfg.attn_pdrop (0 isolates the in-kernel "
                         "counter-hash dropout cost in the flash kernels)")
    ap.add_argument("--pdrop", type=float, default=None,
                    help="override ALL dropout rates (embd/resid/attn)")
    args = ap.parse_args()

    if args.model == "backpack-test":
        from backpacks_flash_attn_tpu.config import backpack_test
        cfg = backpack_test()
        # the CPU smoke model has n_positions=128; longer sequences would
        # gather out of range in the position embedding (NaN loss)
        args.seqlen = min(args.seqlen, cfg.n_positions)
    else:
        cfg = backpack_small()
    if args.pdrop is not None:
        cfg = cfg.replace(embd_pdrop=args.pdrop, resid_pdrop=args.pdrop,
                          attn_pdrop=args.pdrop)
    if args.attn_pdrop is not None:
        cfg = cfg.replace(attn_pdrop=args.attn_pdrop)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tx = train_lib.make_optimizer(params, warmup_steps=10, total_steps=1000)
    opt_state = jax.jit(tx.init)(params)

    batch = {"input_ids": jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (args.batch, args.seqlen + 1)), jnp.int32)}
    rng = jax.random.PRNGKey(1)
    tokens_per_step = args.batch * args.seqlen
    # 6ND for the LM stack + the contextualization/content extras are inside
    # XLA's own count; use the analytic 6ND as the (conservative) MFU flop
    # count like the reference's speed monitor (callbacks/flop_count.py)
    flops_per_step = 6.0 * n_params * tokens_per_step

    results = {}
    for spec in args.variants.split(","):
        parts = spec.split(":")
        remat_s, unroll_s = parts[0], parts[1]
        # optional third field: 'einsum' = materialized-alpha path, 'fused' =
        # the Pallas fused-contextualization kernel. Since commit 941ce80 the
        # TRAINING default is einsum (measured r2: 67.8k vs 64.1k tok/s), so
        # 'fused' is the non-default side of the A/B now.
        fused_ctx = None
        if "einsum" in parts[2:]:
            fused_ctx = False
        elif "fused" in parts[2:]:
            fused_ctx = True
        remat = {"none": False, "full": True}.get(remat_s, remat_s)
        unroll = int(unroll_s)
        print(f"== variant remat={remat_s} unroll={unroll} "
              f"fused_ctx={'default' if fused_ctx is None else fused_ctx}",
              flush=True)
        state = train_lib.TrainState(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
            jnp.zeros((), jnp.int32))
        fn = build_step(cfg, tx, remat, unroll, args.steps,
                        fused_ctx=fused_ctx)
        xla_opts = os.environ.get("BACKPACKS_XLA_OPTS")
        if xla_opts:
            # A/B hook for XLA:TPU tuning knobs, e.g.
            #   BACKPACKS_XLA_OPTS='{"xla_tpu_scoped_vmem_limit_kib":"65536"}'
            fn = fn.lower(state, batch, rng).compile(
                compiler_options=json.loads(xla_opts))
        t0 = time.time()
        state, losses = fn(state, batch, rng)
        _ = np.asarray(losses)
        print(f"   compile+warm {time.time()-t0:.1f}s loss={losses[-1]:.4f}",
              flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, losses = fn(state, batch, rng)
            _ = np.asarray(losses)
            best = min(best, time.perf_counter() - t0)
        per_step = best / args.steps
        tps = tokens_per_step / per_step
        tflops = flops_per_step / per_step / 1e12
        results[spec] = {"ms_per_step": per_step * 1e3, "tokens_per_s": tps,
                         "tflops": tflops, "mfu": tflops * 1e12 / V5E_PEAK_BF16}
        print(f"   {per_step*1e3:.1f} ms/step  {tps:,.0f} tok/s  "
              f"{tflops:.1f} TFLOP/s  MFU {results[spec]['mfu']*100:.1f}%",
              flush=True)
        if args.json:
            # partial write per variant: a crash/OOM in a later variant must
            # not lose the measurements already taken
            with open(args.json, "w") as f:
                json.dump(results, f, indent=2)
        if args.profile == spec:
            jax.profiler.start_trace(args.trace_dir)
            state, losses = fn(state, batch, rng)
            _ = np.asarray(losses)
            jax.profiler.stop_trace()
            print(f"   trace -> {args.trace_dir}", flush=True)
            from backpacks_flash_attn_tpu.utils.benchmark import (
                print_trace_summary, summarize_trace)
            print_trace_summary(args.trace_dir, top=30, steps=args.steps)
            digest = summarize_trace(args.trace_dir, top=60, steps=args.steps)
            if digest is not None and args.json:
                prof_path = args.json.replace(".json", "_profile.json")
                with open(prof_path, "w") as f:
                    json.dump({"variant": spec, **digest}, f, indent=2)
                print(f"   digest -> {prof_path}", flush=True)

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
