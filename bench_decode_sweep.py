"""Decode-throughput sweep on the real chip — ONE sequential run.

Explores the two levers NOTES.md leaves open after the 43.8k tok/s/chip
round-1 number (VERDICT.md next-round item 3): finer static-window
granularity (64 vs 128 steps) and batch beyond 128. Each configuration
decodes PROMPT..MAX_LEN with jitted lax.scan segments exactly like bench.py;
reports tokens/s/chip for the INT8 cache path.

Methodology per NOTES.md / memory: params as jit arguments, donated caches,
best-of reps, np.asarray fetches. Run from /root/repo with NO PYTHONPATH:

    timeout 10000 python bench_decode_sweep.py \
        [--configs 128:128,128:64,256:128,256:64] [--reps 3] [--json out.json]
"""

import argparse
import functools
import json
import os
import sys
import time

# Sentinel kill switch (see bench_train.py): skip cleanly instead of being
# killed mid-flight, which wedges the axon tunnel.
if os.path.exists("/tmp/SKIP_DECODE_BENCH"):
    print("SKIP_DECODE_BENCH sentinel present — skipping", file=sys.stderr)
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz

PROMPT = 32
MAX_LEN = 512     # backpack-test smoke uses 8/32 (see --model)


def segments(granularity: int):
    """(n_steps, window) pairs: positions PROMPT..MAX_LEN-1 decoded under the
    smallest granularity-multiple window covering them."""
    segs, pos = [], PROMPT
    while pos < MAX_LEN:
        win = min(-(-(pos + 1) // granularity) * granularity, MAX_LEN)
        n = min(win, MAX_LEN) - pos
        segs.append((n, win))
        pos += n
    assert sum(n for n, _ in segs) == MAX_LEN - PROMPT
    return segs


def make_loop(cfg, n_steps, window):
    def body(params, carry, _):
        token, cache = carry
        logits, cache = bp.backpack_forward_with_cache(params, cfg, token,
                                                       cache, window=window)
        nxt = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()

    def run(params, cache, token):
        (token, cache), _ = jax.lax.scan(functools.partial(body, params),
                                         (token, cache), None,
                                         length=n_steps)
        return token, cache

    return jax.jit(run, donate_argnums=(1,))


def measure(cfg, params, batch, granularity, reps, profile_dir=None):
    segs = segments(granularity)
    steps = sum(n for n, _ in segs)
    prompt = jnp.ones((batch, PROMPT), jnp.int32)
    cache = bp.init_backpack_cache(cfg, batch, MAX_LEN, dtype=jnp.int8)
    logits, cache = jax.jit(
        lambda p, ids, c: bp.backpack_forward_with_cache(p, cfg, ids, c)
    )(params, prompt, cache)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    loops = [make_loop(cfg, n, w) for n, w in segs]
    copy_cache = jax.jit(lambda c: jax.tree.map(jnp.copy, c))

    def run_all(cache, token):
        cache = copy_cache(cache)
        for f in loops:
            token, cache = f(params, cache, token)
        return token

    t0 = time.time()
    _ = np.asarray(run_all(cache, token))   # compile + warm
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(run_all(cache, token))
        best = min(best, time.time() - t0)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        _ = np.asarray(run_all(cache, token))
        jax.profiler.stop_trace()
        from backpacks_flash_attn_tpu.utils.benchmark import \
            print_trace_summary
        print_trace_summary(profile_dir, top=15, steps=steps)
    return batch * steps / best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="128:128,128:64,256:128,256:64",
                    help="comma list of batch:window_granularity")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default="")
    ap.add_argument("--model", default="backpack-small",
                    help="backpack-small, or backpack-test for a CPU smoke")
    ap.add_argument("--profile", default="",
                    help="config (e.g. 128:128) to trace + digest (per-fusion "
                         "GB/s vs the ~819 GB/s v5e spec)")
    ap.add_argument("--trace-dir", default="/tmp/decode_trace")
    args = ap.parse_args()

    global PROMPT, MAX_LEN
    if args.model == "backpack-test":
        from backpacks_flash_attn_tpu.config import backpack_test
        cfg = backpack_test()
        PROMPT, MAX_LEN = 8, 32
    else:
        cfg = backpack_small(vocab_size=50257)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params

    results = {}
    for spec in args.configs.split(","):
        batch_s, gran_s = spec.split(":")
        batch, gran = int(batch_s), int(gran_s)
        print(f"== batch={batch} granularity={gran} "
              f"({len(segments(gran))} segments)", flush=True)
        tps, compile_s = measure(
            cfg, qparams, batch, gran, args.reps,
            profile_dir=args.trace_dir if args.profile == spec else None)
        results[spec] = {"tokens_per_s": tps, "compile_s": compile_s}
        print(f"   {tps:,.0f} tok/s/chip  (compile+warm {compile_s:.0f}s)",
              flush=True)

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
