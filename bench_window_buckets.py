"""Engine-shaped window-bucket A/B (VERDICT r2 item 5).

The serving engine dispatches ONE jitted decode step per host-picked window
bucket (serving/engine.py:399) — there is no scan segmentation, so the r2
decode-sweep result (finer windows LOSE in the lax.scan harness because each
extra segment doubles the while-loop overhead) does not transfer. What the
engine actually pays per step at bucket w is the stationary per-step cost of
a window-w decode; the bucket POLICY then decides which w each slot uses as
a function of its length.

So: measure t(w) for w in the candidate bucket ladders via long stationary
scans (tunnel methodology: >=448-step scans, best-of reps, np.asarray fetch
— NOTES.md), then compute the expected per-step cost of each ladder under a
slot-length distribution (uniform over decode positions 1..max_len: every
position of every sequence contributes one decode step, so steady-state
continuous-batching traffic IS length-uniform for a fixed completion length).

Run from /root/repo with NO PYTHONPATH:
    timeout 6000 python bench_window_buckets.py [--batch 128] [--steps 448] \
        [--json bench_results/window_buckets_r3.json]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz

LADDERS = {
    "64-granular": tuple(range(64, 513, 64)),
    "128-granular": (128, 256, 384, 512),
    "engine-default": (64, 128, 192, 256, 384, 512),
    "256-granular": (256, 512),
}


def make_loop(cfg, n_steps, window):
    def body(params, carry, _):
        token, cache = carry
        old_len = cache.length
        logits, cache = bp.backpack_forward_with_cache(params, cfg, token,
                                                       cache, window=window)
        cache = cache._replace(length=old_len,
                               gpt=cache.gpt._replace(length=old_len))
        nxt = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()

    def run(params, cache, token):
        (token, cache), _ = jax.lax.scan(functools.partial(body, params),
                                         (token, cache), None, length=n_steps)
        return token, cache

    return jax.jit(run, donate_argnums=(1,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=448)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--model", default="backpack-small")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    if args.model == "backpack-test":
        from backpacks_flash_attn_tpu.config import backpack_test
        cfg = backpack_test()
        args.max_len, args.steps = 32, 4
        windows = (16, 32)
        ladders = {"16-granular": (16, 32), "32-granular": (32,)}
    else:
        from backpacks_flash_attn_tpu.config import backpack_small
        cfg = backpack_small()
        windows = tuple(sorted({w for lad in LADDERS.values() for w in lad}))
        ladders = LADDERS
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params
    b = args.batch

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (b, 8)), jnp.int32)
    cache0 = bp.init_backpack_cache(cfg, b, args.max_len, dtype=jnp.int8,
                                    per_slot=True)
    _, cache0 = bp.backpack_forward_with_cache(qparams, cfg, ids, cache0)
    token = jnp.ones((b, 1), jnp.int32)

    t_of = {}
    for w in windows:
        loop = make_loop(cfg, args.steps, w)
        cache = jax.tree.map(jnp.copy, cache0)
        tok, cache = loop(qparams, cache, token)       # compile + warm
        _ = np.asarray(tok)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            tok, cache = loop(qparams, cache, token)
            _ = np.asarray(tok)
            best = min(best, time.perf_counter() - t0)
        t_of[w] = best / args.steps * 1e3
        print(f"window {w:>4}: {t_of[w]:.3f} ms/step "
              f"({b / t_of[w] * 1e3:,.0f} tok/s)", flush=True)

    # expected per-step cost per ladder, length-uniform steady state
    lengths = np.arange(1, args.max_len + 1)
    results = {"per_window_ms": {str(w): t_of[w] for w in windows},
               "batch": b, "steps": args.steps}
    for name, lad in ladders.items():
        lad = sorted(lad)
        buckets = [min(w for w in lad if w >= ln) for ln in lengths]
        exp_ms = float(np.mean([t_of[w] for w in buckets]))
        results[name] = {"expected_ms_per_step": exp_ms,
                         "expected_tok_per_s": b / exp_ms * 1e3,
                         "buckets": lad}
        print(f"{name:>16}: E[ms/step] {exp_ms:.3f} "
              f"({b / exp_ms * 1e3:,.0f} tok/s) buckets={lad}", flush=True)

    print(json.dumps({k: v for k, v in results.items()
                      if k != "per_window_ms"}, default=str))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
