"""Speculative-verification step cost on the real chip — ONE sequential run.

The serving engine's host loop cannot be timed through the tunnel (30-60ms
RTT per dispatch), so this measures the two jitted primitives that set the
speculative-decoding speedup instead, each as a long lax.scan:

  * plain decode step        (s = 1     rows per slot)
  * verification step        (s = 1 + k rows per slot, chunked-prefill path
                              + accept logic + length rollback, exactly the
                              engine's _spec_step_fn body)

Speculation emits (1 + acc) tokens per verification, so

  throughput_spec / throughput_plain = (1 + E[acc]) * t_plain / t_verify

and the break-even mean acceptance is t_verify/t_plain - 1. On a
memory-bound decode the k extra query rows reuse the same cache read, so
t_verify/t_plain should sit well under 1 + k — report both and the implied
speedup at the acceptance the CPU tests measured on repetitive text (~0.9).

Methodology per NOTES.md / memory: params as jit arguments, donated caches,
best-of reps, np.asarray fetches. Run from /root/repo with NO PYTHONPATH:

    timeout 6000 python bench_spec_step.py [--batch 128] [--k 4] \
        [--window 256] [--steps 448] [--reps 3] [--json out.json]
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


def make_plain_loop(cfg, n_steps, window):
    def body(params, carry, _):
        token, cache = carry
        old_len = cache.length
        old_g = cache.gpt
        logits, cache = bp.backpack_forward_with_cache(params, cfg, token,
                                                       cache, window=window)
        # pin the offset: stationary shapes/offsets across the scan and
        # across donated reps (token keeps the data dependency alive).
        # Staged caches also pin the stage pointer/positions — the write
        # cost is pointer-independent and an unpinned pointer would run
        # off the end of the C-column block after C scan steps.
        gkw = dict(length=old_len)
        if cache.gpt.staged:
            gkw.update(stage_ptr=old_g.stage_ptr, stage_pos=old_g.stage_pos,
                       base_len=old_g.base_len)
        cache = cache._replace(length=old_len,
                               gpt=cache.gpt._replace(**gkw))
        nxt = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()

    def run(params, cache, token):
        (token, cache), _ = jax.lax.scan(functools.partial(body, params),
                                         (token, cache), None,
                                         length=n_steps)
        return token, cache

    return jax.jit(run, donate_argnums=(1,))


def make_verify_loop(cfg, n_steps, window, k):
    """The engine's speculative step body, cache length pinned (rollback to
    the starting offset each iteration so the scan is shape- and
    window-stationary — latency is what's measured, not token content)."""

    def body(params, carry, _):
        token, drafts, cache = carry
        old_len = cache.length
        inp = jnp.concatenate([token, drafts], axis=1)          # (b, 1+k)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, inp, cache, window=window)
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        match = (preds[:, :-1] == drafts).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1).sum(axis=1)
        bonus = jnp.take_along_axis(preds, acc[:, None], axis=1)
        # pin the offset (stationary shapes); keep data deps on acc/bonus
        cache = cache._replace(length=old_len,
                               gpt=cache.gpt._replace(length=old_len))
        nxt = bonus
        drafts = jnp.roll(preds[:, 1:], 1, axis=1)
        return (nxt, drafts, cache), ()

    def run(params, cache, token, drafts):
        (token, drafts, cache), _ = jax.lax.scan(
            functools.partial(body, params), (token, drafts, cache), None,
            length=n_steps)
        return token, cache

    return jax.jit(run, donate_argnums=(1,))


def time_best(fn, reps, params, cache, *rest):
    """fn(params, cache, *rest) -> (token, cache); the cache is DONATED, so
    each rep feeds the previous rep's returned cache back in."""
    token, cache = fn(params, cache, *rest)
    _ = np.asarray(token)                              # warm + fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        token, cache = fn(params, cache, *rest)
        _ = np.asarray(token)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    # 128 OOMed on the 2026-08-19 v5e run (bf16+int8 param copies + cache
    # copies + the generic prefill branch's bf16 cache relayout stack up);
    # 64 is enough for the rel_cost ratio, which is what the spec_tokens
    # default is derived from.
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--steps", type=int, default=448)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--stage", type=int, default=64,
                    help="staging-block columns to A/B (0 disables)")
    ap.add_argument("--model", default="backpack-small",
                    help="backpack-small, or backpack-test for a CPU smoke")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    if args.model == "backpack-test":
        from backpacks_flash_attn_tpu.config import backpack_test
        cfg = backpack_test()
        max_len, prompt, window = 32, 8, 16
        steps = min(args.steps, 8)
    else:
        from backpacks_flash_attn_tpu.config import backpack_small
        cfg = backpack_small()
        max_len, prompt, window = 512, args.prompt, args.window
        steps = args.steps
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params                      # free the bf16 copy (HBM headroom)
    b, k = args.batch, args.k

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (b, prompt)), jnp.int32)
    cache0 = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.int8,
                                    per_slot=True)
    _, cache0 = bp.backpack_forward_with_cache(qparams, cfg, ids, cache0)
    token = jnp.ones((b, 1), jnp.int32)
    drafts = jnp.ones((b, k), jnp.int32)

    results = {}
    # scalar-length control: bench.py's headline config measures ~2.9ms/step
    # at batch 128 with a SCALAR length counter, while the r3 spec runs saw
    # ~138ms/step with the per-slot cache — this baseline separates
    # "per-slot decode lowers badly on TPU" from "this bench is broken"
    cs = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.int8)
    _, cs = bp.backpack_forward_with_cache(qparams, cfg, ids, cs)
    t_scalar = time_best(make_plain_loop(cfg, steps, window), args.reps,
                         qparams, jax.tree.map(jnp.copy, cs), token)
    results["plain_scalar_ms"] = t_scalar / steps * 1e3
    print(f"scalar-length plain: {results['plain_scalar_ms']:.3f} ms/step",
          flush=True)

    plain = make_plain_loop(cfg, steps, window)
    t_plain = time_best(plain, args.reps,
                        qparams, jax.tree.map(jnp.copy, cache0), token)
    per_plain = t_plain / steps
    results["plain_ms"] = per_plain * 1e3
    print(f"per-slot plain: {results['plain_ms']:.3f} ms/step", flush=True)

    if args.stage > 0:
        # staged per-slot decode (models/gpt.py staging block): scalar-
        # pointer appends + two-segment reads; the flush is measured
        # separately and amortized over the block size
        cs2 = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.int8,
                                     per_slot=True, stage=args.stage)
        _, cs2 = bp.backpack_forward_with_cache(qparams, cfg, ids, cs2)
        t_staged = time_best(make_plain_loop(cfg, steps, window), args.reps,
                             qparams, jax.tree.map(jnp.copy, cs2), token)
        results["staged_plain_ms"] = t_staged / steps * 1e3

        def flush_loop(params, cache, token):
            def body(c, _):
                c = bp.flush_cache(c)
                # keep a data dependency on the token so nothing is DCE'd
                return c, ()
            cache, _ = jax.lax.scan(body, cache, None, length=32)
            return token, cache

        cs3 = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.int8,
                                     per_slot=True, stage=args.stage)
        _, cs3 = bp.backpack_forward_with_cache(qparams, cfg, ids, cs3)
        t_flush = time_best(jax.jit(flush_loop, donate_argnums=(1,)),
                            args.reps, qparams,
                            jax.tree.map(jnp.copy, cs3), token)
        results["flush_ms"] = t_flush / 32 * 1e3
        results["staged_amortized_ms"] = (results["staged_plain_ms"]
                                          + results["flush_ms"] / args.stage)
        print(f"staged plain: {results['staged_plain_ms']:.3f} ms/step + "
              f"flush {results['flush_ms']:.3f}/{args.stage} -> "
              f"{results['staged_amortized_ms']:.3f} ms/step amortized",
              flush=True)

    verify = make_verify_loop(cfg, steps, window, k)
    t_ver = time_best(verify, args.reps,
                      qparams, jax.tree.map(jnp.copy, cache0), token,
                      drafts)
    per_ver = t_ver / steps
    results["verify_ms"] = per_ver * 1e3
    rel = per_ver / per_plain
    results["rel_cost"] = rel
    results["break_even_acceptance"] = max(rel - 1.0, 0.0) / k
    for acc in (0.25, 0.5, 0.75, 0.9):
        results[f"speedup_at_acc_{acc}"] = (1 + acc * k) / rel
    results.update(batch=b, k=k, window=window, steps=steps)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
