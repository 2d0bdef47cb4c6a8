"""Per-op attribution of the decode step: int8 vs mixed-int4 vs the engine.

Two open gaps need attribution, not guesses:
  * mixed/int4 caches vs int8 end-to-end (first measurement was 4x slower
    from pallas-operand slice materialization; the stacked kernels remove
    that — this profiles what remains),
  * the serving engine's device step at 46.5% of the bare scan
    (engine_r5b.json) — staged cache? sampling machinery? counts scatter?

Profiles a 64-step window-256 scan segment per config through
utils/benchmark.summarize_trace (leaf per-op attribution, bytes/roofline),
writing <json>_<config>.json digests.

Run from /root/repo, NO PYTHONPATH:
    timeout 4800 python bench_decode_profile.py \
        [--json bench_results/decode_profile_r5.json]
"""

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz
from backpacks_flash_attn_tpu.utils import benchmark as bm

BATCH = 128
WINDOW = 256
STEPS = 64
PREFILL = 160           # decode runs 160..224 under the 256 window


def scan_loop(cfg, params, cache, token, n_steps, window):
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
        return token

    return jax.jit(run)


def profile_config(name, cfg, params, cache_kw, out_base):
    prompt = jnp.ones((BATCH, PREFILL), jnp.int32)
    cache = bp.init_backpack_cache(cfg, BATCH, 512, **cache_kw)
    logits, cache = jax.jit(
        lambda p, ids, c: bp.backpack_forward_with_cache(p, cfg, ids, c)
    )(params, prompt, cache)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    fn = scan_loop(cfg, params, cache, token, STEPS, WINDOW)
    _ = np.asarray(fn(params, cache, token))      # compile + warm
    trace_dir = f"/tmp/decode_trace_{name}"
    jax.profiler.start_trace(trace_dir)
    _ = np.asarray(fn(params, cache, token))
    jax.profiler.stop_trace()
    digest = bm.summarize_trace(trace_dir, top=40, steps=STEPS)
    out = {"config": name, "window": WINDOW, "batch": BATCH}
    if digest:
        out.update({k: digest[k] for k in
                    ("total_us", "by_category", "by_source") if k in digest})
        out["top_ops"] = digest.get("top_ops", [])[:25]
    path = f"{out_base}_{name}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(name, "total_us/step:", out.get("total_us"), "->", path,
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="bench_results/decode_profile_r5.json")
    ap.add_argument("--configs", default="int8,mixed,kv4,engine")
    a = ap.parse_args()
    base = a.json[:-5] if a.json.endswith(".json") else a.json

    cfg = backpack_small(vocab_size=50257)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params
    configs = a.configs.split(",")

    if "int8" in configs:
        profile_config("int8", cfg, qparams,
                       dict(dtype=jnp.int8), base)
    if "mixed" in configs:
        profile_config("mixed", cfg, qparams,
                       dict(dtype=jnp.int8, bits=4), base)
    if "kv4" in configs:
        profile_config("kv4", cfg, qparams,
                       dict(dtype=jnp.int8, bits=8, kv_bits=4), base)

    if "engine" in configs:
        # engine device step (staged cache + sampler) under the same window
        # (64 slots: the 128-slot engine + profiling overhead OOMs HBM)
        from backpacks_flash_attn_tpu.serving.engine import ServingEngine
        ESLOTS = 64
        eng = ServingEngine(qparams, cfg, max_slots=ESLOTS, max_seqlen=512,
                            cache_dtype=jnp.int8, eos_id=-1, spec_tokens=0)
        rng = np.random.default_rng(1)
        for _ in range(ESLOTS):
            eng.submit(rng.integers(0, cfg.vocab_size,
                                    PREFILL - 1).tolist(),
                       max_new_tokens=512)
        eng.step()
        assert eng.sched.num_active == ESLOTS
        fn = eng._step_fn(False, WINDOW)
        fixed = (jnp.asarray(eng.temps), jnp.asarray(eng.top_ps),
                 jnp.asarray(eng.top_ks),
                 jnp.asarray(eng.emitted < eng.min_tokens),
                 jnp.asarray(eng.freq_p), jnp.asarray(eng.pres_p),
                 jnp.asarray(eng.sense_weights))

        def body(params, carry, _):
            toks, cache, counts, key = carry
            key, sub = jax.random.split(key)
            t, tp, tk, ban, fp, pp, ws = fixed
            toks, cache, counts, _ = fn(params, toks, cache, t, tp, tk,
                                        ban, counts, fp, pp, sub, ws)
            return (toks, cache, counts, key), ()

        # stage cap is 64 and one engine step already staged a column:
        # stay under it (no mid-scan flush muddying the attribution)
        ESTEPS = min(STEPS, eng._stage_cap - 2)

        def run(params, toks, cache, counts):
            (toks, cache, counts, _), _ = jax.lax.scan(
                functools.partial(body, params),
                (toks, cache, counts, jax.random.PRNGKey(3)), None,
                length=ESTEPS)
            return toks

        jfn = jax.jit(run)
        args = (eng.params, eng.tokens, eng.cache, eng.token_counts)
        _ = np.asarray(jfn(*args))
        trace_dir = "/tmp/decode_trace_engine"
        jax.profiler.start_trace(trace_dir)
        _ = np.asarray(jfn(*args))
        jax.profiler.stop_trace()
        digest = bm.summarize_trace(trace_dir, top=40, steps=ESTEPS)
        out = {"config": "engine_staged_step", "window": WINDOW}
        if digest:
            out.update({k: digest[k] for k in
                        ("total_us", "by_category", "by_source")
                        if k in digest})
            out["top_ops"] = digest.get("top_ops", [])[:25]
        with open(f"{base}_engine.json", "w") as f:
            json.dump(out, f, indent=1)
        print("engine total_us/step:", out.get("total_us"), flush=True)


if __name__ == "__main__":
    main()
