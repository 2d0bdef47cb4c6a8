"""Headline benchmark: backpack-small (170M) decode tokens/sec/chip, INT8 vs bf16.

Prints ONE JSON line:
  {"metric": "backpack-small int8 decode", "value": <tokens/s/chip>,
   "unit": "tokens/s/chip", "vs_baseline": <int8 tps / bf16 tps>}

The baseline is this framework's own bf16 decode on the same chip — the
BASELINE.md target is >= 2x bf16 tokens/s/chip at INT8. The decode loop is
jitted lax.scan segments (dispatch overhead excluded, like serving) with
static `window` length buckets that grow with the sequence position — decode
reads only the valid cache prefix (the serving engine drives the same knob
host-side per step batch).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz

BATCH = 128
PROMPT = 32
STEPS = 448
MAX_LEN = 512
# (n_steps, window) segments: positions 32..480 decoded under the smallest
# 128-multiple window that covers them
SEGMENTS = [(128 - PROMPT, 128), (128, 256), (128, 384), (96, 512)]
assert sum(n for n, _ in SEGMENTS) == STEPS


def make_loop(cfg, n_steps, window):
    # params ride as jit ARGUMENTS: closure-captured params inline ~170MB of
    # constants into the HLO and wedge the remote compiler.
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

    # donate the incoming cache: segment boundaries would otherwise hold
    # two live 4.3GB bf16 cache copies per hop (OOM at batch 128 bf16)
    return jax.jit(run, donate_argnums=(1,))


def measure(cfg, params, cache_dtype, cache_bits: int = 8,
            kv_bits=None) -> float:
    prompt = jnp.ones((BATCH, PROMPT), jnp.int32)
    cache = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=cache_dtype,
                                   bits=cache_bits, kv_bits=kv_bits)
    logits, cache = jax.jit(
        lambda p, ids, c: bp.backpack_forward_with_cache(p, cfg, ids, c)
    )(params, prompt, cache)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]

    import numpy as np

    loops = [make_loop(cfg, n, w) for n, w in SEGMENTS]
    copy_cache = jax.jit(lambda c: jax.tree.map(jnp.copy, c))

    def run_all(cache, token):
        cache = copy_cache(cache)   # reps restart from the prefilled cache
        for f in loops:
            token, cache = f(params, cache, token)
        return token

    # Force a device->host fetch each rep: block_until_ready through the
    # remote-TPU tunnel can ACK before execution completes. Take the BEST of
    # several reps — the tunnel adds 30-60ms RTT spikes that would otherwise
    # pollute the mean — and enough steps per rep to amortize the RTT.
    _ = np.asarray(run_all(cache, token))   # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(run_all(cache, token))
        best = min(best, time.time() - t0)
    return BATCH * STEPS / best


def main():
    import os

    cfg = backpack_small(vocab_size=50257)
    key = jax.random.PRNGKey(0)
    params = bp.init_backpack(cfg, key, dtype=jnp.bfloat16)

    bf16_tps = measure(cfg, params, jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params
    int8_tps = measure(cfg, qparams, jnp.int8)
    # INT4 pair-packed caches (same int8 weights). Quality gates on the
    # trained mini (bench_results/gates_mini_r5*.json): full int4 caches
    # FAIL the 0.5-ppl gate (+1.45 — the senses are the bottleneck), so the
    # candidate config is the KV-only hybrid (int8 senses + int4 GPT KV,
    # ~29% of the stream) and the full-int4 number is recorded for the
    # roofline story only.
    int4_tps = kv4_tps = None
    if os.environ.get("BACKPACKS_BENCH_SKIP_INT4", "0") != "1":
        kv4_tps = measure(cfg, qparams, jnp.int8, cache_bits=8, kv_bits=4)
        int4_tps = measure(cfg, qparams, jnp.int8, cache_bits=4)

    best_tps, label = int8_tps, "int8"
    if kv4_tps is not None and kv4_tps > int8_tps:
        best_tps, label = kv4_tps, "int8 + int4-KV-cache"
    print(json.dumps({
        "metric": f"backpack-small (170M) {label} decode throughput",
        "value": round(best_tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(best_tps / bf16_tps, 3),
        "detail": {"bf16_tokens_per_s": round(bf16_tps, 1),
                   "int8_tokens_per_s": round(int8_tps, 1),
                   "int4_kv_hybrid_tokens_per_s":
                       round(kv4_tps, 1) if kv4_tps else None,
                   "int4_cache_tokens_per_s":
                       round(int4_tps, 1) if int4_tps else None,
                   "batch": BATCH, "steps": STEPS, "max_len": MAX_LEN,
                   "windows": [w for _, w in SEGMENTS]},
    }))


if __name__ == "__main__":
    main()
