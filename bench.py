"""Headline benchmark: backpack-small (170M) decode tokens/sec/chip, INT8 vs bf16.

Prints ONE JSON line:
  {"metric": "backpack-small int8 decode", "value": <tokens/s/chip>,
   "unit": "tokens/s/chip", "vs_baseline": <int8 tps / bf16 tps>}

The baseline is this framework's own bf16 decode on the same chip — the
BASELINE.md target is >= 2x bf16 tokens/s/chip at INT8. The decode loop is a
single jitted lax.scan so dispatch overhead is excluded (like serving).
"""

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


def decode_loop(cfg, params, cache, token, n_steps):
    def body(carry, _):
        token, cache = carry
        logits, cache = bp.backpack_forward_with_cache(params, cfg, token, cache)
        nxt = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
        return (nxt, cache), ()

    (token, cache), _ = jax.lax.scan(body, (token, cache), None, length=n_steps)
    return token, cache


def measure(cfg, params, cache_dtype) -> float:
    prompt = jnp.ones((BATCH, PROMPT), jnp.int32)
    cache = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=cache_dtype)
    logits, cache = jax.jit(
        lambda p, ids, c: bp.backpack_forward_with_cache(p, cfg, ids, c)
    )(params, prompt, cache)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]

    import numpy as np

    run = jax.jit(lambda p, c, t: decode_loop(cfg, p, c, t, STEPS)[0])
    # Force a device->host fetch each rep: block_until_ready through the
    # remote-TPU tunnel can ACK before execution completes. Take the BEST of
    # several reps — the tunnel adds 30-60ms RTT spikes that would otherwise
    # pollute the mean — and enough steps per rep to amortize the RTT.
    _ = np.asarray(run(params, cache, token))   # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(run(params, cache, token))
        best = min(best, time.time() - t0)
    return BATCH * STEPS / best


def main():
    cfg = backpack_small(vocab_size=50257)
    key = jax.random.PRNGKey(0)
    params = bp.init_backpack(cfg, key, dtype=jnp.bfloat16)

    bf16_tps = measure(cfg, params, jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params
    int8_tps = measure(cfg, qparams, jnp.int8)

    print(json.dumps({
        "metric": "backpack-small (170M) int8 decode throughput",
        "value": round(int8_tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(int8_tps / bf16_tps, 3),
        "detail": {"bf16_tokens_per_s": round(bf16_tps, 1),
                   "batch": BATCH, "steps": STEPS, "max_len": MAX_LEN},
    }))


if __name__ == "__main__":
    main()
