"""Quick ms/step probe: int8 vs kv4 vs mixed decode at window 256."""
import functools, time, sys
import jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz

BATCH, WINDOW, STEPS, PREFILL = 128, 256, 64, 160
import os
WINDOW = int(os.environ.get("PROBE_WINDOW", WINDOW))
PREFILL = min(WINDOW - STEPS - 2, 160) if WINDOW - STEPS - 2 > 0 else 32
cfg = backpack_small(vocab_size=50257)
params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
qparams = qz.quantize_backpack_params(params, cfg, bits=8)
del params

def measure(name, cache_kw):
    prompt = jnp.ones((BATCH, PREFILL), jnp.int32)
    cache = bp.init_backpack_cache(cfg, BATCH, 512, **cache_kw)
    logits, cache = jax.jit(lambda p, ids, c: bp.backpack_forward_with_cache(p, cfg, ids, c))(qparams, prompt, cache)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    def body(params, carry, _):
        token, cache = carry
        lg, cache = bp.backpack_forward_with_cache(params, cfg, token, cache, window=WINDOW)
        return (lg[:, -1].argmax(-1).astype(jnp.int32)[:, None], cache), ()
    def run(params, cache, token):
        (token, cache), _ = jax.lax.scan(functools.partial(body, params), (token, cache), None, length=STEPS)
        return token
    f = jax.jit(run, donate_argnums=(1,))
    cc = jax.jit(lambda c: jax.tree.map(jnp.copy, c))
    _ = np.asarray(f(qparams, cc(cache), token))
    best = float("inf")
    for _ in range(4):
        t0 = time.time(); _ = np.asarray(f(qparams, cc(cache), token)); best = min(best, time.time() - t0)
    ms = best / STEPS * 1e3
    print(f"{name}: {ms:.3f} ms/step  ({BATCH*STEPS/best:.0f} tok/s)", flush=True)

measure("int8 ", dict(dtype=jnp.int8))
measure("kv4  ", dict(dtype=jnp.int8, bits=8, kv_bits=4))
measure("mixed", dict(dtype=jnp.int8, bits=4))
