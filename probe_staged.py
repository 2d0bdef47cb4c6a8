"""Hardware probe: STAGED kv4 decode (Pallas main + XLA stage) vs int8.

The design from NOTES' copy-semantics ladder: packed int4 GPT KV main
cache read-only within a scan segment (pass-through Pallas kernel, no
copies), appends in the int8 staging block, flush every C steps.
Backpack ctx/content stay int8 (staged). Run from /root/repo, NO
PYTHONPATH:  timeout 4800 python probe_staged.py
"""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.models import quantized as qz

BATCH, PROMPT, MAX_LEN, C = 128, 32, 512, 64
SEGMENTS = [(128 - PROMPT, 128), (128, 256), (128, 384), (96, 512)]

cfg = backpack_small(vocab_size=50257)
params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
qparams = qz.quantize_backpack_params(params, cfg, bits=8)
del params


def measure_staged():
    # prefill through the scalar unstaged kv4 cache, then graft into the
    # staged per-slot structure
    c0 = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=jnp.int8,
                                bits=8, kv_bits=4)
    prompt = jnp.ones((BATCH, PROMPT), jnp.int32)
    logits, c0 = jax.jit(lambda p, i, c: bp.backpack_forward_with_cache(
        p, cfg, i, c))(qparams, prompt, c0)
    token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    cs = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=jnp.int8,
                                bits=8, kv_bits=4, per_slot=True, stage=C)
    lens = jnp.full((BATCH,), PROMPT, jnp.int32)
    cs = cs._replace(
        gpt=cs.gpt._replace(k=c0.gpt.k, v=c0.gpt.v, k_scale=c0.gpt.k_scale,
                            v_scale=c0.gpt.v_scale, length=lens,
                            base_len=lens),
        ctx_k=c0.ctx_k, ctx_k_scale=c0.ctx_k_scale, content=c0.content,
        content_scale=c0.content_scale, length=lens)

    def make_seg(n_steps, window):
        def body(params, carry, _):
            token, cache = carry
            lg, cache = bp.backpack_forward_with_cache(params, cfg, token,
                                                       cache, window=window)
            return (lg[:, -1].argmax(-1).astype(jnp.int32)[:, None],
                    cache), ()

        def seg(params, token, cache):
            done = 0
            while done < n_steps:
                n = min(C - 1, n_steps - done)
                (token, cache), _ = jax.lax.scan(
                    functools.partial(body, params), (token, cache), None,
                    length=n)
                cache = bp.flush_cache(cache, window=window)
                done += n
            return token, cache

        return jax.jit(seg, donate_argnums=(2,))

    segs = [make_seg(n, w) for n, w in SEGMENTS]
    copy_cache = jax.jit(lambda c: jax.tree.map(jnp.copy, c))

    def run_all(cache, token):
        cache = copy_cache(cache)
        for f in segs:
            token, cache = f(qparams, token, cache)
        return token

    _ = np.asarray(run_all(cs, token))
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        _ = np.asarray(run_all(cs, token))
        best = min(best, time.time() - t0)
    steps = sum(n for n, _ in SEGMENTS)
    print(f"staged-kv4: {best/steps*1e3:.3f} ms/step "
          f"({BATCH*steps/best:.0f} tok/s)", flush=True)


measure_staged()
