import functools, json
import jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz
from backpacks_flash_attn_tpu.utils import benchmark as bm

BATCH, PROMPT, MAX_LEN, C = 128, 160, 512, 64
cfg = backpack_small(vocab_size=50257)
params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
qparams = qz.quantize_backpack_params(params, cfg, bits=8)
del params
c0 = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=jnp.int8, bits=8, kv_bits=4)
prompt = jnp.ones((BATCH, PROMPT), jnp.int32)
logits, c0 = jax.jit(lambda p, i, c: bp.backpack_forward_with_cache(p, cfg, i, c))(qparams, prompt, c0)
token = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
cs = bp.init_backpack_cache(cfg, BATCH, MAX_LEN, dtype=jnp.int8, bits=8, kv_bits=4, per_slot=True, stage=C)
lens = jnp.full((BATCH,), PROMPT, jnp.int32)
cs = cs._replace(
    gpt=cs.gpt._replace(k=c0.gpt.k, v=c0.gpt.v, k_scale=c0.gpt.k_scale,
                        v_scale=c0.gpt.v_scale, length=lens, base_len=lens),
    ctx_k=c0.ctx_k, ctx_k_scale=c0.ctx_k_scale, content=c0.content,
    content_scale=c0.content_scale, length=lens)
STEPS = 60
def body(params, carry, _):
    token, cache = carry
    lg, cache = bp.backpack_forward_with_cache(params, cfg, token, cache, window=256)
    return (lg[:, -1].argmax(-1).astype(jnp.int32)[:, None], cache), ()
def run(params, token, cache):
    (token, cache), _ = jax.lax.scan(functools.partial(body, params), (token, cache), None, length=STEPS)
    return token
f = jax.jit(run)
_ = np.asarray(f(qparams, token, cs))
jax.profiler.start_trace("/tmp/staged_trace")
_ = np.asarray(f(qparams, token, cs))
jax.profiler.stop_trace()
d = bm.summarize_trace("/tmp/staged_trace", top=25, steps=STEPS)
print("total_us/step:", round(d["total_us"], 1))
for op in d["top_ops"][:14]:
    print(f"   {op.get('us'):8.1f}us x{op.get('count'):4} {op.get('category','')[:12]:12} {op.get('name','')[:30]:30} {op.get('source','')[-44:]}")
