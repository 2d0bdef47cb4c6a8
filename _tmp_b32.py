import time, jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.config import backpack_small
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.training import train as tl
cfg = backpack_small(vocab_size=50257)
params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
tx = tl.make_optimizer(params, warmup_steps=10, total_steps=1000)
B, S, N = 32, 512, 10
step = tl.make_train_step(cfg, tx, use_flash=True, remat=True)
state = tl.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(1), (B, S + 1), 0, 50257)}
rng = jax.random.PRNGKey(2)
def run(state, batch, rng):
    def body(c, _):
        s, _ = step(c, batch, rng)
        return s, ()
    state, _ = jax.lax.scan(body, state, None, length=N)
    return state.step * 1.0 + sum(x.astype(jnp.float32).sum() * 1e-20 for x in jax.tree.leaves(state.params))
f = jax.jit(run)
t0 = time.time()
_ = np.asarray(f(state, batch, rng))
print(f"compile+first run: {time.time()-t0:.0f}s")
best = 1e9
for _ in range(3):
    t0 = time.time(); _ = np.asarray(f(state, batch, rng)); best = min(best, time.time()-t0)
print(f"B=32 remat train: {B*S*N/best/1e3:.0f}k tokens/s (~{6*170e6*B*S*N/best/1e12:.0f} TFLOP/s)")
