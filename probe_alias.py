"""Isolate the stacked-kernel copy: bare call vs scan-carried cache."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from backpacks_flash_attn_tpu.ops import decode_attention as da
from backpacks_flash_attn_tpu.ops import quant

L, e, dk, dv, S2 = 12, 1536, 64, 64, 256
rng = np.random.default_rng(0)
kt4 = jnp.asarray(rng.integers(-128, 128, (L, e, dk, S2)), jnp.int8)
v4 = jnp.asarray(rng.integers(-128, 128, (L, e, S2, dv)), jnp.int8)
ks2 = jnp.ones((L, e, 2, S2), jnp.float32) * 0.01
vs2 = jnp.ones((L, e, 2, S2), jnp.float32) * 0.01
q = jnp.asarray(rng.normal(size=(e, dk)), jnp.bfloat16) * 0.3
lens = jnp.full((e,), 256, jnp.int32)

# 1) bare repeated call, layer traced, no carry writes
def bare(q, kt4, ks2, v4, vs2):
    def body(carry, li):
        q = carry
        out, kt4_, ks2_, v4_, vs2_ = da.decode_attention_int4_stacked(
            li % L, q, kt4, ks2, v4, vs2, lens, window_cols=128)
        return q + (out[:, :dk] * 1e-9).astype(q.dtype), ()
    q, _ = jax.lax.scan(body, q, jnp.arange(48, dtype=jnp.int32))
    return q
f1 = jax.jit(bare)
_ = np.asarray(f1(q, kt4, ks2, v4, vs2))
best = 1e9
for _ in range(3):
    t0 = time.time(); _ = np.asarray(f1(q, kt4, ks2, v4, vs2)); best = min(best, time.time() - t0)
print(f"bare (cache NOT in carry, returns dropped): {best/48*1e3:.3f} ms/call", flush=True)

# 2) cache in carry, alias threaded, NO dus writes
def carry_thread(q, kt4, ks2, v4, vs2):
    def body(carry, li):
        q, kt4, ks2, v4, vs2 = carry
        out, kt4, ks2, v4, vs2 = da.decode_attention_int4_stacked(
            li % L, q, kt4, ks2, v4, vs2, lens, window_cols=128)
        return (q + (out[:, :dk] * 1e-9).astype(q.dtype), kt4, ks2, v4, vs2), ()
    (q, *_), _ = jax.lax.scan(body, (q, kt4, ks2, v4, vs2),
                              jnp.arange(48, dtype=jnp.int32))
    return q
f2 = jax.jit(carry_thread, donate_argnums=(1, 2, 3, 4))
_ = np.asarray(f2(q, jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)))
k2, s2, vv2, ss2 = jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)
best = 1e9
for _ in range(3):
    k2, s2, vv2, ss2 = jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)
    t0 = time.time(); _ = np.asarray(f2(q, k2, s2, vv2, ss2)); best = min(best, time.time() - t0)
print(f"carry+alias threaded (no writes): {best/48*1e3:.3f} ms/call", flush=True)

# 3) carry + dus write + alias threaded (the model pattern)
def carry_write(q, kt4, ks2, v4, vs2):
    def body(carry, li):
        q, kt4, ks2, v4, vs2 = carry
        col = jnp.int32(100)
        patch = jnp.zeros((1, e, dk, 1), jnp.int8)
        kt4 = jax.lax.dynamic_update_slice(kt4, patch, (li % L, 0, 0, col))
        out, kt4, ks2, v4, vs2 = da.decode_attention_int4_stacked(
            li % L, q, kt4, ks2, v4, vs2, lens, window_cols=128)
        return (q + (out[:, :dk] * 1e-9).astype(q.dtype), kt4, ks2, v4, vs2), ()
    (q, *_), _ = jax.lax.scan(body, (q, kt4, ks2, v4, vs2),
                              jnp.arange(48, dtype=jnp.int32))
    return q
f3 = jax.jit(carry_write, donate_argnums=(1, 2, 3, 4))
_ = np.asarray(f3(q, jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)))
best = 1e9
for _ in range(3):
    k2, s2, vv2, ss2 = jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)
    t0 = time.time(); _ = np.asarray(f3(q, k2, s2, vv2, ss2)); best = min(best, time.time() - t0)
print(f"carry+dus+alias threaded: {best/48*1e3:.3f} ms/call", flush=True)

# 4) carry + RMW write (ds -> modify -> dus, the model's nibble pattern)
def carry_rmw(q, kt4, ks2, v4, vs2):
    def body(carry, li):
        q, kt4, ks2, v4, vs2 = carry
        col = jnp.int32(100)
        old = jax.lax.dynamic_slice(kt4, (li % L, 0, 0, col), (1, e, dk, 1))
        new = (old.astype(jnp.int32) & 0xF0).astype(jnp.int8)
        kt4 = jax.lax.dynamic_update_slice(kt4, new, (li % L, 0, 0, col))
        out, kt4, ks2, v4, vs2 = da.decode_attention_int4_stacked(
            li % L, q, kt4, ks2, v4, vs2, lens, window_cols=128)
        return (q + (out[:, :dk] * 1e-9).astype(q.dtype), kt4, ks2, v4, vs2), ()
    (q, *_), _ = jax.lax.scan(body, (q, kt4, ks2, v4, vs2),
                              jnp.arange(48, dtype=jnp.int32))
    return q
f4 = jax.jit(carry_rmw, donate_argnums=(1, 2, 3, 4))
_ = np.asarray(f4(q, jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)))
best = 1e9
for _ in range(3):
    k2, s2, vv2, ss2 = jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)
    t0 = time.time(); _ = np.asarray(f4(q, k2, s2, vv2, ss2)); best = min(best, time.time() - t0)
print(f"carry+RMW+alias threaded: {best/48*1e3:.3f} ms/call", flush=True)

# 5) like 4 but TWO buffers RMW'd + kernel (k and v) — the model writes both
def carry_rmw2(q, kt4, ks2, v4, vs2):
    def body(carry, li):
        q, kt4, ks2, v4, vs2 = carry
        col = jnp.int32(100)
        for buf_name in ("k", "v"):
            pass
        oldk = jax.lax.dynamic_slice(kt4, (li % L, 0, 0, col), (1, e, dk, 1))
        kt4 = jax.lax.dynamic_update_slice(
            kt4, (oldk.astype(jnp.int32) & 0xF0).astype(jnp.int8),
            (li % L, 0, 0, col))
        oldv = jax.lax.dynamic_slice(v4, (li % L, 0, col, 0), (1, e, 1, dv))
        v4 = jax.lax.dynamic_update_slice(
            v4, (oldv.astype(jnp.int32) & 0xF0).astype(jnp.int8),
            (li % L, 0, col, 0))
        ks2 = jax.lax.dynamic_update_slice(
            ks2, jnp.ones((1, e, 1, 1), jnp.float32), (li % L, 0, 0, col))
        vs2 = jax.lax.dynamic_update_slice(
            vs2, jnp.ones((1, e, 1, 1), jnp.float32), (li % L, 0, 1, col))
        out, kt4, ks2, v4, vs2 = da.decode_attention_int4_stacked(
            li % L, q, kt4, ks2, v4, vs2, lens, window_cols=128)
        return (q + (out[:, :dk] * 1e-9).astype(q.dtype), kt4, ks2, v4, vs2), ()
    (q, *_), _ = jax.lax.scan(body, (q, kt4, ks2, v4, vs2),
                              jnp.arange(48, dtype=jnp.int32))
    return q
f5 = jax.jit(carry_rmw2, donate_argnums=(1, 2, 3, 4))
_ = np.asarray(f5(q, jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)))
best = 1e9
for _ in range(3):
    k2, s2, vv2, ss2 = jnp.copy(kt4), jnp.copy(ks2), jnp.copy(v4), jnp.copy(vs2)
    t0 = time.time(); _ = np.asarray(f5(q, k2, s2, vv2, ss2)); best = min(best, time.time() - t0)
print(f"carry+RMW(k,v,scales)+alias: {best/48*1e3:.3f} ms/call", flush=True)
