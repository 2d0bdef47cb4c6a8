"""Hardware lowering + numerics smoke for the round-2 Pallas kernels.

Interpret mode (the CPU test suite) skips Mosaic's block-mapping and op
checks — the fused contextualization kernel passed 10 CPU tests while
failing to lower on the chip. This script compiles AND numerically checks
every round-2 kernel entry point on the real TPU at small shapes, so a
lowering regression costs ~1 min to detect instead of a failed train
matrix. Run from /root/repo, NO PYTHONPATH.
"""

import numpy as np
import jax
import jax.numpy as jnp

from backpacks_flash_attn_tpu.ops.backpack_kernels import (
    contextualization_reference, fused_contextualization)
from backpacks_flash_attn_tpu.ops import flash_attention as fa
from backpacks_flash_attn_tpu.ops.attention import mha_reference

ok = True

# f32 inputs: interpret mode computes true f32, but on the chip both the
# Pallas kernels and the XLA references run their dots through the bf16
# MXU (one ulp = 2^-8 ~= 3.9e-3), so hardware parity is precision-class,
# not f32-class. 2026-08-19 run: all kernels land at 0.7-4.1e-3.
TOL = 2e-5 if jax.default_backend() != "tpu" else 6e-3


def check(name, got, want, tol=None):
    tol = TOL if tol is None else max(tol, TOL)
    global ok
    rel = float(np.max(np.abs(np.asarray(got, np.float32)
                              - np.asarray(want, np.float32)))
                / (np.max(np.abs(np.asarray(want, np.float32))) + 1e-9))
    status = "OK" if rel < tol else "FAIL"
    ok &= rel < tol
    print(f"  {name:40s} rel={rel:.2e}  {status}")


# --- fused contextualization fwd + bwd (train-step shape, small) ----------
b, s, nv, dnv, d = 2, 256, 4, 64, 128
kq, kk, kc = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (b, s, nv, dnv), jnp.float32)
k = jax.random.normal(kk, (b, s, nv, dnv), jnp.float32)
c = jax.random.normal(kc, (b, s, nv, d), jnp.float32)
scale = dnv ** -0.5

print("fused_contextualization:")
f = jax.jit(lambda q, k, c: fused_contextualization(q, k, c, scale, 128, 128))
check("infer fwd", f(q, k, c), contextualization_reference(q, k, c, scale))

gf = jax.jit(jax.grad(
    lambda q, k, c: jnp.sum(jnp.sin(
        fused_contextualization(q, k, c, scale, 128, 128))), (0, 1, 2)))
gr = jax.grad(lambda q, k, c: jnp.sum(jnp.sin(
    contextualization_reference(q, k, c, scale))), (0, 1, 2))
for name, a, bb in zip(("dq", "dk", "dcontent"), gf(q, k, c), gr(q, k, c)):
    check(name, a, bb)

# --- tiled flash bwd (round-2 kernel; round-1 hardware only ran the fwd) --
print("flash attention fwd+bwd (split kernels):")
h, dh = 4, 64
qa = jax.random.normal(kq, (b, s, h, dh), jnp.float32)
ka = jax.random.normal(kk, (b, s, h, dh), jnp.float32)
va = jax.random.normal(kc, (b, s, h, dh), jnp.float32)


def loss_flash(q, k, v):
    return jnp.sum(jnp.sin(fa.flash_attention(q, k, v, causal=True)))


def loss_ref(q, k, v):
    return jnp.sum(jnp.sin(mha_reference(q, k, v, causal=True)))


_fused_default = fa._FUSED_BWD
fa._FUSED_BWD = False
try:
    gflash = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(qa, ka, va)
finally:
    fa._FUSED_BWD = _fused_default
gref = jax.grad(loss_ref, (0, 1, 2))(qa, ka, va)
for name, a, bb in zip(("dq", "dk", "dv"), gflash, gref):
    check(name, a, bb)

# --- fused single-pass flash bwd (round-3; FLASH_FUSED_BWD) ----------------
print("flash fused single-pass bwd:")
fa._FUSED_BWD = True
try:
    gfused = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(qa, ka, va)
    for name, a, bb in zip(("dq", "dk", "dv"), gfused, gref):
        check(name, a, bb)
finally:
    fa._FUSED_BWD = _fused_default

# --- scratch-accumulator fused bwd (round-4; FLASH_BWD_SCRATCH) ------------
print("flash scratch-accumulator fused bwd:")
_scratch_default = fa._BWD_SCRATCH
fa._FUSED_BWD = True
try:
    fa._BWD_SCRATCH = True
    gscr = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(qa, ka, va)
    for name, a, bb in zip(("dq", "dk", "dv"), gscr, gref):
        check(name, a, bb)
finally:
    fa._FUSED_BWD = _fused_default
    fa._BWD_SCRATCH = _scratch_default

# --- packed-qkv entry + head grouping (round-4 lowerings) ------------------
print("flash packed-qkv + head-group fwd+bwd:")
_group_default = fa._HEAD_GROUP
try:
    qkv_s = jnp.stack([qa, ka, va], axis=2)   # (b, s, 3, h, d)

    def loss_packed(qkv):
        out = fa.flash_attention_qkv_packed(qkv, causal=True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    fa._HEAD_GROUP = 1
    g1 = jax.jit(jax.grad(loss_packed))(qkv_s)
    fa._HEAD_GROUP = 2
    g2 = jax.jit(jax.grad(loss_packed))(qkv_s)
    check("dqkv(packed, g1 vs unpacked dq)", g1[:, :, 0],
          jax.grad(loss_flash, 0)(qa, ka, va))
    check("dqkv(group2 == group1)", g2, g1, tol=1e-6)
finally:
    fa._HEAD_GROUP = _group_default

# --- bf16 fwd+bwd at the training head_dim (d=64 full-dim blocks) ----------
print("flash bf16 fwd+bwd (d=64, no head padding):")
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (qa, ka, va))
gb16 = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(qb, kb, vb)
for name, a, bb in zip(("dq", "dk", "dv"), gb16, gref):
    check(name, a, bb, tol=5e-2)

# --- blocksparse bwd (round-2) --------------------------------------------
print("blocksparse fwd+bwd:")
layout = jnp.ones((s // 128, s // 128), bool)


def loss_bs(q, k, v):
    return jnp.sum(jnp.sin(fa.flash_blocksparse_attention(
        q, k, v, layout, causal=True, block_q=128, block_k=128)))


gbs = jax.jit(jax.grad(loss_bs, (0, 1, 2)))(qa, ka, va)
for name, a, bb in zip(("dq", "dk", "dv"), gbs, gref):
    check(name, a, bb)

# --- int4 / mixed decode-attention kernels (round-5) ----------------------
# Mosaic tiling rules (lane 128-mult, sublane 8-mult) don't apply in
# interpret mode; every round-5 lane/sublane violation was caught only on
# hardware. Compile + numerics at BOTH model shape classes (GPT KV dv=64,
# Backpack combine dv=768) and both window classes (S2=64 full-axis block,
# S2=256 blocked).
from backpacks_flash_attn_tpu.ops import quant
from backpacks_flash_attn_tpu.ops import decode_attention as da

rng5 = np.random.default_rng(5)
for dv in (64, 768):
    for s in (128, 512):
        e, dk = 64, 64
        q5 = jnp.asarray(rng5.normal(size=(e, dk)), jnp.bfloat16) * 0.3
        k5 = jnp.asarray(rng5.normal(size=(e, dk, s)), jnp.float32)
        v5 = jnp.asarray(rng5.normal(size=(e, s, dv)), jnp.float32)
        ln = jnp.asarray(rng5.integers(1, s + 1, (e,)), jnp.int32)
        k4q, ks4 = quant.quantize_activations_int4(k5, axis=1)
        v4q, vs4 = quant.quantize_activations_int4(v5, axis=2)
        kt4 = quant.pack_int4_pairs(k4q, axis=2)
        v4p = quant.pack_int4_pairs(v4q, axis=1)
        ks2 = ks4[:, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
        vs2 = vs4[:, :, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
        want = da.decode_attention_flat_int4(q5, kt4, ks2, v4p, vs2, ln)
        got = da.decode_attention_int4_blockdiag(q5, kt4, ks2, v4p, vs2, ln)
        check(f"int4_blockdiag dv={dv} s={s}", got, want, tol=1.5e-2)

        k8q, ks8 = quant.quantize_activations_int8(k5, axis=1)
        k8s = jnp.stack([k8q[:, :, 0::2], k8q[:, :, 1::2]], axis=2)
        ks2b = ks8[:, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
        want_m = da.decode_attention_flat_mixed(q5, k8s, ks2b, v4p, vs2, ln)
        got_m = da.decode_attention_mixed_blockdiag(q5, k8s, ks2b, v4p,
                                                    vs2, ln)
        check(f"mixed_blockdiag dv={dv} s={s}", got_m, want_m, tol=1.5e-2)

# stacked entry points (full buffers + scalar-prefetch layer index + static
# window grid trim — the production decode path)
for dv in (64, 768):
    e, dk, s, L = 64, 64, 512, 2
    k5 = jnp.asarray(rng5.normal(size=(L, e, dk, s)), jnp.float32)
    v5 = jnp.asarray(rng5.normal(size=(L, e, s, dv)), jnp.float32)
    ln = jnp.asarray(rng5.integers(1, 257, (e,)), jnp.int32)
    q5 = jnp.asarray(rng5.normal(size=(e, dk)), jnp.bfloat16) * 0.3
    k4q, ks4 = quant.quantize_activations_int4(k5, axis=2)
    v4q, vs4 = quant.quantize_activations_int4(v5, axis=3)
    kt4 = quant.pack_int4_pairs(k4q, axis=3)
    v4p = quant.pack_int4_pairs(v4q, axis=2)
    ks2 = ks4[:, :, 0].reshape(L, e, s // 2, 2).swapaxes(2, 3)
    vs2 = vs4[..., 0].reshape(L, e, s // 2, 2).swapaxes(2, 3)
    for li in (0, 1):
        want = da.decode_attention_flat_int4(
            q5, kt4[li][:, :, :128], ks2[li][:, :, :128],
            v4p[li][:, :128], vs2[li][:, :, :128], ln)
        got = da.decode_attention_int4_stacked(
            jnp.int32(li), q5, kt4, ks2, v4p, vs2, ln, window_cols=128)[0]
        check(f"int4_stacked dv={dv} li={li} w=256", got, want, tol=1.5e-2)
    k8q, ks8 = quant.quantize_activations_int8(k5, axis=2)
    k8s = jnp.stack([k8q[:, :, :, 0::2], k8q[:, :, :, 1::2]], axis=3)
    ks2b = ks8[:, :, 0].reshape(L, e, s // 2, 2).swapaxes(2, 3)
    want_m = da.decode_attention_flat_mixed(
        q5, k8s[0][:, :, :, :128], ks2b[0][:, :, :128],
        v4p[0][:, :128], vs2[0][:, :, :128], ln)
    got_m = da.decode_attention_mixed_stacked(
        jnp.int32(0), q5, k8s, ks2b, v4p, vs2, ln, window_cols=128)[0]
    check(f"mixed_stacked dv={dv} w=256", got_m, want_m, tol=1.5e-2)

# staged-ml entry: main-segment (out, m, l) + stage-segment merge must
# equal the one-shot attention over the concatenation (fresh dv=64 shapes;
# the loop above leaves dv=768 operands bound)
e, dk, s, dv = 64, 64, 512, 64
q5 = jnp.asarray(rng5.normal(size=(e, dk)), jnp.bfloat16) * 0.3
k5 = jnp.asarray(rng5.normal(size=(2, e, dk, s)), jnp.float32)
v5 = jnp.asarray(rng5.normal(size=(2, e, s, dv)), jnp.float32)
k4q, ks4 = quant.quantize_activations_int4(k5, axis=2)
v4q, vs4 = quant.quantize_activations_int4(v5, axis=3)
kt4 = quant.pack_int4_pairs(k4q, axis=3)
v4p = quant.pack_int4_pairs(v4q, axis=2)
ks2 = ks4[:, :, 0].reshape(2, e, s // 2, 2).swapaxes(2, 3)
vs2 = vs4[..., 0].reshape(2, e, s // 2, 2).swapaxes(2, 3)
ln_base = jnp.full((64,), 300, jnp.int32)
out_ml = da.decode_attention_int4_staged_ml(
    jnp.int32(0), q5, kt4, ks2, v4p, vs2, ln_base, window_cols=256)
o_m, m_m, l_m = out_ml[0], out_ml[1], out_ml[2]
kst = jnp.asarray(rng5.integers(-127, 128, (64, 8, 64)), jnp.int8)
ksst = jnp.ones((64, 8), jnp.float32) * 0.01
vst = jnp.asarray(rng5.integers(-127, 128, (64, 8, 64)), jnp.int8)
vsst = jnp.ones((64, 8), jnp.float32) * 0.01
stp = jnp.broadcast_to(300 + jnp.arange(8)[None], (64, 8)).astype(jnp.int32)
o_s, m_s, l_s = da.stage_segment_attention(q5, kst, ksst, vst, vsst, stp,
                                           jnp.full((64,), 308, jnp.int32))
merged = da.merge_softmax_segments(o_m, m_m, l_m, o_s, m_s, l_s)
# oracle: dequantize everything, one softmax over [main 0..300) + staged
from backpacks_flash_attn_tpu.ops.decode_attention import decode_attention_ref
k_un = quant.unpack_int4_pairs(kt4[0], axis=2).astype(jnp.float32)
ks_full = quant.interleave_pair_scales(ks2[0])
kd = k_un * ks_full[:, None, :]
v_un = quant.unpack_int4_pairs(v4p[0], axis=1).astype(jnp.float32)
vd = v_un * quant.interleave_pair_scales(vs2[0])[..., None]
kd2 = jnp.concatenate([kd[:, :, :300],
                       (kst.astype(jnp.float32) * ksst[..., None]
                        ).transpose(0, 2, 1)], axis=2)
vd2 = jnp.concatenate([vd[:, :300],
                       vst.astype(jnp.float32) * vsst[..., None]], axis=1)
want_merged = decode_attention_ref(q5, kd2, None, vd2, None,
                                   jnp.full((64,), 308, jnp.int32))
check("staged_ml merge (main+stage)", merged, want_merged, tol=1.5e-2)

print("SMOKE", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
