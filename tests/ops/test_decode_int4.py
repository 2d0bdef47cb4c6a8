"""INT4 pair-packed cache primitives and decode attention.

The decode step is cache-stream-bound (every byte read per step is cache);
the int4 path halves that stream. These tests pin the packing convention
(packed column j = positions (2j, 2j+1) in (lo, hi) nibbles; scales in the
(E, 2, S/2) parity layout) and check the kernels against the dequantized
fp oracle (reference decode protocol being redesigned:
flash_attn/modules/mha.py:356-380 + training/src/models/backpack.py:313).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.ops import quant
from backpacks_flash_attn_tpu.ops.decode_attention import (
    decode_attention_flat_int4, decode_attention_int4_blockdiag,
    decode_attention_ref)


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_pack_unpack_pairs_roundtrip(axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-7, 8, (4, 6, 8)), jnp.int8)
    p = quant.pack_int4_pairs(x, axis)
    assert p.shape[axis] * 2 == x.shape[axis % x.ndim] or \
        p.shape[axis % x.ndim] * 2 == x.shape[axis % x.ndim]
    np.testing.assert_array_equal(np.asarray(quant.unpack_int4_pairs(p, axis)),
                                  np.asarray(x))


def test_unpack_split_halves():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-7, 8, (3, 10)), jnp.int8)
    p = quant.pack_int4_pairs(x, axis=1)
    lo, hi = quant.unpack_int4_pairs_split(p)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(x[:, 0::2]))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(x[:, 1::2]))


@pytest.mark.parametrize("parity", [0, 1])
def test_rmw_nibble_preserves_other_half(parity):
    rng = np.random.default_rng(2)
    old = jnp.asarray(rng.integers(-128, 128, (5, 3)), jnp.int8)
    nib = jnp.asarray(rng.integers(-7, 8, (5, 3)), jnp.int8)
    new = quant.rmw_nibble(old, nib, jnp.int32(parity))
    lo, hi = quant.unpack_int4_pairs_split(new)
    lo0, hi0 = quant.unpack_int4_pairs_split(old)
    changed, kept, kept0 = ((lo, hi, hi0) if parity == 0 else (hi, lo, lo0))
    np.testing.assert_array_equal(np.asarray(changed), np.asarray(nib))
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(kept0))


def test_quantize_activations_int4_bounds():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32)) * 3.0
    q, scale = quant.quantize_activations_int4(x, axis=1)
    assert int(jnp.max(jnp.abs(q))) <= 7
    err = jnp.abs(q.astype(jnp.float32) * scale - x)
    assert float(jnp.max(err)) <= float(jnp.max(scale)) * 0.51


def _make_int4_problem(e, s, dk, dv, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(e, dk)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(e, dk, s)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(e, s, dv)), jnp.float32)
    kq, ks = quant.quantize_activations_int4(k, axis=1)
    vq, vs = quant.quantize_activations_int4(v, axis=2)
    kt4 = quant.pack_int4_pairs(kq, axis=2)
    v4 = quant.pack_int4_pairs(vq, axis=1)
    ks2 = ks[:, 0, :].reshape(e, s // 2, 2).swapaxes(1, 2)
    vs2 = vs[:, :, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
    length = jnp.asarray(rng.integers(1, s + 1, (e,)), jnp.int32)
    # dequantized oracle operands
    kd = kq.astype(jnp.float32) * ks
    vd = vq.astype(jnp.float32) * vs
    return q, kt4, ks2, v4, vs2, length, kd, vd


@pytest.mark.parametrize("e,s,dk,dv", [(8, 24, 16, 32), (16, 64, 64, 64),
                                       (4, 128, 64, 256)])
def test_flat_int4_matches_dequant_oracle(e, s, dk, dv):
    q, kt4, ks2, v4, vs2, length, kd, vd = _make_int4_problem(e, s, dk, dv)
    out = decode_attention_flat_int4(q, kt4, ks2, v4, vs2, length)
    ref = decode_attention_ref(q, kd, None, vd, None, length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("e,s,dk,dv", [(8, 64, 16, 32), (16, 128, 64, 64)])
def test_blockdiag_int4_matches_flat(e, s, dk, dv):
    q, kt4, ks2, v4, vs2, length, _, _ = _make_int4_problem(e, s, dk, dv,
                                                            seed=3)
    out_x = decode_attention_flat_int4(q, kt4, ks2, v4, vs2, length)
    out_p = decode_attention_int4_blockdiag(q, kt4, ks2, v4, vs2, length)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5, rtol=1e-4)


def test_int4_masking_excludes_tail():
    """Garbage past `length` (incl. a stale high nibble of the final byte)
    must not affect the output."""
    e, s, dk, dv = 4, 32, 16, 16
    q, kt4, ks2, v4, vs2, _, _, _ = _make_int4_problem(e, s, dk, dv, seed=4)
    length = jnp.full((e,), 9, jnp.int32)    # odd: hi nibble of col 4 stale
    base = decode_attention_flat_int4(q, kt4, ks2, v4, vs2, length)
    # trash every packed column >= 5 AND the hi nibble of column 4
    trash = jnp.asarray(
        np.random.default_rng(5).integers(-128, 128, kt4.shape), jnp.int8)
    kt4_t = kt4.at[:, :, 5:].set(trash[:, :, 5:])
    kt4_t = kt4_t.at[:, :, 4].set(
        quant.rmw_nibble(kt4[:, :, 4], jnp.int8(5), jnp.int32(1)))
    v4_t = v4.at[:, 5:].set(
        jnp.asarray(np.random.default_rng(6).integers(-128, 128,
                                                      v4.shape), jnp.int8)[:, 5:])
    out = decode_attention_flat_int4(q, kt4_t, ks2, v4_t, vs2, length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-6, rtol=1e-6)


# ------------------------------------------------------- cache write helpers

def test_rmw_nibble_axis_windowed_vec_matches_scalar():
    """Per-row masked nibble writes must agree with the scalar RMW path."""
    rng = np.random.default_rng(7)
    e, dk, S2 = 6, 8, 16
    buf = jnp.asarray(rng.integers(-128, 128, (e, dk, S2)), jnp.int8)
    nib = jnp.asarray(rng.integers(-7, 8, (e, dk, 1)), jnp.int8)
    offsets = jnp.asarray(rng.integers(0, 2 * S2, (e,)), jnp.int32)
    out_vec = gpt_lib.rmw_nibble_axis_windowed(buf, nib, offsets, axis=2)
    # oracle: per-row scalar RMW
    rows = []
    for i in range(e):
        rows.append(gpt_lib.rmw_nibble_axis_windowed(
            buf[i:i + 1], nib[i:i + 1], offsets[i], axis=2))
    np.testing.assert_array_equal(np.asarray(out_vec),
                                  np.asarray(jnp.concatenate(rows, 0)))


def test_update_pair_scale_vec_matches_scalar():
    rng = np.random.default_rng(8)
    e, S2 = 6, 16
    buf = jnp.asarray(rng.normal(size=(e, 2, S2)), jnp.float32)
    val = jnp.asarray(rng.normal(size=(e,)), jnp.float32)
    offsets = jnp.asarray(rng.integers(0, 2 * S2, (e,)), jnp.int32)
    out_vec = gpt_lib.update_pair_scale(buf, val, offsets)
    rows = []
    for i in range(e):
        rows.append(gpt_lib.update_pair_scale(buf[i:i + 1], val[i:i + 1],
                                              offsets[i]))
    np.testing.assert_allclose(np.asarray(out_vec),
                               np.asarray(jnp.concatenate(rows, 0)))


# ------------------------------------------------------------- mixed

def _make_mixed_problem(e, s, dk, dv, seed=0):
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_ref)
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(e, dk)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(e, dk, s)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(e, s, dv)), jnp.float32)
    k8, ks = quant.quantize_activations_int8(k, axis=1)
    vq, vs = quant.quantize_activations_int4(v, axis=2)
    # even/odd split int8 keys: (E, dk, 2, S/2)
    k8s = jnp.stack([k8[:, :, 0::2], k8[:, :, 1::2]], axis=2)
    v4 = quant.pack_int4_pairs(vq, axis=1)
    ks2 = ks[:, 0, :].reshape(e, s // 2, 2).swapaxes(1, 2)
    vs2 = vs[:, :, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
    length = jnp.asarray(rng.integers(1, s + 1, (e,)), jnp.int32)
    kd = k8.astype(jnp.float32) * ks
    vd = vq.astype(jnp.float32) * vs
    ref = decode_attention_ref(q, kd, None, vd, None, length)
    return q, k8s, ks2, v4, vs2, length, ref


@pytest.mark.parametrize("e,s,dk,dv", [(8, 24, 16, 32), (8, 64, 64, 256)])
def test_flat_mixed_matches_dequant_oracle(e, s, dk, dv):
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_flat_mixed)
    q, k8s, ks2, v4, vs2, length, ref = _make_mixed_problem(e, s, dk, dv)
    out = decode_attention_flat_mixed(q, k8s, ks2, v4, vs2, length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("e,s,dk,dv", [(8, 64, 16, 32), (16, 128, 64, 64)])
def test_blockdiag_mixed_matches_flat(e, s, dk, dv):
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_flat_mixed, decode_attention_mixed_blockdiag)
    q, k8s, ks2, v4, vs2, length, _ = _make_mixed_problem(e, s, dk, dv,
                                                          seed=5)
    out_x = decode_attention_flat_mixed(q, k8s, ks2, v4, vs2, length)
    out_p = decode_attention_mixed_blockdiag(q, k8s, ks2, v4, vs2, length)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5, rtol=1e-4)


def test_store_split8_step_vec_matches_scalar():
    rng = np.random.default_rng(10)
    e, dk, S2 = 6, 8, 16
    buf = jnp.asarray(rng.integers(-128, 128, (e, dk, 2, S2)), jnp.int8)
    val = jnp.asarray(rng.integers(-128, 128, (e, dk, 1)), jnp.int8)
    offsets = jnp.asarray(rng.integers(0, 2 * S2, (e,)), jnp.int32)
    out_vec = gpt_lib.store_split8_step(buf, val, offsets)
    rows = []
    for i in range(e):
        rows.append(gpt_lib.store_split8_step(buf[i:i + 1], val[i:i + 1],
                                              offsets[i]))
    np.testing.assert_array_equal(np.asarray(out_vec),
                                  np.asarray(jnp.concatenate(rows, 0)))


# ------------------------------------------------------- staged low-bit

def test_staged_q4_gpt_decode_tracks_unstaged():
    """STAGED packed-int4 GPT decode (Pallas-main + XLA-stage merge +
    packed flush) must track the unstaged int4 decode within the
    stage-requantization drift (the stage holds int8 until flush re-packs
    to int4)."""
    from backpacks_flash_attn_tpu.config import gpt2_test
    cfg = gpt2_test()
    params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0,
                             cfg.vocab_size)
    c_ref = gpt_lib.init_kv_cache(cfg, 2, 32, jnp.int8, bits=4)
    h_ref, c_ref = gpt_lib.gpt_forward_with_cache(params, cfg, ids[:, :8],
                                                  c_ref, use_flash=False)
    outs_ref = [np.asarray(h_ref[:, -1], np.float32)]
    for t in range(8, 20):
        h, c_ref = gpt_lib.gpt_forward_with_cache(
            params, cfg, ids[:, t:t + 1], c_ref, use_flash=False)
        outs_ref.append(np.asarray(h[:, -1], np.float32))

    c0 = gpt_lib.init_kv_cache(cfg, 2, 32, jnp.int8, bits=4)
    h0, c0 = gpt_lib.gpt_forward_with_cache(params, cfg, ids[:, :8], c0,
                                            use_flash=False)
    cs = gpt_lib.init_kv_cache(cfg, 2, 32, jnp.int8, bits=4,
                               per_slot=True, stage=8)
    cs = cs._replace(k=c0.k, v=c0.v, k_scale=c0.k_scale,
                     v_scale=c0.v_scale,
                     length=jnp.full((2,), 8, jnp.int32),
                     base_len=jnp.full((2,), 8, jnp.int32))
    outs = [np.asarray(h0[:, -1], np.float32)]
    for n, t in enumerate(range(8, 20)):
        h, cs = gpt_lib.gpt_forward_with_cache(params, cfg,
                                               ids[:, t:t + 1], cs,
                                               use_flash=False)
        outs.append(np.asarray(h[:, -1], np.float32))
        if (n + 1) % 6 == 0:
            cs = gpt_lib.flush_kv_cache(cs)
    ref = np.stack(outs_ref, 1)
    got = np.stack(outs, 1)
    d = np.abs(got - ref).max()
    assert d < 0.05 * np.abs(ref).max(), d


def test_packed_flush_roundtrip():
    """flush_kv_cache on a packed cache must place the staged values at
    their logical positions (within int8->int4 requantization error) and
    reset the stage."""
    from backpacks_flash_attn_tpu.config import gpt2_test
    cfg = gpt2_test()
    rng = np.random.default_rng(0)
    cs = gpt_lib.init_kv_cache(cfg, 2, 32, jnp.int8, bits=4,
                               per_slot=True, stage=8)
    L, e, dk, S2 = cs.k.shape
    C = 4
    kvals = rng.normal(size=(L, e, C, dk)).astype(np.float32)
    k8, ks = [], []
    from backpacks_flash_attn_tpu.ops import quant
    k8, ksc = quant.quantize_activations_int8(jnp.asarray(kvals), axis=3)
    v8, vsc = quant.quantize_activations_int8(jnp.asarray(kvals), axis=3)
    st_pos = jnp.asarray([[4, 5, 6, 7, -1, -1, -1, -1]] * 2, jnp.int32)
    cs = cs._replace(
        k_stage=cs.k_stage.at[:, :, :C].set(k8),
        v_stage=cs.v_stage.at[:, :, :C].set(v8),
        ks_stage=cs.ks_stage.at[:, :, :C].set(ksc[..., 0]),
        vs_stage=cs.vs_stage.at[:, :, :C].set(vsc[..., 0]),
        stage_pos=st_pos, stage_ptr=jnp.asarray(C, jnp.int32),
        length=jnp.full((2,), 8, jnp.int32))
    out = gpt_lib.flush_kv_cache(cs)
    assert int(out.stage_ptr) == 0
    assert (np.asarray(out.stage_pos) == -1).all()
    assert (np.asarray(out.base_len) == 8).all()
    # dequantize the flushed window and compare position 5 against the
    # staged value it came from
    lo, hi = quant.unpack_int4_pairs_split(out.v)   # (L, e, S2, dk) halves
    sc_odd = np.asarray(out.v_scale)[:, :, 1, :]    # odd positions
    got = np.asarray(hi, np.float32)[:, :, 2] * sc_odd[:, :, 2:3]  # pos 5
    want = np.asarray(k8, np.float32)[:, :, 1] * np.asarray(
        ksc)[:, :, 1]                                # staged col 1 -> pos 5
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 0.15)
