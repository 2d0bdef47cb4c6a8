"""Fused decode-attention kernel vs its jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops.decode_attention import (
    decode_attention_fused, decode_attention_ref)


@pytest.mark.parametrize("quant", [True, False])
@pytest.mark.parametrize("e,s,dk,dv", [(24, 128, 64, 64), (16, 96, 48, 256)])
def test_fused_vs_ref(quant, e, s, dk, dv):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (e, dk), jnp.float32) * 0.1
    if quant:
        k = jax.random.randint(key, (e, dk, s), -127, 127, jnp.int8)
        v = jax.random.randint(key, (e, s, dv), -127, 127, jnp.int8)
        ks = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (e, s))) * 0.01
        vs = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (e, s))) * 0.01
    else:
        k = jax.random.normal(key, (e, dk, s), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(1), (e, s, dv), jnp.float32)
        ks = vs = None
    length = jnp.asarray(s - 17, jnp.int32)
    out = decode_attention_fused(q, k, ks, v, vs, length)
    ref = decode_attention_ref(q, k, ks, v, vs, length)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-3, rtol=5e-3)


def test_masking_excludes_tail():
    """Positions >= length must not affect the output."""
    key = jax.random.PRNGKey(3)
    e, s, d = 8, 64, 32
    q = jax.random.normal(key, (e, d))
    k = jax.random.normal(jax.random.PRNGKey(4), (e, d, s))
    v = jax.random.normal(jax.random.PRNGKey(5), (e, s, d))
    out1 = decode_attention_fused(q, k, None, v, None, jnp.asarray(40))
    k2 = k.at[:, :, 40:].set(999.0)
    v2 = v.at[:, 40:].set(-999.0)
    out2 = decode_attention_fused(q, k2, None, v2, None, jnp.asarray(40))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_length_buckets_match_full():
    """Bucketed decode (prefix reads under lax.cond) must equal the
    full-window computation at every bucket boundary."""
    import numpy as np
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_flat)
    rng = np.random.default_rng(0)
    E, dk, S = 8, 16, 512
    q = jnp.asarray(rng.normal(size=(E, dk)).astype(np.float32))
    kt = jnp.asarray(rng.normal(size=(E, dk, S)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(E, S, dk)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 1.5, (E, S)).astype(np.float32))
    for L in (1, 100, 128, 129, 256, 257, 400, 512):
        want = decode_attention_flat(q, kt, None, v, vs, jnp.asarray(L),
                                     length_buckets=False)
        got = jax.jit(lambda l: decode_attention_flat(
            q, kt, None, v, vs, l, length_buckets=True))(jnp.asarray(L))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5), L
    # per-row lengths: bucket picked by the max
    lens = jnp.asarray([5, 100, 300, 12, 1, 7, 2, 99], jnp.int32)
    want = decode_attention_flat(q, kt, None, v, vs, lens,
                                 length_buckets=False)
    got = decode_attention_flat(q, kt, None, v, vs, lens,
                                length_buckets=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_gathered_matches_reference(quant):
    """Length-adaptive gathered kernel vs the fp32 reference, ragged per-row
    lengths (incl. a zero-length row and full-length rows)."""
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_gathered, decode_attention_ref)
    rng = np.random.default_rng(7)
    e, dk, S, dv = 16, 64, 512, 128
    q = jnp.asarray(rng.normal(size=(e, dk)).astype(np.float32))
    if quant:
        kt = jnp.asarray(rng.integers(-127, 127, (e, dk, S)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (e, S, dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
    else:
        kt = jnp.asarray(rng.normal(size=(e, dk, S)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(e, S, dv)).astype(np.float32))
        ks = vs = None
    lens = jnp.asarray(rng.integers(1, S + 1, (e,)), jnp.int32)
    lens = lens.at[0].set(0).at[1].set(S).at[2].set(1)
    got = decode_attention_gathered(q, kt, ks, v, vs, lens, block_s=128)
    want = decode_attention_ref(q, kt, ks, v, vs, lens)
    got, want = np.asarray(got), np.asarray(want)
    assert np.abs(got[0]).max() == 0.0          # zero-length row
    np.testing.assert_allclose(got[1:], want[1:], atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("quant", [False, True])
def test_selector_matches_reference(quant):
    """Block-diagonal selector formulation vs the fp32 reference."""
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_selector, decode_attention_ref)
    rng = np.random.default_rng(9)
    e, dk, S, dv = 16, 64, 256, 128
    q = jnp.asarray(rng.normal(size=(e, dk)).astype(np.float32))
    if quant:
        kt = jnp.asarray(rng.integers(-127, 127, (e, dk, S)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (e, S, dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
    else:
        kt = jnp.asarray(rng.normal(size=(e, dk, S)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(e, S, dv)).astype(np.float32))
        ks = vs = None
    lens = jnp.asarray(rng.integers(1, S + 1, (e,)), jnp.int32)
    got = decode_attention_selector(q, kt, ks, v, vs, lens)
    want = decode_attention_ref(q, kt, ks, v, vs, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("quant", [False, True])
def test_blockdiag_matches_reference(quant):
    """Block-diagonal-matmul formulation vs the fp32 reference."""
    from backpacks_flash_attn_tpu.ops.decode_attention import (
        decode_attention_blockdiag, decode_attention_ref)
    rng = np.random.default_rng(11)
    e, dk, S, dv = 16, 64, 256, 128
    q = jnp.asarray(rng.normal(size=(e, dk)).astype(np.float32))
    if quant:
        kt = jnp.asarray(rng.integers(-127, 127, (e, dk, S)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (e, S, dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (e, S)).astype(np.float32))
    else:
        kt = jnp.asarray(rng.normal(size=(e, dk, S)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(e, S, dv)).astype(np.float32))
        ks = vs = None
    lens = jnp.asarray(rng.integers(1, S + 1, (e,)), jnp.int32)
    got = decode_attention_blockdiag(q, kt, ks, v, vs, lens,
                                     rows_per_program=8)
    want = decode_attention_ref(q, kt, ks, v, vs, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
