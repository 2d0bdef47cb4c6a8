"""Quantization op tests: pack/unpack round trip, quantization error bounds,
and the Pallas dequant-fused matmul vs the XLA dequant reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import quant


def test_int4_pack_round_trip():
    q = jax.random.randint(jax.random.PRNGKey(0), (64, 256), -8, 8,
                           dtype=jnp.int8)
    packed = quant.pack_int4(q)
    assert packed.shape == (32, 256)
    np.testing.assert_array_equal(np.asarray(quant.unpack_int4(packed)),
                                  np.asarray(q))


@pytest.mark.parametrize("bits,group_size,tol", [(8, None, 0.01),
                                                 (4, None, 0.15),
                                                 (4, 64, 0.08)])
def test_quantize_error(bits, group_size, tol):
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 384)) * 0.02
    qw = quant.quantize_weight(w, bits, group_size)
    w2 = quant.dequantize_weight(qw, jnp.float32)
    assert w2.shape == w.shape
    rel = np.abs(np.asarray(w2) - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < tol, rel


@pytest.mark.parametrize("bits,group_size", [(8, None), (4, 128), (8, 128)])
@pytest.mark.parametrize("m,k,n", [(16, 256, 384), (1, 768, 2304), (200, 384, 512)])
def test_quant_matmul_kernel_vs_xla(bits, group_size, m, k, n):
    """Pallas fused-dequant matmul (interpret mode on CPU) == XLA dequant path."""
    w = jax.random.normal(jax.random.PRNGKey(2), (k, n)) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(3), (m, k))
    qw = quant.quantize_weight(w, bits, group_size)
    ref = quant.quant_matmul_xla(x, qw)
    out = quant.quant_matmul(x, qw, block_m=128, block_n=256, block_k=128)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_quant_matmul_vs_full_precision():
    """INT8 matmul must be close to the fp matmul (weights are well-scaled)."""
    w = jax.random.normal(jax.random.PRNGKey(4), (512, 512)) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 512))
    qw = quant.quantize_weight(w, 8)
    exact = x @ w
    approx = quant.quant_matmul_xla(x, qw)
    rel = (np.abs(np.asarray(approx - exact)).max()
           / np.abs(np.asarray(exact)).max())
    assert rel < 0.02, rel


def test_quant_linear_bias():
    w = jax.random.normal(jax.random.PRNGKey(6), (128, 256)) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(7), (256,))
    p = {"kernel": w, "bias": b}
    qp = quant.quantize_linear_params(p, bits=8)
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 128))
    out = quant.quant_linear(x, qp)
    ref = x @ w + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)


def test_activation_quant_round_trip():
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 64))
    q, scale = quant.quantize_activations_int8(x)
    x2 = quant.dequantize_activations(q, scale, jnp.float32)
    assert np.abs(np.asarray(x2) - np.asarray(x)).max() < 0.05
