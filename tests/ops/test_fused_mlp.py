"""Parity tests for the single-pass Pallas MLP forward (ops/fused_mlp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import dense, fused_mlp


def _params(key, d, inner, dtype=jnp.float32):
    return dense.init_mlp(key, d, inner, dtype=dtype)


@pytest.mark.parametrize("t", [256, 1000])   # 1000: token padding path
@pytest.mark.parametrize("activation", ["gelu_new", "sqrelu"])
def test_fwd_matches_unfused(t, activation):
    key = jax.random.PRNGKey(0)
    d, inner = 128, 512
    params = _params(key, d, inner)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d), jnp.float32)
    out, hpre = fused_mlp.mlp_fwd_fused(
        x, params["fc1"]["kernel"], params["fc1"]["bias"],
        params["fc2"]["kernel"], params["fc2"]["bias"],
        activation=activation, block_t=256, block_i=256)
    act = dense.ACTIVATIONS[activation]
    hpre_ref = dense.linear(x, params["fc1"])
    out_ref = dense.linear(act(hpre_ref), params["fc2"])
    np.testing.assert_allclose(np.asarray(hpre), np.asarray(hpre_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_batched_shape_and_grads(monkeypatch):
    """(b, s, d) input through dense.mlp with the kernel enabled: forward
    AND grads match the unfused path (the custom_vjp backward is shared, so
    this pins the fwd-rule residual contract)."""
    key = jax.random.PRNGKey(2)
    d, inner = 128, 256
    params = _params(key, d, inner)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 48, d), jnp.float32)

    def loss(p, x):
        return jnp.sum(jnp.sin(dense.mlp(x, p, "gelu_new")))

    ref_v, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setattr(dense, "_FUSED_MLP", True)
    fused_v, fused_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    assert abs(float(ref_v - fused_v)) < 1e-4
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(fused_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_supported_gate():
    key = jax.random.PRNGKey(4)
    good = _params(key, 128, 512)
    assert fused_mlp.supported(good, "gelu_new")
    assert not fused_mlp.supported(good, "nope")
    odd = _params(key, 120, 512)
    assert not fused_mlp.supported(odd, "gelu_new")
    nobias = {"fc1": {"kernel": good["fc1"]["kernel"]},
              "fc2": good["fc2"]}
    assert not fused_mlp.supported(nobias, "gelu_new")
    from backpacks_flash_attn_tpu.ops import quant
    q = {"fc1": quant.quantize_linear_params(good["fc1"], bits=8),
         "fc2": quant.quantize_linear_params(good["fc2"], bits=8)}
    assert not fused_mlp.supported(q, "gelu_new")
