"""Fused-MLP custom backward vs plain autodiff.

The fused path saves only (input, pre-activation) and recomputes the
activation in the backward (reference FusedDenseGeluDense checkpoint_lvl=1,
flash_attn/ops/fused_dense.py:175-235); grads must match autodiff through the
unfused composition exactly (same recompute numerics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import dense


@pytest.mark.parametrize("activation", ["gelu", "gelu_new", "relu", "sqrelu"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mlp_fused_grad_matches_autodiff(activation, dtype):
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda x: x.astype(dtype),
                          dense.init_mlp(key, 16, 64))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16), dtype)
    ct = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16), dtype)

    def unfused(x, params):
        act = dense.ACTIVATIONS[activation]
        return dense.linear(act(dense.linear(x, params["fc1"])), params["fc2"])

    out_f, vjp_f = jax.vjp(lambda x, p: dense.mlp(x, p, activation), x, params)
    out_u, vjp_u = jax.vjp(unfused, x, params)
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_u, np.float32), rtol=1e-5)
    gf, gu = vjp_f(ct), vjp_u(ct)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                                   rtol=2e-2 if dtype == jnp.bfloat16 else 1e-4)


def test_mlp_no_bias():
    params = dense.init_mlp(jax.random.PRNGKey(0), 8, 32)
    for fc in params.values():
        fc.pop("bias", None)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    g = jax.grad(lambda x, p: dense.mlp(x, p).sum(), argnums=(0, 1))(x, params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))
    assert "bias" not in jax.tree.leaves(g, is_leaf=lambda t: isinstance(t, dict))[0]
