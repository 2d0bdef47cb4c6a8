"""Switch-MoE layer (ops/moe.py): routing semantics, capacity drops,
balance loss, and expert-parallel sharding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import dense
from backpacks_flash_attn_tpu.ops.moe import (init_switch_moe,
                                              moe_param_specs, switch_moe)


@pytest.fixture(scope="module")
def setup():
    d, inner, E = 16, 32, 4
    params = init_switch_moe(jax.random.PRNGKey(0), d, inner, E)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, d))
    return params, x, d, inner, E


def _dense_oracle(x, params):
    """Every token through its argmax expert, gate-scaled — no capacity."""
    logits = np.asarray(jnp.einsum("bsd,de->bse", x, params["router"]),
                        np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    e_idx = probs.argmax(-1)
    act = dense.ACTIVATIONS["gelu_new"]
    out = np.zeros_like(np.asarray(x, np.float64))
    for b in range(x.shape[0]):
        for t in range(x.shape[1]):
            e = e_idx[b, t]
            h = np.asarray(act(
                x[b, t] @ params["fc1"]["kernel"][e]
                + params["fc1"]["bias"][e]), np.float64)
            y = h @ np.asarray(params["fc2"]["kernel"][e], np.float64) \
                + np.asarray(params["fc2"]["bias"][e], np.float64)
            out[b, t] = probs[b, t, e] * y
    return out


def test_matches_dense_oracle_with_big_capacity(setup):
    params, x, *_ = setup
    out, aux = switch_moe(x, params, capacity_factor=8.0)  # nothing dropped
    want = _dense_oracle(x, params)
    np.testing.assert_allclose(np.asarray(out, np.float64), want,
                               atol=1e-4, rtol=1e-4)
    assert np.isfinite(float(aux))


def test_capacity_drops_zero_tokens(setup):
    params, x, *_ = setup
    out_small, _ = switch_moe(x, params, capacity_factor=0.25)
    out_big, _ = switch_moe(x, params, capacity_factor=8.0)
    small = np.asarray(out_small)
    dropped = np.all(small == 0.0, axis=-1)
    assert dropped.any(), "tiny capacity must drop some tokens"
    # kept tokens are identical to the uncapped output
    kept = ~dropped
    np.testing.assert_allclose(small[kept], np.asarray(out_big)[kept],
                               atol=1e-5)


def test_balance_loss_uniform_router(setup):
    _, x, d, inner, E = setup
    params = init_switch_moe(jax.random.PRNGKey(2), d, inner, E)
    params["router"] = jnp.zeros((d, E))   # uniform probs; argmax -> expert 0
    _, aux = switch_moe(x, params, capacity_factor=8.0)
    # mean_prob uniform (1/E), all tokens routed to one expert: aux = E*(1/E)=1
    assert float(aux) == pytest.approx(1.0, rel=1e-5)


def test_grads_flow(setup):
    params, x, *_ = setup

    def loss(p):
        out, aux = switch_moe(x, p, capacity_factor=2.0)
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert np.isfinite(np.asarray(leaf)).all(), path
    assert float(np.abs(np.asarray(g["fc1"]["kernel"])).max()) > 0


def test_expert_parallel_sharding_equivalence(setup):
    """EP: experts sharded over an 'expert' mesh axis give the same outputs
    as single-device (XLA inserts the dispatch/combine collectives)."""
    params, x, *_ = setup
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "expert"))
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s),
                             moe_param_specs(params),
                             is_leaf=lambda v: isinstance(v, P))
    sharded = jax.device_put(params, shardings)
    want, aux_w = switch_moe(x, params, capacity_factor=2.0)
    with mesh:
        got, aux_g = jax.jit(
            lambda p, x: switch_moe(x, p, capacity_factor=2.0))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=2e-5)
    assert float(aux_g) == pytest.approx(float(aux_w), rel=1e-5)


def test_quantized_experts_match_fp(setup):
    """quantize_moe_params (INT8 per-(expert, out-channel) kernels) runs
    through the SAME switch_moe and matches the fp layer within int8
    round-off; routing (which stays fp32) is identical."""
    from backpacks_flash_attn_tpu.ops.moe import quantize_moe_params
    params, x, *_ = setup
    qparams = quantize_moe_params(params, act_dtype=jnp.float32)
    assert qparams["fc1"]["kernel"]["q"].dtype == jnp.int8
    assert qparams["fc2"]["kernel"]["q"].dtype == jnp.int8
    out_fp, aux_fp = switch_moe(x, params, capacity_factor=8.0)
    out_q, aux_q = switch_moe(x, qparams, capacity_factor=8.0)
    assert float(aux_q) == pytest.approx(float(aux_fp), rel=1e-5)
    err = float(jnp.max(jnp.abs(out_q - out_fp)))
    ref = float(jnp.max(jnp.abs(out_fp)))
    assert err < 0.03 * max(ref, 1.0), (err, ref)


def test_quantized_experts_stacked_layers(setup):
    """Layer-stacked (L, E, d, h) kernels quantize with per-layer scales and
    slice correctly when a scan strips the L axis."""
    from backpacks_flash_attn_tpu.ops.moe import quantize_moe_params
    params, x, *_ = setup
    stacked = jax.tree.map(lambda a: jnp.stack([a, a * 0.5]), params)
    qstack = quantize_moe_params(stacked, act_dtype=jnp.float32)
    assert qstack["fc1"]["kernel"]["q"].shape[0] == 2
    layer0 = jax.tree.map(lambda a: a[0], qstack)
    q0 = quantize_moe_params(params, act_dtype=jnp.float32)
    out_a, _ = switch_moe(x, layer0, capacity_factor=8.0)
    out_b, _ = switch_moe(x, q0, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)
