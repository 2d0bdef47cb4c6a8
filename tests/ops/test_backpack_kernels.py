"""Fused contextualization kernel vs the O(s^2) einsum oracle.

Mirrors the reference's kernel test pattern (tests/test_flash_attn.py in
/root/reference: kernel output/grads within a small multiple of the fp32
reference's own fp16 error)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops.backpack_kernels import (
    contextualization_reference, fused_contextualization)


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("s,nv,dnv,d,block", [
    (128, 4, 16, 64, 128),     # tiny, single tile
    (256, 3, 48, 96, 128),     # non-pow2 head dim + odd nv
    (200, 2, 32, 64, 128),     # s not a multiple of the block
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_forward_matches_reference(rng, s, nv, dnv, d, block, dtype):
    b = 2
    q = _rand(rng, (b, s, nv, dnv), dtype)
    k = _rand(rng, (b, s, nv, dnv), dtype)
    c = _rand(rng, (b, s, nv, d), dtype)
    scale = dnv ** -0.5
    ref = contextualization_reference(q, k, c, scale).astype(jnp.float32)
    out = fused_contextualization(q, k, c, scale, block, block
                                  ).astype(jnp.float32)
    tol = 2e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=tol, rtol=tol)


def test_fused_gradients_match_reference(rng):
    b, s, nv, dnv, d = 2, 192, 3, 32, 64
    q = _rand(rng, (b, s, nv, dnv), jnp.float32)
    k = _rand(rng, (b, s, nv, dnv), jnp.float32)
    c = _rand(rng, (b, s, nv, d), jnp.float32)
    t = _rand(rng, (b, s, d), jnp.float32)
    scale = dnv ** -0.5

    def loss_fused(q, k, c):
        return jnp.sum(fused_contextualization(q, k, c, scale, 128, 128) * t)

    def loss_ref(q, k, c):
        return jnp.sum(contextualization_reference(q, k, c, scale) * t)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, c)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, c)
    for gf, gr, name in zip(g_fused, g_ref, ("dq", "dk", "dcontent")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_in_backpack_forward(rng):
    """End-to-end: backpack_forward's fused path == einsum path, fwd + grad."""
    from backpacks_flash_attn_tpu.config import BackpackConfig
    from backpacks_flash_attn_tpu.models import backpack as bp

    cfg = BackpackConfig(vocab_size=128, n_positions=64, n_embd=64, n_layer=2,
                         n_head=4, num_senses=4, pad_vocab_size_multiple=8)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(0, 128, (2, 64)))

    logits_fused = bp.backpack_forward(params, cfg, ids, use_flash=True)
    logits_ein = bp.backpack_forward(params, cfg, ids, use_flash=False)
    np.testing.assert_allclose(np.asarray(logits_fused),
                               np.asarray(logits_ein), atol=2e-4, rtol=2e-4)

    def loss(params, use_flash):
        lg = bp.backpack_forward(params, cfg, ids, use_flash=use_flash)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 0] ** 2)

    g_fused = jax.grad(loss)(params, True)
    g_ein = jax.grad(loss)(params, False)
    leaves_f = jax.tree_util.tree_leaves_with_path(g_fused)
    leaves_e = dict(jax.tree_util.tree_leaves_with_path(g_ein))
    for path, gf in leaves_f:
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(leaves_e[path]), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))

def test_fused_with_interventions_and_remat(rng):
    """The intervention hooks (sense_weights, sense_edit) and remat feed the
    fused path too — parity vs the einsum path for each."""
    from backpacks_flash_attn_tpu.config import BackpackConfig
    from backpacks_flash_attn_tpu.models import backpack as bp

    cfg = BackpackConfig(vocab_size=64, n_positions=32, n_embd=32, n_layer=1,
                         n_head=2, num_senses=2, pad_vocab_size_multiple=8)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(1))
    ids = jnp.asarray(rng.integers(0, 64, (2, 32)))
    w = jnp.asarray(rng.uniform(0.2, 2.0, (cfg.num_senses,)), jnp.float32)
    edit = (jnp.asarray([int(ids[0, 3])]),
            _rand(rng, (1, cfg.num_senses, cfg.n_embd), jnp.float32))

    for kw in ({"sense_weights": w}, {"sense_edit": edit}, {"remat": True}):
        out_f = bp.backpack_forward(params, cfg, ids, use_flash=True, **kw)
        out_e = bp.backpack_forward(params, cfg, ids, use_flash=False, **kw)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                                   atol=2e-4, rtol=2e-4, err_msg=str(kw.keys()))

    # remat grad parity through the checkpointed fused kernel
    def loss(params, use_flash):
        lg = bp.backpack_forward(params, cfg, ids, use_flash=use_flash,
                                 remat=True)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 0] ** 2)

    gf = jax.grad(loss)(params, True)
    ge = dict(jax.tree_util.tree_leaves_with_path(jax.grad(loss)(params, False)))
    for path, g in jax.tree_util.tree_leaves_with_path(gf):
        np.testing.assert_allclose(np.asarray(g), np.asarray(ge[path]),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_fused_ctx_fixedmax_variant(monkeypatch):
    """FLASH_FIXEDMAX in the contextualization kernels: inference and
    training forwards plus gradients still match the einsum oracle."""
    from backpacks_flash_attn_tpu.ops import backpack_kernels as bk
    monkeypatch.setattr(bk, "_FIXEDMAX", True)
    b, s, nv, dnv, d = 2, 32, 3, 8, 16
    q = jax.random.normal(jax.random.PRNGKey(60), (b, s, nv, dnv),
                          jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(61), (b, s, nv, dnv),
                          jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(62), (b, s, nv, d), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(63), (b, s, d))
    scale = dnv ** -0.5

    def oracle(q, k, c):
        sc = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        qpos = jnp.arange(s)[:, None]
        kpos = jnp.arange(s)[None, :]
        sc = jnp.where((kpos <= qpos)[None, None], sc, -1e30)
        a = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bhts,bshd->btd", a, c)

    got = bk.fused_contextualization(q, k, c, scale)
    want = oracle(q, k, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    def loss_f(q, k, c):
        return jnp.sum(bk.fused_contextualization(q, k, c, scale) * t)

    def loss_r(q, k, c):
        return jnp.sum(oracle(q, k, c) * t)

    g_f = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, c)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, c)
    for gf, gr, name in zip(g_f, g_r, ("q", "k", "content")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-5, rtol=3e-4, err_msg=name)
