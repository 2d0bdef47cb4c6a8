"""Ring (context-parallel) attention vs the single-device reference.

The reference has no CP (SURVEY.md §2.7); these tests pin the shard_map
ppermute ring (parallel/ring_attention.py) to the exact outputs and
gradients of ops.attention.mha_reference on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops.attention import mha_reference
from backpacks_flash_attn_tpu.parallel import ring_attention as ra


def _mesh(n):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _qkv(key, b, s, h, d):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (b, s, h, d), jnp.float32),
            jax.random.normal(k2, (b, s, h, d), jnp.float32),
            jax.random.normal(k3, (b, s, h, d), jnp.float32))


@pytest.mark.parametrize("n_dev,causal", [(4, True), (8, True), (4, False),
                                          (2, True)])
def test_ring_matches_reference(n_dev, causal):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 64, 2, 16)
    mesh = _mesh(n_dev)
    attn = ra.make_ring_attention(mesh, causal=causal)
    with mesh:
        got = jax.jit(attn)(q, k, v)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("remat", [True, False])
def test_ring_gradients_match_reference(remat):
    q, k, v = _qkv(jax.random.PRNGKey(1), 1, 32, 2, 8)
    t = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 2, 8))
    mesh = _mesh(4)
    attn = ra.make_ring_attention(mesh, causal=True, remat=remat)

    def loss_ring(q, k, v):
        return jnp.sum(attn(q, k, v) * t)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) * t)

    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_ring_output_independent_of_mesh_size():
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 48, 1, 8)
    outs = []
    for n in (2, 4):   # 48 divides by both
        mesh = _mesh(n)
        with mesh:
            outs.append(np.asarray(jax.jit(
                ra.make_ring_attention(mesh))(q, k, v)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-6, rtol=2e-6)


def test_ring_custom_scale():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 32, 1, 8)
    mesh = _mesh(4)
    with mesh:
        got = jax.jit(ra.make_ring_attention(mesh, softmax_scale=0.1))(
            q, k, v)
    want = mha_reference(q, k, v, causal=True, softmax_scale=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n_dev,causal", [(4, True), (8, True), (4, False),
                                          (2, True)])
def test_ring_flash_matches_reference(n_dev, causal):
    q, k, v = _qkv(jax.random.PRNGKey(5), 2, 64, 2, 16)
    mesh = _mesh(n_dev)
    attn = ra.make_ring_attention(mesh, causal=causal, impl="flash")
    with mesh:
        got = jax.jit(attn)(q, k, v)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_flash_gradients_match_reference():
    q, k, v = _qkv(jax.random.PRNGKey(6), 1, 32, 2, 8)
    t = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 2, 8))
    mesh = _mesh(4)
    attn = ra.make_ring_attention(mesh, causal=True, impl="flash")

    def loss_ring(q, k, v):
        return jnp.sum(attn(q, k, v) * t)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) * t)

    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_ring_flash_noncausal_gradients():
    q, k, v = _qkv(jax.random.PRNGKey(8), 1, 32, 1, 8)
    t = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 1, 8))
    mesh = _mesh(4)
    attn = ra.make_ring_attention(mesh, causal=False, impl="flash")

    def loss_ring(q, k, v):
        return jnp.sum(attn(q, k, v) * t)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=False) * t)

    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_ring_flash_custom_scale_and_mesh_independence():
    q, k, v = _qkv(jax.random.PRNGKey(10), 1, 48, 1, 8)
    outs = []
    for n in (2, 4):
        mesh = _mesh(n)
        with mesh:
            outs.append(np.asarray(jax.jit(ra.make_ring_attention(
                mesh, impl="flash", softmax_scale=0.1))(q, k, v)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-6, rtol=2e-6)
    want = mha_reference(q, k, v, causal=True, softmax_scale=0.1)
    np.testing.assert_allclose(outs[0], np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_zigzag_permute_roundtrip():
    x = jnp.arange(2 * 48 * 3).reshape(2, 48, 3).astype(jnp.float32)
    for S in (2, 4):
        y = ra.zigzag_unpermute(ra.zigzag_permute(x, S), S)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_zigzag_matches_reference(n_dev):
    q, k, v = _qkv(jax.random.PRNGKey(11), 2, 64, 2, 16)
    mesh = _mesh(n_dev)
    attn = ra.make_zigzag_ring_attention(mesh)
    with mesh:
        got = jax.jit(attn)(q, k, v)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_zigzag_gradients_match_reference():
    q, k, v = _qkv(jax.random.PRNGKey(12), 1, 32, 2, 8)
    t = jax.random.normal(jax.random.PRNGKey(13), (1, 32, 2, 8))
    mesh = _mesh(4)
    attn = ra.make_zigzag_ring_attention(mesh)

    def loss_ring(q, k, v):
        return jnp.sum(attn(q, k, v) * t)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) * t)

    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-5, rtol=2e-4, err_msg=name)


def test_zigzag_custom_scale_matches_flash_ring():
    q, k, v = _qkv(jax.random.PRNGKey(14), 1, 32, 1, 8)
    mesh = _mesh(4)
    with mesh:
        zz = np.asarray(jax.jit(ra.make_zigzag_ring_attention(
            mesh, softmax_scale=0.2))(q, k, v))
    want = mha_reference(q, k, v, causal=True, softmax_scale=0.2)
    np.testing.assert_allclose(zz, np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_flash_dropout_matches_single_device():
    """In-kernel attention dropout under the ring: the counter-hash masks
    are a pure function of (seed, global row, global q_pos, global k_pos),
    so the ring output and gradients match the SINGLE-DEVICE flash kernel
    with the same rng — CP attention dropout == unsharded attention
    dropout."""
    from backpacks_flash_attn_tpu.ops.flash_attention import flash_attention
    q, k, v = _qkv(jax.random.PRNGKey(20), 2, 64, 2, 16)
    t = jax.random.normal(jax.random.PRNGKey(21), (2, 64, 2, 16))
    rng = jax.random.PRNGKey(7)
    p = 0.3
    mesh = _mesh(4)

    def ring(q, k, v):
        fn = jax.shard_map(
            lambda q, k, v: ra.ring_flash_attention_local(
                q, k, v, axis="seq", causal=True, dropout_p=p,
                dropout_rng=rng),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(None, "seq", None, None),) * 3,
            out_specs=jax.sharding.PartitionSpec(None, "seq", None, None),
            check_vma=False)
        return fn(q, k, v)

    def single(q, k, v):
        return flash_attention(q, k, v, causal=True, dropout_p=p,
                               dropout_rng=rng)

    with mesh:
        got = jax.jit(ring)(q, k, v)
        g_ring = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(ring(q, k, v) * t),
            argnums=(0, 1, 2)))(q, k, v)
    want = single(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(single(q, k, v) * t),
                     argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-5, rtol=2e-4, err_msg=name)
    # and it is genuinely dropping: different from the no-dropout output
    nodrop = mha_reference(q, k, v, causal=True)
    assert float(jnp.max(jnp.abs(want - nodrop))) > 1e-3
