"""Padding utils tests (reference: tests exercising bert_padding via the BERT
model; here direct roundtrip + gradient checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.utils import padding as pad


def _mask(rng, b, s):
    lens = rng.integers(1, s + 1, b)
    m = np.zeros((b, s), bool)
    for i, L in enumerate(lens):
        m[i, :L] = True
    return jnp.asarray(m), lens


def test_roundtrip():
    rng = np.random.default_rng(0)
    b, s, d = 3, 8, 4
    x = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    mask, lens = _mask(rng, b, s)
    up = pad.unpad_input(x, mask)
    # packed rows are the real tokens in batch-major order
    total = int(lens.sum())
    np.testing.assert_array_equal(np.asarray(up.valid[:total]), True)
    np.testing.assert_array_equal(np.asarray(up.cu_seqlens),
                                  np.concatenate([[0], np.cumsum(lens)]))
    back = pad.pad_input(up, b, s)
    want = np.asarray(x) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(back), want, rtol=1e-6)


def test_budget_truncation():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0]], bool)
    up = pad.unpad_input(x, mask, budget=8)
    assert up.values.shape == (8, 3)
    assert int(up.valid.sum()) == 5
    back = pad.pad_input(up, 2, 6)
    want = np.asarray(x) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(back), want, rtol=1e-6)


def test_differentiable():
    x = jnp.ones((2, 4, 3))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], bool)

    def f(x):
        up = pad.unpad_input(x, mask, budget=4)
        return pad.pad_input(up, 2, 4).sum()

    g = jax.grad(f)(x)
    # grads flow only to real tokens
    np.testing.assert_array_equal(np.asarray(g[:, :, 0] > 0),
                                  np.asarray(mask))


def test_under_jit():
    x = jnp.arange(24.0).reshape(2, 4, 3)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    f = jax.jit(lambda x: pad.pad_input(pad.unpad_input(x, mask, budget=6),
                                        2, 4))
    np.testing.assert_allclose(np.asarray(f(x)),
                               np.asarray(x) * np.asarray(mask)[..., None])
