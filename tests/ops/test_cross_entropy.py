"""Cross-entropy op tests vs torch.nn.functional oracle (the reference
pattern, tests/losses/test_cross_entropy.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops.cross_entropy import (cross_entropy,
                                                        cross_entropy_loss)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 7, 33)).astype(np.float32)
    labels = rng.integers(0, 33, (4, 7))
    labels[0, 0] = -100
    labels[2, 3] = -100
    return logits, labels


def test_matches_torch(data):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits, labels = data
    loss, lse = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    want = F.cross_entropy(torch.tensor(logits).reshape(-1, 33),
                           torch.tensor(labels).reshape(-1),
                           ignore_index=-100, reduction="none"
                           ).reshape(4, 7).numpy()
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-5, atol=1e-6)
    # lse matches logsumexp
    want_lse = torch.logsumexp(torch.tensor(logits), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=1e-5)


def test_label_smoothing_matches_torch(data):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits, labels = data
    labels = np.where(labels == -100, 5, labels)  # torch smoothing + ignore
    loss, _ = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                            label_smoothing=0.1)
    want = F.cross_entropy(torch.tensor(logits).reshape(-1, 33),
                           torch.tensor(labels).reshape(-1),
                           label_smoothing=0.1, reduction="none"
                           ).reshape(4, 7).numpy()
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-4, atol=1e-5)


def test_mean_reduction_counts_valid_only(data):
    logits, labels = data
    mean = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    loss, _ = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    n_valid = (labels != -100).sum()
    np.testing.assert_allclose(float(mean),
                               float(np.asarray(loss).sum() / n_valid),
                               rtol=1e-6)


def test_grad_flows_only_to_valid(data):
    logits, labels = data
    g = jax.grad(lambda lg: cross_entropy_loss(lg, jnp.asarray(labels)))(
        jnp.asarray(logits))
    g = np.asarray(g)
    assert np.abs(g[0, 0]).max() == 0.0       # ignored position
    assert np.abs(g[1, 0]).max() > 0.0


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_custom_vjp_grad_matches_autodiff(data, smoothing):
    """The memory-frugal backward (saved bf16 logits + lse, softmax
    recomputed) must match plain autodiff through the f32 math."""
    logits, labels = data
    labels = jnp.asarray(np.where(labels == -100, 5, labels))
    lg = jnp.asarray(logits)

    def loss_vjp(lg):
        loss, _ = cross_entropy(lg, labels, label_smoothing=smoothing)
        return loss.sum()

    def loss_ref(lg):
        lg = lg.astype(jnp.float32)
        lp = jax.nn.log_softmax(lg, axis=-1)
        v = lg.shape[-1]
        tgt = ((1 - smoothing) * jax.nn.one_hot(labels, v)
               + smoothing / v)
        return -(tgt * lp).sum()

    g = jax.grad(loss_vjp)(lg)
    g_ref = jax.grad(loss_ref)(lg)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_custom_vjp_grad_bf16(data):
    """bf16 logits path: grads finite, correct sign structure, bf16 dtype."""
    logits, labels = data
    lg = jnp.asarray(logits).astype(jnp.bfloat16)
    labels = jnp.asarray(labels)
    g = jax.grad(lambda x: cross_entropy_loss(x, labels))(lg)
    assert g.dtype == jnp.bfloat16
    gf = np.asarray(g, np.float32)
    assert np.isfinite(gf).all()
    # at the target class, grad = p_y - 1 < 0 for valid rows
    lab = np.asarray(labels)
    valid = lab != -100
    picked = np.take_along_axis(gf, np.where(valid, lab, 0)[..., None],
                                axis=-1)[..., 0]
    assert (picked[valid] < 0).all()
