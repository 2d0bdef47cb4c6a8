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
