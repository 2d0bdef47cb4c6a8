"""dropout+add+LayerNorm: the bf16-saves fused custom_vjp vs the plain path.

The fused path (BACKPACKS_DALN_BF16_SAVES) narrows the saved-for-backward
copy of the fp32 residual stream to bf16 — the forward must stay BIT-EXACT
(same math, same mask), the backward within bf16-rounding noise, and the
end-to-end learning gate (tests/training/test_harness.py bigram capstone,
parametrized over this flag) guards optimization quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import norms


@pytest.fixture
def problem():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 64), jnp.bfloat16)
    res = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 64), jnp.float32)
    w = jnp.ones((64,), jnp.float32) * 1.3
    b = jnp.zeros((64,), jnp.float32) + 0.1
    g1 = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 64), jnp.float32)
    g2 = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 64), jnp.float32)
    return x, res, w, b, g1, g2


@pytest.mark.parametrize("p,det", [(0.1, False), (0.0, True)])
def test_daln_bf16_saves_matches_plain(problem, p, det, monkeypatch):
    x, res, w, b, g1, g2 = problem
    rng = jax.random.PRNGKey(7)

    def run(flag):
        monkeypatch.setattr(norms, "_DALN_BF16_SAVES", flag)

        def loss(x, res, w, b):
            n, nr = norms.dropout_add_layer_norm(
                x, res, w, b, p, 1e-5, rng=rng, deterministic=det)
            return (jnp.sum(n.astype(jnp.float32) * g1)
                    + jnp.sum(nr * g2))

        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(x, res, w, b)

    l0, gr0 = run(False)
    l1, gr1 = run(True)
    # forward: same math, same mask -> bit-exact
    assert float(l0) == float(l1), (l0, l1)
    # backward: x_hat recomputed from the bf16-saved residual (~2^-8 rel)
    for a, c, name in zip(gr0, gr1, ["dx", "dres", "dw", "db"]):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(c, np.float32))
        scale = max(float(np.abs(np.asarray(a, np.float32)).max()), 1.0)
        assert d.max() < 0.02 * scale, (name, d.max(), scale)


def test_daln_fused_engages_only_on_supported_config(problem, monkeypatch):
    """rowscale/colscale/postnorm/no-residual configs must keep the plain
    path (the fused vjp does not implement them)."""
    x, res, w, b, g1, g2 = problem
    monkeypatch.setattr(norms, "_DALN_BF16_SAVES", True)
    # no residual (ln_0): plain path, still returns (normed, residual)
    n, nr = norms.dropout_add_layer_norm(x, None, w, b, 0.0, 1e-5)
    assert nr.dtype == jnp.float32
    # rowscale: plain path
    rs = jnp.ones((4, 16), jnp.float32)
    n2, _ = norms.dropout_add_layer_norm(x, res, w, b, 0.0, 1e-5,
                                         rowscale=rs)
    assert np.isfinite(np.asarray(n2, np.float32)).all()
    # postnorm returns a single tensor
    n3 = norms.dropout_add_layer_norm(x, res, w, b, 0.0, 1e-5, prenorm=False)
    assert isinstance(n3, jax.Array)


def test_daln_bf16_saves_dropout_idx_sharded_mask(problem, monkeypatch):
    """The fused path must honor dropout_idx (the sharded-caller global
    positions): same idx -> same mask -> identical forward as plain."""
    x, res, w, b, g1, g2 = problem
    rng = jax.random.PRNGKey(9)
    idx = jnp.arange(x.size).reshape(x.shape)

    def fwd(flag):
        monkeypatch.setattr(norms, "_DALN_BF16_SAVES", flag)
        n, nr = norms.dropout_add_layer_norm(
            x, res, w, b, 0.3, 1e-5, rng=rng, deterministic=False,
            dropout_idx=idx)
        return np.asarray(n, np.float32)

    np.testing.assert_array_equal(fwd(False), fwd(True))
