"""Sense-introspection data tests (reference: make_pca.py, visualize_sim.py,
localize_pred.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import visualize as vz
from backpacks_flash_attn_tpu.models import backpack as bp


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_sense_pca(setup):
    cfg, params = setup
    out = vz.sense_pca(params, cfg, list(range(20)), n_components=2)
    assert out["projected"].shape == (20 * cfg.num_senses, 2)
    assert out["explained"].shape == (2,)
    assert 0 < out["explained"].sum() <= 1.0 + 1e-6
    # per-sense PCA
    out1 = vz.sense_pca(params, cfg, list(range(20)), sense=1)
    assert out1["projected"].shape == (20, 2)
    # projection reproduces centered data in the component subspace
    recon = out1["projected"] @ out1["components"]
    X = vz.sense_matrix(params, cfg, range(20))[:, 1] - out1["mean"]
    full = vz.sense_pca(params, cfg, list(range(20)), sense=1,
                        n_components=min(20, cfg.n_embd))
    np.testing.assert_allclose(
        np.linalg.norm(X - recon) <= np.linalg.norm(X), True)


def test_similarity_matrices(setup):
    cfg, params = setup
    sim = vz.sense_similarity_matrix(params, cfg, [3, 5, 9], sense=0)
    assert sim.shape == (3, 3)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    cs = vz.cross_sense_similarity(params, cfg, 7)
    assert cs.shape == (cfg.num_senses, cfg.num_senses)
    np.testing.assert_allclose(np.diag(cs), 1.0, atol=1e-5)


def test_localize_prediction_sums_to_logit(setup):
    """Summing per-(sense, position) contributions must reproduce the final
    logit of the target token (the decomposition's defining identity)."""
    cfg, params = setup
    ids = jnp.asarray([2, 7, 5, 9], jnp.int32)
    target = 11
    contrib = vz.localize_prediction(params, cfg, ids, target,
                                     use_flash=False)
    assert contrib.shape == (cfg.num_senses, 4)
    logits = bp.backpack_forward(params, cfg, ids[None], use_flash=False)
    np.testing.assert_allclose(contrib.sum(), float(logits[0, -1, target]),
                               rtol=2e-2, atol=2e-3)
