"""ViT tests: golden parity vs HuggingFace ViTForImageClassification
(offline random init) + structural checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.models import vit as vit_lib


@pytest.fixture(scope="module")
def hf_pair():
    transformers = pytest.importorskip("transformers")
    import torch
    torch.manual_seed(0)
    hf_cfg = transformers.ViTConfig(
        image_size=16, patch_size=4, num_channels=3, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_labels=10)
    hf = transformers.ViTForImageClassification(hf_cfg).eval()
    cfg = vit_lib.vit_test(layer_norm_eps=hf_cfg.layer_norm_eps)
    params = vit_lib.remap_hf_vit(hf.state_dict(), cfg)
    return hf, cfg, params


def test_patchify_matches_conv(hf_pair):
    """reshape+GEMM patch embedding must equal the HF conv."""
    hf, cfg, params = hf_pair
    import torch
    img = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = hf.vit.embeddings.patch_embeddings(
            torch.tensor(img)).numpy()       # (b, n, d)
    from backpacks_flash_attn_tpu.ops import dense
    got = np.asarray(dense.linear(vit_lib.patchify(jnp.asarray(img), 4),
                                  params["patch_embed"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_golden_parity_vs_hf(hf_pair):
    hf, cfg, params = hf_pair
    import torch
    img = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(img)).logits.numpy()
    got = np.asarray(vit_lib.vit_forward(params, cfg, jnp.asarray(img),
                                         use_flash=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_permutation_of_patches_changes_logits(hf_pair):
    """Position embeddings must make the model sensitive to patch layout."""
    _, cfg, params = hf_pair
    img = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 3, 16, 16)).astype(np.float32))
    base = vit_lib.vit_forward(params, cfg, img, use_flash=False)
    flipped = vit_lib.vit_forward(params, cfg, img[:, :, ::-1],
                                  use_flash=False)
    assert np.abs(np.asarray(base) - np.asarray(flipped)).max() > 1e-4


def test_shapes_and_random_init():
    cfg = vit_lib.vit_test()
    params = vit_lib.init_vit(cfg, jax.random.PRNGKey(0))
    img = jnp.zeros((3, 3, 16, 16))
    feats = vit_lib.vit_features(params, cfg, img, use_flash=False)
    assert feats.shape == (3, cfg.num_patches + 1, cfg.hidden_size)
    logits = vit_lib.vit_forward(params, cfg, img, use_flash=False)
    assert logits.shape == (3, 10)
    assert np.isfinite(np.asarray(logits)).all()
