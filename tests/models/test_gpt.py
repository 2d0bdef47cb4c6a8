"""GPT model tests: shapes, causality, decode parity.

Mirrors the reference's test strategy (SURVEY.md §4): causality is the
architecture-level invariant (reference: training/src/callbacks/
causality_monitor.py:8-59) and KV-cached decode must match the full forward
token-for-token (reference: tests/models/test_gpt_generation.py:21-70).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import gpt2_test
from backpacks_flash_attn_tpu.models import gpt as gpt_lib


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2_test()
    params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, cfg.vocab_size)
    return cfg, params, ids


def test_forward_shapes(setup):
    cfg, params, ids = setup
    hidden = gpt_lib.gpt_forward(params, cfg, ids, use_flash=False)
    assert hidden.shape == (2, 24, cfg.n_embd)
    logits = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)
    assert logits.shape == (2, 24, cfg.padded_vocab_size)
    assert not np.any(np.isnan(np.asarray(logits)))


def test_causality(setup):
    """Changing token t must not affect logits at positions < t."""
    cfg, params, ids = setup
    logits = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)
    ids2 = ids.at[:, 10].set((ids[:, 10] + 1) % cfg.vocab_size)
    logits2 = gpt_lib.gpt_lm_forward(params, cfg, ids2, use_flash=False)
    np.testing.assert_allclose(np.asarray(logits[:, :10]),
                               np.asarray(logits2[:, :10]), atol=1e-5)
    assert np.abs(np.asarray(logits[:, 10:]) -
                  np.asarray(logits2[:, 10:])).max() > 1e-3


def test_cached_forward_matches_full(setup):
    """Prefill-then-step logits == full forward logits (the invariant behind
    reference tests/models/test_gpt_generation.py)."""
    cfg, params, ids = setup
    full_hidden = gpt_lib.gpt_forward(params, cfg, ids, use_flash=False)

    cache = gpt_lib.init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    prefill_hidden, cache = gpt_lib.gpt_forward_with_cache(
        params, cfg, ids[:, :20], cache, use_flash=False)
    np.testing.assert_allclose(np.asarray(prefill_hidden),
                               np.asarray(full_hidden[:, :20]),
                               atol=1e-4, rtol=1e-4)
    # 4 incremental steps
    for t in range(20, 24):
        step_hidden, cache = gpt_lib.gpt_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache, use_flash=False)
        np.testing.assert_allclose(np.asarray(step_hidden[:, 0]),
                                   np.asarray(full_hidden[:, t]),
                                   atol=1e-4, rtol=1e-4)
    assert int(cache.length) == 24


def test_dropout_train_vs_eval(setup):
    cfg, params, ids = setup
    out1 = gpt_lib.gpt_forward(params, cfg, ids, train=True,
                               rng=jax.random.PRNGKey(3), use_flash=False)
    out2 = gpt_lib.gpt_forward(params, cfg, ids, train=True,
                               rng=jax.random.PRNGKey(4), use_flash=False)
    out_eval = gpt_lib.gpt_forward(params, cfg, ids, use_flash=False)
    # Different rngs give different outputs; eval is deterministic.
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4
    out_eval2 = gpt_lib.gpt_forward(params, cfg, ids, use_flash=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_hf_gpt2_import_golden_logits():
    """gpt_params_from_hf_gpt2 must reproduce HuggingFace GPT2LMHeadModel
    logits (the reference's remap_state_dict_gpt2 oracle,
    tests/models/test_gpt.py:16-75 in /root/reference)."""
    transformers = pytest.importorskip("transformers")
    import torch

    from backpacks_flash_attn_tpu.config import GPTConfig
    from backpacks_flash_attn_tpu.utils.torch_import import (
        gpt_params_from_hf_gpt2)

    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu_new")
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    sd = {k[len("transformer."):] if k.startswith("transformer.") else k: v
          for k, v in hf.state_dict().items()}
    cfg = GPTConfig(vocab_size=512, n_positions=64, n_embd=64, n_layer=2,
                    n_head=4, pad_vocab_size_multiple=8)
    params = gpt_params_from_hf_gpt2(sd, cfg)

    ids = np.random.default_rng(0).integers(0, 512, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(gpt_lib.gpt_lm_forward(params, cfg, jnp.asarray(ids),
                                            use_flash=False))
    np.testing.assert_allclose(got[..., :512], want, rtol=1e-3, atol=2e-4)


def test_attn_dwconv_matches_torch_conv1d():
    """attn_dwconv (reference gpt.py:51-61): the shifted-add formulation must
    equal torch's Conv1d(k=3, padding=2, groups=C) trimmed to seqlen, and the
    model must stay causal."""
    torch = pytest.importorskip("torch")
    from backpacks_flash_attn_tpu.models.gpt import causal_dwconv3

    rng = np.random.default_rng(0)
    b, s, c = 2, 10, 12
    x = rng.normal(size=(b, s, c)).astype(np.float32)
    w = rng.normal(size=(3, c)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    got = causal_dwconv3(jnp.asarray(x), {"w": jnp.asarray(w),
                                          "b": jnp.asarray(bias)})
    conv = torch.nn.Conv1d(c, c, 3, padding=2, groups=c)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w.T[:, None, :]))
        conv.bias.copy_(torch.tensor(bias))
        want = conv(torch.tensor(x).transpose(1, 2))[..., :s].transpose(1, 2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5,
                               rtol=1e-5)

    # causality through the full model with the flag on
    cfg = gpt2_test().replace(attn_dwconv=True)
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    base = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)
    ids2 = ids.at[0, 6].set((ids[0, 6] + 1) % cfg.vocab_size)
    pert = gpt_lib.gpt_lm_forward(params, cfg, ids2, use_flash=False)
    np.testing.assert_allclose(np.asarray(base[:, :6]), np.asarray(pert[:, :6]),
                               atol=1e-5)
    assert np.abs(np.asarray(base[:, 6:]) - np.asarray(pert[:, 6:])).max() > 1e-4


def test_gpt3_config_family():
    """GPT-3-style Pile configs (reference: configs/experiment/pile/
    gpt3*-flash[-rotary].yaml): 2048 context, rotary variants drop learned
    positions and rotate half the head dim."""
    from backpacks_flash_attn_tpu import config as C
    for name, embd in (("gpt3_small", 768), ("gpt3_medium", 1024),
                       ("gpt3_large", 1536), ("gpt3_xl", 2048),
                       ("gpt3_2_7b", 2560)):
        cfg = getattr(C, name)()
        assert cfg.n_embd == embd and cfg.n_positions == 2048, name
        r = getattr(C, name)(rotary=True)
        assert r.n_positions == 0 and r.rotary_emb_fraction == 0.5, name
    assert C.gpt3_small(seqlen=8192).n_positions == 8192   # the -8k variants

    # tiny rotary forward exercises the no-learned-positions path
    cfg = C.gpt3_small(rotary=True, vocab_size=512, n_embd=64, n_head=4,
                       n_layer=2)
    import jax
    from backpacks_flash_attn_tpu.models import gpt as g
    p = g.init_gpt(cfg, jax.random.PRNGKey(0))
    h = g.gpt_forward(p, cfg, jnp.ones((1, 16), jnp.int32), use_flash=False)
    assert h.shape == (1, 16, 64)
