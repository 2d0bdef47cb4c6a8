"""Golden-logit parity vs the actual reference (torch, CPU, non-fused path).

The strongest correctness oracle available offline: instantiate the reference
BackpackLMHeadModel / GPTLMHeadModel with random weights, import the state dict
through utils/torch_import.py, and require logits to match. This simultaneously
validates (a) the model math and (b) the checkpoint-import key mapping that
the released Lightning .ckpt files rely on (reference: training/src/eval.py:28-44).

Skipped when /root/reference is not mounted.
"""

import sys

import numpy as np
import pytest

from tests.conftest import install_reference_shims, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def torch_env():
    install_reference_shims()
    import torch

    # The reference's ContextSelfAttn hard-codes FusedDense (CUDA-only,
    # reference backpack.py:102); it is construction/state-dict compatible
    # with nn.Linear, so substitute it for the CPU oracle run.
    import src.models.backpack as ref_bp
    if ref_bp.FusedDense is None:
        ref_bp.FusedDense = torch.nn.Linear
    torch.manual_seed(0)
    return torch


def _tiny_backpack_config():
    from src.models.backpack import BackpackConfig as TorchBackpackConfig
    return TorchBackpackConfig(
        vocab_size=512, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        num_content_vectors=4, activation_function="gelu_new",
        scale_attn_by_inverse_layer_idx=True, pad_vocab_size_multiple=8,
        reorder_and_upcast_attn=False,
    )


def test_backpack_logits_match_reference(torch_env):
    torch = torch_env
    from src.models.backpack import BackpackLMHeadModel

    ref_cfg = _tiny_backpack_config()
    model = BackpackLMHeadModel(ref_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    ids_np = np.random.default_rng(0).integers(0, 512, (2, 24))
    with torch.no_grad():
        ref_logits = model(torch.tensor(ids_np)).logits.numpy()

    import jax.numpy as jnp
    from backpacks_flash_attn_tpu.config import BackpackConfig
    from backpacks_flash_attn_tpu.models import backpack as bp
    from backpacks_flash_attn_tpu.utils import torch_import

    cfg = BackpackConfig(vocab_size=512, n_positions=64, n_embd=64, n_layer=2,
                         n_head=4, num_senses=4,
                         scale_attn_by_inverse_layer_idx=True,
                         pad_vocab_size_multiple=8)
    params = torch_import.backpack_params_from_state_dict(sd, cfg)
    logits = np.asarray(bp.backpack_forward(params, cfg, jnp.asarray(ids_np),
                                            use_flash=False))
    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-4)


def test_gpt_logits_match_reference(torch_env):
    torch = torch_env
    from flash_attn.models.gpt import GPTLMHeadModel
    from transformers import GPT2Config

    ref_cfg = GPT2Config(vocab_size=512, n_positions=64, n_embd=64, n_layer=3,
                         n_head=4, activation_function="gelu_new",
                         scale_attn_by_inverse_layer_idx=False)
    model = GPTLMHeadModel(ref_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    ids_np = np.random.default_rng(1).integers(0, 512, (2, 24))
    with torch.no_grad():
        ref_logits = model(torch.tensor(ids_np)).logits.numpy()

    import jax.numpy as jnp
    from backpacks_flash_attn_tpu.config import GPTConfig
    from backpacks_flash_attn_tpu.models import gpt as gpt_lib
    from backpacks_flash_attn_tpu.utils import torch_import

    cfg = GPTConfig(vocab_size=512, n_positions=64, n_embd=64, n_layer=3,
                    n_head=4)
    params = torch_import.gpt_params_from_state_dict(sd, cfg)
    logits = np.asarray(gpt_lib.gpt_lm_forward(params, cfg,
                                               jnp.asarray(ids_np),
                                               use_flash=False))
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-4)


def test_state_dict_round_trip(torch_env):
    """Export native params back to reference layout and reload: identity."""
    import jax
    import jax.numpy as jnp
    from backpacks_flash_attn_tpu.config import backpack_test
    from backpacks_flash_attn_tpu.models import backpack as bp
    from backpacks_flash_attn_tpu.utils import torch_import

    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    sd = torch_import.state_dict_from_backpack_params(params, cfg)
    params2 = torch_import.backpack_params_from_state_dict(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        params, params2)
