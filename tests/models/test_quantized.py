"""Quantized inference tests: INT8/INT4 param trees must run through the same
model code and stay close to the fp32 logits; the INT8 KV-cache decode must
track the fp decode. Quality gates at the ppl level live in the eval suite;
these are the structural/correctness gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.models import quantized as qz


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    fp_logits = bp.backpack_forward(params, cfg, ids, use_flash=False)
    return cfg, params, ids, fp_logits


def _agree(fp_logits, q_logits, min_frac):
    """Top-1 agreement between fp and quantized logits."""
    a = np.asarray(fp_logits).argmax(-1)
    b = np.asarray(q_logits).argmax(-1)
    return (a == b).mean() >= min_frac


def test_int8_forward_close(setup):
    cfg, params, ids, fp_logits = setup
    qp = qz.quantize_backpack_params(params, cfg, bits=8)
    q_logits = bp.backpack_forward(qp, cfg, ids, use_flash=False)
    assert q_logits.shape == fp_logits.shape
    # random init → logits are O(1); int8 should track closely
    err = np.abs(np.asarray(q_logits) - np.asarray(fp_logits)).max()
    assert err < 0.15, err
    assert _agree(fp_logits, q_logits, 0.9)


def test_int4_forward_reasonable(setup):
    cfg, params, ids, fp_logits = setup
    qp = qz.quantize_backpack_params(params, cfg, bits=4, group_size=32,
                                     sense_bits=4)
    q_logits = bp.backpack_forward(qp, cfg, ids, use_flash=False)
    err = np.abs(np.asarray(q_logits) - np.asarray(fp_logits)).max()
    assert err < 1.0, err
    assert _agree(fp_logits, q_logits, 0.5)


def test_int8_cached_decode_matches_quantized_forward(setup):
    """INT8 weights + INT8 KV cache + quantized sense table: the incremental
    path must track the quantized full forward."""
    cfg, params, ids, _ = setup
    qp = qz.quantize_backpack_params(params, cfg, bits=8)
    full = bp.backpack_forward(qp, cfg, ids, use_flash=False)
    cache = bp.init_backpack_cache(cfg, 2, 20, dtype=jnp.int8)
    pre, cache = bp.backpack_forward_with_cache(qp, cfg, ids[:, :12], cache,
                                                use_flash=False)
    # int8 cache adds quantization noise on top of the shared weights path
    err = np.abs(np.asarray(pre) - np.asarray(full[:, :12])).max()
    assert err < 0.2, err
    for t in range(12, 16):
        step, cache = bp.backpack_forward_with_cache(
            qp, cfg, ids[:, t:t + 1], cache, use_flash=False)
        err = np.abs(np.asarray(step[:, 0]) - np.asarray(full[:, t])).max()
        assert err < 0.2, err


def test_sense_table_gather_matches_mlp(setup):
    """Quantized-table content must track the MLP content."""
    cfg, params, ids, _ = setup
    fp_content = bp.content_forward(params, cfg, ids)
    qp = qz.quantize_backpack_params(params, cfg, bits=8)
    q_content = bp.content_forward(qp, cfg, ids)
    err = np.abs(np.asarray(q_content, np.float32)
                 - np.asarray(fp_content, np.float32)).max()
    rel = err / np.abs(np.asarray(fp_content)).max()
    assert rel < 0.05, rel


def test_quantized_gpt_generate():
    """Quantized GPT decode runs end-to-end and produces mostly the same
    tokens as fp decode."""
    from backpacks_flash_attn_tpu.config import gpt2_test
    from backpacks_flash_attn_tpu.utils import generation

    cfg = gpt2_test()
    params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(0))
    qp = qz.quantize_gpt_params(params, cfg, bits=8)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)
    out_fp = generation.generate_gpt(params, cfg, ids, 16, use_flash=False,
                                     cache_dtype=jnp.float32)
    out_q = generation.generate_gpt(qp, cfg, ids, 16, use_flash=False,
                                    cache_dtype=jnp.int8)
    assert out_q.sequences.shape == out_fp.sequences.shape
    match = (np.asarray(out_fp.sequences) == np.asarray(out_q.sequences)).mean()
    assert match > 0.7, match


def test_int4_grouped_sense_table_improves_quality(setup):
    """Channel-grouped INT4 scales must reconstruct the sense table strictly
    better than per-row scales (SURVEY.md §7.3's INT4 quality requirement),
    and the grouped table must flow through content_forward."""
    cfg, params, ids, _ = setup
    table = bp.sense_table(params, cfg)
    tf = np.asarray(table, np.float32)

    def recon(qt):
        q = np.asarray(qt.q)
        if qt.bits == 4:
            q = np.asarray(qz.quant.unpack_int4_last(jnp.asarray(q)))
        sc = np.asarray(qt.scale)
        if sc.shape[-1] not in (1, q.shape[-1]):
            sc = np.repeat(sc, q.shape[-1] // sc.shape[-1], axis=-1)
        return q.astype(np.float32) * sc

    per_row = qz.quantize_sense_table(table, bits=4, group_size=0 or None)
    # force ungrouped for comparison
    qmax = 7.0
    absmax = np.abs(tf).max(-1, keepdims=True)
    sc = np.maximum(absmax / qmax, 1e-10)
    ungrouped_err = np.abs(np.clip(np.round(tf / sc), -7, 7) * sc - tf).mean()

    grouped = qz.quantize_sense_table(table, bits=4, group_size=16)
    grouped_err = np.abs(recon(grouped) - tf).mean()
    assert grouped_err < ungrouped_err, (grouped_err, ungrouped_err)

    # grouped table flows through the model path
    qp = qz.quantize_backpack_params(params, cfg, bits=8, sense_bits=4)
    content = bp.content_forward(qp, cfg, ids)
    assert np.isfinite(np.asarray(content, np.float32)).all()
    rel = (np.abs(np.asarray(content, np.float32)
                  - np.asarray(bp.content_forward(params, cfg, ids),
                               np.float32)).max()
           / np.abs(np.asarray(bp.content_forward(params, cfg, ids))).max())
    assert rel < 0.12, rel
