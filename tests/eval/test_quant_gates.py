"""Synthetic corpus + quantization-gate machinery (CPU smoke)."""

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
from backpacks_flash_attn_tpu.eval.quant_gates import run_gates
from backpacks_flash_attn_tpu.models import backpack as bp


def test_bigram_corpus_properties():
    toks, floor = bigram_corpus(20_000, vocab_size=257, n_successors=8,
                                seed=3)
    assert toks.shape == (20_000,) and toks.max() < 257
    toks2, _ = bigram_corpus(20_000, vocab_size=257, n_successors=8, seed=3)
    np.testing.assert_array_equal(toks, toks2)          # deterministic
    assert 0.5 < floor < np.log(8) + 1e-9               # entropy in range
    # each token really has at most 8 successors
    succ = {}
    for a, b in zip(toks[:-1], toks[1:]):
        succ.setdefault(int(a), set()).add(int(b))
    assert max(len(v) for v in succ.values()) <= 8


def test_run_gates_structure():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    toks, _ = bigram_corpus(2_000, vocab_size=cfg.vocab_size,
                            n_successors=4, seed=0)
    out = run_gates(params, cfg, toks, seqlen=64, batch_size=2,
                    max_batches=2, int4_group_size=16)
    for k in ("bf16_ppl", "int8_delta", "int4_delta", "gate_int8",
              "gate_int4"):
        assert k in out
    assert np.isfinite(out["bf16_ppl"])
    # int8 must track the fp model closely even at random init
    assert abs(out["int8_delta"]) < 0.05 * out["bf16_ppl"]
