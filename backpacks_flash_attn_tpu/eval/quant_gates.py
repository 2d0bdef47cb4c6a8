"""Quantization quality gates: ppl deltas vs the fp reference weights.

BASELINE.md targets: INT8 (weights + KV cache) within 0.1 ppl of the fp
checkpoint; INT4 weight-only (incl. sense tables) within 0.5 ppl. This
module measures both on any weights + validation token stream.

Measured on a 1200-step backpack-micro trained on the synthetic bigram
corpus (data/synthetic.py) on a v5e chip:
    int8 delta +0.008 (gate 0.1 PASS)
    int4 delta +0.157 (gate 0.5 PASS, group_size=64, head_bits=8)
Component ablation (int8 baseline, one subtree at int4-g64 at a time):
    gpt.layers +0.001 | tied lm_head +1.497 | ctx_attn +0.005 |
    content.final_mlp +0.000 | sense table +0.152
— hence quantize_backpack_params' head_bits default of max(bits, 8).

Usage:
    python -m backpacks_flash_attn_tpu.eval.quant_gates \
        --workdir runs/micro --corpus tokens.npy --model backpack-micro
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import backpack as bp
from ..models import quantized as qz
from .perplexity import evaluate_perplexity

INT8_GATE = 0.1
INT4_GATE = 0.5


def run_gates(params, cfg, val_tokens: np.ndarray, seqlen: int, *,
              batch_size: int = 4, max_batches: Optional[int] = 25,
              int4_group_size: int = 64) -> Dict[str, float]:
    """Returns {bf16_ppl, int8_ppl, int4_ppl, *_delta, gate_*} for a Backpack
    param tree."""
    def ppl_of(p):
        return evaluate_perplexity(
            lambda pp, x: bp.backpack_forward(pp, cfg, x, use_flash=True),
            val_tokens, seqlen, batch_size, max_batches=max_batches,
            params=p)["ppl"]

    base = ppl_of(params)
    p8 = ppl_of(qz.quantize_backpack_params(params, cfg, bits=8))
    p4 = ppl_of(qz.quantize_backpack_params(params, cfg, bits=4,
                                            group_size=int4_group_size))
    # the INT4-HEAD carve-out, regenerated every run: head_bits defaults to
    # max(bits, 8) because the tied lm_head/wte at int4 (even per-64-group)
    # measured +1.5 ppl on the r3 mini — this arm re-measures the FULL-int4
    # configuration (head included) so the carve-out is an explicit artifact
    # wherever the int4 gate is cited, not an undisclosed default.
    p4h = ppl_of(qz.quantize_backpack_params(params, cfg, bits=4,
                                             group_size=int4_group_size,
                                             head_bits=4))
    return {
        "bf16_ppl": base, "int8_ppl": p8, "int4_ppl": p4,
        "int4_head4_ppl": p4h,
        "int8_delta": p8 - base, "int4_delta": p4 - base,
        "int4_head4_delta": p4h - base,
        "gate_int8": bool(p8 - base <= INT8_GATE),
        "gate_int4": bool(p4 - base <= INT4_GATE),
        "gate_int4_head4": bool(p4h - base <= INT4_GATE),
        "int4_head_bits": 8,   # shipped default: head stays int8
    }


def run_cache_gates(params, cfg, val_tokens: np.ndarray, seqlen: int, *,
                    batch_size: int = 4, max_batches: Optional[int] = 25
                    ) -> Dict[str, float]:
    """Cache-precision gates for the DECODE path: ppl through the cached
    forward (prefill writes the quantized caches and attends over them — the
    same stored-precision operands every decode step reads, so this scores
    exactly the int8/int4-cache decode quality). Configs: int8 weights with
    int8 / int4 / int4-senses+int8-KV-hybrid caches, vs the bf16 full
    forward."""
    def cache_ppl(p, bits, kv_bits=None):
        def fwd(pp, x):
            cache = bp.init_backpack_cache(cfg, x.shape[0], seqlen,
                                           dtype=jnp.int8, bits=bits,
                                           kv_bits=kv_bits)
            logits, _ = bp.backpack_forward_with_cache(pp, cfg, x, cache,
                                                       use_flash=True)
            return logits
        return evaluate_perplexity(fwd, val_tokens, seqlen, batch_size,
                                   max_batches=max_batches, params=p)["ppl"]

    def ppl_of(p):
        return evaluate_perplexity(
            lambda pp, x: bp.backpack_forward(pp, cfg, x, use_flash=True),
            val_tokens, seqlen, batch_size, max_batches=max_batches,
            params=p)["ppl"]

    base = ppl_of(params)
    q8 = qz.quantize_backpack_params(params, cfg, bits=8)
    c8 = cache_ppl(q8, bits=8)
    c4 = cache_ppl(q8, bits=4)
    c4h = cache_ppl(q8, bits=4, kv_bits=8)
    # reverse hybrid — int8 senses/ctx-K + INT4 GPT KV: the r5 mini gates
    # measured the SENSES as the int4 quality bottleneck (full-int4 +1.45,
    # int4-senses/int8-KV +1.37), implying the KV-only-int4 config costs
    # ~+0.1 while cutting ~29% of the decode stream (GPT KV is 18.4KB of
    # the 31.7KB per position).
    ckv4 = cache_ppl(q8, bits=8, kv_bits=4)
    return {
        "bf16_ppl": base,
        "int8_cache_ppl": c8, "int8_cache_delta": c8 - base,
        "int4_cache_ppl": c4, "int4_cache_delta": c4 - base,
        "int4_senses_int8_kv_ppl": c4h, "int4_senses_int8_kv_delta":
            c4h - base,
        "int8_senses_int4_kv_ppl": ckv4, "int8_senses_int4_kv_delta":
            ckv4 - base,
        "gate_int8_cache": bool(c8 - base <= INT8_GATE),
        "gate_int4_cache": bool(c4 - base <= INT4_GATE),
        "gate_int4_hybrid_cache": bool(c4h - base <= INT4_GATE),
        "gate_int4_kv_cache": bool(ckv4 - base <= INT4_GATE),
    }


def main(argv=None) -> None:
    from ..data import lm_dataset as lmd
    from ..training import checkpoint as ckpt_lib
    from ..training import train as train_lib
    from ..training import train_cli

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir",
                   help="native training workdir (newest checkpoint)")
    p.add_argument("--checkpoint",
                   help="reference Lightning .ckpt / torch state dict "
                        "(README.md:108-126 released weights) — runs "
                        "import -> quantize -> gates in one command")
    p.add_argument("--corpus", required=True,
                   help=".npy token stream; gates eval on its tail "
                        "(--val-fraction) unless it IS the val set")
    p.add_argument("--model", default="backpack-micro")
    p.add_argument("--seqlen", type=int, default=512)
    p.add_argument("--val-fraction", type=float, default=0.01)
    p.add_argument("--max-batches", type=int, default=25)
    p.add_argument("--cache-gates", action="store_true", default=True,
                   help="also gate the int8/int4 CACHE decode path")
    p.add_argument("--no-cache-gates", dest="cache_gates",
                   action="store_false")
    a = p.parse_args(argv)
    if bool(a.workdir) == bool(a.checkpoint):
        p.error("exactly one of --workdir / --checkpoint")

    if a.checkpoint:
        from .. import config as config_lib
        from ..utils import torch_import
        cfg = getattr(config_lib, a.model.replace("-", "_"))()
        params = torch_import.load_backpack_checkpoint(
            a.checkpoint, cfg, dtype=jnp.bfloat16)
        step = -1
    else:
        rc = train_cli.RunConfig(corpus=a.corpus, workdir=a.workdir,
                                 model=a.model, seqlen=a.seqlen,
                                 dtype="bfloat16",
                                 val_fraction=a.val_fraction)
        cfg, kind, params0 = train_cli.build_model(rc)
        assert kind == "backpack", "gates are defined for Backpack models"
        tx = train_lib.make_optimizer(params0)
        state_t = train_lib.TrainState(params0, jax.jit(tx.init)(params0),
                                       jnp.zeros((), jnp.int32))
        ckpt = ckpt_lib.latest_checkpoint(a.workdir)
        restored, step, _ = ckpt_lib.restore(ckpt, {"state": state_t})
        params = restored["state"].params
    tokens = lmd.load_corpus(a.corpus)
    n_val = max(int(len(tokens) * a.val_fraction), a.seqlen + 1)
    out = run_gates(params, cfg, tokens[-n_val:], a.seqlen,
                    max_batches=a.max_batches)
    if a.cache_gates:
        out.update(run_cache_gates(params, cfg, tokens[-n_val:], a.seqlen,
                                   max_batches=a.max_batches))
    out["checkpoint_step"] = step
    print(json.dumps(out))


if __name__ == "__main__":
    main()
