"""Interactive generation & sense-control REPL.

The L6 user entry points of the reference (SURVEY.md §1):
training/src/demo_generate.py (interactive sampling),
training/src/interactive.py (counterfactual contextualization scaling) and
training/src/modulate_generate.py (knowledge-editing REPL), as one CLI:

    python -m backpacks_flash_attn_tpu.cli \
        --checkpoint last.ckpt --model backpack-small \
        [--vocab vocab.json --merges merges.txt] [--int8] [--temperature 0.8]
        [--top-p 0.95] [--top-k 40]

Without tokenizer files, prompts are space-separated token ids. Commands
inside the REPL:

    <prompt>                      generate a continuation
    /upweight <token> <factor>    multiply a token's sense weights
    /edit <tok> <out> <in>        knowledge-edit: project tok's senses
                                  out of <out>'s direction into <in>'s
    /senses <token>               show top vocab per sense
    /reset                        clear interventions
    /quit
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as config_lib
from .models import backpack as bp
from .models import interventions as iv
from .utils import generation


def _load(args):
    maker = {
        "backpack-micro": config_lib.backpack_micro,
        "backpack-mini": config_lib.backpack_mini,
        "backpack-small": config_lib.backpack_small,
        "backpack-test": config_lib.backpack_test,
    }[args.model]
    cfg = maker()
    if args.checkpoint:
        from .utils.torch_import import load_backpack_checkpoint
        if args.checkpoint.endswith(".npz"):
            from .training import checkpoint as ckpt_lib
            template = bp.init_backpack(cfg, jax.random.PRNGKey(0),
                                        dtype=jnp.bfloat16)
            params, _, _ = ckpt_lib.restore(args.checkpoint, template)
        else:
            params = load_backpack_checkpoint(args.checkpoint, cfg,
                                              dtype=jnp.bfloat16)
    else:
        print("[no checkpoint: random weights]")
        params = bp.init_backpack(cfg, jax.random.PRNGKey(args.seed),
                                  dtype=jnp.bfloat16)
    if args.int8:
        from .models import quantized as qz
        params = qz.quantize_backpack_params(params, cfg, bits=8)
    return cfg, params


def _make_tokenizer(args):
    if args.vocab and args.merges:
        from .utils.fast_tokenizer import FastGPT2Tokenizer
        from .utils.tokenizer import GPT2Tokenizer
        return FastGPT2Tokenizer(
            GPT2Tokenizer.from_files(args.vocab, args.merges))
    return None


class Repl:
    def __init__(self, cfg, params, tokenizer, args):
        self.cfg = cfg
        self.params = params
        self.tok = tokenizer
        self.args = args
        self.sense_weights: Optional[jnp.ndarray] = None
        self.sense_edit = None
        self.rng = jax.random.PRNGKey(args.seed)

    def encode(self, text: str):
        if self.tok:
            return self.tok(text)["input_ids"]
        return [int(t) for t in text.split()]

    def decode(self, ids) -> str:
        if self.tok:
            return self.tok.decode(ids)
        return " ".join(str(int(i)) for i in ids)

    def token_id(self, word: str) -> int:
        if self.tok:
            return self.tok(" " + word)["input_ids"][0]
        return int(word)

    def generate(self, text: str) -> str:
        ids = jnp.asarray(self.encode(text), jnp.int32)[None]
        self.rng, sub = jax.random.split(self.rng)
        n = self.args.max_new_tokens
        if self.sense_weights is not None:
            # (V, nv) table => per-token weighted decode (control pipeline)
            from .eval.control import generate_weighted
            gen = generate_weighted(self.params, self.cfg, ids,
                                    self.sense_weights, anneal=False,
                                    max_new_tokens=n,
                                    temperature=self.args.temperature,
                                    rng=sub)
            return self.decode(gen[0])
        out = generation.generate_backpack(
            self.params, self.cfg, ids, max_length=ids.shape[1] + n,
            temperature=self.args.temperature, top_p=self.args.top_p,
            top_k=self.args.top_k,
            rng=sub if self.args.temperature > 0 else None,
            sense_edit=self.sense_edit)
        return self.decode(np.asarray(out.sequences)[0, ids.shape[1]:])

    def command(self, line: str) -> str:
        parts = line.split()
        if parts[0] == "/quit":
            raise SystemExit(0)
        if parts[0] == "/reset":
            self.sense_weights = None
            self.sense_edit = None
            return "[interventions cleared]"
        if parts[0] == "/upweight":
            tok, factor = self.token_id(parts[1]), float(parts[2])
            w = (np.ones((self.cfg.padded_vocab_size, self.cfg.num_senses),
                         np.float32) if self.sense_weights is None
                 else np.asarray(self.sense_weights))
            w[tok] *= factor
            self.sense_weights = jnp.asarray(w)
            return f"[senses of token {tok} x{factor}]"
        if parts[0] == "/edit":
            t, o, i = (self.token_id(p) for p in parts[1:4])
            self.sense_edit = iv.mogrify_word(self.params, self.cfg, t, o, i)
            return f"[token {t}: projected {o} -> {i}]"
        if parts[0] == "/senses":
            tok = self.token_id(parts[1])
            from .eval.control import top_vocab_per_sense
            vis = top_vocab_per_sense(self.params, self.cfg, tok, k=5)
            lines = []
            for s, d in vis.items():
                tops = (self.decode(d["top_ids"]) if self.tok
                        else str(d["top_ids"]))
                lines.append(f"  sense {s:2d}: {tops}")
            return "\n".join(lines)
        return f"[unknown command {parts[0]}]"

    def run(self):
        print("backpack REPL — /upweight /edit /senses /reset /quit")
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                out = (self.command(line) if line.startswith("/")
                       else self.generate(line))
            except SystemExit:
                return
            except Exception as e:  # keep the REPL alive
                out = f"[error: {type(e).__name__}: {e}]"
            print(out, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model", default="backpack-small")
    p.add_argument("--vocab", default=None)
    p.add_argument("--merges", default=None)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=1.0,
                   help="nucleus sampling cutoff (1.0 = off)")
    p.add_argument("--top-k", type=int, default=0,
                   help="top-k sampling cutoff (0 = off)")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    cfg, params = _load(args)
    Repl(cfg, params, _make_tokenizer(args), args).run()


if __name__ == "__main__":
    main()
