"""Typed model configurations.

TPU-native replacement for the reference's Hydra + transformers.GPT2Config flag soup
(reference: flash_attn/models/gpt.py:44-122, training/src/models/backpack.py:146-153).
Instead of feature flags choosing between fused/unfused CUDA paths, a single config
selects numeric policy; kernel selection (Pallas flash vs XLA reference attention)
is an argument to the model apply functions so the same weights drive both paths.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class GPTConfig:
    """GPT-2 style decoder config.

    Mirrors the knobs the reference consumes from GPT2Config
    (reference: flash_attn/models/gpt.py:44-122), minus CUDA-fusion flags.
    """

    vocab_size: int = 50257
    n_positions: int = 1024          # max learned positions; <=0 disables pos emb
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None    # default 4*n_embd
    activation: str = "gelu_new"     # 'gelu_new'/'gelu_fast' => tanh approx; 'gelu' => exact
    layer_norm_epsilon: float = 1e-5
    embd_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    initializer_range: float = 0.02
    scale_attn_by_inverse_layer_idx: bool = False
    pad_vocab_size_multiple: int = 1
    rotary_emb_fraction: float = 0.0
    rotary_emb_scale_base: int = 0
    attn_dwconv: bool = False        # causal depthwise conv on qkv (gpt.py:51-61)
    # Switch-MoE MLPs (ops/moe.py; beyond the reference, which has no MoE):
    # moe_experts > 0 replaces EVERY block's dense MLP with a top-1-routed
    # n-expert FFN (uniform across layers: the stacked layer scan needs one
    # homogeneous param tree). The Switch balance loss is returned by the
    # forwards and weighted into the training loss by moe_aux_weight.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def inner_dim(self) -> int:
        return self.n_inner if self.n_inner is not None else 4 * self.n_embd

    @property
    def rotary_emb_dim(self) -> int:
        """Rotated channels per head (reference mha.py:320:
        int(rotary_emb_fraction * head_dim)), rounded down to even."""
        return (int(self.rotary_emb_fraction * self.head_dim) // 2) * 2

    @property
    def padded_vocab_size(self) -> int:
        """Vocab padded for MXU-friendly logits GEMM (reference: gpt.py:182-185)."""
        return _round_up(self.vocab_size, self.pad_vocab_size_multiple)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class BackpackConfig(GPTConfig):
    """Backpack LM config: GPTConfig + sense-vector count.

    reference: training/src/models/backpack.py:146-153 (num_content_vectors=16),
    training/configs/model/backpack.yaml (scale_attn_by_inverse_layer_idx: true).
    """

    num_senses: int = 16             # nv, 'num_content_vectors' in the reference
    content_n_layer: int = 1         # no-mix blocks in the sense network (reference :235)
    shrink_final_inner: bool = False  # reference backpack.py:56

    @property
    def sense_head_dim(self) -> int:
        """Head dim of the contextualization attention (d / nv)."""
        return self.n_embd // self.num_senses

    @property
    def sense_head_dim_padded(self) -> int:
        """sense_head_dim zero-padded up to a 64 multiple: the decode-path
        ctx_k cache stores padded keys so the per-step score contraction
        tiles like the GPT attention one (d/nv = 48 for -small lowered XLA
        into a 5x-slower multiply-reduce fusion, profiled on v5e)."""
        return -(-self.sense_head_dim // 64) * 64


# Named sizes from training/configs/model/gpt2model/*.yaml and
# configs/experiment/owt/backpack-*.yaml (seqlen 512, vocab pad multiple 8).
def backpack_nano(**kw) -> BackpackConfig:
    """2L/128d draft model for model-draft speculation: its decode cache
    stream is ~5% of backpack-mini's, putting break-even acceptance near
    6% at k=4 (a micro draft streams ~53% of a mini step — break-even ~54%,
    uneconomical). Beyond the reference (its decode has no speculation)."""
    return BackpackConfig(n_embd=128, n_head=2, n_layer=2, num_senses=4,
                          n_positions=512,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8, **kw)


def backpack_micro(**kw) -> BackpackConfig:
    return BackpackConfig(n_embd=384, n_head=6, n_layer=6, n_positions=512,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8, **kw)


def backpack_mini(**kw) -> BackpackConfig:
    return BackpackConfig(n_embd=640, n_head=8, n_layer=8, n_positions=512,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8, **kw)


def backpack_small(**kw) -> BackpackConfig:
    return BackpackConfig(n_embd=768, n_head=12, n_layer=12, n_positions=512,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8, **kw)


def gpt2_small(**kw) -> GPTConfig:
    return GPTConfig(n_embd=768, n_head=12, n_layer=12, **kw)


def gpt2_medium(**kw) -> GPTConfig:
    return GPTConfig(n_embd=1024, n_head=16, n_layer=24, **kw)


def gpt2_large(**kw) -> GPTConfig:
    return GPTConfig(n_embd=1280, n_head=20, n_layer=36, **kw)


def gpt2_xlarge(**kw) -> GPTConfig:
    return GPTConfig(n_embd=1600, n_head=25, n_layer=48, **kw)


# GPT-3-style Pile configs (reference: training/configs/experiment/pile/
# gpt3{s,m,l,xl}-flash[-rotary][-8k].yaml, gpt3-2.7B-flash-hdim128-rotary):
# GPT-2 widths at 2048 (or 8192) context; rotary variants use fraction 0.5
# with learned positions dropped, the long-context shapes the flash kernel's
# O(s) memory makes trainable.
def _gpt3(embd, head, layer, *, seqlen=2048, rotary=False, **kw):
    kw.setdefault("pad_vocab_size_multiple", 8)
    if rotary:
        kw.setdefault("rotary_emb_fraction", 0.5)
        kw.setdefault("n_positions", 0)       # rotary replaces learned pos
        # (seqlen is then a cache/dataset-size choice, not a config field)
    else:
        kw.setdefault("n_positions", seqlen)
    kw.setdefault("n_embd", embd)
    kw.setdefault("n_head", head)
    kw.setdefault("n_layer", layer)
    return GPTConfig(**kw)


def gpt3_small(**kw) -> GPTConfig:     # 125M
    return _gpt3(768, 12, 12, **kw)


def gpt3_medium(**kw) -> GPTConfig:    # 355M
    return _gpt3(1024, 16, 24, **kw)


def gpt3_large(**kw) -> GPTConfig:     # 760M
    return _gpt3(1536, 16, 24, **kw)


def gpt3_xl(**kw) -> GPTConfig:        # 1.3B
    return _gpt3(2048, 16, 24, **kw)


def gpt3_2_7b(**kw) -> GPTConfig:      # 2.7B, head_dim 80 (or 128 w/ 20 heads)
    return _gpt3(2560, 32, 32, **kw)


# tiny configs for tests
def backpack_test(**kw) -> BackpackConfig:
    kw.setdefault("vocab_size", 512)
    kw.setdefault("n_positions", 128)
    return BackpackConfig(n_embd=64, n_head=4, n_layer=2, num_senses=4,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8, **kw)


def gpt2_test(**kw) -> GPTConfig:
    kw.setdefault("vocab_size", 512)
    kw.setdefault("n_positions", 128)
    return GPTConfig(n_embd=64, n_head=4, n_layer=2, **kw)


DTYPE_MAP = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}
