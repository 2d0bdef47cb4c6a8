"""BERT, TPU-native.

Re-design of the reference's FlashAttention BERT
(reference: flash_attn/models/bert.py — BertModel :289, BertForPreTraining
:365, heads :169-248, HF key remap :437-530; embeddings
flash_attn/modules/embedding.py:43).

TPU deltas from the reference:
  * the reference unpads to (total_nnz, d) with cu_seqlens to skip pad tokens
    (bert.py:321-336, bert_padding.py); XLA wants static shapes, so padding
    stays and raggedness is a boolean key_padding_mask into attention — the
    pad FLOPs are recovered by the MXU's utilization on the larger GEMMs.
  * dense_seq_output (bert.py:417-426) survives: the MLM head runs only on a
    static-size gather of masked positions (masked counts padded to a fixed
    budget per batch), which is the dominant saving (vocab-sized GEMM).
  * post-norm residual blocks as in BERT; one model definition, no
    fused/unfused variants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import dense, norms
from ..ops.attention import mha
from ..ops.cross_entropy import cross_entropy_loss

Params = Dict[str, Any]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Mirrors the HF BertConfig knobs the reference consumes
    (reference bert.py:52-101)."""
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"          # 'gelu_new'/'gelu_fast' => tanh approx
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    pad_vocab_size_multiple: int = 1
    dense_seq_output: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def padded_vocab_size(self) -> int:
        return _round_up(self.vocab_size, self.pad_vocab_size_multiple)


def bert_test(**kw) -> BertConfig:
    kw.setdefault("vocab_size", 128)
    kw.setdefault("max_position_embeddings", 64)
    return BertConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128, **kw)


# ---------------------------------------------------------------- init

def init_bert(cfg: BertConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    d, std = cfg.hidden_size, cfg.initializer_range
    v = cfg.padded_vocab_size

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "Wqkv": dense.init_linear(k1, d, 3 * d, std=std, dtype=dtype),
            "out_proj": dense.init_linear(k2, d, d, std=std, dtype=dtype),
            "norm1": norms.init_layer_norm(d, dtype),
            "mlp": {
                "fc1": dense.init_linear(k3, d, cfg.intermediate_size,
                                         std=std, dtype=dtype),
                "fc2": dense.init_linear(k4, cfg.intermediate_size, d,
                                         std=std, dtype=dtype),
            },
            "norm2": norms.init_layer_norm(d, dtype),
        }

    layers = [layer(k) for k in jax.random.split(ks[3], cfg.num_hidden_layers)]
    return {
        "embeddings": {
            "word": (jax.random.normal(ks[0], (v, d)) * std).astype(dtype),
            "position": (jax.random.normal(
                ks[1], (cfg.max_position_embeddings, d)) * std).astype(dtype),
            "token_type": (jax.random.normal(
                ks[2], (cfg.type_vocab_size, d)) * std).astype(dtype),
            "ln": norms.init_layer_norm(d, dtype),
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "pooler": dense.init_linear(ks[4], d, d, std=std, dtype=dtype),
        "mlm": {
            "transform": dense.init_linear(ks[5], d, d, std=std, dtype=dtype),
            "ln": norms.init_layer_norm(d, dtype),
            "decoder_bias": jnp.zeros((v,), dtype),
        },
        "nsp": dense.init_linear(ks[6], d, 2, std=std, dtype=dtype),
    }


# ---------------------------------------------------------------- forward

def bert_embed(params: Params, cfg: BertConfig, input_ids: jax.Array,
               token_type_ids: Optional[jax.Array] = None,
               position_ids: Optional[jax.Array] = None, *,
               train: bool = False,
               rng: Optional[jax.Array] = None) -> jax.Array:
    """word + position + token_type, then LN + dropout (reference
    modules/embedding.py:43-85, bert.py:321-331 with prenorm=False)."""
    e = params["embeddings"]
    b, s = input_ids.shape
    hidden = jnp.take(e["word"], input_ids, axis=0)
    if position_ids is None:
        position_ids = jnp.arange(s)[None, :]
    hidden = hidden + jnp.take(e["position"], position_ids, axis=0)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    hidden = hidden + jnp.take(e["token_type"], token_type_ids, axis=0)
    hidden = norms.layer_norm(hidden, e["ln"]["weight"], e["ln"]["bias"],
                              cfg.layer_norm_eps)
    return norms.dropout(hidden, cfg.hidden_dropout_prob, rng,
                         deterministic=not train)


def _bert_block(hidden, layer_params, cfg: BertConfig, *, key_padding_mask,
                train: bool, rngs, use_flash: bool):
    """Post-norm block: h = LN(h + drop(attn)); h = LN(h + drop(mlp))
    (reference Block with prenorm=False, modules/block.py:108-148)."""
    b, s, d = hidden.shape
    r_attn, r_d1, r_d2 = (jax.random.split(rngs, 3) if rngs is not None
                          else (None, None, None))
    qkv = dense.linear(hidden, layer_params["Wqkv"])
    qkv = qkv.reshape(b, s, 3, cfg.num_attention_heads, cfg.head_dim)
    ctx = mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=False,
              key_padding_mask=key_padding_mask,
              dropout_p=cfg.attention_probs_dropout_prob, dropout_rng=r_attn,
              deterministic=not train, use_flash=use_flash)
    attn_out = dense.linear(ctx.reshape(b, s, d), layer_params["out_proj"])
    attn_out = norms.dropout(attn_out, cfg.hidden_dropout_prob, r_d1,
                             deterministic=not train)
    hidden = norms.layer_norm(hidden + attn_out,
                              layer_params["norm1"]["weight"],
                              layer_params["norm1"]["bias"],
                              cfg.layer_norm_eps)
    act = "gelu_new" if cfg.hidden_act in ("gelu_new", "gelu_fast") else "gelu"
    mlp_out = dense.linear(hidden, layer_params["mlp"]["fc1"])
    mlp_out = dense.gelu(mlp_out, approximate=act == "gelu_new")
    mlp_out = dense.linear(mlp_out, layer_params["mlp"]["fc2"])
    mlp_out = norms.dropout(mlp_out, cfg.hidden_dropout_prob, r_d2,
                            deterministic=not train)
    return norms.layer_norm(hidden + mlp_out,
                            layer_params["norm2"]["weight"],
                            layer_params["norm2"]["bias"],
                            cfg.layer_norm_eps)


def bert_forward(params: Params, cfg: BertConfig, input_ids: jax.Array, *,
                 token_type_ids: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 train: bool = False, rng: Optional[jax.Array] = None,
                 use_flash: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """-> (sequence_output (b, s, d), pooled_output (b, d))
    (reference BertModel.forward, bert.py:313-363). attention_mask: (b, s)
    True/1 = real token."""
    kpm = attention_mask.astype(bool) if attention_mask is not None else None
    r_emb, r_layers = (jax.random.split(rng) if rng is not None
                       else (None, None))
    hidden = bert_embed(params, cfg, input_ids, token_type_ids,
                        train=train, rng=r_emb)
    layer_rngs = (jax.random.split(r_layers, cfg.num_hidden_layers)
                  if r_layers is not None else None)

    def scan_body(hidden, xs):
        if layer_rngs is not None:
            layer_params, lrng = xs
        else:
            layer_params, lrng = xs, None
        hidden = _bert_block(hidden, layer_params, cfg,
                             key_padding_mask=kpm, train=train, rngs=lrng,
                             use_flash=use_flash)
        return hidden, None

    xs = ((params["layers"], layer_rngs) if layer_rngs is not None
          else params["layers"])
    hidden, _ = jax.lax.scan(scan_body, hidden, xs)
    pooled = jnp.tanh(dense.linear(hidden[:, 0], params["pooler"]))
    return hidden, pooled


# ---------------------------------------------------------------- heads

def mlm_logits(params: Params, cfg: BertConfig,
               sequence_output: jax.Array) -> jax.Array:
    """transform (dense+act+LN) then decode against the tied word embedding
    (reference BertLMPredictionHead, bert.py:216-234)."""
    h = dense.linear(sequence_output, params["mlm"]["transform"])
    act = "gelu_new" if cfg.hidden_act in ("gelu_new", "gelu_fast") else "gelu"
    h = dense.gelu(h, approximate=act == "gelu_new")
    h = norms.layer_norm(h, params["mlm"]["ln"]["weight"],
                         params["mlm"]["ln"]["bias"], cfg.layer_norm_eps)
    return (jnp.dot(h, params["embeddings"]["word"].T,
                    preferred_element_type=jnp.float32)
            + params["mlm"]["decoder_bias"])


class BertPreTrainingOutput(NamedTuple):
    loss: Optional[jax.Array]
    prediction_logits: jax.Array
    seq_relationship_logits: jax.Array


def bert_for_pretraining(params: Params, cfg: BertConfig,
                         input_ids: jax.Array, *,
                         token_type_ids: Optional[jax.Array] = None,
                         attention_mask: Optional[jax.Array] = None,
                         labels: Optional[jax.Array] = None,
                         next_sentence_label: Optional[jax.Array] = None,
                         train: bool = False,
                         rng: Optional[jax.Array] = None,
                         use_flash: bool = True,
                         masked_budget: Optional[int] = None
                         ) -> BertPreTrainingOutput:
    """MLM + NSP (reference BertForPreTraining.forward, bert.py:395-436).
    labels: (b, s) with -100 on unmasked positions. With
    cfg.dense_seq_output and labels, the MLM head runs on a static gather of
    at most `masked_budget` masked positions per batch (default s//4)."""
    seq_out, pooled = bert_forward(params, cfg, input_ids,
                                   token_type_ids=token_type_ids,
                                   attention_mask=attention_mask,
                                   train=train, rng=rng, use_flash=use_flash)
    nsp_logits = dense.linear(pooled, params["nsp"])

    if cfg.dense_seq_output and labels is not None:
        b, s = labels.shape
        budget = masked_budget or max(s // 4, 1)
        flat_labels = labels.reshape(-1)
        flat_seq = seq_out.reshape(b * s, -1)
        masked = flat_labels != -100
        # static-size gather: indices of masked positions, padded with 0s and
        # a -100 label so padding contributes no loss
        idx = jnp.argsort(~masked)[:budget]
        sel_labels = jnp.where(masked[idx], flat_labels[idx], -100)
        logits = mlm_logits(params, cfg, flat_seq[idx])
        mlm_loss = cross_entropy_loss(logits, sel_labels, ignore_index=-100)
    else:
        logits = mlm_logits(params, cfg, seq_out)
        mlm_loss = (cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1),
            ignore_index=-100) if labels is not None else None)

    loss = None
    if labels is not None:
        loss = mlm_loss
        if next_sentence_label is not None:
            loss = loss + cross_entropy_loss(nsp_logits, next_sentence_label)
    return BertPreTrainingOutput(loss=loss, prediction_logits=logits,
                                 seq_relationship_logits=nsp_logits)


# ---------------------------------------------------------------- HF import

def remap_hf_bert(state_dict, cfg: BertConfig) -> Params:
    """Import a HuggingFace BertForPreTraining state dict (torch tensors or
    numpy) into this layout (the analogue of the reference's remap,
    bert.py:437-530). Kernels transpose (out,in)->(in,out); q/k/v fuse into
    Wqkv; vocab rows pad to padded_vocab_size."""
    import numpy as np

    def A(key):
        t = state_dict[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    v, vp = cfg.vocab_size, cfg.padded_vocab_size

    def pad_vocab(x):
        return np.pad(x, ((0, vp - v),) + ((0, 0),) * (x.ndim - 1))

    def lin(prefix):
        return {"kernel": A(prefix + ".weight").T, "bias": A(prefix + ".bias")}

    def ln(prefix):
        return {"weight": A(prefix + ".weight"), "bias": A(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"bert.encoder.layer.{i}"
        wq = A(f"{p}.attention.self.query.weight")
        wk = A(f"{p}.attention.self.key.weight")
        wv = A(f"{p}.attention.self.value.weight")
        bq = A(f"{p}.attention.self.query.bias")
        bk = A(f"{p}.attention.self.key.bias")
        bv = A(f"{p}.attention.self.value.bias")
        layers.append({
            "Wqkv": {"kernel": np.concatenate([wq, wk, wv], 0).T,
                     "bias": np.concatenate([bq, bk, bv], 0)},
            "out_proj": lin(f"{p}.attention.output.dense"),
            "norm1": ln(f"{p}.attention.output.LayerNorm"),
            "mlp": {"fc1": lin(f"{p}.intermediate.dense"),
                    "fc2": lin(f"{p}.output.dense")},
            "norm2": ln(f"{p}.output.LayerNorm"),
        })
    params = {
        "embeddings": {
            "word": pad_vocab(A("bert.embeddings.word_embeddings.weight")),
            "position": A("bert.embeddings.position_embeddings.weight"),
            "token_type": A("bert.embeddings.token_type_embeddings.weight"),
            "ln": ln("bert.embeddings.LayerNorm"),
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *layers),
        "pooler": lin("bert.pooler.dense"),
        "mlm": {
            "transform": lin("cls.predictions.transform.dense"),
            "ln": ln("cls.predictions.transform.LayerNorm"),
            "decoder_bias": pad_vocab(A("cls.predictions.bias")),
        },
        "nsp": lin("cls.seq_relationship"),
    }
    return jax.tree.map(jnp.asarray, params)
