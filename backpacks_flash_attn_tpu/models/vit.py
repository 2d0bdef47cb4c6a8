"""Vision Transformer, TPU-native.

Re-design of the reference's FlashAttention ViT
(reference: flash_attn/models/vit.py:56-267 — timm-style VisionTransformer
with CLS-token pooling, prenorm blocks, PatchEmbed from
flash_attn/layers/patch_embed.py).

TPU deltas:
  * the patch embedding is expressed as reshape + one big GEMM instead of a
    conv (stride == kernel makes them identical); XLA maps it straight onto
    the MXU
  * prenorm in the standard form h += f(LN(h)) — equivalent to the
    reference's reordered (hidden, residual) carry at inference (the reorder
    exists only to fuse dropout+add+LN, gpt.py:197-206)
  * one model definition; flash vs reference attention is an argument
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import dense, norms
from ..ops.attention import mha

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-6
    num_classes: int = 1000
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def vit_test(**kw) -> ViTConfig:
    return ViTConfig(image_size=16, patch_size=4, hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, num_classes=10, **kw)


# ---------------------------------------------------------------- init

def init_vit(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    d, std = cfg.hidden_size, cfg.initializer_range
    pdim = cfg.num_channels * cfg.patch_size ** 2

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "norm1": norms.init_layer_norm(d, dtype),
            "Wqkv": dense.init_linear(k1, d, 3 * d, std=std, dtype=dtype),
            "out_proj": dense.init_linear(k2, d, d, std=std, dtype=dtype),
            "norm2": norms.init_layer_norm(d, dtype),
            "mlp": {
                "fc1": dense.init_linear(k3, d, cfg.intermediate_size,
                                         std=std, dtype=dtype),
                "fc2": dense.init_linear(k4, cfg.intermediate_size, d,
                                         std=std, dtype=dtype),
            },
        }

    layers = [layer(k) for k in
              jax.random.split(ks[2], cfg.num_hidden_layers)]
    return {
        "patch_embed": dense.init_linear(ks[0], pdim, d, std=std, dtype=dtype),
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "pos_embed": (jax.random.normal(ks[1], (1, cfg.num_patches + 1, d))
                      * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": norms.init_layer_norm(d, dtype),
        "head": dense.init_linear(ks[3], d, cfg.num_classes, std=std,
                                  dtype=dtype),
    }


# ---------------------------------------------------------------- forward

def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(b, c, H, W) -> (b, n_patches, c*p*p), flattened in (c, ph, pw) order —
    the layout of a torch conv kernel, so HF conv weights import as a plain
    reshape (reference layers/patch_embed.py expresses the same conv as
    an nn.Linear when fused_bias_fc)."""
    b, c, H, W = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)           # (b, gh, gw, c, p, p)
    return x.reshape(b, gh * gw, c * patch * patch)


def vit_features(params: Params, cfg: ViTConfig, images: jax.Array, *,
                 train: bool = False, rng: Optional[jax.Array] = None,
                 use_flash: bool = True) -> jax.Array:
    """-> (b, 1 + n_patches, d) post-final-LN token features
    (reference vit.py:forward_features)."""
    b = images.shape[0]
    x = dense.linear(patchify(images, cfg.patch_size), params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(x.dtype)
    rngs = (jax.random.split(rng, cfg.num_hidden_layers)
            if rng is not None else None)

    def block(x, xs):
        lp, lrng = xs if rngs is not None else (xs, None)
        r_attn, r_d1, r_d2 = (jax.random.split(lrng, 3) if lrng is not None
                              else (None, None, None))
        h = norms.layer_norm(x, lp["norm1"]["weight"], lp["norm1"]["bias"],
                             cfg.layer_norm_eps)
        s = h.shape[1]
        qkv = dense.linear(h, lp["Wqkv"]).reshape(
            b, s, 3, cfg.num_attention_heads, cfg.head_dim)
        ctx = mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=False,
                  dropout_p=cfg.attn_drop_rate, dropout_rng=r_attn,
                  deterministic=not train, use_flash=use_flash)
        attn_out = dense.linear(ctx.reshape(b, s, cfg.hidden_size),
                                lp["out_proj"])
        x = x + norms.dropout(attn_out, cfg.drop_rate, r_d1,
                              deterministic=not train)
        h = norms.layer_norm(x, lp["norm2"]["weight"], lp["norm2"]["bias"],
                             cfg.layer_norm_eps)
        mlp_out = dense.linear(h, lp["mlp"]["fc1"])
        mlp_out = dense.gelu(mlp_out,
                             approximate=cfg.hidden_act == "gelu_new")
        mlp_out = dense.linear(mlp_out, lp["mlp"]["fc2"])
        x = x + norms.dropout(mlp_out, cfg.drop_rate, r_d2,
                              deterministic=not train)
        return x, None

    xs = (params["layers"], rngs) if rngs is not None else params["layers"]
    x, _ = jax.lax.scan(block, x, xs)
    return norms.layer_norm(x, params["norm"]["weight"],
                            params["norm"]["bias"], cfg.layer_norm_eps)


def vit_forward(params: Params, cfg: ViTConfig, images: jax.Array,
                **kw) -> jax.Array:
    """-> (b, num_classes) logits via CLS-token pooling
    (reference vit.py:forward_head, global_pool='token')."""
    feats = vit_features(params, cfg, images, **kw)
    return dense.linear(feats[:, 0], params["head"])


# ---------------------------------------------------------------- HF import

def remap_hf_vit(state_dict, cfg: ViTConfig,
                 head_prefix: str = "classifier") -> Params:
    """Import a HuggingFace ViTForImageClassification state dict (reference
    pattern: vit.py has no HF remap — timm interop only; HF is the offline
    oracle here)."""
    import numpy as np

    def A(key):
        t = state_dict[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    def lin(prefix):
        return {"kernel": A(prefix + ".weight").T, "bias": A(prefix + ".bias")}

    def ln(prefix):
        return {"weight": A(prefix + ".weight"), "bias": A(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"vit.encoder.layer.{i}"
        wq, wk, wv = (A(f"{p}.attention.attention.{n}.weight")
                      for n in ("query", "key", "value"))
        bq, bk, bv = (A(f"{p}.attention.attention.{n}.bias")
                      for n in ("query", "key", "value"))
        layers.append({
            "norm1": ln(f"{p}.layernorm_before"),
            "Wqkv": {"kernel": np.concatenate([wq, wk, wv], 0).T,
                     "bias": np.concatenate([bq, bk, bv], 0)},
            "out_proj": lin(f"{p}.attention.output.dense"),
            "norm2": ln(f"{p}.layernorm_after"),
            "mlp": {"fc1": lin(f"{p}.intermediate.dense"),
                    "fc2": lin(f"{p}.output.dense")},
        })
    conv_w = A("vit.embeddings.patch_embeddings.projection.weight")  # (d,c,p,p)
    params = {
        "patch_embed": {
            "kernel": conv_w.reshape(conv_w.shape[0], -1).T,
            "bias": A("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": A("vit.embeddings.cls_token"),
        "pos_embed": A("vit.embeddings.position_embeddings"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *layers),
        "norm": ln("vit.layernorm"),
        "head": lin(head_prefix),
    }
    return jax.tree.map(jnp.asarray, params)
