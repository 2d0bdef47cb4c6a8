"""Checkpoint import: reference (PyTorch/Lightning) state dicts -> native params.

The released Backpack checkpoints are PyTorch-Lightning `.ckpt` pickles with the
model under a `model.` prefix (reference: training/src/eval.py:28-44); module
names follow the reference's optimized layout (transformer.layers.N.mixer.Wqkv
etc. — training/src/models/backpack.py:354-409 documents the mapping from HF
GPT-2 keys into that layout). This module maps that layout into this package's
param pytrees:

  * torch nn.Linear stores (out, in); our kernels are (in, out) -> transpose.
  * per-layer tensors are stacked on a leading n_layer axis (scan layout).
  * word embeddings are padded to cfg.padded_vocab_size (reference
    gpt.py:182-185) and lm_head stays weight-tied.

Loading the torch pickle uses `torch.load` when torch is importable (CPU-only
torch is sufficient); tensors are converted to numpy immediately.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import BackpackConfig, GPTConfig

Params = Dict[str, Any]


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().float().numpy()
    return np.asarray(x)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch pickle (.ckpt/.pt); returns a flat {key: np.ndarray} dict.
    Lightning checkpoints ('state_dict' with 'model.' prefixes) are unwrapped."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = _to_np(v)
    return out


def _linear(sd: Mapping[str, np.ndarray], prefix: str, dtype) -> dict:
    p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T, dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"], dtype)
    return p


def _norm(sd: Mapping[str, np.ndarray], prefix: str, dtype) -> dict:
    return {"weight": jnp.asarray(sd[prefix + ".weight"], dtype),
            "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}


def _mlp(sd, prefix, dtype) -> dict:
    return {"fc1": _linear(sd, prefix + ".fc1", dtype),
            "fc2": _linear(sd, prefix + ".fc2", dtype)}


def _stack(dicts):
    return jnp.stack(dicts) if not isinstance(dicts[0], dict) else {
        k: _stack([d[k] for d in dicts]) for k in dicts[0]}


def _pad_vocab(wte: np.ndarray, cfg: GPTConfig) -> np.ndarray:
    v = cfg.padded_vocab_size
    if wte.shape[0] < v:
        wte = np.pad(wte, ((0, v - wte.shape[0]), (0, 0)))
    return wte[:v]


def gpt_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg: GPTConfig,
                               prefix: str = "transformer.",
                               dtype=jnp.float32) -> Params:
    """Import a reference GPTModel/GPTLMHeadModel state dict
    (layout per flash_attn/models/gpt.py:285-340 after remap)."""
    params: Params = {
        "wte": jnp.asarray(
            _pad_vocab(sd[prefix + "embeddings.word_embeddings.weight"], cfg),
            dtype),
        "ln_0": _norm(sd, prefix + "ln_0", dtype),
    }
    if cfg.n_positions > 0:
        params["wpe"] = jnp.asarray(
            sd[prefix + "embeddings.position_embeddings.weight"], dtype)
    layers = []
    for i in range(cfg.n_layer):
        lp = f"{prefix}layers.{i}."
        layers.append({
            "Wqkv": _linear(sd, lp + "mixer.Wqkv", dtype),
            "out_proj": _linear(sd, lp + "mixer.out_proj", dtype),
            "norm1": _norm(sd, lp + "norm1", dtype),
            "mlp": _mlp(sd, lp + "mlp", dtype),
            "norm2": _norm(sd, lp + "norm2", dtype),
        })
    params["layers"] = _stack(layers)
    return params


def backpack_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                    cfg: BackpackConfig,
                                    dtype=jnp.float32) -> Params:
    """Import a reference BackpackLMHeadModel state dict
    (module layout per training/src/models/backpack.py:278-340)."""
    gpt = gpt_params_from_state_dict(sd, cfg, "transformer.gpt2_model.", dtype)
    cp = "transformer.content_model."
    blocks = []
    for i in range(cfg.content_n_layer):
        bp = f"{cp}layers.{i}."
        blocks.append({
            "norm1": _norm(sd, bp + "norm1", dtype),
            "mlp": _mlp(sd, bp + "mlp", dtype),
            "norm2": _norm(sd, bp + "norm2", dtype),
        })
    return {
        "gpt": gpt,
        "ctx_attn": {
            "Wqkv": _linear(sd, "transformer.contextualization_attn.Wqkv",
                            dtype)},
        "content": {
            "ln_0": _norm(sd, cp + "ln_0", dtype),
            "blocks": _stack(blocks),
            "final_mlp": _mlp(sd, cp + "final_mlp", dtype),
        },
    }


def load_backpack_checkpoint(path: str, cfg: BackpackConfig,
                             dtype=jnp.float32) -> Params:
    return backpack_params_from_state_dict(load_torch_checkpoint(path), cfg,
                                           dtype)


def load_gpt_checkpoint(path: str, cfg: GPTConfig, dtype=jnp.float32) -> Params:
    return gpt_params_from_state_dict(load_torch_checkpoint(path), cfg,
                                      dtype=dtype)


# ---------------------------------------------------------------- HF GPT-2

def gpt_params_from_hf_gpt2(sd: Mapping[str, np.ndarray], cfg: GPTConfig,
                            dtype=jnp.float32) -> Params:
    """Import a raw HuggingFace GPT-2 state dict (wte/wpe/h.N.* layout) — the
    native re-implementation of remap_state_dict_gpt2
    (reference: flash_attn/models/gpt.py:285-340) including the shifted-LN
    mapping for the reordered prenorm residual."""
    params: Params = {
        "wte": jnp.asarray(_pad_vocab(_to_np(sd["wte.weight"]), cfg), dtype),
        "wpe": jnp.asarray(_to_np(sd["wpe.weight"]), dtype),
        # first block's ln_1 becomes the model-level ln_0
        "ln_0": {"weight": jnp.asarray(_to_np(sd["h.0.ln_1.weight"]), dtype),
                 "bias": jnp.asarray(_to_np(sd["h.0.ln_1.bias"]), dtype)},
    }
    layers = []
    n = cfg.n_layer
    for i in range(n):
        # norm1_i <- ln_2 of block i; norm2_i <- ln_1 of block i+1 (ln_f for last)
        n2w, n2b = ((f"h.{i + 1}.ln_1.weight", f"h.{i + 1}.ln_1.bias")
                    if i < n - 1 else ("ln_f.weight", "ln_f.bias"))
        layers.append({
            # HF Conv1D stores (in, out) already — no transpose.
            "Wqkv": {"kernel": jnp.asarray(_to_np(sd[f"h.{i}.attn.c_attn.weight"]), dtype),
                     "bias": jnp.asarray(_to_np(sd[f"h.{i}.attn.c_attn.bias"]), dtype)},
            "out_proj": {"kernel": jnp.asarray(_to_np(sd[f"h.{i}.attn.c_proj.weight"]), dtype),
                         "bias": jnp.asarray(_to_np(sd[f"h.{i}.attn.c_proj.bias"]), dtype)},
            "norm1": {"weight": jnp.asarray(_to_np(sd[f"h.{i}.ln_2.weight"]), dtype),
                      "bias": jnp.asarray(_to_np(sd[f"h.{i}.ln_2.bias"]), dtype)},
            "mlp": {"fc1": {"kernel": jnp.asarray(_to_np(sd[f"h.{i}.mlp.c_fc.weight"]), dtype),
                            "bias": jnp.asarray(_to_np(sd[f"h.{i}.mlp.c_fc.bias"]), dtype)},
                    "fc2": {"kernel": jnp.asarray(_to_np(sd[f"h.{i}.mlp.c_proj.weight"]), dtype),
                            "bias": jnp.asarray(_to_np(sd[f"h.{i}.mlp.c_proj.bias"]), dtype)}},
            "norm2": {"weight": jnp.asarray(_to_np(sd[n2w]), dtype),
                      "bias": jnp.asarray(_to_np(sd[n2b]), dtype)},
        })
    params["layers"] = _stack(layers)
    return params


# ---------------------------------------------------------------- export

def state_dict_from_backpack_params(params: Params,
                                    cfg: BackpackConfig) -> Dict[str, np.ndarray]:
    """Inverse mapping: native params -> reference-layout state dict, for
    round-trip tests and exporting back to the torch ecosystem."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["kernel"], np.float32).T
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)

    def put_norm(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["weight"], np.float32)
        sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)

    g = params["gpt"]
    gp = "transformer.gpt2_model."
    sd[gp + "embeddings.word_embeddings.weight"] = np.asarray(g["wte"], np.float32)
    if "wpe" in g:
        sd[gp + "embeddings.position_embeddings.weight"] = np.asarray(
            g["wpe"], np.float32)
    put_norm(gp + "ln_0", g["ln_0"])
    import jax

    for i in range(cfg.n_layer):
        layer = {k: jax.tree_util.tree_map(lambda x: x[i], v)
                 for k, v in g["layers"].items()}
        lp = f"{gp}layers.{i}."
        put_linear(lp + "mixer.Wqkv", layer["Wqkv"])
        put_linear(lp + "mixer.out_proj", layer["out_proj"])
        put_norm(lp + "norm1", layer["norm1"])
        put_linear(lp + "mlp.fc1", layer["mlp"]["fc1"])
        put_linear(lp + "mlp.fc2", layer["mlp"]["fc2"])
        put_norm(lp + "norm2", layer["norm2"])
    put_linear("transformer.contextualization_attn.Wqkv",
               params["ctx_attn"]["Wqkv"])
    cpfx = "transformer.content_model."
    put_norm(cpfx + "ln_0", params["content"]["ln_0"])
    for i in range(cfg.content_n_layer):
        blk = jax.tree_util.tree_map(lambda x: x[i], params["content"]["blocks"])
        bp = f"{cpfx}layers.{i}."
        put_norm(bp + "norm1", blk["norm1"])
        put_linear(bp + "mlp.fc1", blk["mlp"]["fc1"])
        put_linear(bp + "mlp.fc2", blk["mlp"]["fc2"])
        put_norm(bp + "norm2", blk["norm2"])
    put_linear(cpfx + "final_mlp.fc1", params["content"]["final_mlp"]["fc1"])
    put_linear(cpfx + "final_mlp.fc2", params["content"]["final_mlp"]["fc2"])
    sd["lm_head.weight"] = sd[gp + "embeddings.word_embeddings.weight"]
    sd["transformer.embeddings.word_embeddings.weight"] = sd[
        gp + "embeddings.word_embeddings.weight"]
    return sd
