"""Pretrained-checkpoint resolution: local paths, local caches, and the HF hub.

Reference: flash_attn/utils/pretrained.py:7-8 (`state_dict_from_pretrained`
= `torch.load(cached_file(model_name, WEIGHTS_NAME))`), used by the model
families' `from_pretrained` constructors (models/gpt.py:149, bert.py:283).

Here resolution is layered so the same call works offline (this environment
has no egress) and online:
  1. an existing filesystem path is used as-is
  2. the local HF cache (~/.cache/huggingface) is consulted WITHOUT network
  3. only then a hub download is attempted; failures raise a clear error

The resolved file feeds utils/torch_import.py's remap machinery
(`load_torch_checkpoint` reads both torch .bin/.ckpt zips and raw state
dicts), e.g.:

    sd = state_dict_from_pretrained("gpt2")
    params = gpt_params_from_hf_gpt2(sd, cfg)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

WEIGHT_CANDIDATES = ("pytorch_model.bin", "model.safetensors")


def resolve_pretrained(model_name: str,
                       filename: Optional[str] = None) -> str:
    """Return a local file path for `model_name`'s weights (see module doc
    for the resolution order). Raises FileNotFoundError when unreachable."""
    if os.path.exists(model_name):
        if os.path.isdir(model_name):
            for cand in ([filename] if filename else WEIGHT_CANDIDATES):
                p = os.path.join(model_name, cand)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(
                f"no weight file in {model_name!r} (tried "
                f"{filename or WEIGHT_CANDIDATES})")
        return model_name

    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:          # pragma: no cover - hub always baked in
        raise FileNotFoundError(
            f"{model_name!r} is not a local path and huggingface_hub is "
            f"unavailable") from e

    candidates = [filename] if filename else list(WEIGHT_CANDIDATES)
    errors = []
    for local_only in (True, False):  # cache first: no egress needed offline
        for cand in candidates:
            try:
                return hf_hub_download(model_name, cand,
                                       local_files_only=local_only)
            except Exception as e:    # cache miss / no network / no file
                errors.append(f"{cand} (local_only={local_only}): {e}")
    raise FileNotFoundError(
        f"could not resolve pretrained weights for {model_name!r}:\n  "
        + "\n  ".join(str(e)[:200] for e in errors))


def state_dict_from_pretrained(model_name: str,
                               filename: Optional[str] = None
                               ) -> Dict[str, np.ndarray]:
    """Weights for `model_name` as a flat numpy state dict (the reference's
    state_dict_from_pretrained, utils/pretrained.py:7-8)."""
    path = resolve_pretrained(model_name, filename)
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    from .torch_import import load_torch_checkpoint
    return load_torch_checkpoint(path)


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header json + raw buffers); avoids a hard
    dependency on the safetensors package."""
    try:
        from safetensors.numpy import load_file
        return dict(load_file(path))
    except ImportError:
        pass
    import json
    import struct

    DTYPES = {"F64": np.float64, "F32": np.float32, "F16": np.float16,
              "I64": np.int64, "I32": np.int32, "I16": np.int16,
              "I8": np.int8, "U8": np.uint8, "BOOL": np.bool_}
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(n))
        base = f.tell()
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            if meta["dtype"] == "BF16":
                import ml_dtypes
                dt = ml_dtypes.bfloat16
            elif meta["dtype"] in DTYPES:
                dt = DTYPES[meta["dtype"]]
            else:
                raise ValueError(f"unsupported dtype {meta['dtype']}")
            start, end = meta["data_offsets"]
            f.seek(base + start)
            buf = f.read(end - start)
            arr = np.frombuffer(buf, dtype=dt).reshape(meta["shape"])
            out[name] = np.asarray(arr, np.float32) if meta["dtype"] == "BF16" \
                else arr
    return out
