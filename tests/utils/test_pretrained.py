"""Pretrained-weight resolution (reference: flash_attn/utils/pretrained.py)."""

import json
import struct

import numpy as np
import pytest
import torch

from backpacks_flash_attn_tpu.utils import pretrained as pt


def _save_torch_sd(path, sd):
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)


def test_resolve_local_file(tmp_path):
    sd = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    p = tmp_path / "ckpt.bin"
    _save_torch_sd(str(p), sd)
    assert pt.resolve_pretrained(str(p)) == str(p)
    out = pt.state_dict_from_pretrained(str(p))
    np.testing.assert_array_equal(out["w"], sd["w"])


def test_resolve_local_dir_picks_weight_file(tmp_path):
    sd = {"a.weight": np.ones((2, 2), np.float32)}
    _save_torch_sd(str(tmp_path / "pytorch_model.bin"), sd)
    out = pt.state_dict_from_pretrained(str(tmp_path))
    np.testing.assert_array_equal(out["a.weight"], sd["a.weight"])


def test_resolve_missing_raises():
    with pytest.raises(FileNotFoundError):
        pt.resolve_pretrained("definitely/not-a-real-model-zzz")


def test_lightning_prefix_unwrap(tmp_path):
    """'model.'-prefixed Lightning state dicts unwrap (torch_import contract)."""
    p = tmp_path / "last.ckpt"
    torch.save({"state_dict": {"model.w": torch.ones(3)}}, str(p))
    out = pt.state_dict_from_pretrained(str(p))
    assert list(out) == ["w"]


def _write_safetensors(path, tensors):
    """Hand-rolled safetensors writer exercising the format spec directly."""
    header = {}
    bufs = []
    off = 0
    for name, arr in tensors.items():
        code = {np.float32: "F32", np.int64: "I64",
                np.uint8: "U8"}[arr.dtype.type]
        b = arr.tobytes()
        header[name] = {"dtype": code, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(b)]}
        bufs.append(b)
        off += len(b)
    hb = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        for b in bufs:
            f.write(b)


def test_safetensors_reader(tmp_path):
    tensors = {"x": np.arange(12, dtype=np.float32).reshape(3, 4),
               "y": np.asarray([1, 2, 3], np.int64),
               "z": np.asarray([7], np.uint8)}
    p = tmp_path / "model.safetensors"
    _write_safetensors(str(p), tensors)
    out = pt._load_safetensors(str(p))
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)


def test_safetensors_via_state_dict_entry(tmp_path):
    _write_safetensors(str(tmp_path / "model.safetensors"),
                       {"w": np.ones((2,), np.float32)})
    out = pt.state_dict_from_pretrained(str(tmp_path))
    np.testing.assert_array_equal(out["w"], np.ones(2, np.float32))
