"""Fault-tolerant checkpointing: save/restore the full training state.

Reference semantics reproduced (SURVEY.md §5 'checkpoint / resume'):
  * periodic checkpoints + keep-last-k pruning
    (reference configs/experiment/owt/base.yaml:66-81)
  * an AUTO-SAVE written on any crash (.pl_auto_save.ckpt, reference
    src/callbacks/model_checkpoint.py:8-17) via `auto_save_on_exception`
  * resume prefers the NEWEST of last vs auto-save
    (reference src/train.py:70-93)
  * the data-stream sampler state rides the checkpoint so training resumes at
    the exact batch (reference fault_tolerant_sampler.py:94-121)

Format: one .npz per checkpoint holding every array leaf keyed by its pytree
path, plus a JSON meta blob (step, sampler state, config echo). Pure numpy —
no torch pickles, no framework lock-in; sharded arrays are gathered via
jax.device_get (multi-host full-replica save is the v1 policy; per-shard save
rides the same key scheme with a shard suffix when needed).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "/"
AUTO_SAVE = "auto_save.ckpt.npz"


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + SEP.join(_path_str(p) for p in path)
        out[key] = np.asarray(jax.device_get(leaf))
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_into(treedef_example, flat: Dict[str, np.ndarray]):
    """Rebuild arrays into the structure of `treedef_example` (a pytree of
    arrays used as the shape/dtype template)."""
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(treedef_example)
    leaves = []
    for path, example in paths_and_leaves[0]:
        key = SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(example, "dtype"):
            if arr.dtype.kind == "V":
                # npz stores ml_dtypes extension types (bfloat16, ...) as
                # raw void bytes: reinterpret against the template dtype
                arr = arr.view(np.dtype(example.dtype))
            arr = arr.astype(example.dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def save(ckpt_dir: str, state, *, step: int,
         meta: Optional[Dict[str, Any]] = None,
         name: Optional[str] = None, keep_last: int = 3) -> str:
    """Write state (any pytree of arrays) at `step`; prune to keep_last plus
    `last` semantics via the newest file (reference keeps top-3 + last,
    configs/experiment/owt/base.yaml:66-81)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    fname = name or f"step_{step:08d}.ckpt.npz"
    path = os.path.join(ckpt_dir, fname)
    payload = _flatten(state)
    payload["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on crash
    with open(path + ".json", "w") as f:
        json.dump({"step": step, "time": time.time(), **(meta or {})}, f)
    if name is None:
        _prune(ckpt_dir, keep_last)
    return path


def _prune(ckpt_dir: str, keep_last: int) -> None:
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("step_") and f.endswith(".ckpt.npz"))
    for f in ckpts[:-keep_last] if keep_last > 0 else []:
        os.remove(os.path.join(ckpt_dir, f))
        meta = os.path.join(ckpt_dir, f + ".json")
        if os.path.exists(meta):
            os.remove(meta)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest of periodic checkpoints vs the crash auto-save — mtime decides,
    mirroring src/train.py:70-93."""
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = [os.path.join(ckpt_dir, f) for f in os.listdir(ckpt_dir)
                  if f.endswith(".ckpt.npz")]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


def restore(path: str, state_template) -> Tuple[Any, int, Dict[str, Any]]:
    """Load a checkpoint into the structure of state_template. Returns
    (state, step, meta)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("__step__", np.asarray(0)))
    meta = {}
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return _unflatten_into(state_template, flat), step, meta


class auto_save_on_exception:
    """Context manager: on ANY exception, write an auto-save checkpoint before
    re-raising (reference ModelCheckpointMine.on_exception,
    src/callbacks/model_checkpoint.py:8-17). The state is read lazily via
    `get_state` so it reflects the moment of the crash."""

    def __init__(self, ckpt_dir: str, get_state, get_step,
                 meta: Optional[Dict[str, Any]] = None):
        self.ckpt_dir = ckpt_dir
        self.get_state = get_state
        self.get_step = get_step
        self.meta = meta

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and not issubclass(exc_type, KeyboardInterrupt):
            try:
                save(self.ckpt_dir, self.get_state(),
                     step=int(self.get_step()), meta=self.meta,
                     name=AUTO_SAVE)
            except Exception:
                pass  # never mask the original error
        elif exc_type is not None:
            # the reference auto-saves on KeyboardInterrupt too
            save(self.ckpt_dir, self.get_state(), step=int(self.get_step()),
                 meta=self.meta, name=AUTO_SAVE)
        return False
