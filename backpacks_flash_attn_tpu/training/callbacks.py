"""Observability callbacks: speed, norms, causality, FLOPs.

Reference: training/src/callbacks/ (791 LoC — SpeedMonitor, NormMonitor,
FlopCount, CausalityMonitor, ParamsLog, LossScaleMonitor). Loss-scale
monitoring has no TPU analogue (bf16 training needs no AMP scaler); the rest
are reproduced as plain objects the training loop calls — no Lightning hook
registry.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SpeedMonitor:
    """Intra/inter-step times and tokens/s (reference
    src/callbacks/speed_monitor.py:13-95)."""

    def __init__(self) -> None:
        self._step_start: Optional[float] = None
        self._last_end: Optional[float] = None

    def on_step_start(self) -> Dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._last_end is not None:
            out["time/inter_step_ms"] = (now - self._last_end) * 1e3
        self._step_start = now
        return out

    def on_step_end(self, tokens_in_batch: Optional[int] = None
                    ) -> Dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._step_start is not None:
            dt = now - self._step_start
            out["time/intra_step_ms"] = dt * 1e3
            if tokens_in_batch:
                out["throughput/tokens_per_s"] = tokens_in_batch / dt
        self._last_end = now
        return out


def norm_stats(tree, prefix: str) -> Dict[str, float]:
    """Per-leaf L2 norms + a global norm (reference NormMonitor logs
    per-param |w|/|grad| on logged steps, src/callbacks/norm_monitor.py:22-79)."""
    out = {}
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            continue
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        n = float(jnp.linalg.norm(jnp.asarray(leaf).astype(jnp.float32)))
        out[f"{prefix}/{key}"] = n
        total += n * n
    out[f"{prefix}/total"] = total ** 0.5
    return out


def causality_check(forward_fn: Callable[[jax.Array], jax.Array],
                    input_ids: jax.Array, probe_pos: int) -> float:
    """Max |d loss(outputs at t < probe_pos) / d embedding-path inputs at
    probe_pos| surrogate: perturb the token at probe_pos and measure the max
    change of logits strictly before it. Exactly zero for a causal model
    (reference CausalityMonitor checks d y_k / d u_s == 0 for k < s via
    autograd, src/callbacks/causality_monitor.py:8-59; token-substitution is
    the discrete equivalent and needs no embedding hooks)."""
    base = forward_fn(input_ids)
    bumped = input_ids.at[:, probe_pos].set(
        (input_ids[:, probe_pos] + 1) % 2)
    alt = forward_fn(bumped)
    return float(jnp.max(jnp.abs(base[:, :probe_pos] - alt[:, :probe_pos])))


def flop_count(fn: Callable, *args) -> Optional[float]:
    """Analytical FLOPs of the jitted fn via XLA cost analysis (reference
    FlopCount wraps fvcore/deepspeed profilers, src/callbacks/
    flop_count.py:14-43; XLA gives the number exactly)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


class MetricsLogger:
    """CSV/JSONL metrics sink — the wandb-or-CSV logging capability
    (reference configs/logger/*.yaml; wandb needs egress, so the file sink is
    the default and wandb can be layered on top by the user)."""

    def __init__(self, path: Optional[str] = None, print_every: int = 0):
        self.path = path
        self.print_every = print_every
        self._fh = open(path, "a") if path else None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step}
        rec.update({k: (float(v) if hasattr(v, "dtype") or
                        isinstance(v, (int, float, np.floating)) else v)
                    for k, v in metrics.items()})
        if self._fh:
            import json
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            brief = " ".join(f"{k}={v:.4g}" for k, v in rec.items()
                             if isinstance(v, float))
            print(f"[step {step}] {brief}")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
