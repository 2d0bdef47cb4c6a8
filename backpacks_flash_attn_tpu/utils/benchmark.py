"""Microbenchmark kit: timing, profiling, memory.

Reference: flash_attn/utils/benchmark.py:8-146 (benchmark_forward/backward/
combined/all over torch.utils.benchmark, pytorch_profiler, benchmark_memory).

TPU methodology differs and is encoded here so every measurement in this
repo is taken the same way (see also .claude/skills/verify/SKILL.md):
  * the op runs inside a lax.scan so per-call dispatch (30-60ms through a
    tunneled chip) amortizes away; a chained data dependency between
    iterations defeats loop-invariant hoisting
  * the result is fetched with np.asarray — block_until_ready can ACK early
    through remote-TPU tunnels
  * best-of-reps, not mean: tunnel spikes are one-sided noise
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _chain(out, carry):
    """Mix a tiny function of `out` into the carried value so iteration i+1
    depends on iteration i (prevents hoisting) without changing magnitude."""
    leaf = jax.tree.leaves(out)[0]
    return carry + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20


def benchmark_forward(fn: Callable, *args, steps: int = 200, reps: int = 5,
                      **kwargs) -> Tuple[float, Dict[str, float]]:
    """Time fn(*args, **kwargs) per call. Returns (seconds_per_call, info).
    (reference benchmark_forward, utils/benchmark.py:8-35)."""
    def run(carry, *a):
        def body(c, _):
            return _chain(fn(*a, **kwargs), c), None
        return jax.lax.scan(body, carry, None, length=steps)[0]

    g = jax.jit(run)
    c0 = jnp.zeros((), jnp.float32)
    _ = np.asarray(g(c0, *args))   # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(g(c0, *args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / steps
    return per_call, {"ms": per_call * 1e3, "steps": steps, "reps": reps}


def benchmark_backward(fn: Callable, *args, steps: int = 200, reps: int = 5,
                       **kwargs) -> Tuple[float, Dict[str, float]]:
    """Time the VJP of a scalar-ized fn (reference benchmark_backward)."""
    def loss(*a):
        return sum(x.astype(jnp.float32).sum()
                   for x in jax.tree.leaves(fn(*a, **kwargs)))

    grad_fn = jax.grad(loss, argnums=tuple(range(len(args))))
    return benchmark_forward(grad_fn, *args, steps=steps, reps=reps)


def benchmark_combined(fn: Callable, *args, steps: int = 200, reps: int = 5,
                       **kwargs) -> Tuple[float, Dict[str, float]]:
    """Forward + backward together (reference benchmark_combined)."""
    def fwd_bwd(*a):
        def loss(*aa):
            return sum(x.astype(jnp.float32).sum()
                       for x in jax.tree.leaves(fn(*aa, **kwargs)))
        val, grads = jax.value_and_grad(loss, argnums=tuple(range(len(a))))(*a)
        return (val,) + tuple(jax.tree.leaves(grads))

    return benchmark_forward(fwd_bwd, *args, steps=steps, reps=reps)


def benchmark_all(fn: Callable, *args, steps: int = 200, reps: int = 5,
                  **kwargs) -> Dict[str, Dict[str, float]]:
    """fwd, bwd, fwd+bwd (reference benchmark_all)."""
    return {
        "forward": benchmark_forward(fn, *args, steps=steps, reps=reps,
                                     **kwargs)[1],
        "backward": benchmark_backward(fn, *args, steps=steps, reps=reps,
                                       **kwargs)[1],
        "combined": benchmark_combined(fn, *args, steps=steps, reps=reps,
                                       **kwargs)[1],
    }


def profile(fn: Callable, *args, trace_dir: str = "/tmp/jax_trace",
            **kwargs) -> str:
    """Capture an xprof/perfetto trace of one call (the reference's
    pytorch_profiler analogue, utils/benchmark.py:84-120)."""
    out = jax.jit(lambda *a: fn(*a, **kwargs))(*args)  # compile outside trace
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    out = jax.jit(lambda *a: fn(*a, **kwargs))(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return trace_dir


def flops_estimate(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Analytical FLOPs via XLA cost analysis."""
    try:
        cost = jax.jit(lambda *a: fn(*a, **kwargs)).lower(*args).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


_TRACE_CATEGORIES = (
    ("matmul", ("dot", "convolution", "gemm")),
    ("copy/slice", ("copy", "dynamic-update-slice", "dynamic-slice",
                    "slice", "transpose", "concatenate", "pad")),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective-permute", "all-to-all")),
    ("custom-call", ("custom-call", "tpu_custom_call")),  # pallas kernels
    ("fusion", ("fusion", "reduce", "scatter", "gather", "select", "rng")),
)


def _trace_category(name: str) -> str:
    base = name.lower()
    for cat, keys in _TRACE_CATEGORIES:
        if any(k in base for k in keys):
            return cat
    return "other"


def summarize_trace(trace_path: str, top: int = 20,
                    steps: int = 1) -> Optional[Dict]:
    """Digest a jax.profiler Chrome trace into per-op and per-category time.

    trace_path: the trace dir passed to profile()/start_trace, or a
    *.trace.json.gz file. Only events on TPU device pids count (host rows
    excluded). `steps`: divide durations by this (trace captured a scan of
    N steps). Returns
      {"total_us", "by_category": {cat: us}, "top_ops":
       [{"name", "us", "count", "gb", "gbps", "category"}, ...]}
    with gb/gbps from the events' bytes_accessed args when present — the
    roofline numbers NOTES.md cites come from exactly this digest."""
    import collections
    import glob
    import gzip
    import json
    import os

    path = trace_path
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                          recursive=True)
        if not cands:
            return None
        path = max(cands, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    try:
        with opener(path, "rt") as f:
            events = json.load(f)["traceEvents"]
    except Exception:
        return None

    pids = {e["pid"]: e.get("args", {}).get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "/device:" in n}
    if not device_pids:
        # XLA:CPU traces keep one "/host:CPU" row (host + device mixed) —
        # count it so local smoke runs produce a digest; real use is TPU.
        device_pids = {p for p, n in pids.items() if "/host:CPU" in n}
    durs: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.Counter()
    bytes_acc: Dict[str, float] = collections.defaultdict(float)
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or "dur" not in e):
            continue
        name = e.get("name", "?")
        durs[name] += e["dur"]
        counts[name] += 1
        ba = e.get("args", {}).get("bytes_accessed")
        if ba is not None:
            try:
                bytes_acc[name] += float(ba)
            except (TypeError, ValueError):
                pass

    total = sum(durs.values())
    by_cat: Dict[str, float] = collections.defaultdict(float)
    for name, us in durs.items():
        by_cat[_trace_category(name)] += us
    top_ops = []
    for name in sorted(durs, key=durs.get, reverse=True)[:top]:
        us = durs[name] / steps
        gb = bytes_acc.get(name, 0.0) / steps / 1e9
        top_ops.append({
            "name": name, "us": us, "count": counts[name],
            "gb": gb, "gbps": (gb / (us / 1e6)) if us else 0.0,
            "category": _trace_category(name),
        })
    return {"total_us": total / steps,
            "by_category": {k: v / steps for k, v in sorted(
                by_cat.items(), key=lambda kv: -kv[1])},
            "top_ops": top_ops}


def print_trace_summary(trace_path: str, top: int = 15,
                        steps: int = 1) -> None:
    s = summarize_trace(trace_path, top=top, steps=steps)
    if s is None:
        print(f"no trace found under {trace_path}")
        return
    print(f"device total: {s['total_us']:,.0f} us/step")
    for cat, us in s["by_category"].items():
        print(f"  {cat:<12} {us:>10,.0f} us  {us / max(s['total_us'], 1e-9):>6.1%}")
    for op in s["top_ops"]:
        bw = f"  {op['gbps']:,.0f} GB/s" if op["gb"] else ""
        print(f"    {op['us']:>9,.0f} us x{op['count']:<4} "
              f"[{op['category']}] {op['name'][:70]}{bw}")


def memory_footprint(fn: Callable, *args, **kwargs) -> Optional[Dict[str, float]]:
    """Peak/total device memory of the compiled program in MB (the
    reference's benchmark_memory reads torch.cuda.max_memory_allocated;
    XLA exposes the compiled-program analysis instead)."""
    try:
        compiled = jax.jit(lambda *a: fn(*a, **kwargs)).lower(*args).compile()
        ma = compiled.memory_analysis()
        return {
            "temp_mb": ma.temp_size_in_bytes / 2**20,
            "argument_mb": ma.argument_size_in_bytes / 2**20,
            "output_mb": ma.output_size_in_bytes / 2**20,
            "peak_mb": (ma.temp_size_in_bytes + ma.argument_size_in_bytes)
            / 2**20,
        }
    except Exception:
        return None
