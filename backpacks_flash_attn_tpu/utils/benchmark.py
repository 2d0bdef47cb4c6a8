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


# HLO container ops whose trace events NEST their children on the same "XLA
# Ops" row (a while.N event spans every op of its body): counting them
# double-counts. Leaf accounting excludes them. hlo_category is the reliable
# signal: Pallas kernels trace as closed_call.N events with category
# "custom-call" and NO children (they must count — 39ms/step of flash-kernel
# time on the r2 train trace), while scan loops are category "while".
_TRACE_CONTAINER_CATS = ("while", "conditional", "call")
_TRACE_CONTAINER_NAMES = ("while", "conditional", "jit_", "body", "cond")


def _is_container(name: str, category: str) -> bool:
    if category:
        return category in _TRACE_CONTAINER_CATS
    base = name.split(".")[0]
    return base in _TRACE_CONTAINER_NAMES or name.startswith("jit_")


def summarize_trace(trace_path: str, top: int = 20,
                    steps: int = 1) -> Optional[Dict]:
    """Digest a jax.profiler Chrome trace into a FULL per-step attribution.

    trace_path: the trace dir passed to profile()/start_trace, or a
    *.trace.json.gz file. Only events on TPU device pids count (host rows
    excluded), and only LEAF ops (scan/cond while/call container events span
    their children and would double-count — measured: a 252ms train step
    traces as 5.4s of raw X events, 213ms of leaves). `steps`: divide
    durations by this (trace captured a scan of N steps). Returns
      {"total_us":      device-busy leaf time per step,
       "module_us":     outermost XLA-module span per step (busy + idle),
       "by_category":   {hlo_category: us}     — XLA's own categories,
       "by_source":     {file:line: us}        — the Python attribution,
       "by_phase":      {"forward"/"backward"/"optimizer": us} from tf_op
                        jvp/transpose markers,
       "top_ops":       [{name, us, count, gb, gbps, category, source}]}
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
    # "XLA Modules" rows hold the whole-executable span (busy + idle gaps);
    # "XLA Ops" rows hold the per-op events; "Steps" rows duplicate the
    # module span under the step number and must not be counted.
    row_names = {(e["pid"], e["tid"]): e.get("args", {}).get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and e["pid"] in device_pids}
    module_tids = {k for k, n in row_names.items() if n == "XLA Modules"}
    op_tids = {k for k, n in row_names.items() if n == "XLA Ops"}
    module_us = 0.0
    durs: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.Counter()
    bytes_acc: Dict[str, float] = collections.defaultdict(float)
    cat_of: Dict[str, str] = {}
    src_of: Dict[str, str] = {}
    by_src: Dict[str, float] = collections.defaultdict(float)
    by_phase: Dict[str, float] = collections.defaultdict(float)
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or "dur" not in e):
            continue
        name = e.get("name", "?")
        row = (e["pid"], e.get("tid"))
        if row in module_tids:
            module_us += e["dur"]
            continue
        if op_tids and row not in op_tids:
            continue
        args = e.get("args", {})
        if _is_container(name, args.get("hlo_category", "")):
            continue
        durs[name] += e["dur"]
        counts[name] += 1
        cat_of.setdefault(name, args.get("hlo_category",
                                         _trace_category(name)))
        src = args.get("source", "?")
        src_of.setdefault(name, src)
        by_src[src] += e["dur"]
        tf_op = args.get("tf_op", "")
        if "transpose(jvp(" in tf_op or "/transpose(" in tf_op:
            by_phase["backward"] += e["dur"]
        elif "jvp(" in tf_op or "/jvp" in tf_op:
            by_phase["forward"] += e["dur"]
        else:
            # outside value_and_grad: optimizer update, rng folds, metrics
            by_phase["other"] += e["dur"]
        ba = args.get("bytes_accessed")
        if ba is not None:
            try:
                bytes_acc[name] += float(ba)
            except (TypeError, ValueError):
                pass

    total = sum(durs.values())
    by_cat: Dict[str, float] = collections.defaultdict(float)
    for name, us in durs.items():
        by_cat[cat_of[name]] += us
    top_ops = []
    for name in sorted(durs, key=durs.get, reverse=True)[:top]:
        us = durs[name] / steps
        gb = bytes_acc.get(name, 0.0) / steps / 1e9
        top_ops.append({
            "name": name, "us": us, "count": counts[name],
            "gb": gb, "gbps": (gb / (us / 1e6)) if us else 0.0,
            "category": cat_of[name], "source": src_of[name],
        })
    strip = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))) + "/"
    return {"total_us": total / steps,
            "module_us": module_us / steps,
            "by_category": {k: v / steps for k, v in sorted(
                by_cat.items(), key=lambda kv: -kv[1])},
            "by_source": {k.replace(strip, ""): v / steps for k, v in sorted(
                by_src.items(), key=lambda kv: -kv[1])},
            "by_phase": {k: v / steps for k, v in sorted(
                by_phase.items(), key=lambda kv: -kv[1])},
            "top_ops": top_ops}


def print_trace_summary(trace_path: str, top: int = 15,
                        steps: int = 1, min_src_us: float = 300.0) -> None:
    s = summarize_trace(trace_path, top=top, steps=steps)
    if s is None:
        print(f"no trace found under {trace_path}")
        return
    busy, mod = s["total_us"], s["module_us"]
    print(f"device busy (leaf ops): {busy:,.0f} us/step; "
          f"module span: {mod:,.0f} us/step"
          + (f"  (idle/gaps {mod - busy:,.0f} us = "
             f"{(mod - busy) / mod:.1%})" if mod > busy else ""))
    print("  -- phase")
    for ph, us in s["by_phase"].items():
        print(f"  {ph:<12} {us:>10,.0f} us  {us / max(busy, 1e-9):>6.1%}")
    print("  -- hlo category")
    for cat, us in s["by_category"].items():
        print(f"  {cat:<24} {us:>10,.0f} us  {us / max(busy, 1e-9):>6.1%}")
    print(f"  -- source line (>= {min_src_us:.0f} us/step)")
    shown = 0.0
    for src, us in s["by_source"].items():
        if us >= min_src_us:
            shown += us
            print(f"  {us:>10,.0f} us  {src}")
    print(f"  (shown {shown:,.0f} us = {shown / max(busy, 1e-9):.1%} of busy)")
    print("  -- top ops")
    for op in s["top_ops"]:
        bw = f"  {op['gbps']:,.0f} GB/s" if op["gb"] else ""
        print(f"    {op['us']:>9,.0f} us x{op['count']:<4} "
              f"[{op['category']}] {op['name'][:50]} "
              f"<{op['source'].split('/')[-1]}>{bw}")


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
