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
