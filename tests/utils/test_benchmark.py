"""Benchmark-kit smoke tests (reference: flash_attn/utils/benchmark.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.utils import benchmark as bm


def _matmul(x, w):
    return x @ w


def test_benchmark_forward_backward_combined():
    x = jnp.ones((64, 64))
    w = jnp.ones((64, 64))
    res = bm.benchmark_all(_matmul, x, w, steps=5, reps=2)
    for k in ("forward", "backward", "combined"):
        assert res[k]["ms"] > 0


def test_flops_estimate():
    f = bm.flops_estimate(_matmul, jnp.ones((128, 128)), jnp.ones((128, 128)))
    if f is not None:
        assert f >= 2 * 128 ** 3 * 0.9


def test_memory_footprint():
    m = bm.memory_footprint(_matmul, jnp.ones((256, 256)), jnp.ones((256, 256)))
    if m is not None:
        assert m["argument_mb"] > 0


def test_profile_writes_trace(tmp_path):
    d = bm.profile(_matmul, jnp.ones((32, 32)), jnp.ones((32, 32)),
                   trace_dir=str(tmp_path))
    found = []
    for root, _, files in os.walk(d):
        found += [f for f in files if "xplane" in f or "trace" in f]
    assert found, "no trace files written"


def _write_trace(path, events):
    import gzip
    import json
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_summarize_trace_digest(tmp_path):
    """Synthetic Chrome trace: device pids counted, host excluded, categories
    and bytes_accessed -> GB/s math correct."""
    ev = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        # two fused matmuls, 100us each, 80MB each -> 800 GB/s
        {"ph": "X", "pid": 1, "dur": 100, "name": "fusion.dot.1",
         "args": {"bytes_accessed": 80e6}},
        {"ph": "X", "pid": 1, "dur": 100, "name": "fusion.dot.1",
         "args": {"bytes_accessed": 80e6}},
        {"ph": "X", "pid": 1, "dur": 50, "name": "dynamic-update-slice.7"},
        {"ph": "X", "pid": 1, "dur": 30, "name": "all-reduce.2"},
        {"ph": "X", "pid": 2, "dur": 9999, "name": "host-callback"},  # excl.
    ]
    p = tmp_path / "vm.trace.json.gz"
    _write_trace(str(p), ev)
    s = bm.summarize_trace(str(p))
    assert s["total_us"] == 280
    assert s["by_category"]["matmul"] == 200
    assert s["by_category"]["copy/slice"] == 50
    assert s["by_category"]["collective"] == 30
    top = s["top_ops"][0]
    assert top["name"] == "fusion.dot.1" and top["count"] == 2
    assert top["gbps"] == np.float64(160e6 / 1e9) / (200 / 1e6)


def test_summarize_trace_steps_normalization_and_dir(tmp_path):
    ev = [{"ph": "M", "name": "process_name", "pid": 1,
           "args": {"name": "TPU:0 xla"}},
          {"ph": "X", "pid": 1, "dur": 400, "name": "fusion.1"}]
    sub = tmp_path / "plugins" / "profile" / "run1"
    sub.mkdir(parents=True)
    _write_trace(str(sub / "vm.trace.json.gz"), ev)
    s = bm.summarize_trace(str(tmp_path), steps=4)   # dir lookup + divide
    assert s["total_us"] == 100
    assert bm.summarize_trace(str(tmp_path / "empty-nonexistent")) is None


def test_print_trace_summary_smoke(tmp_path, capsys):
    ev = [{"ph": "M", "name": "process_name", "pid": 1,
           "args": {"name": "/device:TPU:0"}},
          {"ph": "X", "pid": 1, "dur": 10, "name": "copy.1"}]
    _write_trace(str(tmp_path / "t.trace.json.gz"), ev)
    bm.print_trace_summary(str(tmp_path / "t.trace.json.gz"))
    out = capsys.readouterr().out
    assert "copy/slice" in out and "10 us" in out
