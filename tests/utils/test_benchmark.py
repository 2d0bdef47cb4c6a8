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
