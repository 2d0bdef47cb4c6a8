"""Isolated flash-attention kernel timings at the training shape.

The r3 train profile attributes ~52 ms of a ~225 ms step (batch 32) to the
flash kernels + their surrounding transposes, yet the causal attention math
at (b=32, h=12, s=512, d=64) is ~0.5 TFLOP fwd+bwd — ~3 ms at peak, maybe
10-15 ms at the 50% MXU utilization d=64 dots allow. This bench isolates
where the rest goes: fwd vs bwd, block sizes, fused vs split backward,
attention dropout, and the swapaxes transposes around the kernel.

    timeout 4800 python bench_flash.py [--json bench_results/flash_r4.json]

Prints ms per call and effective TFLOP/s per variant.
"""

import argparse
import functools
import json
import math
import os
import sys

if os.path.exists("/tmp/SKIP_TRAIN_BENCH"):
    print("SKIP_TRAIN_BENCH sentinel present — skipping", file=sys.stderr)
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.ops import flash_attention as fa
from backpacks_flash_attn_tpu.utils import benchmark as bm

B, S, H, D = 32, 512, 12, 64
if "--smoke" in sys.argv:   # CPU correctness/parse check (interpret mode)
    B, S, H, D = 1, 256, 2, 64


def make_inputs(key):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    g = jax.random.normal(ks[3], (B, S, H, D), jnp.bfloat16)
    rng = jax.random.PRNGKey(7)
    return q, k, v, g, rng


def flops(causal_frac=0.5):
    # qk + pv MACs, causal-halved; FLOPs = 2 * MACs
    full = B * H * S * S * D
    fwd = 2 * 2 * full * causal_frac
    bwd = 5 * 2 * full * causal_frac          # 5 dots in the backward
    return fwd, bwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    if args.smoke:
        args.steps, args.reps = 2, 1

    q, k, v, g, rng = make_inputs(jax.random.PRNGKey(0))
    fwd_fl, bwd_fl = flops()
    results = {}

    def attn(q, k, v, rng, *, bq, bk, p):
        return fa.flash_attention(q, k, v, causal=True, dropout_p=p,
                                  dropout_rng=rng if p > 0 else None,
                                  block_q=bq, block_k=bk)

    def fwd_bwd(q, k, v, g, rng, *, bq, bk, p):
        def loss(q, k, v):
            out = attn(q, k, v, rng, bq=bq, bk=bk, p=p)
            return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return grads

    variants = []
    for bq, bk in [(256, 256), (512, 256), (256, 512), (512, 512)]:
        variants.append((f"b{bq}x{bk}", bq, bk, 0.0))
    variants.append(("b256x256:drop0.1", 256, 256, 0.1))

    for fused in (True, False):
        fa._FUSED_BWD = fused
        tag_b = "fused" if fused else "split"
        for name, bq, bk, p in variants:
            if not fused and (bq, bk) != (256, 256):
                continue   # split backward: only the default block config
            # forward only (fused flag irrelevant; do it once)
            if fused:
                sec, _ = bm.benchmark_forward(
                    functools.partial(attn, bq=bq, bk=bk, p=p),
                    q, k, v, rng, steps=args.steps, reps=args.reps)
                ms = sec * 1e3
                results[f"fwd:{name}"] = {
                    "ms": ms, "tflops": fwd_fl / sec / 1e12}
                print(f"fwd  {name:16s} {ms:7.3f} ms  "
                      f"{fwd_fl / sec / 1e12:6.1f} TFLOP/s", flush=True)
            sec, _ = bm.benchmark_forward(
                functools.partial(fwd_bwd, bq=bq, bk=bk, p=p),
                q, k, v, g, rng, steps=args.steps, reps=args.reps)
            ms = sec * 1e3
            results[f"fwdbwd:{tag_b}:{name}"] = {
                "ms": ms, "tflops": (fwd_fl + bwd_fl) / sec / 1e12}
            print(f"f+b  {tag_b}:{name:16s} {ms:7.3f} ms  "
                  f"{(fwd_fl + bwd_fl) / sec / 1e12:6.1f} TFLOP/s", flush=True)
    fa._FUSED_BWD = True

    # the transposes alone: swapaxes there and back, 3 tensors
    def transposes(q, k, v):
        return tuple(jnp.swapaxes(jnp.swapaxes(x, 1, 2) + 0.0, 1, 2)
                     for x in (q, k, v))
    sec, _ = bm.benchmark_forward(transposes, q, k, v,
                                  steps=args.steps, reps=args.reps)
    results["transpose3_roundtrip"] = {"ms": sec * 1e3}
    print(f"3x swapaxes round-trip: {sec*1e3:.3f} ms", flush=True)

    # model-shaped A/B: start from the PACKED (b, s, 3, h, d) qkv the Wqkv
    # GEMM produces, include all layout work, fwd+bwd, training dropout.
    # g<N> variants batch N heads per kernel program (FLASH_HEAD_GROUP).
    qkv = jnp.stack([q, k, v], axis=2)
    for tag, bq, bk, p, grp in [
            ("packed:b256x256", 256, 256, 0.1, 1),
            ("packed:b512x512", 512, 512, 0.1, 1),
            ("packed:b512x512:p0", 512, 512, 0.0, 1),
            ("packed:b256x256:g4", 256, 256, 0.1, 4),
            ("packed:b512x512:g4", 512, 512, 0.1, 4),
            ("packed:b512x512:g12", 512, 512, 0.1, 12),
            ("packed:b256x256:g12", 256, 256, 0.1, 12),
            ("unpacked:b256x256", 256, 256, 0.1, 1),
            ("unpacked:b512x512", 512, 512, 0.1, 1)]:
        packed = tag.startswith("packed")
        fa._HEAD_GROUP = grp

        def loss(qkv5d, ct):
            if packed:
                out = fa.flash_attention_qkv_packed(
                    qkv5d, causal=True, dropout_p=p,
                    dropout_rng=rng if p > 0 else None,
                    block_q=bq, block_k=bk)
            else:
                out = fa.flash_attention(
                    qkv5d[:, :, 0], qkv5d[:, :, 1], qkv5d[:, :, 2],
                    causal=True, dropout_p=p,
                    dropout_rng=rng if p > 0 else None,
                    block_q=bq, block_k=bk)
            return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))

        sec, _ = bm.benchmark_forward(jax.grad(loss), qkv, g,
                                      steps=args.steps, reps=args.reps)
        results[f"model:{tag}"] = {
            "ms": sec * 1e3, "tflops": (fwd_fl + bwd_fl) / sec / 1e12}
        print(f"mdl  {tag:24s} {sec*1e3:7.3f} ms  "
              f"{(fwd_fl + bwd_fl) / sec / 1e12:6.1f} TFLOP/s", flush=True)
    fa._HEAD_GROUP = 1

    # per-layer context: 12 layers of fwd+bwd at the winning config
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    print(json.dumps({k: round(v["ms"], 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
