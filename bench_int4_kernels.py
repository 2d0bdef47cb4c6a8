"""INT4 vs INT8 decode-attention kernel A/B on the real chip.

The decode step is cache-stream-bound (NOTES.md: 665-790 of ~819 GB/s with
every cache int8). The int4 pair-packed path halves the cache bytes; this
bench measures, at the two model shapes of backpack-small batch-128 decode,

  * int8-flat      — the shipped XLA contraction (decode_attention_flat)
  * int8-blockdiag — the best-measured int8 Pallas kernel (r3: 310 vs 262us)
  * int4-xla       — even/odd split contraction (XLA materializes the
                     shifted nibble tensors; expected to lose)
  * int4-blockdiag — the Pallas kernel streaming packed bytes (the candidate)

Shapes: GPT KV (E=B*h=1536, dk=dv=64) and the Backpack combine
(E=B*nv=2048, dk=64, dv=768), at windows 128/256/512.

Methodology per NOTES.md: long scan loops with a data dependency feeding q
(so the cache read cannot be hoisted), best-of reps, np.asarray fetch, all
operands as jit arguments. Run from /root/repo with NO PYTHONPATH:

    timeout 6000 python bench_int4_kernels.py [--iters 100] [--reps 5]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.ops import decode_attention as da
from backpacks_flash_attn_tpu.ops import quant

B = 128


def make_problem(rng, e, dk, dv, s):
    q = jnp.asarray(rng.normal(size=(e, dk)), jnp.bfloat16) * 0.3
    k = rng.normal(size=(e, dk, s)).astype(np.float32)
    v = rng.normal(size=(e, s, dv)).astype(np.float32)
    k8, ks8 = quant.quantize_activations_int8(jnp.asarray(k), axis=1)
    v8, vs8 = quant.quantize_activations_int8(jnp.asarray(v), axis=2)
    k4, ks4 = quant.quantize_activations_int4(jnp.asarray(k), axis=1)
    v4, vs4 = quant.quantize_activations_int4(jnp.asarray(v), axis=2)
    kt4 = quant.pack_int4_pairs(k4, axis=2)
    v4p = quant.pack_int4_pairs(v4, axis=1)
    ks2 = ks4[:, 0, :].reshape(e, s // 2, 2).swapaxes(1, 2)
    vs2 = vs4[:, :, 0].reshape(e, s // 2, 2).swapaxes(1, 2)
    # mixed: int8 split keys + int4 packed values (the gate-passing config)
    k8s = jnp.stack([k8[:, :, 0::2], k8[:, :, 1::2]], axis=2)
    ks2b = ks8[:, 0, :].reshape(e, s // 2, 2).swapaxes(1, 2)
    length = jnp.full((e,), s, jnp.int32)
    return {
        "q": q, "length": length,
        "int8": (k8, ks8[:, 0, :], v8, vs8[:, :, 0]),
        "int4": (kt4, ks2, v4p, vs2),
        "mixed": (k8s, ks2b, v4p, vs2),
    }


def time_variant(fn, q0, ops, length, dk, iters, reps):
    def loop(q0, *ops):
        def body(q, _):
            out = fn(q, *ops, length)
            # feed a whisper of the output back into q: keeps the kernel
            # loop-variant so XLA cannot hoist the cache read
            q = q + (out[:, :dk] * 1e-9).astype(q.dtype)
            return q, ()
        q, _ = jax.lax.scan(body, q0, None, length=iters)
        return q

    jl = jax.jit(loop)
    _ = np.asarray(jl(q0, *ops))           # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(jl(q0, *ops))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default="bench_results/int4_kernels_r5.json")
    a = ap.parse_args()

    rng = np.random.default_rng(0)
    shapes = [
        ("gpt_kv", B * 12, 64, 64),        # backpack-small: h=12, dh=64
        ("combine", B * 16, 64, 768),      # nv=16, dnv_pad=64, d=768
    ]
    results = {}
    for name, e, dk, dv in shapes:
        for s in (128, 256, 512):
            p = make_problem(rng, e, dk, dv, s)
            k8, ks8, v8, vs8 = p["int8"]
            kt4, ks2, v4p, vs2 = p["int4"]
            row = {}
            variants = [
                ("int8_flat_us", da.decode_attention_flat,
                 (k8, ks8, v8, vs8)),
                ("int8_blockdiag_us", da.decode_attention_blockdiag,
                 (k8, ks8, v8, vs8)),
                ("int4_xla_us", da.decode_attention_flat_int4,
                 (kt4, ks2, v4p, vs2)),
                ("int4_blockdiag_us", da.decode_attention_int4_blockdiag,
                 (kt4, ks2, v4p, vs2)),
                ("mixed_xla_us", da.decode_attention_flat_mixed,
                 p["mixed"]),
                ("mixed_blockdiag_us", da.decode_attention_mixed_blockdiag,
                 p["mixed"]),
            ]
            for vname, fn, ops in variants:
                try:
                    row[vname] = 1e6 * time_variant(
                        fn, p["q"], ops, p["length"], dk, a.iters, a.reps)
                except Exception as ex:
                    row[vname] = f"FAIL {type(ex).__name__}"
                    print(name, s, vname, "FAILED:", str(ex)[:200],
                          flush=True)
            # roofline: bytes of the int8 vs int4 streams at ~819 GB/s
            int8_bytes = e * s * (dk + dv) + e * s * 8
            int4_bytes = e * s * (dk + dv) // 2 + e * s * 8
            row["int8_roofline_us"] = 1e6 * int8_bytes / 819e9
            row["int4_roofline_us"] = 1e6 * int4_bytes / 819e9
            results[f"{name}_s{s}"] = {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in row.items()}
            print(name, s, json.dumps(results[f"{name}_s{s}"]), flush=True)

    with open(a.json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", a.json)


if __name__ == "__main__":
    main()
