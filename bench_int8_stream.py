"""INT8 HBM stream-rate A/B on the real chip — ONE sequential run.

NOTES.md's decode anatomy caps int8 cache reads at ~500-675 GB/s vs bf16's
~745 (spec ~819): the element rate, not the byte rate, appears to limit
int8 streams. The named untried fix is reading the int8 buffer as BITCAST
int32 words (4 bytes/element at the word load rate) and unpacking on the
VPU. This bench isolates exactly that question with three Pallas reduce
kernels over the same bytes — no attention semantics, just stream rate:

  * bf16 read + reduce            (the 745 GB/s reference stream)
  * int8 read + reduce            (the current cache read)
  * int8-as-int32 read + shift/mask unpack + reduce  (the candidate)

If the bitcast variant's effective int8 GB/s lands near the bf16 byte
rate, a bitcast-reading decode kernel is worth building; if it stays at
the element-rate ceiling, the int8 stream limit is fundamental and the
current XLA flat contraction stands (NOTES.md decode lever closed).

Methodology per NOTES.md / memory: long scan loops, best-of reps,
np.asarray fetch, data as jit arguments. Run from /root/repo, NO
PYTHONPATH:

    timeout 3000 python bench_int8_stream.py [--mb 256] [--iters 64]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _reduce_kernel(c_ref, x_ref, o_ref, *, unpack: bool):
    # c is the scan carry: making it a kernel OPERAND keeps the pallas call
    # loop-variant, so XLA cannot hoist the (otherwise invariant) HBM read
    # out of the timing loop. The output is ONE (8, 128) block shared by all
    # grid steps (TPU grids run sequentially) — per-block (1, 1) outputs
    # violate Mosaic's (8, 128) min-tile rule on real hardware.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    c = c_ref[0]
    x = x_ref[...]
    if unpack:
        # int32 words -> 4 sign-extended int8 lanes, summed. Shifts+adds on
        # the VPU; no relayout (the sum is order-independent).
        acc = jnp.zeros(x.shape, jnp.int32)
        for u in range(4):
            lane = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(x, jnp.int32(24 - 8 * u)), jnp.int32(24))
            acc = acc + lane
        s = jnp.sum(acc.astype(jnp.float32)) + c
    else:
        s = jnp.sum(x.astype(jnp.float32)) + c
    o_ref[...] += jnp.full(o_ref.shape, s, jnp.float32)


def make_stream(shape, dtype, n_blocks, unpack=False):
    """Sum a (n_blocks, *shape) buffer one block per program; returns an
    (8, 128) accumulator block (kept tiny so output traffic is noise)."""
    kernel = functools.partial(_reduce_kernel, unpack=unpack)

    def run(x, c):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=_interpret(),
        )(c.reshape(1), x)

    return jax.jit(run)


def time_stream(fn, x, iters, reps):
    def loop(x):
        def body(carry, _):
            s = fn(x, carry)
            return jnp.sum(s) * 1e-9, ()

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return out

    jl = jax.jit(loop)
    _ = np.asarray(jl(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(jl(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256,
                    help="buffer size in MiB (payload bytes)")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    rows, lanes = 512, 512                      # (8, 512)-friendly tiles
    blk_bytes = rows * lanes                    # int8 bytes per block
    n_blocks = max(args.mb * 2**20 // blk_bytes, 1)
    rng = np.random.default_rng(0)
    i8 = jnp.asarray(rng.integers(-127, 127,
                                  (n_blocks, rows, lanes), dtype=np.int8))
    b16 = jnp.asarray(rng.standard_normal((n_blocks, rows, lanes // 2)),
                      jnp.bfloat16)             # same BYTES as the int8 buf
    i32 = jax.lax.bitcast_convert_type(
        i8.reshape(n_blocks, rows, lanes // 4, 4), jnp.int32)

    results = {"bytes_per_pass": n_blocks * blk_bytes}
    runs = [
        ("bf16", make_stream((rows, lanes // 2), jnp.bfloat16, n_blocks),
         b16),
        ("int8", make_stream((rows, lanes), jnp.int8, n_blocks), i8),
        ("int8_as_int32", make_stream((rows, lanes // 4), jnp.int32,
                                      n_blocks, unpack=True), i32),
    ]
    for name, fn, x in runs:
        dt = time_stream(fn, x, args.iters, args.reps)
        gbps = n_blocks * blk_bytes / dt / 1e9
        results[f"{name}_gbps"] = gbps
        print(f"{name:>14}: {gbps:8.1f} GB/s  ({dt*1e3:.3f} ms/pass)",
              flush=True)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
