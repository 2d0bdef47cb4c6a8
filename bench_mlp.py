"""MLP GEMM MXU-efficiency isolation on the real chip — ONE sequential run.

NOTES.md's training anatomy blames ~50%-MXU MLP GEMMs for a third of the
step (55ms at B=32): this bench separates WHERE that efficiency goes by
timing, at exactly the backpack-small training shapes (tokens = B*S,
d -> 4d -> d, bf16):

  * raw_fwd        x@W1 ; gelu ; @W2 as plain jnp ops (XLA's best case)
  * raw_fwd_bwd    + jax.grad wrt (x, W1, W2) — the training GEMM set
  * mlp_fwd        ops/dense.mlp (the fused custom_vjp production path)
  * mlp_fwd_bwd    its backward (saves pre-activation only)

If raw_fwd_bwd sits near peak but mlp_fwd_bwd does not, the custom_vjp's
recompute/fusion layout is the problem; if raw is also ~50%, the shapes or
dtype handling are, and the fix is layout/tiling work, not the vjp.

Methodology per NOTES.md / memory: scan loops, params as jit args,
best-of reps, np.asarray fetches. Run from /root/repo with NO PYTHONPATH:

    timeout 3000 python bench_mlp.py [--tokens 16384] [--d 768] [--json f]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.ops import dense

V5E_PEAK_BF16 = 197e12


def time_loop(step, args_, iters, reps):
    def loop(*a):
        def body(carry, _):
            out = step(*a, carry)
            return out, ()

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return out

    jl = jax.jit(loop)
    _ = np.asarray(jl(*args_))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(jl(*args_))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=16384)   # B=32 x S=512
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--inner", type=int, default=0)        # 0 = 4*d
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    t, d = args.tokens, args.d
    inner = args.inner or 4 * d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.bfloat16)
    params = dense.init_mlp(jax.random.PRNGKey(0), d, inner,
                            dtype=jnp.bfloat16)
    w1 = params["fc1"]["kernel"]
    w2 = params["fc2"]["kernel"]
    fwd_flops = 2 * t * d * inner * 2          # two GEMMs
    bwd_flops = 3 * fwd_flops                  # fwd + dx/dW for both

    def raw(x, w1, w2):
        h = jax.nn.gelu(jnp.dot(x, w1, preferred_element_type=jnp.float32
                                ).astype(x.dtype), approximate=True)
        return jnp.dot(h, w2, preferred_element_type=jnp.float32
                       ).astype(x.dtype)

    def via_mlp(x, params):
        return dense.mlp(x[None], params, "gelu_new")[0]

    results = {"tokens": t, "d": d, "inner": inner}

    # carry threads into x so the loop body is never loop-invariant
    def fwd_step(fn):
        def step(x, *ws, carry):
            xx = x.at[0, 0].add(carry.astype(x.dtype) * 1e-9)
            out = fn(xx, *ws)
            return jnp.sum(out[:1, :1].astype(jnp.float32)) * 1e-9
        return lambda *a, **k: step(*a, **k)

    def bwd_step(fn, nargs):
        def loss(*a):
            return jnp.sum(fn(*a).astype(jnp.float32) ** 2) * 1e-12
        g = jax.grad(loss, argnums=tuple(range(nargs)))

        def step(x, *ws, carry):
            xx = x.at[0, 0].add(carry.astype(x.dtype) * 1e-9)
            gs = g(xx, *ws)
            return sum(jnp.ravel(q)[0].astype(jnp.float32)
                       for q in jax.tree.leaves(gs)) * 1e-9
        return step

    cases = [
        ("raw_fwd", fwd_step(raw), (x, w1, w2), fwd_flops),
        ("raw_fwd_bwd", bwd_step(raw, 3), (x, w1, w2), bwd_flops),
        ("mlp_fwd", fwd_step(via_mlp), (x, params), fwd_flops),
        ("mlp_fwd_bwd", bwd_step(via_mlp, 2), (x, params), bwd_flops),
    ]
    for name, fn, a, flops in cases:
        step = lambda *aa: fn(*aa[:-1], carry=aa[-1])
        dt = time_loop(step, a, args.iters, args.reps)
        tfl = flops / dt / 1e12
        results[f"{name}_ms"] = dt * 1e3
        results[f"{name}_tflops"] = tfl
        results[f"{name}_mxu"] = tfl * 1e12 / V5E_PEAK_BF16
        print(f"{name:>12}: {dt*1e3:7.2f} ms  {tfl:6.1f} TFLOP/s  "
              f"MXU {tfl*1e12/V5E_PEAK_BF16*100:5.1f}%", flush=True)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
