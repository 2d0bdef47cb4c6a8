"""VPU elementwise-rate probe on the real chip — ONE sequential run.

NOTES.md's training anatomy calls the flash kernels VPU-bound in the
softmax elementwise chain (exp, max, where). The CUDA reference writes its
softmax as exp2 with log2(e) folded into the scale (fmha kernels) because
exp costs an extra multiply there. Whether that rewrite can buy anything
on the TPU VPU is a measurable fact: this times elementwise exp, exp2,
fused mul+exp2 (the rewritten form), and a plain multiply (the floor) over
the same f32 buffer inside one scan'd jit per op.

    timeout 2000 python bench_vpu.py [--mb 64] [--iters 128]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LOG2E = 1.4426950408889634


def time_op(op, x, iters, reps):
    def loop(x):
        def body(carry, _):
            y = op(x + carry * 1e-30)       # loop-variant input
            return jnp.ravel(y)[0] * 1e-9, ()

        out, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
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
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    n = args.mb * 2**20 // 4
    x = jnp.asarray(np.random.default_rng(0).uniform(-4, 0, (n,)),
                    jnp.float32)

    ops = {
        "mul": lambda v: v * 1.0000001,
        "exp": jnp.exp,
        "exp2": jnp.exp2,
        "mul_exp2": lambda v: jnp.exp2(v * LOG2E),
    }
    results = {"elements": n}
    for name, op in ops.items():
        dt = time_op(op, x, args.iters, args.reps)
        geps = n / dt / 1e9
        results[f"{name}_gelem_s"] = geps
        print(f"{name:>9}: {geps:7.2f} Gelem/s  ({dt*1e3:.3f} ms)",
              flush=True)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
