"""Hardware long-context validation: flash / blocksparse at s in {2k, 4k, 8k}.

The reference claims 64K max seqlen and ships 8k-seqlen training configs
(ref: flash_attn_README.md:93, training/configs/experiment/pile/
gpt3s-flash-8k.yaml); every hardware number in this repo so far is s=512.
This bench runs, at the gpt3s shape (h=12, d=64, ~16k tokens per batch):

  * flash fwd and fwd+bwd at the shipped 512x512 default (does it compile/
    fit at 8k? what ms/TFLOPs? — the forward head-group VMEM clamp from
    ADVICE r4 is exercised here),
  * the O(s^2) einsum reference where it fits (memory-ratio evidence),
  * blocksparse fwd+bwd with a causal local-band mask (~1k band),
  * device memory highwater per variant,
  * one full gpt3s TRAINING step at s=8192 (fwd+bwd+Adam), tokens/s.

    timeout 7200 python bench_longctx.py [--json bench_results/longctx_r5.json]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.ops import attention as attn_lib
from backpacks_flash_attn_tpu.ops import flash_attention as fa
from backpacks_flash_attn_tpu.utils import benchmark as bm

H, D = 12, 64
TOKENS = 16384          # per-batch token budget: b = TOKENS // s


def mem_peak_mb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2**20)
    except Exception:
        return None


def flops(b, s, n_dots, causal_frac=0.5):
    return n_dots * 2 * b * H * s * s * D * causal_frac


def run(fn, *args, steps, reps):
    sec, _ = bm.benchmark_forward(fn, *args, steps=steps, reps=reps)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seqlens", default="2048,4096,8192")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--json", default="bench_results/longctx_r5.json")
    a = ap.parse_args()
    results = {}

    for s in [int(x) for x in a.seqlens.split(",")]:
        b = max(TOKENS // s, 1)
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v, g = (jax.random.normal(kk, (b, s, H, D), jnp.bfloat16)
                      for kk in ks)
        row = {"batch": b}

        def flash_fwd(q, k, v):
            return fa.flash_attention(q, k, v, causal=True)

        def flash_fwd_bwd(q, k, v):
            def loss(q, k, v):
                o = fa.flash_attention(q, k, v, causal=True)
                return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        for name, fn, nd in [("flash_fwd", flash_fwd, 2),
                             ("flash_fwd_bwd", flash_fwd_bwd, 7)]:
            try:
                sec = run(fn, q, k, v, steps=a.steps, reps=a.reps)
                row[name] = {"ms": round(sec * 1e3, 3),
                             "tflops": round(flops(b, s, nd) / sec / 1e12, 1),
                             "peak_mb": mem_peak_mb()}
            except Exception as ex:      # compile/OOM failures are findings
                row[name] = {"error": f"{type(ex).__name__}: {ex}"[:2500]}
            print(s, name, json.dumps(row.get(name)), flush=True)

        # O(s^2) einsum reference (mha_reference materializes b*h*s*s f32)
        def ein_fwd(q, k, v):
            return attn_lib.mha_reference(q, k, v, causal=True)

        score_gb = b * H * s * s * 4 / 2**30
        if score_gb < 8:
            try:
                sec = run(ein_fwd, q, k, v, steps=max(a.steps // 4, 2),
                          reps=a.reps)
                row["einsum_fwd"] = {
                    "ms": round(sec * 1e3, 3),
                    "tflops": round(flops(b, s, 2) / sec / 1e12, 1),
                    "peak_mb": mem_peak_mb(), "score_gb": round(score_gb, 2)}
            except Exception as ex:
                row["einsum_fwd"] = {"error": str(ex)[:200],
                                     "score_gb": round(score_gb, 2)}
        else:
            row["einsum_fwd"] = {"skipped": f"scores {score_gb:.0f} GB"}
        print(s, "einsum_fwd", json.dumps(row["einsum_fwd"]), flush=True)

        # blocksparse: causal local band (~1k positions) + global block 0
        bq = bk = 256
        n_qb, n_kb = s // bq, s // bk
        band = max(1024 // bk, 1)
        qi = np.arange(n_qb)[:, None]
        kj = np.arange(n_kb)[None, :]
        mask = ((kj <= qi) & ((qi - kj) < band)) | (kj == 0)
        blockmask = jnp.asarray(mask.astype(np.int32))
        density = float(mask.sum() / max((qi >= kj).sum(), 1))

        def bs_fwd_bwd(q, k, v):
            def loss(q, k, v):
                o = fa.flash_blocksparse_attention(q, k, v, blockmask,
                                                   causal=True,
                                                   block_q=bq, block_k=bk)
                return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        try:
            sec = run(bs_fwd_bwd, q, k, v, steps=a.steps, reps=a.reps)
            row["blocksparse_fwd_bwd"] = {
                "ms": round(sec * 1e3, 3), "density": round(density, 3),
                "peak_mb": mem_peak_mb()}
        except Exception as ex:
            row["blocksparse_fwd_bwd"] = {"error": str(ex)[:300]}
        print(s, "blocksparse", json.dumps(row["blocksparse_fwd_bwd"]),
              flush=True)
        results[f"s{s}"] = row

    # full training step at 8k: gpt3s, one step fwd+bwd+Adam
    if not a.skip_train:
        from backpacks_flash_attn_tpu import config as config_lib
        from backpacks_flash_attn_tpu.models import gpt as gpt_lib
        from backpacks_flash_attn_tpu.training import train as train_lib

        s_tr, b_tr = 8192, 2
        cfg = config_lib.gpt3_small(n_positions=s_tr)
        params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(1),
                                  dtype=jnp.bfloat16)
        tx = train_lib.make_optimizer(params, warmup_steps=10,
                                      total_steps=100)
        ids = jax.random.randint(jax.random.PRNGKey(2), (b_tr, s_tr + 1), 0,
                                 cfg.vocab_size)
        for remat in (False, "dots", True):
            try:
                step = jax.jit(train_lib.make_train_step(
                    cfg, tx, model="gpt", use_flash=True, remat=remat),
                    donate_argnums=(0,))
                state = train_lib.TrainState(
                    params, jax.jit(tx.init)(params),
                    jnp.zeros((), jnp.int32))
                t0 = time.time()
                state, m = step(state, {"input_ids": ids},
                                jax.random.PRNGKey(3))
                _ = float(m["loss"])
                compile_s = time.time() - t0
                times = []
                for _ in range(4):
                    t0 = time.time()
                    state, m = step(state, {"input_ids": ids},
                                    jax.random.PRNGKey(3))
                    _ = np.asarray(m["loss"])
                    times.append(time.time() - t0)
                best = min(times)
                results["train_8k"] = {
                    "remat": str(remat), "batch": b_tr, "seqlen": s_tr,
                    "ms_per_step": round(best * 1e3, 1),
                    "tokens_per_s": round(b_tr * s_tr / best, 1),
                    "compile_s": round(compile_s, 1),
                    "loss": round(float(m["loss"]), 3),
                    "peak_mb": mem_peak_mb()}
                print("train_8k", json.dumps(results["train_8k"]), flush=True)
                break
            except Exception as ex:
                results[f"train_8k_remat{remat}"] = {
                    "error": f"{type(ex).__name__}: {ex}"[:2500]}
                print("train_8k", remat, "FAILED:", str(ex)[:200],
                      file=sys.stderr, flush=True)

    with open(a.json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", a.json)


if __name__ == "__main__":
    main()
