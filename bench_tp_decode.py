"""TP decode latency: overlapped shard_map rings vs bare pjit.

Compares two multi-device decode implementations of the same model step
(SURVEY.md §7.3 "decode-latency collectives"; VERDICT r1 item 2):

  pjit     parallel/serving.make_sharded_decode_step(tp_params=True) —
           XLA inserts one fused all-reduce behind every row-parallel
           matmul; at s=1 each collective serializes the layer behind it.
  overlap  parallel/tp_decode.make_tp_decode_scan — hand-scheduled
           ppermute rings whose latency hides behind the staggered
           microbatch's compute.

Both run as >=448-step greedy scan loops in ONE dispatch (the only timing
that survives the tunnel RTT — utils/benchmark.py / NOTES.md). On the CPU
virtual mesh this is a correctness/latency smoke (collectives are memcpys);
the numbers that matter come from running this unchanged on real multi-chip
hardware:   python bench_tp_decode.py --data 1 --model 4 --batch 8

Prints one JSON line per variant: {"variant", "us_per_step", "tok_per_s"}.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--model", type=int, default=0,
                    help="TP size; 0 = all remaining devices")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=448)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="2-layer toy config (CPU smoke)")
    args = ap.parse_args()

    from backpacks_flash_attn_tpu.config import BackpackConfig, backpack_small
    from backpacks_flash_attn_tpu.models import backpack as bp
    from backpacks_flash_attn_tpu.parallel import serving, tp_decode
    from backpacks_flash_attn_tpu.parallel.mesh import make_mesh

    ndev = len(jax.devices())
    tp = args.model or max(1, ndev // args.data)
    mesh = make_mesh(data=args.data, model=tp)
    print(f"# devices={ndev} mesh=(data={args.data}, model={tp}) "
          f"platform={jax.devices()[0].platform}")

    if args.tiny:
        cfg = BackpackConfig(vocab_size=512, n_positions=128, n_embd=64,
                             n_layer=2, n_head=4, num_senses=4,
                             pad_vocab_size_multiple=8)
    else:
        cfg = backpack_small(vocab_size=50257)
    max_len = args.prompt + args.steps + 8
    assert max_len <= cfg.n_positions or cfg.n_positions == 0, \
        (max_len, cfg.n_positions)

    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (args.batch, args.prompt),
                             0, cfg.vocab_size)

    def prefill():
        cache = bp.init_backpack_cache(cfg, args.batch, max_len,
                                       dtype=jnp.bfloat16)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, ids, cache, use_flash=False)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        return tok, cache

    def timed(run):  # one dispatch of `steps` decode steps, best-of-reps
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = run()
            np.asarray(out)  # host fetch forces completion through the tunnel
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    # ---- bare pjit -------------------------------------------------------
    step, prepare = serving.make_sharded_decode_step(cfg, mesh,
                                                     use_flash=False,
                                                     tp_params=True)

    def pjit_scan(params, tok, cache):
        def one(carry, _):
            tok, cch = carry
            logits, cch = bp.backpack_forward_with_cache(
                params, cfg, tok, cch, use_flash=False, window=args.window)
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return (nxt, cch), None
        (tok, cache), _ = jax.lax.scan(one, (tok, cache), None,
                                       length=args.steps)
        return tok

    pjit_fn = jax.jit(pjit_scan)  # no donation: timed() reruns on same cache
    with mesh:
        tok0, cache0 = prefill()
        p_params, p_cache = prepare(params, cache0)
        np.asarray(pjit_fn(p_params, tok0, p_cache))          # compile
        dt = timed(lambda: pjit_fn(p_params, tok0, p_cache))
        results["pjit"] = dt

    # ---- overlapped rings (same bf16 params/cache as the pjit run) -------
    _, prep_tp = tp_decode.make_tp_decode_step(cfg, mesh, window=args.window)
    scan_tp = tp_decode.make_tp_decode_scan(cfg, mesh, steps=args.steps,
                                            window=args.window, donate=False)
    tok0, cache0 = prefill()
    tp_params, tp_cache = prep_tp(params, cache0)
    np.asarray(scan_tp(tp_params, tok0, tp_cache)[0])          # compile
    dt = timed(lambda: scan_tp(tp_params, tok0, tp_cache)[0])
    results["overlap"] = dt

    for name, dt in results.items():
        us = dt / args.steps * 1e6
        print(json.dumps({
            "variant": name, "us_per_step": round(us, 1),
            "tok_per_s": round(args.batch * args.steps / dt, 1)}))
    if results["overlap"] < results["pjit"]:
        print(f"# overlap wins: {results['pjit'] / results['overlap']:.2f}x")
    else:
        print(f"# pjit wins: {results['overlap'] / results['pjit']:.2f}x")


if __name__ == "__main__":
    main()
