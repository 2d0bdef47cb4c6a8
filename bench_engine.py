"""On-chip serving-engine throughput (VERDICT r4 item 5).

bench.py's headline is a bare lax.scan over backpack_forward_with_cache;
the serving engine adds per-slot lengths, the staged cache, sampling
machinery, penalties plumbing, and host scheduling. This bench publishes
the ENGINE's number next to the scan number:

  * device path: the engine's own jitted step fn (the exact compiled step
    the host loop dispatches, staged cache + per-slot lengths + sampler)
    run in bench.py's segment pattern — inner scans with a flush every
    stage-cap steps, window buckets 128/256/384/512 — so the device-side
    engine tok/s/chip is measured with the same long-scan best-of
    methodology and is directly comparable to the scan headline.
  * host loop: wall ms/step of real eng.step() through the tunnel,
    reported separately (each dispatch pays 30-60ms RTT here; a local
    deployment pays the scheduler cost only, also reported as host_ms
    measured around the non-dispatch work).

Run from /root/repo with NO PYTHONPATH:
    timeout 6000 python bench_engine.py --json bench_results/engine_r5.json
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.config import backpack_small, backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import quantized as qz

PROMPT_MAX = 110


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=128)
    ap.add_argument("--max-seqlen", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--host-steps", type=int, default=24)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--scan-ref", type=float, default=None,
                    help="bench.py int8 tokens/s for the efficiency ratio")
    ap.add_argument("--json", default="bench_results/engine_r5.json")
    a = ap.parse_args()

    from backpacks_flash_attn_tpu.serving.engine import ServingEngine

    if a.smoke:
        cfg = backpack_test()
        a.slots, a.max_seqlen, a.host_steps = 4, 64, 3
        prompt_lens = [5, 9, 9, 13]
    else:
        cfg = backpack_small(vocab_size=50257)
        rng = np.random.default_rng(0)
        prompt_lens = rng.integers(17, PROMPT_MAX + 1, a.slots).tolist()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8)
    del params

    eng = ServingEngine(qparams, cfg, max_slots=a.slots,
                        max_seqlen=a.max_seqlen, cache_dtype=jnp.int8,
                        eos_id=-1, spec_tokens=0)
    rng = np.random.default_rng(1)
    for pl_ in prompt_lens:
        eng.submit(rng.integers(0, cfg.vocab_size, pl_).tolist(),
                   max_new_tokens=a.max_seqlen)  # never retires in-bench
    # one host step admits everything (bucketed batched prefill) and runs
    # one decode step
    t0 = time.perf_counter()
    out = eng.step()
    admit_s = time.perf_counter() - t0
    assert eng.sched.num_active == a.slots, eng.sched.num_active
    print(f"admitted {a.slots} slots in {admit_s:.1f}s "
          f"(includes prefill compiles)", flush=True)

    # ---- device path: the engine's jitted step fn in bench.py's segment
    # pattern. Snapshot live engine state as the scan's initial carry.
    C = max(eng._stage_cap - 1, 1) if eng._stage_cap else 64
    max_len = int(max(eng.host_lengths[sl] for sl in range(a.slots)))
    fixed = (jnp.asarray(eng.temps), jnp.asarray(eng.top_ps),
             jnp.asarray(eng.top_ks),
             jnp.asarray(eng.emitted < eng.min_tokens),
             jnp.asarray(eng.freq_p), jnp.asarray(eng.pres_p),
             jnp.asarray(eng.sense_weights))
    flush = bp.flush_cache

    def make_seg(n_steps, window):
        win = window if window < a.max_seqlen else a.max_seqlen
        fn = eng._step_fn(False, win)

        def body(params, carry, _):
            toks, cache, counts, key = carry
            key, sub = jax.random.split(key)
            temps, top_ps, top_ks, ban, fps, pps, ws = fixed
            toks, cache, counts, _ = fn(params, toks, cache, temps,
                                        top_ps, top_ks, ban, counts, fps,
                                        pps, sub, ws)
            return (toks, cache, counts, key), ()

        def seg(params, toks, cache, counts, key):
            done = 0
            while done < n_steps:
                n = min(C, n_steps - done)
                (toks, cache, counts, key), _ = jax.lax.scan(
                    functools.partial(body, params),
                    (toks, cache, counts, key), None, length=n)
                cache = flush(cache, window=win)
                done += n
            return toks, cache, counts, key

        # params as a jit ARGUMENT: closure-captured weights inline ~170MB
        # of constants into the HLO and the remote compiler rejects it
        return jax.jit(seg, donate_argnums=(2,))

    # segment plan: same growth pattern as bench.py from the current
    # max length (pos = next write position) to max_seqlen
    segs, pos, gran = [], max_len, 128
    while pos < a.max_seqlen:
        win = min(-(-(pos + 1) // gran) * gran, a.max_seqlen)
        n = win - pos
        segs.append((n, win))
        pos += n
    steps = sum(n for n, _ in segs)
    print("segments:", segs, flush=True)
    seg_fns = [make_seg(n, w) for n, w in segs]
    copy_cache = jax.jit(lambda c: jax.tree.map(jnp.copy, c))

    def run_all(cache):
        toks, counts = eng.tokens, eng.token_counts
        key = jax.random.PRNGKey(42)
        cache = copy_cache(cache)
        for f in seg_fns:
            toks, cache, counts, key = f(eng.params, toks, cache, counts,
                                         key)
        return toks

    base_cache = eng.cache
    _ = np.asarray(run_all(base_cache))   # compile + warm
    best = float("inf")
    for _ in range(a.reps):
        t0 = time.perf_counter()
        _ = np.asarray(run_all(base_cache))
        best = min(best, time.perf_counter() - t0)
    dev_tps = a.slots * steps / best

    # ---- host-loop wall (tunnel RTT included), AFTER the device scan so
    # the scan starts from the post-admission mixed lengths
    host_walls = []
    for _ in range(a.host_steps):
        t0 = time.perf_counter()
        eng.step()
        host_walls.append(time.perf_counter() - t0)
    host_ms_tunnel = 1e3 * float(np.median(host_walls))

    res = {
        "slots": a.slots, "max_seqlen": a.max_seqlen,
        "mixed_prompt_lens": [int(min(prompt_lens)), int(max(prompt_lens))],
        "decode_steps": steps,
        "engine_device_tokens_per_s": round(dev_tps, 1),
        "host_step_ms_tunnel": round(host_ms_tunnel, 1),
        "admit_s_with_compiles": round(admit_s, 1),
        "stage_cap": eng._stage_cap,
    }
    if a.scan_ref:
        res["scan_headline_tokens_per_s"] = a.scan_ref
        res["engine_vs_scan_efficiency"] = round(dev_tps / a.scan_ref, 3)
    print(json.dumps(res), flush=True)
    with open(a.json, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
