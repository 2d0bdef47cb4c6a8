"""Engine-shaped speculative-decoding A/B (VERDICT r2 item 2).

Runs the REAL serving engine host loop twice — spec_tokens=0 vs =k — on the
bigram-trained backpack-mini (prompt-lookup needs a model whose output
actually repeats its own n-grams; random-init drafts never match). Reports:

  * draft_acceptance: mean accepted drafts per verification (the content
    metric — a model+data property, independent of the tunnel),
  * engine wall tok/s both ways. Through the axon tunnel each host dispatch
    pays 30-60ms RTT, so the wall numbers model a LATENCY-bound deployment:
    speculation's dispatch-count reduction shows up directly,
  * projected on-chip speedup (1 + E[acc]) / rel_cost, taking rel_cost from
    bench_spec_step.py's long-scan measurement (--rel-cost or spec json).

Run from /root/repo with NO PYTHONPATH:
    timeout 6000 python bench_spec_engine.py --workdir /tmp/runs/bp-mini-r3 \
        --corpus /tmp/bigram6m.npy --json bench_results/spec_engine_r3.json
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from backpacks_flash_attn_tpu.models import backpack as bp


def load_params(args):
    from backpacks_flash_attn_tpu.training import checkpoint as ckpt_lib
    from backpacks_flash_attn_tpu.training import train as train_lib
    from backpacks_flash_attn_tpu.training import train_cli

    rc = train_cli.RunConfig(corpus=args.corpus, workdir=args.workdir,
                             model=args.model, seqlen=512, dtype="bfloat16")
    cfg, kind, params0 = train_cli.build_model(rc)
    assert kind == "backpack"
    tx = train_lib.make_optimizer(params0)
    state_t = train_lib.TrainState(params0, jax.jit(tx.init)(params0),
                                   jnp.zeros((), jnp.int32))
    ckpt = ckpt_lib.latest_checkpoint(args.workdir)
    restored, step, _ = ckpt_lib.restore(ckpt, {"state": state_t})
    print(f"restored step {step} from {ckpt}", flush=True)
    return cfg, jax.tree.map(jnp.asarray, restored["state"].params)


def run_engine(params, cfg, prompts, *, spec_tokens, max_new, slots,
               draft=None):
    from backpacks_flash_attn_tpu.serving.engine import ServingEngine

    dkw = {}
    if draft is not None:
        dkw = dict(draft_params=draft[1], draft_cfg=draft[0])
    eng = ServingEngine(params, cfg, max_slots=slots, max_seqlen=512,
                        cache_dtype=jnp.int8, eos_id=-1,
                        spec_tokens=spec_tokens, **dkw)
    # warmup wave: compile the per-bucket steps + prefill shapes before the
    # timed drain (one compile is 20-40s through the tunnel and would
    # dominate the wall number)
    for p in prompts[:min(2, len(prompts))]:
        eng.submit(list(p), max_new_tokens=max_new)
    warm = 0
    while warm < min(2, len(prompts)):
        warm += len([1 for (_, _, done) in eng.step() if done])
    for p in prompts:
        eng.submit(list(p), max_new_tokens=max_new)
    t0 = time.perf_counter()
    ndone = 0
    while ndone < len(prompts):
        ndone += len([1 for (_, _, done) in eng.step() if done])
    wall = time.perf_counter() - t0
    stats = eng.stats()
    toks = len(prompts) * max_new
    return {"wall_s": wall, "tok_per_s_wall": toks / wall,
            "decode_steps": stats.get("decode_steps", None),
            "mean_step_ms": stats.get("mean_step_ms", None),
            "draft_acceptance": stats.get("draft_acceptance", None)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/runs/bp-mini-r3")
    ap.add_argument("--draft-workdir", default="",
                    help="trained draft checkpoint (e.g. backpack-micro) "
                         "for a model-draft arm")
    ap.add_argument("--draft-model", default="backpack-micro")
    ap.add_argument("--corpus", default="/tmp/bigram6m.npy")
    ap.add_argument("--model", default="backpack-mini")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--rel-cost", type=float, default=None,
                    help="t_verify/t_plain from bench_spec_step.py")
    ap.add_argument("--draft-rel-cost", type=float, default=0.05,
                    help="one draft-model decode step / one target step "
                         "(cache-stream ratio; nano-for-mini ~0.05)")
    ap.add_argument("--spec-json", default="bench_results/spec_r3.json")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from backpacks_flash_attn_tpu.data import lm_dataset as lmd
    tokens = lmd.load_corpus(args.corpus)
    cfg, params = load_params(args)
    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(tokens) - args.prompt, args.requests)
    prompts = [np.asarray(tokens[s:s + args.prompt], np.int32)
               for s in starts]

    res = {"k": args.k, "requests": args.requests, "slots": args.slots,
           "prompt": args.prompt, "max_new": args.max_new}
    res["plain"] = run_engine(params, cfg, prompts, spec_tokens=0,
                              max_new=args.max_new, slots=args.slots)
    print("plain :", json.dumps(res["plain"]), flush=True)
    res["spec"] = run_engine(params, cfg, prompts, spec_tokens=args.k,
                             max_new=args.max_new, slots=args.slots)
    print("spec  :", json.dumps(res["spec"]), flush=True)
    if args.draft_workdir:
        import copy
        dargs = copy.copy(args)
        dargs.workdir, dargs.model = args.draft_workdir, args.draft_model
        dcfg, dparams = load_params(dargs)
        res["spec_model_draft"] = run_engine(
            params, cfg, prompts, spec_tokens=args.k,
            max_new=args.max_new, slots=args.slots, draft=(dcfg, dparams))
        print("mdraft:", json.dumps(res["spec_model_draft"]), flush=True)
    res["wall_speedup"] = (res["spec"]["tok_per_s_wall"]
                           / res["plain"]["tok_per_s_wall"])
    if "spec_model_draft" in res:
        res["model_draft_wall_speedup"] = (
            res["spec_model_draft"]["tok_per_s_wall"]
            / res["plain"]["tok_per_s_wall"])

    rel = args.rel_cost
    if rel is None and os.path.exists(args.spec_json):
        with open(args.spec_json) as f:
            rel = json.load(f).get("rel_cost")
    macc = res.get("spec_model_draft", {}).get("draft_acceptance")
    if rel is not None and macc is not None:
        # model-draft pays the draft model's decode on top of the verify:
        # k draft steps per verification at draft_rel_cost each
        res["draft_rel_cost"] = args.draft_rel_cost
        res["model_draft_projected_onchip_speedup"] = (
            (1.0 + float(macc) * args.k)
            / (rel + args.k * args.draft_rel_cost))
    acc = res["spec"]["draft_acceptance"]
    if rel is not None and acc is not None:
        # engine acceptance is accepted/proposed in [0,1] with k proposed
        # per verification, so each verification emits 1 + acc*k tokens for
        # rel x the cost of a plain step
        res["rel_cost"] = rel
        res["projected_onchip_speedup"] = (1.0 + float(acc) * args.k) / rel
    print(json.dumps(res), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
