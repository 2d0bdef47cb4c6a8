"""Training CLI: the typed-config replacement for the reference's Hydra +
Lightning harness (reference: training/run.py:33-66, src/train.py:32-136).

Capabilities mapped:
  * mode=train|smoke|profile (reference configs/mode/*.yaml): smoke runs a few
    steps with no checkpoints; profile wraps steps in a jax.profiler trace
  * resume from the newest of periodic/auto-save checkpoints
    (src/train.py:70-93) including optimizer state, EMA, and the data-stream
    sampler position
  * crash auto-save (src/callbacks/model_checkpoint.py:8-17)
  * speed/norm monitors, FLOP count at start, CSV/JSONL metrics logging
  * DP x TP sharding over a Mesh instead of DDP process groups

Usage:
    python -m backpacks_flash_attn_tpu.training.train_cli \
        --corpus tokens.npy --model backpack-micro --steps 1000 \
        --batch-size 8 --seqlen 512 --workdir runs/bp-micro
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_lib
from ..data import lm_dataset as lmd
from ..models import backpack as bp_lib
from ..models import gpt as gpt_lib
from ..parallel.mesh import make_mesh
from . import callbacks as cb
from . import checkpoint as ckpt_lib
from . import ema as ema_lib
from . import train as train_lib


@dataclasses.dataclass
class RunConfig:
    corpus: str
    workdir: str = "runs/default"
    model: str = "backpack-micro"     # or gpt2-small / *-test
    mode: str = "train"               # train | smoke | profile
    steps: int = 1000
    batch_size: int = 8
    seqlen: int = 512
    lr: float = 6e-4
    lr_schedule: str = "linear"       # linear | cosine | invsqrt
    warmup_steps: int = 1000
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    accum_steps: int = 1
    seed: int = 0
    dp: int = 1
    tp: int = 1
    cp: int = 1                       # context-parallel ring size ('seq' axis)
    cp_layout: str = "natural"        # natural | zigzag (load-balanced)
    cp_attn_impl: str = "flash"       # flash | einsum ring inner block
    use_flash: bool = True
    remat: str = "none"               # none | full | dots (models/gpt.remat_wrap)
    scan_unroll: int = 1              # unroll the layer scans (n_layer = no
                                      # dynamic-update-slice activation stacking)
    zero1: bool = False               # shard optimizer moments over dp
    zero2: bool = False               # + reduce-scatter grads (implies zero1)
    zero3: bool = False               # FSDP: shard the params themselves
    ema_decay: float = 0.0            # 0 disables EMA
    ckpt_every: int = 1000
    keep_last: int = 3
    log_every: int = 10
    val_fraction: float = 0.0005      # tail of the corpus held out for ppl
    eval_every: int = 0               # 0 = only at end
    dtype: str = "float32"


_MODELS = {
    "backpack-nano": config_lib.backpack_nano,
    "backpack-micro": config_lib.backpack_micro,
    "backpack-mini": config_lib.backpack_mini,
    "backpack-small": config_lib.backpack_small,
    "backpack-test": config_lib.backpack_test,
    "gpt2-small": config_lib.gpt2_small,
    "gpt2-medium": config_lib.gpt2_medium,
    "gpt2-test": config_lib.gpt2_test,
}


def build_model(rc: RunConfig):
    if rc.model not in _MODELS:
        raise SystemExit(f"unknown --model {rc.model!r}; choose from "
                         f"{sorted(_MODELS)}")
    cfg = _MODELS[rc.model]()
    kind = "backpack" if rc.model.startswith("backpack") else "gpt"
    init = (bp_lib.init_backpack if kind == "backpack"
            else gpt_lib.init_gpt_lm)
    params = init(cfg, jax.random.PRNGKey(rc.seed),
                  dtype=config_lib.DTYPE_MAP[rc.dtype])
    return cfg, kind, params


def run(rc: RunConfig) -> Dict[str, Any]:
    os.makedirs(rc.workdir, exist_ok=True)
    tokens = lmd.load_corpus(rc.corpus)
    n_val = max(int(len(tokens) * rc.val_fraction), rc.seqlen + 1)
    train_tokens, val_tokens = tokens[:-n_val], tokens[-n_val:]

    cfg, kind, params = build_model(rc)
    tx_kw = dict(lr=rc.lr, weight_decay=rc.weight_decay,
                 warmup_steps=rc.warmup_steps, total_steps=rc.steps,
                 grad_clip=rc.grad_clip, accum_steps=rc.accum_steps,
                 schedule=rc.lr_schedule)
    if rc.cp > 1:
        # context-parallel training: sequence sharded over a 'seq' mesh axis
        # (parallel/cp_train.py); composes with DP, not with TP/ZeRO here
        assert rc.tp == 1 and not (rc.zero1 or rc.zero2 or rc.zero3),             "--cp composes with --dp only (TP/ZeRO: use the pjit path)"
        assert kind == "backpack", "--cp currently drives the Backpack model"
        assert rc.accum_steps == 1, "--cp does not support --accum-steps"
        from ..parallel import cp_train as cp_lib
        devs = np.asarray(jax.devices()[:rc.dp * rc.cp]).reshape(rc.dp, rc.cp)
        mesh = jax.sharding.Mesh(devs, ("data", "seq"))
        tx = train_lib.make_optimizer(params, **tx_kw)
        step_fn, sharded_init = cp_lib.make_cp_sharded_train_step(
            cfg, tx, mesh, attn_impl=rc.cp_attn_impl, layout=rc.cp_layout)
    else:
        mesh = make_mesh(data=rc.dp, model=rc.tp)
        tx = train_lib.make_optimizer(params, **tx_kw)
        step_fn, sharded_init = train_lib.make_sharded_train_step(
            cfg, tx, mesh, model=kind, use_flash=rc.use_flash, remat=rc.remat,
            scan_unroll=rc.scan_unroll, zero1=rc.zero1, zero2=rc.zero2,
            zero3=rc.zero3)

    sampler = lmd.SamplerState(seed=rc.seed)
    ema = ema_lib.init_ema(params) if rc.ema_decay > 0 else None

    with mesh:
        state = sharded_init(params)
    start_step = 0
    latest = ckpt_lib.latest_checkpoint(rc.workdir)
    if latest and rc.mode == "train":
        template = {"state": state} | ({"ema": ema} if ema else {})
        restored, start_step, meta = ckpt_lib.restore(latest, template)
        state = restored["state"]
        ema = restored.get("ema", ema)
        s = meta.get("sampler", {})
        sampler = lmd.SamplerState(seed=s.get("seed", rc.seed),
                                   epoch=s.get("epoch", 0),
                                   counter=s.get("counter", 0))
        print(f"resumed from {latest} at step {start_step}")

    steps = 3 if rc.mode == "smoke" else rc.steps
    logger = cb.MetricsLogger(os.path.join(rc.workdir, "metrics.jsonl"),
                              print_every=rc.log_every)
    speed = cb.SpeedMonitor()
    ds = lmd.LMDataset(train_tokens, rc.seqlen)
    stream = lmd.batches(ds, rc.batch_size, sampler)
    rng = jax.random.PRNGKey(rc.seed + 1)

    flops = cb.flop_count(
        lambda s, b: step_fn(s, b, rng),
        state, {"input_ids": jnp.zeros((rc.batch_size, rc.seqlen + 1),
                                       jnp.int32)})
    if flops:
        logger.log(start_step, {"flops_per_step": flops})

    def current_state():
        return {"state": state} | ({"ema": ema} if ema else {})

    profile_ctx = None
    if rc.mode == "profile":
        profile_dir = os.path.join(rc.workdir, "profile")
        jax.profiler.start_trace(profile_dir)
        profile_ctx = profile_dir

    metrics: Dict[str, Any] = {}
    with mesh, ckpt_lib.auto_save_on_exception(
            rc.workdir, current_state, lambda: int(state.step),
            meta={"sampler": dataclasses.asdict(sampler)}):
        for i in range(start_step, steps):
            pre = speed.on_step_start()
            (x, y), sampler = next(stream)
            # the loss fn splits ids[:, :-1] / ids[:, 1:], so rebuild the
            # (b, L+1) window from (x, y): window = [x, y[:, -1:]]
            batch = {"input_ids": jnp.asarray(
                np.concatenate([x, y[:, -1:]], axis=1))}
            state, metrics = step_fn(state, batch, rng)
            if ema is not None:
                ema = ema_lib.ema_update(ema, state.params, rc.ema_decay)
            post = speed.on_step_end(tokens_in_batch=x.size)
            if i % rc.log_every == 0 or i == steps - 1:
                logged = {k: float(v) for k, v in metrics.items()}
                logged.update(pre); logged.update(post)
                logger.log(i, logged)
            if rc.mode == "train" and rc.ckpt_every and \
                    (i + 1) % rc.ckpt_every == 0:
                ckpt_lib.save(rc.workdir, current_state(), step=i + 1,
                              meta={"sampler": dataclasses.asdict(sampler)},
                              keep_last=rc.keep_last)

    if profile_ctx:
        jax.profiler.stop_trace()
        print(f"profile written to {profile_ctx}")
        from ..utils.benchmark import print_trace_summary
        print_trace_summary(profile_ctx, top=10, steps=steps)

    # final checkpoint + validation perplexity
    if rc.mode == "train":
        ckpt_lib.save(rc.workdir, current_state(), step=steps,
                      meta={"sampler": dataclasses.asdict(sampler)},
                      keep_last=rc.keep_last)
    from ..eval.perplexity import evaluate_perplexity
    eval_params = ema.shadow if ema is not None else state.params
    fwd = ((lambda p, x: bp_lib.backpack_forward(p, cfg, x,
                                                 use_flash=rc.use_flash))
           if kind == "backpack" else
           (lambda p, x: gpt_lib.gpt_lm_forward(p, cfg, x,
                                                use_flash=rc.use_flash)))
    val = evaluate_perplexity(fwd, val_tokens, rc.seqlen,
                              min(rc.batch_size, 4), max_batches=50,
                              params=eval_params)
    logger.log(steps, {f"val/{k}": v for k, v in val.items()})
    logger.close()
    return {"final_metrics": {k: float(v) for k, v in metrics.items()},
            "val": val, "steps": steps}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    for f in dataclasses.fields(RunConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true"),
                           default=f.default)
        else:
            kw = {"required": True} if f.default is dataclasses.MISSING \
                else {"default": f.default}
            typ = type(f.default) if f.default is not dataclasses.MISSING \
                else str
            p.add_argument(flag, type=typ, **kw)
    args = p.parse_args(argv)
    out = run(RunConfig(**vars(args)))
    print(out)


if __name__ == "__main__":
    main()
