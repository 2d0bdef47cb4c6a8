"""Training-harness tests: EMA, checkpointing (periodic / crash auto-save /
resume), callbacks, and the end-to-end train CLI (smoke + resume).

Reference equivalents these mirror: src/utils/ema.py + callbacks/ema.py,
src/callbacks/model_checkpoint.py:8-17, src/train.py:70-93,
src/callbacks/{speed_monitor,norm_monitor,causality_monitor,flop_count}.py.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.training import callbacks as cb
from backpacks_flash_attn_tpu.training import checkpoint as ckpt
from backpacks_flash_attn_tpu.training import ema as ema_lib


# ------------------------------------------------------------------ EMA

def test_ema_warmup_and_convergence():
    params = {"w": jnp.zeros((3,)), "step_count": jnp.asarray(0, jnp.int32)}
    state = ema_lib.init_ema(params)
    target = {"w": jnp.ones((3,)), "step_count": jnp.asarray(5, jnp.int32)}
    # first update: d = min(0.999, 2/11) -> shadow moves most of the way
    state = ema_lib.ema_update(state, target, 0.999)
    np.testing.assert_allclose(np.asarray(state.shadow["w"]),
                               np.full(3, 1 - 2 / 11), rtol=1e-6)
    # integer leaves are copied, not averaged
    assert int(state.shadow["step_count"]) == 5
    for _ in range(200):
        state = ema_lib.ema_update(state, target, 0.9)
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), 1.0, atol=1e-5)


# ------------------------------------------------------------- checkpoint

def _tiny_state():
    return {"params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}},
            "step": jnp.asarray(7, jnp.int32)}


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state()
    path = ckpt.save(str(tmp_path), state, step=7)
    restored, step, meta = ckpt.restore(path, state)
    assert step == 7
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                          np.asarray(b)),
                 state, restored)


def test_keep_last_pruning(tmp_path):
    state = _tiny_state()
    for s in range(5):
        ckpt.save(str(tmp_path), state, step=s, keep_last=2)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt.npz")]
    assert sorted(files) == ["step_00000003.ckpt.npz",
                             "step_00000004.ckpt.npz"]


def test_latest_prefers_newest_auto_save(tmp_path):
    state = _tiny_state()
    ckpt.save(str(tmp_path), state, step=10)
    # crash auto-save written AFTER the periodic one must win (reference
    # src/train.py:70-93)
    os.utime(ckpt.latest_checkpoint(str(tmp_path)), (0, 0))
    ckpt.save(str(tmp_path), state, step=11, name=ckpt.AUTO_SAVE)
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith(ckpt.AUTO_SAVE)


def test_auto_save_on_exception(tmp_path):
    state = _tiny_state()
    with pytest.raises(RuntimeError):
        with ckpt.auto_save_on_exception(str(tmp_path), lambda: state,
                                         lambda: 3):
            raise RuntimeError("boom")
    path = os.path.join(str(tmp_path), ckpt.AUTO_SAVE)
    assert os.path.exists(path)
    _, step, _ = ckpt.restore(path, state)
    assert step == 3


# ------------------------------------------------------------- callbacks

def test_speed_monitor():
    m = cb.SpeedMonitor()
    m.on_step_start()
    out = m.on_step_end(tokens_in_batch=100)
    assert out["time/intra_step_ms"] >= 0
    assert out["throughput/tokens_per_s"] > 0
    pre = m.on_step_start()
    assert "time/inter_step_ms" in pre


def test_norm_stats():
    tree = {"a": jnp.ones((2, 2)), "b": {"c": jnp.zeros((3,))},
            "n": jnp.asarray(1, jnp.int32)}
    out = cb.norm_stats(tree, "w")
    assert out["w/a"] == pytest.approx(2.0)
    assert out["w/b/c"] == 0.0
    assert out["w/total"] == pytest.approx(2.0)
    assert "w/n" not in out  # integer leaves skipped


def test_causality_monitor_on_backpack():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg.vocab_size)
    fwd = lambda x: bp.backpack_forward(params, cfg, x, use_flash=False)
    assert cb.causality_check(fwd, ids, probe_pos=5) < 1e-5


def test_flop_count():
    f = cb.flop_count(lambda x: x @ x, jnp.ones((64, 64)))
    if f is not None:  # cost analysis availability is backend-dependent
        assert f >= 2 * 64 ** 3 * 0.9


# ------------------------------------------------------------- train CLI

def test_train_cli_smoke_and_resume(tmp_path):
    from backpacks_flash_attn_tpu.data import lm_dataset as lmd
    from backpacks_flash_attn_tpu.training import train_cli

    tokens = np.random.default_rng(0).integers(0, 500, 6000).astype(np.uint16)
    corpus = lmd.save_corpus(tokens, str(tmp_path), "t")

    rc = train_cli.RunConfig(
        corpus=corpus, workdir=str(tmp_path / "run"), model="backpack-test",
        mode="train", steps=4, batch_size=2, seqlen=32, warmup_steps=2,
        ckpt_every=2, log_every=1, use_flash=False, ema_decay=0.99,
        val_fraction=0.05)
    out = train_cli.run(rc)
    assert out["steps"] == 4
    assert np.isfinite(out["final_metrics"]["loss"])
    assert np.isfinite(out["val"]["ppl"])
    # metrics got logged
    lines = [json.loads(l) for l in
             open(tmp_path / "run" / "metrics.jsonl")]
    assert any("loss" in l for l in lines)

    # resume: bump steps, run again — must pick up from the final checkpoint
    rc2 = train_cli.RunConfig(**{**rc.__dict__, "steps": 6})
    out2 = train_cli.run(rc2)
    assert out2["steps"] == 6
    steps_logged = [l["step"] for l in
                    open(tmp_path / "run" / "metrics.jsonl").readlines()
                    for l in [json.loads(l)]]
    assert 5 in steps_logged  # continued past the first run's last step


def test_train_cli_smoke_mode(tmp_path):
    from backpacks_flash_attn_tpu.data import lm_dataset as lmd
    from backpacks_flash_attn_tpu.training import train_cli

    tokens = np.random.default_rng(1).integers(0, 500, 4000).astype(np.uint16)
    corpus = lmd.save_corpus(tokens, str(tmp_path), "s")
    rc = train_cli.RunConfig(corpus=corpus, workdir=str(tmp_path / "smoke"),
                             model="backpack-test", mode="smoke",
                             batch_size=2, seqlen=16, use_flash=False)
    out = train_cli.run(rc)
    assert out["steps"] == 3
    # smoke mode writes no periodic checkpoints
    assert not [f for f in os.listdir(tmp_path / "smoke")
                if f.startswith("step_")]


def test_remat_matches_no_remat():
    """Rematerialized training (jax.checkpoint on blocks + alpha) must produce
    identical loss and gradients to the stored-activation path."""
    import optax
    from backpacks_flash_attn_tpu.training import train as tl

    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(1), (2, 17),
                                             0, cfg.vocab_size)}
    rng = jax.random.PRNGKey(2)
    want_loss = want_gn = None
    for remat, unroll in ((False, 1), (True, 1), ("dots", 1), (False, 4)):
        loss_fn = tl.make_loss_fn(cfg, use_flash=False, remat=remat,
                                  scan_unroll=unroll)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        if want_loss is None:
            want_loss, want_gn = float(loss), float(optax.global_norm(grads))
        else:
            np.testing.assert_allclose(float(loss), want_loss, rtol=1e-6)
            np.testing.assert_allclose(float(optax.global_norm(grads)),
                                       want_gn, rtol=1e-5)


def test_checkpoint_roundtrip_bfloat16(tmp_path):
    """bf16 leaves survive the npz roundtrip (np.savez stores ml_dtypes
    extension types as raw void bytes; restore must reinterpret them)."""
    from backpacks_flash_attn_tpu.training import checkpoint as ck
    state = {"w": jnp.arange(8, dtype=jnp.float32).astype(jnp.bfloat16),
             "b": jnp.ones((3,), jnp.float32), "n": jnp.int32(7)}
    ck.save(str(tmp_path), state, step=5)
    restored, step, _ = ck.restore(ck.latest_checkpoint(str(tmp_path)), state)
    assert step == 5
    assert restored["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(restored["w"], np.float32),
                                  np.arange(8, dtype=np.float32))


def test_lr_schedules():
    """Warmup + decay shapes for the three reference scheduler configs
    (linear-warmup.yaml, cosine-warmup-timm.yaml, invsqrt.yaml)."""
    from backpacks_flash_attn_tpu.training import train as tl

    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    for kind in ("linear", "cosine", "invsqrt"):
        s = tl.make_schedule(kind, lr=1.0, warmup_steps=10, total_steps=110)
        assert float(s(0)) == 0.0
        assert abs(float(s(10)) - 1.0) < 1e-6          # warmup peak
        assert float(s(5)) < 1.0                        # mid-warmup below peak
        end = float(s(109))
        assert 0.0 < end < 1.0                          # decayed
        if kind in ("linear", "cosine"):
            assert abs(float(s(110)) - 0.1) < 2e-2      # lands near floor
        # the optimizer builds and steps with each schedule
        tx = tl.make_optimizer(params, lr=1.0, warmup_steps=10,
                               total_steps=110, schedule=kind)
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        assert np.isfinite(float(jax.tree.leaves(updates)[0].sum()))
    with pytest.raises(ValueError):
        tl.make_schedule("nope", lr=1.0, warmup_steps=1, total_steps=2)


def test_train_cli_cp_smoke(tmp_path):
    """--cp: context-parallel training end-to-end through the CLI (dp=2 x
    cp=4 mesh, zigzag layout, flash ring, dropout in train mode)."""
    from backpacks_flash_attn_tpu.data import lm_dataset as lmd
    from backpacks_flash_attn_tpu.training import train_cli

    tokens = np.random.default_rng(2).integers(0, 500, 6000).astype(np.uint16)
    corpus = lmd.save_corpus(tokens, str(tmp_path), "c")
    rc = train_cli.RunConfig(corpus=corpus, workdir=str(tmp_path / "cp"),
                             model="backpack-test", mode="smoke",
                             batch_size=2, seqlen=32, dp=2, cp=4,
                             cp_layout="zigzag")
    out = train_cli.run(rc)
    assert out["steps"] == 3
    assert np.isfinite(out["final_metrics"]["loss"])


@pytest.mark.parametrize("daln_bf16", [False, True])
def test_train_cli_converges_toward_bigram_floor(tmp_path, daln_bf16,
                                                 monkeypatch):
    """Capstone end-to-end learning check: a tiny Backpack trained through
    the CLI on a sparse bigram corpus must close most of the gap between
    the uniform-prediction perplexity and the corpus's analytic entropy
    floor (the TPU runbook runs the full-scale version of this).

    daln_bf16=True reruns the gate with the bf16-saves fused DALN backward
    (BACKPACKS_DALN_BF16_SAVES) — the r3 dropout-rounds=1 precedent: save
    tricks that look clean in first-order stats can still hurt
    optimization, so the throughput lever only ships if this gate holds."""
    from backpacks_flash_attn_tpu.data import lm_dataset as lmd
    from backpacks_flash_attn_tpu.data.synthetic import bigram_corpus
    from backpacks_flash_attn_tpu.ops import norms
    from backpacks_flash_attn_tpu.training import train_cli

    monkeypatch.setattr(norms, "_DALN_BF16_SAVES", daln_bf16)
    vocab = 256
    toks, floor = bigram_corpus(60_000, vocab_size=vocab, n_successors=4,
                                seed=0)
    corpus = lmd.save_corpus(toks, str(tmp_path), "bg")
    rc = train_cli.RunConfig(
        corpus=corpus, workdir=str(tmp_path / "run"), model="backpack-test",
        mode="train", steps=150, batch_size=8, seqlen=32, warmup_steps=10,
        lr=3e-3, ckpt_every=0, log_every=50, use_flash=False,
        val_fraction=0.02)
    out = train_cli.run(rc)
    ppl = out["val"]["ppl"]
    floor_ppl = float(np.exp(floor))
    # uniform predictions sit at ~vocab; a learning model must land far
    # below that and within a small multiple of the floor
    assert ppl < vocab * 0.25, (ppl, floor_ppl)
    assert ppl < floor_ppl * 4.0, (ppl, floor_ppl)
