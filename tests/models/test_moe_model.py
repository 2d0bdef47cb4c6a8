"""Switch-MoE as a model capability (cfg.moe_experts > 0): GPT and Backpack
stacks with top-1-routed expert MLPs, balance loss in the training loss,
expert parallelism over the 'model' mesh axis, and drop-free inference so
cached decode matches the full forward exactly. The reference has no MoE
(SURVEY.md §2.7 'EP: none')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import BackpackConfig, GPTConfig
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.training import train as train_lib


def _gpt_cfg(**kw):
    return GPTConfig(vocab_size=128, n_positions=32, n_embd=32, n_head=2,
                     n_layer=2, n_inner=64, pad_vocab_size_multiple=8,
                     embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
                     moe_experts=4, **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = _gpt_cfg()
    params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0,
                             cfg.vocab_size)
    return cfg, params, ids


def test_moe_forward_shapes_and_aux(setup):
    cfg, params, ids = setup
    assert "moe" in jax.tree_util.tree_structure(
        params["layers"]).unflatten(jax.tree.leaves(params["layers"]))
    logits, aux = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)
    assert logits.shape == (2, 24, cfg.padded_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # Switch balance loss is ~1 near-uniform routing, and >= 1 always
    assert 0.9 <= float(aux) < float(cfg.moe_experts)


def test_moe_cached_decode_matches_full(setup):
    """Drop-free inference: prefill + single-token steps == full forward."""
    cfg, params, ids = setup
    full, _ = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)
    cache = gpt_lib.init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    pre, cache = gpt_lib.gpt_forward_with_cache(params, cfg, ids[:, :20],
                                                cache, use_flash=False)
    pre_logits = gpt_lib.lm_logits(params, cfg, pre)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full[:, :20]), atol=1e-4,
                               rtol=1e-4)
    for t in range(20, 24):
        h, cache = gpt_lib.gpt_forward_with_cache(params, cfg, ids[:, t:t+1],
                                                  cache, use_flash=False)
        np.testing.assert_allclose(
            np.asarray(gpt_lib.lm_logits(params, cfg, h)[:, 0]),
            np.asarray(full[:, t]), atol=1e-4, rtol=1e-4)


def test_moe_train_step_reduces_loss(setup):
    cfg, _, ids = setup
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(2))
    tx = train_lib.make_optimizer(params, lr=1e-2, warmup_steps=1,
                                  total_steps=10)
    step = jax.jit(train_lib.make_train_step(cfg, tx, model="gpt",
                                             use_flash=False))
    state = train_lib.TrainState(params, tx.init(params),
                                 jnp.zeros((), jnp.int32))
    batch = {"input_ids": jnp.concatenate([ids, ids[:, -1:]], axis=1)}
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(l) for l in losses)


def test_moe_expert_parallel_matches_single_device(setup):
    """EP over the 'model' axis: sharded train-step loss == unsharded."""
    from backpacks_flash_attn_tpu.parallel.mesh import make_mesh
    cfg, _, ids = setup
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(4))
    tx = train_lib.make_optimizer(params, warmup_steps=2, total_steps=10)
    batch = {"input_ids": jnp.concatenate([ids, ids[:, -1:]], axis=1)}
    rng = jax.random.PRNGKey(5)

    plain = train_lib.make_train_step(cfg, tx, model="gpt", use_flash=False)
    state0 = train_lib.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
    _, want = plain(state0, batch, rng)

    mesh = make_mesh(data=2, model=4)
    step_fn, sharded_init = train_lib.make_sharded_train_step(
        cfg, tx, mesh, model="gpt", use_flash=False)
    with mesh:
        state = sharded_init(jax.tree.map(jnp.copy, params))
        _, got = step_fn(state, batch, rng)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got["grad_norm"]),
                               float(want["grad_norm"]), rtol=1e-4)


def test_moe_backpack_forward_and_train():
    cfg = BackpackConfig(vocab_size=128, n_positions=32, n_embd=32, n_head=2,
                         n_layer=2, n_inner=64, num_senses=2,
                         pad_vocab_size_multiple=8, embd_pdrop=0.0,
                         resid_pdrop=0.0, attn_pdrop=0.0, moe_experts=4)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 128)
    logits, aux = bp.backpack_forward(params, cfg, ids[:, :-1],
                                      use_flash=False)
    assert logits.shape[0:2] == (2, 16)
    assert np.isfinite(float(aux))
    tx = train_lib.make_optimizer(params, lr=1e-2, warmup_steps=1,
                                  total_steps=10)
    step = jax.jit(train_lib.make_train_step(cfg, tx, model="backpack",
                                             use_flash=False))
    state = train_lib.TrainState(params, tx.init(params),
                                 jnp.zeros((), jnp.int32))
    batch = {"input_ids": ids}
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_moe_backpack_serves():
    """A MoE Backpack under the continuous-batching engine (bf16-free f32
    cache on CPU): greedy output matches the direct cached decode."""
    from backpacks_flash_attn_tpu.serving.engine import ServingEngine
    cfg = BackpackConfig(vocab_size=128, n_positions=32, n_embd=32, n_head=2,
                         n_layer=2, n_inner=64, num_senses=2,
                         pad_vocab_size_multiple=8, embd_pdrop=0.0,
                         resid_pdrop=0.0, attn_pdrop=0.0, moe_experts=4)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.float32)
    prompt = [3, 1, 4, 1, 5]
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    rid = eng.submit(prompt, max_new_tokens=6)
    got = eng.run()[rid].tokens
    cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None], cache,
        use_flash=False)
    want, tok = [], int(jnp.argmax(logits[0, -1]))
    for _ in range(6):
        want.append(tok)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
            use_flash=False)
        tok = int(jnp.argmax(logits[0, -1]))
    assert got == want


def test_moe_quantized_serving():
    """INT8-quantized MoE Backpack (expert FFNs INT8 via
    quantize_moe_params' convert-fused einsums) serves under the engine with
    an int8-free f32 cache on CPU and finite logits."""
    from backpacks_flash_attn_tpu.models import quantized as qz
    from backpacks_flash_attn_tpu.serving.engine import ServingEngine
    cfg = BackpackConfig(vocab_size=128, n_positions=32, n_embd=32, n_head=2,
                         n_layer=2, n_inner=64, num_senses=2,
                         pad_vocab_size_multiple=8, embd_pdrop=0.0,
                         resid_pdrop=0.0, attn_pdrop=0.0, moe_experts=4)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = qz.quantize_backpack_params(params, cfg, bits=8,
                                          act_dtype=jnp.float32)
    eng = ServingEngine(qparams, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    rid = eng.submit([3, 1, 4, 1], max_new_tokens=5)
    got = eng.run()[rid].tokens
    assert len(got) == 5 and all(0 <= t < cfg.padded_vocab_size for t in got)
