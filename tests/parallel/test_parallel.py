"""Distributed-equivalence test matrix on the virtual 8-device CPU mesh.

The reference runs its equivalents on a real 8-GPU host (torchrun +
apex parallel_state, tests/models/test_gpt_parallel.py:1-2): build the
sharded model and an identical single-device model, run both, assert logits
and grads match. JAX lets the same matrix run single-process (SURVEY.md
§4.3 notes this as a gap the TPU build closes for free).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from backpacks_flash_attn_tpu.config import BackpackConfig, backpack_test, gpt2_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.ops.cross_entropy import (
    cross_entropy, vocab_parallel_cross_entropy)
from backpacks_flash_attn_tpu.parallel import serving as pserve
from backpacks_flash_attn_tpu.parallel.mesh import make_mesh, shard_params
from backpacks_flash_attn_tpu.training import train as train_lib

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _tp_cfg():
    # dims divisible by tp=4: heads, senses, inner, vocab shards
    return BackpackConfig(vocab_size=512, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4, num_senses=4,
                          scale_attn_by_inverse_layer_idx=True,
                          pad_vocab_size_multiple=8)


def test_tp_backpack_forward_matches_single():
    """TP-sharded forward == single-device forward (the reference's
    test_gpt_parallel.py:72-90 pattern, minus the hand-copied shards)."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    want = np.asarray(bp.backpack_forward(params, cfg, ids, use_flash=False))

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sharded = shard_params(params, cfg, mesh)
        got = jax.jit(lambda p, i: bp.backpack_forward(p, cfg, i,
                                                       use_flash=False),
                      in_shardings=(None, NamedSharding(mesh, P("data", None)))
                      )(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_tp_train_step_matches_single():
    """One sharded train step must produce the same loss/grad-norm as the
    unsharded step from the same state."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tx = train_lib.make_optimizer(params, warmup_steps=2, total_steps=10)
    batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(2), (4, 17),
                                             0, cfg.vocab_size)}
    rng = jax.random.PRNGKey(3)

    plain_step = train_lib.make_train_step(cfg, tx, use_flash=False)
    state0 = train_lib.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
    _, want = plain_step(state0, batch, rng)

    mesh = make_mesh(data=2, model=4)
    step_fn, sharded_init = train_lib.make_sharded_train_step(
        cfg, tx, mesh, use_flash=False)
    with mesh:
        state = sharded_init(params)
        _, got = step_fn(state, batch, rng)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got["grad_norm"]),
                               float(want["grad_norm"]), rtol=1e-4)


def test_vocab_parallel_cross_entropy_matches_dense():
    """Sharded-LSE vocab-parallel CE == dense CE (the math of reference
    losses/cross_entropy.py:61-90, run under shard_map)."""
    from jax import shard_map
    rng = np.random.default_rng(0)
    b, s, V = 2, 6, 64
    logits = jnp.asarray(rng.normal(size=(b, s, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (b, s)))
    labels = labels.at[0, 0].set(-100)          # ignore_index path
    want, _ = cross_entropy(logits, labels)

    mesh = make_mesh(data=1, model=8)
    f = shard_map(
        lambda lg, lb: vocab_parallel_cross_entropy(lg, lb, "model"),
        mesh=mesh, in_specs=(P(None, None, "model"), P(None, None)),
        out_specs=P(None, None))
    got = f(logits, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_vocab_parallel_ce_label_smoothing():
    from jax import shard_map
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 64, (4,)))
    want, _ = cross_entropy(logits, labels, label_smoothing=0.1)
    mesh = make_mesh(data=1, model=8)
    f = shard_map(
        lambda lg, lb: vocab_parallel_cross_entropy(lg, lb, "model",
                                                    label_smoothing=0.1),
        mesh=mesh, in_specs=(P(None, "model"), P(None,)), out_specs=P(None,))
    got = f(logits, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize("tp_params", [False, True])
def test_dp_sharded_ragged_decode_matches_single(tp_params):
    """Slot-sharded (continuous batching over 'data') decode must equal the
    single-device per-slot decode token-for-token."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    B, S, steps = 4, 24, 3
    prompts = [jnp.asarray(rng.integers(0, cfg.vocab_size, n), jnp.int32)
               for n in (3, 7, 5, 4)]

    def build_cache():
        big = bp.init_backpack_cache(cfg, B, S, dtype=jnp.float32,
                                     per_slot=True)
        toks = []
        for i, p in enumerate(prompts):
            small = bp.init_backpack_cache(cfg, 1, S, dtype=jnp.float32)
            logits, small = bp.backpack_forward_with_cache(
                params, cfg, p[None], small, use_flash=False)
            big = bp.insert_cache_slot(big, small, i)
            toks.append(int(jnp.argmax(logits[0, -1])))
        return big, jnp.asarray(toks, jnp.int32)[:, None]

    # single-device oracle
    cache, toks = build_cache()
    want = []
    for _ in range(steps):
        logits, cache = bp.backpack_forward_with_cache(params, cfg, toks,
                                                       cache, use_flash=False)
        toks = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        want.append(np.asarray(toks[:, 0]))

    # sharded decode over a (data=4, model=2) mesh
    mesh = make_mesh(data=4, model=2 if tp_params else 1)
    step, prepare = pserve.make_sharded_decode_step(cfg, mesh,
                                                    use_flash=False,
                                                    tp_params=tp_params)
    cache, toks = build_cache()
    with mesh:
        sp, cache = prepare(params, cache)
        for t in range(steps):
            logits, cache = step(sp, toks, cache)
            toks = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(toks[:, 0]), want[t])


def test_zero1_optimizer_sharding_matches_single():
    """ZeRO-1 (optimizer moments sharded over 'data') must train identically
    to the unsharded step, with the moments actually sharded (reference
    utils/ddp_zero1.py's apex DistributedFusedAdam equivalence)."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tx = train_lib.make_optimizer(params, warmup_steps=2, total_steps=10)
    batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(2), (4, 17),
                                             0, cfg.vocab_size)}
    rng = jax.random.PRNGKey(3)

    plain_step = train_lib.make_train_step(cfg, tx, use_flash=False)
    state0 = train_lib.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
    plain_state, want = plain_step(state0, batch, rng)

    mesh = make_mesh(data=4, model=2)
    step_fn, sharded_init = train_lib.make_sharded_train_step(
        cfg, tx, mesh, use_flash=False, zero1=True)
    with mesh:
        state = sharded_init(params)
        # the big moments ARE sharded over data
        mu_wte = state.opt_state[1][0].mu["gpt"]["wte"]
        assert "data" in jax.tree.leaves(
            [ax for ax in mu_wte.sharding.spec if ax is not None])
        state, got = step_fn(state, batch, rng)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-5)
    # updated params match the unsharded run
    np.testing.assert_allclose(
        np.asarray(state.params["gpt"]["wte"]),
        np.asarray(plain_state.params["gpt"]["wte"]), rtol=1e-4, atol=1e-6)


def test_zero2_gradient_sharding_matches_single():
    """ZeRO-2 (grads reduce-scattered over 'data' + sharded moments) must
    train identically to the unsharded step (reference
    utils/ddp_zero2.py:21-128 equivalence)."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tx = train_lib.make_optimizer(params, warmup_steps=2, total_steps=10)
    batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(2), (4, 17),
                                             0, cfg.vocab_size)}
    rng = jax.random.PRNGKey(3)

    plain_step = train_lib.make_train_step(cfg, tx, use_flash=False)
    state0 = train_lib.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
    plain_state, want = plain_step(state0, batch, rng)

    mesh = make_mesh(data=4, model=2)
    step_fn, sharded_init = train_lib.make_sharded_train_step(
        cfg, tx, mesh, use_flash=False, zero2=True)
    with mesh:
        # copy params: the donating step may consume buffers aliased by
        # device_put, and we reuse `params` for the plain-state comparison
        state, got0 = step_fn(sharded_init(jax.tree.map(jnp.array, params)),
                              batch, rng)
        wte_after_1 = np.asarray(state.params["gpt"]["wte"])
        # further steps exercise donation + re-sharding stability
        for _ in range(2):
            state, _ = step_fn(state, batch, rng)
        assert np.isfinite(np.asarray(state.params["gpt"]["wte"])).all()
    np.testing.assert_allclose(float(got0["loss"]), float(want["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        wte_after_1,
        np.asarray(plain_state.params["gpt"]["wte"]), rtol=1e-4, atol=1e-6)


def test_zero3_fsdp_param_sharding_matches_single():
    """ZeRO-3/FSDP (params themselves sharded over 'data'; beyond the
    reference, whose deepest level is ZeRO-2): identical training to the
    unsharded step, with the big params actually data-sharded."""
    cfg = _tp_cfg()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tx = train_lib.make_optimizer(params, warmup_steps=2, total_steps=10)
    batch = {"input_ids": jax.random.randint(jax.random.PRNGKey(2), (4, 17),
                                             0, cfg.vocab_size)}
    rng = jax.random.PRNGKey(3)

    plain_step = train_lib.make_train_step(cfg, tx, use_flash=False)
    state0 = train_lib.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
    plain_state, want = plain_step(state0, batch, rng)

    mesh = make_mesh(data=4, model=2)
    step_fn, sharded_init = train_lib.make_sharded_train_step(
        cfg, tx, mesh, use_flash=False, zero3=True)
    with mesh:
        state = sharded_init(jax.tree.map(jnp.array, params))
        # params AND moments are data-sharded (vocab-sharded wte gains
        # 'data' on its free d axis; layer kernels on a free dim)
        wte_spec = [ax for ax in state.params["gpt"]["wte"].sharding.spec
                    if ax is not None]
        assert any("data" in (ax if isinstance(ax, tuple) else (ax,))
                   for ax in wte_spec), wte_spec
        mu_wte = state.opt_state[1][0].mu["gpt"]["wte"]
        mu_spec = [ax for ax in mu_wte.sharding.spec if ax is not None]
        assert any("data" in (ax if isinstance(ax, tuple) else (ax,))
                   for ax in mu_spec), mu_spec
        state, got = step_fn(state, batch, rng)
        wte_after_1 = np.asarray(state.params["gpt"]["wte"])
        state, _ = step_fn(state, batch, rng)   # donation stability
        assert np.isfinite(np.asarray(state.params["gpt"]["wte"])).all()
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        wte_after_1,
        np.asarray(plain_state.params["gpt"]["wte"]), rtol=1e-4, atol=1e-6)
