"""Pipeline-parallel (GPipe) training vs the single-device oracle.

The reference has no pipeline parallelism (training/flash_attn_README.md:
22-27 scales DP/TP only); these tests pin the shard_map + ppermute pipeline
(parallel/pipeline.py) to the exact loss and gradients of the plain forward
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.ops.cross_entropy import cross_entropy_loss
from backpacks_flash_attn_tpu.parallel import pipeline as pp
from backpacks_flash_attn_tpu.parallel.mesh import make_mesh


def _mesh(data, stage):
    devs = np.asarray(jax.devices()[:data * stage]).reshape(data, stage)
    return jax.sharding.Mesh(devs, ("data", "stage"))


@pytest.fixture(scope="module")
def setup():
    from backpacks_flash_attn_tpu.config import BackpackConfig
    cfg = BackpackConfig(vocab_size=512, n_positions=128, n_embd=64, n_head=4,
                         n_layer=4, num_senses=4,
                         scale_attn_by_inverse_layer_idx=True,
                         pad_vocab_size_multiple=8, embd_pdrop=0.0,
                         resid_pdrop=0.0, attn_pdrop=0.0)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 33), 0,
                             cfg.vocab_size)
    return cfg, params, ids


def _oracle_loss(params, cfg, ids, use_flash):
    logits = bp.backpack_forward(params, cfg, ids[:, :-1],
                                 use_flash=use_flash)
    return cross_entropy_loss(logits, ids[:, 1:])


@pytest.mark.parametrize("data,stage,n_micro", [(2, 4, 2), (1, 4, 4),
                                                (4, 2, 1)])
def test_pp_loss_matches_oracle(setup, data, stage, n_micro):
    cfg, params, ids = setup
    mesh = _mesh(data, stage)
    loss_fn = pp.make_pp_loss_fn(cfg, mesh, n_micro=n_micro, use_flash=False)
    staged = pp.pp_params(params, cfg, stage)
    with mesh:
        got = float(jax.jit(loss_fn)(staged, ids))
    want = float(_oracle_loss(params, cfg, ids, use_flash=False))
    assert got == pytest.approx(want, rel=2e-5), (got, want)


def test_pp_grads_match_oracle(setup):
    cfg, params, ids = setup
    mesh = _mesh(2, 4)
    loss_fn = pp.make_pp_loss_fn(cfg, mesh, n_micro=2, use_flash=False)
    staged = pp.pp_params(params, cfg, 4)
    with mesh:
        g_pp = jax.jit(jax.grad(loss_fn))(staged, ids)
    g_pp = pp.unstage_params(jax.device_get(g_pp), cfg)
    g_ref = jax.grad(lambda p: _oracle_loss(p, cfg, ids, use_flash=False))(
        params)
    ref_leaves = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    for path, g in jax.tree_util.tree_leaves_with_path(g_pp):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(ref_leaves[path],
                                                  np.float64),
            atol=2e-5, rtol=2e-4, err_msg=jax.tree_util.keystr(path))


def test_pp_param_roundtrip(setup):
    cfg, params, _ = setup
    staged = pp.pp_params(params, cfg, 2)
    back = pp.unstage_params(staged, cfg)
    for path, x in jax.tree_util.tree_leaves_with_path(back):
        np.testing.assert_array_equal(
            np.asarray(x),
            np.asarray(dict(jax.tree_util.tree_leaves_with_path(params))[path]))


def test_pp_train_step_reduces_loss(setup):
    cfg, params, ids = setup
    from backpacks_flash_attn_tpu.training import train as train_lib
    mesh = _mesh(2, 4)
    tx = train_lib.make_optimizer(params, lr=1e-2, warmup_steps=1,
                                  total_steps=10)
    step, prepare = pp.make_pp_train_step(cfg, tx, mesh, n_micro=2,
                                          use_flash=False)
    with mesh:
        staged, opt_state = prepare(params)
        losses = []
        for _ in range(3):
            staged, opt_state, loss = step(staged, opt_state, ids)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(l) for l in losses)
