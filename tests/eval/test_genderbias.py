"""Gender-bias experiment tests (reference: test_genderbias.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import genderbias as gb
from backpacks_flash_attn_tpu.models import backpack as bp


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test().replace(num_senses=16)  # sense 10 must exist
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 77, 9], [12, 77, 40, 6]]   # token 77 = the "job" noun
    return cfg, params, prompts


def test_percent1_is_identity(setup):
    cfg, params, prompts = setup
    lg1 = gb.pronoun_logits(params, cfg, prompts[0], job_ids=[77],
                            percent=1.0, use_flash=False)
    base = bp.backpack_forward(params, cfg,
                               jnp.asarray(prompts[0], jnp.int32)[None],
                               use_flash=False)[0, -1]
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(base),
                               rtol=2e-3, atol=2e-3)
    assert gb.divergence(params, cfg, prompts, him_id=5, her_id=9,
                         job_ids=[77], percent=1.0, use_flash=False) < 1e-4


def test_scaling_changes_distribution(setup):
    cfg, params, prompts = setup
    d = gb.divergence(params, cfg, prompts, him_id=5, her_id=9, job_ids=[77],
                      percent=0.0, use_flash=False)
    assert d > 1e-5


def test_bias_score_regularization(setup):
    cfg, params, prompts = setup
    kw = dict(him_id=5, her_id=9, job_ids=[77], use_flash=False)
    s0 = gb.bias_score(params, cfg, prompts, percent=0.5, **kw)
    s1 = gb.bias_score(params, cfg, prompts, percent=0.5, regularize=1.0, **kw)
    assert s1 == pytest.approx(s0 + 0.5)
    assert s0 >= 1.0   # ratio metric is >= 1 by construction


def test_estimate_and_run(setup):
    cfg, params, prompts = setup
    out = gb.run_genderbias_experiment(
        params, cfg, prompts[:1], prompts, him_id=5, her_id=9, job_ids=[77],
        use_flash=False, maxiter=4)
    assert set(out) == {"percent", "bias_before", "bias_after", "divergence"}
    assert np.isfinite(list(out.values())).all()


def test_baseline_projection(setup):
    cfg, params, prompts = setup
    base = gb.baseline_projection_logits(params, cfg, prompts[0], him_id=5,
                                         her_id=9, percent=1.0,
                                         use_flash=False)
    plain = bp.backpack_forward(params, cfg,
                                jnp.asarray(prompts[0], jnp.int32)[None],
                                use_flash=False)[0, -1]
    np.testing.assert_allclose(np.asarray(base), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)
    proj = gb.baseline_projection_logits(params, cfg, prompts[0], him_id=5,
                                         her_id=9, percent=0.0,
                                         use_flash=False)
    assert np.abs(np.asarray(proj) - np.asarray(plain)).max() > 1e-4
