"""PPLM tests: the perturbation must raise bag-of-words probability mass, and
generation must steer toward the BoW relative to unperturbed decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import gpt2_test
from backpacks_flash_attn_tpu.eval import pplm
from backpacks_flash_attn_tpu.models import gpt as gpt_lib


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2_test()
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_perturbation_raises_bow_mass(setup):
    cfg, params = setup
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    cache = gpt_lib.init_kv_cache(cfg, 1, 16, jnp.float32)
    _, cache = gpt_lib.gpt_forward_with_cache(params, cfg, prompt[:, :-1],
                                              cache)
    token = prompt[:, -1:]
    bow = np.zeros((cfg.padded_vocab_size,), np.float32)
    bow[[7, 42, 99]] = 1.0
    bow = jnp.asarray(bow)

    logp0 = pplm._next_token_logprobs(params, cfg, token, cache)
    mass0 = float(jnp.sum(jnp.exp(logp0) * bow))

    pert = pplm.perturb_cache(params, cfg, cache, token, bow,
                              stepsize=0.05, num_iterations=5, kl_scale=0.01)
    logp1 = pplm._next_token_logprobs(params, cfg, token, pert)
    mass1 = float(jnp.sum(jnp.exp(logp1) * bow))
    assert mass1 > mass0, (mass0, mass1)


def test_kl_anchor_limits_drift(setup):
    """Raising kl_scale must keep the perturbed distribution closer to the
    unperturbed one."""
    cfg, params = setup
    prompt = jnp.asarray([[9, 8, 7]], jnp.int32)
    cache = gpt_lib.init_kv_cache(cfg, 1, 16, jnp.float32)
    _, cache = gpt_lib.gpt_forward_with_cache(params, cfg, prompt[:, :-1],
                                              cache)
    token = prompt[:, -1:]
    bow = jnp.zeros((cfg.padded_vocab_size,)).at[5].set(1.0)
    logp0 = pplm._next_token_logprobs(params, cfg, token, cache)

    def kl_after(kl_scale):
        pert = pplm.perturb_cache(params, cfg, cache, token, bow,
                                  stepsize=0.1, num_iterations=5,
                                  kl_scale=kl_scale)
        logp = pplm._next_token_logprobs(params, cfg, token, pert)
        p = jnp.exp(logp)
        return float(jnp.sum(p * (logp - logp0)))

    assert kl_after(10.0) < kl_after(0.0)


def test_pplm_generation_steers(setup):
    cfg, params = setup
    prompt = jnp.asarray([[3, 1, 4]], jnp.int32)
    bow_ids = [7, 42, 99, 123]
    plain = pplm.pplm_generate(params, cfg, prompt, bow_ids,
                               max_new_tokens=8, stepsize=0.0,
                               num_iterations=1, gm_scale=0.9)
    steered = pplm.pplm_generate(params, cfg, prompt, bow_ids,
                                 max_new_tokens=8, stepsize=0.3,
                                 num_iterations=5, kl_scale=0.0,
                                 gm_scale=0.95)
    assert plain.shape == steered.shape == (1, 8)
    # stepsize 0 == unperturbed greedy; strong steering changes the output
    assert not np.array_equal(plain, steered)
    # steered output should contain more BoW tokens than plain
    n_plain = sum(int(t) in bow_ids for t in plain[0])
    n_steer = sum(int(t) in bow_ids for t in steered[0])
    assert n_steer >= n_plain


def test_window_restricts_perturbation(setup):
    cfg, params = setup
    prompt = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    cache = gpt_lib.init_kv_cache(cfg, 1, 16, jnp.float32)
    _, cache = gpt_lib.gpt_forward_with_cache(params, cfg, prompt[:, :-1],
                                              cache)
    token = prompt[:, -1:]
    bow = jnp.zeros((cfg.padded_vocab_size,)).at[5].set(1.0)
    pert = pplm.perturb_cache(params, cfg, cache, token, bow, stepsize=0.1,
                              num_iterations=2, window=2)
    dk = np.abs(np.asarray(pert.k, np.float32)
                - np.asarray(cache.k, np.float32))
    # positions outside [length-2, length) untouched (k: (L, E, dk, S))
    assert dk[..., :3].max() == 0.0
    assert dk[..., 3:5].max() > 0.0
