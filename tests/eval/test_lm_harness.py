"""lm-evaluation-harness adapter (reference: README.md:130-148 runs LM evals
through a patched fork; here the model API is implemented natively)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import lm_harness as lh
from backpacks_flash_attn_tpu.models import backpack as bp


class ToyTok:
    """Char-level tokenizer over a small alphabet (harness only needs
    encode/decode)."""
    alphabet = " abcdefgh"

    def encode(self, text):
        return [self.alphabet.index(c) + 1 for c in text]

    def decode(self, ids):
        return "".join(self.alphabet[i - 1] for i in ids
                       if 1 <= i <= len(self.alphabet))


@pytest.fixture(scope="module")
def lm():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    return lh.HarnessLM.backpack(params, cfg, ToyTok(), use_flash=False,
                                 batch_size=4, eot_token_id=0,
                                 buckets=(8, 16, 32)), params, cfg


def _manual_loglik(params, cfg, ctx_ids, cont_ids, eot=0):
    ids = (ctx_ids or [eot]) + cont_ids
    logits = bp.backpack_forward(params, cfg, jnp.asarray(ids)[None],
                                 use_flash=False)
    logp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    start = len(ctx_ids or [eot])
    total = sum(logp[t - 1, ids[t]] for t in range(start, len(ids)))
    greedy = all(int(np.argmax(logp[t - 1])) == ids[t]
                 for t in range(start, len(ids)))
    return float(total), greedy


def test_loglikelihood_matches_manual(lm):
    adapter, params, cfg = lm
    reqs = [("abc", " de"), ("", "fg"), ("h", "a"), ("gg", "hhh"),
            ("abcd", "e")]  # 5 requests -> 2 batches of 4
    got = adapter.loglikelihood(reqs)
    tok = ToyTok()
    for (ctx, cont), (lp, greedy) in zip(reqs, got):
        want_lp, want_greedy = _manual_loglik(params, cfg, tok.encode(ctx),
                                              tok.encode(cont))
        assert lp == pytest.approx(want_lp, rel=1e-4, abs=1e-4), (ctx, cont)
        assert greedy == want_greedy


def test_loglikelihood_order_preserved_under_sorting(lm):
    adapter, _, _ = lm
    reqs = [("a", "b"), ("abcdefgh", " ab"), ("c", "d")]
    got = adapter.loglikelihood(reqs)
    # re-scoring one-at-a-time must give the same values in request order
    for req, want in zip(reqs, got):
        assert adapter.loglikelihood([req])[0][0] == pytest.approx(
            want[0], rel=1e-4, abs=1e-4)


def test_rolling_sums_windows(lm):
    adapter, params, cfg = lm
    text = "abc defg ha"
    [total] = adapter.loglikelihood_rolling([text])
    tok = ToyTok()
    toks = tok.encode(text)
    win = adapter.max_length - 1
    want = sum(_manual_loglik(params, cfg, [], toks[s:s + win])[0]
               for s in range(0, len(toks), win))
    assert total == pytest.approx(want, rel=1e-4, abs=1e-4)


def test_generate_until_stops(lm):
    adapter, params, cfg = lm
    [text] = adapter.generate_until([("abc", {"until": ["  "],
                                              "max_gen_toks": 6})])
    assert isinstance(text, str) and "  " not in text
    # greedy continuation must match the model's own greedy decode
    from backpacks_flash_attn_tpu.utils import generation as gen
    ids = jnp.asarray(ToyTok().encode("abc"))[None]
    seq = gen.generate_backpack(params, cfg, ids, ids.shape[1] + 6,
                                use_flash=False).sequences
    full = ToyTok().decode(np.asarray(seq[0, ids.shape[1]:]).tolist())
    assert full.startswith(text.split("  ")[0])


def test_multiple_choice_accuracy(lm):
    adapter, _, _ = lm
    items = [{"context": "abc", "choices": [" d", " e"], "gold": 0},
             {"context": "fg", "choices": ["h", "a", "b"], "gold": 2}]
    res = lh.multiple_choice_accuracy(adapter, items)
    assert set(res) == {"acc", "n"} and res["n"] == 2.0
    # gold = the model's actual argmax choice -> accuracy 1.0
    gold0 = int(np.argmax([adapter.loglikelihood([("abc", c)])[0][0]
                           for c in items[0]["choices"]]))
    gold1 = int(np.argmax([adapter.loglikelihood([("fg", c)])[0][0]
                           for c in items[1]["choices"]]))
    items[0]["gold"], items[1]["gold"] = gold0, gold1
    assert lh.multiple_choice_accuracy(adapter, items)["acc"] == 1.0


def test_empty_context_uses_eot(lm):
    adapter, params, cfg = lm
    [(lp, _)] = adapter.loglikelihood([("", "abc")])
    want, _ = _manual_loglik(params, cfg, [], ToyTok().encode("abc"))
    assert lp == pytest.approx(want, rel=1e-4, abs=1e-4)


def test_gpt_constructor():
    from backpacks_flash_attn_tpu.config import gpt2_test
    from backpacks_flash_attn_tpu.models import gpt as gpt_lib
    cfg = gpt2_test()
    params = gpt_lib.init_gpt(cfg, jax.random.PRNGKey(1))
    adapter = lh.HarnessLM.gpt(params, cfg, ToyTok(), use_flash=False,
                               batch_size=2, eot_token_id=0, buckets=(16,))
    res = adapter.loglikelihood([("ab", "c"), ("d", "e"), ("f", "g")])
    assert len(res) == 3
    assert all(np.isfinite(lp) for lp, _ in res)


def test_generate_until_served_matches_loop(lm):
    """engine=True continuous-batching generation == the per-prompt loop
    (both greedy; no EOS in toy vocab range so lengths are full)."""
    adapter, params, cfg = lm
    served = lh.HarnessLM.backpack(params, cfg, ToyTok(), use_flash=False,
                                   batch_size=4, eot_token_id=0,
                                   buckets=(16, 32), engine=True,
                                   engine_kwargs={"spec_tokens": 3})
    reqs = [("abc", {"until": [], "max_gen_toks": 5}),
            ("fg h", {"until": [], "max_gen_toks": 5}),
            ("a", {"until": [], "max_gen_toks": 5})]
    want = adapter.generate_until(reqs)
    got = served.generate_until(reqs)
    assert got == want
