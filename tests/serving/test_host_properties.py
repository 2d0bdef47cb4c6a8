"""Property-based tests for the engine's host-side logic (no device work):
prompt-lookup drafting, zigzag ordering, length bucketing, and the Python/C++
scheduler twins under random workloads."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from backpacks_flash_attn_tpu.serving.engine import (_bucket,
                                                     prompt_lookup_draft)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=60),
       st.integers(1, 8), st.integers(1, 5))
def test_prompt_lookup_draft_properties(hist, k, max_ngram):
    h = np.asarray(hist, np.int32)
    d = prompt_lookup_draft(h, k, max_ngram)
    assert d.shape == (k,) and d.dtype == np.int32
    # tokens proposed are always tokens that exist in the history
    assert set(d.tolist()) <= set(h.tolist())
    # when the trailing n-gram truly recurs, the draft must start with the
    # token that followed its LATEST earlier occurrence
    for n in range(min(max_ngram, len(hist) - 1), 0, -1):
        pat = hist[-n:]
        starts = [p for p in range(len(hist) - n)
                  if hist[p:p + n] == pat and p + n < len(hist)]
        if starts:
            assert d[0] == hist[starts[-1] + n]
            break


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 10_000), st.sampled_from([1, 8, 16]))
def test_bucket_properties(n, minimum):
    b = _bucket(n, minimum=minimum)
    assert b >= n and b >= minimum
    # power-of-two multiple of minimum, and tight (half would not fit)
    assert b == minimum or b % 2 == 0
    assert b == minimum or b // 2 < n


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 8).map(lambda s: 2 * s),
       st.integers(1, 6))
def test_zigzag_order_is_permutation(twoS, mult):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from backpacks_flash_attn_tpu.parallel.ring_attention import zigzag_order
    S = twoS // 2
    s = 2 * S * mult                        # any multiple of 2S
    order = np.asarray(zigzag_order(s, S))
    assert sorted(order.tolist()) == list(range(s))
    # device i's shard is (chunk_i, chunk_{2S-1-i})
    c2 = s // (2 * S)
    for i in range(S):
        shard = order[i * 2 * c2:(i + 1) * 2 * c2]
        assert shard[:c2].tolist() == list(range(i * c2, (i + 1) * c2))
        lo = (2 * S - 1 - i) * c2
        assert shard[c2:].tolist() == list(range(lo, lo + c2))


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_scheduler_twins_agree_under_random_workload(data):
    """The C++ scheduler and its Python fallback must make identical
    decisions for any interleaving of submissions and token streams."""
    from backpacks_flash_attn_tpu.serving.scheduler import (
        NativeScheduler, PyScheduler, make_scheduler)
    slots = data.draw(st.integers(1, 4))
    max_len = 32
    a = make_scheduler(slots, max_len, eos_id=5, prefer_native=True)
    b = PyScheduler(slots, max_len, eos_id=5)
    if isinstance(a, PyScheduler):
        pytest.skip("native scheduler unavailable")
    rid = 0
    for _ in range(data.draw(st.integers(1, 30))):
        act = data.draw(st.sampled_from(["submit", "admit", "token"]))
        if act == "submit":
            plen = data.draw(st.integers(1, 20))
            budget = data.draw(st.integers(1, 12))
            assert a.submit(rid, plen, budget) == b.submit(rid, plen, budget)
            rid += 1
        elif act == "admit":
            assert a.admit() == b.admit()
        else:
            live = [s for s in range(slots) if a.slot_active(s)]
            assert live == [s for s in range(slots) if b.slot_active(s)]
            if not live:
                continue
            s = data.draw(st.sampled_from(live))
            tok = data.draw(st.integers(0, 6))
            fa, fb = a.on_token(s, tok), b.on_token(s, tok)
            assert fa == fb
            assert a.slot_tokens(s) == b.slot_tokens(s) if not fa else True
            if fa:
                assert a.slot_tokens(s) == b.slot_tokens(s)
                a.release(s), b.release(s)
    assert a.num_active == b.num_active and a.num_pending == b.num_pending
