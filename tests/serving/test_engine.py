"""Serving-engine tests: continuous-batching output must match direct
per-request greedy decode; interventions and sampling are served per-request."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.serving.engine import ServingEngine
from backpacks_flash_attn_tpu.utils import generation


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _direct_greedy(cfg, params, prompt, n):
    cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None], cache,
        use_flash=False)
    out = []
    tok = int(jnp.argmax(logits[0, -1]))
    for _ in range(n):
        out.append(tok)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
            use_flash=False)
        tok = int(jnp.argmax(logits[0, -1]))
    return out


@pytest.mark.parametrize("prefer_native", [True, False])
def test_engine_matches_direct_decode(setup, prefer_native):
    """Continuous-batching outputs vs a direct per-request oracle. Random-init
    logits have near-ties (gaps ~1e-5) that flip argmax under different GEMM
    tilings (bucketed prefill, batch-3 decode), so instead of exact token
    equality we teacher-force the engine's tokens through the oracle and
    require every engine pick to score within eps of the oracle's max logit —
    any real cache/position bug shifts logits by orders of magnitude more."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist()
               for n in (3, 9, 5, 12, 4)]
    n_new = 6
    eng = ServingEngine(params, cfg, max_slots=3, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False,
                        eos_id=-1, prefer_native_scheduler=prefer_native)
    rids = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, p in zip(rids, prompts):
        got = results[rid].tokens
        assert len(got) == n_new
        cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray(p, jnp.int32)[None], cache,
            use_flash=False)
        for t, tok in enumerate(got):
            row = np.asarray(logits[0, -1], np.float64)
            assert row[tok] >= row.max() - 1e-4, (rid, t, tok, row.max(),
                                                  row[tok])
            logits, cache = bp.backpack_forward_with_cache(
                params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
                use_flash=False)


def test_engine_eos_stops_early(setup):
    cfg, params = setup
    prompt = [3, 1, 4]
    want = _direct_greedy(cfg, params, prompt, 8)
    # pick an eos whose FIRST occurrence is not at index 0
    idx = next(i for i in range(1, 8) if want[i] not in want[:i])
    eos = want[idx]
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=eos)
    rid = eng.submit(prompt, max_new_tokens=8)
    res = eng.run()[rid]
    assert res.tokens == want[:idx + 1]   # stops AT the eos token


def test_engine_per_request_sense_weights(setup):
    cfg, params = setup
    prompt = [5, 17, 42, 99]
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    # non-uniform weights: uniform scaling is argmax-invariant (tied softmax)
    w = np.ones(cfg.num_senses, np.float32)
    w[1] = 6.0
    w[2] = 0.1
    r_plain = eng.submit(prompt, max_new_tokens=5)
    r_ctl = eng.submit(prompt, max_new_tokens=5, sense_weights=w)
    results = eng.run()
    assert results[r_plain].tokens != results[r_ctl].tokens

    # the weighted request must match a direct weighted decode
    b_cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, b_cache = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None], b_cache,
        use_flash=False, sense_weights=jnp.asarray(w[None]))
    want, tok = [], int(jnp.argmax(logits[0, -1]))
    for _ in range(5):
        want.append(tok)
        logits, b_cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), b_cache,
            use_flash=False, sense_weights=jnp.asarray(w[None]))
        tok = int(jnp.argmax(logits[0, -1]))
    assert results[r_ctl].tokens == want


def test_engine_sampling_reproducible(setup):
    cfg, params = setup
    prompt = [1, 2, 3]

    def run(seed):
        eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=32,
                            cache_dtype=jnp.float32, use_flash=False,
                            eos_id=-1, seed=seed)
        rid = eng.submit(prompt, max_new_tokens=6, temperature=1.0)
        return eng.run()[rid].tokens

    assert run(0) == run(0)
    assert run(0) != run(1)


def test_engine_rejects_oversized_prompt(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=16,
                        cache_dtype=jnp.float32, use_flash=False)
    with pytest.raises(ValueError):
        eng.submit(list(range(16)), max_new_tokens=4)


def test_engine_annealed_control_matches_generate_weighted(setup):
    """A control=True request served alongside an uncontrolled one must match
    eval/control.generate_weighted (the uniform-batch annealed decode)
    token-for-token — topic control under continuous batching."""
    cfg, params = setup
    from backpacks_flash_attn_tpu.eval.control import generate_weighted
    table = (0.2 + 5.0 * jax.random.uniform(
        jax.random.PRNGKey(7), (cfg.padded_vocab_size, cfg.num_senses)))
    prompt_ctl = [5, 17, 42, 99]
    prompt_plain = [9, 3, 1]
    n = 5

    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        control_table=np.asarray(table),
                        annealing_scale=0.3)
    r_ctl = eng.submit(prompt_ctl, max_new_tokens=n, control=True)
    r_plain = eng.submit(prompt_plain, max_new_tokens=n)
    res = eng.run()

    want_ctl = generate_weighted(
        params, cfg, jnp.asarray([prompt_ctl], jnp.int32), table,
        annealing_scale=0.3, anneal=True, max_new_tokens=n, use_flash=False,
        max_seqlen=32)
    assert res[r_ctl].tokens == want_ctl[0].tolist()

    want_plain = _direct_greedy(cfg, params, prompt_plain, n)
    assert res[r_plain].tokens == want_plain

    # the controlled output must actually differ from uncontrolled decoding
    assert res[r_ctl].tokens != _direct_greedy(cfg, params, prompt_ctl, n)


def test_window_bucketing_matches_full_window():
    """The engine's host-picked length buckets must not change results:
    same requests on a bucketing engine and a full-window-only engine
    produce identical tokens (greedy), including a controlled (annealed
    topic-control) request whose state advance is also windowed."""
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    table = np.ones((cfg.padded_vocab_size, cfg.num_senses), np.float32)
    table[5] = 3.0
    outs = []
    for buckets in (None, "full"):
        eng = ServingEngine(params, cfg, max_slots=4, max_seqlen=256,
                            cache_dtype=jnp.float32, eos_id=-1, seed=7,
                            control_table=table)
        # 128-multiples only (misaligned buckets measured 2-3x slower on
        # the (8,128)-tiled cache S axis, bench_results/window_buckets_r3)
        assert eng.window_buckets == [128, 256]
        if buckets == "full":
            eng.window_buckets = [256]
        r1 = eng.submit(list(range(1, 9)), max_new_tokens=12)
        r2 = eng.submit(list(range(30, 50)), max_new_tokens=12)
        r3 = eng.submit([5, 6, 7], max_new_tokens=10, control=True)
        res = eng.run()
        outs.append((res[r1].tokens, res[r2].tokens, res[r3].tokens))
    assert outs[0] == outs[1]


def test_engine_negative_matches_generate_negative(setup):
    """A negative=True request served alongside a plain one must match
    eval/toxicity.generate_negative (the uniform-batch incremental
    negative-weighted decode) token-for-token — toxicity suppression under
    continuous batching (reference test_toxicity.py can only run a uniform
    batch with an O(t^2) forward)."""
    cfg, params = setup
    from backpacks_flash_attn_tpu.eval.toxicity import generate_negative
    table = (0.4 + 1.2 * jax.random.uniform(
        jax.random.PRNGKey(11), (cfg.padded_vocab_size, cfg.num_senses)))
    prompt_neg = [5, 17, 42, 99]
    prompt_plain = [9, 3, 1]
    n = 5

    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        negative_table=np.asarray(table),
                        negative_quantile=0.05)
    r_neg = eng.submit(prompt_neg, max_new_tokens=n, negative=True)
    r_plain = eng.submit(prompt_plain, max_new_tokens=n)
    res = eng.run()

    want_neg = generate_negative(
        params, cfg, jnp.asarray([prompt_neg], jnp.int32), table,
        quantile=0.05, anneal=False, max_new_tokens=n, use_flash=False,
        max_seqlen=32)
    assert res[r_neg].tokens == want_neg[0].tolist()

    want_plain = _direct_greedy(cfg, params, prompt_plain, n)
    assert res[r_plain].tokens == want_plain

    # suppression must actually change the output
    assert res[r_neg].tokens != _direct_greedy(cfg, params, prompt_neg, n)


def test_admission_syncs_gpt_cache_length(setup):
    """Regression: _prefill_fn used to overwrite only the OUTER cache length,
    leaving gpt.length at the padded bucket — every later decode step then
    attended the pad K/V rows and took the wrong position id. After a
    bucketed admission (plen 3 -> bucket 8), a decode step from the engine's
    cache must match the unpadded oracle cache EXACTLY."""
    cfg, params = setup
    prompt = [1, 2, 3]
    eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    eng.submit(prompt, max_new_tokens=2)
    eng._admit_all()
    assert np.asarray(eng.cache.gpt.length).tolist() == [3]
    assert np.asarray(eng.cache.length).tolist() == [3]
    tok0 = int(eng.tokens[0, 0])

    oracle = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    lg, oracle = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None], oracle,
        use_flash=False)
    assert int(jnp.argmax(lg[0, -1])) == tok0
    got, _ = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray([[tok0]], jnp.int32), eng.cache,
        use_flash=False)
    want, _ = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray([[tok0]], jnp.int32), oracle,
        use_flash=False)
    # allclose, not bitwise: the engine cache is STAGED by default, so its
    # decode merges main+staged segments in one softmax — a different (but
    # oracle-exact-tested) reduction order than the unstaged oracle here
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_batched_prefill_admission(setup):
    """A burst of plain admissions sharing a length bucket must prefill in
    ONE dispatch (VERDICT r1 item 6) and still match the per-request oracle
    under the teacher-forced score check."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist()
               for n in (5, 7, 6)]       # all bucket 8
    n_new = 5
    eng = ServingEngine(params, cfg, max_slots=4, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    rids = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng._admit_all()
    assert eng.prefill_dispatches == 1
    results = eng.run()
    for rid, p in zip(rids, prompts):
        got = results[rid].tokens
        assert len(got) == n_new
        cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray(p, jnp.int32)[None], cache,
            use_flash=False)
        for t, tok in enumerate(got):
            row = np.asarray(logits[0, -1], np.float64)
            assert row[tok] >= row.max() - 1e-4, (rid, t)
            logits, cache = bp.backpack_forward_with_cache(
                params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
                use_flash=False)


def test_batched_prefill_mixed_buckets_and_padding(setup):
    """Burst with two buckets + a group size that needs row padding: one
    dispatch per bucket; pad rows must not corrupt any admitted slot."""
    cfg, params = setup
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist()
               for n in (4, 6, 5, 12)]   # buckets 8, 8, 8 (3 rows -> pad to
                                         # 4) and 16
    eng = ServingEngine(params, cfg, max_slots=4, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    eng._admit_all()
    assert eng.prefill_dispatches == 2
    results = eng.run()
    for rid, p in zip(rids, prompts):
        got = results[rid].tokens
        cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray(p, jnp.int32)[None], cache,
            use_flash=False)
        for t, tok in enumerate(got):
            row = np.asarray(logits[0, -1], np.float64)
            assert row[tok] >= row.max() - 1e-4, (rid, t)
            logits, cache = bp.backpack_forward_with_cache(
                params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
                use_flash=False)


def test_engine_stats_surface(setup):
    """stats() counters reconcile with the work actually served."""
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=4, max_seqlen=32,
                        cache_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n_new = 4
    rids = [eng.submit(rng.integers(0, cfg.vocab_size, n).tolist(),
                       max_new_tokens=n_new) for n in (3, 7, 5)]
    res = eng.run()
    s = eng.stats()
    assert s["admissions"] == 3 and s["completed"] == 3
    assert s["pending_requests"] == 0 and s["active_slots"] == 0
    emitted = sum(len(res[r].tokens) for r in rids)
    # prefill emits each request's first token; decode steps emit the rest
    assert s["tokens_emitted"] + s["admissions"] == emitted
    assert s["decode_steps"] >= n_new - 1
    assert s["prefill_dispatches"] >= 1
    assert sum(s["window_histogram"].values()) == s["decode_steps"]
    assert s["wall_s"] > 0 and s["tokens_per_s"] > 0
    assert s["mean_step_ms"] > 0
    assert 0 < s["mean_batch"] <= 4


def test_engine_per_request_top_p(setup):
    """Per-request nucleus sampling: a top_p request is served next to plain
    greedy/sampling ones; top_p=1.0 path is untouched; runs reproduce."""
    cfg, params = setup
    prompt = [2, 7, 1]

    def run(top_p, seed=0):
        eng = ServingEngine(params, cfg, max_slots=3, max_seqlen=32,
                            cache_dtype=jnp.float32, use_flash=False,
                            eos_id=-1, seed=seed)
        r_greedy = eng.submit(prompt, max_new_tokens=6)
        r_p = eng.submit(prompt, max_new_tokens=6, temperature=1.0,
                         top_p=top_p)
        res = eng.run()
        return res[r_greedy].tokens, res[r_p].tokens

    g1, p_small = run(0.3)
    g2, p_full = run(1.0)
    assert g1 == g2 == _direct_greedy(cfg, params, prompt, 6)  # greedy slot
    assert run(0.3) == (g1, p_small)                           # reproducible
    # tiny nucleus behaves like (near-)greedy more often than the full dist
    g3, p_tiny = run(1e-6)
    assert p_tiny == g3                    # nucleus of 1e-6 = argmax only


def test_engine_top_p_validation(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=16,
                        cache_dtype=jnp.float32, use_flash=False)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.submit([1, 2], top_p=0.0)
    with _pytest.raises(ValueError):
        eng.submit([1, 2], top_p=1.5)


def test_engine_per_request_top_k(setup):
    """top_k=1 with temperature>0 is exactly greedy (only the argmax
    survives the cut) — shares the batch with unrestricted sampling."""
    cfg, params = setup
    prompt = [2, 7, 1, 8]
    want = _direct_greedy(cfg, params, prompt, 6)
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    r_k1 = eng.submit(prompt, max_new_tokens=6, temperature=1.0, top_k=1)
    r_free = eng.submit(prompt, max_new_tokens=6, temperature=1.0)
    res = eng.run()
    assert res[r_k1].tokens == want
    assert len(res[r_free].tokens) == 6
    with pytest.raises(ValueError):
        eng.submit(prompt, max_new_tokens=2, top_k=-1)


def test_chunked_prefill_admission(setup):
    """prefill_chunk: one fixed (n, W) compiled shape serves every prompt
    length; outputs match the teacher-forced oracle and the dispatch count
    is ceil(max_len/W) for the wave."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist()
               for n in (3, 11, 6, 17)]
    eng = ServingEngine(params, cfg, max_slots=4, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        prefill_chunk=8)
    rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    results = eng.run()
    assert eng.prefill_dispatches == 3   # ceil(17/8)
    for rid, p in zip(rids, prompts):
        got = results[rid].tokens
        assert len(got) == 5
        cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray(p, jnp.int32)[None], cache,
            use_flash=False)
        for t, tok in enumerate(got):
            row = np.asarray(logits[0, -1], np.float64)
            assert row[tok] >= row.max() - 1e-4, (rid, t, tok)
            logits, cache = bp.backpack_forward_with_cache(
                params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
                use_flash=False)


def test_chunked_prefill_with_weights_and_sampling(setup):
    cfg, params = setup
    prompt = [5, 17, 42, 99, 3, 1, 4, 1, 5]
    w = np.ones(cfg.num_senses, np.float32)
    w[0] = 4.0
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        prefill_chunk=8)
    r_w = eng.submit(prompt, max_new_tokens=4, sense_weights=w)
    r_s = eng.submit(prompt, max_new_tokens=4, temperature=0.7, top_k=5)
    res = eng.run()
    assert len(res[r_w].tokens) == 4 and len(res[r_s].tokens) == 4
    # weighted request matches the unchunked engine's weighted decode
    eng2 = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                         cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    r2 = eng2.submit(prompt, max_new_tokens=4, sense_weights=w)
    assert eng2.run()[r2].tokens == res[r_w].tokens


@pytest.mark.parametrize("spec_tokens", [0, 3])
def test_engine_stop_sequences(setup, spec_tokens):
    """Generation ends when the output ends with a stop sequence; the
    matched tokens are excluded (plain and speculative paths)."""
    cfg, params = setup
    prompt = [3, 1, 4]
    want = _direct_greedy(cfg, params, prompt, 10)
    stop = [want[3], want[4]]
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        spec_tokens=spec_tokens)
    rid = eng.submit(prompt, max_new_tokens=10, stop=[stop])
    res = eng.run()[rid]
    # result + stop reconstructs a prefix of the unrestricted decode, ending
    # at the FIRST suffix occurrence of the stop sequence
    full = res.tokens + stop
    assert full == want[:len(full)], (res.tokens, want)
    assert len(full) <= 5                 # no later than the chosen site
    for i in range(2, len(full) - 1):     # ...and no earlier hit was missed
        assert want[i - 2:i] != stop or i == len(full)
    # no stop hit -> full budget
    rid2 = eng.submit(prompt, max_new_tokens=6, stop=[[987654 % cfg.vocab_size]])
    got2 = eng.run()[rid2].tokens
    assert len(got2) == 6


def test_engine_mixed_request_matrix(setup):
    """Integration fuzz: every request type sharing slots across waves —
    greedy, temperature, top-p, top-k, sense-weighted, annealed control,
    negative, stop sequences — all complete with the right lengths and the
    engine drains cleanly."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    ctable = np.ones((cfg.padded_vocab_size, cfg.num_senses), np.float32)
    ctable[7] = 3.0
    ntable = np.ones((cfg.padded_vocab_size, cfg.num_senses), np.float32)
    ntable[11] = 0.2
    eng = ServingEngine(params, cfg, max_slots=3, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        control_table=ctable, negative_table=ntable)
    w = np.ones(cfg.num_senses, np.float32)
    w[0] = 2.0
    subs = []
    for i in range(8):
        prompt = rng.integers(0, cfg.vocab_size, rng.integers(2, 9)).tolist()
        n = int(rng.integers(2, 7))
        kw = {}
        kind = i % 4
        if kind == 1:
            kw = dict(temperature=0.8, top_p=0.9, top_k=7)
        elif kind == 2:
            kw = dict(control=True) if i % 2 else dict(negative=True)
        elif kind == 3:
            kw = dict(sense_weights=w, stop=[[int(prompt[0])]])
        subs.append((eng.submit(prompt, max_new_tokens=n, **kw), n))
    results = eng.run()
    assert set(r for r, _ in subs) == set(results)
    for rid, n in subs:
        assert results[rid].finished
        assert 1 <= len(results[rid].tokens) <= n
    st = eng.stats()
    assert st["completed"] == 8 and st["active_slots"] == 0
    assert st["pending_requests"] == 0


@pytest.mark.parametrize("spec_tokens", [0, 3])
def test_engine_min_new_tokens(setup, spec_tokens):
    """min_new_tokens suppresses the eos logit until the floor is reached;
    the post-floor continuation matches an eos-banned oracle."""
    cfg, params = setup
    prompt = [3, 1, 4]
    want = _direct_greedy(cfg, params, prompt, 8)
    idx = next((i for i in range(1, 8) if want[i] not in want[:i]), None)
    if idx is None:
        pytest.skip("degenerate repeating sequence")
    eos = want[idx]
    eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=eos,
                        spec_tokens=spec_tokens)
    # without a floor: stops AT the eos
    r0 = eng.submit(prompt, max_new_tokens=8)
    assert eng.run()[r0].tokens == want[:idx + 1]
    # with the floor past the eos position: generation continues (eos
    # banned), so the result is strictly longer and eos-free before min
    m = idx + 3
    r1 = eng.submit(prompt, max_new_tokens=8, min_new_tokens=m)
    got = eng.run()[r1].tokens
    assert len(got) >= min(m, 8)
    assert eos not in got[:m - 1]


def test_engine_generate_sugar(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    outs = eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=4)
    assert len(outs) == 2 and all(len(o) == 4 for o in outs)


@pytest.mark.parametrize("spec_tokens", [0, 3])
def test_engine_frequency_presence_penalties(setup, spec_tokens):
    """Additive penalties from per-slot token counts: a penalized greedy
    request matches a manual penalty-aware decode loop, and a huge
    frequency penalty forbids repeats (speculation falls back while the
    penalized slot is active)."""
    cfg, params = setup
    prompt = [3, 1, 4, 1]
    fp, pp = 1.5, 0.5
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        spec_tokens=spec_tokens)
    rid = eng.submit(prompt, max_new_tokens=6, frequency_penalty=fp,
                     presence_penalty=pp)
    got = eng.run()[rid].tokens

    counts = np.zeros((cfg.padded_vocab_size,), np.float64)
    for t in prompt:
        counts[t] += 1
    cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompt, jnp.int32)[None], cache,
        use_flash=False)
    want = []
    for _ in range(6):
        row = np.asarray(logits[0, -1], np.float64)
        row = row - fp * counts - pp * (counts > 0)
        tok = int(np.argmax(row))
        want.append(tok)
        counts[tok] += 1
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
            use_flash=False)
    assert got == want, (got, want)

    # huge frequency penalty: no token may ever repeat
    rid2 = eng.submit(prompt, max_new_tokens=8, frequency_penalty=1e4)
    got2 = eng.run()[rid2].tokens
    seen = set(prompt)
    for t in got2:
        assert t not in seen, (t, got2)
        seen.add(t)


def test_engine_mixed_matrix_speculative(setup):
    """The full knob set on a speculative engine: greedy, sampling with
    top-k/top-p, min floors, stop sequences, penalties (which force plain
    fallback), chunked prefill — everything completes with legal lengths."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    eng = ServingEngine(params, cfg, max_slots=3, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        spec_tokens=3, spec_min_acceptance=0.2,
                        prefill_chunk=8)
    subs = []
    for i in range(9):
        prompt = rng.integers(0, cfg.vocab_size, rng.integers(2, 9)).tolist()
        n = int(rng.integers(3, 7))
        kw = [{},
              dict(temperature=0.9, top_k=9, top_p=0.9),
              dict(min_new_tokens=2),
              dict(frequency_penalty=0.7),
              dict(stop=[[int(prompt[-1])]])][i % 5]
        subs.append((eng.submit(prompt, max_new_tokens=n, **kw), n))
    results = eng.run()
    for rid, n in subs:
        assert results[rid].finished
        assert 1 <= len(results[rid].tokens) <= n
    st = eng.stats()
    assert st["completed"] == 9 and st["active_slots"] == 0


@pytest.mark.parametrize("spec_tokens", [0, 3])
def test_engine_per_token_logprobs(setup, spec_tokens):
    """logprobs=True records log p(token) for every emitted token under the
    temperature-1 distribution; verified against a teacher-forced oracle on
    both the plain and the speculative stepping paths. Requests without the
    flag get logprobs=None while sharing the batch."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist() for n in (4, 7)]
    eng = ServingEngine(params, cfg, max_slots=2, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1,
                        spec_tokens=spec_tokens)
    r_lp = eng.submit(prompts[0], max_new_tokens=5, logprobs=True)
    r_plain = eng.submit(prompts[1], max_new_tokens=5)
    results = eng.run()
    assert results[r_plain].logprobs is None
    got = results[r_lp]
    assert got.logprobs is not None
    assert len(got.logprobs) == len(got.tokens) == 5
    # teacher-force the engine's tokens through the oracle; each recorded
    # logprob must equal log_softmax(oracle logits)[token]
    cache = bp.init_backpack_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, jnp.asarray(prompts[0], jnp.int32)[None], cache,
        use_flash=False)
    for t, (tok, lp) in enumerate(zip(got.tokens, got.logprobs)):
        row = np.asarray(logits[0, -1], np.float64)
        row = row - row.max()
        want = row[tok] - np.log(np.exp(row).sum())
        assert abs(lp - want) < 5e-4, (t, tok, lp, want)
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), cache,
            use_flash=False)


def test_engine_logprobs_with_sampling_and_stop(setup):
    """Sampled requests record logprobs too (temperature-1 semantics), and a
    stop-sequence hit truncates the logprob list with the tokens."""
    cfg, params = setup
    prompt = [3, 1, 4, 1]
    want = _direct_greedy(cfg, params, prompt, 6)
    eng = ServingEngine(params, cfg, max_slots=1, max_seqlen=32,
                        cache_dtype=jnp.float32, use_flash=False, eos_id=-1)
    # sampling: list is present, finite, right length
    r0 = eng.submit(prompt, max_new_tokens=6, temperature=0.8, top_p=0.9,
                    logprobs=True)
    res0 = eng.run()[r0]
    assert len(res0.logprobs) == len(res0.tokens) == 6
    assert all(np.isfinite(lp) and lp <= 0.0 for lp in res0.logprobs)
    # stop sequence: the matched tokens are excluded from BOTH lists
    stop = [want[2], want[3]]
    r1 = eng.submit(prompt, max_new_tokens=6, stop=[stop], logprobs=True)
    res1 = eng.run()[r1]
    assert res1.tokens == want[:2]
    assert len(res1.logprobs) == 2
