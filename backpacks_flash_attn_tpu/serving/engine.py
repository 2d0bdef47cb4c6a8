"""Continuous-batching serving engine for Backpack LMs.

The reference has no serving runtime: every control/eval script decodes a
uniform batch with a Python loop that re-runs the full forward per token
(training/src/utils/generation.py). This engine is the TPU-native redesign
(SURVEY.md §7 phase 6):

  * a fixed (max_slots, max_seqlen) per-slot cache — static shapes, so the
    decode step compiles ONCE and every request shape-shares it
  * admission: prompts prefill into length buckets (power-of-two padding
    => one compile per bucket) and scatter into free slots; with
    prefill_chunk > 0 a whole admission wave packs into ONE chunked-prefill
    dispatch of a single compiled shape (per-sequence q_offsets)
  * one jitted decode step advances ALL active slots; finished requests
    retire and their slots are immediately reusable
  * scheduling (queue, slots, budgets, EOS) lives in the native C++
    scheduler (csrc/scheduler.cpp) via ctypes, off the device-dispatch path
  * per-request sampling (greedy / temperature / nucleus top-p / top-k
    via (b,) vectors), stop sequences, and per-request sense-weight
    interventions ((b, nv) control vectors — the §2.4 capability, served)
  * prompt-lookup speculative decoding (spec_tokens; optionally adaptive)
    and chunked prefill admission (prefill_chunk) — see __init__
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackpackConfig
from ..models import backpack as bp
from .scheduler import make_scheduler


@dataclasses.dataclass
class RequestResult:
    request_id: int
    tokens: List[int]
    finished: bool
    # per-emitted-token log p(token) under the temperature-1 distribution of
    # the final adjusted logits (after penalties and eos suppression, before
    # temperature/top-p/top-k) — the vLLM-style "raw" logprob. None unless
    # the request was submitted with logprobs=True.
    logprobs: Optional[List[float]] = None


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def prompt_lookup_draft(hist: np.ndarray, k: int,
                        max_ngram: int = 3) -> np.ndarray:
    """Prompt-lookup draft (host-side, numpy): find the most recent previous
    occurrence of hist's trailing n-gram and propose the k tokens that
    followed it; back off to shorter n-grams, then to repeating the last
    token (a free guess — the speculative dispatch is (1+k)-wide regardless
    of draft quality). hist: (L,) int tokens, L >= 1."""
    L = hist.shape[0]
    draft = np.full((k,), hist[-1] if L else 0, np.int32)
    for n in range(min(max_ngram, L - 1), 0, -1):
        pat = hist[L - n:L]
        if L - 1 < n:
            continue
        win = np.lib.stride_tricks.sliding_window_view(hist[:L - 1], n)
        hits = np.nonzero((win == pat).all(axis=1))[0]
        if hits.size == 0:
            continue
        p = int(hits[-1])
        cont = hist[p + n:p + n + k]
        if cont.size:
            draft[:cont.size] = cont
            return draft
    return draft


class ServingEngine:
    def __init__(self, params, cfg: BackpackConfig, *, max_slots: int = 8,
                 max_seqlen: int = 512, cache_dtype=jnp.bfloat16,
                 eos_id: int = 50256, use_flash: bool = True, seed: int = 0,
                 num_senses: Optional[int] = None,
                 control_table: Optional[np.ndarray] = None,
                 annealing_scale: float = 0.2,
                 prefer_native_scheduler: bool = True,
                 window_buckets: Optional[Tuple[int, ...]] = None,
                 negative_table: Optional[np.ndarray] = None,
                 negative_quantile: float = 0.02,
                 negative_anneal: bool = False,
                 negative_annealing_scale: float = 0.34,
                 spec_tokens: int = 0, spec_ngram: int = 3,
                 spec_min_acceptance: float = 0.05,
                 spec_cooldown: int = 16,
                 prefill_chunk: int = 0,
                 stage_tokens: int = 64,
                 draft_params=None,
                 draft_cfg: Optional[BackpackConfig] = None,
                 draft_cache_dtype=jnp.int8):
        """control_table: optional (vocab, nv) multiplicative weight table
        (eval/control.control_weights). Requests submitted with control=True
        decode with the full annealed topic-control intervention while
        sharing slots with uncontrolled requests — the reference can only
        run the WeightedBackpackLMHeadModel on a uniform batch.

        negative_table: optional (vocab, nv) table (eval/toxicity.
        toxicity_weights) for requests submitted with negative=True — the
        O(t) incremental negative-weighted (toxicity-removal) decode
        (models/interventions.negative_decode_step; reference
        NegativeWeightedBackpackLMHeadModel + test_toxicity.py). Its sparse
        per-position bottom-quantile cache is allocated lazily on the first
        negative admission (it costs O(slots * S * nv * quantile * V)).

        spec_tokens > 0 enables prompt-lookup speculative decoding — OFF by
        default: the (1+4)-row verification costs only 1.048x a plain step
        (bench_results/spec_r3d.json; break-even acceptance 1.2%), but
        every measured corpus lands below or near break-even — prompt-
        lookup 0.4-0.6% and even a trained nano model-draft only 2.3%
        (projected on-chip speedup 1.03x, bench_results/spec_engine_r5.json)
        on the synthetic corpus, whose near-tied successor distributions
        make greedy argmax agreement intrinsically low. Turn it on (with
        the adaptive cooldown bounding the downside) for self-repetitive
        real text — RUNBOOK.md §2 re-measures acceptance per corpus.
        (The reference has nothing comparable; cf. vLLM's ngram
        speculator.) Each
        step the host proposes spec_tokens draft tokens per slot from the
        newest spec_ngram-gram's previous occurrence in that slot's own
        history, and ONE multi-token verification forward (the chunked-
        prefill path, per-slot q_offsets) scores all of them. Greedy slots
        accept the longest prefix of drafts matching the model's argmax —
        output EXACTLY equals plain greedy decoding, but self-repetitive
        text (code, lists, quotes) emits several tokens per step. Sampling
        slots (temperature > 0) keep exact semantics by taking one token per
        step from the same dispatch. Decode attention cost per step rises
        from 1 to spec_tokens+1 query rows (still one cache read), so
        speculation pays off whenever the mean acceptance is above ~0 on a
        memory-bound decode. Incompatible with control/negative slots: the
        engine falls back to plain stepping while any are active.

        spec_min_acceptance > 0 makes speculation ADAPTIVE: when the
        rolling draft acceptance (last 32 speculative steps, after at least
        8) falls below the threshold, the engine runs plain steps for
        spec_cooldown steps before probing again — random text stops paying
        the (1+k)-row verification cost, self-repetitive text keeps the
        speedup.

        draft_params/draft_cfg: MODEL-DRAFT speculation — a smaller Backpack
        (e.g. backpack-micro drafting for -small) proposes the spec_tokens
        drafts from its own per-slot cache (one extra dispatch per step
        running k draft decode steps in one scan) instead of host-side
        prompt-lookup. Output still exactly equals plain decoding (the
        verification is unchanged); acceptance reflects true model
        agreement, so speculation pays on corpora where n-gram lookup gets
        ~0. The draft cache rolls back by length-resync at each dispatch
        and is prefilled during packed admission waves.

        prefill_chunk > 0 admits plain requests via CHUNKED prefill: every
        admission wave runs ceil(max_prompt_len / prefill_chunk) dispatches
        of ONE fixed (n, prefill_chunk) shape at advancing cache offsets
        (the kernel's chunked-prefill q_offsets), instead of one dispatch
        per power-of-two length bucket. Fewer distinct compiled shapes, and
        admission cost scales with the longest prompt, not its bucket."""
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seqlen = max_seqlen
        self.use_flash = use_flash
        self.eos_id = eos_id
        self.sched = make_scheduler(max_slots, max_seqlen, eos_id,
                                    prefer_native=prefer_native_scheduler)
        self.cache_dtype = cache_dtype
        # staging block (stage_tokens > 0): decode/verify writes append to a
        # C-column block at a SCALAR pointer instead of streaming the window
        # prefix per step (models/gpt.py KVCache staging). Measured on v5e
        # (bench_results/spec_staged_r3.json, batch 64, w=256): per-slot
        # step 4.09 -> 2.31 ms flush-amortized, 1.77x — vs 1.58 ms for the
        # scalar-length step the masked per-row write was 2.6x. The engine
        # flushes when the block fills and for intervention steps.
        self._stage_cap = int(stage_tokens)
        self._stage_used = 0
        self.cache = bp.init_backpack_cache(cfg, max_slots, max_seqlen,
                                            dtype=cache_dtype, per_slot=True,
                                            stage=self._stage_cap)
        self._flush_fn = jax.jit(bp.flush_cache, donate_argnums=(0,))
        # host-side per-slot positions: the engine picks a static `window`
        # length bucket per dispatch (decode reads only a cache prefix) —
        # device lengths would cost a fetch round-trip per step
        self.host_lengths = np.zeros((max_slots,), np.int64)
        # finer buckets => less cache traffic early in a sequence, but one
        # compiled step per bucket; NOTES.md measured +45% decode from
        # bucketing at all. 128-MULTIPLES ONLY: the cache S axis is
        # (8,128)-tiled, and bench_results/window_buckets_r3.json measured
        # misaligned buckets (64/192/320/448) at 2-3x the cost of the NEXT
        # LARGER aligned one (w=192: 7.5ms/step vs w=256: 4.0ms at batch 64
        # — the misaligned static slice forces lane-shuffle copies).
        # Overridable per deployment.
        if window_buckets is None:
            window_buckets = (128, 256, 384, max_seqlen)
        self.window_buckets = sorted({min(b, max_seqlen) for b in
                                      window_buckets
                                      if b <= max_seqlen} | {max_seqlen})
        self.tokens = jnp.zeros((max_slots, 1), jnp.int32)
        self.temps = np.zeros((max_slots,), np.float32)   # 0 = greedy
        self.sense_weights = np.ones((max_slots, cfg.num_senses), np.float32)
        self._uses_weights = False
        self.control_table = (jnp.asarray(control_table, jnp.float32)
                              if control_table is not None else None)
        self.annealing_scale = annealing_scale
        self.control_mask = np.zeros((max_slots,), bool)
        self._uses_control = False
        from ..models import interventions as iv
        self._iv = iv
        self.istate = iv.init_weighted_decode_state(cfg, max_slots,
                                                    max_seqlen)
        self.negative_table = (jnp.asarray(negative_table, jnp.float32)
                               if negative_table is not None else None)
        self.negative_quantile = negative_quantile
        self.negative_anneal = negative_anneal
        self.negative_annealing_scale = negative_annealing_scale
        self.negative_mask = np.zeros((max_slots,), bool)
        self.nstate = None            # lazy: first negative admission
        self._uses_negative = False
        self._jit_steps_negative = {}
        self._rng = jax.random.PRNGKey(seed)
        self._next_id = 0
        self.prefill_dispatches = 0   # observability: admission batching
        import collections
        import time as _time
        self._clock = _time.perf_counter
        self._stats = collections.Counter()
        self.top_ps = np.ones((max_slots,), np.float32)
        self._uses_top_p = False
        self._meta_top_p = {}
        self.top_ks = np.zeros((max_slots,), np.int32)
        self._uses_top_k = False
        self._meta_top_k = {}
        self._meta_stop = {}
        self.stop_seqs = [[] for _ in range(max_slots)]
        self._meta_min = {}
        self.min_tokens = np.zeros((max_slots,), np.int64)
        self.emitted = np.zeros((max_slots,), np.int64)
        self._uses_min = False
        self._meta_penalty = {}
        self._meta_logprobs = {}
        self.logprob_mask = np.zeros((max_slots,), bool)
        self._slot_logprobs: List[List[float]] = [[] for _ in
                                                  range(max_slots)]
        self._uses_logprobs = False
        self.freq_p = np.zeros((max_slots,), np.float32)
        self.pres_p = np.zeros((max_slots,), np.float32)
        self.token_counts = jnp.zeros((max_slots, cfg.padded_vocab_size),
                                      jnp.int32)
        self._uses_penalty = False
        self._window_hist = collections.Counter()
        self.spec_tokens = int(spec_tokens)
        self.spec_ngram = int(spec_ngram)
        self.spec_min_acceptance = float(spec_min_acceptance)
        self.spec_cooldown = int(spec_cooldown)
        self._spec_recent = collections.deque(maxlen=32)
        self._spec_skip_until = 0
        self.prefill_chunk = int(prefill_chunk)
        if self.prefill_chunk:
            # chunk grid must tile the cache exactly: a final chunk spilling
            # past max_seqlen would clamp its dynamic_update_slice start and
            # overwrite earlier rows
            assert max_seqlen % self.prefill_chunk == 0, \
                (max_seqlen, self.prefill_chunk)
        # per-slot token history (prompt + emitted) for prompt-lookup drafts
        self.host_tokens = np.zeros((max_slots, max_seqlen + spec_tokens + 2),
                                    np.int32)
        self.hist_len = np.zeros((max_slots,), np.int64)
        self._jit_spec_steps = {}
        # ---- model-draft speculation: a small Backpack (e.g. backpack-
        # micro drafting for -small) proposes the k tokens instead of
        # prompt-lookup. The draft keeps its own per-slot cache; its length
        # counters resync from host_lengths at every draft dispatch, so
        # rejected draft rows are masked out and overwritten in place (the
        # same rollback-by-length the verification uses on the main cache).
        # Acceptance comes from genuine model agreement, so speculation
        # pays on corpora where n-gram lookup gets ~0 (measured: prompt-
        # lookup 0.6% on the bigram corpus, below the 1.2% break-even).
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.draft_cache = None
        self._jit_draft = {}
        self.draft_cache_dtype = draft_cache_dtype
        if draft_params is not None and self.spec_tokens > 0:
            assert draft_cfg is not None, "draft_params requires draft_cfg"
            self.draft_cache = bp.init_backpack_cache(
                draft_cfg, max_slots, max_seqlen, dtype=draft_cache_dtype,
                per_slot=True)
        self._t_first_step = None
        self._meta: Dict[int, tuple] = {}
        self._prompts: Dict[int, np.ndarray] = {}
        self._results: Dict[int, RequestResult] = {}
        self._jit_prefill = {}
        self._jit_steps = {}        # keyed (weighted, window, top_p?)
        self._jit_steps_controlled = {}   # keyed (window, top_p?)

    # ------------------------------------------------------------ submit

    def submit(self, prompt, *, max_new_tokens: int = 64,
               min_new_tokens: int = 0,
               temperature: float = 0.0, top_p: float = 1.0, top_k: int = 0,
               frequency_penalty: float = 0.0, presence_penalty: float = 0.0,
               sense_weights: Optional[np.ndarray] = None,
               control: bool = False, negative: bool = False,
               stop: Optional[List[List[int]]] = None,
               logprobs: bool = False) -> int:
        """Queue a request. Returns its id, or raises if the prompt can never
        fit the cache. control=True decodes under the engine's annealed
        control_table (topic control, reference intervened_models.py:58);
        negative=True decodes under the engine's negative_table
        (toxicity removal, reference intervened_models.py:108).
        stop: optional token-id sequences; generation finishes when the
        emitted tokens end with any of them, and the matched sequence is
        EXCLUDED from the result (eos_id semantics keep the eos).
        min_new_tokens: suppress the eos logit until this many tokens have
        been emitted (stop sequences are not suppressed).
        frequency_penalty / presence_penalty: OpenAI-style additive logit
        penalties from per-slot token counts (prompt + emitted); while any
        penalized slot is active, speculation falls back to plain stepping
        (penalty-aware logits change the greedy argmax mid-draft).
        logprobs=True records log p(token) for every emitted token (see
        RequestResult.logprobs); works on every path incl. speculative."""
        if control and self.control_table is None:
            raise ValueError("control=True needs a control_table on the "
                             "engine")
        if negative and self.negative_table is None:
            raise ValueError("negative=True needs a negative_table on the "
                             "engine")
        if control and negative:
            raise ValueError("control and negative are mutually exclusive "
                             "per request")
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        rid = self._next_id
        self._next_id += 1
        if not self.sched.submit(rid, len(prompt), max_new_tokens):
            raise ValueError(
                f"prompt of {len(prompt)} tokens cannot fit max_seqlen="
                f"{self.max_seqlen}")
        if not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {top_k}")
        self._prompts[rid] = prompt
        self._meta[rid] = (temperature, sense_weights, control, negative)
        self._meta_top_p[rid] = top_p
        self._meta_top_k[rid] = top_k
        if stop:
            self._meta_stop[rid] = [np.asarray(s, np.int64).reshape(-1)
                                    for s in stop if len(s)]
        if min_new_tokens:
            self._meta_min[rid] = int(min_new_tokens)
        if frequency_penalty or presence_penalty:
            self._meta_penalty[rid] = (float(frequency_penalty),
                                       float(presence_penalty))
        if logprobs:
            self._meta_logprobs[rid] = True
        return rid

    # ------------------------------------------------------------ internals

    @staticmethod
    def _apply_penalties(last, counts, freq_p, pres_p):
        """OpenAI-style additive penalties from per-slot token counts
        (prompt + emitted): logits - freq*count - pres*(count > 0)."""
        c = counts.astype(jnp.float32)
        return (last - freq_p[:, None] * c
                - pres_p[:, None] * (c > 0).astype(jnp.float32))

    @staticmethod
    def _sample_tokens(last, temps, rng, top_ps=None, top_ks=None,
                       eos_ban=None, eos_id=0, return_lp=False):
        """Per-slot greedy/temperature(+nucleus/top-k) sampling (one batched
        op). top_ps/top_ks None compile the unrestricted path (no per-step
        vocab sort). eos_ban: (b,) bool — rows still under min_new_tokens
        have the eos column suppressed before ANY selection. return_lp
        (static) additionally returns the chosen token's log-probability
        under the temperature-1 post-ban distribution."""
        if eos_ban is not None:
            col = jnp.arange(last.shape[-1])[None, :] == eos_id
            last = jnp.where(eos_ban[:, None] & col, -jnp.inf, last)
        greedy = jnp.argmax(last, -1)
        logits = last / jnp.maximum(temps, 1e-6)[:, None]
        if top_ps is not None or top_ks is not None:
            sorted_l = jnp.sort(logits, axis=-1)[:, ::-1]
            cutoff = jnp.full((logits.shape[0], 1), -jnp.inf)
            if top_ps is not None:
                # keep the smallest descending-prob prefix with cum > top_p
                probs = jax.nn.softmax(sorted_l, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                keep = cum - probs < top_ps[:, None]
                cutoff = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1,
                                 keepdims=True)
            if top_ks is not None:
                # kth-largest logit per row; top_k <= 0 means unrestricted
                idx = jnp.clip(top_ks - 1, 0, logits.shape[-1] - 1)
                kth = jnp.take_along_axis(sorted_l, idx[:, None], axis=-1)
                kth = jnp.where((top_ks > 0)[:, None], kth, -jnp.inf)
                cutoff = jnp.maximum(cutoff, kth)
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        sampled = jax.random.categorical(rng, logits, axis=-1)
        nxt = jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)
        if not return_lp:
            return nxt
        lp = jnp.take_along_axis(jax.nn.log_softmax(last, axis=-1),
                                 nxt[:, None], axis=-1)[:, 0]
        return nxt, lp

    def _prefill_fn(self, bucket: int, controlled: bool = False):
        key = (bucket, controlled)
        if key not in self._jit_prefill:
            cfg, use_flash = self.cfg, self.use_flash
            iv = self._iv
            ann = self.annealing_scale

            def prefill(params, ids, true_len, weights, table):
                small = bp.init_backpack_cache(cfg, 1, self.max_seqlen,
                                               dtype=self.cache_dtype)
                state = iv.init_weighted_decode_state(cfg, 1, self.max_seqlen)
                if controlled:
                    mask = (jnp.arange(ids.shape[1]) < true_len)[None]
                    state, w = iv.advance_weighted_state(
                        params, cfg, ids, small, state, table, anneal=True,
                        annealing_scale=ann, token_mask=mask)
                    sw = w * weights[:, None, :]
                else:
                    sw = weights          # (1, nv) per-request control only
                logits, small = bp.backpack_forward_with_cache(
                    params, cfg, ids, small, use_flash=use_flash,
                    sense_weights=sw)
                # ids are right-padded to the bucket; the causal mask keeps
                # pads invisible to real tokens, so the logits at true_len-1
                # and the first true_len cache rows are exact. Overwrite BOTH
                # length counters (outer and gpt) with the true length —
                # leaving gpt.length at the bucket makes every later decode
                # step attend the pad K/V rows and take the wrong position id.
                last = logits[0, true_len - 1]
                tl = true_len.astype(jnp.int32)
                small = small._replace(length=tl,
                                       gpt=small.gpt._replace(length=tl))
                return last, small, state

            self._jit_prefill[key] = jax.jit(prefill)
        return self._jit_prefill[key]

    def _window(self, extra: int = 1) -> int:
        """Smallest length bucket covering every active slot after this
        step (host-tracked positions; no device fetch). `extra` is the
        number of new cache rows this dispatch writes (1 for plain decode,
        spec_tokens+1 for a speculative verification)."""
        active = [self.host_lengths[sl] for sl in range(self.max_slots)
                  if self.sched.slot_active(sl)]
        need = (max(active) if active else 0) + extra
        for b in self.window_buckets:
            if b >= need:
                return b
        return self.max_seqlen

    def _step_fn(self, weighted: bool, window: int):
        key = (weighted, window, self._uses_top_p, self._uses_top_k,
               self._uses_min, self._uses_penalty, self._uses_logprobs)
        if key not in self._jit_steps:
            cfg, use_flash = self.cfg, self.use_flash
            win = None if window >= self.max_seqlen else window
            use_top_p = self._uses_top_p
            use_top_k = self._uses_top_k
            sample = self._sample_tokens

            use_min = self._uses_min
            use_pen = self._uses_penalty
            use_lp = self._uses_logprobs
            eos_id = self.eos_id
            pen = self._apply_penalties

            def step(params, toks, cache, temps, top_ps, top_ks, ban,
                     counts, fps, pps, rng, weights):
                kw = {"sense_weights": weights} if weighted else {}
                logits, cache = bp.backpack_forward_with_cache(
                    params, cfg, toks, cache, use_flash=use_flash,
                    window=win, **kw)
                last = logits[:, -1]
                if use_pen:
                    last = pen(last, counts, fps, pps)
                nxt = sample(last, temps, rng,
                             top_ps if use_top_p else None,
                             top_ks if use_top_k else None,
                             ban if use_min else None, eos_id,
                             return_lp=use_lp)
                nxt, lp = nxt if use_lp else (nxt, jnp.zeros_like(temps))
                counts = counts.at[jnp.arange(counts.shape[0]), nxt].add(1)
                return nxt[:, None], cache, counts, lp

            self._jit_steps[key] = jax.jit(step, donate_argnums=(2,))
        return self._jit_steps[key]

    def _spec_step_fn(self, window: int):
        """Speculative verification step: ONE (b, 1+k) forward through the
        chunked-prefill cache path (per-slot q_offsets) scores the in-flight
        token plus k drafts. Greedy slots accept the longest draft prefix
        matching the model argmax and emit acc+1 tokens (bit-identical to
        plain greedy decoding); sampling slots emit 1 token drawn from the
        position-0 logits (exactly the plain step's distribution). Cache
        length counters are rolled back to old + acc + 1 so rejected rows
        are masked out and overwritten by the next dispatch."""
        key = (window, self._uses_weights, self._uses_top_p,
               self._uses_top_k, self._uses_min, self._uses_logprobs)
        if key not in self._jit_spec_steps:
            cfg, use_flash = self.cfg, self.use_flash
            weighted = self._uses_weights
            win = None if window >= self.max_seqlen else window
            use_top_p = self._uses_top_p
            use_top_k = self._uses_top_k
            sample = self._sample_tokens
            k = self.spec_tokens

            use_min = self._uses_min
            use_lp = self._uses_logprobs
            eos_id = self.eos_id

            def step(params, toks, drafts, cache, temps, top_ps, top_ks,
                     emitted, mins, rng, weights):
                inp = jnp.concatenate([toks, drafts], axis=1)   # (b, 1+k)
                old_len = cache.length
                kw = {"sense_weights": weights} if weighted else {}
                logits, cache = bp.backpack_forward_with_cache(
                    params, cfg, inp, cache, use_flash=use_flash,
                    window=win, **kw)
                if use_min:
                    # position t emits token #(emitted + t + 1): suppress
                    # the eos column while that count is still under min
                    ban_t = (emitted[:, None] + jnp.arange(k + 1)[None]
                             < mins[:, None])                    # (b, 1+k)
                    col = (jnp.arange(logits.shape[-1])[None, None]
                           == eos_id)
                    logits = jnp.where(ban_t[..., None] & col, -jnp.inf,
                                       logits)
                preds = jnp.argmax(logits, -1).astype(jnp.int32)  # (b, 1+k)
                match = (preds[:, :-1] == drafts).astype(jnp.int32)
                acc = jnp.cumprod(match, axis=1).sum(axis=1)      # (b,)
                greedy = temps <= 0
                acc = jnp.where(greedy, acc, 0)
                bonus = jnp.take_along_axis(preds, acc[:, None], axis=1)[:, 0]
                sampled0 = sample(logits[:, 0], temps, rng,
                                  top_ps if use_top_p else None,
                                  top_ks if use_top_k else None)
                # (logits already eos-banned above when use_min)
                head = jnp.where(greedy, bonus, sampled0)
                tpos = jnp.arange(k + 1)[None]
                dpad = jnp.pad(drafts, ((0, 0), (0, 1)))
                emitted = jnp.where(
                    tpos < acc[:, None], dpad,
                    jnp.where(tpos == acc[:, None], head[:, None], 0))
                n_emit = (acc + 1).astype(jnp.int32)
                new_len = old_len + n_emit
                cache = cache._replace(
                    length=new_len, gpt=cache.gpt._replace(length=new_len))
                if use_lp:
                    # position t's logits (already eos-banned above) score
                    # the token emitted at position t; rows past n_emit are
                    # never read by the host
                    lp = jnp.take_along_axis(
                        jax.nn.log_softmax(logits, axis=-1),
                        emitted[..., None], axis=-1)[..., 0]   # (b, 1+k)
                else:
                    lp = jnp.zeros_like(emitted, jnp.float32)
                return emitted, n_emit, head[:, None], cache, lp

            self._jit_spec_steps[key] = jax.jit(step, donate_argnums=(3,))
        return self._jit_spec_steps[key]

    # ---------------------------------------------------- model drafts

    def _draft_k_fn(self, window: int):
        """ONE dispatch: k sequential greedy decode steps of the draft model
        over its own cache -> (b, k) draft tokens. Length counters resync
        from the target's host lengths inside the jit (no extra dispatch),
        which both rolls back rejected rows from the previous step and
        keeps freed/reused slots consistent."""
        key = ("draftk", window)
        if key not in self._jit_draft:
            dcfg, use_flash = self.draft_cfg, self.use_flash
            win = None if window >= self.max_seqlen else window
            k = self.spec_tokens

            def draftk(dparams, toks, dcache, lengths):
                lengths = lengths.astype(jnp.int32)
                dcache = dcache._replace(
                    length=lengths, gpt=dcache.gpt._replace(length=lengths))

                def body(carry, _):
                    tok, dcache = carry
                    logits, dcache = bp.backpack_forward_with_cache(
                        dparams, dcfg, tok, dcache, use_flash=use_flash,
                        window=win)
                    nxt = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
                    return (nxt, dcache), nxt[:, 0]

                (_, dcache), drafts = jax.lax.scan(body, (toks, dcache),
                                                   None, length=k)
                return drafts.T, dcache          # (b, k)

            self._jit_draft[key] = jax.jit(draftk, donate_argnums=(2,))
        return self._jit_draft[key]

    def _draft_prefill_fn(self, bucket: int, n: int):
        """Draft-model analogue of _batch_prefill_fn (cache only)."""
        key = ("dprefill", bucket, n)
        if key not in self._jit_draft:
            dcfg, use_flash = self.draft_cfg, self.use_flash

            def prefill(dparams, ids, true_len):
                small = bp.init_backpack_cache(dcfg, n, self.max_seqlen,
                                               dtype=self.draft_cache_dtype,
                                               per_slot=True)
                _, small = bp.backpack_forward_with_cache(
                    dparams, dcfg, ids, small, use_flash=use_flash)
                tl = true_len.astype(jnp.int32)
                return small._replace(length=tl,
                                      gpt=small.gpt._replace(length=tl))

            self._jit_draft[key] = jax.jit(prefill)
        return self._jit_draft[key]

    def _draft_insert_rows_fn(self, n: int):
        key = ("dinsert", n)
        if key not in self._jit_draft:
            dcfg = self.draft_cfg

            def insert(big, small, slots):
                for i in reversed(range(n)):
                    row = bp.extract_cache_slot(small, i, dcfg)
                    big = bp.insert_cache_slot(big, row, slots[i])
                return big

            self._jit_draft[key] = jax.jit(insert, donate_argnums=(0,))
        return self._jit_draft[key]

    def _admit_draft(self, recs, slots) -> None:
        """Prefill the draft cache for a packed admission wave (same slots;
        the draft builds its own padded batch so chunked-prefill admissions
        work too)."""
        n = len(slots)
        dbucket = min(_bucket(max(r[2] for r in recs)), self.max_seqlen)
        ids = np.zeros((n, dbucket), np.int32)
        lens = np.ones((n,), np.int32)
        for i, rec in enumerate(recs):
            slot, rid, plen = rec[0], rec[1], rec[2]
            ids[i, :plen] = self._prompts[rid]
            lens[i] = plen
        small = self._draft_prefill_fn(dbucket, n)(
            self.draft_params, jnp.asarray(ids), jnp.asarray(lens))
        self.draft_cache = self._draft_insert_rows_fn(n)(
            self.draft_cache, small, jnp.asarray(slots))

    def _build_drafts(self) -> np.ndarray:
        """Per-slot prompt-lookup drafts over the host-tracked histories."""
        drafts = np.zeros((self.max_slots, self.spec_tokens), np.int32)
        for slot in range(self.max_slots):
            if not self.sched.slot_active(slot):
                continue
            hist = self.host_tokens[slot, :int(self.hist_len[slot])]
            drafts[slot] = prompt_lookup_draft(hist, self.spec_tokens,
                                               self.spec_ngram)
        return drafts

    def _ctl_step_fn(self, window: int):
        key = (window, self._uses_top_p, self._uses_top_k, self._uses_min,
               self._uses_penalty, self._uses_logprobs)
        if key not in self._jit_steps_controlled:
            cfg, use_flash = self.cfg, self.use_flash
            iv = self._iv
            ann = self.annealing_scale
            win = None if window >= self.max_seqlen else window
            use_top_p = self._uses_top_p
            use_top_k = self._uses_top_k
            sample = self._sample_tokens

            use_min = self._uses_min
            use_pen = self._uses_penalty
            use_lp = self._uses_logprobs
            eos_id = self.eos_id
            pen = self._apply_penalties

            def step(params, toks, cache, istate, temps, top_ps, top_ks,
                     ban, counts, fps, pps, rng, req_w, cmask, table):
                istate, w = iv.advance_weighted_state(
                    params, cfg, toks, cache, istate, table, anneal=True,
                    annealing_scale=ann, window=win)
                w = jnp.where(cmask[:, None, None], w, 1.0)
                w = w * req_w[:, None, :]
                logits, cache = bp.backpack_forward_with_cache(
                    params, cfg, toks, cache, use_flash=use_flash,
                    sense_weights=w, window=win)
                last = logits[:, -1]
                if use_pen:
                    last = pen(last, counts, fps, pps)
                nxt = sample(last, temps, rng,
                             top_ps if use_top_p else None,
                             top_ks if use_top_k else None,
                             ban if use_min else None, eos_id,
                             return_lp=use_lp)
                nxt, lp = nxt if use_lp else (nxt, jnp.zeros_like(temps))
                counts = counts.at[jnp.arange(counts.shape[0]), nxt].add(1)
                return nxt[:, None], cache, istate, counts, lp

            self._jit_steps_controlled[key] = jax.jit(
                step, donate_argnums=(2, 3))
        return self._jit_steps_controlled[key]

    def _neg_prefill_fn(self, bucket: int):
        key = ("negative", bucket)
        if key not in self._jit_prefill:
            cfg, use_flash = self.cfg, self.use_flash
            iv = self._iv

            def prefill(params, ids, true_len, table):
                small = bp.init_backpack_cache(cfg, 1, self.max_seqlen,
                                               dtype=self.cache_dtype)
                nstate = iv.init_negative_decode_state(
                    cfg, 1, self.max_seqlen, quantile=self.negative_quantile)
                mask = (jnp.arange(ids.shape[1]) < true_len)[None]
                logits, small, nstate = iv.negative_decode_step(
                    params, cfg, ids, small, nstate, table,
                    anneal=self.negative_anneal,
                    annealing_scale=self.negative_annealing_scale,
                    quantile=self.negative_quantile, use_flash=use_flash,
                    token_mask=mask)
                last = logits[0, true_len - 1]
                tl = true_len.astype(jnp.int32)
                small = small._replace(length=tl,
                                       gpt=small.gpt._replace(length=tl))
                return last, small, nstate

            self._jit_prefill[key] = jax.jit(prefill)
        return self._jit_prefill[key]

    def _neg_step_fn(self, window: int):
        """Decode step when any negative-weighted slot is active; also
        carries per-request sense weights and (if present) annealed control
        slots, so all three intervention modes share the batch."""
        key = (window, self._uses_control, self._uses_top_p,
               self._uses_top_k, self._uses_min, self._uses_penalty,
               self._uses_logprobs)
        if key not in self._jit_steps_negative:
            cfg, use_flash = self.cfg, self.use_flash
            iv = self._iv
            ann_ctl = self.annealing_scale
            uses_control = self._uses_control
            win = None if window >= self.max_seqlen else window
            use_top_p = self._uses_top_p
            use_top_k = self._uses_top_k
            sample = self._sample_tokens

            use_min = self._uses_min
            use_pen = self._uses_penalty
            use_lp = self._uses_logprobs
            eos_id = self.eos_id
            pen = self._apply_penalties

            def step(params, toks, cache, nstate, istate, temps, top_ps,
                     top_ks, ban, counts, fps, pps, rng, req_w, cmask,
                     nmask, ctable, ntable):
                if uses_control:
                    istate, w = iv.advance_weighted_state(
                        params, cfg, toks, cache, istate, ctable, anneal=True,
                        annealing_scale=ann_ctl, window=win)
                    w = jnp.where(cmask[:, None, None], w, 1.0)
                    w = w * req_w[:, None, :]
                else:
                    w = req_w          # (b, nv)
                logits, cache, nstate = iv.negative_decode_step(
                    params, cfg, toks, cache, nstate, ntable,
                    anneal=self.negative_anneal,
                    annealing_scale=self.negative_annealing_scale,
                    quantile=self.negative_quantile, use_flash=use_flash,
                    negative_mask=nmask, sense_weights=w, window=win)
                last = logits[:, -1]
                if use_pen:
                    last = pen(last, counts, fps, pps)
                nxt = sample(last, temps, rng,
                             top_ps if use_top_p else None,
                             top_ks if use_top_k else None,
                             ban if use_min else None, eos_id,
                             return_lp=use_lp)
                nxt, lp = nxt if use_lp else (nxt, jnp.zeros_like(temps))
                counts = counts.at[jnp.arange(counts.shape[0]), nxt].add(1)
                return nxt[:, None], cache, nstate, istate, counts, lp

            self._jit_steps_negative[key] = jax.jit(step,
                                                    donate_argnums=(2, 3, 4))
        return self._jit_steps_negative[key]

    def _batch_prefill_fn(self, bucket: int, n: int):
        """One prefill dispatch for n packed plain requests: ids (n, bucket)
        right-padded, per-row true lengths. The causal mask keeps each row's
        pads invisible to its real tokens, so every row's last-real-token
        logits and first true_len cache rows are exact — the batch analogue
        of the reference's cu_seqlens varlen batching (SURVEY §2.1 N1),
        expressed as static padded shapes + per-row lengths."""
        key = ("batched", bucket, n)
        if key not in self._jit_prefill:
            cfg, use_flash = self.cfg, self.use_flash

            def prefill(params, ids, true_len, weights):
                small = bp.init_backpack_cache(cfg, n, self.max_seqlen,
                                               dtype=self.cache_dtype,
                                               per_slot=True)
                logits, small = bp.backpack_forward_with_cache(
                    params, cfg, ids, small, use_flash=use_flash,
                    sense_weights=weights)
                last = jnp.take_along_axis(
                    logits, (true_len - 1)[:, None, None], axis=1)[:, 0]
                tl = true_len.astype(jnp.int32)
                small = small._replace(length=tl,
                                       gpt=small.gpt._replace(length=tl))
                return last, small

            self._jit_prefill[key] = jax.jit(prefill)
        return self._jit_prefill[key]

    def _chunk_prefill_fn(self, n: int):
        """One chunk of a chunked batched prefill: ids (n, W) continue every
        row's cache at its current offset; rows whose true length ends inside
        this chunk contribute their last-real-token logits (later chunks for
        such rows process right-padding that the causal mask + the final
        length reset keep invisible)."""
        key = ("chunk", n)
        if key not in self._jit_prefill:
            cfg, use_flash = self.cfg, self.use_flash
            W = self.prefill_chunk

            def chunk(params, ids, true_len, weights, cache, last_prev):
                logits, cache = bp.backpack_forward_with_cache(
                    params, cfg, ids, cache, use_flash=use_flash,
                    sense_weights=weights)
                off = cache.length - W          # (n,) this chunk's start
                idx = true_len - 1 - off        # last-token pos within chunk
                in_chunk = (idx >= 0) & (idx < W)
                sel = jnp.take_along_axis(
                    logits, jnp.clip(idx, 0, W - 1)[:, None, None],
                    axis=1)[:, 0]
                last = jnp.where(in_chunk[:, None], sel, last_prev)
                return last, cache

            self._jit_prefill[key] = jax.jit(chunk, donate_argnums=(4, 5))
        return self._jit_prefill[key]

    def _chunked_prefill(self, recs):
        """Admit plain requests via fixed-width chunked prefill; returns
        (last_logits (n, V), small_cache) like _batch_prefill_fn."""
        W = self.prefill_chunk
        n = _bucket(len(recs), minimum=1)
        max_len = max(r[2] for r in recs)
        n_chunks = -(-max_len // W)
        ids = np.zeros((n, n_chunks * W), np.int32)
        lens = np.ones((n,), np.int32)
        ws = np.ones((n, self.cfg.num_senses), np.float32)
        for i, (slot, rid, plen, temp, w, sw, control, negative) \
                in enumerate(recs):
            ids[i, :plen] = self._prompts[rid]
            lens[i] = plen
            ws[i] = w
        cache = bp.init_backpack_cache(self.cfg, n, self.max_seqlen,
                                       dtype=self.cache_dtype, per_slot=True)
        last = jnp.zeros((n, self.cfg.padded_vocab_size), jnp.float32)
        fn = self._chunk_prefill_fn(n)
        ids_j = jnp.asarray(ids)
        lens_j = jnp.asarray(lens)
        ws_j = jnp.asarray(ws)
        for ci in range(n_chunks):
            last, cache = fn(self.params, ids_j[:, ci * W:(ci + 1) * W],
                             lens_j, ws_j, cache, last)
            self.prefill_dispatches += 1
        tl = lens_j.astype(jnp.int32)
        cache = cache._replace(length=tl, gpt=cache.gpt._replace(length=tl))
        return last, cache

    def _insert_rows_fn(self, n: int):
        """Scatter the n rows of a packed prefill cache into their serving
        slots in ONE jitted dispatch (extract_cache_slot + insert_cache_slot
        per row, unrolled; slots are traced so the compile is reused across
        admission waves)."""
        key = ("insert", n)
        if key not in self._jit_prefill:
            cfg = self.cfg

            def insert(big, small, slots):
                # reverse order: pad rows alias a real row's slot and must
                # land BEFORE it so the real prefill is the final state
                for i in reversed(range(n)):
                    row = bp.extract_cache_slot(small, i, cfg)
                    big = bp.insert_cache_slot(big, row, slots[i])
                return big

            self._jit_prefill[key] = jax.jit(insert, donate_argnums=(0,))
        return self._jit_prefill[key]

    def _post_admit(self, slot: int, rid: int, plen: int, temp, w, sw,
                    control: bool, negative: bool, last_logits) -> None:
        """Host-side bookkeeping shared by every admission path; samples the
        request's first token from its prefill logits."""
        self.control_mask[slot] = control
        self.negative_mask[slot] = negative
        self.host_lengths[slot] = plen
        self.temps[slot] = temp
        self.sense_weights[slot] = w
        top_p = self._meta_top_p.pop(rid, 1.0)
        self.top_ps[slot] = top_p
        if top_p < 1.0:
            self._uses_top_p = True
        top_k = self._meta_top_k.pop(rid, 0)
        self.top_ks[slot] = top_k
        if top_k > 0:
            self._uses_top_k = True
        self.stop_seqs[slot] = self._meta_stop.pop(rid, [])
        self.min_tokens[slot] = self._meta_min.pop(rid, 0)
        self.emitted[slot] = 0
        if self.min_tokens[slot] > 0:
            self._uses_min = True
        fp, pp = self._meta_penalty.pop(rid, (0.0, 0.0))
        self.freq_p[slot] = fp
        self.pres_p[slot] = pp
        if fp or pp:
            self._uses_penalty = True
        wants_lp = self._meta_logprobs.pop(rid, False)
        self.logprob_mask[slot] = wants_lp
        self._slot_logprobs[slot] = []
        if wants_lp:
            self._uses_logprobs = True
        # per-slot token counts: prompt tokens + the admit-time emission
        row = np.zeros((self.cfg.padded_vocab_size,), np.int32)
        ids, cts = np.unique(self._prompts[rid], return_counts=True)
        row[ids] = cts
        self.token_counts = self.token_counts.at[slot].set(
            jnp.asarray(row))
        if sw is not None:
            self._uses_weights = True
        if fp or pp:
            rowf = row.astype(np.float32)
            last_logits = last_logits - jnp.asarray(
                fp * rowf + pp * (rowf > 0))
        ban = (jnp.asarray([True]) if self.min_tokens[slot] > 0 else None)
        if temp > 0:
            self._rng, sub = jax.random.split(self._rng)
            tok = int(self._sample_tokens(
                last_logits[None], jnp.asarray([temp], jnp.float32), sub,
                jnp.asarray([top_p], jnp.float32) if top_p < 1.0 else None,
                jnp.asarray([top_k], jnp.int32) if top_k > 0 else None,
                ban, self.eos_id)[0])
        elif ban is not None:
            tok = int(self._sample_tokens(
                last_logits[None], jnp.asarray([0.0], jnp.float32),
                jax.random.PRNGKey(0), None, None, ban, self.eos_id)[0])
        else:
            tok = int(jnp.argmax(last_logits))
        if wants_lp:
            # admit-time emission: same temperature-1 post-ban semantics as
            # the step paths, computed host-side (one row, once per request)
            row = np.asarray(last_logits, np.float64).copy()
            if ban is not None:
                row[self.eos_id] = -np.inf
            row -= row.max()
            self._slot_logprobs[slot].append(
                float(row[tok] - np.log(np.exp(row).sum())))
        self.tokens = self.tokens.at[slot, 0].set(tok)
        self.token_counts = self.token_counts.at[slot, tok].add(1)
        self.emitted[slot] = 1
        self.host_tokens[slot, :plen] = self._prompts[rid]
        self.host_tokens[slot, plen] = tok
        self.hist_len[slot] = plen + 1
        if self.sched.on_token(slot, tok):
            self._finish(slot)

    def _admit_all(self) -> List[int]:
        # Drain the scheduler first so same-shaped plain admissions can share
        # one prefill dispatch (VERDICT r1 item 6: admission used to be
        # prefill-serialized batch-1 under bursty load).
        plain, special = [], []
        while True:
            got = self.sched.admit()
            if got is None:
                break
            slot, rid, plen = got
            temp, sw, control, negative = self._meta[rid]
            w = (np.ones(self.cfg.num_senses, np.float32) if sw is None
                 else np.asarray(sw, np.float32))
            rec = (slot, rid, plen, temp, w, sw, control, negative)
            (special if (control or negative) else plain).append(rec)

        admitted = []

        # ---- packed path: group plain admissions by length bucket, pad the
        # group to a power-of-two row count (compile reuse), one dispatch —
        # or, with prefill_chunk set, ONE group through fixed-width chunks.
        groups: Dict[int, list] = {}
        for rec in plain:
            if self.prefill_chunk > 0:
                groups.setdefault(0, []).append(rec)
                continue
            bucket = min(_bucket(rec[2]), self.max_seqlen)
            groups.setdefault(bucket, []).append(rec)
        for bucket, recs in sorted(groups.items()):
            n = _bucket(len(recs), minimum=1)
            if self.prefill_chunk > 0:
                last, small = self._chunked_prefill(recs)
            else:
                ids = np.zeros((n, bucket), np.int32)
                lens = np.ones((n,), np.int32)   # pad rows: 1-token dummies
                ws = np.ones((n, self.cfg.num_senses), np.float32)
                for i, (slot, rid, plen, temp, w, sw, control, negative) \
                        in enumerate(recs):
                    ids[i, :plen] = self._prompts[rid]
                    lens[i] = plen
                    ws[i] = w
                last, small = self._batch_prefill_fn(bucket, n)(
                    self.params, jnp.asarray(ids), jnp.asarray(lens),
                    jnp.asarray(ws))
                self.prefill_dispatches += 1
            slots = np.zeros((n,), np.int32)
            slots[:len(recs)] = [r[0] for r in recs]
            slots[len(recs):] = slots[0]   # pad rows: overwritten by row 0
            self.cache = self._insert_rows_fn(n)(self.cache, small,
                                                 jnp.asarray(slots))
            if self.draft_cache is not None:
                self._admit_draft(recs, slots)
            for i, (slot, rid, plen, temp, w, sw, control, negative) \
                    in enumerate(recs):
                self._post_admit(slot, rid, plen, temp, w, sw, control,
                                 negative, last[i])
                admitted.append(rid)

        # ---- per-request path: control / negative admissions carry extra
        # per-request intervention state (annealing sums, quantile caches).
        for slot, rid, plen, temp, w, sw, control, negative in special:
            prompt = self._prompts[rid]
            bucket = min(_bucket(plen), self.max_seqlen)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :plen] = prompt
            if negative:
                if self.nstate is None:
                    self.nstate = self._iv.init_negative_decode_state(
                        self.cfg, self.max_slots, self.max_seqlen,
                        quantile=self.negative_quantile)
                last_logits, small, small_nstate = self._neg_prefill_fn(
                    bucket)(self.params, jnp.asarray(padded),
                            jnp.asarray(plen), self.negative_table)
                self.nstate = self._iv.insert_negative_state_slot(
                    self.nstate, small_nstate, slot)
                self._uses_negative = True
            else:
                table = (self.control_table
                         if self.control_table is not None
                         else jnp.ones((1, self.cfg.num_senses), jnp.float32))
                last_logits, small, small_state = self._prefill_fn(
                    bucket, controlled=control)(
                    self.params, jnp.asarray(padded), jnp.asarray(plen),
                    jnp.asarray(w[None]), table)
                if control:
                    self.istate = self._iv.insert_state_slot(
                        self.istate, small_state, slot)
                    self._uses_control = True
            self.prefill_dispatches += 1
            self.cache = bp.insert_cache_slot(self.cache, small, slot)
            self._post_admit(slot, rid, plen, temp, w, sw, control,
                             negative, last_logits)
            admitted.append(rid)
        return admitted

    def _finish(self, slot: int, trunc: int = 0) -> None:
        rid = self.sched.slot_request(slot)
        tokens = self.sched.slot_tokens(slot)
        if trunc:
            tokens = tokens[:-trunc]
        lps = None
        if self.logprob_mask[slot]:
            lps = self._slot_logprobs[slot]
            if trunc:
                lps = lps[:-trunc]
            self.logprob_mask[slot] = False
            self._slot_logprobs[slot] = []
        self._results[rid] = RequestResult(
            request_id=rid, tokens=tokens, finished=True, logprobs=lps)
        self.control_mask[slot] = False
        self.negative_mask[slot] = False
        self.top_ps[slot] = 1.0
        self.top_ks[slot] = 0
        self.freq_p[slot] = 0.0
        self.pres_p[slot] = 0.0
        self.stop_seqs[slot] = []
        self.sched.release(slot)

    def _stop_hit(self, slot: int) -> int:
        """Length of the stop sequence the emitted history now ends with
        (0 = none). Matches against host_tokens, which already contains the
        just-emitted token."""
        L = int(self.hist_len[slot])
        for seq in self.stop_seqs[slot]:
            n = seq.shape[0]
            if L >= n and np.array_equal(self.host_tokens[slot, L - n:L],
                                         seq):
                return n
        return 0

    # ------------------------------------------------------------ stepping

    def _plain_view(self, cache):
        """Cache without the staging fields: intervention step functions
        (control / negative / sense-weighted) read the raw cache buffers and
        are compiled against the unstaged structure."""
        g = cache.gpt._replace(k_stage=None, v_stage=None, ks_stage=None,
                               vs_stage=None, stage_pos=None, stage_ptr=None,
                               base_len=None)
        return cache._replace(gpt=g, ctx_k_stage=None, ctx_ks_stage=None,
                              content_stage=None, content_ss_stage=None)

    def _restage(self, stage_bufs):
        """Re-attach (empty) staging after a plain-view dispatch: the step
        wrote the MAIN cache, so the flushed horizon is the new length."""
        g = self.cache.gpt
        C = self._stage_cap
        self.cache = self.cache._replace(
            gpt=g._replace(
                k_stage=stage_bufs[0], v_stage=stage_bufs[1],
                ks_stage=stage_bufs[2], vs_stage=stage_bufs[3],
                stage_pos=jnp.full((self.max_slots, C), -1, jnp.int32),
                stage_ptr=jnp.zeros((), jnp.int32),
                # jnp.copy: astype-to-same-dtype returns the SAME array, and
                # an aliased length/base_len pair breaks donating dispatches
                base_len=jnp.copy(g.length).astype(jnp.int32)),
            ctx_k_stage=stage_bufs[4], ctx_ks_stage=stage_bufs[5],
            content_stage=stage_bufs[6], content_ss_stage=stage_bufs[7])

    def step(self) -> List[Tuple[int, int, bool]]:
        """Admit whatever fits, then run ONE decode step for all active slots.
        Returns [(request_id, token, finished)] for this step's emissions."""
        if self._t_first_step is None:
            self._t_first_step = self._clock()
        t0 = self._clock()
        admitted = self._admit_all()
        self._stats["admissions"] += len(admitted)
        if self.sched.num_active == 0:
            return []
        self._rng, sub = jax.random.split(self._rng)
        k = self.spec_tokens
        stage_bufs = None
        if self._stage_cap:
            plain_view = (self._uses_negative or self._uses_control
                          or self._uses_weights)
            if plain_view:
                if self._stage_used:
                    self.cache = self._flush_fn(self.cache)
                    self._stage_used = 0
                c = self.cache
                stage_bufs = (c.gpt.k_stage, c.gpt.v_stage, c.gpt.ks_stage,
                              c.gpt.vs_stage, c.ctx_k_stage, c.ctx_ks_stage,
                              c.content_stage, c.content_ss_stage)
                self.cache = self._plain_view(c)
            elif self._stage_used + k + 1 > self._stage_cap:
                self.cache = self._flush_fn(self.cache)
                self._stage_used = 0
        max_active_len = max(
            (int(self.host_lengths[sl]) for sl in range(self.max_slots)
             if self.sched.slot_active(sl)), default=0)
        # Speculative path: plain slots only, and never within k+1 rows of
        # the cache end (the verification writes k+1 rows per slot; a
        # clamped dynamic_update_slice would corrupt valid rows).
        active_pen = any(
            (self.freq_p[sl] or self.pres_p[sl])
            for sl in range(self.max_slots) if self.sched.slot_active(sl))
        if (k > 0 and not self.control_mask.any()
                and not self.negative_mask.any() and not active_pen
                and max_active_len + k + 1 <= self.max_seqlen
                and self._stats["decode_steps"] >= self._spec_skip_until):
            window = self._window(extra=k + 1)
            self._window_hist[window] += 1
            if self.draft_cache is not None:
                drafts, self.draft_cache = self._draft_k_fn(window)(
                    self.draft_params, self.tokens, self.draft_cache,
                    jnp.asarray(self.host_lengths.astype(np.int32)))
            else:
                drafts = self._build_drafts()
            step = self._spec_step_fn(window)
            emitted, n_emit, self.tokens, self.cache, lp_arr = step(
                self.params, self.tokens, jnp.asarray(drafts), self.cache,
                jnp.asarray(self.temps), jnp.asarray(self.top_ps),
                jnp.asarray(self.top_ks),
                jnp.asarray(self.emitted.astype(np.int32)),
                jnp.asarray(self.min_tokens.astype(np.int32)), sub,
                jnp.asarray(self.sense_weights))
            if stage_bufs is not None:
                self._restage(stage_bufs)
            elif self._stage_cap:
                self._stage_used += k + 1
            em = np.asarray(emitted)
            ne = np.asarray(n_emit)
            lps = np.asarray(lp_arr) if self._uses_logprobs else None
            out = []
            step_prop = step_acc = 0
            for slot in range(self.max_slots):
                if not self.sched.slot_active(slot):
                    continue
                take = int(ne[slot])
                self.host_lengths[slot] += take
                self._stats["draft_proposed"] += k
                self._stats["draft_accepted"] += take - 1
                step_prop += k
                step_acc += take - 1
                rid = self.sched.slot_request(slot)
                for t in range(take):
                    tok = int(em[slot, t])
                    self.host_tokens[slot, self.hist_len[slot]] = tok
                    self.hist_len[slot] += 1
                    self.emitted[slot] += 1
                    if self.logprob_mask[slot]:
                        self._slot_logprobs[slot].append(float(lps[slot, t]))
                    finished = self.sched.on_token(slot, tok)
                    hit = (0 if finished or not self.stop_seqs[slot]
                           else self._stop_hit(slot))
                    out.append((rid, tok, finished or hit > 0))
                    if finished or hit:
                        self._finish(slot, trunc=hit)
                        self._stats["completed"] += 1
                        break
            if self.spec_min_acceptance > 0.0 and step_prop:
                self._spec_recent.append((step_prop, step_acc))
                if len(self._spec_recent) >= 8:
                    prop = sum(p for p, _ in self._spec_recent)
                    acc = sum(a for _, a in self._spec_recent)
                    if acc < self.spec_min_acceptance * prop:
                        self._spec_skip_until = (
                            self._stats["decode_steps"] + self.spec_cooldown)
                        self._spec_recent.clear()
                        self._stats["spec_cooldowns"] += 1
            self._stats["decode_steps"] += 1
            self._stats["tokens_emitted"] += len(out)
            self._stats["step_time_ns"] += int((self._clock() - t0) * 1e9)
            return out
        window = self._window()
        self._window_hist[window] += 1
        if self._uses_negative:
            step = self._neg_step_fn(window)
            ctable = (self.control_table if self.control_table is not None
                      else jnp.ones((1, self.cfg.num_senses), jnp.float32))
            (self.tokens, self.cache, self.nstate, self.istate,
             self.token_counts, lp_arr) = step(
                self.params, self.tokens, self.cache, self.nstate,
                self.istate, jnp.asarray(self.temps),
                jnp.asarray(self.top_ps), jnp.asarray(self.top_ks),
                jnp.asarray(self.emitted < self.min_tokens),
                self.token_counts, jnp.asarray(self.freq_p),
                jnp.asarray(self.pres_p), sub,
                jnp.asarray(self.sense_weights),
                jnp.asarray(self.control_mask),
                jnp.asarray(self.negative_mask), ctable,
                self.negative_table)
        elif self._uses_control:
            step = self._ctl_step_fn(window)
            (self.tokens, self.cache, self.istate, self.token_counts,
             lp_arr) = step(
                self.params, self.tokens, self.cache, self.istate,
                jnp.asarray(self.temps), jnp.asarray(self.top_ps),
                jnp.asarray(self.top_ks),
                jnp.asarray(self.emitted < self.min_tokens),
                self.token_counts, jnp.asarray(self.freq_p),
                jnp.asarray(self.pres_p), sub,
                jnp.asarray(self.sense_weights),
                jnp.asarray(self.control_mask), self.control_table)
        else:
            step = self._step_fn(self._uses_weights, window)
            self.tokens, self.cache, self.token_counts, lp_arr = step(
                self.params, self.tokens, self.cache,
                jnp.asarray(self.temps), jnp.asarray(self.top_ps),
                jnp.asarray(self.top_ks),
                jnp.asarray(self.emitted < self.min_tokens),
                self.token_counts, jnp.asarray(self.freq_p),
                jnp.asarray(self.pres_p), sub,
                jnp.asarray(self.sense_weights))
        if stage_bufs is not None:
            self._restage(stage_bufs)
        elif self._stage_cap:
            self._stage_used += 1
        toks = np.asarray(self.tokens[:, 0])
        lps = np.asarray(lp_arr) if self._uses_logprobs else None
        out = []
        for slot in range(self.max_slots):
            if not self.sched.slot_active(slot):
                continue
            self.host_lengths[slot] += 1
            self.host_tokens[slot, self.hist_len[slot]] = int(toks[slot])
            self.hist_len[slot] += 1
            self.emitted[slot] += 1
            if self.logprob_mask[slot]:
                self._slot_logprobs[slot].append(float(lps[slot]))
            rid = self.sched.slot_request(slot)
            finished = self.sched.on_token(slot, int(toks[slot]))
            if not finished and self.stop_seqs[slot]:
                hit = self._stop_hit(slot)
                if hit:
                    out.append((rid, int(toks[slot]), True))
                    self._finish(slot, trunc=hit)
                    self._stats["completed"] += 1
                    continue
            out.append((rid, int(toks[slot]), finished))
            if finished:
                self._finish(slot)
                self._stats["completed"] += 1
        self._stats["decode_steps"] += 1
        self._stats["tokens_emitted"] += len(out)
        self._stats["step_time_ns"] += int((self._clock() - t0) * 1e9)
        return out

    def run(self) -> Dict[int, RequestResult]:
        """Drive until every submitted request completes."""
        while (self.sched.num_pending or self.sched.num_active):
            self.step()
        out, self._results = self._results, {}
        return out

    def generate(self, prompts, **kw) -> List[List[int]]:
        """Convenience: submit every prompt with the same options, run to
        completion, return token lists in prompt order."""
        rids = [self.submit(p, **kw) for p in prompts]
        results = self.run()
        return [results[r].tokens for r in rids]

    # --------------------------------------------------------- observability

    def stats(self) -> Dict[str, object]:
        """Host-side serving metrics since engine start: counters, window
        histogram, and derived rates (a vLLM-style /metrics surface; the
        reference has no serving runtime to compare)."""
        s = dict(self._stats)
        s["prefill_dispatches"] = self.prefill_dispatches
        s["active_slots"] = self.sched.num_active
        s["pending_requests"] = self.sched.num_pending
        s["window_histogram"] = dict(sorted(self._window_hist.items()))
        wall = (self._clock() - self._t_first_step
                if self._t_first_step is not None else 0.0)
        s["wall_s"] = wall
        s["tokens_per_s"] = (self._stats["tokens_emitted"] / wall
                             if wall > 0 else 0.0)
        steps = self._stats["decode_steps"]
        s["mean_step_ms"] = (self._stats["step_time_ns"] / steps / 1e6
                             if steps else 0.0)
        s["mean_batch"] = (self._stats["tokens_emitted"] / steps
                           if steps else 0.0)
        if self._stats["draft_proposed"]:
            s["draft_acceptance"] = (self._stats["draft_accepted"]
                                     / self._stats["draft_proposed"])
        if self.spec_tokens > 0:
            s["draft_source"] = ("model" if self.draft_cache is not None
                                 else "ngram")
        return s
