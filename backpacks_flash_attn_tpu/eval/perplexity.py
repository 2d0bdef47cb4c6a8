"""Perplexity evaluation — the Backpack metric of record.

Reference: training/src/metrics/perplexity.py:52-70 (ppl = exp of the
token-count-weighted mean NLL, accumulated in float64),
training/src/metrics/num_tokens.py:24-37 (token counter persisting across
epochs). The reference reuses the training loss object to avoid recomputing
(seq.py:185-191); here the jitted batch loss returns (sum_nll, count) pairs
that are accumulated on host in float64.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cross_entropy import cross_entropy


def batch_nll(logits: jax.Array, targets: jax.Array,
              ignore_index: int = -100) -> Tuple[jax.Array, jax.Array]:
    """(sum of per-token NLL, number of counted tokens) for one batch."""
    loss, _ = cross_entropy(logits, targets, ignore_index=ignore_index)
    count = jnp.sum((targets != ignore_index).astype(jnp.int32))
    return jnp.sum(loss), count


class PerplexityAccumulator:
    """Streaming ppl/NLL in float64 (reference perplexity.py:52-70)."""

    def __init__(self) -> None:
        self.total_nll = np.float64(0.0)
        self.total_tokens = np.int64(0)

    def update(self, sum_nll, count) -> None:
        self.total_nll += np.float64(sum_nll)
        self.total_tokens += np.int64(count)

    @property
    def nll(self) -> float:
        return float(self.total_nll / max(int(self.total_tokens), 1))

    @property
    def ppl(self) -> float:
        return float(np.exp(self.nll))


def evaluate_perplexity(forward_fn: Callable[..., jax.Array],
                        tokens: np.ndarray, seqlen: int, batch_size: int,
                        *, max_batches: Optional[int] = None,
                        params=None) -> Dict[str, float]:
    """OWT-val style ppl over a flat token array: chunk into non-overlapping
    seqlen windows (lm_dataset semantics), run the forward, accumulate NLL
    in fp64.

    Pass `params` and a forward_fn(params, input_ids) -> logits so the
    params ride as a jit ARGUMENT — a params-capturing closure inlines the
    whole model into the HLO (the tunneled remote compiler rejects it with
    HTTP 413). forward_fn(input_ids) closures still work when params is
    None (CPU-sized models only)."""
    from ..data.lm_dataset import LMDataset

    ds = LMDataset(tokens, seqlen)

    if params is None:
        @jax.jit
        def step(x, y):
            return batch_nll(forward_fn(x), y)
    else:
        @jax.jit
        def pstep(p, x, y):
            return batch_nll(forward_fn(p, x), y)

        def step(x, y):
            return pstep(params, x, y)

    acc = PerplexityAccumulator()
    n_batches = len(ds) // batch_size
    if max_batches is not None:
        n_batches = min(n_batches, max_batches)
    for b in range(n_batches):
        x, y = ds.batch(np.arange(b * batch_size, (b + 1) * batch_size))
        s, c = step(jnp.asarray(x), jnp.asarray(y))
        acc.update(np.asarray(s), np.asarray(c))
    return {"ppl": acc.ppl, "nll": acc.nll,
            "num_tokens": int(acc.total_tokens)}
