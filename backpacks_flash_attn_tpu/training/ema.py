"""Exponential moving average of parameters.

Reference: training/src/utils/ema.py:19 (ExponentialMovingAverage) +
training/src/callbacks/ema.py:16-76 (EMACallback: swap EMA weights in for
val/test, persist shadow params + counters in the checkpoint). Here EMA is a
pure pytree fold — jit-compatible, no module registry or in-place swaps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: Any          # pytree like params
    num_updates: jax.Array  # int32


def init_ema(params) -> EMAState:
    # copy=True: the shadow must NOT alias the live params — the train step
    # donates its input state, which would delete aliased buffers.
    return EMAState(shadow=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                        params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float,
               use_num_updates: bool = True) -> EMAState:
    """shadow <- d * shadow + (1-d) * params, with the torch-style warmup
    d = min(decay, (1 + n) / (10 + n)) (reference utils/ema.py:35-47)."""
    n = state.num_updates + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay)
    shadow = jax.tree.map(
        lambda s, p: (s * d + p.astype(s.dtype) * (1.0 - d)
                      if jnp.issubdtype(s.dtype, jnp.floating) else p),
        state.shadow, params)
    return EMAState(shadow=shadow, num_updates=n)


def swap_for_eval(state: EMAState, params):
    """Return (eval_params, stashed_train_params) — the functional version of
    the reference's store/copy_to swap (callbacks/ema.py:33-50)."""
    return state.shadow, params
