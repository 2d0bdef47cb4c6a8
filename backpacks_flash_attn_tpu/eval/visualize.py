"""Sense-vector introspection data: PCA projections and similarity matrices.

Reference: training/src/make_pca.py (PCA scatter of sense vectors across
words), training/src/visualize_sim.py (per-sense cosine-similarity heatmaps),
training/src/localize_pred.py (per-sense contribution to a prediction).
The reference couples computation to matplotlib/LaTeX output; here the
functions return arrays and the (optional) plotting stays caller-side.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import interventions as iv


def sense_matrix(params, cfg: BackpackConfig,
                 word_ids: Sequence[int]) -> np.ndarray:
    """(n_words, nv, d) sense vectors for a word list (one batched content
    pass — reference loops words, make_pca.py)."""
    ids = jnp.asarray(list(word_ids), jnp.int32)[None]
    return np.asarray(bp.content_forward(params, cfg, ids)[0], np.float32)


def sense_pca(params, cfg: BackpackConfig, word_ids: Sequence[int],
              n_components: int = 2,
              sense: Optional[int] = None) -> Dict[str, np.ndarray]:
    """PCA of sense vectors (reference make_pca.py). With `sense` set, fit on
    that sense's vectors across words; otherwise on all (word, sense) pairs.
    Returns {'projected': (n, n_components), 'components', 'explained'} —
    plain SVD, no sklearn dependency."""
    senses = sense_matrix(params, cfg, word_ids)       # (w, nv, d)
    X = (senses[:, sense] if sense is not None
         else senses.reshape(-1, senses.shape[-1]))
    mu = X.mean(0, keepdims=True)
    Xc = X - mu
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    proj = Xc @ Vt[:n_components].T
    var = (S ** 2) / max(len(X) - 1, 1)
    return {"projected": proj, "components": Vt[:n_components],
            "explained": var[:n_components] / var.sum(), "mean": mu[0]}


def sense_similarity_matrix(params, cfg: BackpackConfig,
                            word_ids: Sequence[int],
                            sense: int) -> np.ndarray:
    """(n_words, n_words) cosine similarity of one sense across words
    (reference visualize_sim.py heatmaps)."""
    v = sense_matrix(params, cfg, word_ids)[:, sense]  # (w, d)
    n = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-10)
    return n @ n.T


def cross_sense_similarity(params, cfg: BackpackConfig,
                           word_id: int) -> np.ndarray:
    """(nv, nv) cosine similarity between the senses of one word."""
    v = np.asarray(iv.senses_of_word(params, cfg, word_id), np.float32)
    n = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-10)
    return n @ n.T


def localize_prediction(params, cfg: BackpackConfig, input_ids,
                        target_id: int, *,
                        use_flash: bool = True) -> np.ndarray:
    """Per-(sense, position) contribution to the final-position logit of
    `target_id`: contrib[k, j] = alpha[k, -1, j] * (C(x_j)[k] . E[target])
    (reference localize_pred.py — which sense/word pair produced a
    prediction). Returns (nv, s); summing it recovers the logit up to the
    bias-free tied head."""
    ids = jnp.asarray(input_ids, jnp.int32)
    if ids.ndim == 1:
        ids = ids[None]
    _, parts = bp.backpack_forward(params, cfg, ids, use_flash=use_flash,
                                   return_parts=True)
    alpha = np.asarray(parts["alpha"][0], np.float32)      # (nv, s, s)
    content = np.asarray(parts["content"][0], np.float32)  # (s, nv, d)
    E = np.asarray(iv.embedding_matrix(params["gpt"]), np.float32)
    tgt = E[target_id]                                     # (d,)
    per_token = content @ tgt                              # (s, nv)
    return alpha[:, -1, :] * per_token.T                   # (nv, s)
