"""GUSE semantic-similarity evaluation.

Reproduces the reference's analysis (AttemptFour/guse_sim.py:99-131):
for each trial,
  consistency  = mean of the Pearson-correlation matrix of the 5 reference
                 caption embeddings (diagonal included),
  brain_corr   = mean Pearson correlation between the candidate caption's
                 embedding and the 5 reference embeddings,
and the headline number is the Pearson r between the two vectors over trials
(plus the linear fit the reference plots).

The embedder is pluggable: the reference uses TF-Hub Universal Sentence
Encoder v4 (get_guse.py:49-63). The native USE-DAN graph
(models/use_encoder.py) runs the real metric when a converted weight bundle
is available (``MTT_GUSE_WEIGHTS`` env var or ``use_dan.npz`` in the config's
guse dir); otherwise the deterministic ``HashEmbedder`` keeps the pipeline
runnable end-to-end — and its scores are labelled ``GUSE_hash_*`` so a
bag-of-words proxy is never mistaken for the reference metric.
"""

from __future__ import annotations

import hashlib
import os
from typing import Protocol

import numpy as np


class SentenceEmbedder(Protocol):
    dim: int

    def embed(self, sentences: list[str]) -> np.ndarray: ...


def default_embedder(weights_path: str | None = None) -> SentenceEmbedder:
    """USE-DAN from a weight bundle when one is available, else the hash
    fallback. Resolution order: explicit path arg -> MTT_GUSE_WEIGHTS env."""
    path = weights_path or os.environ.get("MTT_GUSE_WEIGHTS", "")
    if path and os.path.exists(path):
        from masters_thesis_tpu.models.use_encoder import USEEncoder

        return USEEncoder.from_npz(path)
    return HashEmbedder()


class HashEmbedder:
    """Deterministic feature-hashing bag-of-words sentence embedder.

    NOT a semantic encoder — measures word overlap only. Anything scored
    with it must surface as ``GUSE_hash_*``, never ``GUSE_*``."""

    name = "hash"

    def __init__(self, dim: int = 512):
        self.dim = dim

    def _word_vec(self, word: str) -> np.ndarray:
        h = hashlib.sha1(word.encode()).digest()
        rng = np.random.Generator(
            np.random.PCG64(int.from_bytes(h[:8], "little"))
        )
        return rng.standard_normal(self.dim).astype(np.float32)

    def embed(self, sentences: list[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), np.float32)
        for i, s in enumerate(sentences):
            words = s.split()
            if not words:
                continue
            out[i] = np.mean([self._word_vec(w) for w in words], axis=0)
        return out


def _rowwise_pearson(x: np.ndarray) -> np.ndarray:
    """np.corrcoef for rows, safe for zero-variance rows."""
    x = x - x.mean(axis=1, keepdims=True)
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    norm = np.where(norm == 0, 1.0, norm)
    xn = x / norm
    return xn @ xn.T


def guse_similarity(
    candidates: list[str],
    references_list: list[list[str]],
    embedder: SentenceEmbedder | None = None,
) -> dict:
    """Returns consistency/brain-corr vectors and their Pearson r, plus the
    name of the embedder that produced them (``embedder`` key)."""
    embedder = embedder or default_embedder()
    consistency = np.zeros(len(candidates))
    brain_corr = np.zeros(len(candidates))
    for t, (cand, refs) in enumerate(zip(candidates, references_list)):
        ref_emb = embedder.embed(refs)                      # (R, D)
        cand_emb = embedder.embed([cand])                   # (1, D)
        corr = _rowwise_pearson(ref_emb)
        consistency[t] = corr.mean()
        both = np.concatenate([ref_emb, cand_emb], axis=0)
        c = _rowwise_pearson(both)
        brain_corr[t] = c[-1, :-1].mean()

    # Pearson r between the two vectors (stats.pearsonr in the reference)
    if len(candidates) > 1 and consistency.std() > 0 and brain_corr.std() > 0:
        r = float(np.corrcoef(consistency, brain_corr)[0, 1])
        m, b = np.polyfit(consistency, brain_corr, 1)
    else:
        r, m, b = 0.0, 0.0, 0.0
    return {
        "consistency": consistency,
        "brain_corr": brain_corr,
        "pearson_r": r,
        "fit_slope": float(m),
        "fit_intercept": float(b),
        "mean_brain_corr": float(brain_corr.mean()) if len(candidates) else 0.0,
        "embedder": getattr(embedder, "name", type(embedder).__name__),
    }
