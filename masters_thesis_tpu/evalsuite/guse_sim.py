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
        self._cache: dict[str, np.ndarray] = {}

    def _word_vec(self, word: str) -> np.ndarray:
        # cached: Generator construction is ~ms-scale and corpus words
        # repeat heavily (10k keys x 5 captions share a small vocabulary)
        v = self._cache.get(word)
        if v is None:
            h = hashlib.sha1(word.encode()).digest()
            rng = np.random.Generator(
                np.random.PCG64(int.from_bytes(h[:8], "little"))
            )
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._cache[word] = v
        return v

    def embed(self, sentences: list[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), np.float32)
        for i, s in enumerate(sentences):
            words = s.split()
            if not words:
                continue
            out[i] = np.mean([self._word_vec(w) for w in words], axis=0)
        return out


def labelled_guse_scores(candidates, references_list,
                         weights_path: str | None = None) -> dict:
    """GUSE consistency scores with the honest-labeling rule applied in ONE
    place: ``GUSE_*`` keys only when the real USE-DAN encoder produced them,
    ``GUSE_hash_*`` for the bag-of-words fallback (so a word-overlap proxy
    can never be mistaken for the reference metric, get_guse.py:49-63)."""
    guse = guse_similarity(candidates, references_list,
                           embedder=default_embedder(weights_path))
    prefix = "GUSE" if guse["embedder"] == "use_dan" else "GUSE_hash"
    return {
        f"{prefix}_pearson_r": guse["pearson_r"],
        f"{prefix}_mean_corr": guse["mean_brain_corr"],
    }


def guse_clean(line: str) -> str:
    """The reference's caption cleanup before embedding (get_guse.py:39-42):
    '.'/',' -> space, lowercase, collapse whitespace. No <start>/<end> —
    GUSE embeds the plain sentence."""
    cap = line.replace(".", " ").replace(",", " ").strip().split(" ")
    return " ".join(w.lower() for w in cap if w)


def embed_caption_table(
    captions_by_key: dict[int, list[str]],
    keys=None,
    embedder: SentenceEmbedder | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(keys, (N, C, D) embedding brick) for the per-key caption lists —
    the reference's GUSE precompute (get_guse.py:131-140: every caption gets
    a (512,) embedding, 5 captions per NSD key -> (N, 5, 512)).

    Keys default to all of ``captions_by_key`` in sorted order. Every key
    must carry the same caption count (the reference asserts 5,
    get_guse.py:44)."""
    embedder = embedder or default_embedder()
    if keys is None:
        keys = sorted(captions_by_key)
    keys = np.asarray(list(keys), np.int64)
    counts = {len(captions_by_key[int(k)]) for k in keys}
    if len(counts) > 1:
        raise ValueError(f"ragged caption counts per key: {sorted(counts)}")
    n_caps = counts.pop() if counts else 0
    flat: list[str] = []
    for k in keys:
        flat.extend(guse_clean(c) for c in captions_by_key[int(k)])
    if not flat:
        return keys, np.zeros((0, 0, embedder.dim), np.float32)
    emb = embedder.embed(flat)
    return keys, emb.reshape(len(keys), n_caps, -1).astype(np.float32)


def nearest_training_captions(
    candidates: list[str],
    train_embeddings: np.ndarray,
    train_captions=None,
    top_k: int = 3,
    embedder: SentenceEmbedder | None = None,
) -> list[dict]:
    """The reference's guse_comparison.py: embed each candidate caption and
    rank every (trial, cid) training caption by cosine distance; report the
    ``top_k`` nearest plus the single farthest (guse_comparison.py:44-64
    prints top-3 and max).

    ``train_embeddings`` is the (N, C, D) brick from
    :func:`embed_caption_table`; ``train_captions`` (optional) is a list of
    N lists of C strings aligned with it. One batched matmul — the reference
    loops scipy ``cosine_distance`` over all 45,000 rows per candidate."""
    embedder = embedder or default_embedder()
    n, c, d = train_embeddings.shape
    # float32 throughout: cosine ranking needs ~1e-6, not f64 (f64 made the
    # normalize+matmul 4-6x slower at the real (10k, 5, 512) table size)
    flat = np.ascontiguousarray(train_embeddings.reshape(n * c, d), np.float32)
    norm = np.sqrt(np.einsum("ij,ij->i", flat, flat))[:, None]
    flat = flat / np.where(norm == 0, 1.0, norm)
    cand = np.asarray(
        embedder.embed([guse_clean(s) for s in candidates]), np.float32)
    cnorm = np.sqrt(np.einsum("ij,ij->i", cand, cand))[:, None]
    cand = cand / np.where(cnorm == 0, 1.0, cnorm)
    dist = 1.0 - cand @ flat.T                               # (K, N*C)
    top_k = min(top_k, n * c)
    results = []
    for row in dist:
        # argpartition (O(n)) instead of a full sort. Ties at the kth
        # distance can straddle the partition boundary with an arbitrary
        # subset selected (duplicate COCO captions embed identically), so
        # widen to every row at <= the selected max before the
        # (distance, index) sort — index tie-breaks then match the old
        # stable argsort exactly.
        if top_k:
            part = np.argpartition(row, top_k - 1)[:top_k]
            thr = row[part].max()
            tied = np.nonzero(row <= thr)[0]
            order = sorted(tied, key=lambda i: (row[i], i))[:top_k]
        else:
            order = []

        def entry(idx: int) -> dict:
            trial, cid = divmod(int(idx), c)
            e = {"trial": trial, "cid": cid, "distance": float(row[idx])}
            if train_captions is not None:
                e["caption"] = train_captions[trial][cid]
            return e

        far = int(np.argmax(row)) if len(row) else None
        results.append({
            "nearest": [entry(int(i)) for i in order],
            "farthest": entry(far) if far is not None else None,
        })
    return results


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
    if len(candidates) != len(references_list):
        # extra references IndexError'd mid-metric; extra candidates
        # silently diluted the correlation with untouched zero rows
        raise ValueError(
            f"candidates ({len(candidates)}) and references_list "
            f"({len(references_list)}) must align one-to-one"
        )
    embedder = embedder or default_embedder()
    consistency = np.zeros(len(candidates))
    brain_corr = np.zeros(len(candidates))
    # embed everything in TWO calls, not two per trial: the USE encoder is
    # a jitted device call, and 2T dispatches over the eval set dominate
    # the metric's wall time on a tunneled TPU
    cand_emb_all = (embedder.embed(list(candidates))
                    if candidates else np.zeros((0, embedder.dim)))
    flat_refs: list[str] = []
    slices = []
    for refs in references_list:
        slices.append((len(flat_refs), len(flat_refs) + len(refs)))
        flat_refs.extend(refs)
    ref_emb_all = (embedder.embed(flat_refs)
                   if flat_refs else np.zeros((0, embedder.dim)))
    for t, (lo, hi) in enumerate(slices):
        ref_emb = ref_emb_all[lo:hi]                        # (R, D)
        cand_emb = cand_emb_all[t:t + 1]                    # (1, D)
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
