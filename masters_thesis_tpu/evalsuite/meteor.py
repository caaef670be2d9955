"""METEOR (Banerjee & Lavie 2005) with exact + Porter-stem match stages.

The reference scores captions with pycocoevalcap's METEOR jar
(AttemptFour/metric_suit.py:88-109), which aligns unigrams in stages:
exact, stem, WordNet synonym, paraphrase. This implementation provides the
exact and stem stages natively (the Porter stemmer in ``stem.py``); the
synonym/paraphrase stages need WordNet data unavailable in a zero-egress
image, so scores are a close lower bound of jar METEOR:

  P = m/|hyp|, R = m/|ref|, F = 10PR/(R+9P)
  penalty = 0.5 * (chunks/m)^3
  score = F * (1 - penalty), max over references
"""

from __future__ import annotations

from masters_thesis_tpu.evalsuite.stem import porter_stem


def _align_stage(ref_keys, hyp_keys, ref_used, hyp_used):
    """Greedy in-order alignment on one match stage; mutates used sets and
    returns (hyp_idx, ref_idx) pairs for words unmatched so far."""
    ref_positions: dict = {}
    for i, w in enumerate(ref_keys):
        if i not in ref_used:
            ref_positions.setdefault(w, []).append(i)
    pairs = []
    for j, w in enumerate(hyp_keys):
        if j in hyp_used:
            continue
        for i in ref_positions.get(w, []):
            if i not in ref_used:
                ref_used.add(i)
                hyp_used.add(j)
                pairs.append((j, i))
                break
    return pairs


def _align(ref, hyp, stemmer=porter_stem):
    """Two-stage (exact, then stem) alignment; returns (matches, chunks)."""
    ref_used: set = set()
    hyp_used: set = set()
    pairs = _align_stage(ref, hyp, ref_used, hyp_used)
    if stemmer is not None:
        ref_stems = [stemmer(w) for w in ref]
        hyp_stems = [stemmer(w) for w in hyp]
        pairs += _align_stage(ref_stems, hyp_stems, ref_used, hyp_used)
    if not pairs:
        return 0, 0
    pairs.sort()
    chunks = 1
    for (j0, i0), (j1, i1) in zip(pairs, pairs[1:]):
        if not (j1 == j0 + 1 and i1 == i0 + 1):
            chunks += 1
    return len(pairs), chunks


def meteor_lite(references, hypothesis, use_stem: bool = True) -> float:
    hyp = list(hypothesis)
    if not hyp:
        return 0.0
    best = 0.0
    for ref in references:
        ref = list(ref)
        m, chunks = _align(ref, hyp, porter_stem if use_stem else None)
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        f = 10 * p * r / (r + 9 * p)
        penalty = 0.5 * (chunks / m) ** 3
        best = max(best, f * (1 - penalty))
    return best


def corpus_meteor(references_list, hypotheses, use_stem: bool = True) -> float:
    if not hypotheses:
        return 0.0
    return sum(
        meteor_lite(refs, hyp, use_stem)
        for refs, hyp in zip(references_list, hypotheses)
    ) / len(hypotheses)
