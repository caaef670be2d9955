"""METEOR-lite: exact-match METEOR (Banerjee & Lavie 2005) without the
WordNet-synonym and paraphrase stages (those require the Java jar the
reference pulls in via pycocoevalcap; metric_suit.py). Exact-match unigram
alignment with the standard chunk fragmentation penalty:

  P = m/|hyp|, R = m/|ref|, F = 10PR/(R+9P)
  penalty = 0.5 * (chunks/m)^3
  score = F * (1 - penalty), max over references
"""

from __future__ import annotations

from collections import Counter


def _align(ref, hyp):
    """Greedy in-order exact alignment; returns (matches, chunks)."""
    ref_avail = Counter(ref)
    # positions of each hyp word in ref, consumed left-to-right
    ref_positions = {}
    for i, w in enumerate(ref):
        ref_positions.setdefault(w, []).append(i)
    used = set()
    pairs = []
    for j, w in enumerate(hyp):
        for i in ref_positions.get(w, []):
            if i not in used:
                used.add(i)
                pairs.append((j, i))
                break
    if not pairs:
        return 0, 0
    chunks = 1
    for (j0, i0), (j1, i1) in zip(pairs, pairs[1:]):
        if not (j1 == j0 + 1 and i1 == i0 + 1):
            chunks += 1
    return len(pairs), chunks


def meteor_lite(references, hypothesis) -> float:
    hyp = list(hypothesis)
    if not hyp:
        return 0.0
    best = 0.0
    for ref in references:
        ref = list(ref)
        m, chunks = _align(ref, hyp)
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        f = 10 * p * r / (r + 9 * p)
        penalty = 0.5 * (chunks / m) ** 3
        best = max(best, f * (1 - penalty))
    return best


def corpus_meteor(references_list, hypotheses) -> float:
    if not hypotheses:
        return 0.0
    return sum(
        meteor_lite(refs, hyp) for refs, hyp in zip(references_list, hypotheses)
    ) / len(hypotheses)
