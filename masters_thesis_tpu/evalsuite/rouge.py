"""ROUGE-L (LCS F-measure, beta=1.2), pycocoevalcap semantics:
per candidate take the max precision and max recall over references, then
F = ((1+b^2)PR)/(R+b^2P). (Used by the reference's metric_suit.py via
pycocoevalcap; reimplemented from the Lin 2004 definition.)"""

from __future__ import annotations


def _lcs_len(a, b) -> int:
    if not a or not b:
        return 0
    # O(len(a)*len(b)) DP with two rows
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l(references, hypothesis, beta: float = 1.2) -> float:
    hyp = list(hypothesis)
    prec, rec = [], []
    for ref in references:
        ref = list(ref)
        lcs = _lcs_len(ref, hyp)
        prec.append(lcs / len(hyp) if hyp else 0.0)
        rec.append(lcs / len(ref) if ref else 0.0)
    p, r = max(prec, default=0.0), max(rec, default=0.0)
    if p == 0 or r == 0:
        return 0.0
    return ((1 + beta**2) * p * r) / (r + beta**2 * p)


def corpus_rouge_l(references_list, hypotheses, beta: float = 1.2) -> float:
    if not hypotheses:
        return 0.0
    score = _corpus_rouge_l_native(references_list, hypotheses, beta)
    if score is not None:
        return score
    return sum(
        rouge_l(refs, hyp, beta) for refs, hyp in zip(references_list, hypotheses)
    ) / len(hypotheses)


def _corpus_rouge_l_native(references_list, hypotheses, beta: float):
    """All (hyp, ref) LCS lengths in one C++ call (native/textmetrics.cpp
    tm_lcs_batch): words map to ids >= 1 (0 is the kernel's pad), the pair
    list is padded to rectangles, then max-precision/max-recall per
    hypothesis exactly like rouge_l. None when the native lib is absent."""
    import numpy as np

    from masters_thesis_tpu.native.bleu_native import lcs_batch_native

    ids: dict[str, int] = {}

    def to_ids(words):
        return [ids.setdefault(w, len(ids) + 1) for w in words]

    pairs_h, pairs_r, owner = [], [], []
    for i, (refs, hyp) in enumerate(zip(references_list, hypotheses)):
        h = to_ids(list(hyp))
        for ref in refs:
            pairs_h.append(h)
            pairs_r.append(to_ids(list(ref)))
            owner.append(i)
    if not pairs_h:
        return 0.0
    la = max(1, max(len(p) for p in pairs_h))
    lb = max(1, max(len(p) for p in pairs_r))
    a = np.zeros((len(pairs_h), la), np.int32)
    b = np.zeros((len(pairs_r), lb), np.int32)
    for r, p in enumerate(pairs_h):
        a[r, : len(p)] = p
    for r, p in enumerate(pairs_r):
        b[r, : len(p)] = p
    lcs = lcs_batch_native(a, b, end_id=-1)
    if lcs is None:
        return None
    total = 0.0
    n = len(hypotheses)
    prec = [[] for _ in range(n)]
    rec = [[] for _ in range(n)]
    for k, i in enumerate(owner):
        lh, lr = len(pairs_h[k]), len(pairs_r[k])
        prec[i].append(lcs[k] / lh if lh else 0.0)
        rec[i].append(lcs[k] / lr if lr else 0.0)
    for i in range(n):
        p, r = max(prec[i], default=0.0), max(rec[i], default=0.0)
        total += 0.0 if (p == 0 or r == 0) else (
            (1 + beta ** 2) * p * r / (r + beta ** 2 * p))
    return total / n
