"""Post-hoc analysis suite — the reference's ``AttemptFour/Eval/`` thesis
analyses, headless and data-driven (SURVEY.md §2.1):

- caption_table: BLEU-sorted caption/reference table (+ per-caption
  perplexity), cf. Eval/sample_captions.py (BLEU sort :1-100, perplexity
  :283-386);
- perplexity: 2^(-mean log2 p(token)) over emitted tokens from decoder
  logits;
- hit_rate: cross-subject caption "hits" — how often two subjects' decoded
  captions for the same NSD key share n-grams (Eval/hit_rate.py);
- attention_by_region: mean attention weight per Glasser region across the
  eval set + top-k region ranking (Eval/compare_attention.py /
  list_regions.py — flatmap rendering needs pycortex, so this exports the
  per-region values those plots consume);
- loss_curves: parse loss_history.csv into arrays and optionally render a
  PNG (Eval/plot_loss.py).
"""

from __future__ import annotations

import csv

import numpy as np

from masters_thesis_tpu.evalsuite.bleu import sentence_bleu


def perplexity(logits: np.ndarray, token_ids: np.ndarray,
               pad_id: int = 0) -> np.ndarray:
    """Per-caption perplexity from decode logits (B, T, V) over the emitted
    ids (B, T), ignoring <pad>."""
    logits = np.asarray(logits, np.float64)
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    tok_logp = np.take_along_axis(logp, token_ids[..., None], axis=-1)[..., 0]
    mask = token_ids != pad_id
    n = np.maximum(mask.sum(-1), 1)
    mean_lp = (tok_logp * mask).sum(-1) / n
    return np.exp(-mean_lp)


def caption_table(
    candidates: list[str],
    references_list: list[list[str]],
    keys=None,
    logits: np.ndarray | None = None,
    token_ids: np.ndarray | None = None,
) -> list[dict]:
    """Rows sorted by BLEU-1 desc (sample_captions.py ordering)."""
    rows = []
    ppl = (
        perplexity(logits, token_ids)
        if logits is not None and token_ids is not None
        else [None] * len(candidates)
    )
    for i, (cand, refs) in enumerate(zip(candidates, references_list)):
        b1 = sentence_bleu(
            [r.split() for r in refs], cand.split(), weights=(1, 0, 0, 0),
            smoothing="method1",
        )
        rows.append(
            {
                "key": None if keys is None else int(keys[i]),
                "caption": cand,
                "bleu1": b1,
                "perplexity": None if ppl[i] is None else float(ppl[i]),
                "references": refs,
            }
        )
    rows.sort(key=lambda r: r["bleu1"], reverse=True)
    return rows


def hit_rate(
    captions_a: dict[int, str], captions_b: dict[int, str], n: int = 1
) -> dict:
    """Cross-subject n-gram hit rate on shared keys (Eval/hit_rate.py):
    fraction of shared keys whose two decoded captions share >=1 n-gram,
    plus the mean Jaccard overlap."""
    shared = sorted(set(captions_a) & set(captions_b))
    hits, jaccards = 0, []
    for k in shared:
        a = captions_a[k].split()
        b = captions_b[k].split()
        nga = {tuple(a[i : i + n]) for i in range(len(a) - n + 1)}
        ngb = {tuple(b[i : i + n]) for i in range(len(b) - n + 1)}
        inter = nga & ngb
        union = nga | ngb
        if inter:
            hits += 1
        jaccards.append(len(inter) / len(union) if union else 0.0)
    return {
        "n_shared": len(shared),
        "hit_rate": hits / len(shared) if shared else 0.0,
        "mean_jaccard": float(np.mean(jaccards)) if jaccards else 0.0,
    }


def attention_by_region(
    attention: np.ndarray, region_names: list[str] | None = None,
    top_k: int = 20,
) -> dict:
    """attention: (B, T, R) decode attention scores. Returns per-region mean
    (averaged over batch and time) and the top-k ranking
    (compare_attention.py / list_regions.py export)."""
    mean_r = np.asarray(attention).mean(axis=(0, 1))       # (R,)
    order = np.argsort(mean_r)[::-1]
    names = region_names or [f"region_{i}" for i in range(len(mean_r))]
    return {
        "mean": mean_r,
        "ranking": [
            {"region": names[i], "index": int(i), "mean_attention": float(mean_r[i])}
            for i in order[:top_k]
        ],
    }


def loss_curves(loss_history_csv: str) -> dict[str, np.ndarray]:
    """Parse loss_history.csv (train/callbacks.LossHistory schema)."""
    with open(loss_history_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    out: dict[str, list[float]] = {}
    for row in rows:
        for k, v in row.items():
            if v not in ("", None):
                out.setdefault(k, []).append(float(v))
    return {k: np.asarray(v) for k, v in out.items()}


def plot_loss(loss_history_csv: str, out_png: str) -> None:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = loss_curves(loss_history_csv)
    fig, ax = plt.subplots(figsize=(8, 5))
    for k in ("loss", "val_loss"):
        if k in curves:
            ax.plot(curves["epoch"], curves[k], label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
