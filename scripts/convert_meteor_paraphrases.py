"""Offline converter: METEOR paraphrase-en.gz -> phrase-table JSON.

The meteor-1.5 jar's 4th matcher stage looks phrase pairs up in
paraphrase-en.gz (one pair per line). This zero-egress image doesn't ship
that file; run this wherever it exists to produce the JSON consumed by
``masters_thesis_tpu.evalsuite.meteor.ParaphraseTable`` — a mapping
``phrase -> [paraphrase phrases]`` (matching is symmetric; each pair is
stored once under its lexicographically smaller side).

Line formats tolerated: ``p1 ||| p2 [||| score...]`` (meteor/PPDB style)
and tab-separated ``p1<TAB>p2``. ``--vocab`` (tokenizer.json or word list)
drops pairs containing out-of-vocabulary words, which shrinks the table to
corpus scale.

Usage:
  python scripts/convert_meteor_paraphrases.py --input paraphrase-en.gz \
      [--vocab runs/x/tokenizer.json] --out meteor_paraphrases.json
  MTT_METEOR_PARAPHRASES=meteor_paraphrases.json mtt metrics ...
"""

from __future__ import annotations

import argparse
import gzip
import json


def parse_line(line: str) -> tuple[str, str] | None:
    line = line.strip().lower()
    if not line:
        return None
    if "|||" in line:
        fields = [f.strip() for f in line.split("|||")]
        fields = [f for f in fields if f]
        if len(fields) < 2:
            return None
        a, b = fields[0], fields[1]
    elif "\t" in line:
        a, b, *_ = line.split("\t")
        a, b = a.strip(), b.strip()
    else:
        return None
    if not a or not b or a == b:
        return None
    return a, b


def load_vocab(path: str) -> set[str] | None:
    if not path:
        return None
    if path.endswith(".json"):
        from masters_thesis_tpu.data.tokenizer import Tokenizer

        tok = Tokenizer.from_json(open(path).read())
        return set(tok.word_index)
    return {w.strip() for w in open(path) if w.strip()}


def build_table(lines, vocab: set[str] | None = None,
                max_words: int = 6) -> dict[str, list[str]]:
    table: dict[str, set] = {}
    for line in lines:
        pair = parse_line(line)
        if pair is None:
            continue
        a, b = sorted(pair)
        wa, wb = a.split(), b.split()
        if len(wa) > max_words or len(wb) > max_words:
            continue
        if vocab is not None and any(
                w not in vocab for w in wa + wb):
            continue
        table.setdefault(a, set()).add(b)
    return {k: sorted(v) for k, v in sorted(table.items())}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="paraphrase-en.gz (or plain text)")
    ap.add_argument("--vocab", default="",
                    help="tokenizer.json or word-list file to filter by")
    ap.add_argument("--max-words", type=int, default=6)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    opener = gzip.open if args.input.endswith(".gz") else open
    with opener(args.input, "rt", errors="replace") as f:
        table = build_table(f, load_vocab(args.vocab), args.max_words)
    with open(args.out, "w") as f:
        json.dump(table, f)
    n_pairs = sum(len(v) for v in table.values())
    print(f"wrote {args.out}: {len(table)} phrases, {n_pairs} pairs")


if __name__ == "__main__":
    main()
