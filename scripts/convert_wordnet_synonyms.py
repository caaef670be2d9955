"""Offline converter: NLTK WordNet -> METEOR synonym table JSON.

Run where WordNet data exists (``python -m nltk.downloader wordnet``); this
zero-egress image has nltk but not the corpus. Produces the table consumed by
``masters_thesis_tpu.evalsuite.meteor.SynonymTable`` — a JSON mapping
``word -> [synset ids]``; two words match in METEOR's synonym stage when
their id lists intersect (the meteor-1.5 jar's WordNet synonymy semantics).

Vocab sources: a tokenizer.json from a run dir, a plain word-list file
(one word per line), or --all-lemmas for every WordNet lemma (large).

Usage:
  python scripts/convert_wordnet_synonyms.py --tokenizer runs/x/tokenizer.json \
      --out meteor_synonyms.json
  MTT_METEOR_SYNONYMS=meteor_synonyms.json mtt metrics ...
"""

from __future__ import annotations

import argparse
import json


def build_table(vocab: list[str]) -> dict[str, list[int]]:
    from nltk.corpus import wordnet as wn

    synset_ids: dict[str, int] = {}
    table: dict[str, list[int]] = {}
    for word in vocab:
        ids = set()
        # surface form plus its base form (the jar looks up lemmas)
        forms = {word}
        base = wn.morphy(word)
        if base:
            forms.add(base)
        for form in forms:
            for syn in wn.synsets(form):
                ids.add(synset_ids.setdefault(syn.name(), len(synset_ids)))
        if ids:
            table[word] = sorted(ids)
    return table


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--tokenizer", help="tokenizer.json (word_index keys)")
    src.add_argument("--wordlist", help="plain text, one word per line")
    src.add_argument("--all-lemmas", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.tokenizer:
        with open(args.tokenizer) as f:
            vocab = list(json.load(f)["word_index"])
    elif args.wordlist:
        with open(args.wordlist) as f:
            vocab = [w.strip() for w in f if w.strip()]
    else:
        from nltk.corpus import wordnet as wn

        vocab = sorted({lemma.lower() for lemma in wn.all_lemma_names()})

    table = build_table(vocab)
    with open(args.out, "w") as f:
        json.dump(table, f)
    print(f"{len(table)} of {len(vocab)} vocab words have synsets -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
