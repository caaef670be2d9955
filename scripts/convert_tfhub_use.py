"""Offline converter: TF-Hub Universal Sentence Encoder v4 -> use_dan.npz.

The reference scores caption semantics with the TF-Hub USE-v4 DAN model
(AttemptFour/get_guse.py:49-63). This repo reimplements the DAN graph
natively (masters_thesis_tpu/models/use_encoder.py); this script extracts
the SavedModel's variables into the framework's weight-bundle format so the
GUSE metric can run with real weights and no TF/tfhub at eval time.

Run this ONCE on a machine with tensorflow + tensorflow_hub + network access:

    python scripts/convert_tfhub_use.py --out use_dan.npz \
        [--module https://tfhub.dev/google/universal-sentence-encoder/4]

then point the framework at the bundle:

    export MTT_GUSE_WEIGHTS=/path/to/use_dan.npz       # or
    cp use_dan.npz  <cfg.dataset.guse_path>/use_dan.npz

This image has no network egress and no tensorflow_hub, so the script only
documents + implements the mapping; tests exercise the graph with synthetic
bundles (tests/test_use_encoder.py).

OOV fidelity: the converted table's hash-bucket rows are indexed by the TF
graph's ``tf.strings.to_hash_bucket_fast`` (FarmHash Fingerprint64); the
framework reproduces that hash exactly (utils/farmhash.py, golden-tested
against TF), so OOV tokens hit the same trained rows as the original model.
"""

from __future__ import annotations

import argparse
import re


def numeric_key(name: str):
    """Sort key splitting digit runs so shard/layer suffixes order
    numerically: USE-v4 ships ~17 embedding shards, and lexicographic order
    puts sharded_10 before sharded_2 — a silently scrambled vocab table."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def convert(module_url: str, out_path: str) -> None:
    import numpy as np
    import tensorflow as tf  # noqa: F401 — needed for SavedModel loading
    import tensorflow_hub as hub

    from masters_thesis_tpu.models.use_encoder import save_use_bundle

    model = hub.load(module_url)

    # USE-v4's variables (names as of the published SavedModel):
    #   Embeddings_en/sharded_*            token embedding shards
    #   Encoder_en/hidden_layers/l_*/...   DAN hidden dense layers
    #   Encoder_en/final_layer/...         projection to 512
    # The vocab + oov bucket count live in the module's tokenizer assets.
    variables = {v.name: v.numpy() for v in model.variables}

    emb_shards = sorted(
        ((name, arr) for name, arr in variables.items()
         if "Embeddings" in name),
        key=lambda kv: numeric_key(kv[0]),
    )
    assert emb_shards, f"no embedding shards found in {sorted(variables)}"
    table = np.concatenate([arr for _, arr in emb_shards], axis=0)

    params: dict = {"embedding": table}
    hidden = sorted(
        (name for name in variables if "hidden_layers" in name),
        key=numeric_key,
    )
    layer_idx = 0
    seen = set()
    for name in hidden:
        base = name.rsplit("/", 1)[0]
        if base in seen:
            continue
        seen.add(base)
        params[f"dan_layer_{layer_idx}"] = {
            "kernel": variables[f"{base}/weights:0"],
            "bias": variables[f"{base}/bias:0"],
        }
        layer_idx += 1
    final = [n for n in variables if "final_layer" in n]
    fbase = final[0].rsplit("/", 1)[0]
    params["dan_out"] = {
        "kernel": variables[f"{fbase}/weights:0"],
        "bias": variables[f"{fbase}/bias:0"],
    }

    # tokenizer vocab: exported asset file (one token per line)
    assets = list(getattr(model, "asset_paths", []))
    assert assets, "SavedModel exposes no tokenizer asset; extract manually"
    vocab = [
        line.rstrip("\n")
        for line in open(assets[0].asset_path.numpy().decode())
    ]
    oov = table.shape[0] - len(vocab)
    assert oov >= 0, (table.shape, len(vocab))
    save_use_bundle(out_path, vocab, params, oov_buckets=oov)
    print(f"wrote {out_path}: vocab={len(vocab)} oov={oov} "
          f"table={table.shape} layers={layer_idx}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--module",
        default="https://tfhub.dev/google/universal-sentence-encoder/4",
    )
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.module, args.out)
