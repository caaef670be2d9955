"""COCO-format adapters for the metric suite.

The reference scores captions against MS-COCO annotations by mapping NSD keys
to COCO image ids via NSDAccess stimuli info and feeding pycocoevalcap
(AttemptFour/metric_suit.py:75-109). NSDAccess needs the NSD stimuli HDF5;
here the mapping comes from a CSV (columns ``nsd_key,coco_id`` — one-time
export from nsd_stim_info_merged.csv), and results/annotations use the
standard COCO JSON schemas so they interoperate with the official toolchain.
"""

from __future__ import annotations

import csv
import json


def load_nsd_coco_map(csv_path: str) -> dict[int, int]:
    """{nsd_key: coco_image_id} from a two-column CSV."""
    out: dict[int, int] = {}
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            out[int(row["nsd_key"])] = int(row["coco_id"])
    return out


def write_coco_results(path: str, keys, captions, nsd_to_coco=None) -> list[dict]:
    """COCO results format: [{"image_id": id, "caption": text}, ...]
    (what metric_suit.py feeds COCOEvalCap)."""
    results = []
    for key, cap in zip(keys, captions):
        image_id = int(key) if nsd_to_coco is None else nsd_to_coco[int(key)]
        results.append({"image_id": image_id, "caption": cap})
    with open(path, "w") as f:
        json.dump(results, f)
    return results


def load_coco_annotations(captions_json: str) -> dict[int, list[str]]:
    """captions_train2017.json-style file -> {image_id: [caption, ...]}."""
    with open(captions_json) as f:
        raw = json.load(f)
    out: dict[int, list[str]] = {}
    for ann in raw["annotations"]:
        out.setdefault(int(ann["image_id"]), []).append(ann["caption"])
    return out


def score_against_coco(
    keys, captions, nsd_to_coco: dict[int, int], coco_annotations: dict[int, list[str]]
) -> dict:
    """Run the in-repo metric suite against COCO ground-truth captions."""
    from masters_thesis_tpu.evalsuite.metric_suite import evaluate_captions

    refs = [coco_annotations[nsd_to_coco[int(k)]] for k in keys]
    refs = [[r.lower().replace(".", " ").strip() for r in rr] for rr in refs]
    return evaluate_captions([c.lower() for c in captions], refs)
