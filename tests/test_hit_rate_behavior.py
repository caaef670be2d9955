"""Behavioral hit rate vs BLEU (reference: AttemptFour/Eval/hit_rate.py
main(): responses.tsv ISCORRECT grouped per 73KID, BLEU boxplots per hit)."""

import numpy as np

from masters_thesis_tpu.evalsuite.analysis import (
    bleu_by_hit_rate,
    load_behavior_hits,
)


def _write_responses(path, rows):
    cols = ["SUBJECT", "SESSION", "73KID", "ISCORRECT"]
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_load_behavior_hits_sums_per_key(tmp_path):
    tsv = tmp_path / "responses.tsv"
    # key 7 seen 3x (2 correct), key 9 seen 3x (0 correct)
    _write_responses(tsv, [
        (2, 1, 7, 1), (2, 5, 7, 0), (2, 9, 7, 1),
        (2, 1, 9, 0), (2, 5, 9, 0), (2, 9, 9, 0),
    ])
    hits = load_behavior_hits(str(tsv))
    assert hits == {7: 2, 9: 0}


def test_bleu_by_hit_rate_groups_and_scores():
    captions = {1: "a red car <pad> <pad>", 2: "purple elephant flies"}
    refs = {1: ["A red car.", "one red car"], 2: ["a blue boat", "the boat"]}
    hits = {1: 3, 2: 0}
    out = bleu_by_hit_rate(captions, refs, hits)
    assert out["n_scored"] == 2
    # key 1's caption is a verbatim (cleaned) reference -> BLEU-1 == 1.0,
    # grouped under hit rate 3; <pad> stripped before scoring
    assert out["BLEU-1"][3] == [1.0]
    # key 2 shares no unigrams -> 0.0 under hit rate 0
    assert out["BLEU-1"][0] == [0.0]
    # BLEU-4 present with the full 4-gram weights (the reference's figure
    # mislabels BLEU-2 as BLEU-4; here labels match weights)
    assert set(out["BLEU-4"]) == {0, 1, 2, 3}
    assert out["BLEU-4"][1] == [] and out["BLEU-4"][2] == []


def test_bleu_by_hit_rate_skips_keys_without_behavior_or_refs():
    captions = {1: "a", 2: "b", 3: "c"}
    refs = {1: ["a"], 2: ["b"]}
    hits = {1: 1, 3: 2}   # key 2 lacks behavior, key 3 lacks refs
    out = bleu_by_hit_rate(captions, refs, hits)
    assert out["n_scored"] == 1


def test_cli_analyze_responses(tmp_path):
    import yaml

    from masters_thesis_tpu.cli import main

    cap_dir = tmp_path / "captions"
    cap_dir.mkdir()
    (cap_dir / "KID1.txt").write_text("a red car\none red car\n")
    (cap_dir / "KID2.txt").write_text("a blue boat\nthe boat\n")
    tsv = tmp_path / "responses.tsv"
    _write_responses(tsv, [(2, 1, 1, 1), (2, 2, 1, 1), (2, 3, 1, 1),
                           (2, 1, 2, 0), (2, 2, 2, 0), (2, 3, 2, 0)])
    run = tmp_path / "run"
    run.mkdir()
    (run / "captions_5.txt").write_text("1\ta red car\n2\tgreen train\n")
    (run / "config.yaml").write_text(yaml.safe_dump({
        "run": "t", "log": str(tmp_path / "log"),
        "dataset": {"captions_path": str(cap_dir)},
    }))
    assert main(["analyze", "--run", str(run),
                 "--responses", str(tsv)]) == 0
    png = run / "analysis" / "bleu_hit_rate_5.png"
    assert png.exists() and png.stat().st_size > 0


def test_load_behavior_hits_skips_nan_iscorrect(tmp_path):
    tsv = tmp_path / "responses.tsv"
    with open(tsv, "w") as f:
        f.write("SUBJECT\tSESSION\t73KID\tISCORRECT\n")
        f.write("2\t1\t7\t1\n")
        f.write("2\t2\t7\tNaN\n")    # no-response trial
        f.write("2\t3\t7\t\n")       # blank cell
        f.write("2\t1\t9\t1.0\n")
    hits = load_behavior_hits(str(tsv))
    assert hits == {7: 1, 9: 1}


def test_analyze_compare_run_cross_hit_rate(tmp_path):
    import contextlib
    import io
    import json

    from masters_thesis_tpu.cli import main

    run_a = tmp_path / "a"
    run_b = tmp_path / "b"
    run_a.mkdir(), run_b.mkdir()
    (run_a / "captions_1.txt").write_text("1\ta red car\n2\tthe blue boat\n")
    (run_b / "captions_1.txt").write_text("1\ta red bike\n2\tgreen train\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run_a),
                     "--compare-run", str(run_b)]) == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    hr = rep["cross_run_hit_rate_1"]
    # key 1 shares unigrams ('a', 'red'), key 2 shares none -> hit rate 0.5
    assert hr["n_shared"] == 2 and hr["hit_rate"] == 0.5


def test_bleu_by_hit_rate_individual_weight_label():
    """The individual 4-gram set must not be labelled BLEU-1 (and must not
    overwrite the real BLEU-1 panel)."""
    from masters_thesis_tpu.evalsuite.analysis import bleu_by_hit_rate

    caps = {1: "a cat sat on the mat"}
    refs = {1: ["a cat sat on the mat"]}
    hits = {1: 2}
    out = bleu_by_hit_rate(caps, refs, hits,
                           weights=((1, 0, 0, 0), (0, 0, 0, 1)))
    assert "BLEU-1" in out and "BLEU-4-ind" in out
    assert out["BLEU-1"][2] == [1.0]
    assert out["BLEU-4-ind"][2] == [1.0]
