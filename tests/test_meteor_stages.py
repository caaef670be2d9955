"""METEOR synonym stage + 1.5 parameterisation, validated against
hand-computed golden values (the published Denkowski & Lavie 2014 formulas
with the jar's English defaults alpha=.85 beta=.2 gamma=.6 delta=.75)."""

import json

import pytest

from masters_thesis_tpu.evalsuite.meteor import (
    SynonymTable,
    default_function_words,
    corpus_meteor,
    meteor_lite,
)
from masters_thesis_tpu.evalsuite.metric_suite import evaluate_captions

REF = "the cat sat on the mat".split()
HYP = "the cat is on a mat".split()


def test_meteor15_golden_hand_computed():
    """Exact-stage-only case, fully hand-derived:

    matches (hyp_idx, ref_idx): (0,0)(1,1)(3,3)(5,5) -> m=4, chunks=3.
    delta-weighted (content .75 / function .25):
      matched weight 2.0 both sides; |hyp|_w = 2.5, |ref|_w = 3.0
      P = .8, R = 2/3, F = PR/(.85P+.15R) = .533333/.78 = .6837607
      Pen = .6 * (3/4)^.2 = .5664525 ; score = .6837607*.4335475 = .2964428
    """
    got = meteor_lite([REF], HYP, params="1.5")
    assert got == pytest.approx(0.2964428, abs=1e-6)


def test_meteor15_function_word_classification():
    # the golden above depends on this split — pin it
    for w in ("the", "is", "on", "a"):
        assert w in default_function_words()
    for w in ("cat", "sat", "mat"):
        assert w not in default_function_words()


def test_synonym_stage_aligns_and_weights():
    table = SynonymTable({"sat": [1], "perched": [1, 7], "cat": [3]})
    hyp = "the cat perched on the mat".split()
    without = meteor_lite([REF], hyp, params="1.5")
    with_syn = meteor_lite([REF], hyp, synonyms=table, params="1.5")
    assert with_syn > without
    # perfect alignment via synonym: one chunk, but the synonym match
    # carries stage weight 0.8 < 1.0, so score < exact-perfect. Perfect
    # 6-word exact match: F=1, Pen = .6*(1/6)^.2 (beta=.2 penalises even
    # single-chunk alignments — 1.5 scores saturate near .58 for short
    # perfect segments, unlike 2005's near-1.0)
    perfect = meteor_lite([REF], REF, params="1.5")
    assert perfect == pytest.approx(1.0 - 0.6 * (1 / 6) ** 0.2, abs=1e-9)
    assert with_syn < perfect
    # hand-derived: exact 5 words (weighted 2.25) + synonym .8*.75 = 2.85;
    # lens 3.0/3.0 -> P=R=.95 -> F=.95; Pen as perfect -> .95*(1-Pen)
    assert with_syn == pytest.approx(0.95 * (1.0 - 0.6 * (1 / 6) ** 0.2),
                                     abs=1e-9)


def test_synonym_stage_2005_params_too():
    table = SynonymTable({"sat": [1], "perched": [1]})
    hyp = "the cat perched on the mat".split()
    # with synonyms, 2005 scoring sees a perfect 6/6 single-chunk alignment
    got = meteor_lite([REF], hyp, synonyms=table)
    want = meteor_lite([REF], REF)
    assert got == pytest.approx(want, abs=1e-9)


def test_corpus_micro_aggregation():
    # two identical segments micro-aggregate to the segment score
    seg = meteor_lite([REF], HYP, params="1.5")
    corp = corpus_meteor([[REF], [REF]], [HYP, HYP], params="1.5")
    assert corp == pytest.approx(seg, abs=1e-9)
    # micro != macro in general: a second, different segment shifts the
    # aggregate away from the mean of segment scores
    seg2_refs, seg2_hyp = [["a", "dog", "runs"]], ["dog"]
    corp2 = corpus_meteor([[REF], seg2_refs], [HYP, seg2_hyp], params="1.5")
    mean2 = (seg + meteor_lite(seg2_refs, seg2_hyp, params="1.5")) / 2
    assert abs(corp2 - mean2) > 1e-3


def test_corpus_15_empty_hypothesis_penalizes():
    """An empty hypothesis contributes its reference length to the 1.5
    aggregate recall denominator (jar EVAL semantics) — skipping the
    segment would inflate the corpus score to the non-empty segments'."""
    full = corpus_meteor([[REF]], [HYP], params="1.5")
    with_empty = corpus_meteor([[REF], [REF]], [HYP, []], params="1.5")
    assert with_empty < full - 1e-3
    # all-empty corpus scores 0, same as the 2005 path
    assert corpus_meteor([[REF]], [[]], params="1.5") == 0.0
    assert corpus_meteor([[REF]], [[]], params="2005") == 0.0


def test_best_reference_selected_per_segment():
    refs = [["completely", "unrelated", "words"], REF]
    assert meteor_lite(refs, HYP, params="1.5") == pytest.approx(
        meteor_lite([REF], HYP, params="1.5"))


def test_metric_suite_labels_by_table_presence(tmp_path, monkeypatch):
    cands = ["the cat sat on the mat"]
    refs = [["the cat sat on the mat"]]
    monkeypatch.delenv("MTT_METEOR_SYNONYMS", raising=False)
    scores = evaluate_captions(cands, refs)
    assert "METEOR_lite" in scores and "METEOR" not in scores

    table_path = tmp_path / "syn.json"
    table_path.write_text(json.dumps({"cat": [0], "feline": [0]}))
    monkeypatch.setenv("MTT_METEOR_SYNONYMS", str(table_path))
    scores = evaluate_captions(cands, refs)
    assert "METEOR" in scores and "METEOR_lite" not in scores
    assert scores["METEOR"] == pytest.approx(1.0 - 0.6 * (1 / 6) ** 0.2,
                                             abs=1e-6)


def test_table_load_roundtrip(tmp_path):
    p = tmp_path / "t.json"
    p.write_text(json.dumps({"happy": [1, 2], "glad": [2]}))
    t = SynonymTable.load(str(p))
    assert len(t) == 2
    assert t.synsets("happy") & t.synsets("glad")
    assert not t.synsets("missing")


def test_paraphrase_stage_matches_spans():
    from masters_thesis_tpu.evalsuite.meteor import ParaphraseTable

    ref = "one man on horseback rides past".split()
    hyp = "one man riding a horse rides past".split()
    # "on horseback" <-> "riding a horse": phrase pair, either direction,
    # unequal span lengths (2 vs 3)
    table = ParaphraseTable({"on horseback": ["riding a horse"]})
    without = meteor_lite([ref], hyp, params="1.5")
    with_para = meteor_lite([ref], hyp, params="1.5", paraphrases=table)
    assert with_para > without
    reverse = ParaphraseTable({"riding a horse": ["on horseback"]})
    assert meteor_lite([ref], hyp, params="1.5", paraphrases=reverse) == \
        pytest.approx(with_para)


def test_paraphrase_stage_unequal_spans():
    from masters_thesis_tpu.evalsuite.meteor import ParaphraseTable

    ref = "the dog is running quickly".split()
    hyp = "the dog sprints".split()
    table = ParaphraseTable({"running quickly": ["sprints"]})
    without = meteor_lite([ref], hyp, params="1.5")
    with_para = meteor_lite([ref], hyp, params="1.5", paraphrases=table)
    # hyp side fully matched, ref gains a 2-word span
    assert with_para > without > 0.0
    # paraphrase stage never matches words already consumed by exact stage
    same = meteor_lite([ref], ref, params="1.5", paraphrases=table)
    assert same == meteor_lite([ref], ref, params="1.5")


def test_paraphrase_env_discovery(tmp_path, monkeypatch):
    syn = tmp_path / "syn.json"
    syn.write_text(json.dumps({}))
    para = tmp_path / "para.json"
    para.write_text(json.dumps({"on horseback": ["riding a horse"]}))
    monkeypatch.setenv("MTT_METEOR_SYNONYMS", str(syn))
    monkeypatch.delenv("MTT_METEOR_PARAPHRASES", raising=False)
    cands = ["one man riding a horse"]
    refs = [["one man on horseback"]]
    base = evaluate_captions(cands, refs)["METEOR"]
    monkeypatch.setenv("MTT_METEOR_PARAPHRASES", str(para))
    with_para = evaluate_captions(cands, refs)["METEOR"]
    assert with_para > base


def test_paraphrase_converter_roundtrip(tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    try:
        from convert_meteor_paraphrases import build_table, parse_line
    finally:
        sys.path.pop(0)
    assert parse_line("on a bicycle ||| riding a bike ||| 0.73") == (
        "on a bicycle", "riding a bike")
    assert parse_line("running quickly\tsprints") == (
        "running quickly", "sprints")
    assert parse_line("same ||| same") is None
    assert parse_line("") is None
    table = build_table([
        "on a bicycle ||| riding a bike",
        "riding a bike ||| on a bicycle",   # dedup: symmetric pair
        "a very long phrase over the limit ||| short",
        "dog ||| canine",
    ], max_words=5)
    assert table == {"on a bicycle": ["riding a bike"], "canine": ["dog"]}
    from masters_thesis_tpu.evalsuite.meteor import ParaphraseTable

    t = ParaphraseTable(table)
    assert t.matches("riding a bike", "on a bicycle")
    assert t.matches("on a bicycle", "riding a bike")
    assert t.matches("dog", "canine") and not t.matches("dog", "cat")
    # vocab filter drops OOV pairs
    filtered = build_table(["dog ||| canine", "cat ||| feline"],
                           vocab={"dog", "canine"})
    assert filtered == {"canine": ["dog"]}


def test_corpus_meteor_accepts_generator_references():
    """Generator token sequences must survive the empty-ref filter (the old
    double list(r) drained them to [] and scored the corpus ~0)."""
    from masters_thesis_tpu.evalsuite.meteor import corpus_meteor

    toks = ["a", "cat", "on", "a", "mat"]
    score = corpus_meteor([[iter(toks)]], [list(toks)], params="1.5")
    expected = corpus_meteor([[list(toks)]], [list(toks)], params="1.5")
    assert score == expected and score > 0.5, (score, expected)


def test_function_words_env_is_lazy_and_per_call(tmp_path, monkeypatch):
    """The env override is resolved at scoring time, not import time: a
    path set after import is honored, removing it falls back to the
    bundled list, and a broken path fails only the call that needs it."""
    p = tmp_path / "fw.txt"
    p.write_text("cat\n")
    monkeypatch.setenv("MTT_METEOR_FUNCTION_WORDS", str(p))
    assert default_function_words() == frozenset({"cat"})
    monkeypatch.delenv("MTT_METEOR_FUNCTION_WORDS")
    assert "the" in default_function_words()
    monkeypatch.setenv("MTT_METEOR_FUNCTION_WORDS", str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        default_function_words()
