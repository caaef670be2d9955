"""METEOR pinned to published numbers (VERDICT r2 missing #2).

- ``params="2005"``: the Banerjee & Lavie 2005 worked examples (the
  canonical METEOR example table, also carried by Wikipedia and pinned in
  NLTK's own doctest): 0.9977 / 0.5000 / 0.9654. Cross-checked live against
  NLTK's independent implementation when its wordnet data is present.
- ``params="1.5"``: exact values hand-derived from the published formulas
  and English 'rank' parameters (Denkowski & Lavie 2014: alpha=.85 beta=.2
  gamma=.6 delta=.75), with the alignment quantities (P, R, chunks, m)
  derived on paper per case — independent of the implementation path.
- the jar-style alignment search itself: coverage > greedy (a paraphrase
  case where greedy longest-first strands a word), minimum-chunk and
  minimum-distance tie-breaking.
"""

import pytest

from masters_thesis_tpu.evalsuite.meteor import (
    ParaphraseTable,
    _align_beam,
    meteor_lite,
)

_REF = "the cat sat on the mat".split()


def test_2005_published_worked_examples():
    cases = [
        ("the cat sat on the mat", 0.9977),
        ("on the mat sat the cat", 0.5000),
        ("the cat was sat on the mat", 0.9654),
    ]
    for hyp, want in cases:
        got = meteor_lite([_REF], hyp.split(), params="2005")
        assert round(got, 4) == want, (hyp, got)
    assert meteor_lite([_REF], "john loves mary".split(),
                       params="2005") == 0.0


def test_2005_matches_nltk_independent_implementation():
    nltk = pytest.importorskip("nltk")
    try:
        from nltk.translate.meteor_score import single_meteor_score

        got_nltk = single_meteor_score(_REF, "the cat was sat on the mat".split())
    except LookupError:
        pytest.skip("nltk wordnet corpus not available in this image")
    ours = meteor_lite([_REF], "the cat was sat on the mat".split(),
                       params="2005")
    assert abs(ours - got_nltk) < 1e-9


def _score15(P, R, ch, m):
    """The published Meteor 1.5 scoring formula at the English 'rank'
    parameters — used to compute expected values from hand-derived
    alignment quantities."""
    f = P * R / (0.85 * P + 0.15 * R)
    return f * (1.0 - 0.6 * (ch / m) ** 0.2)


def test_15_formula_goldens():
    # identical: every word exact-matched, one chunk, m=6.
    got = meteor_lite([_REF], list(_REF), params="1.5")
    assert abs(got - _score15(1.0, 1.0, 1, 6)) < 1e-12

    # scrambled: full coverage; the jar's search minimises chunks over the
    # two interchangeable 'the' assignments -> 3 chunks
    # ("on the mat" / "sat" / "the cat"), not greedy-in-order's 6.
    got = meteor_lite([_REF], "on the mat sat the cat".split(), params="1.5")
    assert abs(got - _score15(1.0, 1.0, 3, 6)) < 1e-12

    # insertion: 'was' unmatched. delta=0.75 weighting: content words
    # (cat, sat, mat) weigh 0.75, function words 0.25. Weighted |hyp| =
    # 3*0.75 + 4*0.25 = 3.25, weighted matches = 3.0 on both sides ->
    # P = 3/3.25, R = 1; two chunks, m = 6.
    got = meteor_lite([_REF], "the cat was sat on the mat".split(),
                      params="1.5")
    assert abs(got - _score15(3.0 / 3.25, 1.0, 2, 6)) < 1e-12


def test_beam_beats_greedy_coverage_on_paraphrase_conflict():
    # greedy longest-span-first consumes the whole reference with
    # nyc -> "new york city" and strands hyp 'city'; the jar's search takes
    # nyc -> "new york" + city -> city (5 matched words vs 4, one chunk)
    table = ParaphraseTable({"nyc": ["new york", "new york city"]})
    ref = "new york city".split()
    hyp = "nyc city".split()
    stage_sides, chunks, m = _align_beam(ref, hyp, paraphrases=table)
    matched_h = sorted(sum((h for h, _ in stage_sides), []))
    matched_r = sorted(sum((r for _, r in stage_sides), []))
    assert matched_h == [0, 1] and matched_r == [0, 1, 2]
    assert chunks == 1 and m == 2.5


def test_beam_breaks_ties_by_distance():
    # two equal-coverage, equal-chunk alignments for 'a': the jar prefers
    # the smaller |hyp_pos - ref_pos|
    stage_sides, chunks, m = _align_beam("a b a".split(), ["a"])
    assert stage_sides[0] == ([0], [0])


def test_beam_minimises_chunks_within_full_coverage():
    stage_sides, chunks, m = _align_beam(_REF,
                                         "on the mat sat the cat".split())
    assert m == 6 and chunks == 3


def test_function_word_list_is_a_loadable_data_file(tmp_path):
    """Round-4 VERDICT item 7: the delta-weighting function words ship as a
    data file (bundled default; MTT_METEOR_FUNCTION_WORDS / explicit path
    overrides for the jar's own en.words via
    scripts/convert_meteor_function_words.py)."""
    import os

    from masters_thesis_tpu.evalsuite import meteor

    bundled = os.path.join(
        os.path.dirname(meteor.__file__), "meteor_function_words_en.txt")
    assert os.path.exists(bundled)
    words = meteor.load_function_words()
    assert words == meteor.default_function_words()
    assert {"the", "a", "of", "is", "on"} <= words
    assert "cat" not in words and "sat" not in words
    # explicit-path override (the jar-extracted list drops in here)
    p = tmp_path / "en.words"
    p.write_text("# comment\nthe\nZebra\n\n")
    assert meteor.load_function_words(str(p)) == frozenset({"the", "zebra"})


def test_15_delta_weighting_hand_derived_goldens():
    """Delta weighting pinned by hand with an EXPLICIT function-word set,
    so the golden is independent of list membership. delta=0.75: content
    words count 0.75, function words 0.25 (Denkowski & Lavie 2014 §2).

    Case A — ref 'the cat sat on the mat', hyp 'a cat sat on a mat',
    function set {the, a, on}: exact matches cat/sat/on/mat (m=4), chunks=2
    (cat-sat-on | mat). Weighted matches both sides = .75+.75+.25+.75 = 2.5;
    weighted lengths = 2.5 + two function words (.25 each) = 3.0.
    P = R = 2.5/3; F = P (P==R); frag = 2/4:
      score = (2.5/3) * (1 - 0.6 * 0.5**0.2) = 0.39805805168...
    With an EMPTY function set every word weighs 0.75:
      P = R = 3/4.5 = 2/3 -> score = (2/3)*(1-0.6*0.5**0.2) = 0.31844644...

    Case B — ref 'the dog', hyp 'the cat': only the FUNCTION word matches
    (m=1, chunks=1, frag=1, penalty factor 1-0.6 = 0.4).
    {the} functional: P = R = 0.25/1.0 -> score = 0.25*0.4 = 0.1 exactly;
    empty set: P = R = 0.75/1.5 = 0.5 -> score = 0.5*0.4 = 0.2 exactly.
    """
    fw = frozenset({"the", "a", "on"})
    ref = "the cat sat on the mat".split()
    hyp = "a cat sat on a mat".split()
    pen = 1.0 - 0.6 * 0.5 ** 0.2
    got = meteor_lite([ref], hyp, params="1.5", function_words=fw)
    assert abs(got - (2.5 / 3.0) * pen) < 1e-12
    got0 = meteor_lite([ref], hyp, params="1.5", function_words=frozenset())
    assert abs(got0 - (2.0 / 3.0) * pen) < 1e-12
    # delta-weighting must actually change the score
    assert abs(got - got0) > 0.05

    ref_b, hyp_b = ["the", "dog"], ["the", "cat"]
    got_b = meteor_lite([ref_b], hyp_b, params="1.5", function_words=fw)
    assert abs(got_b - 0.1) < 1e-12
    got_b0 = meteor_lite([ref_b], hyp_b, params="1.5",
                         function_words=frozenset())
    assert abs(got_b0 - 0.2) < 1e-12
