"""SPICE_lite pinned numerically (round-4 VERDICT item 6).

Two layers of evidence replace the previously untested "correlates with
Java SPICE" docstring claim (evalsuite/spice.py):

1. the Anderson et al. 2016 worked example (the SPICE paper's Figure 1
   caption) parses to EXACTLY the published scene graph;
2. a 14-case golden set whose expected F1 scores are HAND-DERIVED by
   applying the published SPICE procedure (Schuster et al. 2015 scene-graph
   rules -> tuple F1 with lemma/synset matching) on paper, independent of
   this implementation. With a WordNet-equivalent synonym table (the
   bit-identical in-image stand-in for the jar's synset matching)
   spice_lite must reproduce every hand score exactly; without a table
   (stem-only matching — what a bare image computes) the Spearman rank
   correlation against the published-procedure scores is MEASURED and
   bounded, so the docstring's correlation claim is a number, not a hope.

Hand derivations (tuple sets per the published rules; F1 = 2PR/(P+R)):

ref A = "a young girl standing on top of a tennis court"
  -> {girl, court, (girl,young), (girl,standing), (court,tennis),
      (girl,on-top-of,court)}                                   |A| = 6
ref B = "two women sitting at a table"
  -> {women, table, (women,two), (women,sitting), (women,at,table)}  |B| = 5
ref C = "a man riding a bicycle down a street"
  -> {man, bicycle, street, (man,riding,bicycle), (man,down,street)} |C| = 5
  (the chunker attaches down-street to 'bicycle'; both forms are
  unmatched by every hypothesis below, so every F1 is unaffected)
ref D = "a red double decker bus parked on the street"
  -> {bus, street, (bus,red), (bus,double), (bus,decker),
      (bus,parked), (bus,on,street)}                            |D| = 7

Per-case matched counts (synset matching: woman~women, bike~bicycle —
shared WordNet synsets; boy!~girl, woman!~girl — disjoint synsets):

  vs A: identical                                6/6  -> 1
        "a girl standing on a tennis court"      4/5  -> 0.72727...
        "a young girl"                           2/2,R=2/6 -> 0.5
        "a girl on a court"                      2/3,R=2/6 -> 0.44444...
        "a boy standing on a court"              1/4,R=1/6 -> 0.2
        "a dog sleeping on a couch"              0    -> 0
        "a young woman standing on top of a tennis court"
                                                 2/6,R=2/6 -> 0.33333...
  vs B: "a woman sitting at a table"             4/4,R=4/5 -> 0.88888...
        "a group of people standing around a table"
                                                 1/6,R=1/5 -> 0.18181...
        "two women sitting at a table eating food"
                                                 5/7,R=5/5 -> 0.83333...
  vs C: "a man riding a bicycle"                 3/3,R=3/5 -> 0.75
        "a man riding a bike down a street"      5/5  -> 1
        "a woman walking a dog on a sidewalk"    0    -> 0
  vs D: "a red bus on a street"                  4/4,R=4/7 -> 0.72727...
"""

import numpy as np

from masters_thesis_tpu.evalsuite.meteor import SynonymTable
from masters_thesis_tpu.evalsuite.spice import parse_caption, spice_lite

REF_A = "a young girl standing on top of a tennis court"
REF_B = "two women sitting at a table"
REF_C = "a man riding a bicycle down a street"
REF_D = "a red double decker bus parked on the street"

# (reference, hypothesis, hand-derived published-procedure F1)
GOLDEN_CASES = [
    (REF_A, REF_A, 1.0),
    (REF_A, "a girl standing on a tennis court", 8.0 / 11.0),
    (REF_A, "a young girl", 0.5),
    (REF_A, "a girl on a court", 4.0 / 9.0),
    (REF_A, "a boy standing on a court", 0.2),
    (REF_A, "a dog sleeping on a couch", 0.0),
    (REF_A, "a young woman standing on top of a tennis court", 1.0 / 3.0),
    (REF_B, "a woman sitting at a table", 8.0 / 9.0),
    (REF_B, "a group of people standing around a table", 2.0 / 11.0),
    (REF_B, "two women sitting at a table eating food", 10.0 / 12.0),
    (REF_C, "a man riding a bicycle", 0.75),
    (REF_C, "a man riding a bike down a street", 1.0),
    (REF_C, "a woman walking a dog on a sidewalk", 0.0),
    (REF_D, "a red bus on a street", 8.0 / 11.0),
]

# WordNet-equivalent synset table for the pairs the golden set touches
# (synthetic ids; only set INTERSECTION matters — the jar's similarTo).
# woman/women share the woman lemma synset; bike/bicycle share synset
# wheeled_vehicle; girl deliberately disjoint from woman/boy (WordNet
# girl synsets do not include woman's).
SYNONYMS = SynonymTable({
    "woman": ["n-woman"],
    "women": ["n-woman"],
    "bike": ["n-bicycle"],
    "bicycle": ["n-bicycle"],
    "girl": ["n-girl"],
    "boy": ["n-boy"],
})


def test_anderson_2016_worked_example_scene_graph():
    """The SPICE paper's Figure 1 caption parses to exactly the published
    tuple set (Anderson et al. 2016 §1: objects girl, court; attributes
    young, standing, tennis; relation on-top-of)."""
    t = parse_caption(REF_A.split())
    assert t.objects == {"girl", "court"}
    assert t.attributes == {
        ("girl", "young"), ("girl", "standing"), ("court", "tennis")}
    assert t.relations == {("girl", "on top of", "court")}


def test_hand_derived_f1_with_synonym_table_exact():
    """With WordNet-equivalent synset matching, spice_lite reproduces the
    hand-applied published procedure EXACTLY on every golden case."""
    for ref, hyp, want in GOLDEN_CASES:
        got = spice_lite([ref.split()], hyp.split(), synonyms=SYNONYMS)
        assert abs(got - want) < 1e-9, (hyp, got, want)


def test_bundled_caption_table_reproduces_goldens_exactly():
    """The curated caption-domain table shipped in the package
    (caption_synonyms_en.json — the metric-suite default when no WordNet
    table is configured) covers the golden set's synonym-stage matches
    (woman~women, bike~bicycle) and introduces no spurious ones: every
    hand-derived score reproduces exactly, in-image, with zero setup."""
    table = SynonymTable.default_caption_table()
    assert len(table) > 50  # metadata keys filtered, vocabulary present
    for ref, hyp, want in GOLDEN_CASES:
        got = spice_lite([ref.split()], hyp.split(), synonyms=table)
        assert abs(got - want) < 1e-9, (hyp, got, want)


def test_metric_suite_spice_uses_bundled_table_by_default(monkeypatch):
    """evaluate_captions without any configured table scores SPICE_lite
    through the bundled curated table (not stem-only)."""
    monkeypatch.delenv("MTT_METEOR_SYNONYMS", raising=False)
    from masters_thesis_tpu.evalsuite.metric_suite import evaluate_captions

    refs = [["a man riding a bicycle down a street"]]
    cand = ["a man riding a bike down a street"]
    scores = evaluate_captions(cand, refs)
    assert abs(scores["SPICE_lite"] - 1.0) < 1e-9  # bike~bicycle matched
    stem_only = spice_lite([refs[0][0].split()], cand[0].split())
    assert scores["SPICE_lite"] > stem_only


def _spearman_rho(a, b):
    a = np.asarray(a, float)
    b = np.asarray(b, float)

    def ranks(x):
        order = np.argsort(x, kind="stable")
        r = np.empty(len(x))
        r[order] = np.arange(len(x), dtype=float)
        for v in np.unique(x):
            m = x == v
            r[m] = r[m].mean()
        return r

    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra ** 2).sum() * (rb ** 2).sum()))


def test_stem_only_rank_correlation_measured():
    """Without a synonym table (a bare image) the only divergences from the
    published-procedure scores are the synonym-stage matches (woman~women,
    bike~bicycle). The rank correlation is measured here — the docstring's
    'correlates with' claim as a number — and the divergent cases are
    exactly the two synonym-dependent ones."""
    want = [w for _, _, w in GOLDEN_CASES]
    got = [spice_lite([r.split()], h.split()) for r, h, _ in GOLDEN_CASES]
    rho = _spearman_rho(want, got)
    # measured: rho = 0.7417 on this set (two synonym-dependent cases rank
    # low without a table; every other case is exact). Pinned so the
    # docstring's correlation claim stays a recorded measurement.
    assert abs(rho - 0.7417) < 0.01, rho
    divergent = [h for (r, h, w), g in zip(GOLDEN_CASES, got)
                 if abs(g - w) > 1e-9]
    assert divergent == [
        "a woman sitting at a table",
        "a man riding a bike down a street",
    ]
    # stem-only still scores every non-synonym case exactly
    for (r, h, w), g in zip(GOLDEN_CASES, got):
        if h not in divergent:
            assert abs(g - w) < 1e-9, (h, g, w)
