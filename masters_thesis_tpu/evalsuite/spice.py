"""SPICE-lite: semantic-proposition F1 for caption evaluation.

The reference reports SPICE through pycocoevalcap's Java scene-graph
pipeline (AttemptFour/metric_suit.py:88-109: dependency parse → scene graph
→ tuple F1). That stack (Stanford parser jars) is unavailable here, so this
module implements the same *scoring model* — F1 over semantic tuples
(objects, attribute-object pairs, subject-relation-object triples) —
with a lightweight caption-grammar chunker in place of the dependency
parser. COCO-style captions are syntactically simple ("a man riding a bike
down the street"), which is what makes the rule-based extraction workable.

Tuple matching uses exact-or-Porter-stem equality, upgraded to the Java
pipeline's WordNet-synset semantics (two slot words match when their synset
id sets intersect) when an offline synonym table is available — the same
table (and ``MTT_METEOR_SYNONYMS`` discovery) the METEOR synonym stage uses
(``scripts/convert_wordnet_synonyms.py``). Scores correlate with but are not
numerically identical to Java SPICE (the parser differs) — reported as
"SPICE_lite" either way.
"""

from __future__ import annotations

from masters_thesis_tpu.evalsuite.stem import porter_stem

# closed-class words for the caption grammar
_DETERMINERS = frozenset(
    "a an the this that these those his her its their some any each no "
    "every another".split())
_NUMBERS = frozenset(
    "one two three four five six seven eight nine ten several few many "
    "couple group bunch".split())
_PREPOSITIONS = frozenset(
    "in on at by with near under over above behind beside between through "
    "across around against along inside outside onto into up down off "
    "of from to atop beneath below next".split())
_COPULAS = frozenset("is are was were be being been".split())
_CONJ = frozenset("and or while as".split())
# frequent caption adjectives that don't match the suffix heuristics
_COMMON_ADJ = frozenset(
    "red blue green yellow black white brown orange purple pink gray grey "
    "small large big little young old tall short long wide high low open "
    "closed empty full wet dry hot cold dark bright clear blurry "
    "wooden plastic metal glass striped spotted furry".split())
_ADJ_SUFFIXES = ("ful", "ous", "ish", "ive", "able", "ible", "al", "ed",
                 "less", "y")


def _is_adjective(word: str) -> bool:
    if word in _COMMON_ADJ:
        return True
    return len(word) > 4 and word.endswith(_ADJ_SUFFIXES)


def _is_verb(word: str) -> bool:
    # caption relations are overwhelmingly present participles
    # ("riding", "sitting on") or simple 3rd-person forms ("rides")
    return len(word) > 4 and word.endswith("ing")


class SceneTuples:
    """objects: {noun}; attributes: {(noun, adj)}; relations: {(s, r, o)}."""

    def __init__(self):
        self.objects: set = set()
        self.attributes: set = set()
        self.relations: set = set()

    def all_tuples(self) -> set:
        return ({("o", porter_stem(o)) for o in self.objects}
                | {("a", porter_stem(n), porter_stem(a))
                   for n, a in self.attributes}
                | {("r", porter_stem(s), porter_stem(r), porter_stem(o))
                   for s, r, o in self.relations})

    def raw_tuples(self) -> set:
        """Unstemmed tuples — the synonym-table match path needs surface
        forms (the table is keyed on vocabulary words, not stems)."""
        return ({("o", o) for o in self.objects}
                | {("a", n, a) for n, a in self.attributes}
                | {("r", s, r, o) for s, r, o in self.relations})


def parse_caption(tokens) -> SceneTuples:
    """Chunk a caption into noun phrases linked by verbs/prepositions.

    Grammar: NP = det? (num|adj)* noun+ ; REL = verb prep? | copula? prep.
    The last word of an NP is its head; preceding adjectives attach as
    attribute tuples.
    """
    out = SceneTuples()
    toks = [t.lower() for t in tokens
            if t and t not in ("<start>", "<end>", "<pad>", "<unk>")]

    # segment into (np_words, link_words, np_words, ...)
    nps: list[list[str]] = []
    links: list[list[str]] = []  # link[i] connects nps[i] -> nps[i+1]
    cur_np: list[str] = []
    cur_link: list[str] = []
    for w in toks:
        if w in _DETERMINERS or w in _CONJ:
            continue
        if w in _PREPOSITIONS or w in _COPULAS or _is_verb(w):
            if cur_np:
                nps.append(cur_np)
                cur_np = []
                cur_link = []
                links.append(cur_link)
            if w not in _COPULAS:
                cur_link.append(w)
        else:
            cur_np.append(w)
    if cur_np:
        nps.append(cur_np)

    heads = []
    for np_words in nps:
        head = np_words[-1]
        out.objects.add(head)
        for w in np_words[:-1]:
            if w in _NUMBERS:
                continue
            if _is_adjective(w):
                out.attributes.add((head, w))
            else:
                out.objects.add(w)  # compound noun ("baseball bat")
        heads.append(head)

    for i, link in enumerate(links):
        if i + 1 < len(heads) and link:
            out.relations.add((heads[i], " ".join(link), heads[i + 1]))
    return out


def _slot_match(a: str, b: str, synonyms) -> bool:
    """SPICE's per-word match: stem equality OR WordNet synset overlap
    (SpiceScorer's similarTo — lemma match via intersecting synsets)."""
    if porter_stem(a) == porter_stem(b):
        return True
    if synonyms is not None:
        sa = synonyms.synsets(a)
        return bool(sa) and not sa.isdisjoint(synonyms.synsets(b))
    return False


def _match_count(hyp_t: set, ref_t: set, synonyms) -> int:
    """Greedy bipartite tuple matching: every slot must match (same arity);
    each reference tuple is consumed at most once."""
    used: set = set()
    matched = 0
    for h in hyp_t:
        for r in ref_t:
            if r in used or len(r) != len(h) or r[0] != h[0]:
                continue  # r[0] is the category tag ("o"/"a"/"r")
            if all(_slot_match(hw, rw, synonyms)
                   for hw, rw in zip(h[1:], r[1:])):
                used.add(r)
                matched += 1
                break
    return matched


def spice_lite(references, hypothesis, synonyms=None) -> float:
    """Tuple F1 of the hypothesis against the union of reference tuples.

    ``synonyms``: optional ``meteor.SynonymTable``; when given, slots match
    on WordNet synset overlap as in Java SPICE, not just stem equality.
    """
    hyp = parse_caption(hypothesis)
    if synonyms is None:
        hyp_t = hyp.all_tuples()
        ref_t: set = set()
        for ref in references:
            ref_t |= parse_caption(ref).all_tuples()
        if not hyp_t or not ref_t:
            return 0.0
        matched = len(hyp_t & ref_t)
    else:
        # synonym matching runs on raw (unstemmed) words so the table's
        # surface-form keys apply (stem fallback happens per slot)
        hyp_t = hyp.raw_tuples()
        ref_t = set()
        for ref in references:
            ref_t |= parse_caption(ref).raw_tuples()
        if not hyp_t or not ref_t:
            return 0.0
        matched = _match_count(hyp_t, ref_t, synonyms)
    p = matched / len(hyp_t)
    r = matched / len(ref_t)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def corpus_spice(references_list, hypotheses, synonyms=None) -> float:
    if not hypotheses:
        return 0.0
    return sum(
        spice_lite(refs, hyp, synonyms=synonyms)
        for refs, hyp in zip(references_list, hypotheses)
    ) / len(hypotheses)
