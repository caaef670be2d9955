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


# -ing words that are (in caption usage) nouns, not present participles:
# without this list "a tall building" would close the NP at "tall" and
# lose the actual object head
_ING_NOUNS = frozenset(
    "building painting drawing clothing ceiling railing awning "
    "lightning frosting icing stuffing seasoning topping bedding "
    "fencing siding evening morning wedding string spring wing ring "
    "king thing something nothing anything everything duckling "
    "sibling dumpling lining netting paneling plumbing roofing".split())


def _is_verb(word: str) -> bool:
    # caption relations are overwhelmingly present participles
    # ("riding", "sitting on") or simple 3rd-person forms ("rides")
    return (len(word) > 4 and word.endswith("ing")
            and word not in _ING_NOUNS)


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

    def raw_map(self) -> dict:
        """stem -> a surface form that produced it; the synonym table is
        keyed on vocabulary words, not stems."""
        out: dict = {}
        for o in self.objects:
            out.setdefault(porter_stem(o), o)
        for n, a in self.attributes:
            out.setdefault(porter_stem(n), n)
            out.setdefault(porter_stem(a), a)
        for s, r, o in self.relations:
            for w in (s, r, o):
                out.setdefault(porter_stem(w), w)
        return out


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


def _slot_match(hs: str, rs: str, synonyms, hyp_raw: dict,
                ref_raw: dict) -> bool:
    """SPICE's per-word match on STEM slots: stem equality OR WordNet
    synset overlap of the underlying surface forms (SpiceScorer's
    similarTo — lemma match via intersecting synsets)."""
    if hs == rs:
        return True
    sa = synonyms.synsets(hyp_raw.get(hs, hs))
    return bool(sa) and not sa.isdisjoint(
        synonyms.synsets(ref_raw.get(rs, rs)))


def _match_count(hyp_t: set, ref_t: set, synonyms, hyp_raw: dict,
                 ref_raw: dict) -> int:
    """Exact stemmed intersection plus greedy bipartite synonym matching
    over the remainder (sorted iteration — deterministic across interpreter
    runs); each reference tuple is consumed at most once."""
    exact = hyp_t & ref_t
    matched = len(exact)
    used: set = set(exact)
    for h in sorted(hyp_t - exact):
        for r in sorted(ref_t):
            if r in used or len(r) != len(h) or r[0] != h[0]:
                continue  # r[0] is the category tag ("o"/"a"/"r")
            if all(_slot_match(hw, rw, synonyms, hyp_raw, ref_raw)
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
    hyp_t = hyp.all_tuples()
    ref_t: set = set()
    parsed_refs = [parse_caption(ref) for ref in references]
    for pr in parsed_refs:
        ref_t |= pr.all_tuples()
    if not hyp_t or not ref_t:
        return 0.0
    if synonyms is None:
        matched = len(hyp_t & ref_t)
    else:
        # same stemmed tuple sets (identical P/R denominators with or
        # without a table — the table can only ADD matches); the raw maps
        # recover surface forms for synset lookups
        ref_raw: dict = {}
        for pr in parsed_refs:
            for k, v in pr.raw_map().items():
                ref_raw.setdefault(k, v)
        matched = _match_count(hyp_t, ref_t, synonyms, hyp.raw_map(),
                               ref_raw)
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
