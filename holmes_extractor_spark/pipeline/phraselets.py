"""Phraselet templates and candidate-edge (triple) extraction.

Re-expresses the reference's relation phraselet templates (reference:
en language_specific_rules.py:1114-1325 — predicate-actor,
predicate-patient, predicate-recipient, governor-adjective, noun-noun,
prepgovernor-noun, word-ofword, …; German adds intcompound subword
relations, de language_specific_rules.py:1697-1960) and the corpus-side
phraselet extraction walk (reference: parsing.py:1703-2306) as a pure
doc-local function over our normalized parse, suitable for Arrow-batch
execution inside ``mapInPandas``.

Each relation phraselet instance is a candidate (subj, pred, obj) edge:
``pred`` = the parent (predicate) derived lemma, ``subj``/``obj`` per
template; the phraselet label format ``template: parent-child`` matches
the reference's (e.g. ``predicate-actor: grow-plant``,
reference parsing.py:558, tests/en/test_phraselet_production_EN.py).
"""

from __future__ import annotations

# semantic dep label → (template, role of child)
# role "actor" → child is the subject of the triple; "patient"/"attr"
# etc. → child is the object; parent is always the predicate.
TEMPLATES_EN: dict[str, str] = {
    "nsubj": "predicate-actor",
    "pobjb": "predicate-actor",          # passive agent
    "advmodsubj": "predicate-actor",
    "dobj": "predicate-patient",
    "nsubjpass": "predicate-patient",
    "relant": "predicate-patient",
    "advmodobj": "predicate-patient",
    "dative": "predicate-recipient",
    "amod": "governor-adjective",
    "advmod": "governor-adverb",
    "compound": "noun-noun",
    "nummod": "number-noun",
    "pobjp": "prepgovernor-noun",
    "wordof": "word-ofword",
    "attr": "be-attribute",
    "pobj-raw": "prep-noun",
    "toughobj": "predicate-toughmovedargument",
}

TEMPLATES_DE = dict(TEMPLATES_EN)
TEMPLATES_DE["intcompound"] = "intcompound"

# templates the reference marks reverse_only (high-fanout parents; they
# never *initiate* matching — reference parsing.py:512-515): used by the
# topic-matching planner, not excluded from extraction.
REVERSE_ONLY_TEMPLATES = {"be-attribute", "prep-noun"}

# single-word phraselet: matchable nouns (reference 'word' template is
# noun-tag gated, language_specific_rules.py:1114-1138)
WORD_TEMPLATE_POS = {"NOUN", "PROPN"}


def _repr_of(tok: dict) -> str:
    """Derived-lemma representation, multiword-substituted when the
    token heads an entity multiword (reference parsing.py:1534-1588 and
    multiword substitution during phraselet extraction)."""
    if len(tok["multiwords"]) > 0:
        return tok["multiwords"][0]["derived_lemma"]
    return tok["derived_lemma"]


def extract_candidate_edges(parsed: dict, lang: str) -> list[dict]:
    """All relation-phraselet instances of one parsed document.

    Returns dicts with keys: template, pred (parent derived lemma),
    subj, obj, label, parent_idx, child_idx, negated, uncertain,
    involves_coref.
    """
    toks = parsed["tokens"]
    templates = TEMPLATES_DE if lang == "de" else TEMPLATES_EN
    out: list[dict] = []
    seen: set[tuple] = set()

    def emit(template: str, parent: dict, child_repr: str, child_idx: int,
             negated: bool, uncertain: bool, coref: bool) -> None:
        parent_repr = _repr_of(parent)
        key = (template, parent["i"], child_repr)
        if key in seen:
            return
        seen.add(key)
        label = f"{template}: {parent_repr}-{child_repr}"
        if template in ("predicate-actor",):
            subj, obj = child_repr, parent_repr
        else:
            subj, obj = parent_repr, child_repr
        out.append({
            "template": template, "label": label,
            "pred": parent_repr, "subj": subj, "obj": obj,
            "parent_idx": parent["i"], "child_idx": child_idx,
            "negated": negated, "uncertain": uncertain,
            "involves_coref": coref,
        })

    for d in parsed["deps"]:
        template = templates.get(d["label"])
        if template is None:
            continue
        p, c = toks[d["parent"]], toks[d["child"]]
        if template == "prep-noun":
            # reverse-only preposition-noun phraselet: the preposition
            # is the (unmatchable-POS) parent — the reference exempts
            # it (prep-noun template, language_specific_rules.py:1114-
            # 1325, reverse_only per parsing.py:512-515)
            if not c["is_matchable"]:
                continue
        elif not p["is_matchable"] or not c["is_matchable"]:
            continue
        # skip the pronoun-side duplicate when a coref-linked dep exists
        emit(template, p, _repr_of(c), c["i"],
             p["is_negated"] or c["is_negated"], d["uncertain"], d["coref"])

    # German subword relations (intcompound): compound parts form an
    # edge part1 → part2 within the containing token
    if lang == "de":
        for t in toks:
            if len(t["subwords"]) == 2 and t["is_matchable"]:
                dep_sw, gov_sw = t["subwords"][0], t["subwords"][1]
                label = f"intcompound: {gov_sw['derived_lemma']}-{dep_sw['derived_lemma']}"
                key = ("intcompound", t["i"], dep_sw["derived_lemma"])
                if key not in seen:
                    seen.add(key)
                    out.append({
                        "template": "intcompound", "label": label,
                        "pred": gov_sw["derived_lemma"],
                        "subj": gov_sw["derived_lemma"],
                        "obj": dep_sw["derived_lemma"],
                        "parent_idx": t["i"], "child_idx": t["i"],
                        "negated": t["is_negated"], "uncertain": False,
                        "involves_coref": False,
                    })
    return out


def extract_word_phraselets(parsed: dict, lang: str) -> list[dict]:
    """Single-word phraselets (template 'word') over matchable nouns —
    the reference's single-word topic phraselets
    (parsing.py:1703-2306, label e.g. ``word: plant``)."""
    out = []
    seen = set()
    for t in parsed["tokens"]:
        if t["pos"] in WORD_TEMPLATE_POS and t["is_matchable"] and t["dep"] != "compound":
            r = _repr_of(t)
            if r not in seen:
                seen.add(r)
                out.append({"template": "word", "label": f"word: {r}",
                            "word": r, "idx": t["i"],
                            "negated": t["is_negated"]})
        for sw in t["subwords"]:
            r = sw["derived_lemma"]
            if r not in seen:
                seen.add(r)
                out.append({"template": "word", "label": f"word: {r}",
                            "word": r, "idx": t["i"],
                            "negated": t["is_negated"]})
    return out
