"""Phraselet templates and candidate-edge (triple) extraction.

Re-expresses the reference's phraselet templates faithfully — the 12
EN relation templates with their dependency-label AND part-of-speech
gates (reference: en language_specific_rules.py:1114-1325), the 6
question templates (:1247-1312), the reverse-only markers
(parsing.py:512-515) and the reverse-only parent lemmas (:834-845) —
and the corpus-side extraction walk (reference: parsing.py:1703-2306)
as a pure doc-local function over our normalized parse, suitable for
Arrow-batch execution inside ``mapInPandas``.

Each relation phraselet instance is a candidate (subj, pred, obj) edge:
``pred`` = the parent (predicate) derived lemma, ``subj``/``obj`` per
template; the phraselet label format ``template: parent-child`` matches
the reference's (e.g. ``predicate-actor: grow-plant``,
reference parsing.py:558, tests/en/test_phraselet_production_EN.py).

The reference gates each template on PTB tags; our deterministic
parser produces coarse POS, so the gates are mapped:
FW/NN/NNP/NNPS/NNS → {NOUN, PROPN}; VB..VBZ → {VERB} (plus AUX where
the reference's verb tags cover copulas); JJ/JJR/JJS/VBN/RB/RBR/RBS →
{ADJ, ADV}; CD → {NUM}; IN → {ADP}; WP/WRB → initial question words.
"""

from __future__ import annotations

_NOUNS = frozenset({"NOUN", "PROPN"})
_NV = frozenset({"NOUN", "PROPN", "VERB"})
# reference VB* parent tags cover copular/auxiliary tokens too (spaCy
# tags 'is'/'has' VBZ even when pos_ is AUX), so predicate templates
# admit AUX parents — the reverse-only parent-lemma list then marks
# be/have/do-parented phraselets reverse-only (en rules :834-845)
_NVA = frozenset({"NOUN", "PROPN", "VERB", "AUX"})
_ADJS = frozenset({"ADJ", "ADV"})
_WP = frozenset({"who", "whom", "what"})
_WRB = frozenset({"where", "when", "why", "how"})

# (label, dep labels, parent POS gate, child POS gate, reverse_only)
# — transcription of the reference's PhraseletTemplate list, in the
# reference's order (en language_specific_rules.py:1114-1325).
RELATION_TEMPLATES_EN: list[tuple[str, frozenset, frozenset, frozenset, bool]] = [
    ("predicate-actor", frozenset({"nsubj", "csubj", "pobjb", "advmodsubj"}),
     _NVA, _NOUNS, False),
    ("predicate-patient", frozenset({"dobj", "relant", "advmodobj", "xcomp"}),
     _NVA, _NV, False),
    ("word-ofword", frozenset({"pobjo", "poss"}), _NVA, _NV, False),
    ("predicate-toughmovedargument", frozenset({"arg"}), _NVA, _NOUNS, False),
    ("predicate-passivesubject", frozenset({"nsubjpass", "csubjpass"}),
     _NVA, _NOUNS, False),
    # copulas are AUX in our coarse tags but VBZ/VBD… in the reference's
    ("be-attribute", frozenset({"attr"}), frozenset({"VERB", "AUX"}),
     _NOUNS, True),
    ("predicate-recipient", frozenset({"dative", "pobjt"}), _NVA, _NOUNS, False),
    ("governor-adjective",
     frozenset({"acomp", "amod", "advmod", "npmod", "advcl", "dobj"}),
     _NVA, _ADJS, False),
    ("noun-noun", frozenset({"nmod", "appos", "compound", "nounmod"}),
     _NOUNS, _NOUNS, False),
    ("number-noun", frozenset({"nummod"}), _NOUNS, frozenset({"NUM"}), False),
    ("prepgovernor-noun", frozenset({"pobjp"}), _NVA, _NOUNS, False),
    ("prep-noun", frozenset({"pobj", "pcomp"}), frozenset({"ADP"}),
     _NOUNS, True),
]

# question templates (child = initial question word; reference
# en language_specific_rules.py:1247-1312): (label, deps, parent gate,
# question words admitted as child)
QUESTION_TEMPLATES_EN: list[tuple[str, frozenset, frozenset, frozenset]] = [
    ("head-WHattr", frozenset({"attr"}), frozenset({"VERB", "AUX"}), _WP),
    ("head-WHsubj", frozenset({"nsubj", "nsubjpass", "pobjb"}),
     frozenset({"VERB"}), _WP),
    ("head-WHobj", frozenset({"dobj", "pobjo"}), frozenset({"VERB"}), _WP),
    ("head-WHadv", frozenset({"advmod", "wh_wildcard"}), _NV, _WRB),
    ("headprep-WH", frozenset({"pobjp"}), _NV, _WP),
    ("headprepto-WH", frozenset({"pobjt"}), _NV, _WP),
]

# German templates — the reference's DE list has DIFFERENT names and
# groupings (de language_specific_rules.py:1697-1960): verb-nom
# (sb/pobjb), verb-acc (oa/pobjo/ag/og/oc), verb-dat (da), verb-pd
# (pd, reverse-only), noun-dependent (nk: nominal, adjectival AND
# numeral children of nouns), verb-adverb (mo/moposs/oc),
# prepgovernor-noun, prep-noun (reverse-only), verb-toughmovedargument
# (arg), intcompound. Mapped over OUR dep labels:
RELATION_TEMPLATES_DE: list[tuple[str, frozenset, frozenset, frozenset, bool]] = [
    # haben/sein/werden carry AUX in our coarse tags but head full
    # relations ("Der Esel HAT ein Dach" — VAFIN sb/oa in the
    # reference parse), so the parent gates admit AUX like EN
    ("verb-nom", frozenset({"nsubj", "csubj", "pobjb", "advmodsubj"}),
     _NVA, _NOUNS, False),
    ("verb-acc", frozenset({"dobj", "pobjo", "poss", "nsubjpass", "relant",
                            "advmodobj"}), _NVA, _NOUNS, False),
    ("verb-dat", frozenset({"dative", "pobjt"}),
     frozenset({"VERB", "AUX"}), _NOUNS, False),
    ("verb-pd", frozenset({"attr"}), frozenset({"VERB", "AUX"}),
     _NOUNS, True),
    ("noun-dependent",
     frozenset({"amod", "compound", "nummod", "nmod", "appos"}),
     _NOUNS, _NOUNS | _ADJS | frozenset({"NUM"}), False),
    # 'mo'/'moposs' adverbials; predicative adjectives reach nouns via
    # the amod rewrite (→ noun-dependent, so acomp is not mapped here).
    # AUX parents: the reference gate lists VAFIN/VAIMP/VAINF/VAPP
    # ("Immer HAT er es" → verb-adverb: haben-immer, de rules :1812)
    ("verb-adverb", frozenset({"advmod"}),
     frozenset({"VERB", "AUX"}), _ADJS, False),
    ("prepgovernor-noun", frozenset({"pobjp"}), _NV, _NOUNS, False),
    ("prep-noun", frozenset({"pobj", "pcomp"}), frozenset({"ADP"}),
     _NOUNS, True),
    ("verb-toughmovedargument", frozenset({"arg"}),
     frozenset({"VERB", "AUX"}), _NOUNS, False),
]

# DE question templates (head-WHnom/WHacc/WHdat/WHadv,
# de language_specific_rules.py:1916-1957)
QUESTION_TEMPLATES_DE: list[tuple[str, frozenset, frozenset, frozenset]] = [
    ("head-WHnom", frozenset({"nsubj", "pobjb"}),
     frozenset({"VERB", "AUX"}), frozenset({"wer", "was"})),
    ("head-WHacc", frozenset({"dobj"}), frozenset({"VERB"}),
     frozenset({"wen", "was"})),
    ("head-WHdat", frozenset({"dative"}), frozenset({"VERB"}),
     frozenset({"wem"})),
    ("head-WHadv", frozenset({"advmod"}), frozenset({"VERB"}),
     frozenset({"wo", "wohin", "womit", "woher", "wodurch", "wann",
                "warum", "wieso", "weshalb", "wie"})),
]

# templates where the child is the semantic subject of the triple
ACTOR_TEMPLATES = {"predicate-actor", "verb-nom"}

# phraselets whose template is reverse-only never initiate matching
REVERSE_ONLY_TEMPLATES = {t[0] for t in RELATION_TEMPLATES_EN if t[4]} \
    | {t[0] for t in RELATION_TEMPLATES_DE if t[4]}

# parent lemma/POS pairs that force reverse-only during topic matching
# (reference en language_specific_rules.py:834-845)
REVERSE_ONLY_PARENT_LEMMAS = {
    ("be", "VERB"), ("be", "AUX"), ("have", "VERB"), ("have", "AUX"),
    ("do", "VERB"), ("say", "VERB"), ("go", "VERB"), ("get", "VERB"),
    ("make", "VERB"),
    # German equivalents (de language_specific_rules.py:1585-1594:
    # sein/werden/haben AUX, sagen/machen/tun/haben/werden VERB)
    ("sein", "VERB"), ("sein", "AUX"), ("haben", "VERB"), ("haben", "AUX"),
    ("werden", "VERB"), ("werden", "AUX"),
    ("machen", "VERB"), ("sagen", "VERB"), ("tun", "VERB"),
}

# lemmas suppressed in topic phraselets (reference en rules :830-831 +
# de rules :1583: dann/danach/so/ich/mein); pronoun stop tags PRP/PRP$/
# PPER/PRF are handled by the matchability flag upstream
STOP_LEMMAS = {"then", "therefore", "so",
               "dann", "danach", "ich", "mein"}

# single-word phraselet: noun tags only (reference 'word' template,
# language_specific_rules.py:1313-1325)
WORD_TEMPLATE_POS = {"NOUN", "PROPN"}


def _lemma_replacement_indicated(existing_pos: str, existing_lemma: str,
                                 new_pos: str, new_lemma: str) -> bool:
    """Reference lemma_replacement_indicated (parsing.py:1808-1833):
    the phraselet's plain lemma follows the preferred (nominal)
    reading — NOUN/PROPN beats other POS; ties break to the shorter
    lemma. Derived lemmas (and so labels) are unaffected."""
    if existing_pos not in WORD_TEMPLATE_POS and new_pos in WORD_TEMPLATE_POS:
        return True
    if existing_pos in WORD_TEMPLATE_POS and new_pos not in WORD_TEMPLATE_POS:
        return False
    return len(new_lemma) < len(existing_lemma)


def _onto_text_pref(tok: dict, repr_: str,
                    ontology_words: frozenset[str] | None) -> str:
    """Ontology text-form preference (reference get_lemmas_from_index,
    parsing.py:1776-1786): when an ontology is loaded and the token's
    LEMMA is not an ontology word but its surface text is, the pole
    uses the text form — 'He saw rainbows' produces word: rainbows
    (ontology entry), not word: rainbow (ref production EN :196-206)."""
    if ontology_words is not None \
            and tok["lemma"] not in ontology_words \
            and tok["text"].lower() in ontology_words:
        return tok["text"].lower()
    return repr_


def _repr_of(tok: dict) -> str:
    """Derived-lemma representation, multiword-substituted when the
    token heads an entity multiword (reference parsing.py:1534-1588 and
    multiword substitution during phraselet extraction,
    parsing.py:2036-2066)."""
    if len(tok["multiwords"]) > 0:
        return tok["multiwords"][0]["derived_lemma"]
    return tok["derived_lemma"]


def _disp_of(tok: dict) -> str:
    """Display lemma for word-match explanation strings — the PLAIN
    lemma (multiword-substituted), not the derived one: the reference
    renders ``search_phrase_token._.holmes.lemma`` into explanations
    (word_matching/direct.py:36, ontology.py:77), so query 'gives'
    explains as 'Matches GIVE directly.' even though the phraselet
    pole repr is the derived lemma 'gift'."""
    if len(tok["multiwords"]) > 0:
        return tok["multiwords"][0]["lemma"]
    return tok["lemma"]


def _multiword_member_indexes(toks: list[dict]) -> set[int]:
    """Non-head members of the CHOSEN multiword per head token —
    excluded from phraselet production (reference
    token_indexes_within_multiwords_to_ignore, parsing.py:2036-2066).
    Only the substituted multiword's members are ignored: an
    ontology-defined multiword ('pranaya jones') beats the wider
    entity span ('richard pranaya jones'), leaving 'richard' to
    produce its own phraselets (the parser orders ontology multiwords
    first, mirroring the reference's odm-before-edm preference)."""
    ignore: set[int] = set()
    for t in toks:
        if len(t["multiwords"]) > 0:
            for i in t["multiwords"][0]["token_indexes"]:
                if i != t["i"]:
                    ignore.add(i)
    return ignore


def extract_candidate_edges(parsed: dict, lang: str,
                            include_questions: bool = False,
                            ontology_words: frozenset[str] | None = None
                            ) -> list[dict]:
    """All relation-phraselet instances of one parsed document
    (reference add_phraselets_to_dict relation walk,
    parsing.py:2106-2243).

    Returns dicts with keys: template, pred (parent derived lemma),
    subj, obj, label, parent_idx, child_idx, negated, uncertain,
    involves_coref, reverse_only.

    ``include_questions`` mirrors the reference's
    ``process_initial_question_words`` flag: interrogative children are
    admitted only in question-answering mode.
    """
    toks = parsed["tokens"]
    if lang == "de":
        templates = RELATION_TEMPLATES_DE
        q_templates = QUESTION_TEMPLATES_DE
    else:
        templates = RELATION_TEMPLATES_EN
        q_templates = QUESTION_TEMPLATES_EN
    mw_ignore = _multiword_member_indexes(toks)
    _ALL_Q_WORDS = {w for (_n, _d, _p, ws) in q_templates for w in ws}
    out: list[dict] = []
    seen: set[tuple] = set()

    def _variants(tok: dict) -> list[tuple[str, bool]]:
        """(repr, matching_only) for one pole: the whole token, plus —
        for German compounds — the head subword (the reference adds
        head subwords to the parent/child index lists, so e.g.
        'Landschaftsgärtner gibt' emits BOTH verb-nom:
        gabe-landschaftsgärtner and verb-nom: gabe-gärtner;
        reference parsing.py:2009-2034 + tests/de/
        test_phraselet_production_DE.py:112-135). An entity-multiword
        head ALSO exposes its own lemma as a matching-only variant
        (the reference's word matching compares every direct repr of
        the head token, so phraselet come-hudson matches doc 'Richard
        Paul Hudson came'; the variant row is flagged so KG output
        keeps only the produced phraselet)."""
        borrowed_any = any(bool(sw.get("borrowed"))
                           for sw in tok["subwords"])
        reprs = []
        if not borrowed_any:
            r0 = _repr_of(tok)
            if len(tok["multiwords"]) == 0:
                r0 = _onto_text_pref(tok, r0, ontology_words)
            reprs.append((r0, False, -1))
            if len(tok["multiwords"]) > 0 \
                    and tok["derived_lemma"] != _repr_of(tok):
                reprs.append((tok["derived_lemma"], True, -1))
        # whole words involved in subword conjunction are partial
        # hyphenated fragments — only an OWN head subword can stand in
        # as a relation pole (reference parsing.py:2009-2034
        # add_head_subwords_to_token_list_and_remove_words_with_
        # subword_conjunction)
        if len(tok["subwords"]) > 0:  # len(): Arrow batches give ndarrays
            head = tok["subwords"][-1]
            if not bool(head.get("borrowed")) \
                    and head["derived_lemma"] not in [r for (r, _m, _s)
                                                      in reprs]:
                # head-subword variant: the pole anchors on the PART
                reprs.append((head["derived_lemma"], False,
                              int(head["idx"])))
        return reprs

    def _is_person(tok: dict) -> bool:
        from ..nlp.lexicon import PERSON_NOUNS_DE, PERSON_NOUNS_EN
        nouns = PERSON_NOUNS_DE if lang == "de" else PERSON_NOUNS_EN
        return bool(tok["ent_type"] == "PERSON" or tok["lemma"] in nouns)

    def _is_gendered(tok: dict) -> bool:
        """The reference's who-gate: PERSON-ish entity type, a
        morph-gendered noun, or a gendered pronoun somewhere in the
        token's coreference chain (en language_specific_rules.py:
        1338-1363 — 'A doctor spoke.' does NOT answer 'who', but
        'There came a doctor. He spoke.' does)."""
        from ..nlp.lexicon import GENDERED_NOUNS_EN, PERSON_NOUNS_DE
        if tok["ent_type"] in ("PERSON", "NORP", "ORG", "GPE",
                               "PER"):  # PER = the spaCy de label
            return True
        if lang == "de":
            return bool(tok["lemma"] in PERSON_NOUNS_DE)
        if tok["lemma"] in GENDERED_NOUNS_EN:
            return True
        gp = {"he", "him", "himself", "she", "her", "herself"}
        return any(toks[i]["text"].lower() in gp
                   for i in tok["coref_chain"])

    def emit(template: str, parent: dict, parent_repr: str,
             child_repr: str, child_idx: int,
             negated: bool, uncertain: bool, coref: bool,
             reverse_only: bool, mention: bool = False,
             prep: str | None = None, prep_case: str | None = None,
             parent_sub: int = -1, child_sub: int = -1) -> None:
        key = (template, parent["i"], parent_repr, child_repr)
        if key in seen:
            return
        seen.add(key)
        label = f"{template}: {parent_repr}-{child_repr}"
        if template in ACTOR_TEMPLATES:
            subj, obj = child_repr, parent_repr
        else:
            subj, obj = parent_repr, child_repr
        out.append({
            "template": template, "label": label,
            "pred": parent_repr, "subj": subj, "obj": obj,
            "pred_disp": _disp_of(parent),
            "child_disp": _disp_of(toks[child_idx]),
            "parent_idx": parent["i"], "child_idx": child_idx,
            "negated": negated, "uncertain": uncertain,
            "involves_coref": coref, "reverse_only": reverse_only,
            "child_is_person": _is_person(toks[child_idx]),
            "child_is_gendered": _is_gendered(toks[child_idx]),
            "mention": mention, "prep": prep, "prep_case": prep_case,
            "parent_sub": parent_sub, "child_sub": child_sub,
        })

    for d in parsed["deps"]:
        p, c = toks[d["parent"]], toks[d["child"]]
        if p["i"] in mw_ignore or c["i"] in mw_ignore:
            continue
        if p["derived_lemma"] in STOP_LEMMAS or c["derived_lemma"] in STOP_LEMMAS:
            continue
        # parent must be matchable; child matchable or an admitted
        # initial question word (reference parsing.py:2147-2160)
        if not p["is_matchable"]:
            continue
        parent_reverse = (p["lemma"], p["pos"]) in REVERSE_ONLY_PARENT_LEMMAS
        for (name, dep_labels, parent_gate, child_gate, tmpl_reverse) in templates:
            if d["label"] not in dep_labels:
                continue
            if p["pos"] not in parent_gate or c["pos"] not in child_gate:
                continue
            if not c["is_matchable"]:
                continue
            for (pr, pm, ps) in _variants(p):
                for (cr, cm, cs) in _variants(c):
                    emit(name, p, pr, cr, c["i"],
                         p["is_negated"] or c["is_negated"], d["uncertain"],
                         d["coref"], tmpl_reverse or parent_reverse,
                         mention=bool(d.get("mention")) or pm or cm,
                         prep=d.get("prep"),
                         prep_case=d.get("prep_case"),
                         parent_sub=ps, child_sub=cs)
        # matching-only: a gerund prepositional complement ("managed it
        # BY WORKING hard") — no reference phraselet (VBG child fails
        # the prepgovernor child tags) but the how-question answer
        # matches at this dependency (reference question word matching,
        # en rules :1425-1429)
        if d["label"] in ("pobjp", "advcl") and c["pos"] in ("VERB", "AUX") \
                and d.get("prep") and c["is_matchable"]:
            emit("prepgovernor-verb", p, _repr_of(p), _repr_of(c), c["i"],
                 p["is_negated"] or c["is_negated"], d["uncertain"],
                 d["coref"], False, mention=True, prep=d.get("prep"),
                 prep_case=d.get("prep_case"))
        if include_questions and c["is_initial_question_word"]:
            for (name, dep_labels, parent_gate, q_words) in q_templates:
                if d["label"] not in dep_labels:
                    continue
                if p["pos"] not in parent_gate:
                    continue
                if c["text"].lower() not in q_words:
                    continue
                emit(name, p, _repr_of(p), c["derived_lemma"], c["i"],
                     p["is_negated"], d["uncertain"], d["coref"], False,
                     mention=bool(d.get("mention")), prep=d.get("prep"),
                     prep_case=d.get("prep_case"))
        elif c["text"].lower() in _ALL_Q_WORDS:
            # CORPUS-side question words: a document's own interrogative
            # matches a question phraselet's WH pole LITERALLY and is
            # then scored as a plain relation, never as an answer
            # (reference topic_matching.py:965-975 keeps relation_score
            # when the document token carries an interrogative tag;
            # tests/en/test_questions_EN.py:392-396). Matching-only
            # rows — mention=True keeps them out of KG output.
            for (name, dep_labels, parent_gate, q_words) in q_templates:
                if d["label"] not in dep_labels:
                    continue
                if p["pos"] not in parent_gate:
                    continue
                if c["text"].lower() not in q_words:
                    continue
                emit(name, p, _repr_of(p), c["derived_lemma"], c["i"],
                     p["is_negated"], d["uncertain"], d["coref"], False,
                     mention=True, prep=d.get("prep"),
                     prep_case=d.get("prep_case"))

    # German subword relations (intcompound): compound parts form an
    # edge governor-part → dependent-part within the containing token
    # (reference de language_specific_rules.py:1697-1960; subword walk
    # parsing.py:2245-2306)
    if lang == "de":
        for t in toks:
            for sw in t["subwords"]:
                if sw["dependent"] < 0 or not t["is_matchable"]:
                    continue
                gov_sw = t["subwords"][sw["idx"]]
                dep_sw = t["subwords"][sw["dependent"]]
                if bool(gov_sw.get("borrowed")) \
                        and bool(dep_sw.get("borrowed")):
                    # both parts were DISTRIBUTED into this conjunct
                    # from its neighbour ("…maßnahmen und -raketenlöwe"
                    # shares information+extraktion into the right
                    # word): the edge already exists on the owning
                    # token — re-emitting it would double the
                    # classification frequency (reference counts
                    # 'intcompound: extraktion-information' ONCE,
                    # de classification suite :196-229)
                    continue
                label = f"intcompound: {gov_sw['derived_lemma']}-{dep_sw['derived_lemma']}"
                key = ("intcompound", t["i"], sw["idx"], sw["dependent"])
                if key in seen:
                    continue
                seen.add(key)
                out.append({
                    "template": "intcompound", "label": label,
                    "pred": gov_sw["derived_lemma"],
                    "subj": gov_sw["derived_lemma"],
                    "obj": dep_sw["derived_lemma"],
                    "pred_disp": gov_sw["lemma"],
                    "child_disp": dep_sw["lemma"],
                    "parent_idx": t["i"], "child_idx": t["i"],
                    "negated": t["is_negated"], "uncertain": False,
                    "involves_coref": False, "reverse_only": False,
                    "child_is_person": False, "child_is_gendered": False,
                    "mention": False,
                    "prep": None, "prep_case": None,
                    "parent_sub": int(sw["idx"]),
                    "child_sub": int(sw["dependent"]),
                })
    return out


def extract_word_phraselets(parsed: dict, lang: str,
                            match_all_words: bool = False,
                            per_occurrence: bool = False,
                            ontology_words: frozenset[str] | None = None
                            ) -> list[dict]:
    """Single-word phraselets (template 'word') over matchable
    noun-tagged tokens — the reference's single-word topic phraselets
    (parsing.py:1955-2006, label e.g. ``word: plant``). Non-head
    members of multiwords are excluded (the multiword substitutes for
    its head); compounds and possessors DO get their own entries
    (reference tests: "A hobby plant" → word: plant, word: hobby).
    Subword (German compound-part) entries are produced only in
    ``match_all_words`` mode, mirroring the reference
    (parsing.py:2085-2095; tests/de/test_phraselet_production_DE.py
    expects word: landschaftsgärtner but NOT word: gärtner)."""
    toks = parsed["tokens"]
    mw_ignore = _multiword_member_indexes(toks)
    out = []
    seen: dict[str, dict] = {}
    for t in toks:
        if t["i"] in mw_ignore:
            # multiword MEMBERS are excluded from the tag-matched pass
            # (the multiword substitutes for them, reference
            # parsing.py:2036-2066) but the all-words pass still
            # produces an any-tag phraselet per member — the
            # superfluous-by-multiword filter suppresses them at
            # scoring only when the containing multiword also matched
            # (reference topic_matching.py:760-795: "Richard Paul came"
            # scores the any-tag members against a document that lacks
            # the exact multiword)
            if match_all_words and t["is_matchable"]:
                r = t["derived_lemma"]
                if r not in STOP_LEMMAS and (per_occurrence
                                             or r not in seen):
                    entry = {"template": "word", "label": f"word: {r}",
                             "word": r, "disp": t["lemma"], "idx": t["i"],
                             "negated": t["is_negated"], "any_tag": True,
                             "span_start": t["i"], "span_end": t["i"],
                             "subword_idx": -1}
                    seen[r] = entry
                    out.append(entry)
            continue
        if any(sw.get("borrowed") for sw in t["subwords"]):
            # whole single words involved in subword conjunction are
            # partial words including hyphens (reference
            # parsing.py:2076-2090) — only their subwords participate
            if match_all_words:
                for sw in t["subwords"]:
                    if sw.get("borrowed"):
                        continue
                    r = sw["derived_lemma"]
                    if per_occurrence or r not in seen:
                        entry = {"template": "word",
                                 "label": f"word: {r}", "word": r,
                                 "disp": sw["lemma"], "idx": t["i"],
                                 "negated": t["is_negated"],
                                 "any_tag": True,
                                 "span_start": t["i"],
                                 "span_end": t["i"],
                                 "subword_idx": sw["idx"]}
                        seen[r] = entry
                        out.append(entry)
            continue
        # per_occurrence builds the DOCUMENT-side word index, and the
        # reference's reverse dict indexes every token with no
        # matchability gate (word_matching/direct.py:120-143: `for
        # token in doc`) — so an auxiliary 'has' still single-word-
        # matches a query's matchable 'have' (ref
        # test_topic_matching_EN.py:269 expects the aux contribution).
        # Matchability gates phraselet PRODUCTION (parsing.py:1967)
        # and the search-phrase side only. Tokens whose repr can never
        # appear as a query phraselet (determiners, generic pronouns —
        # unmatchable in every syntactic context) are still skipped to
        # keep the index lean at corpus scale.
        indexable = t["is_matchable"] or (
            per_occurrence and t["dep"] in ("aux", "auxpass")
            and t["pos"] in ("AUX", "VERB"))
        if (t["pos"] in WORD_TEMPLATE_POS or match_all_words) and indexable:
            # match-all QUERY production ignores multiwords — the head
            # keeps its own lemma and members get any-tag entries
            # (reference parsing.py:1972-1977 gates the substitution on
            # `not match_all_words`; 'Richard Paul Hudson kam' yields
            # word: richard/paul/hudson/kommen, ref production DE :210).
            # The per_occurrence CORPUS table keeps the multiword row —
            # it is the document-side index the word branch probes.
            mw_skip = (match_all_words and not per_occurrence
                       and len(t["multiwords"]) > 0)
            r = t["derived_lemma"] if mw_skip else _repr_of(t)
            if len(t["multiwords"]) == 0:
                r = _onto_text_pref(t, r, ontology_words)
            if r not in STOP_LEMMAS:
                # any_tag marks words admitted only by the all-words
                # pass (reference: phraselets 'created without matching
                # tags' score single_word_any_tag_score,
                # parsing.py:2442-2457 + topic_matching scoring); a
                # tag-checked occurrence anywhere upgrades the entry.
                # In per_occurrence mode (the CORPUS words table, not
                # query phraselet production) every occurrence is its
                # own row — the reference matches a single-word
                # phraselet at each corpus position, and the activation
                # model refreshes on the repeats
                prev = None if per_occurrence else seen.get(r)
                if prev is None:
                    if len(t["multiwords"]) > 0 and not mw_skip:
                        span = (min(t["multiwords"][0]["token_indexes"]),
                                max(t["multiwords"][0]["token_indexes"]))
                    else:
                        span = (t["i"], t["i"])
                    disp = _disp_of(t)
                    if len(t["multiwords"]) == 0:
                        disp = _onto_text_pref(t, disp, ontology_words)
                    entry = {"template": "word", "label": f"word: {r}",
                             "word": r, "disp": disp, "idx": t["i"],
                             "pos": t["pos"],
                             "negated": t["is_negated"],
                             "any_tag": t["pos"] not in WORD_TEMPLATE_POS,
                             "span_start": span[0], "span_end": span[1],
                             "subword_idx": -1}
                    seen[r] = entry
                    out.append(entry)
                else:
                    if prev["any_tag"] and t["pos"] in WORD_TEMPLATE_POS:
                        prev["any_tag"] = False
                    # plain-lemma preference on label collisions
                    # (reference lemma_replacement_indicated,
                    # parsing.py:1808-1833): noun lemmas beat verbal
                    # ones ('allowances' then 'to allow' keeps lemma
                    # allowance under label word: allow), shorter wins
                    # at equal pos preference ('behavior' < 'behaviour')
                    disp = _disp_of(t)
                    if len(t["multiwords"]) == 0:
                        disp = _onto_text_pref(t, disp, ontology_words)
                    if _lemma_replacement_indicated(
                            prev.get("pos", ""), prev["disp"],
                            t["pos"], disp):
                        prev["disp"] = disp
                        prev["pos"] = t["pos"]
                # the head token of a multiword ALSO yields its own
                # word as an any-tag entry in the all-words pass — the
                # reference substitutes the multiword only when NOT
                # match_all_words (parsing.py:1972-1977), so "Richard
                # Paul came" produces word: paul alongside
                # word: richard paul
                if match_all_words and len(t["multiwords"]) > 0 \
                        and t["derived_lemma"] not in STOP_LEMMAS \
                        and (per_occurrence
                             or t["derived_lemma"] not in seen):
                    entry = {"template": "word",
                             "label": f"word: {t['derived_lemma']}",
                             "word": t["derived_lemma"], "disp": t["lemma"],
                             "idx": t["i"],
                             "negated": t["is_negated"], "any_tag": True,
                             "span_start": t["i"], "span_end": t["i"],
                             "subword_idx": -1}
                    seen[t["derived_lemma"]] = entry
                    out.append(entry)
        if match_all_words:
            for sw in t["subwords"]:
                if sw.get("borrowed"):
                    # conjunction-distributed copy — its own token
                    # yields the entry (reference parsing.py:2092-2095)
                    continue
                r = sw["derived_lemma"]
                if per_occurrence or r not in seen:
                    entry = {"template": "word", "label": f"word: {r}",
                             "word": r, "disp": sw["lemma"], "idx": t["i"],
                             "negated": t["is_negated"],
                             "any_tag": True,
                             "span_start": t["i"], "span_end": t["i"],
                             "subword_idx": sw["idx"]}
                    seen[r] = entry
                    out.append(entry)
    return out


def replace_with_hypernym_ancestors(
        rels: list[dict], words: list[dict],
        ancestors: dict[str, str]) -> tuple[list[dict], list[dict]]:
    """Replace each phraselet pole with its most-general hypernym
    ancestor and re-deduplicate by label (the reference's
    replace_with_hypernym_ancestors mode, parsing.py:2427-2440 +
    classification phraselet generalization, classification.py:384-397:
    'A dog progresses' → predicate-actor: progress-animal)."""
    out_r: dict[str, dict] = {}
    for p in rels:
        pred = ancestors.get(p["pred"], p["pred"])
        subj = ancestors.get(p["subj"], p["subj"])
        obj = ancestors.get(p["obj"], p["obj"])
        child = subj if p["template"] in ACTOR_TEMPLATES else obj
        label = f"{p['template']}: {pred}-{child}"
        q = {**p, "pred": pred, "subj": subj, "obj": obj, "label": label}
        out_r.setdefault(label, q)
    out_w: dict[str, dict] = {}
    for w in words:
        word = ancestors.get(w["word"], w["word"])
        label = f"word: {word}"
        out_w.setdefault(label, {**w, "word": word, "label": label})
    return list(out_r.values()), list(out_w.values())


def extract_phraselets(parsed: dict, lang: str, *,
                       match_all_words: bool = False,
                       include_reverse_only: bool = False,
                       include_questions: bool = False,
                       ontology_words: frozenset[str] | None = None
                       ) -> tuple[list[dict], list[dict]]:
    """Relation + single-word phraselets with the reference's
    add_phraselets_to_dict gating (parsing.py:1703-2307): matching-only
    (mention) rows dropped, reverse-only templates AND reverse-only
    parent lemmas suppressed unless ``include_reverse_only``, and the
    reference's empty-dict fallback — when nothing was produced and
    ``match_all_words`` is off, every matchable non-stop token yields
    an any-tag word phraselet (parsing.py:2302-2307, the path that
    gives 'Immer hat er es' its word: haben / word: immer)."""
    rels = [r for r in extract_candidate_edges(
                parsed, lang, include_questions=include_questions,
                ontology_words=ontology_words)
            if not r.get("mention")]
    if not include_reverse_only:
        rels = [r for r in rels
                if r["template"] not in REVERSE_ONLY_TEMPLATES
                and not r["reverse_only"]]
    words = extract_word_phraselets(parsed, lang,
                                    match_all_words=match_all_words,
                                    ontology_words=ontology_words)
    if not rels and not words and not match_all_words:
        words = extract_word_phraselets(parsed, lang,
                                        match_all_words=True,
                                        ontology_words=ontology_words)
        for w in words:
            w["any_tag"] = True
    return rels, words


def ontology_reverse_derivation_map(ontology_words: set[str],
                                    lang: str) -> dict[str, str]:
    """derived lemma → ontology word, for every ontology word whose
    derived form differs (reference get_ontology_reverse_derivational_
    dict, parsing.py:1616-1647; ties resolve to the alphabetically
    first word like the reference's sorted entry lists)."""
    from ..nlp.lemmatizer import derived_lemma
    m: dict[str, list[str]] = {}
    for w in ontology_words:
        d = " ".join(derived_lemma(p, lang) for p in w.lower().split())
        if d != w.lower():
            m.setdefault(d, []).append(w.lower())
    return {d: sorted(ws)[0] for d, ws in m.items()}


def apply_ontology_reverse_derivation(
        rels: list[dict], words: list[dict],
        m: dict[str, str]) -> tuple[list[dict], list[dict]]:
    """Rewrite phraselet poles through the reverse-derivation map (the
    reference applies it inside get_lemmas_from_index whenever an
    ontology is loaded, parsing.py:1787-1795: subword 'abflug' labels
    as the ontology's 'abfliegen')."""
    if not m:
        return rels, words
    out_r: dict[str, dict] = {}
    for p in rels:
        p = dict(p)
        parent = m.get(p["pred"], p["pred"])
        child_key = "subj" if p["template"] in ACTOR_TEMPLATES else "obj"
        child = m.get(p[child_key], p[child_key])
        p["pred"] = parent
        p[child_key] = child
        if p["template"] in ACTOR_TEMPLATES:
            p["obj"] = parent
        else:
            p["subj"] = parent
        p["label"] = f"{p['template']}: {parent}-{child}"
        out_r.setdefault(p["label"], p)
    out_w: dict[str, dict] = {}
    for w in words:
        w = dict(w)
        w["word"] = m.get(w["word"], w["word"])
        w["label"] = f"word: {w['word']}"
        if w["label"] in out_w and not w.get("any_tag"):
            out_w[w["label"]] = w  # tag-checked beats any-tag
        else:
            out_w.setdefault(w["label"], w)
    return list(out_r.values()), list(out_w.values())
