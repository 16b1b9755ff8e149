"""Deterministic tagger + dependency parser + semantic normalization.

This is the engine's stand-in for the reference's parse stack
(spaCy tok2vec/tagger/parser/ner + coreferee + the `holmes` pipe that
runs ~14 normalization passes, reference: parsing.py:974-1042). The
output contract per token mirrors the reference's HolmesDictionary
(reference: parsing.py:331-487): lemma, derived lemma, matching reprs,
semantic dependencies (incl. passive/agent normalization, conjunction
distribution, coreference-linked deps), negation, matchability,
multiword spans, mentions and (German) subwords.

Everything here is pure Python over small lists — it runs *vectorized
per Arrow batch* inside ``mapInPandas`` (one call per few thousand
docs), never as a per-row Spark UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import lexicon as L
from .lemmatizer import derived_lemma, lemma
from .tokenizer import SENT_END, sentences, tokenize, tokenize_full

PUNCT = set('.,!?;:()"')

# participle forms for passive detection (surface-level)
_IRREG_PARTICIPLES = {
    "seen", "given", "taken", "grown", "eaten", "caught", "bought",
    "sold", "made", "found", "held", "written", "sung", "flown",
    "driven", "met", "paid", "heard", "begun", "kept", "spoken",
    "spent", "won", "sent", "built", "cut", "thought", "known", "felt",
    "left", "brought", "taught", "woken", "worn", "broken", "thrown",
    "swum", "bitten", "fed", "put", "let", "done", "gone", "come",
}

_MALE_NAMES = {"richard", "paul", "peter", "hans", "john", "james",
               "michael", "thomas", "david", "robert"}
_FEMALE_NAMES = {"maria", "anna", "mary", "sarah", "laura", "julia",
                 "emma", "sophie", "jane", "hermione", "jana"}
_FIRST_NAMES = _MALE_NAMES | _FEMALE_NAMES | {
    "hudson", "smith", "jones", "miller", "müller",
}

# feminine person nouns for German possessive-determiner coreference
# (ihr/ihre → feminine antecedent; sein/seine → masculine/neuter)
_FEM_PERSON_NOUNS_DE = {"frau", "mutter", "schwester", "königin",
                        "prinzessin", "mädchen", "person"}

# German 3rd-person pronoun classes for the coreferee stand-in
# (reference consumes coreferee chains; DE morphology drives the
# gender/number compatibility there). 'sie' keeps the feminine gate
# for singular-person antecedents ("während Peter Müller und SIE…")
# but picks up conjunct groups like a plural ("Ein Hund hat SIE
# gejagt" after "eine Katze und eine Katze").
_DE_MASC_PRON = {"er", "ihn", "ihm", "dieser"}
_DE_NEUT_PRON = {"es", "das", "dieses"}
# NOTE: 'alle' tags PRON (quantifier subject) but never COREFERS —
# "Alle liebten ihn" must not chain alle→Riesenelefant
_DE_PLURAL_PRON = {"ihnen", "die", "diese"}
_DE_GROUP_PRON = _DE_PLURAL_PRON | {"sie"}

# subordinating conjunctions open a fresh clause ("…, while they were
# chasing a cat")
_SCONJ_EN = {"while", "because", "since", "unless", "until", "whereas"}

_PLACES = {"london", "berlin", "paris", "munich", "hamburg", "rome",
           "madrid", "vienna", "york", "england", "germany", "france",
           "prague", "norway"}

# tough-movement adjectives: "X is hard to VERB" → X is VERB's object
# (reference 'arg' dependency, en language_specific_rules.py:558-797)
_TOUGH_ADJS = {"hard", "easy", "difficult", "tough", "impossible",
               "simple", "tricky"}

# verbs licensing the English double-object construction ("gave the
# employee the file" → dative + dobj, reference 'dative' dep)
_DATIVE_VERBS = {"give", "send", "tell", "show", "offer", "lend",
                 "teach", "buy", "bring", "pay", "write", "promise",
                 "sell", "hand", "pass", "read", "sing"}


@dataclass
class Tok:
    i: int
    text: str
    lemma: str = ""
    derived_lemma: str = ""
    pos: str = "NOUN"
    tag: str = ""
    dep: str = "dep"
    head: int = -1
    ent_type: str = ""
    is_negated: bool = False
    is_matchable: bool = False
    is_initial_question_word: bool = False
    righthand_siblings: list[int] = field(default_factory=list)
    coref_chain: list[int] = field(default_factory=list)
    most_specific_coref: int = -1
    sent_idx: int = 0
    subwords: list[dict] = field(default_factory=list)
    multiwords: list[dict] = field(default_factory=list)
    # True when this token was hyphen-joined to the previous one in the
    # surface text ("cat-chasing" → chasing.hyph_prev)
    hyph_prev: bool = False
    # True when the token is a member of an or-conjunction — every
    # match on such a token is uncertain (reference
    # HolmesDictionary.is_uncertain, parsing.py:409-412)
    involved_in_or: bool = False
    # character offset of the token in the original document text
    # (spaCy's token.idx — char-span reporting in topic match dicts)
    char_start: int = 0


# sem dep: dict(parent, child, label, uncertain, coref)


def _is_participle(w: str) -> bool:
    lw = w.lower()
    if lw in _IRREG_PARTICIPLES or (lw.endswith("ed") and len(lw) > 3):
        return True
    # German ge-…-t/-en participles (gejagt, gesehen), including
    # separable-prefix forms with interior -ge- (DURCHGEführt,
    # ABGEschlossen) — but never a separable INFINITIVE that merely
    # starts with prefix+ge ("werden AUSGEHEN" is futur, not passive)
    if lw.endswith(("t", "en")) and len(lw) > 5:
        if lw.startswith("ge"):
            return True
        from .lexicon import SEPARABLE_PREFIXES_DE, VERB_LEMMAS_DE
        if lw not in VERB_LEMMAS_DE and any(
                lw.startswith(p + "ge") for p in SEPARABLE_PREFIXES_DE):
            return True
    return False


# ----------------------------------------------------------- tagging EN

def _would_default_noun(text: str) -> bool:
    """True when the EN tagger would land this word on the default
    NOUN branch: alphabetic and claimed by no other lexicon class.
    Used for lookahead decisions (e.g. possessive 'his/her' before an
    out-of-lexicon noun) — mirrors the tagger's fallthrough order."""
    w = text.lower()
    if not w.isalpha():
        return False
    if (w in L.DETS_EN or w in L.PRONOUNS_EN or w in L.PREPOSITIONS_EN
            or w in L.CONJUNCTIONS_EN or w in L.ADVERBS_EN
            or w in L.ADJECTIVES_EN or w in L.BE_FORMS_EN
            or w in L.DO_FORMS_EN or w in L.HAVE_FORMS_EN
            or w in L.MODALS_EN or w in L.NUMBER_WORDS_EN
            or w in L.NEGATION_WORDS_EN):
        return False
    if (w.endswith("ly") and len(w) > 4) \
            or (w.endswith(L.ADJ_SUFFIXES_EN) and len(w) > 5):
        return False
    if lemma(w, "en") in L.VERB_LEMMAS_EN:
        return False
    return True


def _tag_en(toks: list[Tok], start_of_sent: int) -> None:
    n = len(toks)
    for j, t in enumerate(toks):
        w = t.text.lower()
        if w.endswith(("'s", "’s")):
            w = w[:-2]  # possessive clitic: tag by the stem
        prev = toks[j - 1] if j > 0 else None
        if t.text in PUNCT:
            t.pos = "PUNCT"
        elif (w in ("this", "these", "those")
              or (w == "that" and (j + 1 >= n
                                   or toks[j + 1].text in PUNCT
                                   or toks[j + 1].text.lower()
                                   in L.BE_FORMS_EN))) and not (
                j + 1 < n and (toks[j + 1].text.lower() in L.NOUN_LEXICON_EN
                               or toks[j + 1].text.lower() in L.ADJECTIVES_EN)):
            # demonstrative PRONOUN when nothing nominal follows ("What
            # is THIS?"); complementizer 'that' (followed by a clause)
            # keeps its SCONJ-ish handling in the clause split
            t.pos = "PRON"
        elif w in L.DETS_EN:
            t.pos = "DET"
        elif w in L.CONJUNCTIONS_EN:
            t.pos = "CCONJ"
        elif w in ("not", "n't"):
            t.pos = "PART"
        elif w == "that" and prev is not None and prev.pos in ("NOUN", "PROPN"):
            t.pos = "PRON"  # relative 'that'
        elif w == "that":
            t.pos = "DET"
        elif w in ("which", "what") \
                and (prev is None or prev.pos not in ("NOUN", "PROPN")) \
                and j + 1 < n and (
                    toks[j + 1].text.lower() in L.NOUN_LEXICON_EN
                    or toks[j + 1].text.lower() in L.ADJECTIVES_EN):
            # governed interrogative ("WHICH politician lied?", "In
            # WHICH house?"): determiner of the answer noun (reference
            # governed question words, tests/en/test_questions_EN.py)
            t.pos = "DET"
        elif w in ("my", "your", "its", "our", "their") or (
                w in ("his", "her") and j + 1 < n
                and (toks[j + 1].text.lower() in L.NOUN_LEXICON_EN
                     or toks[j + 1].text.lower() in L.ADJECTIVES_EN
                     # …or any word that will default-tag as a noun
                     # (OOV → NOUN): "give Harry Potter HIS present" —
                     # 'present' is out-of-lexicon but nominal, and
                     # 'his' must open the second NP of the double
                     # object (reference: spaCy poss det)
                     or _would_default_noun(toks[j + 1].text))):
            # possessive determiners ("his son", "your roll")
            t.pos = "DET"
        elif w in L.PRONOUNS_EN:
            t.pos = "PRON"
        elif w in L.BE_FORMS_EN or w in L.DO_FORMS_EN or w in L.HAVE_FORMS_EN or w in L.MODALS_EN:
            t.pos = "AUX"
        elif w == "to" and j + 1 < n and toks[j + 1].text[:1].islower() \
                and (lemma(toks[j + 1].text.lower(), "en") in L.VERB_LEMMAS_EN
                     or toks[j + 1].text.lower() in ("be", "being")):
            t.pos = "PART"  # infinitival 'to' (incl. passive "to be V-ed")
        elif w in L.PARTICLES_EN and prev is not None and any(
                toks[k].pos in ("VERB", "AUX")
                and (lemma(toks[k].text.lower(), "en"), w)
                in L.PHRASAL_VERBS_EN
                for k in range(max(0, j - 3), j)) and prev.pos not in ("VERB", "AUX"):
            # separated particle ("takes something OUT"): a known
            # phrasal bigram with a nearby preceding verb (reference
            # conflates the lemma over the prt dep regardless of
            # adjacency, language_specific_rules.py:478-492)
            t.pos = "PART"
        elif w in L.PARTICLES_EN and prev is not None and prev.pos in ("VERB", "AUX"):
            # particle vs preposition: preposition only if an NP follows
            # (lexical lookahead — the next token is not yet tagged);
            # known phrasal-verb bigrams stay particles even before a
            # direct object ("took out insurance", reference lemma
            # conflation language_specific_rules.py:478-492)
            nxt = toks[j + 1] if j + 1 < n else None
            nw = nxt.text.lower() if nxt is not None else ""
            if (lemma(prev.text.lower(), "en"), w) in L.PHRASAL_VERBS_EN:
                t.pos = "PART"
            elif toks[0].text.lower() in L.INTERROGATIVES_EN \
                    and (nxt is None or nxt.text in PUNCT):
                # stranded preposition of a WH question ("What did you
                # live IN?") — a preposition whose object is the
                # fronted question word, never a verb particle
                t.pos = "ADP"
            elif nxt is not None and nxt.text not in PUNCT and (
                nw in L.DETS_EN or nw in L.NOUN_LEXICON_EN
                or nw in L.NUMBER_WORDS_EN or nw.isdigit()
                or (nxt.text[:1].isupper() and nw not in L.ADVERBS_EN)
            ) and not (nw in L.ADVERBS_EN or (nw.endswith("ly") and len(nw) > 4)):
                t.pos = "ADP"
            else:
                t.pos = "PART"
        elif w in L.PREPOSITIONS_EN:
            t.pos = "ADP"
        elif _is_participle(w) and lemma(w, "en") in L.VERB_LEMMAS_EN \
                and prev is not None and prev.text.lower() \
                in L.HAVE_FORMS_EN | L.DO_FORMS_EN:
            # perfect tense ("HAD adopted him") — a have/do auxiliary
            # before a verbal participle forces the verb reading even
            # for participles listed as adjectives
            t.pos = "VERB"
        elif w in L.ADJECTIVES_EN and prev is not None and (
                prev.pos == "AUX"
                # intensifier chain: "was VERY hard", "is so very easy"
                or (prev.pos == "ADV" and (lambda: next(
                    (toks[k].pos for k in range(j - 1, -1, -1)
                     if toks[k].pos != "ADV"), None))() == "AUX")):
            t.pos = "ADJ"  # predicative position: "is hard/easy/…"
        elif w in _SCONJ_EN:
            t.pos = "SCONJ"
        elif w in L.ADJECTIVES_EN and j + 1 < n \
                and toks[j + 1].text.lower() in L.NOUN_LEXICON_EN:
            # attributive position before a known noun ("with HARD
            # work") — wins over the adverb reading
            t.pos = "ADJ"
        elif (w in L.ADVERBS_EN or (w.endswith("ly") and len(w) > 4)) \
                and not (prev is not None and prev.pos == "ADP"
                         and w in L.NOUN_LEXICON_EN):
            # a noun/adverb-ambiguous word directly under a preposition
            # takes the noun reading ("at HOME" → pobj noun, feeding
            # prep-noun: at-home; reference test_phraselet_production_
            # EN.py:294); elsewhere the adverb reading wins ("went home")
            t.pos = "ADV"
        elif ((w.endswith("ing") and len(w) > 4) or _is_participle(w)) \
                and lemma(w, "en") in L.VERB_LEMMAS_EN \
                and prev is not None \
                and (prev.pos in ("DET", "ADJ", "NUM")
                     # hyphenated participle compound: "cat-chasing dog"
                     or (t.hyph_prev and prev.pos in ("NOUN", "PROPN"))) \
                and j + 1 < n and toks[j + 1].text.lower() in L.NOUN_LEXICON_EN:
            # prenominal participle ("the running boy", "an adopted girl"):
            # tagged ADJ so it attaches as amod with the verb lemma — the
            # reference matches these against verbal deps via the
            # amod reverse implications (en rules :880-1033)
            t.pos = "ADJ"
        elif w in L.NOUN_LEXICON_EN and (prev is None or prev.pos in ("DET", "ADJ", "ADP", "NUM", "NOUN", "PROPN", "CCONJ") or prev.text in PUNCT):
            t.pos = "NOUN"
        elif w in L.ADJECTIVES_EN or (w.endswith(L.ADJ_SUFFIXES_EN) and len(w) > 5):
            t.pos = "ADJ"
        elif w.isdigit() or w in L.NUMBER_WORDS_EN:
            t.pos = "NUM"
        elif lemma(w, "en") in L.VERB_LEMMAS_EN and not (prev is not None and (
                prev.pos in ("DET", "NUM")
                # an ADJ blocks a verb reading only when attributive;
                # predicative position ("was not old chased…") does not
                or (prev.pos == "ADJ"
                    and not (j >= 2 and toks[j - 2].pos in ("AUX", "PART"))))):
            t.pos = "VERB"
        elif t.text[:1].isupper() and j + start_of_sent > start_of_sent and j > 0:
            t.pos = "PROPN"
        elif t.text[:1].isupper() and j == 0 and (
                w in _FIRST_NAMES or w in _PLACES
                # sentence-initial name SEQUENCE ("Mimi Momo progresses"):
                # a following capitalized non-lexicon word marks a name
                or (j + 1 < n and toks[j + 1].text[:1].isupper()
                    and toks[j + 1].text.lower() not in L.NOUN_LEXICON_EN
                    and toks[j + 1].text.lower() not in L.VERB_LEMMAS_EN)):
            t.pos = "PROPN"
        elif w in L.NOUN_LEXICON_EN:
            t.pos = "NOUN"
        else:
            t.pos = "NOUN"
        t.tag = t.pos


def _tag_de(toks: list[Tok]) -> None:
    from .lemmatizer import IRREGULAR_DE

    for j, t in enumerate(toks):
        w = t.text.lower()
        prev = toks[j - 1] if j > 0 else None
        if t.text in PUNCT:
            t.pos = "PUNCT"
        elif (t.hyph_prev or (j + 1 < len(toks)
                              and toks[j + 1].hyph_prev)) \
                and t.text.isalpha():
            # member of a hyphen-joined compound ("Wort-Mit-Bindestrich")
            # — the reference keeps the whole hyphenated word ONE noun
            # token and deletes the hyphens in its matching reprs
            # (de normalize_hyphens, de rules :1558-1567), so closed-
            # class readings of interior parts ('mit', 'nicht', 'ohne')
            # never apply (tests/de/test_structural_matching_DE.py
            # :997-1056)
            t.pos = "NOUN"
        elif w in ("welche", "welcher", "welches", "welchen", "welchem") \
                and j + 1 < len(toks) and toks[j + 1].text[:1].isupper():
            # governed interrogative determiner ("WELCHE Hunde fressen
            # Knochen?") — unmatchable, like EN 'which'
            t.pos = "DET"
        elif w in ("der", "die", "das", "dieser", "diese", "dieses",
                   "alle") \
                and j + 1 < len(toks) \
                and not toks[j + 1].text[:1].isupper() \
                and (toks[j + 1].text.lower() in ("und", "oder")
                     or lemma(toks[j + 1].text.lower(), "de")
                     in L.VERB_LEMMAS_DE
                     or toks[j + 1].text.lower() in (
                         "ist", "war", "sind", "waren", "wird", "wurde",
                         "wurden", "hat", "hatte", "hatten")):
            # demonstrative pronoun directly before a finite verb
            # ("…, und DIE jagten eine Katze", "und DIESES jagte…") —
            # PDS in the reference parse, a coreferring mention
            # (reference de language_specific_rules.py pronoun handling)
            t.pos = "PRON"
        elif w in L.DETS_DE:
            t.pos = "DET"
        elif w in ("mein", "meine", "meinen", "meinem", "meiner",
                   "dein", "deine", "sein", "seine", "seinen",
                   "seinem", "seiner", "ihr", "ihre", "ihren",
                   "ihrem", "ihrer", "unser", "unsere", "euer",
                   "eure") and j + 1 < len(toks) \
                and (toks[j + 1].text[:1].isupper()
                     or toks[j + 1].text.lower() in L.ADJECTIVES_DE):
            # possessive determiner before its noun ("IHR Mittagessen")
            # — PPOSAT in the reference parse; 'ihr'/'sein' as personal
            # pronouns stay PRON via the next branch
            t.pos = "DET"
        elif w in L.INTERROGATIVE_PRONOUNS_DE:
            t.pos = "PRON"
        elif w in L.INTERROGATIVES_DE:
            # adverbial interrogatives (wo/wohin/wann/warum/wie…)
            t.pos = "ADV"
        elif w in ("und", "oder", "aber"):
            t.pos = "CCONJ"
        elif w == "nicht":
            t.pos = "PART"
        elif w in ("dass", "weil", "ob", "obwohl", "wenn", "indem",
                   "damit", "falls", "während"):
            t.pos = "SCONJ"
        elif w in L.PRONOUNS_DE:
            t.pos = "PRON"
        elif w in ("ist", "war", "sind", "waren", "wird", "wurde",
                   "wurden", "werden", "worden", "sein", "hat", "hatte",
                   "hatten", "haben", "habe") or w in L.MODALS_DE:
            # clause-final 'haben' under a futur/modal auxiliary is the
            # CONTENT verb ("Der Esel wird/soll ein Dach haben" — the
            # reference parses it VB/oa so the haben-dach relation
            # exists, tests/de/test_topic_matching_DE.py:62-76)
            if (w == "haben"
                    and (j + 1 == len(toks) or toks[j + 1].text in PUNCT)
                    and any(t2.text.lower() in L.MODALS_DE
                            or t2.text.lower() in ("wird", "werden",
                                                   "wirst", "werdet")
                            for t2 in toks[:j])
                    # …but "wird die Katze GEJAGT haben" is the future
                    # PERFECT: a participle before clause-final 'haben'
                    # makes it the tense auxiliary again (reference de
                    # test_semantics :161-170 — doc[6] '-6:None',
                    # unmatchable)
                    and not any(t2.pos == "VERB"
                                and _is_participle(t2.text)
                                for t2 in toks[:j])):
                t.pos = "VERB"
            else:
                t.pos = "AUX"
        elif w in L.SEPARABLE_PREFIXES_DE \
                and (j + 1 == len(toks) or toks[j + 1].text in PUNCT) \
                and any(t2.pos in ("VERB", "AUX")
                        and (w + lemma(t2.text.lower(), "de"))
                        in L.VERB_LEMMAS_DE
                        for t2 in toks[:j]):
            # separated prefix of a separable verb ("Ein Student geht
            # AUS" → lemma ausgehen; reference conflates separable
            # prefixes into the verb lemma, de language rules)
            t.pos = "PART"
        elif w in L.PREPOSITIONS_DE and not (t.text[:1].isupper() and j > 0):
            t.pos = "ADP"
        elif w in IRREGULAR_DE and IRREGULAR_DE[w] in L.VERB_LEMMAS_DE:
            t.pos = "VERB"
        elif w in L.VERB_LEMMAS_DE:
            # capitalized infinitive mid-sentence = nominalized verb
            # ("Das Abdanken eines Königs" — NN in the reference parse)
            if (t.text[:1].isupper() and j > 0
                    and toks[j - 1].text not in PUNCT):
                t.pos = "NOUN"
            else:
                t.pos = "VERB"
        elif not t.text[:1].isupper() and lemma(w, "de") in L.VERB_LEMMAS_DE:
            # regular conjugation (jagten/spielt/kaufte → infinitive);
            # German verbs are lowercase, nouns capitalized
            t.pos = "VERB"
        elif w in L.ADJECTIVES_DE and (
                not t.text[:1].isupper()
                # sentence-initial capitalization is orthographic, not
                # nominal ("Gesunde Pflanzen wachsen")
                or ((j == 0 or toks[j - 1].text in PUNCT)
                    and w not in L.NOUN_LEXICON_DE)):
            t.pos = "ADJ"
        elif w in L.ADVERBS_DE and (
                not t.text[:1].isupper()
                # "Immer hat er es", "Dann tat er es" — ADV in the
                # reference parse despite the sentence-initial capital
                or ((j == 0 or toks[j - 1].text in PUNCT)
                    and w not in L.NOUN_LEXICON_DE)):
            t.pos = "ADV"
        elif w.isdigit() or w in L.NUMBER_WORDS_DE:
            t.pos = "NUM"
        elif t.text[:1].isupper():
            # German nouns are capitalized
            t.pos = "NOUN" if w in L.NOUN_LEXICON_DE or j > 0 or w not in L.VERB_LEMMAS_DE else "VERB"
        elif w.endswith(("lich", "ig", "isch", "sam", "bar")):
            t.pos = "ADJ"
        elif w.endswith("t") and ("ge" + w[:-1]) in IRREGULAR_DE:
            t.pos = "VERB"
        else:
            t.pos = "NOUN" if prev is not None and prev.pos in ("DET", "ADJ") else "NOUN"
        t.tag = t.pos

    # --- proper names: German capitalizes ALL nouns, so PROPN needs
    # the gazetteer — a first name / place seeds a name, following
    # capitalized out-of-lexicon tokens continue the run (the
    # reference reads the spaCy de NER, whose labels are PER/LOC)
    for j, t in enumerate(toks):
        if t.pos != "NOUN":
            continue
        w = t.text.lower()
        if w in _FIRST_NAMES:
            t.pos = "PROPN"
            t.ent_type = "PER"
        elif w in _PLACES:
            t.pos = "PROPN"
            t.ent_type = "LOC"
        elif (j > 0 and toks[j - 1].pos == "PROPN"
              and t.text[:1].isupper()
              and w not in L.NOUN_LEXICON_DE):
            t.pos = "PROPN"
            t.ent_type = toks[j - 1].ent_type


# ---------------------------------------------------------- NP chunking

def _chunk_nps(toks: list[Tok],
               lang: str = "en") -> list[tuple[int, int, int]]:
    """Return (start, end_inclusive, head) spans of noun phrases within a
    sentence token list (local indexes). Head = last nominal token.
    """
    spans = []
    j = 0
    n = len(toks)
    while j < n:
        if toks[j].pos == "PRON":
            # a pronoun is always its own single-token NP
            spans.append((j, j, j))
            j += 1
        elif toks[j].pos in ("DET", "ADJ", "NUM", "NOUN", "PROPN"):
            start = j
            last_nominal = -1
            while j < n and toks[j].pos in ("DET", "ADJ", "NUM", "NOUN", "PROPN"):
                # a determiner after a nominal starts a NEW phrase
                # ("gab dem Mann das Buch" = two NPs, not one)
                if toks[j].pos == "DET" and last_nominal >= 0:
                    break
                # GERMAN ONLY: a noun after another nominal starts a
                # NEW phrase ("Jana Müller Versicherung brauchten" =
                # name NP + bare object NP in the verb-final clause;
                # "ein Pferd Versicherung brauchten" likewise) — DE
                # noun compounds are single words, so adjacency means
                # two arguments. English keeps noun-noun/PROPN-noun
                # compounds in one NP ("school gear", "A big
                # Unhyphenated Single Multiword"). Never split across
                # a hyphen join ("Grün-Haus" is ONE compound pair).
                if lang == "de" and toks[j].pos == "NOUN" \
                        and last_nominal >= 0 \
                        and not toks[j].hyph_prev \
                        and toks[j - 1].pos in ("PROPN", "NOUN"):
                    break
                if toks[j].pos in ("NOUN", "PROPN"):
                    last_nominal = j
                j += 1
                # conjoined attributive adjectives stay in ONE phrase
                # ("The large and strong dog" — reference
                # test_semantics_EN.py:53-57 gives dog amod to both);
                # only before the head nominal, so "strong dog and
                # fierce cat" still splits into two NPs
                if (last_nominal < 0 and j + 1 < n
                        and toks[j - 1].pos == "ADJ"
                        and toks[j].pos == "CCONJ"
                        and toks[j + 1].pos == "ADJ"):
                    toks[j].dep = "cc"
                    j += 1
            if last_nominal >= 0:
                spans.append((start, j - 1, last_nominal))
            else:
                j = start + 1
        else:
            j += 1
    return spans


# -------------------------------------------------- sentence dep parse

def _parse_sentence(toks: list[Tok], lang: str) -> list[dict]:
    """Assign syntactic head/dep within one sentence (local indexes are
    the Tok.i values already set globally; list positions are local).
    Returns the list of *semantic* dependencies (holmes-normalized).
    """
    n = len(toks)
    off = toks[0].i
    deps: list[dict] = []

    def add(parent: int, child: int, label: str, uncertain: bool = False,
            coref: bool = False, prep: str | None = None,
            prep_case: str | None = None):
        deps.append({
            "parent": parent, "child": child, "label": label,
            "uncertain": uncertain, "coref": coref, "prep": prep,
            "prep_case": prep_case,
        })

    # --- complementizer clause split ("claimed THAT a dog chased a
    # cat"): parse matrix and complement separately, link with ccomp —
    # the reference keeps the spaCy ccomp structure and negation scope
    # flows from the matrix into the complement (en language_specific_
    # rules.py:134-167 walks ancestors' children)
    if lang in ("en", "de"):
        comp_words = (("that", "because") if lang == "en"
                      else ("dass", "weil", "wenn", "indem", "damit",
                            "obwohl", "falls"))
        for k in range(1, n - 1):
            cw = toks[k].text.lower()
            # 'because of' is a multiword PREP, not a clause marker
            if cw == "because" and k + 1 < n \
                    and toks[k + 1].text.lower() == "of":
                continue
            if cw in comp_words and toks[k].pos != "PRON" \
                    and (toks[k - 1].pos in ("VERB",)
                         or (cw == "because"
                             and any(t2.pos == "VERB" for t2 in toks[:k]))
                         or (lang == "de" and toks[k - 1].text == ","
                             and any(t2.pos == "VERB" for t2 in toks[:k]))) \
                    and any(t2.pos in ("VERB", "AUX")
                            for t2 in toks[k + 1:]):
                # the complement ends at the first comma (a following
                # ", it was true" is a separate coordinate clause)
                end = next((e for e in range(k + 1, n)
                            if toks[e].text == ","), n)
                main_deps = _parse_sentence(toks[:k], lang)
                sub_deps = _parse_sentence(toks[k + 1:end], lang)
                rest_deps = (_parse_sentence(toks[end + 1:], lang)
                             if end + 1 < n else [])
                main_root = next((t2 for t2 in toks[:k]
                                  if t2.dep == "ROOT"), toks[0])
                sub_root = next((t2 for t2 in toks[k + 1:end]
                                 if t2.dep == "ROOT"), toks[k + 1])
                # 'because'-clauses (and the DE adverbial markers
                # weil/wenn/indem/damit/obwohl) link as causal/temporal
                # adverbials with the marker as prep — why/wann/wie/
                # woher questions gate on it (reference en rules
                # :1430-1469, de rules :2059-2125); dass/that stay ccomp
                adv_markers = ("because", "weil", "wenn", "indem",
                               "damit", "obwohl", "falls")
                link = "advcl" if cw in adv_markers else "ccomp"
                sub_root.dep = link
                sub_root.head = main_root.i
                toks[k].dep = "mark"
                toks[k].head = sub_root.i
                return main_deps + sub_deps + rest_deps + [{
                    "parent": main_root.i, "child": sub_root.i,
                    "label": link, "uncertain": False, "coref": False,
                    "prep": cw if cw in adv_markers else None,
                }]

    # --- German relative clause ("Der Hund, DER DIE KATZE JAGTE, war
    # müde"): comma + d-pronoun after a nominal opens a verb-final
    # relative clause closed by the next comma. The clause parses as
    # its own verb-final unit; the antecedent takes the pronoun's
    # grammatical role — nominative der/die/das → subject (nsubjpass
    # under an interior werden-passive), accusative 'den' → object,
    # dative 'dem' → dative (reference de relative-pronoun handling,
    # tests/de/test_structural_matching_DE.py:233-262).
    # --- German zu-infinitive complement ("Die Katze entschied, VOM
    # HUND GEJAGT ZU WERDEN", "… entschlossen sich, EINE KATZE ZU
    # JAGEN"): comma + clause-final 'zu' + infinitive. The main
    # subject(s) control the complement (uncertain, like the EN xcomp
    # path); interior NPs are the complement's objects, interior PPs
    # its prepositional dependents — under a passive infinitive
    # ("gejagt zu werden") the controller is the patient and a
    # von/vom/durch phrase the agent (reference tests/de/
    # test_structural_matching_DE.py:296-332).
    if lang == "de":
        for k in range(1, n - 2):
            if toks[k].text != ",":
                continue
            tail = toks[k + 1:]
            while tail and tail[-1].pos == "PUNCT":
                # "Richard war froh, es zu verstehen." — the sentence
                # period sits after the infinitive (ref :626-630)
                tail[-1].dep = "punct"
                tail[-1].head = toks[k - 1].i
                tail = tail[:-1]
            if len(tail) < 2 or tail[-2].text.lower() != "zu" \
                    or tail[-1].pos not in ("VERB", "AUX"):
                continue
            if not any(t2.pos in ("VERB", "AUX") for t2 in toks[:k]):
                continue
            main_deps = _parse_sentence(toks[:k], lang)
            main_root = next((t2 for t2 in toks[:k] if t2.dep == "ROOT"),
                             toks[0])
            inf = tail[-1]
            passive_inf = (inf.text.lower() in ("werden", "sein")
                           and any(t2.pos == "VERB"
                                   and _is_participle(t2.text)
                                   for t2 in tail[:-2]))
            content = inf
            if passive_inf:
                content = next(t2 for t2 in reversed(tail[:-2])
                               if t2.pos == "VERB"
                               and _is_participle(t2.text))
            content.dep = "xcomp"
            content.head = main_root.i
            extra = [{"parent": main_root.i, "child": content.i,
                      "label": "xcomp", "uncertain": False,
                      "coref": False, "prep": None, "mention": False}]
            subj_lbl = "nsubjpass" if passive_inf else "nsubj"
            # object control: "bat DEN HUND, eine Katze zu jagen" /
            # "schlug DEM HUND vor, …" — a matrix accusative/dative
            # object controls the complement; um-zu purpose clauses
            # and objectless matrices fall back to subject control
            # (reference de test_semantics :427-461)
            um_clause = tail[0].text.lower() == "um"
            by_i = {t2.i: t2 for t2 in toks}
            _DA_ADVERBS = {"darüber", "darauf", "davon", "daran",
                           "darum", "dazu", "dabei", "danach", "davor",
                           "dadurch", "darin", "damit", "darunter"}
            ctrl = [d for d in main_deps
                    if d["parent"] == main_root.i
                    and d["label"] in ("dobj", "dative")
                    and by_i[d["child"]].text.lower() != "sich"
                    # pronominal adverbs ("dachte DARÜBER nach, …")
                    # are clause placeholders, not controllers — the
                    # matrix subject controls (ref :462-466 '1:oa(U)')
                    and by_i[d["child"]].text.lower() not in _DA_ADVERBS
                    and by_i[d["child"]].pos in ("NOUN", "PROPN",
                                                 "PRON")]
            if um_clause or not ctrl:
                ctrl = [d for d in main_deps
                        if d["parent"] == main_root.i
                        and d["label"] in ("nsubj", "nsubjpass")]
            for d in ctrl:
                extra.append({"parent": content.i, "child": d["child"],
                              "label": subj_lbl, "uncertain": True,
                              "coref": False, "prep": None,
                              "mention": False})
            # conjoined infinitives ("…, zu singen UND ZU SCHREIEN"):
            # every zu-governed verb in the tail is a complement
            # conjunct sharing the controllers (reference de
            # test_semantics :547-577)
            co_infs = [t2 for t2 in tail[:-2]
                       if t2 is not content and t2.pos == "VERB"
                       and t2.i > 0
                       and toks[t2.i - 1].text.lower() == "zu"]
            for t2 in co_infs:
                t2.dep = "xcomp"
                t2.head = main_root.i
                extra.append({"parent": main_root.i, "child": t2.i,
                              "label": "xcomp", "uncertain": False,
                              "coref": False, "prep": None,
                              "mention": False})
                for d in ctrl:
                    extra.append({"parent": t2.i, "child": d["child"],
                                  "label": subj_lbl, "uncertain": True,
                                  "coref": False, "prep": None,
                                  "mention": False})
            inner = [t2 for t2 in tail
                     if t2 is not inf and t2 is not tail[-2]]
            sp2 = _chunk_nps(inner, lang)
            for (s2, e2, h2) in sp2:
                ht = inner[h2]
                if ht.pos not in ("NOUN", "PROPN"):
                    continue
                prev_t = inner[s2 - 1] if s2 > 0 else None
                if prev_t is not None and prev_t.pos == "ADP" \
                        and prev_t.text.lower() == "um" \
                        and prev_t is tail[0]:
                    # clause-initial 'um' is the purpose marker, not a
                    # preposition over the NP ("um EINE KATZE zu
                    # jagen" — Katze is the oa, reference de
                    # test_semantics :450-461)
                    prev_t.dep = "mark"
                    prev_t.head = content.i
                    prev_t = None
                if prev_t is not None and prev_t.pos == "ADP":
                    pw3 = prev_t.text.lower()
                    prev_t.dep = ("agent" if passive_inf
                                  and pw3 in ("von", "vom", "durch")
                                  else "prep")
                    prev_t.head = content.i
                    ht.dep = "pobj"
                    ht.head = prev_t.i
                    extra.append({"parent": content.i, "child": ht.i,
                                  "label": ("pobjb"
                                            if prev_t.dep == "agent"
                                            else "pobjp"),
                                  "uncertain": True, "coref": False,
                                  "prep": pw3, "mention": False})
                elif (prev_t is not None and prev_t.pos == "CCONJ"
                      and extra and extra[-1]["label"] in ("pobjb",
                                                           "pobjp")):
                    # conjunct inside a PP ("vom Hund UND LÖWEN
                    # gejagt zu werden"): the second NP shares the
                    # preposition's label (reference de test_semantics
                    # :505-521 — '9:sb; 11:sb')
                    ht.dep = "pobj"
                    ht.head = extra[-1]["child"]
                    extra.append({"parent": content.i, "child": ht.i,
                                  "label": extra[-1]["label"],
                                  "uncertain": True, "coref": False,
                                  "prep": extra[-1]["prep"],
                                  "mention": False})
                else:
                    ht.dep = "dobj"
                    ht.head = content.i
                    extra.append({"parent": content.i, "child": ht.i,
                                  "label": "dobj", "uncertain": True,
                                  "coref": False, "prep": None,
                                  "mention": False})
            for t2 in tail:
                if t2.dep == "":
                    t2.dep = "dep"
                    t2.head = content.i
            toks[k].dep = "punct"
            toks[k].head = content.i
            return main_deps + extra

    # --- English relative PREPOSITIONAL phrase ("The table FROM WHICH
    # we ate."): preposition + which/whom after a nominal; the
    # antecedent is the relative verb's prepositional dependent
    # (reference en test_semantics :838-862)
    if lang == "en":
        for k in range(1, n - 2):
            if toks[k].pos != "ADP" \
                    or toks[k + 1].text.lower() not in ("which", "whom") \
                    or toks[k - 1].pos not in ("NOUN", "PROPN"):
                continue
            interior = [t2 for t2 in toks[k + 2:] if t2.pos != "PUNCT"]
            if not any(t2.pos == "VERB" for t2 in interior):
                continue
            ante = k - 1
            main_part = toks[:k]
            main_deps = _parse_sentence(main_part, lang) \
                if main_part else []
            sub_deps = _parse_sentence(interior, lang)
            sub_root = next((t2 for t2 in interior if t2.dep == "ROOT"),
                            interior[0])
            at = toks[ante]
            pw = toks[k].text.lower()
            toks[k].dep = "prep"
            toks[k].head = sub_root.i
            toks[k + 1].dep = "relpron"
            toks[k + 1].head = toks[k].i
            _anchor3 = next((t2 for t2 in toks
                             if at.i in t2.righthand_siblings), None)
            conj_ante = _anchor3 is not None
            extra3 = [{"parent": sub_root.i, "child": at.i,
                       "label": "pobjp", "uncertain": conj_ante,
                       "coref": False, "prep": pw, "mention": False}]
            for m in ([] if _anchor3 is None else
                      [_anchor3.i] + [s2 for s2 in
                                      _anchor3.righthand_siblings
                                      if s2 != at.i]):
                extra3.append({**extra3[0], "child": m,
                               "uncertain": True})
            rs3 = sub_root.righthand_siblings
            for s2 in rs3:
                for d0 in list(extra3):
                    if d0["parent"] == sub_root.i:
                        extra3.append({**d0, "parent": s2})
            for t2 in toks:
                if t2.dep == "":
                    t2.dep = "punct" if t2.pos == "PUNCT" else "dep"
                    t2.head = sub_root.i
            return main_deps + sub_deps + extra3

    # --- German relative PREPOSITIONAL phrase ("Der Tisch, VON
    # WELCHEM wir aßen."): comma + preposition + welch-/denen-pronoun;
    # the antecedent is the relative verb's prepositional dependent
    # (reference de test_semantics :737-755)
    if lang == "de":
        for k in range(2, n - 2):
            if toks[k - 1].text != "," or toks[k].pos != "ADP" \
                    or toks[k + 1].text.lower() not in (
                        "welchem", "welcher", "welchen", "denen"):
                continue
            ante = k - 2
            if toks[ante].pos not in ("NOUN", "PROPN"):
                continue
            close = next((e for e in range(k + 2, n)
                          if toks[e].text == ","), n)
            interior = [t2 for t2 in toks[k + 2: close]
                        if t2.pos != "PUNCT"]
            if not any(t2.pos == "VERB" for t2 in interior):
                continue
            main_part = toks[:k - 1] + (toks[close + 1:]
                                        if close < n else [])
            main_deps = _parse_sentence(main_part, lang) \
                if main_part else []
            sub_deps = _parse_sentence(interior, lang)
            sub_root = next((t2 for t2 in interior if t2.dep == "ROOT"),
                            interior[0])
            at = toks[ante]
            pw = toks[k].text.lower()
            toks[k].dep = "prep"
            toks[k].head = sub_root.i
            toks[k + 1].dep = "relpron"
            toks[k + 1].head = toks[k].i
            extra2 = [{"parent": sub_root.i, "child": at.i,
                       "label": "pobjo" if pw in ("von", "vom")
                       else "pobjp",
                       "uncertain": False, "coref": False,
                       "prep": pw, "mention": False}]
            _anchor2 = next((t2 for t2 in toks
                             if at.i in t2.righthand_siblings), None)
            for m in ([] if _anchor2 is None else
                      [_anchor2.i] + [s2 for s2 in
                                      _anchor2.righthand_siblings
                                      if s2 != at.i]):
                extra2.append({**extra2[0], "child": m,
                               "uncertain": True})
            # conjoined relative verbs share the dependent (sibling
            # copy distributes the rest)
            rs = next((t2 for t2 in interior
                       if t2.dep == "ROOT"), None)
            if rs is not None:
                for s2 in rs.righthand_siblings:
                    for d0 in list(extra2):
                        if d0["parent"] == sub_root.i:
                            extra2.append({**d0, "parent": s2})
            for t2 in toks:
                if t2.dep == "":
                    t2.dep = "punct" if t2.pos == "PUNCT" else "dep"
                    t2.head = sub_root.i
            return main_deps + sub_deps + extra2

    if lang == "de":
        for k in range(2, n - 1):
            rw = toks[k].text.lower()
            if toks[k - 1].text != "," \
                    or rw not in ("der", "die", "das", "den", "dem"):
                continue
            ante = k - 2
            if toks[ante].pos not in ("NOUN", "PROPN"):
                continue
            close = next((e for e in range(k + 1, n)
                          if toks[e].text == ","), None)
            if close is None:
                continue
            interior = toks[k + 1: close]
            if not any(t2.pos == "VERB" for t2 in interior):
                continue
            if not any(t2.pos in ("VERB", "AUX") for t2 in toks[close + 1:]):
                continue
            main_deps = _parse_sentence(toks[:k - 1] + toks[close + 1:],
                                        lang)
            at = toks[ante]
            # conjoined antecedents ("Der Hund, der Elefant und der
            # Bär, die …"): the pronoun binds the LAST conjunct
            # certainly; the earlier conjuncts receive uncertain
            # copies of its role deps (reference de test_semantics
            # :336-350 — '1:sb(U); 4:sb(U); 7:sb')
            _anchor = next((t2 for t2 in toks
                            if at.i in t2.righthand_siblings), None)
            co_antes = ([] if _anchor is None else
                        [_anchor.i] + [s2 for s2 in
                                       _anchor.righthand_siblings
                                       if s2 != at.i])
            extra: list[dict] = []
            if rw in ("den", "dem"):
                # accusative/dative pronoun: the interior's own NP is
                # the subject; the antecedent fills the object slot
                sub_deps = _parse_sentence(interior, lang)
                sub_root = next((t2 for t2 in interior
                                 if t2.dep == "ROOT"), interior[0])
                toks[k].dep = "relpron"
                toks[k].head = sub_root.i
                extra.append({"parent": sub_root.i, "child": at.i,
                              "label": "dobj" if rw == "den" else "dative",
                              "uncertain": False, "coref": False,
                              "prep": None, "mention": False})
                for m in co_antes:
                    extra.append({"parent": sub_root.i, "child": m,
                                  "label": ("dobj" if rw == "den"
                                            else "dative"),
                                  "uncertain": True, "coref": False,
                                  "prep": None, "mention": False})
            else:
                # nominative pronoun parses as the clause subject, then
                # every dep of the pronoun is re-addressed to the
                # antecedent
                toks[k].pos = toks[k].tag = "PRON"
                sub_deps = _parse_sentence(toks[k: close], lang)
                sub_root = next((t2 for t2 in toks[k: close]
                                 if t2.dep == "ROOT"), toks[k])
                remapped = []
                for d in sub_deps:
                    d = dict(d)
                    if d["child"] == toks[k].i:
                        d["child"] = at.i
                        for m in co_antes:
                            c2 = dict(d)
                            c2["child"] = m
                            c2["uncertain"] = True
                            remapped.append(c2)
                    if d["parent"] == toks[k].i:
                        d["parent"] = at.i
                    remapped.append(d)
                sub_deps = remapped
                toks[k].dep = "relpron"
                toks[k].head = sub_root.i
            for pt in (toks[k - 1], toks[close]):
                pt.dep = "punct"
                pt.head = sub_root.i
            return main_deps + sub_deps + extra

    # --- German subordinate clause ("…, dass ein Hund eine Katze
    # gejagt hatte"): verb-final complement linked with ccomp; the
    # negation pass then scopes main-clause negation into it (the DE
    # structural suite's subordinate-negation cases)
    if lang == "de":
        for k in range(1, n - 1):
            if toks[k].pos == "SCONJ" \
                    and any(t2.pos == "VERB" for t2 in toks[k + 1:]) \
                    and any(t2.pos in ("VERB", "AUX") for t2 in toks[:k]):
                main_deps = _parse_sentence(toks[:k], lang)
                sub_deps = _parse_sentence(toks[k + 1:], lang)
                main_root = next((t2 for t2 in toks[:k]
                                  if t2.dep == "ROOT"), toks[0])
                sub_root = next((t2 for t2 in toks[k + 1:]
                                 if t2.dep == "ROOT"), toks[k + 1])
                sub_root.dep = "ccomp"
                sub_root.head = main_root.i
                toks[k].dep = "mark"
                toks[k].head = sub_root.i
                return main_deps + sub_deps + [{
                    "parent": main_root.i, "child": sub_root.i,
                    "label": "ccomp", "uncertain": False, "coref": False,
                }]

    # --- German coordinate-clause split ("Ich sah einen Hund, und ER
    # JAGTE eine Katze"): mirrors the EN block below — a conjunction
    # followed by a nominative pronoun (or a full NP + finite verb)
    # opens a new main clause when a predicate exists on both sides
    if lang == "de":
        for k in range(1, n - 2):
            if toks[k].pos != "CCONJ":
                continue
            nom_pron = (toks[k + 1].pos == "PRON"
                        and toks[k + 1].text.lower() in (
                            "er", "sie", "es", "wir", "ich", "du",
                            "man", "die", "das", "dieser", "diese",
                            "dieses", "alle"))
            j2 = k + 1
            while j2 < n and toks[j2].pos in ("DET", "ADJ", "NUM",
                                              "NOUN", "PROPN"):
                j2 += 1
            # full-NP clause split ONLY behind a comma ("…, und eine
            # Katze jagte ihn") — without one, "NP und NP <participle>"
            # is an ordinary verb-final object group ("Der Hund hat
            # die Katze und die Katze gejagt"), never a second clause
            np_clause = (j2 > k + 1 and j2 < n
                         and toks[j2].pos in ("VERB", "AUX")
                         and toks[k - 1].pos == "PUNCT")
            # adverb-Vorfeld second clause ("… und DANN FRISST ein
            # Löwe" — reference de classification control :45-58
            # keeps the clauses apart)
            adv_clause = (toks[k + 1].pos == "ADV" and k + 2 < n
                          and toks[k + 2].pos in ("VERB", "AUX"))
            if (nom_pron or np_clause or adv_clause) \
                    and any(t2.pos in ("VERB", "AUX")
                            for t2 in toks[k + 1:]) \
                    and any(t2.pos in ("VERB", "AUX") for t2 in toks[:k]):
                left = _parse_sentence(toks[:k], lang)
                right = _parse_sentence(toks[k + 1:], lang)
                left_root = next((t2 for t2 in toks[:k]
                                  if t2.dep == "ROOT"), toks[0])
                toks[k].dep = "cc"
                toks[k].head = left_root.i
                return left + right

    # --- coordinate-clause split ("I saw a dog and IT WAS CHASING a
    # cat"): a conjunction followed by a nominative pronoun + predicate
    # opens a new clause, not an NP conjunct — parse both clauses
    # separately (reference keeps spaCy's clausal conj structure)
    if lang == "en":
        for k in range(1, n - 2):
            nom_pron = (toks[k + 1].pos == "PRON"
                        and toks[k + 1].text.lower() in (
                            "he", "she", "it", "they", "we", "i", "you"))
            # full-NP second clause ("saw a big horse and THE HORSE WAS
            # chasing"): the NP right after the conjunction is followed
            # directly by a predicate — NP conjuncts are not ("the dog
            # and the dog chased" has no verb before the conjunction)
            j2 = k + 1
            while j2 < n and toks[j2].pos in ("DET", "ADJ", "NUM",
                                              "NOUN", "PROPN"):
                j2 += 1
            # AUX-headed ("the horse WAS chasing") or finite-verb-headed
            # ("a lion CONSUMES") second clauses split; "the mouse
            # chased BY the dog" stays a reduced relative over an NP
            # conjunct (test_participle_phrase_with_conjunction) — the
            # following 'by' marks the participle reading
            np_clause = (j2 > k + 1 and j2 < n
                         and (toks[j2].pos == "AUX"
                              or (toks[j2].pos == "VERB"
                                  and not (j2 + 1 < n
                                           and toks[j2 + 1].text.lower()
                                           == "by"))))
            # an OPEN relative clause before the conjunction claims the
            # following verb as its main predicate ("the dog who chased
            # the cat and cat CAME home") — no clause split there
            open_rel = any(
                toks[i].pos == "PRON" and i > 0
                and toks[i].text.lower() in ("who", "which", "that")
                and toks[i - (2 if toks[i - 1].text == "," else 1)].pos
                in ("NOUN", "PROPN")
                for i in range(1, k))
            is_clause_cconj = (
                toks[k].pos == "CCONJ"
                and (nom_pron or (np_clause and not open_rel))
                and any(t2.pos in ("VERB", "AUX") for t2 in toks[k + 2:])
                and any(t2.pos in ("VERB", "AUX") for t2 in toks[:k]))
            is_sconj = (
                toks[k].pos == "SCONJ"
                and any(t2.pos in ("VERB", "AUX") for t2 in toks[k + 1:])
                and any(t2.pos in ("VERB", "AUX") for t2 in toks[:k]))
            if is_clause_cconj or is_sconj:
                left = _parse_sentence(toks[:k], lang)
                right = _parse_sentence(toks[k + 1:], lang)
                left_root = next((t2 for t2 in toks[:k]
                                  if t2.dep == "ROOT"), toks[0])
                toks[k].dep = "cc" if is_clause_cconj else "mark"
                toks[k].head = left_root.i
                return left + right

    # --- verb chain & root
    verb_pos = [j for j, t in enumerate(toks) if t.pos == "VERB"]
    aux_pos = [j for j, t in enumerate(toks) if t.pos == "AUX"]

    # --- relative clause detection: "NP who/which/that VERB … MAINVERB"
    # (reference relative constructions,
    #  en language_specific_rules.py:287-476)
    rel = None  # (rel_pron, rel_verb, main_predicate, antecedent_local)
    for rp, t in enumerate(toks):
        # non-restrictive relatives sit behind a comma ("his son, who
        # was excited"): the antecedent is the nominal before it
        ante_rp = rp - 1
        if rp > 1 and toks[rp - 1].text == "," \
                and toks[rp - 2].pos in ("NOUN", "PROPN"):
            ante_rp = rp - 2
        if t.text.lower() in ("who", "which", "that", "whose") and rp > 0 \
                and toks[ante_rp].pos in ("NOUN", "PROPN") and t.pos == "PRON":
            # 'to' infinitives are PART-tagged, so verbs here are finite;
            # an AUX directly after the pronoun heads a copular relative
            # clause ("the dog that was old …")
            vafter = sorted(v for v in verb_pos + aux_pos
                            if v > rp and toks[v - 1].text.lower() != "to")
            if vafter:
                rel_v = vafter[0]
                # conjoined relative-clause verbs ("who chased and
                # caught the cat") belong to the relative clause, not
                # the main predicate (reference test_semantics_EN.py:
                # 216-224 test_who_predicate_conjunction)
                rel_end = rel_v
                while rel_end + 2 < len(toks) \
                        and toks[rel_end + 1].pos == "CCONJ" \
                        and rel_end + 2 in set(verb_pos):
                    rel_end += 2
                # progressive relative clause ("who WAS THINKING about
                # …", "that HAD BEEN CHASING it"): the rel verb is the
                # -ing content verb behind the aux chain, not the aux
                # (reference test_semantics_EN.py:529-534)
                probe = rel_v
                while probe in aux_pos and probe + 1 < len(toks) \
                        and toks[probe + 1].pos == "AUX":
                    probe += 1
                if probe in aux_pos and probe + 1 in set(verb_pos) \
                        and toks[probe + 1].text.lower().endswith("ing"):
                    rel_v = probe + 1
                    rel_end = max(rel_end, rel_v)
                # main predicate: next FINITE verb OR aux (copula) after
                # the rel verb group; verbs after ADP/'being'/'to' are
                # non-finite complements inside the rel clause
                preds = sorted(
                    v for v in verb_pos + aux_pos if v > rel_end
                    # only a content VERB after an ADP is a non-finite
                    # complement ("thinking ABOUT CHASING"); an AUX
                    # after a dangling displaced preposition IS the
                    # main predicate ("…you ate your roll at WAS new")
                    and not (v > 0 and ((toks[v - 1].pos == "ADP"
                                         and v in set(verb_pos))
                                        or toks[v - 1].text.lower()
                                        in ("to", "being"))))
                if preds:
                    rel = (rp, rel_v, preds[0], ante_rp)
                    break
                # sentence-FINAL relative clause ("chased the cat who
                # told nobody"): the main predicate precedes the
                # antecedent (reference test_semantics_EN.py:130-135 —
                # child-clause negation must not leak to the parent)
                if any(v < rp for v in verb_pos + aux_pos):
                    rel = (rp, rel_v, None, ante_rp)
                    break
    rel_bare = False
    if rel is None and lang == "en":
        # bare object relative ("The cat the dog chased was tired"):
        # two directly-adjacent NPs, a finite verb, then the main
        # predicate. The antecedent gets the reference's 'relant' label
        # (en language_specific_rules.py:362-365 — only WITHOUT a
        # complementizer; that/which keep the original label).
        spans = _chunk_nps(toks, lang)
        vset = set(verb_pos)
        for k in range(len(spans) - 1):
            (s1, e1, h1), (s2, e2, h2) = spans[k], spans[k + 1]
            v = e2 + 1
            if (s2 == e1 + 1 and toks[s2].pos in ("DET", "PRON") and v < n
                    and v in vset
                    and toks[v - 1].text.lower() != "to"
                    and any(p > v for p in verb_pos + aux_pos)):
                preds = sorted(p for p in verb_pos + aux_pos if p > v)
                rel = (e1, v, preds[0], h1)
                rel_bare = True
                break
    rel_final = rel is not None and rel[2] is None
    rel_region: set[int] = set()
    if rel:
        rel_region = set(range(rel[0], len(toks) if rel_final else rel[2]))
    # non-copular subject-relative interiors are scanned as their own
    # post-verbal segment (see the scan below)
    rel_interior_scanned = bool(
        rel and not rel_final and not rel_bare
        and rel[1] in set(verb_pos)
        and toks[rel[0]].text.lower() != "whose"
        and all(toks[k].pos in ("VERB", "AUX", "PART", "ADV")
                for k in range(rel[0] + 1, rel[1])))

    root_local: int
    copula = False
    passive = False
    # finite verbs only: an infinitive after 'to' cannot head the clause
    # ("A holiday is hard to book" — root is the copula, not 'book')
    finite_verbs = [v for v in verb_pos
                    if not (v > 0 and toks[v - 1].text.lower() == "to"
                            and toks[v - 1].pos == "PART")
                    # a gerund governed by a preposition is a clause
                    # COMPLEMENT, never the root ("It was happy ABOUT
                    # CHASING a cat" roots at the copula) — same for the
                    # passive variant ("happy about BEING CHASED")
                    and not (v > 0 and toks[v - 1].pos == "ADP"
                             and toks[v].text.lower().endswith("ing"))
                    and not (v > 1 and toks[v - 1].text.lower() == "being"
                             and toks[v - 2].pos == "ADP")]
    main_verbs = [v for v in finite_verbs if v not in rel_region]
    if rel and not rel_final:
        root_local = rel[2]
        if root_local in aux_pos and root_local not in verb_pos:
            copula = True  # "the cat that the dog chased WAS old"
    elif main_verbs:
        root_local = main_verbs[0]
    elif aux_pos:
        root_local = aux_pos[-1]
        copula = True
        # 'do'/'have' as a MAIN verb ("He should do it", "The donkey
        # has a roof") is transitive, not copular — spaCy gives these a
        # dobj, and the reference's reverse-only parent lemmas then
        # yield predicate phraselets (en rules :834-845; reference
        # test_semantics_EN.py:438-459)
        if toks[root_local].text.lower() in L.DO_FORMS_EN \
                or toks[root_local].text.lower() in L.HAVE_FORMS_EN:
            copula = False
        # German 'haben' as main verb is equally transitive ("Der Esel
        # HAT ein Dach" — oa in the reference parse, so the haben-dach
        # relation is verb-acc, not verb-pd)
        if lang == "de" and toks[root_local].text.lower() in (
                "hat", "hatte", "hatten", "haben", "habe"):
            copula = False
    elif verb_pos:
        root_local = verb_pos[0]
    else:
        nps = _chunk_nps(toks, lang)
        root_local = nps[0][2] if nps else 0
    if root_local in set(verb_pos):
        # passive: a BE aux before the verb + participle form; German
        # verb-final clauses put the werden-aux AFTER the participle
        # ("…, die vom Hund gejagt WURDE")
        _wf = {"wird", "wurde", "wurden", "werden", "worden", "ist", "war"}
        be_before = [a for a in aux_pos
                     if a < root_local and a not in rel_region
                     and toks[a].text.lower() in L.BE_FORMS_EN | _wf]
        if lang == "de":
            be_before += [a for a in aux_pos
                          if a > root_local and a not in rel_region
                          and toks[a].text.lower() in
                          {"wird", "wurde", "wurden", "werden", "worden"}]
        if be_before and _is_participle(toks[root_local].text):
            passive = True
        if passive and lang == "de":
            # "wird … gejagt HABEN" is the ACTIVE future perfect, not
            # a werden-passive (reference de test_semantics :161-170:
            # '1:sb; 4:oa'): a bare haben-infinitive after the
            # participle (with no werden/worden in between) flips the
            # analysis back to active
            for j2 in range(root_local + 1, n):
                w2 = toks[j2].text.lower()
                if w2 in ("werden", "worden"):
                    break
                if w2 == "haben" and toks[j2].pos in ("AUX", "VERB"):
                    passive = False
                    break
    root = toks[root_local]
    root.dep = "ROOT"
    root.head = root.i

    nps = _chunk_nps(toks, lang)

    # --- conjunction folding BEFORE role assignment (reference
    # parsing.py:1209-1223 righthand siblings): "X and Y" — the left
    # conjunct takes the grammatical role; Y hangs off X as conj and
    # inherits X's deps (uncertain) afterwards
    conj_right: set[int] = set()
    or_members: set[int] = set()
    head_list = [h for (_, _, h) in nps]
    for j, t in enumerate(toks):
        if t.pos == "CCONJ" and 0 < j < n - 1 and t.dep != "cc":
            # verb conjunction ("chased and caught"): conjoin the verbs
            # directly; argument sharing happens in dep distribution
            # (reference test_semantics_EN.py:216-224)
            if toks[j - 1].pos == "VERB" and toks[j + 1].pos == "VERB":
                lv, rv = j - 1, j + 1
                toks[rv].head = toks[lv].i
                toks[rv].dep = "conj"
                toks[j].head = toks[lv].i
                toks[j].dep = "cc"
                if toks[rv].i not in toks[lv].righthand_siblings:
                    toks[lv].righthand_siblings.append(toks[rv].i)
                if t.text.lower() in ("or", "oder"):
                    or_members.update({toks[lv].i, toks[rv].i})
                continue
            # verb conjoined after an object NP ("aß das Fleisch UND
            # TRANK", "saw them AND LAUGHED"): the right verb conjoins
            # with the clause's last verb and shares only the SUBJECT
            # (reference de test_semantics :757-760 — trank gets
            # '1:sb' alone; en :695-698 — laughed gets '0:nsubj(U)',
            # uncertain in English)
            if toks[j + 1].pos == "VERB" \
                    and toks[j - 1].pos != "VERB" \
                    and (j + 2 == n or toks[j + 2].pos == "PUNCT") \
                    and any(v < j for v in verb_pos):
                lv = max(v for v in verb_pos if v < j)
                rv = j + 1
                toks[rv].head = toks[lv].i
                toks[rv].dep = "vconj_subj_only"
                toks[j].head = toks[lv].i
                toks[j].dep = "cc"
                continue
            left = next((h for h in reversed(head_list) if h < j), None)
            right = next((h for h in head_list if h > j), None)
            # structural parallelism: when the RIGHT conjunct heads its
            # own PP ("Extraktion von Information und ENTFÜHRUNG VON
            # LÖWEN"), the coordination is with the PP-GOVERNING noun
            # (Extraktion), not the noun inside the left PP — climb out
            # of pobj position like the reference parse does
            if left is not None and right is not None:
                r_np = next((p for p in nps if p[2] == right), None)
                r_has_pp = (r_np is not None and r_np[1] + 1 < n
                            and toks[r_np[1] + 1].pos == "ADP")
                while r_has_pp:
                    l_np = next((p for p in nps if p[2] == left), None)
                    if (l_np is None or l_np[0] == 0
                            or toks[l_np[0] - 1].pos != "ADP"):
                        break
                    prev = next((h for h in reversed(head_list)
                                 if h < l_np[0] - 1), None)
                    if prev is None:
                        break
                    left = prev
            if left is not None and right is not None and right not in conj_right:
                # extend leftwards through comma-separated conjuncts
                # ("The dog, the wolf and the hound" — reference
                # test_semantics_EN.py:27-34 anchors righthand_siblings
                # [wolf, hound] on the FIRST conjunct)
                chain = [left]
                li = next(k for k, (_, _, h) in enumerate(nps) if h == left)
                while li > 0:
                    ps, pe, ph = nps[li - 1]
                    cs = nps[li][0]
                    between = toks[pe + 1:cs]
                    if (len(between) == 1 and between[0].pos == "PUNCT"
                            and between[0].text == ","
                            and ph not in conj_right):
                        chain.insert(0, ph)
                        li -= 1
                    else:
                        break
                first = chain[0]
                for m in chain[1:] + [right]:
                    toks[m].head = toks[first].i
                    toks[m].dep = "conj"
                    if toks[m].i not in toks[first].righthand_siblings:
                        toks[first].righthand_siblings.append(toks[m].i)
                    conj_right.add(m)
                toks[j].head = toks[first].i
                toks[j].dep = "cc"
                if t.text.lower() in ("or", "oder"):
                    # disjunction: every dep touching any member is
                    # uncertain (reference: 'The dog or the dog chased
                    # …' → all matches uncertain,
                    # test_structural_matching_EN.py:150-168)
                    or_members.update(toks[m].i for m in chain + [right])

    # --- NP-internal deps
    np_heads = []
    for (s, e, h) in nps:
        np_heads.append(h)
        for j in range(s, e + 1):
            if j == h:
                continue
            t = toks[j]
            t.head = toks[h].i
            if t.pos == "DET":
                t.dep = "det"
            elif t.text.lower().endswith(("'s", "’s")) and t.pos in ("NOUN", "PROPN"):
                # possessor: "a gardener's plant" → poss(plant, gardener)
                # (reference word-ofword template deps ["pobjo","poss"],
                # language_specific_rules.py:1138-1147)
                t.dep = "poss"
                add(toks[h].i, t.i, "poss")
            elif t.pos == "ADJ":
                t.dep = "amod"
                add(toks[h].i, t.i, "amod")
            elif t.pos == "NUM":
                t.dep = "nummod"
                add(toks[h].i, t.i, "nummod")
            elif t.pos in ("NOUN",) and j + 1 <= e \
                    and toks[j + 1].hyph_prev and toks[j + 1].pos == "ADJ" \
                    and lemma(toks[j + 1].text.lower(), "en") in L.VERB_LEMMAS_EN:
                # hyphenated participial compound (reference en
                # language_specific_rules.py advmodobj/advmodsubj
                # adverbial-phrase deps, tests test_objective/
                # subjective_modifying_adverbial_phrase): the internal
                # noun is the participle's argument, not the head's
                # compound — "cat-chasing dog" → advmodobj(chase, cat);
                # "dog-chased cat" → advmodsubj(chase, dog)
                part = toks[j + 1]
                is_ing = part.text.lower().endswith("ing")
                t.dep = "advmodobj" if is_ing else "advmodsubj"
                t.head = part.i
                add(part.i, t.i, t.dep)
                # the head noun takes the complementary role, certain
                # on the anchor (ref :694-703: conjunct copies get
                # uncertain=True via noun.i != token.head.i)
                add(part.i, toks[h].i,
                    "advmodsubj" if is_ing else "advmodobj")
            elif t.pos in ("NOUN",):
                t.dep = "compound"
                add(toks[h].i, t.i, "compound")
            elif t.pos == "PROPN":
                t.dep = "compound"
                # name-part compounds carry a semantic dep too (spaCy
                # emits compound for every name part); phraselet
                # production drops the parts INSIDE the substituted
                # multiword via its ignore set, so this only surfaces
                # when an ontology-defined multiword is narrower than
                # the entity span ('A big Richard Pranaya Jones' →
                # noun-noun: pranaya jones-richard,
                # tests/en/test_topic_matching_EN.py:1066-1077)
                add(toks[h].i, t.i, "compound")
            elif t.pos == "CCONJ":
                t.dep = "cc"  # NP-internal adjective conjunction
            else:
                t.dep = "dep"

    # --- aux attachment
    for a in aux_pos:
        if a == root_local:
            # the clause root (copular 'is' or main-verb 'has'/'does')
            # keeps its ROOT dep
            continue
        gov = toks[rel[1]] if (rel and a in rel_region) else root
        toks[a].head = gov.i
        toks[a].dep = "auxpass" if passive and toks[a].text.lower() in L.BE_FORMS_EN else "aux"

    # --- negation particle: "not ADJ" attaches to the adjective (spaCy
    # attaches 'not' to the predicative adjective, which is what scopes
    # "the dog that was not old" correctly — reference set_negation
    # walks syntactic children only)
    for j, t in enumerate(toks):
        if t.pos == "PART" and t.text.lower() in ("not", "n't", "nicht"):
            if j + 1 < n and toks[j + 1].pos == "ADJ":
                gov = toks[j + 1]
            elif rel and j in rel_region:
                gov = toks[rel[1]]
            else:
                gov = root
            t.head = gov.i
            t.dep = "neg"
            add(gov.i, t.i, "neg")

    # --- pre-verbal PP attachment: "NP1 of NP2 <verb>" — NP2 attaches
    # to NP1 (word-ofword / prepgovernor-noun), NP1 stays the subject
    first_v = min(verb_pos + aux_pos) if (verb_pos or aux_pos) else None
    consumed_pp: set[int] = set()
    if first_v is not None:
        for j, t in enumerate(toks):
            if t.pos != "ADP" or j >= first_v or j in rel_region:
                continue
            left = next(((s, e, h) for (s, e, h) in nps if e == j - 1), None)
            right = next(((s, e, h) for (s, e, h) in nps if s == j + 1), None)
            if left and right and not (lang == "de"
                                       and toks[left[2]].pos == "PRON"):
                # a German PP behind a (relative) pronoun belongs to
                # the verb-final clause, not the pronoun ("…, die VOM
                # HUND gejagt wurde") — left for the mid-field scan
                t.head = toks[left[2]].i
                t.dep = "prep"
                rh = toks[right[2]]
                rh.head = t.i
                rh.dep = "pobj"
                # pobjo = "of"-genitive; pobjb = deverbal by-agent
                # ("a performance BY the boys" ≈ "the boys perform",
                # reference deps ["pobjo"/"pobjb"], en rules :594-616)
                pw2 = t.text.lower()
                label = ("pobjo" if pw2 in ("of", "von")
                         else "pobjb" if pw2 in ("by", "von")
                         else "pobjp")
                add(toks[left[2]].i, rh.i, label, prep=pw2)
                # German Vorfeld PP: a plain preposition inside the
                # pre-verbal subject field ALSO modifies the clause
                # verb (uncertain moposs; "Informationsextraktion AUS
                # DEN DATEN wurde durchgeführt" → prepgovernor-noun:
                # durchführen-datum, ref production DE :215)
                if lang == "de" and label == "pobjp" \
                        and root_local in set(verb_pos):
                    add(toks[root_local].i, rh.i, "pobjp",
                        uncertain=True, prep=pw2)
                # the prep→object dep itself feeds the reverse-only
                # prep-noun template (prep-noun: aus-datum)
                add(t.i, rh.i, "pobj")
                consumed_pp.add(right[2])

    # --- relative clause internals (reference relant handling,
    # language_specific_rules.py:287-476); shared between mid-sentence
    # relatives (antecedent = main subject) and sentence-final ones
    # (antecedent = main object, applied after the post-verbal scan)
    def _rel_internals() -> None:
        rp, rel_verb, _, ante = rel
        rel_bound = len(toks) if rel_final else rel[2]
        st = toks[ante]
        rt = toks[rel_verb]
        rt.head = st.i
        rt.dep = "relcl"
        if not rel_bare:
            toks[rp].head = rt.i
            toks[rp].dep = "relpron"
        rel_nps = [(s, e, h) for (s, e, h) in nps if rp < s < rel_bound]
        subject_relative = all(
            toks[k].pos in ("VERB", "AUX", "PART", "ADV")
            for k in range(rp + 1, rel_verb))
        if toks[rp].text.lower() == "whose":
            # whose-clause (reference relative constructions,
            # en language_specific_rules.py:287-476): "the man whose dog
            # chased the cat" — the NP after 'whose' is the relative
            # clause's subject AND is possessed by the antecedent
            wnp = next(((ws, we, wh) for (ws, we, wh) in nps if ws == rp + 1), None)
            if wnp is not None:
                wht = toks[wnp[2]]
                add(wht.i, st.i, "poss")
                wht.head = rt.i
                wht.dep = "nsubj"
                add(rt.i, wht.i, "nsubj")
                # conjoined possessed nouns ("whose computer and
                # computer I repaired") each carry the antecedent's
                # poss CERTAINLY — the reference builds these inside
                # its relative-construction handling, not the
                # uncertain generic sibling copy (ref en test :308:
                # both matches certain vs :299 possessor conjunction,
                # where the copy IS uncertain)
                for sib in wht.righthand_siblings:
                    add(sib, st.i, "poss", uncertain=False)
                toks[rp].head = wht.i
                toks[rp].dep = "relpron"
                obj_nps = [(s2, e2, h2) for (s2, e2, h2) in rel_nps
                           if s2 > wnp[1]]
                if obj_nps:
                    oh = toks[obj_nps[0][2]]
                    oh.head = rt.i
                    oh.dep = "dobj"
                    add(rt.i, oh.i, "dobj")
        elif subject_relative:
            add(rt.i, st.i, "nsubj")          # "the man who chased ..."
            if rel_verb in aux_pos and rel_verb not in verb_pos:
                # copular relative ("the dog that was old chased …"):
                # the predicative ADJ rewires to amod on the antecedent
                # (reference predicative-adjective handling,
                # parsing.py:1318-1357)
                for k in range(rel_verb + 1, rel_bound):
                    if toks[k].pos == "ADJ":
                        toks[k].head = st.i
                        toks[k].dep = "amod"
                        add(st.i, toks[k].i, "amod")
            elif rel_nps and not rel_interior_scanned:
                # object inside the relative clause (only when the
                # interior was not already scanned as a segment) —
                # attaches to the LAST conjoined relative verb ("who
                # chased and caught the cat" → caught-cat,
                # test_semantics_EN.py:216-224)
                obj_gov = (toks[rt.righthand_siblings[-1] - off]
                           if rt.righthand_siblings else rt)
                oh = toks[rel_nps[0][2]]
                oh.head = obj_gov.i
                oh.dep = "dobj"
                add(obj_gov.i, oh.i, "dobj")
        else:
            # object relative: a that/which/who complementizer keeps the
            # ORIGINAL label (dobj), bare relatives get 'relant'
            # (reference en language_specific_rules.py:357-365;
            # test_semantics_EN.py:274-297). With conjoined antecedents
            # the dep anchors on the FIRST conjunct — the later ones get
            # uncertain copies ("The cat and the mouse that the dog
            # chased" → 1:dobj; 4:dobj(U), test_semantics_EN.py:282-286)
            tgt = st.i
            anchor = next((t2 for t2 in toks
                           if st.i in t2.righthand_siblings), None)
            if anchor is not None:
                tgt = anchor.i
            lbl = "relant" if rel_bare else "dobj"
            add(rt.i, tgt, lbl)
            for sib in toks[tgt - off].righthand_siblings:
                add(rt.i, sib, lbl, uncertain=True)
            pre_rel = [h for (s, e, h) in rel_nps if h < rel_verb]
            if pre_rel:
                sh = toks[pre_rel[-1]]
                sh.head = rt.i
                sh.dep = "nsubj"
                add(rt.i, sh.i, "nsubj")

    # --- subject: closest NP head strictly before the verb/aux chain
    subj_local = None
    if rel and not rel_final:
        # main-clause subject = the relative clause's antecedent
        subj_local = rel[3]
        st = toks[subj_local]
        st.head = root.i
        st.dep = "nsubjpass" if passive else "nsubj"
        add(root.i, st.i, st.dep)
        _rel_internals()
    elif first_v is not None:
        # initial/fronted interrogatives are not subject candidates;
        # in subject-aux inversion ("Where did somebody sing?") the
        # subject sits between the aux and the verb
        q_front = None
        for qi2, qt2 in enumerate(toks):
            if qt2.pos == "PRON" and qt2.text.lower() in (
                    L.INTERROGATIVES_EN | {"wer", "was", "wo", "wann",
                                           "warum", "wie", "wem", "wen"}):
                if qi2 == 0 or (
                        any(toks[k].pos == "ADP" for k in range(qi2))
                        and all(toks[k].pos in ("ADP", "DET", "NOUN")
                                for k in range(qi2))):
                    q_front = qi2
                break
        is_q0 = q_front is not None
        pre = [h for h in np_heads
               if h < first_v and h not in conj_right and h not in consumed_pp
               and not (is_q0 and h <= q_front)]
        if not pre and (is_q0 or first_v == 0) and first_v in aux_pos:
            # subject–aux inversion: WH-fronted ("Where DID somebody
            # sing?") or clause-initial aux ("DID Richard come?") — the
            # subject sits between the aux and the verb
            pre = [h for h in np_heads if first_v < h < root_local]
        if pre:
            if lang == "de" and len(pre) >= 2 \
                    and all(h < root_local for h in np_heads):
                # verb-final subordinate order ("dass EIN HUND EINE
                # KATZE gejagt hatte"): first NP is the subject, the
                # rest are objects — dative when the determiner is
                # unambiguous (dem/einem), else accusative.
                # Determiner case can OVERRIDE linear order (reference
                # de test_semantics :230-244 — "Die Katze wird DER
                # HUND gejagt haben" is OVS: 'der' marks the
                # nominative, 'den' the accusative):
                def _det_of(h2):
                    sp3 = next(((s3, e3) for (s3, e3, hh3) in nps
                                if hh3 == h2), None)
                    if sp3 is None or (
                            sp3[0] > 0 and toks[sp3[0] - 1].pos == "ADP"):
                        return None  # PP-governed: never a candidate
                    return toks[sp3[0]].text.lower()
                cand = [h2 for h2 in pre if _det_of(h2) is not None]
                nom = [h2 for h2 in cand if _det_of(h2) == "der"]
                acc = [h2 for h2 in cand if _det_of(h2) in ("den",
                                                            "einen")]
                if len(nom) == 1 and len(cand) >= 2:
                    subj_local = nom[0]
                elif len(acc) >= 1 and len(acc) < len(cand):
                    subj_local = next(h2 for h2 in cand
                                      if h2 not in acc)
                else:
                    subj_local = pre[0]
                st = toks[subj_local]
                st.head = root.i
                st.dep = "nsubjpass" if passive else "nsubj"
                add(root.i, st.i, st.dep)
                for h in pre:
                    if h == subj_local:
                        continue
                    span = next(((s, e) for (s, e, hh) in nps if hh == h),
                                None)
                    # mid-field PP ("…, die VOM HUND gejagt wurde"):
                    # an NP governed by a preposition is no object —
                    # under a werden-passive the von/vom/durch phrase
                    # is the agent (pobjb), otherwise a plain
                    # prepositional dependent (pobjp)
                    pp = (span is not None and span[0] > 0
                          and toks[span[0] - 1].pos == "ADP")
                    if pp:
                        prep_t = toks[span[0] - 1]
                        pw = prep_t.text.lower()
                        prep_t.head = root.i
                        prep_t.dep = ("agent" if passive and pw in
                                      ("von", "vom", "durch") else "prep")
                        add(root.i, prep_t.i, "prep")
                        toks[h].head = prep_t.i
                        toks[h].dep = "pobj"
                        add(prep_t.i, toks[h].i, "pobj")
                        add(root.i, toks[h].i,
                            "pobjb" if prep_t.dep == "agent" else "pobjp",
                            prep=pw)
                        continue
                    det_w = (toks[span[0]].text.lower()
                             if span is not None else "")
                    # dative-marked determiner OR dative pronoun form
                    # (ihm/ihnen — "Alle folgten IHNEN" must carry the
                    # same label as "folgt EINEM Elefanten")
                    lbl = ("dative"
                           if det_w in ("dem", "einem")
                           or toks[h].text.lower() in ("ihm", "ihnen")
                           else "dobj")
                    toks[h].head = root.i
                    toks[h].dep = lbl
                    add(root.i, toks[h].i, lbl)
            else:
                subj_local = pre[-1]
                if lang == "de" and not passive and first_v in aux_pos \
                        and root_local > first_v + 1 \
                        and root_local in set(verb_pos):
                    # OVS with case-marked mid-field subject ("Die
                    # Katze wird DER HUND gejagt haben" / "DEN Hund
                    # wird die Katze gejagt haben" — reference de
                    # test_semantics :230-244: '1:oa; 4:sb'): an
                    # unambiguous nominative in the mid-field, or an
                    # unambiguous accusative in the Vorfeld, flips
                    # the roles
                    def _np_det(h2):
                        sp3 = next(((s3, e3) for (s3, e3, hh3) in nps
                                    if hh3 == h2), None)
                        if sp3 is None or (sp3[0] > 0 and
                                           toks[sp3[0] - 1].pos == "ADP"):
                            return None
                        return toks[sp3[0]].text.lower()
                    mid = [h2 for h2 in np_heads
                           if first_v < h2 < root_local
                           and h2 not in conj_right
                           and _np_det(h2) is not None]
                    pdet = _np_det(subj_local)
                    m_nom = [h2 for h2 in mid if _np_det(h2) == "der"]
                    flip = None
                    if len(m_nom) == 1 and pdet in ("die", "das",
                                                    "den", "einen"):
                        flip = m_nom[0]
                    elif pdet in ("den", "einen") and len(mid) == 1:
                        flip = mid[0]
                    if flip is not None:
                        fronted = subj_local
                        subj_local = flip
                        ft = toks[fronted]
                        ft.head = root.i
                        ft.dep = "dobj"
                        add(root.i, ft.i, "dobj")
                st = toks[subj_local]
                st.head = root.i
                st.dep = "nsubjpass" if passive else "nsubj"
                add(root.i, st.i, st.dep)

    # --- post-verbal material; `cur` tracks the governing verb and
    # switches to the xcomp verb across infinitival 'to' (control
    # verbs, reference language_specific_rules.py:169-285)
    got_obj = False
    dobj_local = None
    cur = root
    elided_unc_verbs: set[int] = set()
    last_np = None  # (end_local, head_local) of the last consumed NP
    # scan segments (start, end, governing-verb): after the root verb;
    # for verb-final clauses (German passive "wurde vom Hund gejagt")
    # the mid-field between the finite aux and the clause-final
    # participle; and the interior of a non-copular subject-relative
    # clause, governed by the relative verb ("who was thinking ABOUT
    # CHASING A CAT came home"). A sentence-final relative clause is
    # excluded from the main segment (handled by _rel_internals below)
    segments = [[root_local + 1, rel[0] if rel_final else n, root_local]]
    if lang == "de" and first_v is not None and root_local > first_v + 1 \
            and root_local in set(verb_pos) and first_v in set(aux_pos):
        segments.append([first_v + 1, root_local, root_local])
    if rel_interior_scanned:
        # subject-relative interior scanned like a clause of its own
        segments.insert(0, [rel[1] + 1, rel[2], rel[1]])
    elif rel and not rel_final and rel[2] is not None \
            and rel[1] + 1 < rel[2] and toks[rel[2] - 1].pos == "ADP":
        # object-relative interior ending in a displaced preposition
        # ("you ate YOUR ROLL AT was new"): scan the inner objects so
        # the dangling preposition can take the antecedent (reference
        # displaced-preposition handling, en rules :395-420)
        segments.insert(0, [rel[1] + 1, rel[2], rel[1]])
    seg_idx = 0
    j, scan_end, _seg_cur = segments[0]
    cur = toks[_seg_cur]
    while True:
        if j >= scan_end:
            seg_idx += 1
            if seg_idx >= len(segments):
                break
            j, scan_end, _seg_cur = segments[seg_idx]
            cur = toks[_seg_cur]
            got_obj = False
            dobj_local = None
            last_np = None
            continue
        t = toks[j]
        xcomp_passive = False
        is_xcomp_verb = (t.pos == "VERB" and j > 0
                         and toks[j - 1].text.lower() == "to"
                         and toks[j - 1].pos == "PART")
        if (not is_xcomp_verb and t.pos == "VERB" and j > 1
                and toks[j - 1].text.lower() in ("be", "being")
                and toks[j - 2].text.lower() == "to"
                and toks[j - 2].pos == "PART"
                and _is_participle(t.text)):
            # passive infinitival complement: "decided TO BE CHASED" —
            # the controller is the xcomp verb's PASSIVE subject
            # (reference test_semantics_EN.py:190-205
            # test_complementizing_clause_*_child_clause_passive)
            is_xcomp_verb = True
            xcomp_passive = True
            toks[j - 1].head = t.i
            toks[j - 1].dep = "auxpass"
        if is_xcomp_verb:
            off_to = 2 if xcomp_passive else 1
            if (j - off_to - 1 >= 0
                    and toks[j - off_to - 1].pos == "CCONJ"
                    and cur.dep == "xcomp"):
                # conjoined infinitives ("demands to explain AND TO
                # EXPLAIN"): the second infinitive is a righthand
                # sibling of the first, NOT its complement — the
                # sibling copy pass then distributes the matrix xcomp
                # and controller deps with original certainty
                # (reference en test :740: both matches derivation,
                # one per conjunct)
                t.head = cur.head
                t.dep = "xcomp"
                toks[j - off_to].head = t.i
                toks[j - off_to].dep = "aux"
                if t.i not in cur.righthand_siblings:
                    cur.righthand_siblings.append(t.i)
                j += 1
                continue
            t.head = cur.i
            t.dep = "xcomp"
            toks[j - off_to].head = t.i
            toks[j - off_to].dep = "aux"
            if (cur.i == root.i and not passive and not got_obj
                    and root.text.lower() in ("used", "going")):
                # semantic auxiliaries "used to V" / "going to V"
                # (reference test_semantics_EN.py:303-330): the matrix
                # verb is elided — the infinitive takes over its deps;
                # "WAS going to" makes them uncertain, "used to" and
                # "is going to" keep certainty. With an intervening
                # object ("used the mouse to chase") this is ordinary
                # object control, not elision (test_used_to_negative_2)
                unc = any(toks[a].text.lower() in ("was", "were")
                          for a in aux_pos if a < root_local)
                for d in deps:
                    if d["parent"] == root.i:
                        d["parent"] = t.i
                        if xcomp_passive and d["label"] == "nsubj":
                            # passive infinitive ("used to BE CHASED"):
                            # the subject is the patient
                            d["label"] = "nsubjpass"
                        if unc:
                            d["uncertain"] = True
                if unc:
                    elided_unc_verbs.add(t.i)
                cur = t
                got_obj = False
                dobj_local = None
                j += 1
                continue
            # xcomp is a predicate-patient dependency in the reference
            # ("decide to open" → predicate-patient: decide-open,
            # language_specific_rules.py:1126-1136). In the
            # tough-movement shape ("is HARD to book") the infinitive
            # hangs off the predicative ADJECTIVE like in spaCy — the
            # adjective's JJ tag then excludes it from the
            # predicate-patient template (reference parent tags
            # en rules :1126-1136), so no be-book phraselet arises
            tough = copula and any(tk.dep == "acomp" for tk in toks)
            if tough:
                acomp_i = next(tk.i for tk in toks if tk.dep == "acomp")
                add(acomp_i, t.i, "xcomp")
            else:
                add(cur.i, t.i, "xcomp")
            # ANY predicative adjective + infinitive gives the matrix
            # subject an uncertain 'arg' dependency on the infinitive —
            # both subjective ("glad to understand") and objective
            # ("hard to reach") variants (reference
            # test_semantics_EN.py:802-827 + 'arg' rules :558-797)
            # object control: "ordered the dog to chase" — the matrix
            # OBJECT is the infinitive's subject (reference
            # test_semantics_EN.py:184-187); else subject control
            controller = dobj_local if (got_obj and dobj_local is not None) \
                else subj_local
            if controller is not None:
                if tough:
                    # tough movement: "a holiday is hard to book" — the
                    # matrix subject is the infinitive's OBJECT
                    # (reference 'arg', language_specific_rules.py:558-797)
                    add(t.i, toks[controller].i, "arg", uncertain=True)
                else:
                    # control: the controller is also the xcomp verb's
                    # subject, uncertain (reference :169-285)
                    add(t.i, toks[controller].i,
                        "nsubjpass" if xcomp_passive else "nsubj",
                        uncertain=True)
            cur = t
            got_obj = False
            dobj_local = None
            j += 1
            continue
        if (lang == "en" and t.pos == "VERB" and j > 0
                and not is_xcomp_verb
                and (toks[j - 1].pos == "ADP"
                     # phrasal-verb particle before the gerund ("kept
                     # ON SINGING" — reference en test_semantics
                     # :666-698: singing gets the matrix subjects
                     # uncertainly, like thinking-about)
                     or (toks[j - 1].pos == "PART"
                         and toks[j - 1].dep == "prt")
                     or (j > 1 and toks[j - 1].text.lower() == "being"
                         and toks[j - 2].pos == "ADP"))
                and (t.text.lower().endswith("ing") or _is_participle(t.text))):
            # prepositional complement ("thinking ABOUT CHASING a cat",
            # "thinking about BEING CHASED by a dog"): the matrix
            # subject is the gerund's uncertain subject; the passive
            # variant makes it nsubjpass (reference
            # test_semantics_EN.py:518-601)
            pcomp_passive = toks[j - 1].text.lower() == "being"
            prep_tok = toks[j - 2] if pcomp_passive else toks[j - 1]
            t.head = prep_tok.i
            t.dep = "pcomp"
            # the gerund complement also reaches the prep's governor
            # ("managed it BY WORKING hard" — question matching gates
    # on the prep, reference en rules :1425-1429)
            add(cur.i, t.i, "pobjp", prep=prep_tok.text.lower())
            if pcomp_passive:
                toks[j - 1].head = t.i
                toks[j - 1].dep = "auxpass"
            if subj_local is not None:
                add(t.i, toks[subj_local].i,
                    "nsubjpass" if pcomp_passive else "nsubj",
                    uncertain=True)
            cur = t
            got_obj = False
            dobj_local = None
            j += 1
            continue
        if (lang == "en" and t.pos == "VERB" and t.i != root.i
                and not is_xcomp_verb and _is_participle(t.text)
                and last_np is not None and last_np[0] == j - 1):
            # reduced passive relative ("the cat chased by the dog"):
            # the modified noun is the participle's OBJECT; a following
            # 'by' phrase carries the actor (reference
            # test_semantics_EN.py:487-496). Conjoined heads anchor on
            # the first conjunct; dep distribution copies to siblings.
            head_local = last_np[1]
            anchor = next((t2 for t2 in toks
                           if toks[head_local].i in t2.righthand_siblings),
                          toks[head_local])
            t.head = anchor.i
            t.dep = "acl"
            add(t.i, anchor.i, "dobj")
            cur = t
            got_obj = False
            dobj_local = None
            j += 1
            continue
        if t.pos == "VERB" and t.dep == "conj":
            # conjoined predicate ("chased AND CAUGHT the cat"): later
            # material attaches to the nearest conjunct; the shared
            # subject flows via dep distribution (reference
            # test_semantics_EN.py:216-224)
            cur = t
            got_obj = False
            dobj_local = None
            j += 1
            continue
        if t.pos == "PUNCT":
            t.head = root.i
            t.dep = "punct"
            j += 1
            continue
        if t.pos == "PART" and t.text.lower() not in ("not", "n't", "nicht", "to"):
            # German separable prefix: prefer the ADJACENT preceding
            # aux/verb when prefix+lemma forms a known verb ("hatte
            # VOR, … abzuschließen" → vorhaben, not a particle of the
            # zu-infinitive root; reference de rules conflate over the
            # syntactic head, language_specific_rules.py:478-492)
            host = cur
            if lang == "de" and j > 0 and toks[j - 1].pos in ("AUX", "VERB") \
                    and toks[j - 1].i != cur.i \
                    and (t.text.lower() + lemma(toks[j - 1].text.lower(), "de")) \
                    in L.VERB_LEMMAS_DE:
                host = toks[j - 1]
            t.head = host.i
            t.dep = "prt"
            add(host.i, t.i, "prt")
            j += 1
            continue
        if t.pos == "ADV":
            t.head = cur.i
            t.dep = "advmod"
            add(cur.i, t.i, "advmod")
            j += 1
            continue
        if t.pos == "ADP" or (t.text.lower() in ("because", "owing", "thanks")
                              and j + 1 < n
                              and toks[j + 1].text.lower() in ("of", "to")):
            # multiword causal preposition ("because of", "owing to",
            # "thanks to") — one prep whose lemma is the bigram
            # (reference why-answer matching, en rules :1430-1469)
            mw_prep = None
            np_from = j + 1
            if t.text.lower() in ("because", "owing", "thanks") \
                    and j + 1 < n and toks[j + 1].text.lower() in ("of", "to"):
                mw_prep = f"{t.text.lower()} {toks[j + 1].text.lower()}"
                toks[j + 1].head = t.i
                toks[j + 1].dep = "fixed"
                np_from = j + 2
            # PP: find the NP directly after
            pp_np = next(((s, e, h) for (s, e, h) in nps
                          if s == np_from or (s <= np_from <= e)), None)
            t.head = cur.i
            t.dep = "agent" if (passive and t.text.lower()
                                in ("by", "von", "vom", "durch")) else "prep"
            # verb→preposition semantic dep: the target of wh_wildcard
            # question matching (reference keeps prep deps; implication
            # wh_wildcard→{advmod,advcl,npadvmod,prep,pobjp},
            # language_specific_rules.py:1094-1100)
            add(cur.i, t.i, "prep")
            if pp_np is not None:
                ph = toks[pp_np[2]]
                ph.head = t.i
                ph.dep = "pobj"
                pw = mw_prep or t.text.lower()
                pcase = None
                if lang == "de":
                    # normalize contractions to base lemma + case and
                    # read the case off the determiner (reference de
                    # question gating reads Case= morphology,
                    # de rules :2005-2058)
                    _CONTR = {"im": ("in", "dat"), "am": ("an", "dat"),
                              "beim": ("bei", "dat"), "vom": ("von", "dat"),
                              "zum": ("zu", "dat"), "zur": ("zu", "dat"),
                              "ins": ("in", "acc"), "ans": ("an", "acc")}
                    if pw in _CONTR:
                        pw, pcase = _CONTR[pw]
                    else:
                        det = toks[pp_np[0]].text.lower() \
                            if toks[pp_np[0]].pos == "DET" else None
                        if det in ("dem", "einem", "der", "einer",
                                   "meinem", "deinem", "seinem",
                                   "ihrem", "unserem", "eurem",
                                   "jedem", "meiner", "seiner"):
                            pcase = "dat"
                        elif det in ("den", "das", "die", "ein", "eine",
                                     "einen", "meinen", "mein", "dein",
                                     "diesen", "dieses", "diese"):
                            pcase = "acc"
                        elif det in ("des",):
                            pcase = "gen"
                # the reference assigns pobjb/pobjo/pobjt by preposition
                # lemma unconditionally — deverbal-phrase matching
                # ("Eating by employees" ≈ "employees eat",
                # language_specific_rules.py:594-616)
                if pw == "by" or t.dep == "agent":
                    add(cur.i, ph.i, "pobjb", prep=pw, prep_case=pcase if lang == "de" else None)
                elif pw in ("of", "von") and lang == "en":
                    gov = toks[dobj_local].i if dobj_local is not None else cur.i
                    add(gov, ph.i, "pobjo", prep=pw)
                elif pw in ("von", "vom", "durch") and lang == "de":
                    # German von-phrase ≈ genitive attribute (pobjo),
                    # so "Kündigung VON einer Versicherung" matches
                    # "Kündigung einer Versicherung" both ways; a
                    # noun-attached durch-phrase is the deverbal AGENT
                    # (pobjb — reference de language_specific_rules.py
                    # :1133-1140: mnr+durch → pobjB, 'Die Katzenjagd
                    # DURCH DEN HUND' ≈ 'Ein Hund jagt eine Katze').
                    # The attribute attaches to the NEAREST preceding
                    # noun ("Extraktion von Information UND ENTFÜHRUNG
                    # VON LÖWEN" — Löwen modifies the conjunct
                    # Entführung)
                    gov = (toks[last_np[1]].i
                           if last_np is not None and last_np[0] < t.i
                           else cur.i)
                    de_lbl = "pobjb" if pw == "durch" else "pobjo"
                    if pw == "durch" \
                            and toks[gov].pos not in ("NOUN", "PROPN"):
                        # verb-attached durch stays a plain
                        # prepositional dependent (reference maps only
                        # the mnr noun attachment)
                        add(cur.i, ph.i, "pobjp", prep=pw,
                            prep_case=pcase)
                        add(t.i, ph.i, "pobj", uncertain=False)
                        last_np = (pp_np[1], pp_np[2])
                        j = pp_np[1] + 1
                        continue
                    add(gov, ph.i, de_lbl, prep=pw, prep_case=pcase)
                    # the attribute distributes over DIRECTLY-adjacent
                    # conjoined governors ("Der Abschluss und der
                    # Abschluss VON EINER VERSICHERUNG" → both, ref
                    # test_structural_matching_DE.py:276-282) — but not
                    # past intervening material, which means the left
                    # conjunct has its own attribute ("Extraktion von
                    # Information und ENTFÜHRUNG von Löwen")
                    pos_by_i = {tk.i: j for j, tk in enumerate(toks)}
                    g = gov
                    changed = True
                    while changed:
                        changed = False
                        for lt in toks:
                            if g in (lt.righthand_siblings or []) \
                                    and lt.i < g:
                                lo, hi = pos_by_i[lt.i], pos_by_i[g]
                                if all(toks[j].pos in ("CCONJ", "DET",
                                                       "PUNCT")
                                       for j in range(lo + 1, hi)):
                                    add(lt.i, ph.i, de_lbl, prep=pw,
                                        prep_case=pcase)
                                    g = lt.i
                                    changed = True
                                break
                elif pw == "to":
                    # dative context ("gives a file TO an employee") and
                    # directional 'to' both map to predicate-recipient
                    # deps (reference template deps ["dative", "pobjt"],
                    # language_specific_rules.py:1186-1196 + :608-612).
                    # German 'für' takes the generic pobjp path — the
                    # reference's DE verb-dat template lists only 'da'
                    # (bare dative) deps (de rules :1753-1776), and
                    # 'eine Versicherung für fünf Jahre' must yield
                    # prepgovernor-noun at BOTH governors (ref
                    # test_phraselet_production_DE.py:191)
                    add(cur.i, ph.i, "pobjt", prep=pw)
                else:
                    # attach prep object to the prep's governor
                    # (reference prepgovernor-noun phraselet) — unless
                    # a coordinator intervenes ("Germany and in
                    # Germany": coordinated PPs share no governor)
                    coordinated = any(
                        toks[k].pos == "CCONJ"
                        for k in range(max(0, cur.i - off + 1), j))
                    if not coordinated:
                        add(cur.i, ph.i, "pobjp", prep=pw,
                            prep_case=pcase if lang == "de" else None)
                        # German Vorfeld PP: a preposition attached to
                        # the pre-verbal subject NP ALSO modifies the
                        # clause verb as an uncertain moposs
                        # ("Informationsextraktion AUS DEN DATEN wurde
                        # durchgeführt" → prepgovernor-noun:
                        # durchführen-datum, ref production DE :215)
                        if lang == "de" and cur.i != root.i \
                                and cur.pos in ("NOUN", "PROPN") \
                                and root.pos in ("VERB", "AUX"):
                            add(root.i, ph.i, "pobjp", uncertain=True,
                                prep=pw,
                                prep_case=pcase)
                    # alternative noun attachment, uncertain (reference
                    # prepposs deps, parsing.py:1359-1434): "saw the dog
                    # in the garden" → garden may modify dog
                    if dobj_local is not None:
                        add(toks[dobj_local].i, ph.i, "pobjp", uncertain=True,
                            prep=pw)
                        add(toks[dobj_local].i, t.i, "prepposs", uncertain=True)
                add(t.i, ph.i, "pobj", uncertain=False)
                last_np = (pp_np[1], pp_np[2])
                j = pp_np[1] + 1
                continue
            j += 1
            continue
        np_here = next(((s, e, h) for (s, e, h) in nps if s == j), None)
        if np_here is not None:
            last_np = (np_here[1], np_here[2])
            if np_here[2] in conj_right or np_here[2] == subj_local:
                j = np_here[1] + 1
                continue
            h = toks[np_here[2]]
            if copula and cur.i == root.i:
                # attr only in the copular MAIN clause — a relative
                # clause interior keeps ordinary object roles
                h.head = cur.i
                h.dep = "attr"
                add(cur.i, h.i, "attr")
            elif lang == "de" and (
                    toks[np_here[0]].text.lower() in ("dem", "einem")
                    # dative PRONOUN forms ("Alle folgten IHM/IHNEN" —
                    # same label as "folgt EINEM Elefanten")
                    or h.text.lower() in ("ihm", "ihnen")
                    # post-object 'der' is feminine dative ("gebe es
                    # DER PERSON") — nominative would precede the verb
                    or (got_obj
                        and toks[np_here[0]].text.lower() == "der")):
                # dative determiner: German double-object
                # ("gab DEM Mann das Buch") — 'da' dependency, reference
                # de verb-dat template (de language_specific_rules.py)
                h.head = cur.i
                h.dep = "dative"
                add(cur.i, h.i, "dative")
            elif (lang == "de" and subj_local is None and not got_obj
                    and cur.i == root.i and root.pos == "VERB"
                    and not passive
                    # an NP-internal participle ("Ein VERKAUFTER
                    # Urlaub") is adjectival — its noun is the
                    # patient, not a subject
                    and not (root_local > 0
                             and toks[root_local - 1].pos
                             in ("DET", "ADJ"))
                    and toks[np_here[0]].text.lower() not in ("den",
                                                              "einen")):
                # subjectless verb-second clause with an adverb
                # Vorfeld ("dann frisst EIN LÖWE"): the first
                # non-accusative post-verbal NP is the subject
                # (reference de classification control :45-58)
                h.head = cur.i
                h.dep = "nsubj"
                add(cur.i, h.i, "nsubj")
                subj_local = np_here[2]
            elif not got_obj:
                h.head = cur.i
                h.dep = "dobj"
                add(cur.i, h.i, "dobj")
                got_obj = True
                dobj_local = np_here[2]
            elif lang == "en" and dobj_local is not None \
                    and lemma(cur.text.lower(), "en") in _DATIVE_VERBS:
                # English double object ("gave the employee the file"):
                # the FIRST bare NP is the recipient (dative), the
                # second the direct object (reference 'dative' dep,
                # en language_specific_rules.py:608-611)
                prev_obj = toks[dobj_local]
                prev_obj.dep = "dative"
                for d in deps:
                    if d["parent"] == cur.i and d["child"] == prev_obj.i \
                            and d["label"] == "dobj":
                        d["label"] = "dative"
                h.head = cur.i
                h.dep = "dobj"
                add(cur.i, h.i, "dobj")
                dobj_local = np_here[2]
            elif lang == "de" and dobj_local is not None:
                # German double object: the earlier NP was the dative
                # recipient (unmarked order dat < acc, "gibt der Frau
                # IHR MITTAGESSEN"); the determiner-case pass below
                # re-labels the first NP
                h.head = cur.i
                h.dep = "dobj"
                add(cur.i, h.i, "dobj")
                dobj_local = np_here[2]
            else:
                h.head = cur.i
                h.dep = "dep"
            j = np_here[1] + 1
            continue
        if t.pos == "ADJ" and copula:
            t.head = cur.i
            t.dep = "acomp"
            add(cur.i, t.i, "acomp")
            j += 1
            continue
        if lang == "de" and t.pos == "ADJ" and not copula \
                and cur.pos == "VERB" \
                and (j + 1 >= len(toks)
                     or toks[j + 1].pos in ("PUNCT", "CCONJ")):
            # German ADJD: a bare post-verbal adjective is adverbial
            # ("Ich fahre LANGSAM" — mo in the reference parse)
            t.head = cur.i
            t.dep = "advmod"
            add(cur.i, t.i, "advmod")
            j += 1
            continue
        if t.head < 0:
            t.head = cur.i
            t.dep = "dep"
        j += 1

    # prospective-past elision ("WAS going to chase the cat"): every
    # dep of the taken-over infinitive is uncertain, including the
    # object attached during the scan (reference test_semantics_EN.py:
    # 324-330 test_was_going_to)
    for d in deps:
        if d["parent"] in elided_unc_verbs:
            d["uncertain"] = True

    # modal verbs make the modified predicate's deps uncertain ("He
    # should do it" → nsubj(U), dobj(U); 'will' futures stay certain —
    # reference test_semantics_EN.py:438-459)
    if lang == "en" and any(
            a < root_local and toks[a].text.lower() in L.MODALS_EN
            and toks[a].text.lower() != "will" for a in aux_pos):
        for d in deps:
            if d["parent"] == root.i and d["label"] != "xcomp":
                d["uncertain"] = True
    if lang == "de" and any(
            a < root_local and toks[a].text.lower() in L.MODALS_DE
            and toks[a].text.lower() not in ("würde", "würden")
            for a in aux_pos):
        # reference tests/de/test_structural_matching_DE.py:221-226:
        # "Der Hund könnte eine Katze jagen" matches uncertain
        for d in deps:
            if d["parent"] == root.i and d["label"] != "xcomp":
                d["uncertain"] = True

    # sentence-final relative clause: the antecedent received its main-
    # clause role (usually dobj) in the scan above; now parse the
    # relative clause itself ("chased the cat who told nobody")
    if rel_final:
        _rel_internals()

    # copula + predicative adjective → amod rewire
    # ("the man was poor" ≈ "the poor man"; reference parsing.py:1318-1357).
    # Conjunct subjects each get their own CERTAIN amod (reference
    # test_semantics_EN.py:88-95 test_predicative_adjective_with_
    # conjunction: 'The dog and the cat were big' → cat 6:amod, no (U))
    if copula:
        # the subject comes from the copula's nsubj dep rather than the
        # NP-scan position (covers WH subjects: "Who is sad?" → who
        # amod sad — reference adjectival_predicate_subject_pos
        # includes PRON, parsing.py:1333-1343); use the full conjunct
        # group even when the recorded subject is a non-anchor member
        # ("The cat and the mouse … were tired" — both conjuncts get
        # the certain amod)
        subj_is = {d["child"] for d in deps
                   if d["parent"] == root.i and d["label"] == "nsubj"}
        subj_group: set[int] = set()
        for si in subj_is:
            base = next((t2 for t2 in toks
                         if si in t2.righthand_siblings),
                        next(t2 for t2 in toks if t2.i == si))
            subj_group.add(base.i)
            subj_group |= set(base.righthand_siblings)
        for d in list(deps):
            if d["label"] == "acomp" and d["parent"] == root.i:
                for s in sorted(subj_group):
                    add(s, d["child"], "amod", uncertain=False)

    # --- conjunction dep distribution (reference copy_any_sibling_info,
    # parsing.py:1225-1316). For each conjunct group [anchor, *siblings]:
    # - a dep whose CHILD is the anchor copies to the other members with
    #   the ORIGINAL certainty ("chased a cat and a cat" → both certain,
    #   reference tests/en/test_structural_matching_EN.py:423-455); a dep
    #   whose child is a NON-anchor member copies to the others marked
    #   uncertain ("The lion, the tiger and the dog who chased the cat"
    #   → 1:nsubj(U); 4:nsubj(U); 7:nsubj, test_semantics_EN.py:226-230);
    # - a dep whose PARENT is in the group copies to the other members:
    #   verb conjunctions share arguments with the original certainty
    #   ("chased and caught the cat" → caught 1:nsubj; 7:dobj,
    #   test_semantics_EN.py:219-224); nominal conjunctions copy
    #   uncertain ('The large dog and cat' → cat 1:amod(U),
    #   test_semantics_EN.py:66-72, EN mark_child_dependencies_copied_
    #   to_siblings_as_uncertain, language_specific_rules.py:88-90).
    def _dep_exists(p: int, c: int, lbl: str) -> bool:
        return any(d["parent"] == p and d["child"] == c and d["label"] == lbl
                   for d in deps)

    for t in toks:
        if not t.righthand_siblings:
            continue
        group = [t.i] + t.righthand_siblings
        gset = set(group)
        verb_group = t.pos == "VERB"
        for d in list(deps):
            if d["child"] in gset and d["parent"] not in gset:
                unc = d["uncertain"] if d["child"] == t.i else True
                if d["label"] in ("advmodsubj", "advmodobj"):
                    # participial-compound noun deps: conjunct copies
                    # are always uncertain (ref en rules :694-703,
                    # noun.i != token.head.i)
                    unc = True
                for m in group:
                    if m != d["child"] and not _dep_exists(d["parent"], m, d["label"]):
                        add(d["parent"], m, d["label"], uncertain=unc,
                            prep=d.get("prep"))
            if d["parent"] == t.i and d["child"] not in gset:
                # parent-side copies flow from the ANCHOR only: in
                # "who chased and caught the cat" the object belongs to
                # 'caught' alone and does not flow back to 'chased'
                # (reference test_semantics_EN.py:216-224)
                unc = d["uncertain"] if verb_group else True
                for m in group[1:]:
                    if d["label"] == "amod" and not verb_group and any(
                            t2.head == m and t2.pos == "DET"
                            for t2 in toks):
                        # adjectives distribute only within a SHARED
                        # determiner phrase ("The large dog and cat" →
                        # cat amod(U) large) — a conjunct with its own
                        # determiner keeps its own modifiers ("a big
                        # horse and a little horse")
                        continue
                    if not _dep_exists(m, d["child"], d["label"]):
                        add(m, d["child"], d["label"], uncertain=unc,
                            prep=d.get("prep"))

    # displaced preposition in a relative clause ("The office you ate
    # your roll at was new"): the clause-final bare preposition takes
    # the ANTECEDENT as its object (reference displaced-preposition
    # handling, en language_specific_rules.py:395-420)
    if rel is not None and not rel_final:
        ante = toks[rel[3]]
        anchor = next((t2 for t2 in toks
                       if ante.i in t2.righthand_siblings), ante)
        ante_group = [anchor.i] + list(anchor.righthand_siblings)
        for k in range(rel[0], min(rel[2], n)):
            t2 = toks[k]
            if t2.pos == "ADP" and not any(
                    d["parent"] == t2.i and d["label"] == "pobj"
                    for d in deps):
                for a in ante_group:
                    add(t2.i, a, "pobj")
                    add(toks[rel[1]].i, a, "pobjp")

    if or_members:
        for d in deps:
            if d["parent"] in or_members or d["child"] in or_members:
                d["uncertain"] = True
        # any match ON the token itself is uncertain too, even when no
        # dep is traversed (reference parsing.py:409-412;
        # 'Informationsinteressen oder -extraktion' matches 'Extraktion
        # der Information' uncertainly, de test :954). or_members holds
        # document-global .i values; toks is sentence-positional.
        for t2 in toks:
            if t2.i in or_members:
                t2.involved_in_or = True

    # --- sentence-initial interrogative hookup (reference initial
    # question words, parsing.py:1170-1207; head-WHadv template uses the
    # assigned label wh_wildcard, language_specific_rules.py:1283-1296)
    q0 = None
    for qi, qt in enumerate(toks):
        if qt.pos == "PRON" and qt.text.lower() in (
                L.INTERROGATIVES_EN | {"wer", "was", "wo", "wann",
                                       "warum", "wie", "wem", "wen"}):
            # initial, or fronted behind a preposition chain ("To whom
            # did you talk?" — reference test_semantics_EN.py:962-977)
            if qi == 0 or all(toks[k].pos in ("ADP", "DET", "NOUN")
                              for k in range(qi)):
                q0 = qt
            break
    if q0 is not None:
        w0 = q0.text.lower()
        prev_adps = [toks[k] for k in range(q0.i - off) if toks[k].pos == "ADP"]
        if w0 in ("where", "when", "why", "how", "wo", "wann", "warum", "wie"):
            q0.head = root.i
            q0.dep = "advmod"
            add(root.i, q0.i, "wh_wildcard")
        elif prev_adps:
            # fronted prepositional interrogative: the answer fills the
            # preposition's object slot — 'to' maps to the recipient
            # dep, other prepositions to pobjp (headprepto-WH /
            # headprep-WH templates, en rules :1297-1325). The prep
            # identity gates question matching against corpus edges.
            q0.head = prev_adps[-1].i
            q0.dep = "pobj"
            pw0 = prev_adps[-1].text.lower()
            add(root.i, q0.i,
                "pobjt" if pw0 in ("to", "zu") else "pobjp", prep=pw0)
        elif not any(d["child"] == q0.i for d in deps):
            # WH-argument question: subject when the root still lacks
            # one ("Who came?"), else the fronted object ("What did the
            # man see?"); a STRANDED clause-final preposition ("who did
            # the dog talk WITH") makes it a prep question instead
            # (reference en rules :1297-1325)
            q0.head = root.i
            stranded = next(
                (tk for tk in reversed(toks)
                 if tk.pos == "ADP" and tk.i > root.i
                 and not any(d["parent"] == tk.i and d["label"] == "pobj"
                             for d in deps)), None)
            if stranded is not None:
                q0.dep = "pobj"
                q0.head = stranded.i
                pw0 = stranded.text.lower()
                add(root.i, q0.i,
                    "pobjt" if pw0 in ("to", "zu") else "pobjp", prep=pw0)
            else:
                has_subj = any(d["parent"] == root.i
                               and d["label"] in ("nsubj", "nsubjpass")
                               for d in deps)
                attr_d = next((d for d in deps
                               if d["parent"] == root.i
                               and d["label"] == "attr"), None)
                if copula and (has_subj or attr_d is not None):
                    # copular WH complement ("What is this?") — the WH
                    # word fills the attribute slot and the other
                    # nominal is the subject (head-WHattr, reference
                    # en rules :1258-1267)
                    if not has_subj and attr_d is not None:
                        attr_d["label"] = "nsubj"
                        toks[attr_d["child"] - off].dep = "nsubj"
                    q0.dep = "attr"
                else:
                    q0.dep = "dobj" if has_subj else "nsubj"
                add(root.i, q0.i, q0.dep)
            if copula and q0.dep == "nsubj":
                # late copular rewire for WH subjects ("Who is sad?" →
                # who amod sad, reference adjectival_predicate_subject_
                # pos includes PRON, parsing.py:1333-1343)
                for d in list(deps):
                    if d["label"] == "acomp" and d["parent"] == root.i:
                        add(q0.i, d["child"], "amod")

    # leftover heads
    for t in toks:
        if t.head < 0:
            t.head = root.i
            if t.dep == "dep" and t.pos == "PUNCT":
                t.dep = "punct"
    # fronted adverb ("ALWAYS he had it"): a pre-verbal ADV left
    # unlabeled by the post-verbal scan modifies the clause root
    # (spaCy: advmod; feeds governor-adjective: have-always, reference
    # test_phraselet_production_EN.py:286)
    for t in toks:
        if t.pos == "ADV" and t.dep == "dep" and t.head == root.i \
                and t.i < root.i \
                and t.text.lower() not in (L.INTERROGATIVES_EN
                                           | L.INTERROGATIVES_DE) \
                and t.text.lower() not in L.NEGATION_WORDS_EN \
                and t.text.lower() not in L.NEGATION_WORDS_DE:
            t.dep = "advmod"
            add(root.i, t.i, "advmod")
    # root have/do are main verbs, not auxiliaries ("Always he HAD
    # it", "he DID it"): spaCy tags them VERB, and the reverse-only
    # parent-lemma table lists ("do", "VERB") with no AUX row (en
    # rules :834-845) — keep be/modals AUX like spaCy does
    if lang == "en" and root.pos == "AUX" \
            and lemma(root.text.lower(), "en") in ("have", "do"):
        root.pos = root.tag = "VERB"
    # --- dangling prepositions (verbless fragments: "with an idea",
    # "in Germany and in Germany"): spaCy still gives the ADP a pobj,
    # which feeds the reverse-only prep-noun phraselet (reference
    # template, en rules :1215-1224) — attach each unlinked ADP to the
    # next NP head
    linked_preps = {d["parent"] for d in deps if d["label"] == "pobj"}
    for t in toks:
        if t.pos == "ADP" and t.i not in linked_preps \
                and t.dep in ("", "dep"):
            k = t.i - off + 1
            while k < n and toks[k].pos in ("DET", "ADJ", "NUM", "ADV"):
                k += 1
            if k < n and toks[k].pos in ("NOUN", "PROPN"):
                # NP head = last token of the nominal run
                while k + 1 < n and toks[k + 1].pos in ("NOUN", "PROPN"):
                    k += 1
                t.dep = "prep"
                t.head = toks[k].i
                add(t.i, toks[k].i, "pobj")
    # --- German adnominal genitive ("Die Kündigung EINER VERSICHERUNG",
    # "Maßnahmen DER BESCHAFFUNG der Information"): an NP directly
    # following another NP whose determiner is genitive-marked attaches
    # as pobjo — the same dep the von-phrase carries, so genitive and
    # von-phrases match each other (reference de verb-acc template
    # covers 'ag' genitive attributes; tests/de/
    # test_structural_matching_DE.py:270-295). Applied only when the
    # second NP cannot be a clause argument: fragments (no verb) or a
    # genitive NP that directly follows the first NP post-verbally.
    if lang == "de":
        gen_dets = {"des", "eines", "der", "einer"}
        spans_gen = _chunk_nps(toks, lang)
        has_verb = any(t2.pos == "VERB" for t2 in toks)
        for a in range(len(spans_gen) - 1):
            (s1, e1, h1), (s2, e2, h2) = spans_gen[a], spans_gen[a + 1]
            if s2 != e1 + 1:
                continue
            if toks[s2].pos != "DET" \
                    or toks[s2].text.lower() not in gen_dets:
                continue
            if has_verb and not (toks[h1].dep in ("dobj", "pobj", "attr")
                                 or any(v < s1 for v in verb_pos)):
                continue
            if toks[h2].dep in ("nsubj", "nsubjpass"):
                continue  # already a clause argument
            if toks[h2].dep == "dative":
                if toks[toks[h2].head].pos in ("VERB", "AUX"):
                    continue  # real dative recipient
                # noun-parented 'dative' from fragment scanning: a
                # CHAINED genitive ("Maßnahmen der Beschaffung DER
                # INFORMATION") — the attribute belongs to the nearest
                # preceding NP head (reference parses each 'der X' as
                # ag on the preceding noun)
                for d in deps:
                    if d["child"] == toks[h2].i \
                            and d["label"] == "dative":
                        d["label"] = "pobjo"
                        d["parent"] = toks[h1].i
                toks[h2].dep = "pobjo"
                toks[h2].head = toks[h1].i
                continue
            if toks[h2].dep == "dobj":
                if toks[toks[h2].head].pos == "VERB" \
                        and toks[h1].dep not in ("dobj", "dative", "pobj"):
                    continue  # real verbal object
                # noun-headed 'object' from fragment scanning — or a
                # gen-det NP mis-claimed as a second verbal object when
                # the verb's argument slot is already filled by NP1
                # ("folgt einem Elefanten DER VERGANGENHEIT") — is the
                # genitive attribute: relabel and reparent onto NP1
                for d in deps:
                    if d["child"] == toks[h2].i and d["label"] == "dobj":
                        d["label"] = "pobjo"
                        d["parent"] = toks[h1].i
                toks[h2].dep = "pobjo"
                toks[h2].head = toks[h1].i
                continue
            add(toks[h1].i, toks[h2].i, "pobjo", prep=None)

    # --- German V2: a FRONTED adverb precedes the finite verb, so the
    # left-to-right walk never reaches it ("IMMER hat er es" — mo in
    # the reference parse, tests/de/test_phraselet_production_DE.py
    # :145-167); attach it to the clause's content verb (the ROOT, or
    # the clause-final full verb under a modal/futur auxiliary)
    if lang == "de":
        rt0 = next((t for t in toks if t.dep == "ROOT"), None)
        if rt0 is not None:
            content = next((t for t in reversed(toks)
                            if t.pos == "VERB"), rt0)
            for t in toks:
                if t.pos == "ADV" and t.dep == "dep":
                    t.head = content.i
                    t.dep = "advmod"
                    add(content.i, t.i, "advmod")

    # --- German double objects: the SVO walk labels every bare object
    # dobj; German marks the RECIPIENT with dative morphology on the
    # determiner ("gibt EINER PFLANZE etwas", "gibt DER NETTEN FRAU ihr
    # Mittagessen" — da in the reference parse, verb-dat phraselets,
    # ref test_phraselet_production_DE.py:69, :84). When a verb
    # carries two object-like dependents, re-label by determiner case:
    # einer/einem/dem unambiguously dative; 'der' dative before a
    # following feminine/weak NP when a second object exists.
    if lang == "de":
        _DAT_DETS = {"einer", "einem", "dem", "meiner", "meinem",
                     "deiner", "deinem", "seiner", "seinem", "ihrer",
                     "ihrem", "jener", "jenem", "dieser", "diesem"}
        by_i = {t2.i: t2 for t2 in toks}
        for rt in toks:
            if rt.pos not in ("VERB", "AUX"):
                continue
            objs = [d for d in deps
                    if d["parent"] == rt.i and d["label"] == "dobj"
                    and d["child"] in by_i]
            others = [t2 for t2 in toks
                      if t2.head == rt.i and t2.i != rt.i
                      and t2.pos in ("PRON", "NOUN", "PROPN")
                      and t2.dep in ("dobj", "dep")
                      and not any(o["child"] == t2.i for o in objs)]
            for d in objs:
                ot = by_i[d["child"]]
                det = next((by_i[k].text.lower()
                            for k in range(max(0, ot.i - 3), ot.i)
                            if k in by_i and by_i[k].pos == "DET"
                            and by_i[k].head == ot.i), None)
                if det is None:
                    continue
                # conjuncts of one object NP ("jagen der Hund UND DER
                # HUND") are a single argument, not a double-object
                # frame (reference ungrammatical-two-nominatives
                # tolerance, de test_semantics :688-692)
                sib = {s2 for t2 in toks for s2 in t2.righthand_siblings}
                anchors = [o for o in objs if o["child"] not in sib]
                two_objects = (len(anchors) > 1
                               or [t2 for t2 in others if t2.i not in sib])
                if det in _DAT_DETS or (det == "der" and two_objects):
                    d["label"] = "dative"
                    ot.dep = "dative"

    # --- German possessive determiners corefer like pronouns: "gibt
    # der Frau IHR Mittagessen" → the possessed noun is ALSO an
    # attribute of the antecedent (nk in the reference parse +
    # coreferee ihr→Frau, producing noun-dependent: mittagessen-frau,
    # ref test_phraselet_production_DE.py:84)
    if lang == "de":
        _POSS_FEM = {"ihr", "ihre", "ihren", "ihrem", "ihrer"}
        _POSS_MASC = {"sein", "seine", "seinen", "seinem", "seiner"}
        by_i2 = {t2.i: t2 for t2 in toks}
        for t in toks:
            w0 = t.text.lower()
            if t.pos != "DET" or w0 not in (_POSS_FEM | _POSS_MASC):
                continue
            head_noun = by_i2.get(t.head) if t.head != t.i else None
            if head_noun is None or head_noun.pos not in ("NOUN", "PROPN"):
                continue
            fem = w0 in _POSS_FEM
            ante = None
            for k in range(t.i - 1, -1, -1):
                c = by_i2.get(k)
                if c is None:
                    continue
                if c.pos not in ("NOUN", "PROPN") or c.dep == "compound":
                    continue
                cw = c.text.lower()
                if cw in L.PERSON_NOUNS_DE and (
                        (fem and cw in _FEM_PERSON_NOUNS_DE)
                        or (not fem and cw not in _FEM_PERSON_NOUNS_DE)):
                    ante = c
                    break
            if ante is not None:
                t.most_specific_coref = ante.i
                add(head_noun.i, ante.i, "nmod", coref=True)

    # --- German V2 question fixups: the deterministic walk is
    # SVO-biased; German questions front the WH constituent. A leading
    # conjunction is transparent for the ATTACHMENT ('Und wohin geht
    # der Mann' still parses mo(geht, wohin) in the reference,
    # test_questions_DE.py:183) but not for initial-question-word
    # status (flagged above strictly at the sentence start).
    _wh0 = None
    if lang == "de":
        for _t in toks:
            if _t.pos == "CCONJ":
                continue
            if _t.text.lower() in L.INTERROGATIVES_DE:
                _wh0 = _t
            break
    if _wh0 is not None:
        wh = _wh0
        whw = wh.text.lower()
        rt = next((t for t in toks if t.dep == "ROOT"), None)
        if rt is not None:
            # (a) adverbial interrogative attaches advmod to the root
            #     ("WO wohnst du?" — mo in the reference parse)
            if wh.pos == "ADV" and wh.dep in ("dep", "advmod"):
                wh.head = rt.i
                wh.dep = "advmod"
                if not any(d["child"] == wh.i and d["label"] == "advmod"
                           for d in deps):
                    add(rt.i, wh.i, "advmod")
            # (b) post-verbal NOMINATIVE pronoun is the subject
            #     ("Wo wohnst DU?", "Womit fährst DU?")
            nom = {"ich", "du", "er", "wir", "ihr", "sie", "man", "es"}
            if not any(d["parent"] == rt.i and d["label"] == "nsubj"
                       for d in deps):
                for d in deps:
                    if (d["parent"] == rt.i and d["label"] == "dobj"
                            and toks[d["child"]].pos == "PRON"
                            and toks[d["child"]].text.lower() in nom
                            and d["child"] == rt.i + 1):
                        d["label"] = "nsubj"
                        toks[d["child"]].dep = "nsubj"
                        break
            # (c) fronted accusative/dative interrogative: wen/wem are
            #     OBJECTS; a following full NP is the subject ("WEN sah
            #     das Gebäude?" — OVS). 'was' likewise when a non-copula
            #     root already has a (mis-assigned) direct object.
            if whw in ("wen", "wem") or (
                    whw == "was" and rt.pos != "AUX"
                    and any(d["parent"] == rt.i and d["label"] == "dobj"
                            for d in deps)):
                for d in deps:
                    if d["parent"] == rt.i and d["child"] == wh.i \
                            and d["label"] == "nsubj":
                        d["label"] = "dative" if whw == "wem" else "dobj"
                        wh.dep = d["label"]
                    elif d["parent"] == rt.i and d["child"] == wh.i \
                            and d["label"] == "dobj" and whw == "wem":
                        # 'wem' is unambiguously DATIVE morphology: a
                        # fronted 'wem' mis-assigned dobj (the subject
                        # pronoun already holds nsubj — 'WEM gibst du
                        # es?') is the dative object (reference
                        # tests/de/test_questions_DE.py:89-92)
                        d["label"] = "dative"
                        wh.dep = "dative"
                if not any(d["parent"] == rt.i and d["label"] == "nsubj"
                           for d in deps):
                    for d in deps:
                        if d["parent"] == rt.i and d["label"] == "dobj" \
                                and d["child"] != wh.i:
                            d["label"] = "nsubj"
                            toks[d["child"]].dep = "nsubj"
                            break

    # German fronted-object correction: a post-verbal NOMINATIVE-ONLY
    # pronoun (man/ich/du/er/wir/ihr) is always the subject, so a
    # pre-verbal full NP mis-assigned nsubj is the fronted object
    # ("Welche Information betrachtet MAN?" — Information is the oa,
    # reference tests/de/test_questions_DE.py:38-57)
    if lang == "de":
        _NOM_ONLY = {"ich", "du", "er", "wir", "ihr", "man"}
        _by_i = {t2.i: t2 for t2 in toks}
        for rt2 in toks:
            if rt2.dep != "ROOT" or rt2.pos != "VERB":
                continue
            subj_d = [d for d in deps
                      if d["parent"] == rt2.i and d["label"] == "nsubj"
                      and d["child"] in _by_i]
            obj_d = [d for d in deps
                     if d["parent"] == rt2.i and d["label"] == "dobj"
                     and d["child"] in _by_i
                     and _by_i[d["child"]].pos == "PRON"
                     and _by_i[d["child"]].text.lower() in _NOM_ONLY
                     and d["child"] > rt2.i]
            if (len(obj_d) == 1 and subj_d
                    and all(_by_i[s["child"]].pos in ("NOUN", "PROPN")
                            for s in subj_d)
                    and all(s["child"] < rt2.i for s in subj_d)):
                for s in subj_d:
                    s["label"] = "dobj"
                    _by_i[s["child"]].dep = "dobj"
                obj_d[0]["label"] = "nsubj"
                _by_i[obj_d[0]["child"]].dep = "nsubj"

    # a verb conjoined behind an object NP ("aß das Fleisch UND
    # TRANK") shares only its partner's subject — CERTAIN in German
    # (reference de test_semantics :757-760), UNCERTAIN in English
    # (reference en test_semantics :695-698)
    for t2 in toks:
        if t2.dep == "vconj_subj_only":
            t2.dep = "conj"
            for d in list(deps):
                if d["parent"] == t2.head \
                        and d["label"] in ("nsubj", "nsubjpass"):
                    deps.append({**d, "parent": t2.i,
                                 "uncertain": (d["uncertain"]
                                               or lang == "en")})
    return deps


# ------------------------------------------------------------ document

# reference penalty constants (de/language_specific_rules.py:413-435:
# minimum_normal_subword_length / maximum_realistic_subword_length)
_MIN_SUBWORD_LEN = 6
_MAX_SUBWORD_LEN = 12


def _split_compound_de(w: str) -> list[tuple[str, str, int]] | None:
    """Recursive vocab-checked compound split with additive penalty
    scoring — models the reference's scan_recursively_for_subwords +
    score (de/language_specific_rules.py:364-530): every part must be a
    known part (optionally after stripping a Fugen linking element);
    among all full decompositions the lowest-penalty one wins (penalty
    2·(6−len) for short parts, 2·(len−12) for overlong parts; ties →
    fewer parts, then leftmost-longest). Supports any number of parts
    (Polizeiinformationsbroschüre → polizei|informations|broschüre).

    Returns [(surface, base_form, char_start)] or None.
    """
    n = len(w)
    best: tuple | None = None

    def piece_penalty(surface: str) -> int:
        if len(surface) < _MIN_SUBWORD_LEN:
            return 2 * (_MIN_SUBWORD_LEN - len(surface))
        if len(surface) > _MAX_SUBWORD_LEN:
            return 2 * (len(surface) - _MAX_SUBWORD_LEN)
        return 0

    def rec(i: int, parts: list, penalty: int) -> None:
        nonlocal best
        if best is not None and penalty > best[0]:
            return  # prune: penalties only grow
        if i == n:
            if len(parts) >= 2:
                # strict < keeps the FIRST decomposition found at equal
                # (penalty, #parts) — the descending-j scan makes that
                # the leftmost-longest one, and within one boundary the
                # Fugen-stripped candidate precedes the inflection
                # reading
                key = (penalty, len(parts))
                if best is None or key < best[:2]:
                    best = (*key, list(parts))
            return
        for j in range(min(n, i + _MAX_SUBWORD_LEN + 4), i + 2, -1):
            surface = w[i:j]
            # (text, base): text is what the subword reports — a
            # whitelisted Fugen-S is a SEPARATOR and excluded from the
            # text ('widerrufs…' → text 'widerruf'), while an
            # inflection stays in the text with the base as lemma
            # ('bundes…' → text 'bundes', lemma 'bund'; reference
            # tests/de/test_semantics_DE.py:802-816, 922-940)
            cands = []
            if j < n and surface.endswith("s") and len(surface) >= 4:
                # only the Fugen-S acts as a separator (the reference's
                # subword scan handles Fugen-S specifically, de rules
                # :106-147); other linking letters reach the lexicon as
                # inflections below, keeping their surface ('bundes' →
                # lemma 'bund', text 'bundes'). The subword text is the
                # base without the s (reference subword.text 'widerruf'
                # for 'Widerrufsbelehrung')
                # the stripped form must be a known part DIRECTLY —
                # via the lemma fallback 'bunde(s)' would reach 'bund'
                # and wrongly claim the s as a Fugen separator (text
                # must stay 'bundes', ref de test_semantics :922-940)
                cands.append((surface[:-1], surface[:-1], True))
            # the raw surface comes AFTER the Fugen-S reading: lemma_de
            # strips genitive 's' from compound parts, so the raw
            # candidate would otherwise swallow the Fugen separator
            # into the subword text ('widerrufs…' must report text
            # 'widerruf', reference de test_semantics :802-816)
            cands.append((surface, surface, False))
            # noun inflection anywhere ('gesetze' → gesetz): text keeps
            # the surface, the lemma is the base form
            for suf in ("es", "en", "e", "s", "n"):
                if surface.endswith(suf) and len(surface) - len(suf) >= 3 \
                        and surface[: -len(suf)] in L.COMPOUND_PARTS_DE:
                    cands.append((surface, surface[: -len(suf)], False))
            for txt, base, direct_only in cands:
                if base in L.COMPOUND_PARTS_DE \
                        or base in L.NON_RECORDED_SUBWORDS_DE \
                        or (not direct_only
                            and lemma(base, "de") in L.COMPOUND_PARTS_DE):
                    parts.append((txt, base, i))
                    rec(j, parts, penalty + piece_penalty(surface))
                    parts.pop()

    rec(0, [], 0)
    return best[2] if best is not None else None


def _german_subwords(t: Tok) -> list[dict]:
    """Compound subwords: recursive split (above); adjacent parts are
    linked by intcompound dependencies — each part governs the part to
    its LEFT (reference intcompound, de/language_specific_rules.py:
    740-746); the final part is the semantic head."""
    w = t.text.lower()
    if len(w) < 7 or t.pos not in ("NOUN", "PROPN"):
        return []
    parts = _split_compound_de(w)
    if not parts:
        return []
    # diminutive linkers split but are never reported ('Messerlein-
    # information' → messer+information; reference skips
    # non_recorded_subword_list entries when recording, de rules
    # :607-631)
    parts = [pt for pt in parts
             if pt[1] not in L.NON_RECORDED_SUBWORDS_DE]
    if len(parts) < 2:
        return []
    out = []
    k = len(parts)
    from .lexicon import COMPOUND_PARTS_DE, NOUN_LEXICON_DE
    for i, (surface, base, start) in enumerate(parts):
        # a vocabulary part IS its own lemma — 'sprach' must not take
        # the verb-preterite reading sprach→sprechen
        l = base if (base in COMPOUND_PARTS_DE
                     or base in NOUN_LEXICON_DE) else lemma(base, "de")
        out.append({
            "idx": i, "text": surface, "lemma": l,
            "derived_lemma": derived_lemma(l, "de"), "char_start": start,
            "dependent": i - 1 if i > 0 else -1,
            "dep_label": "intcompound" if i > 0 else "",
            "governor": i + 1 if i < k - 1 else -1,
            "gov_label": "intcompound" if i < k - 1 else "",
            "borrowed": False,
            "containing_i": t.i,
        })
    return out


def _strip_fugen_de(w: str) -> str:
    """Base form of a lone compound part ('königs' → 'könig',
    'informations' → 'information') — the Fugen strip the recursive
    splitter applies, for parts that stand alone in a hyphenated
    conjunction."""
    from .lexicon import COMPOUND_PARTS_DE, NOUN_LEXICON_DE
    known = lambda x: x in COMPOUND_PARTS_DE or x in NOUN_LEXICON_DE  # noqa: E731
    if known(w):
        return w
    for f in ("es", "en", "s", "n"):
        if w.endswith(f) and known(w[: -len(f)]):
            return w[: -len(f)]
    return lemma(w, "de")


def _distribute_conjoined_subwords(toks: list[Tok], text: str) -> None:
    """Hyphenated compound conjunctions share their parts across the
    conjuncts (reference de language_specific_rules.py:740-772):
    'Königs- und Prinzenabdanken' gives 'Königs-' the borrowed head
    subword 'abdanken'; 'Informationsinteressen-, -beschaffungs- und
    -problemmaßnahmen' gives every later fragment the FIRST conjunct's
    modifier prefix (information) and every earlier fragment the LAST
    conjunct's head (maßnahme). Borrowed subwords are marked and never
    indexed (their own token owns the posting) but DO form intcompound
    edges, so relation phraselets match across the conjunction."""
    conj = ("und", "oder")
    n = len(toks)

    def _trailing(t: Tok) -> bool:
        # a hyphen (or '--') directly after the token, then a word
        # boundary — excludes hyphen-JOINED compounds (Wort-Mit-B.)
        end = t.char_start + len(t.text)
        if end >= len(text) or text[end] != "-":
            return False
        nxt = end + 1
        if nxt < len(text) and text[nxt] == "-":
            nxt += 1
        return nxt >= len(text) or text[nxt] in (" ", ",", "\t", "\n",
                                                 ".")

    def _double_trailing(t: Tok) -> bool:
        # 'Freudeverwaltungs--': the reference's subword scan fails on
        # the double-hyphen lemma, so the token records no subwords
        # and lends no prefix (ref de test :707-718)
        end = t.char_start + len(t.text)
        return (end + 1 < len(text) and text[end] == "-"
                and text[end + 1] == "-")

    def _leading(t: Tok) -> bool:
        cs = t.char_start
        return cs > 0 and text[cs - 1] == "-" \
            and (cs < 2 or text[cs - 2] in (" ", ",", "\t", "\n"))

    def _frag(t: Tok) -> bool:
        return _leading(t) or _trailing(t)

    def _own_parts(t: Tok) -> list[dict]:
        """The conjunct's own compound parts (pre-split subwords, or
        the stripped fragment text as a single part)."""
        if t.subwords:
            return [dict(s) for s in t.subwords]
        base = _strip_fugen_de(t.text.lower())
        l = lemma(base, "de")
        return [{"idx": 0, "text": base, "lemma": l,
                 "derived_lemma": derived_lemma(l, "de"),
                 "char_start": 0, "dependent": -1,
                 "dep_label": "", "governor": -1, "gov_label": "",
                 "borrowed": False, "containing_i": t.i}]

    j = 0
    while j < n:
        t = toks[j]
        if t.pos not in ("NOUN", "PROPN") \
                or not (_frag(t) or t.subwords):
            j += 1
            continue
        # collect the conjunction group: NOUN members separated by ','
        # and und/oder; a complete compound may open or close the
        # group, fragments carry the hyphens (reference de
        # language_specific_rules.py:585-740: fragments borrow from
        # the FIRST sibling's prefix / the LAST sibling's tail)
        group = [j]
        k = j + 1
        while k < n:
            tk = toks[k]
            if tk.text in (",",) or tk.text.lower() in conj:
                k += 1
                continue
            if tk.pos in ("NOUN", "PROPN") and (_frag(tk)
                                                or tk.subwords):
                group.append(k)
                k += 1
                if not _frag(tk):
                    break  # complete compound closes the group
                continue
            break
        if len(group) < 2 or not any(_frag(toks[i]) for i in group):
            j = k if len(group) > 1 else j + 1
            continue
        first_t, last_t = toks[group[0]], toks[group[-1]]
        first_parts = (None if _double_trailing(first_t)
                       else _own_parts(first_t))
        last_parts = (None if _double_trailing(last_t)
                      else _own_parts(last_t))
        for gi, idx in enumerate(group):
            tkn = toks[idx]
            if _double_trailing(tkn):
                tkn.subwords = []
                continue
            parts = _own_parts(tkn)
            if gi > 0 and _leading(tkn) and first_parts:
                # later fragments inherit the first conjunct's
                # modifier prefix (its parts minus the head)
                pre = [dict(s) for s in first_parts[:-1]]
                for s in pre:
                    s["borrowed"] = True
                parts = pre + parts
            if gi < len(group) - 1 and _trailing(tkn) and last_parts:
                # earlier fragments inherit the last conjunct's tail
                # (its parts minus the first — reference borrows
                # subwords[1:], not just the head)
                post = [dict(s) for s in last_parts[1:]]
                for s in post:
                    s["borrowed"] = True
                parts = parts + post
            if len(parts) < 2:
                continue
            for i, s in enumerate(parts):
                s.update({"idx": i,
                          "dependent": i - 1 if i > 0 else -1,
                          "dep_label": "intcompound" if i > 0 else "",
                          "governor": i + 1 if i + 1 < len(parts) else -1,
                          "gov_label": "intcompound"
                                       if i + 1 < len(parts) else ""})
            tkn.subwords = parts
        j = k


_SEIN_FORMS_DE = {"ist", "war", "sind", "waren", "sei", "seien",
                  "bin", "bist", "seid", "wäre", "wären"}


def _zu_integrated_de(w: str) -> bool:
    """'abzuschließen' — a zu infix whose removal yields the verb's own
    lemma (the reference's VVIZU reading, de rules :831-855)."""
    lm = lemma(w, "de")
    if lm == w or "zu" not in w:
        return False
    i = w.find("zu", 1)
    while i != -1:
        if w[:i] + w[i + 2:] == lm:
            return True
        i = w.find("zu", i + 1)
    return False


def _relabel_zu_adjective_args(stoks: list[Tok], deps: list[dict]) -> None:
    """German predicate-adjective zu-infinitive ('Die Versicherung war
    sehr schwer zu finden', 'Der Mann war froh auszugehen'): under a
    sein-copula the zu-verb's subject could fill either semantic role,
    so its label becomes the ambiguous 'arg' and the dependency
    uncertain (reference de/language_specific_rules.py:831-855 relabels
    sb → arg with is_uncertain=True when the sein-complement carries a
    PTKZU particle or is VVIZU; tests/de/
    test_structural_matching_DE.py:488-556)."""
    pos_of = {t.i: p for p, t in enumerate(stoks)}
    sein_heads = {t.head for t in stoks
                  if t.pos == "AUX" and t.text.lower() in _SEIN_FORMS_DE
                  and t.dep in ("aux", "auxpass")}
    if not sein_heads:
        return
    by_i = {t.i: t for t in stoks}
    for t in stoks:
        if t.pos != "VERB" or t.i not in pos_of:
            continue
        p = pos_of[t.i]
        zu_marked = ((p > 0 and stoks[p - 1].text.lower() == "zu"
                      and stoks[p - 1].head == t.i)
                     or _zu_integrated_de(t.text.lower()))
        if not zu_marked:
            continue
        governed = t.i in sein_heads or any(
            t.i in (by_i[r].righthand_siblings or [])
            for r in sein_heads if r in by_i)
        if not governed:
            continue
        for d in deps:
            if d["parent"] == t.i and d["label"] == "nsubj":
                d["label"] = "arg"
                d["uncertain"] = True
        # conjoined zu-infinitives ("schwer zu buchen UND ZU BUCHEN")
        # and conjoined predicate adjectives ("sehr schwer UND SCHWER")
        # distribute across the construction (reference conjunction
        # handling; tests/de/test_structural_matching_DE.py:499-543)
        for s in stoks:
            if s.head != t.i or s.i == t.i or s.dep != "dep":
                continue
            sp2 = pos_of[s.i]
            if s.pos == "VERB" and (
                    (sp2 > 0 and stoks[sp2 - 1].text.lower() == "zu")
                    or _zu_integrated_de(s.text.lower())):
                s.dep = "conj"
                if s.i not in t.righthand_siblings:
                    t.righthand_siblings.append(s.i)
                for d in list(deps):
                    if d["parent"] == t.i and d["label"] in ("arg",
                                                             "advmod"):
                        deps.append({**d, "parent": s.i})
            elif s.pos == "ADJ" and sp2 < p:
                # the predicate adjective of the construction ('schwer'
                # in 'war schwer zu buchen') modifies the zu-verb —
                # matched like the reference's mo dependency; conjoined
                # adjectives ('schwer UND schwer') each get their own
                s.dep = "advmod"
                deps.append({"parent": t.i, "child": s.i,
                             "label": "advmod", "uncertain": False,
                             "coref": False, "prep": None,
                             "mention": False})


def parse_document(text: str, lang: str,
                   ontology_multiwords: set[str] | None = None) -> dict:
    """Full deterministic parse of one document.

    Returns ``{"tokens": [token dicts], "deps": [semantic dep dicts]}``
    matching the `docs` schema of FIXTURES.md §5a.
    """
    words, joins, starts = tokenize_full(text)
    sents = sentences(words)
    toks: list[Tok] = []
    all_deps: list[dict] = []
    gi = 0
    sent_bounds: list[tuple[int, int]] = []
    for si, sw in enumerate(sents):
        stoks = [Tok(i=gi + j, text=w, hyph_prev=joins[gi + j],
                     char_start=starts[gi + j])
                 for j, w in enumerate(sw)]
        for t in stoks:
            t.sent_idx = si
        if lang == "de":
            _tag_de(stoks)
        else:
            _tag_en(stoks, gi)
        sent_deps = _parse_sentence(stoks, lang)
        if lang == "de":
            _relabel_zu_adjective_args(stoks, sent_deps)
        all_deps.extend(sent_deps)
        sent_bounds.append((gi, gi + len(sw) - 1))
        toks.extend(stoks)
        gi += len(sw)

    # --- lemmas / derived lemmas / phrasal verbs
    dep_by_parent: dict[int, list[dict]] = {}
    for d in all_deps:
        dep_by_parent.setdefault(d["parent"], []).append(d)
    for t in toks:
        base = t.text
        if base.lower().endswith(("'s", "’s")):
            base = base[:-2]  # possessive clitic stripped for lemma
        t.lemma = base.lower() if t.pos == "PROPN" else lemma(base, lang)
        if t.pos == "VERB" or (lang == "de" and t.pos == "AUX"):
            for d in dep_by_parent.get(t.i, []):
                if d["label"] == "prt":
                    # phrasal verb lemma merge (reference
                    # language_specific_rules.py:478-492); German
                    # separable prefixes CONCATENATE ("geht … aus" →
                    # ausgehen; also off an AUX surface form: "HATTEN
                    # ein Amputieren VOR" → vorhaben, a full verb)
                    part = toks[d["child"]].text.lower()
                    if lang == "de" and (part + t.lemma) \
                            in L.VERB_LEMMAS_DE:
                        t.lemma = part + t.lemma
                        t.pos = t.tag = "VERB"
                    elif t.pos == "VERB":
                        t.lemma = f"{t.lemma} {part}"
        # derived lemma is POS-gated like the reference's rules
        # (noun suffixes vs RB-tagged -ly adverbs,
        # language_specific_rules.py:494-556)
        if lang == "en" and t.pos == "NOUN" \
                and base.lower().endswith("ing") \
                and t.lemma != base.lower() and t.lemma in L.VERB_LEMMAS_EN:
            # NN gerund ("the EATING of a bone"): the lemma is the
            # surface noun, the verb is its DERIVED lemma — matches
            # against the verb are derivation matches (reference
            # en rules :552-556 'singing → sing')
            t.derived_lemma = t.lemma
            t.lemma = base.lower()
        else:
            t.derived_lemma = derived_lemma(t.lemma, lang, t.pos)

    # --- entity typing (gazetteer NER stand-in); German tokens arrive
    # pre-typed PER/LOC from _tag_de (the spaCy de label space)
    for t in toks:
        if t.pos == "PROPN" and not t.ent_type:
            w = t.text.lower()
            if w in _FIRST_NAMES:
                t.ent_type = "PERSON"
            elif w in _PLACES:
                t.ent_type = "GPE"
            else:
                t.ent_type = "PERSON"
    # propagate entity type across PROPN compounds
    for t in toks:
        if t.pos == "PROPN" and toks[t.head].pos == "PROPN":
            t.ent_type = toks[t.head].ent_type

    # --- ontology-defined noun multiwords (reference
    # word_matching/ontology.py:180-210 indexes multiword ontology
    # entries, e.g. 'cat creature'): adjacent noun pairs whose lemma
    # bigram is a known ontology multiword attach to the head (last)
    # token like entity multiwords
    if lang == "en":
        for j in range(len(toks) - 1):
            a, b = toks[j], toks[j + 1]
            if a.pos == "NOUN" and b.pos == "NOUN" \
                    and a.sent_idx == b.sent_idx:
                bigram = f"{a.lemma} {b.lemma}"
                if bigram in L.ONTOLOGY_MULTIWORDS_EN:
                    b.multiwords.append({
                        "text": f"{a.text.lower()} {b.text.lower()}",
                        "lemma": bigram,
                        "derived_lemma": f"{a.derived_lemma} {b.derived_lemma}",
                        "token_indexes": [a.i, b.i],
                    })
    # dynamic ontology-defined multiwords from the LOADED ontology
    # (reference ontology word matching indexes every multiword entry,
    # word_matching/ontology.py:180-210, and phraselet production
    # substitutes the ontology multiword ahead of the entity span —
    # 'A big Richard Pranaya Jones' yields noun-noun richard +
    # relation over 'pranaya jones',
    # tests/en/test_topic_matching_EN.py:1066-1100). Longest n-gram
    # first; appended BEFORE the entity PROPN run so multiwords[0]
    # drives phraselet substitution.
    if ontology_multiwords:
        max_n = max(w.count(" ") for w in ontology_multiwords) + 1
        for n in range(min(max_n, 4), 1, -1):
            for j in range(len(toks) - n + 1):
                span = toks[j: j + n]
                if any(t.sent_idx != span[0].sent_idx for t in span):
                    continue
                # the reference probes ontology-defined multiwords on
                # lemma AND surface n-grams (direct_matching_reprs
                # carry both, word_matching/ontology.py:180-210) — an
                # aggressively-lemmatized part ('Unhyphenated' →
                # 'unhyphenate') must still hit the entry
                lemmas = " ".join(t.lemma for t in span)
                texts = " ".join(t.text.lower() for t in span)
                entry = (lemmas if lemmas in ontology_multiwords
                         else texts if texts in ontology_multiwords
                         else None)
                if entry is not None and not any(
                        m["lemma"] == entry
                        for m in span[-1].multiwords):
                    span[-1].multiwords.append({
                        "text": texts,
                        # the matched ontology entry IS the span's
                        # lemma (drives display + closure joins)
                        "lemma": entry,
                        "derived_lemma": " ".join(t.derived_lemma
                                                  for t in span),
                        "token_indexes": [t.i for t in span],
                    })

    # --- multiword spans: maximal PROPN runs (reference builds noun
    # multiwords at parsing.py:1534-1588; entity-defined multiwords in
    # word_matching/entity.py:80-114)
    j = 0
    while j < len(toks):
        if toks[j].pos == "PROPN":
            k = j
            while k + 1 < len(toks) and toks[k + 1].pos == "PROPN" and toks[k + 1].sent_idx == toks[j].sent_idx:
                k += 1
            if k > j:
                span = toks[j: k + 1]
                mw = {
                    "text": " ".join(t.text.lower() for t in span),
                    "lemma": " ".join(t.lemma for t in span),
                    "derived_lemma": " ".join(t.derived_lemma for t in span),
                    "token_indexes": [t.i for t in span],
                }
                toks[k].multiwords.append(mw)  # head = last PROPN
            j = k + 1
        else:
            j += 1

    # --- German hyphen-joined noun compounds ("Grün-Haus"): the
    # reference keeps them one token and hyphen-NORMALIZES by deleting
    # the hyphen (de normalize_hyphens), so 'Grün-Haus' matches
    # 'Grünhaus' — modeled as a multiword with CONCATENATED lemma on
    # the final (head) token
    if lang == "de":
        j = 0
        while j < len(toks):
            if toks[j].pos in ("NOUN", "PROPN"):
                k = j
                while (k + 1 < len(toks) and toks[k + 1].hyph_prev
                       and toks[k + 1].pos in ("NOUN", "PROPN")
                       and toks[k + 1].sent_idx == toks[j].sent_idx):
                    k += 1
                if k > j:
                    span = toks[j: k + 1]
                    joined_lemma = "".join(t.lemma for t in span)
                    mw = {
                        "text": "".join(t.text.lower() for t in span),
                        "lemma": joined_lemma,
                        # derive ONCE on the joined form so the repr
                        # agrees with the unhyphenated spelling's own
                        # derived lemma (per-part derivation would
                        # mangle interior parts: 'ohne' → 'ohn')
                        "derived_lemma": derived_lemma(joined_lemma,
                                                       "de"),
                        "token_indexes": [t.i for t in span],
                    }
                    toks[k].multiwords.append(mw)
                j = k + 1
            else:
                j += 1

    # --- negation (reference set_negation, en language_specific_rules.py
    # :134-167): a token is negated iff it or a SYNTACTIC ANCESTOR has a
    # negation word among its syntactic children. So "No dog chased any
    # cat" negates 'dog' (det child 'no') but NOT 'chased', and "The dog
    # who was not old chased the cat" does not negate the chase at all.
    neg_words = L.NEGATION_WORDS_DE if lang == "de" else L.NEGATION_WORDS_EN
    children_by_head: dict[int, list[Tok]] = {}
    for t in toks:
        if 0 <= t.head != t.i:
            children_by_head.setdefault(t.head, []).append(t)
    has_neg_child = {
        t.i for t in toks
        # hyph_prev guard: 'nicht' INSIDE a hyphen-joined compound
        # ("…-Nicht-In-Ontologie") is a word part, not a negator
        if any((c.text.lower() in neg_words or c.dep == "neg")
               and not c.hyph_prev
               for c in children_by_head.get(t.i, []))
    }
    neg_memo: dict[int, bool] = {}

    def _negated(i: int) -> bool:
        if i in neg_memo:
            return neg_memo[i]
        neg_memo[i] = False  # cycle guard
        t = toks[i]
        if i in has_neg_child:
            neg_memo[i] = True
        elif t.dep == "ROOT" or t.head == t.i or t.head < 0:
            neg_memo[i] = False
        else:
            neg_memo[i] = _negated(t.head)
        return neg_memo[i]

    for t in toks:
        t.is_negated = _negated(t.i)

    # --- coreference (coreferee stand-in; reference consumes chains at
    # parsing.py:1096-1137 with the caps maximum_coreference_chain
    # mentions=3 / word distance=300, en language_specific_rules.py:
    # 92-96): a 3rd-person pronoun resolves to the nearest compatible
    # nominal in a PRECEDING sentence within 300 words; a compatible
    # pronoun already in a chain relays its antecedent, so chains span
    # any number of sentences ("I saw a dog. It barked. It was hungry.")
    MAX_COREF_DISTANCE = 300  # words (reference en rules :92-96)
    MAX_COREF_MENTIONS = 3
    # reflexive pronouns bind within their own sentence to the nearest
    # compatible preceding nominal ("The man who knows himself",
    # reference test_semantics_EN.py:742-747)
    _REFLEXIVE = {"himself": False, "herself": False, "itself": True,
                  "themselves": True, "myself": False, "ourselves": False,
                  "yourself": False, "sich": None}
    for (s, e) in sent_bounds:
        for t in toks[s: e + 1]:
            w = t.text.lower()
            if t.pos != "PRON" or w not in _REFLEXIVE:
                continue
            neuter = _REFLEXIVE[w]
            for c in range(t.i - 1, s - 1, -1):
                ct = toks[c]
                if ct.pos not in ("NOUN", "PROPN") or ct.dep == "compound":
                    continue
                is_person = (ct.ent_type in ("PERSON", "PER")
                             or ct.text.lower() in L.PERSON_NOUNS_EN
                             or ct.text.lower() in L.PERSON_NOUNS_DE)
                if neuter is None or (neuter and not is_person) \
                        or (neuter is False and is_person):
                    # plural reflexives bind the whole conjunct group
                    # ("The panther and the panther chased THEMSELVES")
                    antes = [c]
                    if w in ("themselves", "ourselves", "sich"):
                        anchor = next(
                            (t2 for t2 in toks
                             if t2.righthand_siblings
                             and (t2.i == c
                                  or c in t2.righthand_siblings)),
                            None)
                        if anchor is not None:
                            antes = [anchor.i] + list(
                                anchor.righthand_siblings)
                    chain = sorted(set(antes) | {t.i}
                                   | set(ct.coref_chain)
                                   | set(t.coref_chain))
                    for idx in chain:
                        toks[idx].coref_chain = chain
                    t.most_specific_coref = antes[0]
                    for a in antes:
                        for d in list(all_deps):
                            if d.get("coref"):
                                continue
                            if d["child"] == t.i:
                                all_deps.append({
                                    "parent": d["parent"], "child": a,
                                    "label": d["label"],
                                    "uncertain": d["uncertain"],
                                    "coref": True, "prep": d.get("prep")})
                            elif d["parent"] == t.i and d["child"] != a:
                                all_deps.append({
                                    "parent": a, "child": d["child"],
                                    "label": d["label"],
                                    "uncertain": d["uncertain"],
                                    "coref": True, "prep": d.get("prep")})
                    break
    for si in range(len(sent_bounds)):
        s, e = sent_bounds[si]
        for t in toks[s: e + 1]:
            w = t.text.lower()
            if t.pos != "PRON" or w not in (
                    L.NEUTER_PRONOUNS_EN | L.MASC_PRONOUNS_EN
                    | L.FEM_PRONOUNS_EN | {"sie"}
                    | _DE_MASC_PRON | _DE_NEUT_PRON | _DE_PLURAL_PRON):
                continue
            neuter = w in L.NEUTER_PRONOUNS_EN | _DE_NEUT_PRON
            agnostic = w in ("they", "them") or w in _DE_PLURAL_PRON
            ante = None
            fallback = None
            mentions_crossed = 0
            # subject preference (centering): a compatible resolved
            # pronoun SUBJECT of the previous sentence relays its chain
            # before recency kicks in ("I saw a horse. It was chasing a
            # cat. IT was big." → horse, not cat)
            if si > 0:
                ps, pe = sent_bounds[si - 1]
                for c in range(ps, pe + 1):
                    ct = toks[c]
                    if ct.pos == "PRON" and ct.dep in ("nsubj", "nsubjpass") \
                            and ct.most_specific_coref >= 0 \
                            and ct.text.lower() in (
                                L.NEUTER_PRONOUNS_EN | _DE_NEUT_PRON
                                | _DE_PLURAL_PRON
                                if neuter or agnostic
                                else L.MASC_PRONOUNS_EN | _DE_MASC_PRON
                                if w in L.MASC_PRONOUNS_EN | _DE_MASC_PRON
                                else L.FEM_PRONOUNS_EN | {"sie"}):
                        ante = ct.most_specific_coref
                        break
            for c in (() if ante is not None else
                      range(t.i - 1, max(0, t.i - MAX_COREF_DISTANCE) - 1, -1)):
                if c >= s and not any(
                        toks[x].pos in ("CCONJ", "SCONJ")
                        or toks[x].text == ","
                        for x in range(c + 1, t.i)):
                    # same-sentence antecedents need a clause boundary
                    # between them and the pronoun ("I saw a dog AND it
                    # was chasing a cat" — a clause-mate object can't
                    # bind its own subject)
                    continue
                ct = toks[c]
                cw = ct.text.lower()
                relay_set = (L.NEUTER_PRONOUNS_EN | _DE_NEUT_PRON
                             | _DE_PLURAL_PRON
                             if neuter or agnostic
                             else L.MASC_PRONOUNS_EN | _DE_MASC_PRON
                             if w in L.MASC_PRONOUNS_EN | _DE_MASC_PRON
                             else L.FEM_PRONOUNS_EN | {"sie"})
                if ct.pos == "PRON" and ct.most_specific_coref >= 0 \
                        and cw in relay_set:
                    # chain relay through an already-resolved mention of
                    # the SAME gender ('she' must not relay through 'he')
                    ante = ct.most_specific_coref
                    break
                if ct.pos == "PRON":
                    mentions_crossed += 1
                    if mentions_crossed >= MAX_COREF_MENTIONS:
                        break  # reference chain-context cap
                    continue
                if ct.pos not in ("NOUN", "PROPN") or ct.dep == "compound":
                    continue
                is_person = (ct.ent_type in ("PERSON", "PER")
                             or cw in L.PERSON_NOUNS_EN
                             or cw in L.PERSON_NOUNS_DE)
                if agnostic:
                    # 'they'/DE plural forms are person- and
                    # gender-agnostic
                    ante = c
                    break
                if neuter and not is_person:
                    ante = c
                    break
                if not neuter and not is_person and fallback is None:
                    # he/she prefer a person antecedent but fall back to
                    # the nearest noun when none exists in range
                    # ("There was a dog. HE chased a cat" — coreferee
                    # links the animal; 'it' keeps the non-person gate)
                    fallback = c
                if not neuter and is_person:
                    # given-name gender gate ("she" skips Peter Jones):
                    # unknown names are compatible with either gender
                    given = cw
                    if ct.multiwords:
                        given = ct.multiwords[0]["text"].split(" ")[0]
                    masc_pron = w in L.MASC_PRONOUNS_EN | _DE_MASC_PRON
                    if (masc_pron and given in _FEMALE_NAMES) or \
                            (not masc_pron and given in _MALE_NAMES):
                        continue
                    ante = c
                    break
            if ante is None:
                ante = fallback
            if ante is None:
                continue
            # plural pronouns pick up a whole conjunct group ("I saw a
            # dog and a horse. THEY were chasing a cat" — reference:
            # coreferee resolves plural mentions to every conjunct)
            antes = [ante]
            if w in ("they", "them") or w in _DE_GROUP_PRON:
                anchor = next(
                    (t2 for t2 in toks
                     if t2.righthand_siblings
                     and (t2.i == ante or ante in t2.righthand_siblings)),
                    None)
                if anchor is not None:
                    antes = [anchor.i] + list(anchor.righthand_siblings)
            chain = sorted(set(antes) | {t.i}
                           | set(toks[antes[0]].coref_chain)
                           | set(t.coref_chain))
            for idx in chain:
                toks[idx].coref_chain = chain
            t.most_specific_coref = antes[0]
            # mention-distance cap (reference
            # maximum_mentions_in_coreference_chain=3,
            # parsing.py:1109-1116): a pronoun more than 3 mentions
            # away from the antecedent stays in the chain but its deps
            # are NOT exchanged — "There was a dog. He… He… He… He
            # chased a cat" no longer matches
            if chain.index(t.i) - chain.index(antes[0]) > MAX_COREF_MENTIONS:
                continue
            # coreference-linked deps (reference parsing.py:1507-1532,
            # coreference_linked_child/parent dependencies): deps
            # pointing at OR out of the pronoun also attach to the
            # antecedent ("It was hungry" → hungry modifies dog)
            for a in antes:
                for d in list(all_deps):
                    if d.get("coref"):
                        continue
                    if d["child"] == t.i:
                        all_deps.append({"parent": d["parent"], "child": a,
                                         "label": d["label"], "uncertain": d["uncertain"],
                                         "coref": True, "prep": d.get("prep")})
                    elif d["parent"] == t.i and d["child"] != a:
                        all_deps.append({"parent": a, "child": d["child"],
                                         "label": d["label"], "uncertain": d["uncertain"],
                                         "coref": True, "prep": d.get("prep")})

    # --- noun-mention chains ("I saw a big horse. THE HORSE was …"):
    # a definite repeated noun corefers with its earlier mention
    # (coreferee links nominal mentions; reference consumes them at
    # parsing.py:1096-1137 like pronominal ones). The mention pair
    # exchanges child deps so modifiers of one mention are visible on
    # the other (reference word matching walks all mentions).
    _definite_dets = ({"the"} if lang == "en"
                      else {"der", "die", "das", "den", "dem"})
    for si in range(len(sent_bounds)):
        s, e = sent_bounds[si]
        for t in toks[s: e + 1]:
            if t.pos != "NOUN" or t.dep == "compound":
                continue
            has_the = any(
                toks[k].text.lower() in _definite_dets
                and toks[k].head == t.i
                for k in range(s, t.i))
            if not has_the:
                continue
            if any(toks[k].head == t.i
                   and toks[k].text.lower() in ("other", "another",
                                                "andere", "anderen")
                   for k in range(s, t.i)):
                # 'the OTHER policy' explicitly picks a different
                # referent — never a repeated mention (reference
                # coreferee keeps it out of the chain,
                # tests/en/..._with_coreference_EN.py:868-878)
                continue
            # the chain-opening mention is INDEFINITE and at most one
            # sentence back ("We saw A BIG DOG. The dog was chasing…")
            # — a definite antecedent is itself anaphoric, and longer
            # gaps aren't attested in the reference's test corpus
            prev_start = sent_bounds[si - 1][0] if si > 0 else s

            def _indefinite(c: int) -> bool:
                cs = next(b for (b, e2) in sent_bounds if b <= c
                          and e2 >= c)
                return not any(
                    toks[k].text.lower() in _definite_dets
                    and toks[k].head == c
                    for k in range(cs, c))

            ante = next(
                (c for c in range(t.i - 1, prev_start - 1, -1)
                 if toks[c].pos == "NOUN" and toks[c].dep != "compound"
                 and toks[c].derived_lemma == t.derived_lemma
                 and _indefinite(c)
                 # same-sentence mentions need a clause boundary
                 # ("a big horse AND the horse was chasing")
                 and (c < s or any(
                     toks[x].pos in ("CCONJ", "SCONJ")
                     or toks[x].text == ","
                     for x in range(c + 1, t.i)))), None)
            if ante is None and (
                    t.lemma in L.PERSON_NOUNS_EN
                    or t.lemma in L.PERSON_NOUNS_DE):
                # definite PERSON noun after a named person ("I saw
                # Richard. THE PERSON came home." — coreferee links the
                # nominal mention to the name; most-specific term =
                # the name, reference en test_semantics :782-798)
                ante = next(
                    (c for c in range(t.i - 1, prev_start - 1, -1)
                     if toks[c].pos == "PROPN"
                     and toks[c].dep != "compound"
                     and toks[c].ent_type in ("PERSON", "PER")
                     and (c < s or any(
                         toks[x].pos in ("CCONJ", "SCONJ")
                         or toks[x].text == ","
                         for x in range(c + 1, t.i)))), None)
                if ante is not None:
                    # the name is the chain's most specific term for
                    # every member, itself included (reference
                    # most_specific_coreferring_term_index)
                    toks[ante].most_specific_coref = ante
            if ante is None:
                continue
            at = toks[ante]
            chain = sorted({ante, t.i} | set(at.coref_chain)
                           | set(t.coref_chain))
            for idx in chain:
                toks[idx].coref_chain = chain
            t.most_specific_coref = ante
            for (a, b) in ((ante, t.i), (t.i, ante)):
                for d in list(all_deps):
                    if d.get("coref"):
                        continue
                    if d["child"] == a and d["label"] != "det":
                        all_deps.append({
                            "parent": d["parent"], "child": b,
                            "label": d["label"],
                            "uncertain": d["uncertain"], "coref": True,
                            "mention": True, "prep": d.get("prep")})
                    elif d["parent"] == a and d["child"] != b \
                            and d["label"] != "det":
                        all_deps.append({
                            "parent": b, "child": d["child"],
                            "label": d["label"],
                            "uncertain": d["uncertain"], "coref": True,
                            "mention": True, "prep": d.get("prep")})

    # --- repeated proper-name mentions ("Richard Paul Hudson.
    # HUDSON came"): a bare PROPN corefers with an earlier proper-name
    # mention sharing its lemma or containing it as a multiword member
    # (coreferee links repeated names; reference consumes the chain
    # like any nominal mention, parsing.py:1096-1137)
    for si in range(1, len(sent_bounds)):
        s, e = sent_bounds[si]
        mw_members = {i for tk in toks for mw in tk.multiwords
                      for i in mw["token_indexes"]}
        for t in toks[s: e + 1]:
            # only BARE names corefer backwards — a token heading or
            # inside its own multiword names a (possibly different)
            # entity ('Jane Jones' does not corefer with 'Peter
            # Jones' over the shared surname)
            if t.pos != "PROPN" or t.dep == "compound" or t.coref_chain \
                    or t.multiwords or t.i in mw_members:
                continue
            prev_start = sent_bounds[max(0, si - 2)][0]
            ante = next(
                (c for c in range(s - 1, prev_start - 1, -1)
                 if toks[c].pos == "PROPN" and toks[c].dep != "compound"
                 and (toks[c].derived_lemma == t.derived_lemma
                      or any(t.lemma in mw["lemma"].split()
                             for mw in toks[c].multiwords))), None)
            if ante is None:
                continue
            at = toks[ante]
            chain = sorted({ante, t.i} | set(at.coref_chain)
                           | set(t.coref_chain))
            for idx in chain:
                toks[idx].coref_chain = chain
            t.most_specific_coref = ante
            for (a, b) in ((ante, t.i), (t.i, ante)):
                for d in list(all_deps):
                    if d.get("coref"):
                        continue
                    if d["child"] == a and d["label"] != "det":
                        all_deps.append({
                            "parent": d["parent"], "child": b,
                            "label": d["label"],
                            "uncertain": d["uncertain"], "coref": True,
                            "mention": True, "prep": d.get("prep")})
                    elif d["parent"] == a and d["child"] != b \
                            and d["label"] != "det":
                        all_deps.append({
                            "parent": b, "child": d["child"],
                            "label": d["label"],
                            "uncertain": d["uncertain"], "coref": True,
                            "mention": True, "prep": d.get("prep")})

    # --- matchability (reference parsing.py:1436-1448: matchable_pos
    # includes ADP and AUX, en language_specific_rules.py:25-36 — the
    # prep-noun and be-attribute phraselet parents must be matchable)
    for t in toks:
        w = t.text.lower()
        t.is_matchable = (
            t.pos in ("NOUN", "PROPN", "VERB", "ADJ", "ADV", "NUM", "ADP", "AUX")
            and w not in L.GENERIC_PRONOUNS_EN
            and w not in L.INTERROGATIVES_EN
            and not (lang == "de" and w in L.INTERROGATIVES_DE)
            # by/of/to carry pobjb/pobjo/pobjt deps instead and are
            # unmatchable (reference language_specific_rules.py:615-617);
            # German von/vom/durch are their agent/genitive analogues
            # (de rules — "Kündigung VON einer Versicherung" matches
            # the bare genitive)
            and not (t.pos == "ADP" and lang == "en"
                     and w in ("by", "of", "to"))
            and not (t.pos == "ADP" and lang == "de"
                     and w in ("von", "vom", "durch"))
            # a German modal governing a content verb is an auxiliary
            # shell — 'Immer soll er es haben' produces phraselets
            # over haben only (ref test_phraselet_production_DE.py:153)
            and not (lang == "de" and w in L.MODALS_DE
                     and any(t2.pos == "VERB"
                             and t2.sent_idx == t.sent_idx
                             for t2 in toks))
            # the German werden-passive auxiliary is unmatchable (the
            # reference's passive correction demotes it, de rules
            # :856-897: '… wurde durchgeführt' produces no word: werden
            # even in match-all mode, ref production suite :215)
            and not (lang == "de"
                     and w in ("wird", "wurde", "wurden", "werden",
                               "worden")
                     and t.dep in ("aux", "auxpass"))
            # German trailing perfect auxiliaries ("wird … gejagt
            # HABEN", "… gejagt worden SEIN") are tense shells, never
            # matchable (reference de test_semantics :161-208:
            # '-6:None'/'-7:None' and is_matchable False)
            and not (lang == "de" and t.pos == "AUX"
                     and w in ("haben", "sein", "worden")
                     and any(t2.pos == "VERB"
                             and t2.sent_idx == t.sent_idx
                             and t2.i < t.i
                             and _is_participle(t2.text)
                             for t2 in toks))
            # EN auxiliaries are unmatchable (reference en rules
            # :590-592: dep aux/auxpass → is_matchable False; 'He WAS
            # chasing' produces no word: be even in match-all mode,
            # ref test_phraselet_production_EN.py:350)
            and not (lang == "en" and t.dep in ("aux", "auxpass"))
        )
        if t.pos in ("PRON", "DET", "ADV") and t.sent_idx == 0 \
                and w in (L.INTERROGATIVES_EN | L.INTERROGATIVES_DE
                          # interrogative determiners ("Auf der Basis
                          # WELCHER Information …?" — ref de
                          # test_semantics :2189-2191)
                          | {"welche", "welcher", "welches",
                             "welchen", "welchem"}):
            # only the FIRST sentence carries initial question words
            # (reference set_initial_question_words walks
            # next(doc.sents) only, parsing.py:1170-1192)
            s0 = sent_bounds[t.sent_idx][0]
            # initial, or fronted behind a PREPOSITION chain ("To whom
            # did you talk?", "On the basis of what information…" —
            # reference test_semantics_EN.py:962-977); a bare nominal
            # prefix ("The man whose …") is a relative, not a question
            if t.i == s0 or (
                    any(toks[k].pos == "ADP"
                        # multiword causal prepositions count
                        # ("BECAUSE OF whom did you come?" — reference
                        # en test_semantics :970-972)
                        or toks[k].text.lower() in ("because", "owing",
                                                    "thanks")
                        for k in range(s0, t.i))
                    and all(toks[k].pos in ("ADP", "DET", "NOUN")
                            or toks[k].text.lower() in ("because",
                                                        "owing",
                                                        "thanks")
                            for k in range(s0, t.i))):
                t.is_initial_question_word = True

    # --- German compound subwords
    if lang == "de":
        for t in toks:
            t.subwords = _german_subwords(t)
        _distribute_conjoined_subwords(toks, text)

    for d in all_deps:
        d.setdefault("prep_case", None)
    token_dicts = []
    for t in toks:
        w = t.text.lower()
        direct_reprs = sorted({t.lemma, w})
        derivation_reprs = [t.derived_lemma] if t.derived_lemma != t.lemma else []
        token_dicts.append({
            "i": t.i, "text": t.text, "char_start": t.char_start,
            "lemma": t.lemma,
            "derived_lemma": t.derived_lemma, "pos": t.pos, "tag": t.tag,
            "dep": t.dep, "head": t.head, "ent_type": t.ent_type,
            "direct_reprs": direct_reprs,
            "derivation_reprs": derivation_reprs,
            "is_negated": t.is_negated, "is_matchable": t.is_matchable,
            "involved_in_or": t.involved_in_or,
            "is_initial_question_word": t.is_initial_question_word,
            "righthand_siblings": t.righthand_siblings,
            "sent_idx": t.sent_idx,
            "coref_chain": t.coref_chain,
            "most_specific_coref": t.most_specific_coref,
            "subwords": t.subwords,
            "multiwords": t.multiwords,
        })
    for d in all_deps:
        d.setdefault("mention", False)
    return {"tokens": token_dicts, "deps": all_deps}
