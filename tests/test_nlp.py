"""NLP core unit tests — golden-style assertions modeled on the
reference's semantics suites (reference tests/en/test_semantics_EN.py
asserts exact dependency stringifications like '1:nsubj; 4:dobj')."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from holmes_extractor_spark.nlp.lemmatizer import (derived_lemma_en, lemma_de,
                                                   lemma_en, lemma_en_sql)
from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.nlp.tokenizer import sentences, tokenize, tokenize_sql


def dep_string(parsed, i):
    """children of token i as 'child:label; ...' (sorted by child) —
    the reference's string_representation_of_children equivalent."""
    ds = sorted((d["child"], d["label"]) for d in parsed["deps"]
                if d["parent"] == i and not d["coref"])
    return "; ".join(f"{c}:{l}" for c, l in ds)


# ------------------------------------------------------------ goldens

def test_svo_deps():
    p = parse_document("The dog chased the cat.", "en")
    assert dep_string(p, 2) == "1:nsubj; 4:dobj"


def test_passive_normalization():
    p = parse_document("The cat was chased by the dog.", "en")
    # patient via nsubjpass, actor via pobjb (passive agent); the prep
    # dep is kept for wh_wildcard question matching (reference keeps
    # spaCy prep deps)
    assert dep_string(p, 3) == "1:nsubjpass; 4:prep; 6:pobjb"


def test_negation_scope():
    p = parse_document("The dog did not chase the cat.", "en")
    toks = p["tokens"]
    assert toks[4]["is_negated"] and toks[1]["is_negated"] and toks[6]["is_negated"]
    p2 = parse_document("The dog chased the cat.", "en")
    assert not any(t["is_negated"] for t in p2["tokens"])


def test_coref_links_antecedent():
    p = parse_document("I saw a cat. It was chased by the dog.", "en")
    it = p["tokens"][5]
    assert it["most_specific_coref"] == 3  # 'cat'
    assert any(d["coref"] and d["child"] == 3 and d["label"] == "nsubjpass"
               for d in p["deps"])


def test_phrasal_verb_lemma():
    p = parse_document("A plant grows up quickly.", "en")
    assert p["tokens"][2]["lemma"] == "grow up"


def test_predicative_adjective_rewire():
    p = parse_document("The man was poor.", "en")
    assert any(d["parent"] == 1 and d["child"] == 3 and d["label"] == "amod"
               for d in p["deps"])


def test_entity_multiword():
    p = parse_document("Richard Paul Hudson came home.", "en")
    mw = p["tokens"][2]["multiwords"]
    assert mw and mw[0]["derived_lemma"] == "richard paul hudson"
    assert p["tokens"][2]["ent_type"] == "PERSON"


def test_german_compound_subwords():
    p = parse_document("Polizeiinformation über Kriminelle.", "de")
    sw = p["tokens"][0]["subwords"]
    assert [s["lemma"] for s in sw] == ["polizei", "information"]
    assert sw[1]["gov_label"] == "" and sw[0]["gov_label"] == "intcompound"


def test_conjunction_distribution():
    p = parse_document("The dog and the lion chased the cat.", "en")
    # lion inherits nsubj with the ORIGINAL (certain) uncertainty —
    # child-side sibling copies are not marked uncertain (reference
    # copy_any_sibling_info parsing.py:1236-1274; conjunct matches are
    # asserted certain in tests/en/test_structural_matching_EN.py:423-455)
    assert any(d["child"] == 4 and d["label"] == "nsubj" and not d["uncertain"]
               for d in p["deps"])


# --------------------------------------------------------- lemmatizer

SAMPLE_WORDS = [
    "chased", "chases", "chasing", "was", "saw", "came", "grows", "dogs",
    "cats", "gives", "files", "employees", "men", "children", "quickly",
    "running", "jumped", "opened", "cities", "boxes", "classes", "walks",
    "this", "his", "bus", "lens", "news", "stopped", "hopped", "used",
]


def test_lemma_en_examples():
    assert lemma_en("chased") == "chase"
    assert lemma_en("was") == "be"
    assert lemma_en("dogs") == "dog"
    assert lemma_en("cities") == "city"
    assert lemma_en("stopped") == "stop"
    assert lemma_en("this") == "this"


def test_lemma_de_examples():
    assert lemma_de("jagte") == "jagen"
    assert lemma_de("Katzen") == "katze"
    assert lemma_de("Wohnungen") == "wohnung"


def test_derivation():
    assert derived_lemma_en("information") == "inform"
    assert derived_lemma_en("extraction") == "extract"


def test_lemma_sql_mirror_samples():
    con = duckdb.connect()
    expr = lemma_en_sql("w")
    for w in SAMPLE_WORDS:
        got = con.execute(f"SELECT {expr} FROM (SELECT '{w}' AS w)").fetchone()[0]
        assert got == lemma_en(w), f"{w}: sql={got} py={lemma_en(w)}"


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12))
def test_lemma_sql_mirror_property(w):
    con = duckdb.connect()
    expr = lemma_en_sql("w")
    got = con.execute(f"SELECT {expr} FROM (SELECT '{w}' AS w)").fetchone()[0]
    assert got == lemma_en(w)


# ---------------------------------------------------------- tokenizer

def test_tokenize_punct():
    assert tokenize("The dog, quickly!") == ["The", "dog", ",", "quickly", "!"]
    assert sentences(tokenize("A b. C d? E"))[0][-1] == "."


def test_tokenize_sql_mirror():
    con = duckdb.connect()
    for text in ["The dog chased the cat.", "a,b;c (x) \"y\"!", "  spaced   out  "]:
        got = con.execute(
            f"SELECT {tokenize_sql('t')} FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert list(got) == tokenize(text)
