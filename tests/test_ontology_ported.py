"""Ported from reference tests/common/test_ontology.py (all 32 tests).

The reference loads tests/common/test_ontology.owl (+ test_ontology2.owl
for the combined cases) via rdflib; here the same graph is transcribed
as (subject, relation, object) triples — the repo's OWL stand-in —
with '~sense' node-id suffixes modelling the owl file's IRI-distinct
homonyms (animals#horse vs sports#horse). Each test cites its source
line in the reference file. Pure driver-side: no Spark session needed.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.pipeline.linking import Ontology

# transcribed from reference tests/common/test_ontology.owl (class /
# individual declarations listed in file order; labels lowercased,
# underscores → spaces, per reference ontology.py:210-222)
COMMON_ONTOLOGY = [
    ("german shepherd dog", "subClassOf", "dog"),          # :25
    ("peters plc", "subClassOf", "company"),               # :32
    ("cat", "equivalentClass", "cat creature"),            # :47
    ("cat", "equivalentClass", "pussy"),                   # :48
    ("cat", "subClassOf", "animal"),                       # :49
    ("cat creature", "subClassOf", "animal"),              # :54
    ("chase", "equivalentClass", "chasing"),               # :60
    ("cinco", "subClassOf", "cuatro"),                     # :66
    ("cuatro", "subClassOf", "tres"),                      # :76
    ("cztery", "subClassOf", "trzy"),                      # :82
    ("dog", "equivalentClass", "hound"),                   # :88
    ("dog", "subClassOf", "animal"),                       # :89
    ("dos", "subClassOf", "unouno"),                       # :95
    ("dwa", "subClassOf", "jeden"),                        # :101
    ("foal", "subClassOf", "horse~animals"),               # :107
    ("horse~animals", "subClassOf", "animal"),             # :142-150
    ("hound", "subClassOf", "animal"),                     # :156
    ("kitten", "subClassOf", "cat"),                       # :162
    ("oans", "equivalentClass", "unouno"),                 # :168
    ("open", "equivalentClass", "take out"),               # :174
    ("pięć", "subClassOf", "cztery"),                      # :180
    ("puppy", "subClassOf", "dog"),                        # :186
    ("pussy", "subClassOf", "animal"),                     # :192
    ("rainbows", "subClassOf", "arc"),                     # :198
    ("seis", "subClassOf", "cinco"),                       # :204
    ("sześć", "subClassOf", "pięć"),                       # :210
    ("tres", "subClassOf", "dos"),                         # :216
    ("trzy", "subClassOf", "dwa"),                         # :222
    ("horse~sports", "subClassOf", "school gear"),         # :287-292
    ("horse~sports", "subClassOf", "gymnastics equipment"),
    ("vaulting horse", "subClassOf", "horse~sports"),      # :296-300
    ("bakers plc", "type", "company"),                     # individuals
    ("fido", "type", "dog"),
    ("mimi momo", "type", "cat"),
]

# reference tests/common/test_ontology2.owl
ONTOLOGY_2 = [
    ("poodle", "subClassOf", "dog"),
    ("schneeglöckchen", "type", "cat"),
]

ontology = Ontology(COMMON_ONTOLOGY)
symmetric_ontology = Ontology(COMMON_ONTOLOGY, symmetric_matching=True)
combined_ontology_1 = Ontology([COMMON_ONTOLOGY, ONTOLOGY_2])
combined_ontology_2 = Ontology([ONTOLOGY_2, COMMON_ONTOLOGY])
combined_ontology_symmetric = Ontology([COMMON_ONTOLOGY, ONTOLOGY_2],
                                       symmetric_matching=True)


def words_matching(ont, word):
    # reference test helper _get_words_matching: union of entry reprs
    return ont.get_words_matching(word)


def test_multiwords():  # ref :24
    assert ontology.contains_multiword("gymnastics equipment")
    assert ontology.contains_multiword("German Shepherd dog")
    assert ontology.contains_multiword("MIMI MOMO")
    assert not ontology.contains_multiword("horse")
    assert not ontology.contains_multiword("economic development")
    assert not ontology.contains_multiword("Fido")


def test_word_does_not_match_itself():  # ref :32
    assert len(words_matching(ontology, "football")) == 0
    assert len(words_matching(ontology, "fido")) == 0
    assert len(words_matching(ontology, "mimi momo")) == 0


def test_word_matches_subclasses_and_synonyms():  # ref :37
    assert words_matching(ontology, "dog") == {
        "german shepherd dog", "puppy", "hound", "fido"}
    assert words_matching(ontology, "cat") == {
        "kitten", "pussy", "mimi momo", "cat creature"}
    assert words_matching(ontology, "hound") == {
        "german shepherd dog", "puppy", "dog", "fido"}
    assert words_matching(ontology, "pussy") == {
        "kitten", "cat", "mimi momo", "cat creature"}
    assert words_matching(ontology, "cat creature") == {
        "kitten", "cat", "mimi momo", "pussy"}


def test_matching_normal_term():  # ref :50
    entry = ontology.matches("animal", ["foal"])
    assert entry.depth == 2
    assert entry.is_individual is False
    assert ontology.matches("foal", ["animal"]) is None


def test_matching_individual_term():  # ref :56
    entry = ontology.matches("animal", ["mimi momo"])
    assert entry.depth == 2
    assert entry.is_individual is True
    assert ontology.matches("mimi momo", ["animal"]) is None


def test_hononym_behaviour():  # ref :62
    assert words_matching(ontology, "horse") == {"vaulting horse", "foal"}
    assert words_matching(ontology, "gymnastics equipment") == {
        "horse", "vaulting horse"}
    assert words_matching(ontology, "animal") == {
        "dog", "cat", "horse", "german shepherd dog", "puppy", "hound",
        "kitten", "pussy", "foal", "fido", "mimi momo", "cat creature"}
    assert ontology.matches("animal", "vaulting horse") is None


def test_multiwords_symmetric():  # ref :73
    assert symmetric_ontology.contains_multiword("gymnastics equipment")
    assert symmetric_ontology.contains_multiword("German Shepherd dog")
    assert symmetric_ontology.contains_multiword("MIMI MOMO")
    assert not symmetric_ontology.contains_multiword("horse")
    assert not symmetric_ontology.contains_multiword("economic development")
    assert not symmetric_ontology.contains_multiword("Fido")


def test_word_does_not_match_itself_symmetric():  # ref :85
    assert len(words_matching(symmetric_ontology, "football")) == 0


def test_word_matches_subclasses_synonyms_and_superclasses_symmetric():  # ref :89
    assert words_matching(symmetric_ontology, "dog") == {
        "german shepherd dog", "puppy", "hound", "fido", "animal"}
    assert words_matching(symmetric_ontology, "cat") == {
        "kitten", "pussy", "mimi momo", "cat creature", "animal"}
    assert words_matching(symmetric_ontology, "hound") == {
        "german shepherd dog", "puppy", "dog", "fido", "animal"}
    assert words_matching(symmetric_ontology, "pussy") == {
        "kitten", "cat", "mimi momo", "cat creature", "animal"}
    assert words_matching(symmetric_ontology, "cat creature") == {
        "kitten", "cat", "mimi momo", "pussy", "animal"}
    assert words_matching(symmetric_ontology, "mimi momo") == {
        "cat", "cat creature", "pussy", "animal"}


def test_matching_normal_term_symmetric():  # ref :104
    entry = symmetric_ontology.matches("animal", ["foal"])
    assert entry.depth == 2
    assert entry.is_individual is False
    entry = symmetric_ontology.matches("foal", ["animal"])
    assert entry.depth == -2
    assert entry.is_individual is False


def test_matching_individual_term_symmetric():  # ref :112
    entry = symmetric_ontology.matches("animal", ["mimi momo"])
    assert entry.depth == 2
    assert entry.is_individual is True
    entry = symmetric_ontology.matches("mimi momo", ["animal"])
    assert entry.depth == -2
    assert entry.is_individual is False


def test_homonym_behaviour_symmetric():  # ref :120
    assert words_matching(symmetric_ontology, "horse") == {
        "vaulting horse", "foal", "animal", "school gear",
        "gymnastics equipment"}
    assert words_matching(symmetric_ontology, "gymnastics equipment") == {
        "horse", "vaulting horse"}
    assert words_matching(symmetric_ontology, "animal") == {
        "dog", "cat", "horse", "german shepherd dog", "puppy", "hound",
        "kitten", "pussy", "foal", "fido", "mimi momo", "cat creature"}
    assert symmetric_ontology.matches("animal", "vaulting horse") is None
    assert symmetric_ontology.matches("vaulting horse", "animal") is None


def test_most_general_hypernym_ancestor_good_case_class():  # ref :129
    assert ontology.get_most_general_hypernym_ancestor("cat") == "animal"


def test_most_general_hypernym_ancestor_good_case_multiword_class():  # ref :133
    assert ontology.get_most_general_hypernym_ancestor(
        "cat creature") == "animal"


def test_most_general_hypernym_ancestor_good_case_homonym_class():  # ref :137
    # the reference rebuilds the ontology 20× to prove the homonym
    # ancestor choice is deterministic (rdflib iteration order varies)
    result_set = set()
    for _ in range(1, 20):
        working = Ontology(COMMON_ONTOLOGY)
        result_set.add(working.get_most_general_hypernym_ancestor("horse"))
    assert result_set == {"animal"}


def test_most_general_hypernym_ancestor_good_case_individual():  # ref :146
    assert ontology.get_most_general_hypernym_ancestor("Fido") == "animal"


def test_most_general_hypernym_ancestor_good_case_multiword_individual():  # ref :150
    assert ontology.get_most_general_hypernym_ancestor(
        "Mimi Momo") == "animal"


def test_most_general_hypernym_ancestor_no_ancestor():  # ref :154
    assert ontology.get_most_general_hypernym_ancestor("animal") == "animal"


def test_most_general_hypernym_ancestor_not_in_ontology():  # ref :158
    assert ontology.get_most_general_hypernym_ancestor(
        "toolbox") == "toolbox"


def test_most_general_hypernym_ancestor_good_case_class_symmetric():  # ref :162
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "cat") == "animal"


def test_most_general_hypernym_ancestor_good_case_multiword_class_symmetric():  # ref :166
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "cat creature") == "animal"


def test_most_general_hypernym_ancestor_good_case_homonym_class_symmetric():  # ref :170
    result_set = set()
    for _ in range(1, 20):
        working = Ontology(COMMON_ONTOLOGY, symmetric_matching=True)
        result_set.add(working.get_most_general_hypernym_ancestor("horse"))
    assert result_set == {"animal"}


def test_most_general_hypernym_ancestor_good_case_individual_symmetric():  # ref :179
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "Fido") == "animal"


def test_most_general_hypernym_ancestor_good_case_multiword_individual_symmetric():  # ref :183
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "Mimi Momo") == "animal"


def test_most_general_hypernym_ancestor_no_ancestor_symmetric():  # ref :187
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "animal") == "animal"


def test_most_general_hypernym_ancestor_not_in_ontology_symmetric():  # ref :191
    assert symmetric_ontology.get_most_general_hypernym_ancestor(
        "toolbox") == "toolbox"


def _check_combined_ontologies_nonsymmetric_class(ont):  # ref :195
    assert words_matching(ont, "dog") == {
        "german shepherd dog", "puppy", "hound", "fido", "poodle"}
    assert len(words_matching(ont, "poodle")) == 0
    assert ont.get_most_general_hypernym_ancestor("poodle") == "animal"
    entry = ont.matches("animal", ["poodle"])
    assert entry.depth == 2
    assert not entry.is_individual
    assert ont.matches("poodle", ["animal"]) is None


def test_combined_ontologies_nonsymmetric_class_1():  # ref :207
    _check_combined_ontologies_nonsymmetric_class(combined_ontology_1)


def test_combined_ontologies_nonsymmetric_class_2():  # ref :210
    _check_combined_ontologies_nonsymmetric_class(combined_ontology_2)


def _check_combined_ontologies_nonsymmetric_individual(ont):  # ref :213
    assert words_matching(ont, "cat") == {
        "kitten", "pussy", "mimi momo", "cat creature", "schneeglöckchen"}
    assert len(words_matching(ont, "schneeglöckchen")) == 0
    assert ont.get_most_general_hypernym_ancestor(
        "schneeglöckchen") == "animal"
    entry = ont.matches("animal", ["schneeglöckchen"])
    assert entry.depth == 2
    assert entry.is_individual
    assert ont.matches("schneeglöckchen", ["animal"]) is None


def test_combined_ontologies_nonsymmetric_individual_1():  # ref :226
    _check_combined_ontologies_nonsymmetric_individual(combined_ontology_1)


def test_combined_ontologies_nonsymmetric_individual_2():  # ref :230
    _check_combined_ontologies_nonsymmetric_individual(combined_ontology_2)


def test_combined_ontologies_symmetric_class():  # ref :234
    assert words_matching(combined_ontology_symmetric, "dog") == {
        "german shepherd dog", "puppy", "hound", "fido", "poodle", "animal"}
    assert words_matching(combined_ontology_symmetric, "poodle") == {
        "dog", "hound", "animal"}
    assert combined_ontology_symmetric.get_most_general_hypernym_ancestor(
        "poodle") == "animal"
    entry = combined_ontology_symmetric.matches("animal", ["poodle"])
    assert entry.depth == 2
    assert not entry.is_individual
    entry = combined_ontology_symmetric.matches("poodle", ["animal"])
    assert entry.depth == -2
    assert not entry.is_individual


def test_combined_ontologies_symmetric_individual():  # ref :248
    assert words_matching(combined_ontology_symmetric, "cat") == {
        "kitten", "mimi momo", "cat creature", "schneeglöckchen", "animal",
        "pussy"}
    assert words_matching(combined_ontology_symmetric,
                          "schneeglöckchen") == {
        "cat", "cat creature", "pussy", "animal"}
    assert combined_ontology_symmetric.get_most_general_hypernym_ancestor(
        "schneeglöckchen") == "animal"
    entry = combined_ontology_symmetric.matches(
        "animal", ["schneeglöckchen"])
    assert entry.depth == 2
    assert entry.is_individual
    entry = combined_ontology_symmetric.matches(
        "schneeglöckchen", ["animal"])
    assert entry.depth == -2
    assert not entry.is_individual
