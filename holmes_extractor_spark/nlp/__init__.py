"""Deterministic NLP core.

The reference (msg-systems/holmes-extractor) builds on spaCy + coreferee
for tokenization, tagging, dependency parsing and coreference
(reference: holmes_extractor/manager.py:1259-1297 registers the `holmes`
pipe after spaCy's tok2vec/tagger/parser/ner/coreferee). spaCy is not
available in this environment, so this package provides a deterministic
rule-based equivalent with the same *contract*: a token sequence where
each token carries lemma, derived lemma, POS, dependency head/label,
entity type, negation, matchability, coreference mentions and multiword
spans — i.e. the fields of the reference's HolmesDictionary
(reference: holmes_extractor/parsing.py:331-487).

Determinism is the point: the same text always yields the same parse on
every executor, which is what makes the per-url byte/value invariants
and the DuckDB oracle checks possible.
"""
