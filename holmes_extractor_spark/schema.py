"""Table schemas (the columnar re-expression of the reference's
in-memory object model, SURVEY.md §1.1).

The reference keeps a corpus as pickled spaCy Docs in worker RAM
(reference: manager.py:1016-1029, README.md:283); here every stage is a
typed columnar table so Catalyst can prune/push down and stages are
independently checkpointable.
"""

from __future__ import annotations

from pyspark.sql import types as T

SUBWORD = T.StructType([
    T.StructField("idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("lemma", T.StringType()),
    T.StructField("derived_lemma", T.StringType()),
    T.StructField("char_start", T.IntegerType()),
    T.StructField("dependent", T.IntegerType()),
    T.StructField("dep_label", T.StringType()),
    T.StructField("governor", T.IntegerType()),
    T.StructField("gov_label", T.StringType()),
    # True for subwords DISTRIBUTED from a conjoined compound
    # ("Königs- und Prinzenabdanken" shares the head 'abdanken' into
    # 'Königs-'; reference de rules :740-772). Borrowed subwords join
    # intcompound matching but are not indexed (their own token owns
    # the posting).
    T.StructField("borrowed", T.BooleanType()),
    # index of the token whose surface text physically contains this
    # subword — differs from the owning token for borrowed subwords
    # (reference Subword.containing_token_index, parsing.py Subword)
    T.StructField("containing_i", T.IntegerType()),
])

MULTIWORD = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("lemma", T.StringType()),
    T.StructField("derived_lemma", T.StringType()),
    T.StructField("token_indexes", T.ArrayType(T.IntegerType())),
])

TOKEN = T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("text", T.StringType()),
    # character offset in the original document text (spaCy token.idx)
    T.StructField("char_start", T.IntegerType()),
    T.StructField("lemma", T.StringType()),
    T.StructField("derived_lemma", T.StringType()),
    T.StructField("pos", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("dep", T.StringType()),
    T.StructField("head", T.IntegerType()),
    T.StructField("ent_type", T.StringType()),
    T.StructField("direct_reprs", T.ArrayType(T.StringType())),
    T.StructField("derivation_reprs", T.ArrayType(T.StringType())),
    T.StructField("is_negated", T.BooleanType()),
    T.StructField("is_matchable", T.BooleanType()),
    # member of an or-conjunction: every match on the token is
    # uncertain (reference parsing.py:409-412)
    T.StructField("involved_in_or", T.BooleanType()),
    T.StructField("is_initial_question_word", T.BooleanType()),
    T.StructField("righthand_siblings", T.ArrayType(T.IntegerType())),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("coref_chain", T.ArrayType(T.IntegerType())),
    T.StructField("most_specific_coref", T.IntegerType()),
    T.StructField("subwords", T.ArrayType(SUBWORD)),
    T.StructField("multiwords", T.ArrayType(MULTIWORD)),
])

SEM_DEP = T.StructType([
    T.StructField("parent", T.IntegerType()),
    T.StructField("child", T.IntegerType()),
    T.StructField("label", T.StringType()),
    T.StructField("uncertain", T.BooleanType()),
    T.StructField("coref", T.BooleanType()),
    # True for deps exchanged between NOUN mentions of one coreference
    # chain ("a big horse … the horse"): used by matching, but not a
    # separate KG triple — the reference extracts phraselets per token
    # and walks mentions only at match time (parsing.py:2106-2243)
    T.StructField("mention", T.BooleanType()),
    # lemma of the mediating preposition for pobj*/prep-derived deps
    # (question matching gates on prep identity/class, reference
    # question word matching en rules :1327-1469)
    T.StructField("prep", T.StringType()),
    # German grammatical case of the prepositional object ('dat'/'acc'
    # when determinable from the determiner or contraction, else NULL):
    # wo gates on in+DAT, wohin on in+ACC (reference de rules
    # :2005-2058 reads Case= morphology)
    T.StructField("prep_case", T.StringType()),
])

DOCS = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("parser_version", T.StringType()),
    T.StructField("n_tokens", T.IntegerType()),
    # original document text, retained for char-exact passage/answer
    # reporting (the reference keeps the full spaCy Doc; queries that
    # don't report text never read the column — parquet prunes it)
    T.StructField("text", T.StringType()),
    T.StructField("tokens", T.ArrayType(TOKEN)),
    T.StructField("deps", T.ArrayType(SEM_DEP)),
])

EDGES = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("template", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("subj", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("parent_idx", T.IntegerType()),
    T.StructField("child_idx", T.IntegerType()),
    T.StructField("negated", T.BooleanType()),
    T.StructField("uncertain", T.BooleanType()),
    T.StructField("involves_coref", T.BooleanType()),
    # reverse-only phraselets never initiate matching (reference
    # parsing.py:512-515 + reverse-only parent lemmas,
    # en language_specific_rules.py:834-845)
    T.StructField("reverse_only", T.BooleanType()),
    # person-ness of the child pole: gates who/what question answers
    # (reference question word matching, en rules :1327-1365)
    T.StructField("child_is_person", T.BooleanType()),
    # who-gate: PERSON-ish entity / morph-gendered noun / gendered
    # pronoun in the coref chain (reference en rules :1338-1363)
    T.StructField("child_is_gendered", T.BooleanType()),
    # True for noun-mention-exchange variants: they serve topic/
    # structural matching (the reference expands mentions at match
    # time, parsing.py:2106-2243) but are NOT phraselet-production
    # output, so KG queries filter them
    T.StructField("mention", T.BooleanType()),
    T.StructField("prep", T.StringType()),
    T.StructField("prep_case", T.StringType()),
    # subword ordinals of the poles (-1 = whole token): intcompound
    # edges and head-subword pole variants anchor on compound PARTS,
    # and the reference's overlap map keys on (token, subword)
    # (topic_matching.py:904-933 uses CorpusWordPosition)
    T.StructField("parent_sub", T.IntegerType()),
    T.StructField("child_sub", T.IntegerType()),
])

WORDS = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("word", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("idx", T.IntegerType()),
    T.StructField("negated", T.BooleanType()),
    # True for words admitted only by the all-words pass (non-noun
    # tags) — the reference's 'created without matching tags'
    T.StructField("any_tag", T.BooleanType()),
    # token span covered by the word instance (≠ idx..idx only for
    # multiword entries) — drives the reference's
    # single-word-superfluous-by-multiword suppression
    # (topic_matching.py:760-795)
    T.StructField("span_start", T.IntegerType()),
    T.StructField("span_end", T.IntegerType()),
    # German compound-part instances carry the subword ordinal within
    # their token (-1 = whole-word/multiword instance) — drives the
    # reference's whole-word-beats-subword rejection
    # (topic_matching.py:815-829)
    T.StructField("subword_idx", T.IntegerType()),
])
