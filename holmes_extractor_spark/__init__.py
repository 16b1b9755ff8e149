"""holmes_extractor_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query and data-processing capabilities of
msg-systems/holmes-extractor (reference at /root/reference, studied for
behavior only; no code is ported).

Architecture (Spark-first, per SURVEY.md §7):

- ``nlp/``       deterministic, dependency-parse NLP core (tokenize → tag →
                 parse → lemmatize → coref) runnable inside Arrow-batched
                 pandas UDFs. Replaces the reference's spaCy dependency
                 (not available in this environment) with a deterministic
                 rule engine whose decisions are mirrored 1:1 by SQL
                 expressions for oracle checking.
- ``pipeline/``  the KG-construction DataFrame stages: ingest (html→text),
                 parse (mapInPandas), semantic normalization, postings
                 (inverted index), phraselet/candidate-edge extraction,
                 ontology entity linking, connected-components
                 canonicalization, graph materialize + metrics/lineage.
- ``query/``     structural matching (Manager.match equivalent) and topic
                 matching (4-pass plan + activation scoring + passages).
- ``ops/``       large-scale training-data-pipeline operators: dedup
                 (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                 embedding-cosine), similarity search, text analysis
                 (langid, quality, token counts, fingerprints), multimodal
                 column plumbing.
- ``streaming/`` Structured Streaming ingestion of the pages table.

Everything is DataFrame-declarative; Python only ever runs vectorized
inside Arrow batches (mapInPandas / pandas UDFs), never per-row.
"""

__version__ = "0.1.0"

# bumped when parse/normalization semantics change (round 2:
# reference-faithful templates, negation scoping, coref chains;
# round 4: token char offsets + retained document text for char-exact
# passage reporting) — the serialized-docs version guard rejects older
# corpora, like the reference's SERIALIZED_DOCUMENT_VERSION
# (parsing.py:25)
PARSER_VERSION = "hse-2.2"
