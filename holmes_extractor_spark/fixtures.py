"""Deterministic synthetic `pages` corpus (Common-Crawl-style shape).

Input-table contract per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

The corpus is a pure integer-arithmetic function of ``documents.doc_id``
(the driver-provided table), so the exact same corpus can be generated
by a Spark expression pipeline AND by a DuckDB SQL CTE — which is what
lets the driver's oracle verify the full KG pipeline value-for-value:

    lang(i)     = 'de' if i % 7 == 3 else 'en'
    n_snips(i)  = 1 + (i % 5)
    snip(i, j)  = POOL_lang[(i*31 + j*17) % len(POOL_lang)]
    text(i)     = ' '.join(snip(i, j) for j in range(n_snips(i)))
    url(i)      = 'https://example.org/doc-' || i
    warc_ts(i)  = TIMESTAMP '2024-01-01' + i seconds
    html(i)     = '<html><body><p>' || text || '</p></body></html>'

Snippet sentences are drawn verbatim from the reference's test suites
(reference: tests/en/test_structural_matching_EN.py,
tests/en/test_phraselet_production_EN.py:76-90,
tests/de/test_semantics_DE.py) so holmes-documented goldens apply.

GOLDEN_EDGES / GOLDEN_WORDS freeze the engine's verified per-snippet
output (reviewed against the reference's documented behavior, e.g.
"A plant grows" → ``predicate-actor: grow-plant`` + ``word: plant``,
reference tests/en/test_phraselet_production_EN.py:76-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ----------------------------------------------------------- the pools

POOL_EN: list[str] = [
    "The dog chased the cat.",                       # 0
    "The cat was chased by the dog.",                # 1
    "The dog did not chase the cat.",                # 2
    "No dog chased any cat.",                        # 3
    "I saw a cat. It was chased by the dog.",        # 4  (coref)
    "Richard Paul Hudson came home.",                # 5  (entity multiword)
    "A plant grows.",                                # 6
    "A plant grows up quickly.",                     # 7  (phrasal verb)
    "The man was poor.",                             # 8  (predicative adj)
    "The rich man came home.",                       # 9
    "Somebody gives a file to an employee.",         # 10 (recipient)
    "The dog of the man chased the cat.",            # 11 (word-ofword)
    "Three dogs chased a cat.",                      # 12 (number-noun)
    "The man sang in the garden.",                   # 13 (prepgovernor)
    "Who came?",                                     # 14 (question; no triples)
    "The man who chased the cat came home.",         # 15 (subject relative)
    "The cat that the dog chased was old.",          # 16 (object relative, relant)
    "The man decided to open an account.",           # 17 (xcomp control, uncertain)
    "The man saw the dog in the garden.",            # 18 (prepposs alt attachment)
    "A holiday is hard to book.",                    # 19 (tough movement)
]

POOL_DE: list[str] = [
    "Der Hund jagte die Katze.",                     # 20
    "Polizeiinformation über Kriminelle.",           # 21 (compound subword)
    "Der reiche Mann kam nach Hause.",               # 22 (de adjective + PP)
    "Die Katze wurde vom Hund gejagt.",              # 23 (de passive + agent)
    "Der Hund jagte die Katze nicht.",               # 24 (de negation)
]

POOL = POOL_EN + POOL_DE  # global snippet ids 0..12

# ------------------------------------------- golden per-snippet output
# (snip_id, template, label, subj, obj, pred, negated, uncertain, coref)

GOLDEN_EDGES: list[tuple] = [
    (0, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (0, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (1, "predicate-passivesubject", "predicate-passivesubject: chase-cat", "chase", "cat", "chase", False, False, False),
    (1, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (2, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", True, False, False),
    (2, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", True, False, False),
    (3, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", True, False, False),
    (3, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (4, "predicate-patient", "predicate-patient: see-cat", "see", "cat", "see", False, False, False),
    (4, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (4, "predicate-passivesubject", "predicate-passivesubject: chase-cat", "chase", "cat", "chase", False, False, True),
    (5, "predicate-actor", "predicate-actor: come-richard paul hudson", "richard paul hudson", "come", "come", False, False, False),
    (5, "governor-adjective", "governor-adjective: come-home", "come", "home", "come", False, False, False),
    (6, "predicate-actor", "predicate-actor: grow-plant", "plant", "grow", "grow", False, False, False),
    (7, "predicate-actor", "predicate-actor: grow up-plant", "plant", "grow up", "grow up", False, False, False),
    (7, "governor-adjective", "governor-adjective: grow up-quick", "grow up", "quick", "grow up", False, False, False),
    (8, "governor-adjective", "governor-adjective: man-poor", "man", "poor", "man", False, False, False),
    (9, "governor-adjective", "governor-adjective: man-rich", "man", "rich", "man", False, False, False),
    (9, "predicate-actor", "predicate-actor: come-man", "man", "come", "come", False, False, False),
    (9, "governor-adjective", "governor-adjective: come-home", "come", "home", "come", False, False, False),
    (10, "predicate-patient", "predicate-patient: gift-file", "gift", "file", "gift", False, False, False),
    (10, "predicate-recipient", "predicate-recipient: gift-employee", "gift", "employee", "gift", False, False, False),
    (11, "word-ofword", "word-ofword: dog-man", "dog", "man", "dog", False, False, False),
    (11, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (11, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (12, "number-noun", "number-noun: dog-three", "dog", "three", "dog", False, False, False),
    (12, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (12, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (13, "predicate-actor", "predicate-actor: sing-man", "man", "sing", "sing", False, False, False),
    (13, "prepgovernor-noun", "prepgovernor-noun: sing-garden", "sing", "garden", "sing", False, False, False),
    # 14 "Who came?": interrogatives produce no phraselets (reference
    # excludes initial question words from matchability)
    (15, "predicate-actor", "predicate-actor: come-man", "man", "come", "come", False, False, False),
    (15, "predicate-actor", "predicate-actor: chase-man", "man", "chase", "chase", False, False, False),
    (15, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (15, "governor-adjective", "governor-adjective: come-home", "come", "home", "come", False, False, False),
    (16, "predicate-patient", "predicate-patient: chase-cat", "chase", "cat", "chase", False, False, False),
    (16, "predicate-actor", "predicate-actor: chase-dog", "dog", "chase", "chase", False, False, False),
    (16, "governor-adjective", "governor-adjective: cat-old", "cat", "old", "cat", False, False, False),
    (17, "predicate-actor", "predicate-actor: decide-man", "man", "decide", "decide", False, False, False),
    (17, "predicate-actor", "predicate-actor: open-man", "man", "open", "open", False, True, False),
    (17, "predicate-patient", "predicate-patient: open-account", "open", "account", "open", False, False, False),
    (17, "predicate-patient", "predicate-patient: decide-open", "decide", "open", "decide", False, False, False),
    (18, "predicate-actor", "predicate-actor: see-man", "man", "see", "see", False, False, False),
    (18, "predicate-patient", "predicate-patient: see-dog", "see", "dog", "see", False, False, False),
    (18, "prepgovernor-noun", "prepgovernor-noun: see-garden", "see", "garden", "see", False, False, False),
    (18, "prepgovernor-noun", "prepgovernor-noun: dog-garden", "dog", "garden", "dog", False, True, False),
    (19, "predicate-toughmovedargument", "predicate-toughmovedargument: book-holiday", "book", "holiday", "book", False, True, False),
    (19, "governor-adjective", "governor-adjective: holiday-hard", "holiday", "hard", "holiday", False, False, False),
    (20, "predicate-actor", "predicate-actor: jagen-hund", "hund", "jagen", "jagen", False, False, False),
    (20, "predicate-patient", "predicate-patient: jagen-katze", "jagen", "katze", "jagen", False, False, False),
    (21, "prepgovernor-noun", "prepgovernor-noun: polizeiinformation-kriminelle", "polizeiinformation", "kriminelle", "polizeiinformation", False, False, False),
    (21, "intcompound", "intcompound: informieren-polizei", "informieren", "polizei", "informieren", False, False, False),
    (22, "governor-adjective", "governor-adjective: mann-reich", "mann", "reich", "mann", False, False, False),
    (22, "predicate-actor", "predicate-actor: kommen-mann", "mann", "kommen", "kommen", False, False, False),
    (22, "prepgovernor-noun", "prepgovernor-noun: kommen-haus", "kommen", "haus", "kommen", False, False, False),
    (23, "predicate-passivesubject", "predicate-passivesubject: jagen-katze", "jagen", "katze", "jagen", False, False, False),
    (23, "predicate-actor", "predicate-actor: jagen-hund", "hund", "jagen", "jagen", False, False, False),
    (24, "predicate-actor", "predicate-actor: jagen-hund", "hund", "jagen", "jagen", True, False, False),
    (24, "predicate-patient", "predicate-patient: jagen-katze", "jagen", "katze", "jagen", True, False, False),
    # prep-noun (reverse-only) phraselets — preposition as parent
    (1, "prep-noun", "prep-noun: by-dog", "by", "dog", "by", False, False, False),
    (4, "prep-noun", "prep-noun: by-dog", "by", "dog", "by", False, False, False),
    (10, "prep-noun", "prep-noun: to-employee", "to", "employee", "to", False, False, False),
    (13, "prep-noun", "prep-noun: in-garden", "in", "garden", "in", False, False, False),
    (18, "prep-noun", "prep-noun: in-garden", "in", "garden", "in", False, False, False),
    (21, "prep-noun", "prep-noun: über-kriminelle", "über", "kriminelle", "über", False, False, False),
    (22, "prep-noun", "prep-noun: nach-haus", "nach", "haus", "nach", False, False, False),
    (23, "prep-noun", "prep-noun: vom-hund", "vom", "hund", "vom", False, False, False),
]

# (snip_id, word)
GOLDEN_WORDS: list[tuple] = [
    (0, "dog"), (0, "cat"),
    (1, "cat"), (1, "dog"),
    (2, "dog"), (2, "cat"),
    (3, "dog"), (3, "cat"),
    (4, "cat"), (4, "dog"),
    (5, "richard paul hudson"),
    (6, "plant"),
    (7, "plant"),
    (8, "man"),
    (9, "man"),
    (10, "file"), (10, "employee"),
    (11, "dog"), (11, "man"), (11, "cat"),
    (12, "dog"), (12, "cat"),
    (13, "man"), (13, "garden"),
    (15, "man"), (15, "cat"),
    (16, "cat"), (16, "dog"),
    (17, "man"), (17, "account"),
    (18, "man"), (18, "dog"), (18, "garden"),
    (19, "holiday"),
    (20, "hund"), (20, "katze"),
    (21, "polizeiinformation"), (21, "polizei"), (21, "informieren"),
    (21, "kriminelle"),
    (22, "mann"), (22, "haus"),
    (23, "katze"), (23, "hund"),
    (24, "hund"), (24, "katze"),
]

# deterministic word-vector fixture for embedding-based matching (the
# reference reads vectors off the spaCy model; we broadcast a table).
# Designed geometry: wolf≈dog≈hound, kitten≈cat, pursue≈chase.
WORD_VECTORS: dict[str, list[float]] = {
    "dog":    [1.00, 0.10, 0.00, 0.00],
    "wolf":   [0.95, 0.15, 0.05, 0.00],
    "hound":  [0.90, 0.20, 0.00, 0.10],
    "cat":    [0.05, 1.00, 0.10, 0.00],
    "kitten": [0.10, 0.95, 0.15, 0.00],
    "chase":  [0.00, 0.05, 1.00, 0.10],
    "pursue": [0.05, 0.00, 0.98, 0.12],
    "man":    [0.00, 0.00, 0.10, 1.00],
    "plant":  [0.30, 0.30, 0.30, 0.30],
}

MAX_SNIPS = 5
URL_PREFIX = "https://example.org/doc-"
HTML_PREFIX = "<html><body><p>"
HTML_SUFFIX = "</p></body></html>"


# --------------------------------------------------------- Spark side

def _snip_expr(doc_id, j: int):
    idx = (doc_id * 31 + F.lit(j) * 17)
    en = F.element_at(F.array(*[F.lit(s) for s in POOL_EN]),
                      ((idx % len(POOL_EN)) + 1).cast("int"))
    de = F.element_at(F.array(*[F.lit(s) for s in POOL_DE]),
                      ((idx % len(POOL_DE)) + 1).cast("int"))
    lang_is_de = (doc_id % 7) == 3
    snip = F.when(lang_is_de, de).otherwise(en)
    return F.when(F.lit(j) < 1 + (doc_id % 5), snip)


def build_pages(spark: SparkSession, sf_dir: str, n_pages: int | None = None) -> DataFrame:
    """Synthesize the `pages` corpus from documents.doc_id (pure
    column expressions — no Python rows, no RDDs; scales by reading an
    arbitrarily large seed table)."""
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if n_pages is not None:
        ids = ids.filter(F.col("doc_id") < n_pages)
    return _pages_from_ids(ids)


def build_pages_n(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Same corpus from spark.range — for benchmarks at arbitrary scale
    (doc_id = range id; identical arithmetic, still SQL-mirrorable)."""
    ids = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return _pages_from_ids(ids.select(F.col("id").alias("doc_id")))


def _pages_from_ids(ids: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    text = F.concat_ws(" ", *[_snip_expr(doc_id, j) for j in range(MAX_SNIPS)])
    return ids.select(
        doc_id.alias("page_id"),
        F.concat(F.lit(URL_PREFIX), doc_id.cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=doc_id.cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit(HTML_PREFIX), text, F.lit(HTML_SUFFIX)), "UTF-8").alias("html"),
        text.alias("text"),
        F.when((doc_id % 7) == 3, F.lit("de")).otherwise(F.lit("en")).alias("lang"),
    )


# -------------------------------------------------------- oracle side

def pages_cte_sql() -> str:
    """DuckDB CTEs mirroring build_pages: `page_snips(page_id, url,
    lang, j, snip_id)` + golden VALUES tables. Prepend to oracle SQL."""
    edges_vals = ",\n    ".join(
        f"({sid}, '{t}', '{lbl}', '{s}', '{o}', '{p}', {str(n).upper()}, {str(u).upper()}, {str(c).upper()})"
        for (sid, t, lbl, s, o, p, n, u, c) in GOLDEN_EDGES
    )
    words_vals = ",\n    ".join(f"({sid}, '{w}')" for (sid, w) in GOLDEN_WORDS)
    snips_vals = ",\n    ".join(
        f"({i}, '{s.replace(chr(39), chr(39)*2)}')" for i, s in enumerate(POOL)
    )
    return f"""
WITH RECURSIVE pages AS (
  SELECT doc_id AS page_id,
         '{URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 7 = 3 THEN 'de' ELSE 'en' END AS lang
  FROM documents
),
js AS (SELECT unnest(range({MAX_SNIPS})) AS j),
page_snips AS (
  SELECT p.page_id, p.url, p.lang, js.j,
         CASE WHEN p.lang = 'de'
              THEN {len(POOL_EN)} + (p.page_id * 31 + js.j * 17) % {len(POOL_DE)}
              ELSE (p.page_id * 31 + js.j * 17) % {len(POOL_EN)} END AS snip_id
  FROM pages p CROSS JOIN js
  WHERE js.j < 1 + p.page_id % 5
),
snippets(snip_id, snip_text) AS (VALUES
    {snips_vals}
),
golden_edges(snip_id, template, label, subj, obj, pred, negated, uncertain, involves_coref) AS (VALUES
    {edges_vals}
),
golden_words(snip_id, word) AS (VALUES
    {words_vals}
)
"""
