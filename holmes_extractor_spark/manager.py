"""User-facing Manager — API parity with the reference's
``holmes_extractor.Manager`` (reference: manager.py) so a user of the
reference can switch with minimal changes:

    m = SparkHolmesManager(spark)
    m.parse_and_register_document("A dog chased a cat", label="doc1")
    m.register_search_phrase("A dog chases a cat")
    m.match()                                   # list of match dicts
    m.topic_match_documents_against("dogs chasing cats")

Differences by design (Spark-first):
- the corpus is a DataFrame, not worker-process memory; registration is
  lazy and the parse runs distributed on first query (the reference's
  per-worker round-robin + reverse dict build, manager.py:289-361,
  becomes repartition + postings build);
- serialization is a parquet/Iceberg write, not pickled spaCy bytes;
  the parser_version column replicates the version guard
  (reference manager.py:1057-1079).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import PARSER_VERSION, errors
from .pipeline.linking import ontology_closure_local
from .pipeline.parse_stage import extract_edges, extract_words, parse_pages
from .pipeline.postings import (build_postings, corpus_frequencies,
                                frequency_factor)
from .query import structural, topic


class SparkHolmesManager:
    def __init__(self, spark: SparkSession, ontology: list[tuple] | None = None,
                 vectors: dict[str, list[float]] | None = None,
                 word_embedding_match_threshold: float = 1.0,
                 overall_similarity_threshold: float | None = None,
                 embedding_based_matching_on_root_words: bool = False,
                 ontology_symmetric: bool = False,
                 perform_coreference_resolution: bool = True):
        """`overall_similarity_threshold` < 1.0 enables embedding
        matching for structural match() (reference manager.py:115 —
        disabled by default); the per-token gate is
        overall ** n_matchable_non_entity_tokens (reference
        word_matching/embedding.py:105-108). When only
        `word_embedding_match_threshold` is given (the topic-matching
        knob, reference manager.py:735), the structural overall
        threshold is derived as its square root (reference
        manager.py:776-779). ``ontology_symmetric`` mirrors the
        reference's Ontology(symmetric_matching=True): hypernym matches
        are allowed with negative depths (reference ontology.py:30-44)."""
        self.spark = spark
        self._pending: list[tuple[str, str, str]] = []  # (url/label, text, lang)
        self._probe_pending: set[str] = set()  # labels awaiting the batched clash probe
        self._labels: set[str] = set()
        self._search_phrases: list[dict] = []
        self._docs: DataFrame | None = None
        self._postings: DataFrame | None = None
        self._closure_rows = [(q, m, d) for (q, m, d, _)
                              in ontology_closure_local(
                                  ontology, symmetric=ontology_symmetric)]
        # ontology-defined multiwords (space-separated entries) collapse
        # adjacent search-phrase tokens into one matchable unit
        # (reference parsing.py:2520-2542)
        self._ontology_multiwords = {
            w for pair in self._closure_rows for w in pair[:2] if " " in w}
        # reference Manager(perform_coreference_resolution=False):
        # coreference-linked deps are dropped from the parsed corpus
        self._coref = perform_coreference_resolution
        self._vectors = vectors
        self._embedding_threshold = word_embedding_match_threshold
        if overall_similarity_threshold is not None:
            if not 0.0 <= overall_similarity_threshold <= 1.0:
                # reference manager.py:134-136
                raise ValueError(
                    "overall_similarity_threshold must be between 0.0 and 1.0")
            self._overall_threshold = overall_similarity_threshold
        else:
            self._overall_threshold = word_embedding_match_threshold ** 0.5
        if self._overall_threshold == 1.0 and embedding_based_matching_on_root_words:
            # reference manager.py:137-143
            raise ValueError(
                "overall_similarity_threshold is 1.0; "
                "embedding_based_matching_on_root_words must be False")
        self._embedding_root_words = embedding_based_matching_on_root_words

    # ------------------------------------------------- corpus lifecycle

    def parse_and_register_document(self, document_text: str,
                                    label: str = "", lang: str = "en") -> None:
        """Reference: manager.py:375-384 (the default label is the
        empty string — a real, unique label intended for single-document
        use cases, not an auto-generated name)."""
        if label in self._labels:
            raise errors.DuplicateDocumentError(label)
        # bulk-registered corpora keep their labels in the DataFrame,
        # not on the driver — the clash probe against that frame is
        # BATCHED: pending labels accumulate and one filter-count job
        # checks them all at the next docs() build, so registering n
        # documents one-by-one after a bulk register costs one Spark
        # job, not n sequential jobs
        if self._docs is not None:
            self._probe_pending.add(label)
        if len(document_text) > 1_000_000:
            # reference parsing.py:953-963
            raise errors.DocumentTooBigError(
                "document too big (>1,000,000 chars)")
        self._labels.add(label)
        self._pending.append((label, document_text, lang))
        # postings rebuild needed (reference
        # word_dictionaries_need_rebuilding, manager.py:263)
        self._postings = None

    #: languages this engine's deterministic parser models support —
    #: the Spark analogue of the reference's loaded spaCy model name
    SUPPORTED_MODELS = ("en", "de")

    def register_serialized_documents(self, docs: DataFrame) -> None:
        """Bulk-register a pre-parsed docs table (reference:
        manager.py:333-361). Version- and model-guarded like the
        reference (WrongVersionDeserializationError /
        WrongModelDeserializationError, reference manager.py:1057-1079).

        Scale contract: every check below is count-based and
        distributed — registering a billion-row docs table allocates
        O(1) driver memory (no url ever comes to the driver here;
        ``document_labels()`` is the documented collect)."""
        bad = docs.filter(F.col("parser_version") != PARSER_VERSION).count()
        if bad:
            raise errors.WrongVersionDeserializationError(
                f"{bad} documents parsed with a different parser version "
                f"(expected {PARSER_VERSION})")
        badm = (docs.filter(~F.col("lang").isin(*self.SUPPORTED_MODELS))
                .select("lang").limit(1).collect())
        if badm:
            raise errors.WrongModelDeserializationError(
                f"documents serialized with unsupported model "
                f"'{badm[0]['lang']}' (supported: "
                f"{', '.join(self.SUPPORTED_MODELS)})")
        # duplicate-label detection without materializing the label
        # set: an internal groupBy-count check plus a semi-join count
        # against the already-registered corpus
        dup_new = (docs.groupBy("url").agg(F.count("*").alias("n"))
                   .filter(F.col("n") > 1).limit(1).collect())
        if dup_new:
            raise errors.DuplicateDocumentError(dup_new[0]["url"])
        if self._labels:
            dup_drv = (docs.filter(F.col("url").isin(*self._labels))
                       .select("url").limit(1).collect())
            if dup_drv:
                raise errors.DuplicateDocumentError(dup_drv[0]["url"])
        if self._docs is not None:
            dup_old = (docs.select("url")
                       .join(self._docs.select("url"), "url")
                       .limit(1).collect())
            if dup_old:
                raise errors.DuplicateDocumentError(dup_old[0]["url"])
        self._docs = docs if self._docs is None else self._docs.unionByName(docs)
        self._postings = None

    def remove_document(self, label: str) -> None:
        """Reference: manager.py:386-...; postings rebuilt lazily
        (anti-join semantics)."""
        self._labels.discard(label)
        self._pending = [p for p in self._pending if p[0] != label]
        self._probe_pending.discard(label)
        if self._docs is not None:
            self._docs = self._docs.filter(F.col("url") != label)
        self._postings = None

    def document_labels(self) -> list[str]:
        """Every registered label. Collects bulk-registered urls to the
        driver — a documented API-parity caveat (the reference returns
        a list too); the scale path is ``docs().select('url')``."""
        labels = set(self._labels)
        if self._docs is not None:
            labels |= {r["url"]
                       for r in self._docs.select("url").distinct().collect()}
        return sorted(labels)

    def serialize_documents(self, path: str) -> None:
        """Export the parsed corpus (parquet stands in for the
        reference's doc.to_bytes)."""
        self.docs().write.mode("overwrite").parquet(path)

    # --------------------------------------------------------- queries

    def register_search_phrase(self, text: str, label: str | None = None,
                               lang: str = "en") -> None:
        """Reference: manager.py:480-519 (compile + scatter)."""
        self._search_phrases.append(
            structural.compile_search_phrase(
                text, label, lang,
                ontology_multiwords=self._ontology_multiwords,
                perform_coreference_resolution=self._coref))

    def remove_all_search_phrases(self) -> None:
        self._search_phrases = []

    def docs(self) -> DataFrame:
        if self._probe_pending and self._docs is not None:
            # deferred duplicate-label probe against the bulk frame
            # (one job for all labels registered since the last build)
            probe = sorted(self._probe_pending)
            self._probe_pending = set()
            clash = (self._docs.filter(F.col("url").isin(*probe))
                     .select("url").limit(1).collect())
            if clash:
                label = clash[0]["url"]
                self._labels.discard(label)
                self._pending = [p for p in self._pending
                                 if p[0] != label]
                raise errors.DuplicateDocumentError(label)
        if self._docs is None or self._pending:
            pending = self._pending
            self._pending = []
            df = self.spark.createDataFrame(
                pending, "url string, text string, lang string")
            par = self.spark.sparkContext.defaultParallelism
            parsed = parse_pages(
                df.repartition(par, "url"),
                ontology_multiwords=frozenset(self._ontology_multiwords)
                if self._ontology_multiwords else None)
            if not self._coref:
                parsed = parsed.withColumn(
                    "deps", F.filter("deps", lambda d: ~d["coref"]))
            self._docs = (parsed if self._docs is None
                          else self._docs.unionByName(parsed)).cache()
        return self._docs

    def postings(self) -> DataFrame:
        if self._postings is None:
            self._postings = build_postings(self.docs()).cache()
        return self._postings

    def _has_documents(self) -> bool:
        return bool(self._pending) or self._docs is not None

    def _adhoc_docs(self, document_text: str, lang: str = "en") -> DataFrame:
        """One-off parsed frame for ``match(document_text=...)`` — the
        reference's ad-hoc document path (manager.py:583-585: the text
        is parsed under the label '' and matched INSTEAD of the
        preloaded corpus)."""
        df = self.spark.createDataFrame(
            [("", document_text, lang)],
            "url string, text string, lang string")
        parsed = parse_pages(
            df, ontology_multiwords=frozenset(self._ontology_multiwords)
            if self._ontology_multiwords else None)
        if not self._coref:
            parsed = parsed.withColumn(
                "deps", F.filter("deps", lambda d: ~d["coref"]))
        return parsed

    def get_corpus_frequency_information(self) -> tuple[dict, int]:
        """(repr → corpus frequency, maximum) — reference
        manager.py:615-675 / tests/en/test_structural_matching_EN.py:
        1033-1070. Collects to the driver (vocabulary-sized); the
        distributed path is ``corpus_frequencies(self.postings())``."""
        rows = corpus_frequencies(self.postings()).collect()
        d = {r["repr"]: r["freq"] for r in rows}
        return d, max(d.values(), default=0)

    def match_df(self, search_phrase_text: str | None = None,
                 document_label_filter: str | None = None,
                 process_initial_question_words: bool = False,
                 document_text: str | None = None) -> DataFrame:
        """Distributed match result as a DataFrame — the scale path: no
        driver collect, composable with further transformations or a
        table write. ``match()`` below is the reference-API convenience
        wrapper and collects; use match_df for large corpora."""
        sps = self._search_phrases
        if search_phrase_text is not None:
            sps = [structural.compile_search_phrase(
                search_phrase_text,
                process_initial_question_words=process_initial_question_words,
                ontology_multiwords=self._ontology_multiwords)]
        if not sps:
            raise errors.NoSearchPhraseError("no search phrases registered")
        if document_text is not None:
            docs = self._adhoc_docs(document_text)
            postings = build_postings(docs)
        elif not self._has_documents():
            # reference manager.py:597 / errors.py NoDocumentError
            raise errors.NoDocumentError("no documents registered")
        else:
            docs, postings = self.docs(), self.postings()
        return structural.match(self.spark, docs, postings,
                                sps, self._closure_rows,
                                vectors=self._vectors,
                                overall_similarity_threshold=self._overall_threshold,
                                embedding_based_matching_on_root_words=(
                                    self._embedding_root_words),
                                document_label_filter=document_label_filter)

    def match(self, search_phrase_text: str | None = None,
              document_label_filter: str | None = None,
              process_initial_question_words: bool = False,
              document_text: str | None = None) -> list[dict]:
        """Reference: manager.py:562-613. Returns reference-shaped
        match dicts sorted like the reference (manager.py:607-613).
        Initial question words are IGNORED by default like the
        reference's match() (manager.py:1182 passes False); pass
        process_initial_question_words=True for question-gated
        matching (the reference exposes that only via topic matching).
        NOTE: collects to the driver for API parity — appropriate for
        small result sets; use match_df() at corpus scale."""
        res = self.match_df(search_phrase_text, document_label_filter,
                            process_initial_question_words,
                            document_text=document_text)
        # sentences_within_document (reference structural_matching.py:
        # 820-842): the stripped texts of every sentence covering a
        # matched token, joined with single spaces — built as column
        # exprs over the retained document text + token char offsets
        doc_frame = (self._adhoc_docs(document_text)
                     if document_text is not None else self.docs())
        toks = doc_frame.select("url", "tokens",
                                F.col("text").alias("_t"))
        res = res.join(toks, "url", "left")
        mi = F.transform("word_matches", lambda w: w["doc_index"])
        tok_sent = lambda i: F.element_at(F.col("tokens"),  # noqa: E731
                                          i + 1)["sent_idx"]
        s_lo = F.array_min(F.transform(mi, tok_sent))
        s_hi = F.array_max(F.transform(mi, tok_sent))

        def sent_text(sidx):
            ts = F.filter(F.col("tokens"), lambda t: t["sent_idx"] == sidx)
            cs = F.array_min(F.transform(ts, lambda t: t["char_start"]))
            ce = F.array_max(F.transform(
                ts, lambda t: t["char_start"] + F.length(t["text"])))
            return F.trim(F.substring("_t", cs + 1, ce - cs))

        res = res.withColumn(
            "sentences_within_document",
            F.concat_ws(" ", F.transform(F.sequence(s_lo, s_hi), sent_text))
        ).drop("tokens", "_t")
        out = []
        for r in res.collect():
            wms = []
            for w in r["word_matches"]:
                d = w.asDict()
                d["explanation"] = _explanation(
                    d["match_type"], d.get("depth") or 0,
                    d["sp_word"], d.get("similarity") or 1.0)
                # reference-named aliases (reference match dict keys,
                # structural_matching.py:849-877) so callers of the
                # reference can switch without renaming
                d["search_phrase_token_index"] = d["sp_index"]
                d["search_phrase_word"] = d["sp_word"]
                d["document_token_index"] = d["doc_index"]
                d["document_word"] = d["doc_word"]
                d["similarity_measure"] = d["similarity"]
                wms.append(d)
            out.append({
                "search_phrase_label": r["phrase_label"],
                "document": r["url"],
                "index_within_document": r["index_within_document"],
                "sentences_within_document": r["sentences_within_document"],
                "negated": r["negated"],
                "uncertain": r["uncertain"],
                "involves_coreference": r["involves_coreference"],
                "overall_similarity_measure": r["overall_similarity"],
                "word_matches": wms,
            })
        return out

    def topic_match_documents_against(self, text_to_match: str,
                                      use_frequency_factor: bool = True,
                                      document_label_filter: str | None = None,
                                      **params) -> list[dict]:
        """Reference: manager.py:677-898 (use_frequency_factor default
        True, manager.py:736 — corpus frequencies deflate phraselet
        scores and gate the reverse/embedding retry planning;
        document_label_filter restricts to labels STARTING with the
        filter, manager.py:756). ``word_embedding_match_threshold``
        may be passed per call (reference manager.py:683 — per-call
        knob, default 0.8 there; here it defaults to the value the
        manager was constructed with so vector-less managers stay
        embedding-free)."""
        # parameter validation (reference manager.py:761-812)
        wemt = params.get("word_embedding_match_threshold",
                          self._embedding_threshold)
        if not 0.0 <= wemt <= 1.0:
            raise ValueError(
                "word_embedding_match_threshold must be between 0 and 1")
        iqw_emt = params.get(
            "initial_question_word_embedding_match_threshold", 1.0)
        if not 0.0 <= iqw_emt <= 1.0:
            raise ValueError(
                "initial_question_word_embedding_match_threshold must be "
                "between 0 and 1")
        iqw_behaviour = params.get("initial_question_word_behaviour",
                                   "process")
        if iqw_behaviour not in ("process", "exclusive", "ignore"):
            raise ValueError(": ".join(
                ("initial_question_word_behaviour", iqw_behaviour)))
        emb_ff = params.get("embedding_matching_frequency_threshold", 0.5)
        rel_ff = params.get("relation_matching_frequency_threshold", 0.25)
        if not 0.0 <= emb_ff <= 1.0:
            raise ValueError(": ".join(
                ("embedding_matching_frequency_threshold", str(emb_ff))))
        if not 0.0 <= rel_ff <= 1.0:
            raise ValueError(": ".join(
                ("relation_matching_frequency_threshold", str(rel_ff))))
        if emb_ff < rel_ff:
            # reference manager.py:812-820: an embedding retry is only
            # planned for poles that already cleared the relation gate
            raise errors.EmbeddingThresholdLessThanRelationThresholdError(
                f"embedding threshold {emb_ff} < relation threshold "
                f"{rel_ff}")
        if not self._has_documents():
            raise errors.NoDocumentError("no documents registered")
        emb_threshold = params.pop("word_embedding_match_threshold",
                                   self._embedding_threshold)
        docs = self.docs()
        if document_label_filter is not None:
            docs = docs.filter(F.col("url").startswith(document_label_filter))
        edges = extract_edges(docs)
        words = extract_words(docs)
        closure = None
        if self._closure_rows:
            closure = self.spark.createDataFrame(
                self._closure_rows,
                "query_word string, matched_word string, depth int")
        # frequency factors ALWAYS drive the reverse/retry planning
        # gates; use_frequency_factor=False only disables SCORE
        # deflation (reference manager.py:736 passes the factors to the
        # TopicMatcher regardless and the flag gates the multiplier in
        # perform_activation_scoring, topic_matching.py:998-1000).
        # Punctuation reprs are excluded from the frequency dict
        # (reference manager.py:1147-1156 skips string.punctuation
        # keys) and ENTITYNOUN is OUR index-space artifact — the
        # reference has no such reverse-dict key, so it must not
        # inflate maximum_corpus_frequency
        import string
        punct = list(string.punctuation)
        ff = frequency_factor(corpus_frequencies(
            self.postings().filter(~F.col("repr").isin(*punct)
                                   & (F.col("repr") != "ENTITYNOUN"))))
        # token-entity table for ENTITY-placeholder topic poles
        ents = docs.select(
            "url", F.explode("tokens").alias("t")).select(
            "url", F.col("t.i").alias("idx"),
            F.col("t.ent_type").alias("ent_type"),
            (F.col("t.pos").isin("NOUN", "PROPN")
             & (F.col("t.dep") != "compound")).alias("is_noun"))
        # coref pair table (url, a, b): token a's chain indexes
        # include b — pronoun/antecedent and repeated-noun mention
        # links, but NOT coordinated conjunct siblings (reference
        # Mention semantics, parsing.py:1119-1126), used by the topic
        # dominance filter
        chains = (docs.select("url", F.explode("tokens").alias("t"))
                  .filter(F.size("t.coref_chain") > 0)
                  .select("url", F.col("t.i").alias("a"),
                          F.explode("t.coref_chain").alias("b"),
                          F.col("t.righthand_siblings").alias("rhs"))
                  .filter((F.col("a") != F.col("b"))
                          & ~F.array_contains("rhs", F.col("b")))
                  .drop("rhs"))
        # symmetric conjunct exclusion: drop (a, b) when b lists a as a
        # righthand sibling too
        sib = (docs.select("url", F.explode("tokens").alias("t"))
               .select("url", F.col("t.i").alias("b"),
                       F.explode("t.righthand_siblings").alias("a")))
        chains = chains.join(sib, ["url", "a", "b"], "left_anti")
        res = topic.topic_match(self.spark, edges, words, text_to_match,
                                closure=closure, freq_factors=ff,
                                use_frequency_factor=use_frequency_factor,
                                vectors=self._vectors,
                                embedding_threshold=emb_threshold,
                                ents=ents, chains=chains,
                                ontology_multiwords=self._ontology_multiwords,
                                **params)
        res = topic.with_passage_text(
            res, docs,
            tied_result_quotient=params.get("tied_result_quotient", 0.9))
        if params.get("initial_question_word_behaviour") == "exclusive":
            # reference manager.py:727: 'exclusive' returns only
            # passages that answer the question
            res = res.filter(F.size("answers") > 0)
        return [r.asDict(recursive=True) for r in res.collect()]

# reference explanation strings, byte-identical (word_matching/
# direct.py:17-18, derivation.py:12-15, entity.py:12-15,
# ontology.py:23-46, embedding.py:12-22, entity_embedding.py:13-23,
# question.py:13-16)
_ONTOLOGY_DEPTHS_TO_NAMES = {
    -4: "an ancestor", -3: "a great-grandparent", -2: "a grandparent",
    -1: "a parent", 0: "a synonym", 1: "a child", 2: "a grandchild",
    3: "a great-grandchild", 4: "a descendant",
}


def _explanation(match_type: str, depth: int, sp_word: str,
                 similarity: float) -> str:
    w = sp_word.upper()
    if match_type == "direct":
        return f"Matches {w} directly."
    if match_type == "derivation":
        return f"Has a common stem with {w}."
    if match_type == "entity":
        return f"Has an entity label matching {w}."
    if match_type == "ontology":
        name = _ONTOLOGY_DEPTHS_TO_NAMES[max(-4, min(4, depth))]
        return f"Is {name} of {w} in the ontology."
    if match_type == "embedding":
        return (f"Has a word embedding that is {int(similarity * 100)}% "
                f"similar to {w}.")
    if match_type == "entity_embedding":
        return (f"Has an entity label that is {int(similarity * 100)}% "
                f"similar to the word embedding corresponding to {w}.")
    if match_type == "question":
        return f"Matches the question word {w}."
    return ""
