"""Entity canonicalization: connected components by iterative
min-label propagation (hash self-join until fixpoint).

North-rule requirement: "a connected-components-style canonicalization
pass (hash-join + iterative min-label propagation) to merge coreferent
entity clusters". The cluster edge set is:

- ontology synonym pairs (equivalentClass closure depth 0),
- derivational identity (lemma ↔ derived lemma, the reference's
  predicate canonicalization, language_specific_rules.py:494-556),
- corpus coreference links are already folded in upstream: the parse
  stage resolves pronouns to their most specific mention and the edge
  extractor emits the *antecedent's* lemma (reference
  word_matching/general.py:82-100 `extracted_word`), so coreferent
  mentions share a node by construction.

Min-label propagation converges in O(log(diameter)) rounds; entity
synonym clusters are tiny (diameter ≤ 3 in practice) so 1-3 rounds.
Each round is one shuffle on the label key; the node set (distinct
entity words) is orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 12  # with pointer doubling: handles diameter ≤ 2^12


def cluster_edges_from(closure: DataFrame, deriv_pairs: DataFrame | None = None) -> DataFrame:
    """Undirected (a, b) similarity pairs that should share an entity."""
    syn = (
        closure.filter((F.col("depth") == 0) & (F.col("query_word") != F.col("matched_word")))
        .select(F.col("query_word").alias("a"), F.col("matched_word").alias("b"))
    )
    if deriv_pairs is not None:
        syn = syn.unionByName(deriv_pairs.select("a", "b"))
    return syn.distinct()


def _pair_graph_rounds(pair_rows: list[tuple[str, str]]) -> int:
    """Pointer-doubling rounds sufficient for a KNOWN pair graph:
    ceil(log2(diameter+1)) + 1. Used when the pair set is driver-sized
    (ontology-derived synonym/derivation pairs — eagerly computed like
    the reference's ontology closure), letting connected_components run
    a fixed-depth LAZY plan with no per-round materialization."""
    import math
    from collections import deque
    adj: dict[str, list[str]] = {}
    for (a, b) in pair_rows:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    diameter = 0
    for src in adj:
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        diameter = max(diameter, max(dist.values(), default=0))
    return max(1, math.ceil(math.log2(diameter + 1))) + 1


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         fixed_rounds: int | None = None) -> DataFrame:
    """nodes(word) + pairs(a, b) → (word, canonical) where canonical is
    the lexicographic min of the component (min-label propagation).

    Scale design: nodes NOT touched by any pair keep their own label —
    only the pair-connected subgraph (tiny: synonym/coref clusters, a
    vanishing fraction of the distinct-word set at 100 TB) iterates.
    Each round is one shuffle over that small frame.
    """
    # restrict pairs to corpus-present endpoints: merging through a
    # word absent from the corpus is not allowed (mirrors the oracle)
    pe = (pairs.join(nodes.withColumnRenamed("word", "a"), "a", "semi")
          .join(nodes.withColumnRenamed("word", "b"), "b", "semi")
          .select("a", "b").cache())
    adj = (
        pe.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pe.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct().cache()
    )
    touched = adj.select(F.col("src").alias("word")).distinct()

    if fixed_rounds is not None:
        # KNOWN round bound (driver-sized pair graph, _pair_graph_rounds):
        # run exactly that many rounds with lineage truncation but NO
        # convergence-check jobs (labels reference themselves 3× per
        # round, so an unmaterialized plan would grow ~3^rounds)
        adj = adj.localCheckpoint(eager=True)
        labels = touched.select("word", F.col("word").alias("canonical")) \
            .localCheckpoint(eager=True)
        for _ in range(fixed_rounds):
            cand = (
                adj.join(labels.withColumnRenamed("word", "dst")
                         .withColumnRenamed("canonical", "ncanon"), "dst")
                .groupBy(F.col("src").alias("word"))
                .agg(F.min("ncanon").alias("new_canonical"))
            )
            stepped = labels.join(cand, "word", "left").select(
                "word",
                F.least(F.col("canonical"),
                        F.coalesce("new_canonical", "canonical")).alias("canonical"))
            ptr = stepped.select(F.col("word").alias("canonical"),
                                 F.col("canonical").alias("grand"))
            labels = (stepped.join(ptr, "canonical", "left")
                      .select("word",
                              F.least(F.col("canonical"),
                                      F.coalesce("grand", "canonical")).alias("canonical"))
                      .localCheckpoint(eager=True))
        untouched = nodes.join(touched, "word", "anti").select(
            "word", F.col("word").alias("canonical"))
        return labels.join(nodes, "word", "semi").unionByName(untouched)

    # unknown diameter (corpus-sized pair graphs, e.g. LSH duplicate
    # clusters): iterate with per-round materialization + convergence
    # detection; the standard iterative-algorithm pattern
    adj = adj.localCheckpoint(eager=True)
    labels = touched.select("word", F.col("word").alias("canonical")) \
        .localCheckpoint(eager=True)
    converged = False
    for _ in range(MAX_ROUNDS):
        # 1-hop neighbor-min propagation
        cand = (
            adj.join(labels.withColumnRenamed("word", "dst")
                     .withColumnRenamed("canonical", "ncanon"), "dst")
            .groupBy(F.col("src").alias("word"))
            .agg(F.min("ncanon").alias("new_canonical"))
        )
        stepped = labels.join(cand, "word", "left").select(
            "word", F.col("canonical").alias("old_canonical"),
            F.least(F.col("canonical"),
                    F.coalesce("new_canonical", "canonical")).alias("canonical"))
        # pointer doubling (large-star shortcut): canonical ← its own
        # canonical, halving the remaining path each round so total
        # rounds are O(log diameter), not O(diameter); the changed flag
        # is carried through so ONE filter-count on the checkpointed
        # frame decides convergence (labels shrink monotonically — no
        # exceptAll anti-join needed)
        ptr = stepped.select(F.col("word").alias("canonical"),
                             F.col("canonical").alias("grand"))
        nxt = (stepped.join(ptr, "canonical", "left")
               .select("word",
                       F.least(F.col("canonical"),
                               F.coalesce("grand", "canonical")).alias("canonical"),
                       "old_canonical"))
        nxt = nxt.localCheckpoint(eager=True)
        n_changed = nxt.filter(F.col("canonical") != F.col("old_canonical")).count()
        labels = nxt.select("word", "canonical")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # never silent: a split cluster silently mislabels keepers
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} "
            f"pointer-doubling rounds (component diameter > 2^{MAX_ROUNDS})")
    untouched = nodes.join(touched, "word", "anti").select(
        "word", F.col("word").alias("canonical"))
    return labels.join(nodes, "word", "semi").unionByName(untouched)


def _induced_components(pair_rows: list[tuple[str, str]],
                        present: set[str]) -> dict[str, str]:
    """Min-label connected components of the pair graph INDUCED on the
    corpus-present vertex set (a pair merges only when BOTH endpoints
    occur in the corpus — same restriction the distributed path applies
    via its two semi-joins). Driver-sized by contract: the pair graph is
    ontology-derived. Returns word → canonical for touched words only."""
    from collections import deque
    adj: dict[str, list[str]] = {}
    for (a, b) in pair_rows:
        if a in present and b in present:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    label: dict[str, str] = {}
    for src in adj:
        if src in label:
            continue
        comp = [src]
        seen = {src}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    dq.append(v)
        canon = min(comp)
        for w in comp:
            label[w] = canon
    return label


def build_entities(linked_edges: DataFrame, closure: DataFrame | list) -> DataFrame:
    """entities(canonical, lemmas, cluster_size) from edge endpoints.

    Scale shape (r6): the pair graph is ontology-derived → driver-sized
    (the reference computes the whole closure eagerly on the driver,
    ontology.py:91-125), so the component structure is computed on the
    driver over the induced subgraph and applied to the corpus as ONE
    broadcast-mapped aggregation. The corpus side pays exactly one
    shuffle (the groupBy(canonical)) plus one tiny semi-join collect of
    corpus∩pair-vocabulary words (bounded by the ontology size, never
    the corpus) — replacing the former per-round checkpointed
    propagation (~8 sequential jobs). `connected_components` below
    remains the path for corpus-sized pair graphs (duplicate clusters),
    where driver-side components would not scale."""
    spark = linked_edges.sparkSession
    endpoints = (
        linked_edges.select(F.col("subj").alias("word"))
        .unionByName(linked_edges.select(F.col("obj").alias("word")))
    )
    if isinstance(closure, DataFrame):
        crows = [(r["query_word"], r["matched_word"], r["depth"])
                 for r in closure.select("query_word", "matched_word",
                                         "depth").collect()]
    else:
        crows = [(r[0], r[1], r[2]) for r in closure]
    pair_rows = sorted({(a, b) for (a, b, d) in crows
                        if d == 0 and a != b})
    vocab = sorted({w for p in pair_rows for w in p})
    if vocab:
        # presence probe: isin over the (driver-sized) pair vocabulary
        # pushes down as a literal predicate on the cached scan — no
        # broadcast-build job, and the collect is bounded by |ontology|
        present = {r["word"] for r in endpoints
                   .filter(F.col("word").isin(vocab))
                   .distinct().collect()}
    else:
        present = set()
    label = _induced_components(pair_rows, present)
    if label:
        # the word→canonical map is driver-sized: apply it as a literal
        # map expression (codegen lookup) instead of a broadcast join
        m = F.create_map(*[F.lit(x) for kv in sorted(label.items())
                           for x in kv])
        comp = endpoints.select(
            "word", F.coalesce(m[F.col("word")], F.col("word"))
            .alias("canonical"))
    else:
        comp = endpoints.select("word", F.col("word").alias("canonical"))
    return (
        comp.groupBy("canonical")
        .agg(F.sort_array(F.collect_set("word")).alias("lemmas"),
             F.countDistinct("word").alias("cluster_size"))
        .withColumn("entity_id", F.xxhash64("canonical"))
        .select("entity_id", "canonical", "lemmas", "cluster_size")
    )


def attach_entity_ids(linked_edges: DataFrame, entities: DataFrame) -> DataFrame:
    """Resolve edge endpoints to canonical entity ids (broadcast map
    side — entities ≪ edges)."""
    m = F.broadcast(
        entities.select(F.explode("lemmas").alias("word"),
                        F.col("canonical"), F.col("entity_id")))
    return (
        linked_edges
        .join(m.withColumnRenamed("word", "subj")
               .withColumnRenamed("canonical", "subj_canonical")
               .withColumnRenamed("entity_id", "subj_entity_id"), "subj", "left")
        .join(m.withColumnRenamed("word", "obj")
               .withColumnRenamed("canonical", "obj_canonical")
               .withColumnRenamed("entity_id", "obj_entity_id"), "obj", "left")
        .withColumn("subj_canonical", F.coalesce("subj_canonical", "subj"))
        .withColumn("obj_canonical", F.coalesce("obj_canonical", "obj"))
    )
