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


def build_entities(linked_edges: DataFrame, closure: DataFrame) -> DataFrame:
    """entities(canonical, lemmas, cluster_size) from edge endpoints."""
    nodes = (
        linked_edges.select(F.col("subj").alias("word"))
        .unionByName(linked_edges.select(F.col("obj").alias("word")))
        .distinct()
        # referenced 3× downstream (pair restriction, untouched anti-join,
        # final semi-join) — materialize the distinct once instead of
        # re-shuffling the full edge endpoint set per reference
        .localCheckpoint(eager=True)
    )
    pairs = cluster_edges_from(closure)
    # the pair graph is ontology-derived → driver-sized (the reference
    # computes the whole closure eagerly on the driver, ontology.py:
    # 91-125): bound the rounds up front and run a lazy fixed-depth
    # plan. Restriction to corpus-present endpoints only SHRINKS
    # components, so the bound stays valid.
    pair_rows = [(r["a"], r["b"]) for r in pairs.collect()]
    rounds = _pair_graph_rounds(pair_rows)
    comp = connected_components(nodes, pairs, fixed_rounds=rounds)
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
