"""The load-bearing invariant: the engine's per-snippet output equals
the frozen golden tables in fixtures.py (which the DuckDB oracles are
built from). If extraction semantics drift, this fails before the
driver's correctness gate does."""

from holmes_extractor_spark.fixtures import (GOLDEN_EDGES, GOLDEN_WORDS, POOL,
                                              POOL_EN)
from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.pipeline.phraselets import (extract_candidate_edges,
                                                        extract_word_phraselets)


def snippet_lang(sid: int) -> str:
    return "de" if sid >= len(POOL_EN) else "en"


def test_golden_edges_match_engine():
    for sid, text in enumerate(POOL):
        lang = snippet_lang(sid)
        parsed = parse_document(text, lang)
        got = {(e["template"], e["label"], e["subj"], e["obj"], e["pred"],
                e["negated"], e["uncertain"], e["involves_coref"])
               for e in extract_candidate_edges(parsed, lang)
               # matching-only rows (multiword variants, noun-mention
               # exchanges) are not phraselet-production output
               if not e.get("mention")}
        exp = {(t, lbl, s, o, p, n, u, c)
               for (gs, t, lbl, s, o, p, n, u, c) in GOLDEN_EDGES if gs == sid}
        assert got == exp, f"snippet {sid}: {text!r}\n got {sorted(got)}\n exp {sorted(exp)}"


def test_golden_words_match_engine():
    for sid, text in enumerate(POOL):
        lang = snippet_lang(sid)
        parsed = parse_document(text, lang)
        got = {w["word"] for w in extract_word_phraselets(parsed, lang)}
        exp = {w for (gs, w) in GOLDEN_WORDS if gs == sid}
        assert got == exp, f"snippet {sid}: {text!r}: got {got} exp {exp}"


def test_snippets_are_sentence_aligned():
    # page synthesis joins snippets with ' '; every snippet must be
    # self-contained (ends with a sentence terminator) so per-snippet
    # goldens compose to per-page goldens
    for s in POOL:
        assert s.rstrip().endswith((".", "!", "?"))


def test_every_snippet_is_sampled():
    # the page synthesis picks snippets via (doc_id*31 + j*17) % len(pool);
    # if len(POOL_EN) shares a factor with 31 the corpus silently skips
    # most snippets (this happened at len=93 = 3*31)
    from holmes_extractor_spark.fixtures import MAX_SNIPS, POOL_DE, POOL_EN
    for pool in (POOL_EN, POOL_DE):
        n = len(pool)
        reachable = {(i * 31 + j * 17) % n
                     for i in range(7 * n) for j in range(MAX_SNIPS)}
        assert reachable == set(range(n)), \
            f"pool of {n} snippets: only {len(reachable)} reachable"
