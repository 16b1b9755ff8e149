"""Extra benchmarks (guide §1): per-stage isolation of the _kg corpus
build, per-query noop/count timings with job labels, and plan dumps.

This file is NOT part of the frozen bench contract (bench.py); it only
produces evidence for OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py stages            # _kg sub-stage timings
    python bench_extra.py queries [names..] # per-query count() best-of-N
    python bench_extra.py plans SUFFIX [names..]  # dump plans/r06/<q>_SUFFIX.txt

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))


def _spark():
    from holmes_extractor_spark.session import get_spark
    return get_spark(app_name="bench_extra", cpus=CPUS)


def stages() -> None:
    """Isolate each piece of the corpus load (bench.py 'corpus_parse')."""
    import __spark_entry__ as entry
    from holmes_extractor_spark.fixtures import build_pages
    from holmes_extractor_spark.pipeline.ingest import clean_pages

    spark = _spark()
    entry._ensure_workers(spark)
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def step(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    par = sc.defaultParallelism * 2
    pages = step("pages_synth+count",
                 lambda: clean_pages(build_pages(spark, SF_DIR))
                 .repartition(par, "url"))
    step("pages_count", lambda: pages.count())
    kg = {}
    t_all = time.time()
    from holmes_extractor_spark.pipeline.parse_stage import (
        extract_edges, extract_words)
    from holmes_extractor_spark.pipeline.postings import build_postings
    docs = step("parse_cache_count",
                lambda: entry._kg(spark, SF_DIR)["docs"])
    kg = entry._kg(spark, SF_DIR)
    step("docs_count", lambda: kg["docs"].count())
    step("edges_count", lambda: kg["edges"].count())
    step("words_count", lambda: kg["words"].count())
    out["corpus_parse_equiv"] = round(time.time() - t_all, 3)
    step("postings_count", lambda: kg["postings"].count())
    # second counts (cached)
    step("docs_count2", lambda: kg["docs"].count())
    step("edges_count2", lambda: kg["edges"].count())
    print(json.dumps(out))
    spark.stop()


def queries(names=None) -> None:
    import __spark_entry__ as entry
    spark = _spark()
    sc = spark.sparkContext
    qs = entry.queries()
    names = names or list(qs)
    # corpus load first, mirroring bench.py
    t0 = time.time()
    kg = entry._kg(spark, SF_DIR)
    kg["docs"].count(); kg["edges"].count(); kg["words"].count()
    out = {"corpus_parse": round(time.time() - t0, 3)}
    for name in names:
        samples = []
        for i in range(RUNS):
            sc.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        out[name] = samples
    print(json.dumps(out))
    spark.stop()


def plans(suffix: str, names=None) -> None:
    import __spark_entry__ as entry
    spark = _spark()
    qs = entry.queries()
    names = names or list(qs)
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "stages":
        stages()
    elif cmd == "queries":
        queries(sys.argv[2:] or None)
    elif cmd == "plans":
        plans(sys.argv[2], sys.argv[3:] or None)
    else:
        raise SystemExit(f"unknown command {cmd}")
