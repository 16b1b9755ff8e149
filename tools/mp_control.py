"""Hardware-ceiling control for the scaling measurement: the SAME
parse+extract workload via bare multiprocessing (no Spark, no JVM, no
Arrow), confined with taskset like the Spark runs.

On a single box, 8→32-core scaling is capped by all-core frequency/
memory effects that a real 4×-machines cluster does not have. This
control quantifies that cap so BENCH.md can report both the raw Spark
efficiency and the hardware-normalized one (spark_speedup / mp_speedup).

The control consumes the SAME parquet corpus as the Spark cells, at
the SAME task granularity (one task per file, drained from a shared
queue), so the only delta vs the Spark run is the framework itself:
parquet decode happens via pyarrow here vs the JVM reader there, and
results stay in-process instead of crossing Arrow batches.

Usage: taskset -c 0-7 python tools/mp_control.py 8 /tmp/holmes_scale_pages
Prints {"cpus", "docs", "seconds", "docs_per_sec"}.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, "/root/repo")


def work(path: str) -> int:
    import pyarrow.parquet as pq

    from holmes_extractor_spark.nlp.parser import parse_document
    from holmes_extractor_spark.pipeline.phraselets import extract_candidate_edges

    tbl = pq.read_table(path, columns=["lang", "text"])
    langs = tbl.column("lang").to_pylist()
    texts = tbl.column("text").to_pylist()
    for lang, text in zip(langs, texts):
        parsed = parse_document(text, lang)
        extract_candidate_edges(parsed, lang)
    return len(texts)


def main() -> None:
    cpus = int(sys.argv[1])
    src = sys.argv[2]
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {src}")
    with Pool(cpus) as pool:
        pool.map(work, files[:cpus], chunksize=1)  # warm: imports + lexicons
        t0 = time.time()
        # chunksize=1 == Spark's one-task-per-file scheduling: workers
        # drain a shared queue, so the straggler tail is the same shape
        counts = pool.map(work, files, chunksize=1)
        best = time.time() - t0
    total = sum(counts)
    print(json.dumps({"cpus": cpus, "docs": total,
                      "seconds": round(best, 3),
                      "docs_per_sec": round(total / best, 1)}))


if __name__ == "__main__":
    main()
