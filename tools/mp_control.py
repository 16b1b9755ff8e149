"""Hardware-ceiling control for the scaling measurement: the SAME
parse+extract workload via bare multiprocessing (no Spark, no JVM, no
Arrow), confined with taskset like the Spark runs.

On a single box, 8→32-core scaling is capped by all-core frequency/
memory effects that a real 4×-machines cluster does not have. This
control quantifies that cap so BENCH.md can report both the raw Spark
efficiency and the hardware-normalized one (spark_speedup / mp_speedup).

Usage: taskset -c 0-7 python tools/mp_control.py 8 320000
Prints {"cpus", "docs", "seconds", "docs_per_sec"}.
"""

from __future__ import annotations

import json
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, "/root/repo")

TEXTS = [
    "The dog chased the cat. I saw a cat. It was chased by the dog. "
    "Richard Paul Hudson came home.",
    "Der Hund jagte die Katze. Polizeiinformation über Kriminelle.",
]


def work(n: int) -> int:
    from holmes_extractor_spark.nlp.parser import parse_document
    from holmes_extractor_spark.pipeline.phraselets import extract_candidate_edges
    for i in range(n):
        lang = "de" if i % 7 == 3 else "en"
        t = TEXTS[1] if lang == "de" else TEXTS[0]
        parsed = parse_document(t, lang)
        extract_candidate_edges(parsed, lang)
    return n


def main() -> None:
    cpus = int(sys.argv[1])
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 320000
    per = total // cpus
    with Pool(cpus) as pool:
        pool.map(work, [200] * cpus)  # warm
        best = float("inf")
        for _ in range(1):
            t0 = time.time()
            pool.map(work, [per] * cpus)
            best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "docs": per * cpus,
                      "seconds": round(best, 3),
                      "docs_per_sec": round(per * cpus / best, 1)}))


if __name__ == "__main__":
    main()
