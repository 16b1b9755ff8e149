"""Dump formatted physical plans for the headline queries — the
evidence source for PLANS.md. Usage:

    python tools/dump_plans.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from holmes_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ["kg_triples", "postings_direct",
                             "structural_match", "topic_scores",
                             "minhash_lsh", "exact_dedup", "token_counts"]
    spark = get_spark(cpus=8)
    qs = entry.queries()
    for name in names:
        print(f"\n===== {name} =====", flush=True)
        df = qs[name](spark, sf_dir)
        df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
