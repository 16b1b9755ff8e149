"""Large-scale training-data-pipeline operators.

These extend the reference's corpus machinery with the operations a
100 TB web-text pipeline needs: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search over embeddings, text
analysis (language ID, quality scoring, token counting, rolling-hash
fingerprints), and multimodal binary-column plumbing.

Shared design rule: every deterministic arithmetic op is defined once
and mirrored as a DuckDB SQL expression so the driver's oracle can
verify values, not just row counts.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic token hashing shared by dedup / fingerprint / simhash:
# a polynomial fold over EVERY character (collision-resistant in
# practice for natural-language tokens, unlike a first-char/length
# signature which maps cat=car=cow):
#   token_val(t) = fold(acc = (acc * 131 + ord(char)) % P  over chars)
#   shingle / doc rolling hash: acc = (acc * 131 + token_val) % P
# Defined once with a Spark column mirror and a DuckDB SQL mirror so
# oracles verify values exactly.
P_MOD = 2147483647


def token_val_spark(tok: Column) -> Column:
    """Spark mirror: whole-stage-codegen higher-order fold, no Python."""
    chars = F.filter(F.split(tok, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + F.ascii(c)) % P_MOD)


def token_val_sql(tok: str) -> str:
    """DuckDB mirror of token_val_spark (ord() = ascii() code point of
    the first character, matching Spark's ascii())."""
    return (f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform(string_split({tok}, ''), _c -> ord(_c)::BIGINT)), "
            f"(_a, _b) -> (_a * 131 + _b) % {P_MOD})")
