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

# deterministic token hashing shared by dedup / fingerprint / simhash:
#   token_val(t)  = ascii(first char) * 31 + length(t)
#   shingle / doc rolling hash: acc = (acc * 131 + token_val) % P
P_MOD = 2147483647


def token_val_sql(tok: str) -> str:
    return f"(ord(substr({tok}, 1, 1)) * 31 + length({tok}))"
