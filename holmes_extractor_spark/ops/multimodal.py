"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual media decode is
stubbed behind ``NotImplementedError`` / a deterministic fake since no
image/audio libraries exist in this container — swap ``_decode_stub``
for a real decoder (PIL/torchaudio/pyav) on a production cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("magic", T.StringType()),
    T.StructField("checksum", T.LongType()),
])

FEATURES = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def documents_as_blobs(documents: DataFrame) -> DataFrame:
    """Stand-in blob table: (doc_id, blob binary, media_type) — the
    text bytes act as opaque media payloads for plumbing tests."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """Typed metadata — pure column expressions (JVM-side): size, magic
    prefix (hex of first 4 bytes), crc32 checksum."""
    return blobs.select(
        "doc_id",
        F.octet_length("blob").alias("n_bytes"),
        F.hex(F.substring("blob", 1, 4)).alias("magic"),
        F.crc32("blob").alias("checksum"),
    )


def blob_metadata_sql() -> str:
    """DuckDB mirror over `documents` (size + magic; crc32 omitted —
    DuckDB lacks it, engine-side value is still hash-checked via the
    other two columns)."""
    return """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       upper(substring(hex(encode(text)), 1, 8)) AS magic
FROM documents
ORDER BY doc_id
"""


def decode_media(blobs: DataFrame) -> DataFrame:
    """Real decode is NOT available in this environment."""
    raise NotImplementedError(
        "media decode requires PIL/pyav — not available in this container; "
        "use extract_features (deterministic fake) for plumbing tests")


def _decode_stub(blob: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoder': fixed-dim feature vector from byte
    statistics. Replaces e.g. a CLIP/CNN embedding on production."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks]).round(6)


def extract_features(blobs: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the real
    production shape (mapInPandas; one Python call per batch, vectorized
    inside)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(b, dim).tolist() for b in pdf["blob"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})
    return blobs.select("doc_id", "blob").mapInPandas(batches, schema=FEATURES)


def frame_sample(blobs: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """'Frame sampling' plumbing: split each payload into fixed-stride
    chunks (stand-in for video frame extraction), keeping schema and
    explode shape identical to the real thing."""
    chunks = F.transform(
        F.sequence(F.lit(0), F.least(
            F.floor(F.octet_length("blob") / every_n_bytes).cast("int"),
            F.lit(max_frames - 1))),
        lambda i: F.substring("blob", (i * every_n_bytes + 1).cast("int"), every_n_bytes))
    return blobs.select("doc_id", F.posexplode(chunks).alias("frame_idx", "frame"))
