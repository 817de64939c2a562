"""Multimodal / asset columns — SURVEY.md §2.12 (q69) plus the decode
plumbing extension (q77).

Design: raw assets (image/audio/video) are opaque BinaryType columns with
typed metadata structs beside them; decode / feature-extraction runs as
Arrow-batched Python (mapInPandas) because media codecs live in Python
libraries, not Catalyst. The Spark-side plumbing — schema, batch shape,
partition sizing — is real and tested; the codec itself is stubbed (no
media libs in this container) behind NotImplementedError with a
deterministic fake used by the checked query.

Scale notes: binary payloads make rows wide — keep
spark.sql.files.maxPartitionBytes modest so a partition of blobs fits in
executor memory, and NEVER shuffle the blob column (project it away before
joins; re-attach by key afterwards).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import dot, dot_sql
from ..io import table
from ..registry import query


@query(
    "q69_multimodal_cols",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           CAST(len(e.embedding) AS INTEGER) AS dim,
           round({dot_sql('e.embedding', 'e.embedding')}, 6) AS emb_norm_sq,
           e.label
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def q69_multimodal_cols(spark, sf_dir) -> DataFrame:
    """Multimodal record assembly: join text docs to their embeddings and
    bundle typed metadata + vector into a struct column (the checked output
    is the flattened projection — struct values don't hash across engines,
    their fields do). The struct is what a downstream writer would persist
    as one nested Parquet column."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    bundled = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct(
                F.col("lang"), F.col("source"), F.col("n_chars"), F.col("label")
            ).alias("meta"),
            F.col("embedding"),
        )
    )
    return bundled.select(
        "doc_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.n_chars").alias("n_chars"),
        F.size("embedding").alias("dim"),
        F.round(dot(F.col("embedding"), F.col("embedding")), 6).alias("emb_norm_sq"),
        F.col("meta.label").alias("label"),
    )


def decode_media(asset: bytes, media_type: str) -> dict:
    """REAL decode entry point — requires media codecs (PIL/librosa/ffmpeg)
    that are not in this container. The Spark plumbing around it
    (_decode_batches) is exercised with the deterministic fake below."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this image; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(asset: bytes) -> dict:
    """Deterministic stand-in for decode_media: derives 'features' from the
    raw bytes so the pipeline shape (bytes in → typed features out) is real
    and checkable."""
    n = len(asset)
    return {
        "n_bytes": n,
        "head_hex": asset[:1].hex(),
        "stub_feature": (n % 97) / 97.0,
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches of (doc_id, asset) in, typed
    feature frames out. This is the exact shape a real image/audio decode
    would use — swap fake_decode for decode_media and add columns."""
    for pdf in batches:
        feats = [fake_decode(a) for a in pdf["asset"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [f["n_bytes"] for f in feats],
                "head_hex": [f["head_hex"] for f in feats],
                "stub_feature": [f["stub_feature"] for f in feats],
            }
        )


@query(
    "q77_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           lower(hex(substring(text, 1, 1))) AS head_hex,
           (strlen(text) % 97) / 97.0 AS stub_feature
    FROM documents
    """,
)
def q77_multimodal_decode(spark, sf_dir) -> DataFrame:
    """Asset-decode plumbing: text bytes stand in for a media blob
    (BinaryType column), mapInPandas runs the (stubbed) decoder over Arrow
    batches, output is a typed feature frame keyed by doc_id. The oracle
    recomputes the fake's arithmetic straight from the source column."""
    d = table(spark, sf_dir, "documents")
    assets = d.select("doc_id", F.encode("text", "utf-8").alias("asset"))
    return assets.mapInPandas(
        _decode_batches,
        schema="doc_id long, n_bytes long, head_hex string, stub_feature double",
    )
