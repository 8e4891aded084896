"""Multimodal columns (north-star extension): opaque ``binary`` payloads with
typed metadata, decoded/feature-extracted through Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the actual decode is STUBBED
(``NotImplementedError`` behind a provider seam) — but everything Spark-side
is real and tested: binary column handling, metadata struct schema, the
``mapInPandas`` batch shape, and partition-parallel execution. The
deterministic fake decoder computes byte-level features so the whole UDF
path is *oracle-checkable* against plain SQL.

Scale notes: binary payloads ride in parquet as byte arrays; decode is
embarrassingly parallel over ``mapInPandas`` with bounded Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory stays flat
regardless of corpus size. Feature extraction projects narrow output —
payload bytes never re-shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_data_infrastructure_spark.queries import register
from full_data_infrastructure_spark.sources.parquet import load_table

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, first_byte int, byte_sum_mod bigint"
)


def real_image_decode(payload: bytes) -> dict:
    """The production decode seam. Image/audio libs are not shipped in this
    container — wire Pillow/torchaudio/etc. here on a real cluster."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_decode (deterministic) or install a decoder"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: byte-level features."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_sum_mod": sum(payload) % 997,
    }


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: an opaque binary payload column +
    a typed metadata struct — the schema shape for image/audio/video."""
    payload = F.encode("text", "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
        F.lit("utf-8").alias("encoding"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = fake_decode,
    batch_schema: str = DECODED_SCHEMA,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, batch_schema)


@register(
    "multimodal_decode",
    """
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(unicode(text[1]) AS INT) AS first_byte,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                                        i -> unicode(text[i]))) % 997 AS BIGINT)
               AS byte_sum_mod
    FROM documents
    WHERE length(text) > 0
    """,
    doc="Multimodal decode path: binary payload + metadata struct -> "
    "mapInPandas (Arrow) feature extraction with a deterministic fake "
    "decoder. The oracle recomputes the byte features in SQL, proving the "
    "UDF plumbing end-to-end. (ASCII corpus => code points == bytes.)",
    tags=("llm", "multimodal", "udf"),
)
def _multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return decode_media(attach_binary_payload(docs))


@register(
    "multimodal_join",
    """
    SELECT d.doc_id, d.lang, d.source, e.label,
           len(e.embedding) AS dim,
           d.n_chars
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="Multimodal record assembly: text rows joined to their embedding "
    "rows (doc_id = vec_id) — the documents x embeddings 'modality join'.",
    tags=("llm", "multimodal", "join"),
)
def _multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "label",
        F.size("embedding").alias("dim"),
        "n_chars",
    )
