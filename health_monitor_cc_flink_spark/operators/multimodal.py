"""Multimodal column handling: opaque binary payloads + typed metadata.

Convention: a modality column is BinaryType payload + a sibling struct
of metadata (size, hash, declared format).  Decode / feature-extraction
runs as Arrow-batched `mapInPandas` — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested; the actual media decode
is STUBBED (image/audio libraries are not in this environment) behind
`decode_image`, which raises NotImplementedError unless PIL is
available.  `fake_feature_extract` is the deterministic stand-in used in
tests: same signature, same batch flow, synthetic features derived from
the payload hash.

Scale notes: payloads ride *with* the rows (no driver collect); batch
size is governed by spark.sql.execution.arrow.maxRecordsPerBatch, and a
repartition on a high-cardinality key upstream spreads decode cost
evenly — decode is CPU-bound map work, the friendliest shape Spark has.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize an opaque binary payload column from
    text (UTF-8 bytes) — stands in for image/audio bytes."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def binary_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — pure column math,
    no decode: (id, size_bytes, content_hash, fake_format)."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("size_bytes"),
        F.md5(F.col(payload_col)).alias("content_hash"),
        F.element_at(
            F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")),
            (F.octet_length(F.col(payload_col)) % 3 + 1).cast("int"),
        ).alias("fake_format"),
    )


def decode_image(payload: bytes):
    """Real decode path — requires an image library.

    STUB: PIL/opencv are not installed in this environment; the
    surrounding plumbing is exercised with `fake_feature_extract`.
    """
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL; use fake_feature_extract for plumbing tests"
        ) from exc


def fake_feature_extract(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in for decode + embed over mapInPandas.

    Features = FEATURE_DIM doubles derived from the md5 digest bytes —
    stable across runs/partitionings, so tests can assert values while
    the Arrow batch path (the part that matters for scale) is real.
    """
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(payload_col))

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            digests = [hashlib.md5(bytes(p)).digest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "size_bytes": [len(bytes(p)) for p in payloads],
                    "content_hash": [d.hex() for d in digests],
                    "features": [
                        [b / 255.0 for b in d[:FEATURE_DIM]] for d in digests
                    ],
                }
            )

    return src.mapInPandas(extract, schema=MM_FEATURE_SCHEMA)
