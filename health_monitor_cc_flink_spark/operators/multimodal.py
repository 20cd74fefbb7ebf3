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


MM_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def fake_resize(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
                target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Image-resize stand-in: real decode+resize needs PIL (see
    decode_image); the deterministic fake derives source dims from the
    payload hash and emits the resize plan (src/dst dims, scale factor)
    through the same Arrow batch path a real resize would use."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(payload_col))
    th, tw = target

    def resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            digests = [hashlib.md5(bytes(p)).digest() for p in pdf[payload_col]]
            src_w = [256 + d[0] for d in digests]
            src_h = [256 + d[1] for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": src_w,
                    "src_height": src_h,
                    "dst_width": tw,
                    "dst_height": th,
                    "scale": [min(tw / w, th / h) for w, h in zip(src_w, src_h)],
                }
            )

    schema = (
        "doc_id long, src_width int, src_height int, "
        "dst_width int, dst_height int, scale double"
    )
    return src.mapInPandas(resize, schema=schema)


def fake_frame_sample(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
                      n_frames: int = 4) -> DataFrame:
    """Video frame-sampling stand-in: emits ``n_frames`` rows per input
    row (the 1→N batch shape of real frame extraction), with
    deterministic offsets/hashes derived from the payload digest.  A real
    decoder slots into the same mapInPandas signature."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(payload_col))

    def sample(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset_ms": [], "frame_hash": []}
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                # hex-string hash chain (not raw digest bytes) so an SQL
                # oracle can re-derive every value: md5(hex || '_' || i)
                hx = hashlib.md5(bytes(p)).hexdigest()
                duration_ms = 1000 + int(hx[:4], 16)  # fake duration
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset_ms"].append(duration_ms * i // n_frames)
                    out["frame_hash"].append(
                        hashlib.md5(f"{hx}_{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(sample, schema=MM_FRAME_SCHEMA)


# -----------------------------------------------------------------------------
# Real container-format work without leaving codegen: WAV (RIFF) synthesis
# and header parsing as pure column math on BinaryType.  No Python UDF, no
# media library — the bytes are genuine WAV (the stdlib `wave` module opens
# them; pinned in tests/test_multimodal.py), and every header field is
# recovered with hex/substr/conv expressions that whole-stage-codegen
# compiles.  This is the multimodal scale pattern: metadata extraction and
# validation of billions of binary payloads SHOULD NOT pay an Arrow
# round-trip when the format's framing is fixed-offset.
# -----------------------------------------------------------------------------


def _hexle(col, nbytes: int):
    """Little-endian hex of an integer column, ``nbytes`` wide —
    byte-swapped big-endian hex, built from conv+lpad+substr (codegen)."""
    h = F.lpad(F.conv(col.cast("string"), 10, 16), 2 * nbytes, "0")
    return F.concat(*[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)])


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id",
                      len_col: str = "n_chars") -> DataFrame:
    """Attach a ``wav`` BinaryType column: a VALID 16-bit PCM WAV file
    (44-byte canonical RIFF header + silence) whose parameters derive
    deterministically from the row — sample_rate in {8,16,24,32,40} kHz,
    1–2 channels, 1000+len samples."""
    sr = (F.lit(8000) * (F.col(id_col) % 5 + 1)).cast("bigint")
    ch = (F.col(id_col) % 2 + 1).cast("bigint")
    n_samples = (F.col(len_col) + 1000).cast("bigint")
    data_size = n_samples * ch * 2
    byte_rate = sr * ch * 2
    hex_str = F.concat(
        F.lit("52494646"),              # 'RIFF'
        _hexle(data_size + 36, 4),      # riff chunk size
        F.lit("57415645"),              # 'WAVE'
        F.lit("666D7420"),              # 'fmt '
        _hexle(F.lit(16), 4),           # fmt subchunk size
        _hexle(F.lit(1), 2),            # PCM
        _hexle(ch, 2),
        _hexle(sr, 4),
        _hexle(byte_rate, 4),
        _hexle(ch * 2, 2),              # block align
        _hexle(F.lit(16), 2),           # bits per sample
        F.lit("64617461"),              # 'data'
        _hexle(data_size, 4),
        F.repeat(F.lit("00"), data_size.cast("int")),  # silence PCM ("00" = 1 byte)
    )
    return df.withColumn("wav", F.unhex(hex_str))


def parse_wav_header(df: DataFrame, payload_col: str = "wav") -> DataFrame:
    """Parse the fixed-offset WAV header fields out of a BinaryType
    column with hex/substr/conv only (codegen; zero Python).  Returns
    the input plus is_riff_wave / channels / sample_rate / bit_depth /
    data_size / n_samples / duration_us columns."""
    h = F.hex(F.col(payload_col))

    def le(byte_off: int, nbytes: int):
        parts = [
            F.substring(h, (byte_off + i) * 2 + 1, 2)
            for i in range(nbytes - 1, -1, -1)
        ]
        return F.conv(F.concat(*parts), 16, 10).cast("bigint")

    ch, sr, bits = le(22, 2), le(24, 4), le(34, 2)
    data_size = le(40, 4)
    byte_rate = le(28, 4)
    return (
        df.withColumn(
            "is_riff_wave",
            (F.substring(h, 1, 8) == "52494646")
            & (F.substring(h, 17, 8) == "57415645"),
        )
        .withColumn("channels", ch)
        .withColumn("sample_rate", sr)
        .withColumn("bit_depth", bits)
        .withColumn("data_size", data_size)
        .withColumn(
            "n_samples", F.expr("data_size DIV (channels * (bit_depth DIV 8))")
        )
        .withColumn("byte_rate", byte_rate)
        .withColumn(
            "duration_us", F.expr("(data_size * 1000000) DIV byte_rate")
        )
    )


def _hexbe(col, nbytes: int):
    """Big-endian hex of an integer column, ``nbytes`` wide."""
    return F.lpad(F.conv(col.cast("string"), 10, 16), 2 * nbytes, "0")


def synth_png_header(df: DataFrame, id_col: str = "doc_id",
                     len_col: str = "n_chars") -> DataFrame:
    """Attach a ``png`` BinaryType column: the 8-byte PNG signature plus
    a VALID IHDR chunk — including its real CRC-32, computed with
    Spark's codegen ``crc32`` over the chunk type+data bytes (zlib
    verifies it; pinned in tests).  Dimensions/color type derive from
    the row."""
    width = (F.lit(16) * (F.col(id_col) % 40 + 1)).cast("bigint")
    height = (F.lit(16) * (F.col(len_col) % 40 + 1)).cast("bigint")
    color_type = F.element_at(
        F.array(F.lit(0), F.lit(2), F.lit(6)), (F.col(id_col) % 3 + 1).cast("int")
    ).cast("bigint")
    body_hex = F.concat(
        F.lit("49484452"),          # 'IHDR'
        _hexbe(width, 4),
        _hexbe(height, 4),
        F.lit("08"),                # bit depth 8
        _hexbe(color_type, 1),
        F.lit("000000"),            # compression / filter / interlace
    )
    crc = F.crc32(F.unhex(body_hex))
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # PNG signature
        F.lit("0000000D"),          # IHDR length 13
        body_hex,
        _hexbe(crc, 4),
    )
    return df.withColumn("png", F.unhex(png_hex))


def parse_png_header(df: DataFrame, payload_col: str = "png") -> DataFrame:
    """Parse width/height/bit depth/color type out of a PNG IHDR with
    hex/substr/conv column math, AND verify the chunk CRC by
    recomputing crc32 over the type+data bytes — integrity checking of
    binary payloads without leaving codegen."""
    h = F.hex(F.col(payload_col))

    def be(byte_off: int, nbytes: int):
        return F.conv(F.substring(h, byte_off * 2 + 1, 2 * nbytes), 16, 10).cast(
            "bigint"
        )

    ct = be(25, 1)
    return (
        df.withColumn("is_png", F.substring(h, 1, 16) == "89504E470D0A1A0A")
        .withColumn("width", be(16, 4))
        .withColumn("height", be(20, 4))
        .withColumn("bit_depth", be(24, 1))
        .withColumn("color_type", ct)
        .withColumn(
            "n_channels",
            F.when(ct == 0, 1).when(ct == 2, 3).when(ct == 6, 4).cast("bigint"),
        )
        .withColumn(
            "crc_ok",
            F.crc32(F.unhex(F.substring(h, 25, 34))) == be(29, 4),
        )
    )
