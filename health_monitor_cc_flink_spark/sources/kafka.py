"""Kafka + Avro stream source (O1; reference main.tf:170-185, schema.tf:4-151).

The reference's `events` table is a 3-partition Kafka topic with a
Schema-Registry Avro value schema, and `$rowtime` = the Kafka record
timestamp (flink_statements.tf:119,181).  The Spark-native equivalent is
`readStream.format("kafka")` + `from_avro` on the value bytes, with the
Kafka `timestamp` metadata column surfaced as ``event_time``.

Notes:
- Confluent's wire format prefixes Avro payloads with a 5-byte magic +
  schema-id header; ``confluent_wire_format=True`` strips it before
  `from_avro` (plain Avro framing otherwise).
- `from_avro` ships in the external spark-avro package; this module
  degrades to a clear error if the JVM class is absent so the rest of
  the engine stays importable in minimal test environments.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def avro_schema_json(schema: StructType, name: str = "Event") -> str:
    """Render a StructType as an Avro record schema JSON (value schema)."""

    def field_type(dt, path=name):
        from pyspark.sql import types as T

        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": path,
                "fields": [
                    {"name": f.name, "type": field_type(f.dataType, f"{path}_{f.name}")}
                    for f in dt.fields
                ],
            }
        mapping = {
            T.StringType(): "string",
            T.IntegerType(): "int",
            T.LongType(): "long",
            T.FloatType(): "float",
            T.DoubleType(): "double",
            T.BooleanType(): "boolean",
        }
        for k, v in mapping.items():
            if dt == k:
                return v
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        raise TypeError(f"no Avro mapping for {dt}")

    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f.name, "type": field_type(f.dataType, f"{name}_{f.name}")}
                for f in schema.fields
            ],
        }
    )


def decode_avro_values(
    records: DataFrame,
    value_schema: StructType,
    confluent_wire_format: bool = True,
    decoder: str = "jvm",
) -> DataFrame:
    """Kafka-record-shaped DataFrame (``value`` binary + ``timestamp``) →
    typed columns + ``event_time``.

    This is the decode stage of the O1 source, split out so it can be
    exercised on recorded Avro-framed bytes without a broker.  The
    Confluent wire-format strip (magic 0x00 + 4-byte schema id) happens
    as a Catalyst expression either way.

    decoder="jvm"     → spark-avro `from_avro` (vectorized; production).
    decoder="python"  → Arrow-batched mapInPandas over the pure-Python
                        codec (`sources.avro_codec`) — the env-gated
                        fallback for clusters without the spark-avro
                        module, and the path integration tests use.
    """
    schema_json = avro_schema_json(value_schema)
    value = F.col("value")
    if confluent_wire_format:
        # strip magic byte (1) + schema id (4) of the SR wire format
        value = F.expr("substring(value, 6, length(value) - 5)")

    if decoder == "jvm":
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError(
                "spark-avro is not on the classpath; add the "
                "org.apache.spark:spark-avro package or use decoder='python'"
            ) from exc

        decoded = records.select(
            F.col("timestamp").alias("event_time"),
            from_avro(value, schema_json).alias("v"),
        )
        return decoded.select("event_time", "v.*")

    if decoder != "python":
        raise ValueError(f"decoder must be 'jvm' or 'python', got {decoder!r}")

    from pyspark.sql import types as T

    from .avro_codec import decode_record

    stripped = records.select(F.col("timestamp").alias("event_time"), value.alias("payload"))
    out_schema = T.StructType(
        [T.StructField("event_time", T.TimestampType())] + list(value_schema.fields)
    )

    def _norm_types(sch: StructType, rec: dict) -> dict:
        # codec returns timestamp-micros as int µs; Spark wants datetimes
        import datetime as dt

        for f in sch.fields:
            if isinstance(f.dataType, T.TimestampType) and isinstance(rec[f.name], int):
                rec[f.name] = dt.datetime.fromtimestamp(
                    rec[f.name] / 1_000_000, tz=dt.timezone.utc
                ).replace(tzinfo=None)
            elif isinstance(f.dataType, T.StructType):
                rec[f.name] = _norm_types(f.dataType, rec[f.name])
        return rec

    def batches(it):
        import pandas as pd

        for pdf in it:
            recs = [
                _norm_types(value_schema, decode_record(schema_json, bytes(b)))
                for b in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "event_time": pdf["event_time"].values,
                    **{
                        f.name: [r[f.name] for r in recs]
                        for f in value_schema.fields
                    },
                }
            )
            yield out

    return stripped.mapInPandas(batches, schema=out_schema)


def read_kafka_avro_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: StructType,
    starting_offsets: str = "latest",
    confluent_wire_format: bool = True,
    decoder: str = "jvm",
    source_format: str = "kafka",
    extra_options: dict | None = None,
) -> DataFrame:
    """`events`-style source: Kafka topic → typed columns + event_time.

    Returns a streaming DataFrame with the value schema's columns at the
    top level plus ``event_time`` (Kafka record timestamp = `$rowtime`).

    ``source_format`` defaults to the real Kafka source; tests inject
    ``"kafka_sim"`` (sources/kafka_sim.py — same record schema and
    startingOffsets semantics, replaying a recorded topic) so this
    function's option plumbing and the downstream decode execute end-to-
    end in broker-less environments.  ``extra_options`` passes source-
    specific options (e.g. the sim's recorded-topic ``path``).
    """
    reader = (
        spark.readStream.format(source_format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return decode_avro_values(
        raw, value_schema, confluent_wire_format=confluent_wire_format, decoder=decoder
    )
