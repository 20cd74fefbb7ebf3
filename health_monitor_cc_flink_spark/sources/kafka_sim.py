"""Kafka-contract simulator as a Python DataSource (test double for O1).

The sandbox has no broker and no spark-sql-kafka jar, so the *option and
offset handling* of `read_kafka_avro_stream` (sources/kafka.py:156) — the
one piece `tests/test_kafka_wire.py`'s recorded-bytes path could not
reach — is exercised against this source instead: a Python DataSource
(Spark 4 `pyspark.sql.datasource` API) that reproduces the Kafka source's
*contract*:

- output schema identical to `format("kafka")`: key/value binary, topic,
  partition, offset, timestamp, timestampType;
- `subscribe` selects the topic; records come from a parquet file of
  recorded (partition, offset, key, value, timestamp_us) rows — the same
  Confluent-framed Avro bytes the wire tests pin against Java Avro;
- `startingOffsets` honors all three Kafka forms: "earliest", "latest",
  and the per-partition JSON map (`{"topic": {"0": 5, "1": -2}}`, with
  -2 = earliest and -1 = latest, Kafka's sentinel values);
- `kafka.bootstrap.servers` is required, as the real source requires it.

This is NOT a broker; it replays a recorded topic. What it validates is
that our source function passes the right options and that downstream
offset semantics (resume points, partition fan-in, record-timestamp
propagation into `event_time`) behave as they will against real Kafka.

Known engine wrinkle (observed, not a sim bug): with a Python streaming
data source, `Trigger.availableNow` terminates as soon as offsets catch
up and does NOT run the trailing no-data micro-batch, so an append-mode
windowed aggregation emits nothing in a single drain (the JVM file
source does run it — see test_wire_format_stream_to_windowed_vitals).
Decode-level assertions below are therefore drained without the agg.

Reference: the events topic is 3 Kafka partitions of SR-framed Avro
(main.tf:170-185, schema.tf:4-151).
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

#: Kafka source output schema (mirrors spark-sql-kafka's fixed schema)
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

EARLIEST = -2  # Kafka sentinel offsets
LATEST = -1


def _load_partitions(path: str, topic: str) -> dict[int, list[tuple]]:
    """Recorded topic → {partition: [(offset, key, value, ts_us), ...]}
    sorted by offset.  Driver-side pyarrow read — the recorded fixture is
    test-sized by construction."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    # hoisted: building the keyless default inside the loop would allocate
    # a fresh num_rows-length list per row (O(n²) for key-free recordings)
    keys = cols.get("key") or [None] * t.num_rows
    parts: dict[int, list[tuple]] = {}
    for i in range(t.num_rows):
        parts.setdefault(int(cols["partition"][i]), []).append(
            (
                int(cols["offset"][i]),
                keys[i],
                cols["value"][i],
                int(cols["timestamp_us"][i]),
            )
        )
    for p in parts.values():
        p.sort(key=lambda r: r[0])
    return parts


def _resolve_starting(starting: str, topic: str, parts: dict[int, list[tuple]]) -> dict[int, int]:
    """startingOffsets → {partition: first offset to read}, Kafka semantics."""

    def earliest(p: int) -> int:
        return parts[p][0][0] if parts[p] else 0

    def latest(p: int) -> int:
        return parts[p][-1][0] + 1 if parts[p] else 0

    if starting == "earliest":
        return {p: earliest(p) for p in parts}
    if starting == "latest":
        return {p: latest(p) for p in parts}
    spec = json.loads(starting)
    if topic not in spec:
        raise ValueError(f"startingOffsets JSON lacks subscribed topic {topic!r}: {starting}")
    out: dict[int, int] = {}
    for p in parts:
        raw = spec[topic].get(str(p))
        if raw is None:
            raise ValueError(f"startingOffsets JSON lacks partition {p} of {topic!r}")
        off = int(raw)
        out[p] = earliest(p) if off == EARLIEST else latest(p) if off == LATEST else off
    return out


class KafkaSimStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        if not options.get("kafka.bootstrap.servers"):
            raise ValueError("missing required option: kafka.bootstrap.servers")
        topic = options.get("subscribe")
        if not topic:
            raise ValueError("missing required option: subscribe")
        path = options.get("path")
        if not path:
            raise ValueError("kafka_sim needs a 'path' option (recorded topic parquet)")
        self.topic = topic
        self.parts = _load_partitions(path, topic)
        self.start = _resolve_starting(
            options.get("startingoffsets", options.get("startingOffsets", "latest")),
            topic,
            self.parts,
        )

    def initialOffset(self) -> dict:
        return {str(p): off for p, off in self.start.items()}

    def _rows_between(self, start: dict, end: dict) -> list[tuple]:
        # a LIST, not a generator: the runner's prefetch cache copy.copy()s
        # the returned iterator, and generators aren't copyable
        rows = []
        for p, recs in self.parts.items():
            lo, hi = int(start[str(p)]), int(end[str(p)])
            for off, key, value, ts_us in recs:
                if lo <= off < hi:
                    rows.append(
                        (
                            key,
                            value,
                            self.topic,
                            p,
                            off,
                            dt.datetime.fromtimestamp(
                                ts_us / 1_000_000, tz=dt.timezone.utc
                            ).replace(tzinfo=None),
                            0,  # TimestampType.CREATE_TIME
                        )
                    )
        return rows

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        end = {
            str(p): (recs[-1][0] + 1 if recs else int(start.get(str(p), 0)))
            for p, recs in self.parts.items()
        }
        # monotone: never step backwards if start is already past the log end
        end = {p: max(int(start.get(p, 0)), e) for p, e in end.items()}
        # iter-of-list: the runner needs a true iterator (it calls next()),
        # and list iterators are copyable where generators are not
        return iter(self._rows_between(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows_between(start, end))


class KafkaSimDataSource(DataSource):
    """`format("kafka_sim")` — Kafka-shaped replay source (see module doc)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_sim"

    def schema(self) -> str:
        return KAFKA_RECORD_SCHEMA

    def simpleStreamReader(self, schema) -> KafkaSimStreamReader:
        return KafkaSimStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaSimDataSource)
