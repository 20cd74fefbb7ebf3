"""Engine catalog: named connections + registered tables/views.

The reference models external access as a named, reusable connection
object (`CREATE CONNECTION ... WITH ('type'='confluent_jdbc', ...)`,
S1 at flink_statements.tf:22-31) plus tables bound to a connection
(S2 at flink_statements.tf:65-76).  Spark has no first-class connection
object, so the engine keeps a small registry mapping connection names to
reader options, and a view catalog built on Spark temp views
(SURVEY.md §2.1 O2/O3, §2.8 O27).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ConnectionSpec:
    """Named endpoint + credentials, the S1 surrogate.

    ``kind`` is a Spark datasource format (``jdbc``, ``kafka`` ...);
    ``options`` are passed through to ``DataFrameReader.options``.
    """

    name: str
    kind: str
    options: dict[str, str] = field(default_factory=dict)


class EngineCatalog:
    """Session-scoped catalog of connections and named tables.

    Named tables give the multi-statement pipeline its wiring: each
    stage's output is registered under a name and the next stage reads
    it by name (`FROM enriched_events_flagged` etc., reference
    flink_statements.tf:256,317; SURVEY.md O27).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._connections: dict[str, ConnectionSpec] = {}

    # -- connections (S1) -----------------------------------------------------
    def create_connection(self, name: str, kind: str, **options: str) -> ConnectionSpec:
        spec = ConnectionSpec(name=name, kind=kind, options=dict(options))
        self._connections[name] = spec
        return spec

    def connection(self, name: str) -> ConnectionSpec:
        return self._connections[name]

    # -- external tables (S2) -------------------------------------------------
    def create_external_table(
        self, name: str, connection: str, table_name: str, **reader_options: str
    ) -> DataFrame:
        """Bind an external table through a named connection and register
        it as a view.  For a `jdbc` connection this is the S2 equivalent:
        a bounded dimension read as a static DataFrame (joined to streams
        with an explicit broadcast — SURVEY.md O13/O32)."""
        spec = self.connection(connection)
        reader = self.spark.read.format(spec.kind).options(**spec.options)
        # bind the table name to the option each datasource actually
        # keys tables on: dbtable for jdbc, subscribe (topic) for kafka,
        # path for file-based formats
        if spec.kind == "jdbc":
            reader = reader.option("dbtable", table_name)
        elif spec.kind == "kafka":
            reader = reader.option("subscribe", table_name)
        else:
            reader = reader.option("path", table_name)
        df = reader.options(**reader_options).load()
        self.register(name, df)
        return df

    # -- named tables / CTAS (O4/O27) ----------------------------------------
    def register(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        return df

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def create_table_as(self, name: str, df: DataFrame, materialize: bool = False) -> DataFrame:
        """CTAS surrogate.  ``materialize=False`` registers the logical
        plan (fused execution downstream, Catalyst sees through it);
        ``materialize=True`` persists so each stage is independently
        inspectable — the reference's per-stage Kafka-topic topology
        (SURVEY.md §7.5 faithful-topology mode)."""
        if materialize:
            df = df.localCheckpoint(eager=True)
        return self.register(name, df)

    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(text)
