"""Source adapters: driver testdata parquet, JDBC dimensions, Kafka+Avro
streams, in-memory fixtures."""

from .testdata import load_table, load_events, register_testdata  # noqa: F401
from .memory import patients_df  # noqa: F401
