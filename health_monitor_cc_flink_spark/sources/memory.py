"""In-memory fixture sources (tests / local runs).

`patients_df` materializes the canonical 10-row dimension the reference
seeds into RDS Postgres (db.tf:104-115) — in production this same frame
comes from :meth:`EngineCatalog.create_external_table` over JDBC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PATIENTS_ROWS, PATIENTS_SCHEMA


def patients_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PATIENTS_ROWS, schema=PATIENTS_SCHEMA)
