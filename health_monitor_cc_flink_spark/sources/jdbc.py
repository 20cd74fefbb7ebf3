"""JDBC dimension source (S2 surrogate; reference flink_statements.tf:65-76).

The reference's lookup table is a 10-row Postgres `patients` table.  At
scale the pattern stays the same: a bounded dimension read as a static
DataFrame and broadcast to the stream side (SURVEY.md O13).  For large
dimensions use ``partition_column/num_partitions`` for a parallel read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.options(**options).load()
