"""Scalar helpers for SQL-surface parity.

`JSON_OBJECT('k' VALUE v, ...)` appears in the reference only to pass
option maps to the ML functions (flink_statements.tf:194-197,308-311);
our ML operators take plain kwargs, but the constructor is exposed for
query parity (SURVEY.md O23).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def json_object(**kv) -> Column:
    """JSON_OBJECT('k' VALUE v, ...) → a JSON-text column."""
    pairs = [F.lit(v) if not isinstance(v, Column) else v for v in kv.values()]
    return F.to_json(F.struct(*[p.alias(k) for k, p in zip(kv.keys(), pairs)]))


def register_pandas_aggregates(spark) -> None:
    """Register the engine's vectorized (Arrow-batched) pandas UDAFs on
    the SQL surface (SURVEY §2.10: pandas UDF/UDAF registration is a
    first-class engine feature — the reference's ML built-ins are
    UDAF-shaped).  Integer math keeps them oracle-exact: a pandas int64
    sum is exact and order-insensitive, unlike float accumulation.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses
    # `from __future__ import annotations`, which stringifies type hints
    # and defeats pandas_udf's eval-type inference.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def sumproduct(a, b):
        return int((a * b).sum())

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_mean(v, w):
        # double math over int64 weights; exact while Σ(v·w) < 2^53
        num = float((v * w).sum())
        den = float(w.sum())
        return num / den if den else float("nan")

    spark.udf.register("sumproduct", sumproduct)
    spark.udf.register("weighted_mean", weighted_mean)
