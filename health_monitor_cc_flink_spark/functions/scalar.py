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
