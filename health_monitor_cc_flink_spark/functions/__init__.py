"""Engine function library.

The reference consumes two Confluent built-in ML aggregates —
`ML_DETECT_ANOMALIES` (flink_statements.tf:191-202) and `ML_FORECAST`
(flink_statements.tf:305-316) — over per-key cumulative event-time
frames.  Those are re-implemented here as vectorized pandas operators
(SURVEY.md §2.10, §7.3); everything else scalar in the reference maps to
built-in `pyspark.sql.functions`.
"""

from .timeseries import ml_detect_anomalies, ml_forecast  # noqa: F401
from .scalar import json_object  # noqa: F401
