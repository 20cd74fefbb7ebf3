"""transformWithStateInPandas variant of the streaming anomaly detector
(Spark 4's arbitrary-stateful-processing API — the successor to
applyInPandasWithState, with typed state handles and RocksDB-friendly
layouts).

Both implementations share the expanding-AR(1) kernel; this one keeps
the per-key ring buffer in a ValueState of (ts_us array, value array).
`streaming/stateful.py` remains the default (stable API); this module is
the forward path and is exercised by tests/test_streaming_tws.py.

ENVIRONMENT NOTES: the TWS state-server protocol requires
``google.protobuf`` at runtime (pyspark's StateMessage_pb2) and a state
store provider with column-family support (RocksDB).  In this sandbox
protobuf is bootstrapped from the Google Cloud SDK's vendored runtime
(tests/conftest.py:_bootstrap_protobuf) and the test sets the RocksDB
provider, so tests/test_streaming_tws.py executes this path for real —
asserting exact agreement with the batch `ml_detect_anomalies`.  On a
standard cluster install (protobuf via pip) it runs as-is.
"""

from __future__ import annotations

from statistics import NormalDist
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..functions.timeseries import expanding_ar1

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("event_ts_us", T.LongType()),
        T.StructField("observed_value", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
        T.StructField("expected_value", T.DoubleType()),
        T.StructField("lower_bound", T.DoubleType()),
        T.StructField("upper_bound", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


class AnomalyProcessor(StatefulProcessor):
    """Per-key anomaly scorer with a capped history buffer in ValueState."""

    def __init__(
        self,
        ts_col: str,
        value_col: str,
        min_training_size: int = 30,
        confidence_percentage: float = 95.0,
        max_history: int = 512,
    ):
        self.ts_col = ts_col
        self.value_col = value_col
        self.min_training_size = min_training_size
        self.z = NormalDist().inv_cdf(0.5 + confidence_percentage / 200.0)
        self.max_history = max_history

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("history", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        (k,) = key
        if self.state.exists():
            hist_ts, hist_vals = self.state.get()
            hist_ts, hist_vals = list(hist_ts), list(hist_vals)
        else:
            hist_ts, hist_vals = [], []
        n_hist = len(hist_vals)

        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values([self.ts_col, self.value_col], kind="mergesort")
        new_ts = (batch[self.ts_col].astype("int64") // 1000).tolist()
        new_vals = batch[self.value_col].astype(float).tolist()

        y = np.array(hist_vals + new_vals, dtype=np.float64)
        fits = expanding_ar1(y)
        n = len(y)
        prev = np.maximum(np.arange(n) - 1, 0)
        a, b, s = fits["a"][prev], fits["b"][prev], fits["sigma"][prev]
        y_prev = np.concatenate([[y[0] if n else 0.0], y[:-1]])
        expected = a + b * y_prev
        lower, upper = expected - self.z * s, expected + self.z * s
        trained = np.arange(n) >= self.min_training_size
        finite = np.isfinite(s)
        is_anom = trained & finite & ((y < lower) | (y > upper))

        sl = slice(n_hist, n)
        out = pd.DataFrame(
            {
                "key": int(k),
                "event_ts_us": new_ts,
                "observed_value": new_vals,
                "is_anomaly": is_anom[sl],
                # None (SQL NULL), not NaN, for warm-up rows — exact parity
                # with the applyInPandasWithState twin and the batch operator
                "expected_value": [v if np.isfinite(v) else None for v in expected[sl]],
                "lower_bound": [v if np.isfinite(v) else None for v in lower[sl]],
                "upper_bound": [v if np.isfinite(v) else None for v in upper[sl]],
            }
        )
        self.state.update(
            ((hist_ts + new_ts)[-self.max_history:], (hist_vals + new_vals)[-self.max_history:])
        )
        yield out

    def close(self) -> None:
        pass


def tws_detect_anomalies(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    min_training_size: int = 30,
    confidence_percentage: float = 95.0,
    max_history: int = 512,
) -> DataFrame:
    return df.groupBy(key_col).transformWithStateInPandas(
        AnomalyProcessor(ts_col, value_col, min_training_size, confidence_percentage, max_history),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
