"""Per-key time-series ML operators: anomaly detection + forecasting.

These re-implement the *public contract* of Confluent's closed-source
`ML_DETECT_ANOMALIES` / `ML_FORECAST` OVER-window aggregates (reference
flink_statements.tf:191-202 and :305-316): an ARIMA-family model fit per
key over the cumulative event-time frame
``PARTITION BY key ORDER BY ts RANGE UNBOUNDED PRECEDING``, with a
`minTrainingSize` warm-up and a `confidencePercentage` band.  Output
shapes follow the only ground truth available — the fields the pipeline
consumes: `report.is_anomaly` (flink_statements.tf:257) and the six
forecast fields destructured at flink_statements.tf:325-332.  Values are
engine-defined (SURVEY.md §7.3: shape-compatible, not bit-identical to
the closed vendor model).

Model: expanding-window AR(1) with drift, y_t = a + b·y_{t-1} + ε.
For every prefix of a key's ordered history the OLS coefficients,
residual variance, RMSE and AIC are all computable from running sums, so
the whole per-key pass is **O(n) and fully vectorized** — no per-row
refitting.  This matters at scale: the cost per key is one NumPy sweep
over its history, and keys are processed in parallel via
``groupBy(key).applyInPandas`` (Arrow-batched, one shuffle on the key —
the same shuffle the OVER frame implies in any engine).

Execution shape (batch):
    df.groupBy(key).applyInPandas(fn)  →  shuffle by key, sort in-group
Streaming uses the same kernel inside ``transformWithStateInPandas``
(see streaming/stateful.py).
"""

from __future__ import annotations

import math
from statistics import NormalDist
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["ml_detect_anomalies", "ml_forecast", "expanding_ar1"]

#: number of estimated parameters (intercept, slope) for AIC/df purposes
_N_PARAMS = 2


def _zcrit(confidence_percentage: float) -> float:
    p = 0.5 + confidence_percentage / 200.0
    return NormalDist().inv_cdf(p)


def expanding_ar1(y: np.ndarray):
    """Expanding-window AR(1)-with-drift fit over every prefix of ``y``.

    For each m in [1, n] the model is fit on pairs
    (y_1..y_{m-1} → y_2..y_m), i.e. on the full prefix ending at m.
    Returns dict of arrays (len n): a, b, sigma (residual std with df
    correction), rmse, aic — entry m-1 describes the fit on prefix m.
    All O(n) via cumulative sums.
    """
    n = len(y)
    a = np.zeros(n)
    b = np.zeros(n)
    sigma = np.full(n, np.inf)
    rmse = np.full(n, np.nan)
    aic = np.full(n, np.nan)
    if n < 2:
        return {"a": a, "b": b, "sigma": sigma, "rmse": rmse, "aic": aic}

    s1 = np.cumsum(y)                       # Σ y_t           over t ≤ m
    s2 = np.cumsum(y * y)                   # Σ y_t²
    c = np.concatenate([[0.0], np.cumsum(y[1:] * y[:-1])])  # Σ y_{t-1}·y_t, t ≤ m

    m = np.arange(1, n + 1, dtype=np.float64)
    k = m - 1.0                             # number of regression pairs
    with np.errstate(divide="ignore", invalid="ignore"):
        sum_x = np.concatenate([[0.0], s1[:-1]])        # Σ x over prefix
        sum_z = s1 - y[0]                               # Σ z
        sum_x2 = np.concatenate([[0.0], s2[:-1]])
        sum_z2 = s2 - y[0] * y[0]
        denom = k * sum_x2 - sum_x * sum_x
        b_hat = np.where(np.abs(denom) > 1e-12, (k * c - sum_x * sum_z) / np.where(denom == 0, 1, denom), 0.0)
        a_hat = np.where(k > 0, (sum_z - b_hat * sum_x) / np.where(k == 0, 1, k), 0.0)
        sse = (
            sum_z2
            + k * a_hat * a_hat
            + b_hat * b_hat * sum_x2
            - 2.0 * a_hat * sum_z
            - 2.0 * b_hat * c
            + 2.0 * a_hat * b_hat * sum_x
        )
        sse = np.maximum(sse, 0.0)                      # fp guard
        df_resid = np.maximum(k - _N_PARAMS, 1.0)
        sig = np.sqrt(sse / df_resid)
        rm = np.sqrt(np.where(k > 0, sse / np.where(k == 0, 1, k), np.nan))
        # AIC for gaussian residuals: k·ln(SSE/k) + 2·(params+1)
        with np.errstate(divide="ignore"):
            ai = np.where(
                (k > 0) & (sse > 0),
                k * np.log(np.where((k > 0) & (sse > 0), sse / np.maximum(k, 1), 1.0))
                + 2.0 * (_N_PARAMS + 1),
                np.nan,
            )
    valid = k >= 2                                       # need ≥2 pairs for a line
    a[valid] = a_hat[valid]
    b[valid] = b_hat[valid]
    sigma[valid] = np.maximum(sig[valid], 1e-9)
    rmse[valid] = rm[valid]
    aic[valid] = ai[valid]
    # single-pair prefix: fall back to mean ("persistence") prediction
    one = k == 1
    a[one] = y[0]
    return {"a": a, "b": b, "sigma": sigma, "rmse": rmse, "aic": aic}


def _sorted_group(pdf, ts_col: str, value_col: str):
    pdf = pdf.sort_values([ts_col, value_col], kind="mergesort").reset_index(drop=True)
    y = pdf[value_col].to_numpy(dtype=np.float64)
    return pdf, y


def ml_detect_anomalies(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_cols: Sequence[str],
    min_training_size: int = 30,
    confidence_percentage: float = 95.0,
    output_col: str = "report",
) -> DataFrame:
    """ML_DETECT_ANOMALIES over the cumulative per-key frame.

    Adds ``output_col`` as STRUCT<is_anomaly BOOLEAN, expected_value
    DOUBLE, lower_bound DOUBLE, upper_bound DOUBLE>.  Row i is scored by
    the model fit on rows 1..i-1 of its key (ordered by ``ts_col``); the
    first ``min_training_size`` rows of a key are never flagged
    (warm-up, reference `minTrainingSize` at flink_statements.tf:195).
    """
    z = _zcrit(confidence_percentage)
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(
                output_col,
                T.StructType(
                    [
                        T.StructField("is_anomaly", T.BooleanType()),
                        T.StructField("expected_value", T.DoubleType()),
                        T.StructField("lower_bound", T.DoubleType()),
                        T.StructField("upper_bound", T.DoubleType()),
                    ]
                ),
            )
        ]
    )

    def score(pdf):
        import pandas as pd

        pdf, y = _sorted_group(pdf, ts_col, value_col)
        n = len(y)
        fits = expanding_ar1(y)
        # model through row i-1 predicts row i → shift fit arrays by one
        prev = np.maximum(np.arange(n) - 1, 0)
        a, b, s = fits["a"][prev], fits["b"][prev], fits["sigma"][prev]
        y_prev = np.concatenate([[y[0] if n else 0.0], y[:-1]])
        expected = a + b * y_prev
        lower = expected - z * s
        upper = expected + z * s
        trained = np.arange(n) >= min_training_size
        finite = np.isfinite(s)
        is_anom = trained & finite & ((y < lower) | (y > upper))
        expected = np.where(finite, expected, np.nan)
        pdf[output_col] = [
            {
                "is_anomaly": bool(is_anom[i]),
                "expected_value": float(expected[i]) if np.isfinite(expected[i]) else None,
                "lower_bound": float(lower[i]) if np.isfinite(lower[i]) else None,
                "upper_bound": float(upper[i]) if np.isfinite(upper[i]) else None,
            }
            for i in range(n)
        ]
        return pdf

    return df.groupBy(*key_cols).applyInPandas(score, schema=out_schema)


def ml_forecast(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_cols: Sequence[str],
    horizon: int = 1,
    confidence_percentage: float = 95.0,
    min_training_size: int = 2,
    output_col: str = "forecast_values",
) -> DataFrame:
    """ML_FORECAST over the cumulative per-key frame.

    For every input row, fits on the key's history *up to and including*
    that row and forecasts the next ``horizon`` steps.  Adds
    ``output_col`` as ARRAY<STRUCT<forecast_timestamp TIMESTAMP,
    forecast_value DOUBLE, lower_bound DOUBLE, upper_bound DOUBLE,
    rmse DOUBLE, aic DOUBLE>> (field shape per
    flink_statements.tf:325-332).  Rows with fewer than
    ``min_training_size`` history points get an empty array.

    Multi-step intervals widen with the AR(1) variance recursion
    Var_h = σ²·Σ_{j<h} b^{2j} (no parameter-uncertainty inflation;
    engine-defined, SURVEY.md §7.4.3).
    """
    z = _zcrit(confidence_percentage)
    elem = T.StructType(
        [
            T.StructField("forecast_timestamp", T.TimestampType()),
            T.StructField("forecast_value", T.DoubleType()),
            T.StructField("lower_bound", T.DoubleType()),
            T.StructField("upper_bound", T.DoubleType()),
            T.StructField("rmse", T.DoubleType()),
            T.StructField("aic", T.DoubleType()),
        ]
    )
    out_schema = T.StructType(df.schema.fields + [T.StructField(output_col, T.ArrayType(elem))])

    def forecast(pdf):
        import pandas as pd

        pdf, y = _sorted_group(pdf, ts_col, value_col)
        n = len(y)
        fits = expanding_ar1(y)
        ts = pd.to_datetime(pdf[ts_col])
        steps = ts.diff().dropna()
        step = steps.iloc[-1] if len(steps) else pd.Timedelta(seconds=1)
        if step <= pd.Timedelta(0):
            step = pd.Timedelta(seconds=1)

        col = []
        for i in range(n):
            if i + 1 < min_training_size or not np.isfinite(fits["sigma"][i]):
                col.append([])
                continue
            a, b, s = fits["a"][i], fits["b"][i], fits["sigma"][i]
            rm, ai = float(fits["rmse"][i]), float(fits["aic"][i])
            yhat = y[i]
            var_acc = 0.0
            out = []
            for h in range(1, horizon + 1):
                yhat = a + b * yhat
                var_acc += float(b) ** (2 * (h - 1))
                band = z * s * math.sqrt(var_acc)
                out.append(
                    {
                        "forecast_timestamp": (ts.iloc[i] + h * step).to_pydatetime(),
                        "forecast_value": float(yhat),
                        "lower_bound": float(yhat - band),
                        "upper_bound": float(yhat + band),
                        "rmse": rm if math.isfinite(rm) else None,
                        "aic": ai if math.isfinite(ai) else None,
                    }
                )
            col.append(out)
        pdf[output_col] = col
        return pdf

    return df.groupBy(*key_cols).applyInPandas(forecast, schema=out_schema)
