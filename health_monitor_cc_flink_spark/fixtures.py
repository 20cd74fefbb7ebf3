"""Deterministic health-event fixture generator.

Behavioral re-implementation (NOT a copy) of the reference's data
simulator (`health-simulator/health_simulator.py`): per-patient
circadian sine + clamped Brownian jitter, values snapped to the discrete
Avro option lists (reference health_simulator.py:81-107,195-242;
constants documented in FIXTURES.md §A1), with the designed fault
injection — patient 1's heart rate glides from ~65 to ~20 bpm starting
``fault_onset_s`` seconds in while SpO2 drops up to 6 points
(health_simulator.py:110-129).  This fault is the end-to-end acceptance
signal: the terminal pipeline stage alerts on forecast < 40 bpm
(flink_statements.tf:333).

Everything is seeded and vectorized; the same (seed, n_ticks, interval)
always yields byte-identical frames.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .schemas import HEALTH_EVENT_SCHEMA

PATIENT_IDS = tuple(range(1, 11))          # health_simulator.py:17
DEVICE_TYPES = ("wearable_v4", "wearable_v3", "wearable_v2")  # schema.tf:42
SENSOR_STATUSES = ("stable", "noisy", "offline")              # schema.tf:60
SENSOR_WEIGHTS = (0.8, 0.15, 0.05)         # health_simulator.py:230

# circadian base/amplitude and Brownian volatility per vital (FIXTURES.md A1)
HR_BASE, HR_AMP, HR_VOL = 82.0, 12.0, 1.5
TEMP_BASE, TEMP_AMP, TEMP_VOL = 36.7, 0.5, 0.05
SYS_BASE, SYS_AMP, SYS_VOL = 120.0, 8.0, 2.5
DIA_BASE, DIA_AMP, DIA_VOL = 78.0, 4.8, 1.5
SPO2_BASE, SPO2_AMP, SPO2_VOL = 96.0, 1.0, 0.6

# fault injection (patient 1 bradycardia): health_simulator.py:110-129
FAULT_PATIENT = 1
FAULT_ONSET_S = 30.0
FAULT_GLIDE_S = 180.0
FAULT_HR_START, FAULT_HR_END = 65.0, 20.0
FAULT_SPO2_DROP = 6.0
FAULT_SIGMA = 1.5

_ALNUM = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))


def _snap(x: np.ndarray, lo: float, hi: float, step: float) -> np.ndarray:
    """Snap to the nearest member of the arithmetic option list [lo..hi:step]."""
    return np.clip(np.round((x - lo) / step) * step + lo, lo, hi)


def _brownian(rng: np.random.Generator, n: int, vol: float, max_dev: float) -> np.ndarray:
    """Clamped Brownian jitter: cumulative Gaussian steps, deviation
    bounded so the walk can't drift out of physiological range."""
    return np.clip(np.cumsum(rng.normal(0.0, vol, size=n)), -max_dev, max_dev)


def generate_health_events_pdf(
    n_ticks: int = 600,
    interval_s: float = 0.5,
    seed: int = 42,
    start: datetime | None = None,
    patient_ids: tuple[int, ...] = PATIENT_IDS,
    fault: bool = True,
):
    """Generate a pandas DataFrame of health events.

    One event per patient per tick (reference emission model,
    health_simulator.py:281-296).  Returns columns matching
    HEALTH_EVENT_SCHEMA with nested dicts for the struct fields.
    """
    import pandas as pd

    start = start or datetime(2026, 1, 1, 0, 0, 0)
    rng = np.random.default_rng(seed)
    t = np.arange(n_ticks) * interval_s                     # seconds since start
    day_phase = 2.0 * np.pi * t / 86400.0                   # 24 h circadian period

    frames = []
    for pid in patient_ids:
        phase = rng.uniform(0, 2 * np.pi)                   # per-patient phase offset
        hr = HR_BASE + HR_AMP * np.sin(day_phase + phase) + _brownian(rng, n_ticks, HR_VOL, 6.0)
        temp = TEMP_BASE + TEMP_AMP * np.sin(day_phase + phase) + _brownian(rng, n_ticks, TEMP_VOL, 0.5)
        sys_ = SYS_BASE + SYS_AMP * np.sin(day_phase + phase) + _brownian(rng, n_ticks, SYS_VOL, 10.0)
        dia = DIA_BASE + DIA_AMP * np.sin(day_phase + phase) + _brownian(rng, n_ticks, DIA_VOL, 8.0)
        spo2 = SPO2_BASE + SPO2_AMP * np.sin(day_phase + phase) + _brownian(rng, n_ticks, SPO2_VOL, 2.0)

        if fault and pid == FAULT_PATIENT:
            prog = np.clip((t - FAULT_ONSET_S) / FAULT_GLIDE_S, 0.0, 1.0)
            active = t >= FAULT_ONSET_S
            target = FAULT_HR_START + (FAULT_HR_END - FAULT_HR_START) * prog
            hr = np.where(active, target + rng.normal(0, FAULT_SIGMA, n_ticks), hr)
            spo2 = np.where(active, spo2 - FAULT_SPO2_DROP * prog, spo2)

        hr_lo = 20 if (fault and pid == FAULT_PATIENT) else 55   # fault path widens the option list
        frames.append(
            pd.DataFrame(
                {
                    "event_time": [start + timedelta(seconds=float(s)) for s in t],
                    "event_id": [
                        "".join(rng.choice(_ALNUM, size=12)) for _ in range(n_ticks)
                    ],
                    "patient_id": np.full(n_ticks, pid, dtype=np.int32),
                    "device_type": rng.choice(DEVICE_TYPES, size=n_ticks),
                    "battery_level": _snap(rng.uniform(5, 100, n_ticks), 5, 100, 5).astype(int),
                    "sensor_status": rng.choice(SENSOR_STATUSES, size=n_ticks, p=SENSOR_WEIGHTS),
                    "heart_rate": _snap(hr, hr_lo, 150, 5).astype(int),
                    "blood_oxygen_spO2": _snap(spo2, 82, 100, 2).astype(int),
                    "systolic": _snap(sys_, 90, 180, 5).astype(int),
                    "diastolic": _snap(dia, 60, 120, 5).astype(int),
                    "body_temperature_c": _snap(temp, 35.0, 40.0, 0.5).astype(np.float32),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def health_events_df(
    spark: SparkSession,
    n_ticks: int = 600,
    interval_s: float = 0.5,
    seed: int = 42,
    start: datetime | None = None,
    patient_ids: tuple[int, ...] = PATIENT_IDS,
    fault: bool = True,
    unknown_patient_rows: int = 0,
) -> DataFrame:
    """Materialize the fixture as a Spark DataFrame with the canonical
    nested HEALTH_EVENT_SCHEMA.  ``unknown_patient_rows`` appends events
    with patient_id=99 to pin the enrichment join's drop-on-miss
    semantics (SURVEY.md §2.12.3)."""
    from pyspark.sql import functions as F

    pdf = generate_health_events_pdf(n_ticks, interval_s, seed, start, patient_ids, fault)
    # Arrow-ingest the FLAT frame, then build the nested structs in Spark:
    # the former per-row Python-tuple loop serialized every row through the
    # driver one at a time (seconds of single-threaded time at scale-probe
    # sizes); the flat pandas frame takes createDataFrame's Arrow fast path
    # and the struct assembly is pure codegen'd projection.
    flat = spark.createDataFrame(
        pdf,
        schema=(
            "event_time timestamp, event_id string, patient_id int, "
            "device_type string, battery_level int, sensor_status string, "
            "heart_rate int, blood_oxygen_spO2 int, systolic int, "
            "diastolic int, body_temperature_c float"
        ),
    )
    nested = flat.select(
        "event_time",
        "event_id",
        "patient_id",
        F.struct("device_type", "battery_level", "sensor_status").alias(
            "device_metadata"
        ),
        F.struct(
            F.col("heart_rate"),
            F.col("blood_oxygen_spO2"),
            F.struct("systolic", "diastolic").alias("blood_pressure"),
            F.col("body_temperature_c"),
        ).alias("vitals"),
    )
    if unknown_patient_rows:
        extra = nested.limit(unknown_patient_rows).withColumn(
            "patient_id", F.lit(99).cast("int")
        )
        nested = nested.unionByName(extra)
    assert nested.schema.fieldNames() == HEALTH_EVENT_SCHEMA.fieldNames()
    return nested
