"""`health_simulator` — the reference's event generator as a first-class
Spark data source (Spark 4 Python DataSource API).

The reference runs its simulator as an external Docker producer into
Kafka (script.tf + health_simulator.py); here the same generator is a
native source the engine can `spark.read.format("health_simulator")` —
batch or streaming — with generation parallelized **per patient**
(one input partition per key, the natural sharding at scale: a fleet of
N simulated devices = N partitions, no driver-side generation).

Options: n_ticks (600), interval_s (0.5), seed (42), n_patients (10),
fault ("true").  Each patient's series is generated with an independent
derived seed (seed + patient_id) so partition generation is
order-independent and deterministic.

Streaming: offsets are tick indices; each micro-batch materializes ticks
[start, end) for every patient — `availableNow` drains the configured
range, a `processingTime` trigger replays it incrementally (the test/CI
stand-in for the live Kafka feed).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import HEALTH_EVENT_SCHEMA

_START = datetime(2026, 1, 1)


def _opts(options):
    return (
        int(options.get("n_ticks", "600")),
        float(options.get("interval_s", "0.5")),
        int(options.get("seed", "42")),
        int(options.get("n_patients", "10")),
        options.get("fault", "true").lower() == "true",
    )


def _gen_patient_rows(pid: int, n_ticks: int, interval_s: float, seed: int,
                      fault: bool, tick_from: int = 0, tick_to: int | None = None):
    """Rows for one patient (tuples matching HEALTH_EVENT_SCHEMA),
    optionally sliced to a tick range (streaming micro-batches)."""
    from ..fixtures import generate_health_events_pdf

    pdf = generate_health_events_pdf(
        n_ticks=n_ticks,
        interval_s=interval_s,
        seed=seed + pid,          # independent per-patient stream
        start=_START,
        patient_ids=(pid,),
        fault=fault and pid == 1,
    )
    lo = tick_from
    hi = tick_to if tick_to is not None else n_ticks
    for r in pdf.iloc[lo:hi].itertuples():
        yield (
            r.event_time.to_pydatetime(),
            r.event_id,
            int(r.patient_id),
            (r.device_type, int(r.battery_level), r.sensor_status),
            (
                int(r.heart_rate),
                int(r.blood_oxygen_spO2),
                (int(r.systolic), int(r.diastolic)),
                float(r.body_temperature_c),
            ),
        )


class _PatientPartition(InputPartition):
    def __init__(self, pid: int):
        self.pid = pid


class HealthSimulatorBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_ticks, self.interval_s, self.seed, self.n_patients, self.fault = _opts(options)

    def partitions(self):
        return [_PatientPartition(pid) for pid in range(1, self.n_patients + 1)]

    def read(self, partition: _PatientPartition) -> Iterator[tuple]:
        yield from _gen_patient_rows(
            partition.pid, self.n_ticks, self.interval_s, self.seed, self.fault
        )


class HealthSimulatorStreamReader(SimpleDataSourceStreamReader):
    """Offset = next tick index; each batch emits ticks [start, end)."""

    def __init__(self, options):
        self.n_ticks, self.interval_s, self.seed, self.n_patients, self.fault = _opts(options)
        self.ticks_per_batch = int(options.get("ticks_per_batch", "60"))

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start: dict):
        lo = start["tick"]
        hi = min(lo + self.ticks_per_batch, self.n_ticks)
        rows = []
        for pid in range(1, self.n_patients + 1):
            rows.extend(
                _gen_patient_rows(
                    pid, self.n_ticks, self.interval_s, self.seed, self.fault,
                    tick_from=lo, tick_to=hi,
                )
            )
        return iter(rows), {"tick": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for pid in range(1, self.n_patients + 1):
            rows.extend(
                _gen_patient_rows(
                    pid, self.n_ticks, self.interval_s, self.seed, self.fault,
                    tick_from=start["tick"], tick_to=end["tick"],
                )
            )
        return iter(rows)


class HealthSimulatorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "health_simulator"

    def schema(self):
        return HEALTH_EVENT_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return HealthSimulatorBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return HealthSimulatorStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HealthSimulatorDataSource)
