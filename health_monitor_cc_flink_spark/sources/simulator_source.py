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
[start, end) for every patient in parallel (partition per patient).
`availableNow` drains the whole range in ONE data batch (the Python
DataSource API has no admission control, so Spark cannot chunk it) —
fine for stateless sinks, but append-mode stateful operators only emit
in batches AFTER the watermark advances, so for windowed/stateful
consumers pace the replay with ``ticks_per_batch`` under a
``processingTime`` trigger (see tests/test_simulator_source.py).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from functools import lru_cache
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
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


@lru_cache(maxsize=64)
def _patient_series(pid: int, n_ticks: int, interval_s: float, seed: int, fault: bool):
    """One patient's full deterministic series, memoized per worker: a
    paced replay (ticks_per_batch under a processingTime trigger) calls
    read() once per micro-batch, and regenerating all n_ticks every time
    made the replay O(n_ticks²) per patient.  Spark reuses Python workers
    (spark.python.worker.reuse defaults true), so the cache turns that
    into generate-once + O(slice) per batch; the series is derived purely
    from the key args, so cached results are batch-order independent."""
    from ..fixtures import generate_health_events_pdf

    return generate_health_events_pdf(
        n_ticks=n_ticks,
        interval_s=interval_s,
        seed=seed + pid,          # independent per-patient stream
        start=_START,
        patient_ids=(pid,),
        fault=fault and pid == 1,
    )


def _gen_patient_rows(pid: int, n_ticks: int, interval_s: float, seed: int,
                      fault: bool, tick_from: int = 0, tick_to: int | None = None):
    """Rows for one patient (tuples matching HEALTH_EVENT_SCHEMA),
    optionally sliced to a tick range (streaming micro-batches)."""
    pdf = _patient_series(pid, n_ticks, interval_s, seed, fault)
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


class _TickRangePartition(InputPartition):
    def __init__(self, pid: int, lo: int, hi: int):
        self.pid, self.lo, self.hi = pid, lo, hi


class HealthSimulatorStreamReader(DataSourceStreamReader):
    """Full stream reader: offset = next tick index; ``latestOffset``
    advances by ``ticks_per_batch`` per trigger (so availableNow drains
    in several micro-batches and the final no-data batch flushes
    watermark-closed windows); each batch's rows are generated in
    parallel, one partition per patient."""

    def __init__(self, options):
        self.n_ticks, self.interval_s, self.seed, self.n_patients, self.fault = _opts(options)
        # None → the whole replay range is "available" immediately
        # (correct availableNow semantics); an explicit ticks_per_batch
        # paces a live-replay demo under a processingTime trigger.
        tpb = options.get("ticks_per_batch")
        self.ticks_per_batch = int(tpb) if tpb is not None else None
        self._latest = 0

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        if self.ticks_per_batch is None:
            return {"tick": self.n_ticks}
        self._latest = min(self._latest + self.ticks_per_batch, self.n_ticks)
        return {"tick": self._latest}

    def partitions(self, start: dict, end: dict):
        return [
            _TickRangePartition(pid, start["tick"], end["tick"])
            for pid in range(1, self.n_patients + 1)
        ]

    def read(self, partition: _TickRangePartition) -> Iterator[tuple]:
        yield from _gen_patient_rows(
            partition.pid, self.n_ticks, self.interval_s, self.seed, self.fault,
            tick_from=partition.lo, tick_to=partition.hi,
        )

    def commit(self, end: dict) -> None:
        pass


class HealthSimulatorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "health_simulator"

    def schema(self):
        return HEALTH_EVENT_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return HealthSimulatorBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return HealthSimulatorStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HealthSimulatorDataSource)
